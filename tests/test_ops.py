"""Unit/property tests for kernels, transfer, ghost fill and BC formulas —
coverage the reference lacks (SURVEY.md section 4 'implication')."""
import jax.numpy as jnp
import numpy as np
import pytest

from octree_mg_tpu import (IPHI, IRES, IRHS, IVEPS, BCType, MGConfig,
                           MGExperimental,
                           MGSolver, build_rectangle)
from octree_mg_tpu.core.indexmaps import checkerboard_parity
from octree_mg_tpu.ops import transfer


def make_solver(ndim=2, size=32, box=8, periodic=False, **cfg_kw):
    dsz = np.full(ndim, size)
    tree = build_rectangle(ndim, dsz, box, 1.0 / dsz, np.zeros(ndim),
                           periodic=[periodic] * ndim)
    solver = MGSolver(tree, MGConfig(**cfg_kw))
    return solver


def test_laplacian_consistency_2d():
    """A(phi) ~ analytic laplacian to O(h^2) for smooth phi."""
    errs = []
    for size in (32, 64):
        solver = make_solver(2, size, 8)
        state = solver.allocate()
        top = solver.levels[-1]
        x = solver.cell_centers(top)
        phi = np.sin(2 * np.pi * x[..., 0]) * np.cos(2 * np.pi * x[..., 1])
        lap = -2 * (2 * np.pi) ** 2 * phi
        state["cc"][top] = state["cc"][top].at[IPHI].set(jnp.asarray(phi))
        state = solver.apply_operator(state, i_out=IRES)
        isl = (slice(None),) + (slice(1, -1),) * 2
        got = np.asarray(state["cc"][top][IRES])[isl]
        errs.append(np.max(np.abs(got - lap[isl])))
    assert errs[0] / errs[1] > 3.5  # second order


def test_restrict_prolong_roundtrip_constant():
    solver = make_solver(2, 32, 8)
    state = solver.allocate()
    for lvl in solver.levels:
        state["cc"][lvl] = state["cc"][lvl].at[IPHI].set(1.0)
    state = solver.restrict(state, IPHI)
    for lvl in solver.levels:
        assert np.allclose(np.asarray(state["cc"][lvl][IPHI]), 1.0)
    # prolong constant from each level up: stays 1 in the interior
    dmaps = solver._to_device()
    for lvl in solver.levels[:-1]:
        state = solver.prolong_lvl(state, dmaps, lvl, IPHI, IRES, add=False)
        isl = (slice(None),) + (slice(1, -1),) * 2
        assert np.allclose(np.asarray(state["cc"][lvl + 1][IRES])[isl], 1.0)


def test_restrict_is_average():
    solver = make_solver(2, 16, 8)
    state = solver.allocate()
    top = solver.levels[-1]
    rng = np.random.default_rng(0)
    vals = rng.normal(size=np.asarray(state["cc"][top][IPHI]).shape)
    state["cc"][top] = state["cc"][top].at[IPHI].set(jnp.asarray(vals))
    dmaps = solver._to_device()
    state2 = solver._restrict_lvl(state, dmaps, top, IPHI)
    coarse = np.asarray(state2["cc"][top - 1][IPHI])
    # total sum of interiors is preserved (full weighting conservation)
    s_f = vals[(slice(None),) + (slice(1, -1),) * 2].sum()
    s_c = coarse[(slice(None),) + (slice(1, -1),) * 2].sum()
    assert np.isclose(s_f / 4.0, s_c)


def test_prolong_weights_linear_function():
    """D-linear prolongation reproduces linear functions exactly
    (mg_prolong_sparse weights, m_prolong.f90:159-240)."""
    solver = make_solver(2, 32, 8)
    state = solver.allocate()
    dmaps = solver._to_device()
    for lvl in solver.levels:
        x = solver.cell_centers(lvl)
        f = 2.0 * x[..., 0] - 3.0 * x[..., 1] + 0.5
        state["cc"][lvl] = state["cc"][lvl].at[IPHI].set(jnp.asarray(f))
    lvl = solver.levels[-2]
    state = solver.prolong_lvl(state, dmaps, lvl, IPHI, IRES, add=False)
    top = solver.levels[-1]
    x = solver.cell_centers(top)
    f = 2.0 * x[..., 0] - 3.0 * x[..., 1] + 0.5
    isl = (slice(None),) + (slice(1, -1),) * 2
    got = np.asarray(state["cc"][top][IRES])[isl]
    np.testing.assert_allclose(got, f[isl], rtol=1e-12, atol=1e-12)


def test_ghost_fill_same_level_and_periodic():
    solver = make_solver(2, 32, 8, periodic=True)
    state = solver.allocate()
    top = solver.levels[-1]
    x = solver.cell_centers(top)
    f = np.sin(2 * np.pi * x[..., 0]) * np.sin(2 * np.pi * x[..., 1])
    interior_only = np.zeros_like(f)
    isl = (slice(None),) + (slice(1, -1),) * 2
    interior_only[isl] = f[isl]
    state["cc"][top] = state["cc"][top].at[IPHI].set(
        jnp.asarray(interior_only))
    state = solver.fill_ghost(state, IPHI, lvl=top)
    got = np.asarray(state["cc"][top][IPHI])
    # face ghosts (not corners) must equal the periodic continuation
    np.testing.assert_allclose(got[:, 1:-1, 0], f[:, 1:-1, 0], atol=1e-12)
    np.testing.assert_allclose(got[:, 1:-1, -1], f[:, 1:-1, -1], atol=1e-12)
    np.testing.assert_allclose(got[:, 0, 1:-1], f[:, 0, 1:-1], atol=1e-12)
    np.testing.assert_allclose(got[:, -1, 1:-1], f[:, -1, 1:-1], atol=1e-12)


@pytest.mark.parametrize("bc_type,expect", [
    (BCType.DIRICHLET, lambda x1, x2, b, dr: 2 * b - x1),
    (BCType.NEUMANN, lambda x1, x2, b, dr: x1 - dr * b),  # low side
    (BCType.CONTINUOUS, lambda x1, x2, b, dr: 2 * x1 - x2),
])
def test_bc_formulas_low_x(bc_type, expect):
    """bc_to_gc coefficients (m_ghost_cells.f90:682-698)."""
    solver = make_solver(2, 16, 8)
    solver.set_bc(IPHI, bc_type, value=0.7)
    state = solver.allocate()
    top = solver.levels[-1]
    rng = np.random.default_rng(1)
    vals = rng.normal(size=np.asarray(state["cc"][top][IPHI]).shape)
    state["cc"][top] = state["cc"][top].at[IPHI].set(jnp.asarray(vals))
    state = solver.fill_ghost(state, IPHI, lvl=top)
    got = np.asarray(state["cc"][top][IPHI])
    m = solver.maps[top]
    phys = m.dirs[0].phys_loc  # low-x faces
    dr = solver.tree.dr[top][0]
    for loc in phys:
        x1 = vals[loc, 1:-1, 1]
        x2 = vals[loc, 1:-1, 2]
        np.testing.assert_allclose(got[loc, 1:-1, 0],
                                   expect(x1, x2, 0.7, dr), atol=1e-12)


def test_checkerboard_masks_cover_all_cells():
    p = checkerboard_parity(3, 4)
    assert p.shape == (4, 4, 4)
    assert (p == 0).sum() + (p == 1).sum() == 64
    # neighbors have opposite parity
    assert np.all(p[1:, :, :] != p[:-1, :, :])


def test_vlaplacian_matches_laplacian_when_eps_one():
    for op in ("vlaplacian", "vhelmholtz", "ahelmholtz"):
        solver = make_solver(2, 16, 8, operator=op)
        state = solver.allocate()
        top = solver.levels[-1]
        x = solver.cell_centers(top)
        phi = np.sin(2 * np.pi * x[..., 0]) * np.cos(2 * np.pi * x[..., 1])
        cc = state["cc"][top].at[IPHI].set(jnp.asarray(phi))
        for e in range(IVEPS, solver.n_vars):
            cc = cc.at[e].set(1.0)
        state["cc"][top] = cc
        state = solver.apply_operator(state, lam=0.0, i_out=IRES)
        got = np.asarray(state["cc"][top][IRES])

        solver2 = make_solver(2, 16, 8, operator="laplacian")
        state2 = solver2.allocate()
        state2["cc"][top] = state2["cc"][top].at[IPHI].set(jnp.asarray(phi))
        state2 = solver2.apply_operator(state2, i_out=IRES)
        ref = np.asarray(state2["cc"][top][IRES])
        isl = (slice(None),) + (slice(1, -1),) * 2
        np.testing.assert_allclose(got[isl], ref[isl], rtol=1e-12)


def test_helmholtz_lambda_shift():
    solver = make_solver(2, 16, 8, operator="helmholtz")
    state = solver.allocate()
    top = solver.levels[-1]
    rng = np.random.default_rng(2)
    phi = rng.normal(size=np.asarray(state["cc"][top][IPHI]).shape)
    state["cc"][top] = state["cc"][top].at[IPHI].set(jnp.asarray(phi))
    s0 = solver.apply_operator(state, lam=0.0, i_out=IRES)
    s1 = solver.apply_operator(state, lam=3.0, i_out=IRES)
    isl = (slice(None),) + (slice(1, -1),) * 2
    diff = np.asarray(s0["cc"][top][IRES])[isl] \
        - np.asarray(s1["cc"][top][IRES])[isl]
    np.testing.assert_allclose(diff, 3.0 * phi[isl], rtol=1e-12)


def test_jacobi_smoother_converges():
    """Damped Jacobi smoother mode (the reference's commented kernel,
    m_laplacian.f90:116-152) drives the V-cycle to convergence."""
    import jax.numpy as jnp
    solver = make_solver(2, 64, 16, smoother="jacobi")
    state = solver.allocate()
    top = solver.levels[-1]
    rng = np.random.default_rng(7)
    isl = (slice(None),) + (slice(1, -1),) * 2
    rhs = np.zeros(np.asarray(state["cc"][top][IRHS]).shape)
    rhs[isl] = rng.normal(size=rhs[isl].shape)
    state["cc"][top] = state["cc"][top].at[IRHS].set(jnp.asarray(rhs))
    res = []
    for _ in range(8):
        state, r = solver.fas_vcycle(state)
        res.append(float(r))
    # damped Jacobi converges more slowly than GSRB but steadily
    assert res[-1] < res[0] * 1e-4


@pytest.mark.parametrize("periodic", [False, True])
def test_gathered_smoother_bitwise_matches(periodic):
    """cfg.gathered_smoother fuses ghost reads into the sweep; results
    must be bitwise identical to the materialized-ghost path."""
    import jax.numpy as jnp
    states = []
    for gathered in (False, True):
        solver = make_solver(3, 16, 8, periodic=periodic,
                             experimental=MGExperimental(gathered_smoother=gathered))
        state = solver.allocate()
        top = solver.levels[-1]
        rng = np.random.default_rng(9)
        isl = (slice(None),) + (slice(1, -1),) * 3
        rhs = np.zeros(np.asarray(state["cc"][top][IRHS]).shape)
        rhs[isl] = rng.normal(size=rhs[isl].shape)
        state["cc"][top] = state["cc"][top].at[IRHS].set(jnp.asarray(rhs))
        for _ in range(2):
            state, res = solver.fas_vcycle(state)
        states.append((np.asarray(state["cc"][top][IPHI]), float(res)))
    np.testing.assert_array_equal(states[0][0], states[1][0])
    assert states[0][1] == states[1][1]
