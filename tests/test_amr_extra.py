"""Cross-coverage: AMR with other dimensions/operators than the main
refinement test."""
import jax.numpy as jnp
import numpy as np
import pytest

from octree_mg_tpu import (IPHI, IRHS, IVEPS, NUM_VARS, BCType, MGConfig,
                           MGSolver, build_amr_centered, build_rectangle)

ISOL = NUM_VARS


def manufactured(x):
    out = 1.0
    for d in range(x.shape[-1]):
        out = out * np.sin(2 * np.pi * 3 * x[..., d])
    return out


def test_amr_1d():
    """1D refinement-boundary scheme (sides_rb 1D: (2*gc+inner)/3,
    m_ghost_cells.f90:797-800)."""
    tree = build_amr_centered(1, 3, [64], 16, [1 / 64])
    solver = MGSolver(tree, MGConfig(operator="laplacian", n_extra_vars=1))
    state = solver.allocate()
    for lvl in solver.levels:
        x = solver.cell_centers(lvl)
        state["cc"][lvl] = state["cc"][lvl].at[ISOL].set(
            jnp.asarray(manufactured(x)))
    state = solver.restrict(state, ISOL)
    state = solver.fill_ghost(state, ISOL)
    for lvl in solver.levels:
        state["cc"][lvl] = state["cc"][lvl].at[IPHI].set(
            state["cc"][lvl][ISOL])
    state = solver.apply_operator(state, i_out=IRHS)
    for lvl in solver.levels:
        state["cc"][lvl] = state["cc"][lvl].at[IPHI].set(0.0)
    for i in range(8):
        state, res = solver.fas_fmg(state, have_guess=(i > 0))
    err = 0.0
    for lvl in [l for l in solver.levels if l >= 1]:
        locs = solver.maps[lvl].leaf_locs
        if len(locs) == 0:
            continue
        cc = np.asarray(state["cc"][lvl])
        err = max(err, float(np.max(np.abs(
            cc[IPHI][locs, 1:-1] - cc[ISOL][locs, 1:-1]))))
    assert err < 1e-8, err


def test_amr_vlaplacian_2d():
    """Variable-coefficient operator on an AMR tree: eps restricted to all
    levels + Neumann-zero ghosts (the m_vlaplacian usage pattern)."""
    tree = build_amr_centered(2, 2, [32, 32], 8, [1 / 32] * 2)
    solver = MGSolver(tree, MGConfig(operator="vlaplacian"))
    state = solver.allocate()
    for lvl in solver.levels:
        x = solver.cell_centers(lvl)
        eps = 1.0 + 0.5 * x[..., 0]
        state["cc"][lvl] = state["cc"][lvl].at[IVEPS].set(jnp.asarray(eps))
    state = solver.restrict(state, IVEPS)
    state = solver.fill_ghost(state, IVEPS)

    # manufactured discrete problem: rhs = A(sol)
    for lvl in solver.levels:
        x = solver.cell_centers(lvl)
        state["cc"][lvl] = state["cc"][lvl].at[IPHI].set(
            jnp.asarray(manufactured(x)))
    state = solver.restrict(state, IPHI)
    state = solver.fill_ghost(state, IPHI)
    sols = {lvl: state["cc"][lvl][IPHI] for lvl in solver.levels}
    state = solver.apply_operator(state, i_out=IRHS)
    for lvl in solver.levels:
        state["cc"][lvl] = state["cc"][lvl].at[IPHI].set(0.0)
    residuals = []
    for i in range(10):
        state, res = solver.fas_fmg(state, have_guess=(i > 0))
        residuals.append(float(res))
    assert residuals[-1] < 1e-6 * max(residuals[0], 1.0), residuals
    err = 0.0
    for lvl in [l for l in solver.levels if l >= 1]:
        locs = solver.maps[lvl].leaf_locs
        if len(locs) == 0:
            continue
        isl = (slice(1, -1),) * 2
        diff = np.asarray(state["cc"][lvl][IPHI])[(locs,) + isl] \
            - np.asarray(sols[lvl])[(locs,) + isl]
        err = max(err, float(np.max(np.abs(diff))))
    assert err < 1e-7, err


def test_free_space_on_amr_tree():
    """Free-space driver picks the coarsest uniform level on a partially
    refined tree (mg_highest_uniform_lvl path, m_free_space.f90:84-92)."""
    from scipy.special import erf
    from octree_mg_tpu.solve.free_space import FreeSpacePoisson3D

    tree = build_amr_centered(3, 2, [32, 32, 32], 8, [1 / 32] * 3)
    solver = MGSolver(tree, MGConfig(operator="laplacian"))
    state = solver.allocate()
    sigma, r0 = 0.1, np.array([0.5] * 3)
    isl = (slice(None),) + (slice(1, -1),) * 3
    for lvl in solver.levels:
        x = solver.cell_centers(lvl)
        r = np.linalg.norm(x - r0, axis=-1)
        rhs = np.zeros(r.shape)
        rhs[isl] = (-1.0 / (sigma ** 3 * np.pi ** 1.5)
                    * np.exp(-(r[isl] / sigma) ** 2))
        state["cc"][lvl] = state["cc"][lvl].at[IRHS].set(jnp.asarray(rhs))
    fs = FreeSpacePoisson3D(solver, max_fft_frac=0.5)
    errs = []
    for n in range(4):
        state, res = fs.solve(state, new_rhs=(n == 0))
        # error on the refined center region (lvl 2 leaves)
        lvl = 2
        locs = solver.maps[lvl].leaf_locs
        x = solver.cell_centers(lvl)
        r = np.linalg.norm(x - r0, axis=-1)
        rs = np.where(r > 1e-12, r, 1.0)
        sol = erf(rs / sigma) / (4 * np.pi * rs)
        phi = np.asarray(state["cc"][lvl][IPHI])
        isl2 = (slice(1, -1),) * 3
        errs.append(float(np.max(np.abs(
            phi[(locs,) + isl2] - sol[(locs,) + isl2]))))
    assert errs[-1] < 2e-2, errs
