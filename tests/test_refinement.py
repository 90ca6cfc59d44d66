"""AMR octree parity tests, mirroring the reference
``tests/test_refinement.f90``: nested refinement around the domain center,
Dirichlet-0 exterior, manufactured solution on leaves; the solution field
is restricted and ghost-filled before generating the rhs so that
refinement-boundary ghosts are consistent (:124-145)."""
import jax.numpy as jnp
import numpy as np
import pytest

from octree_mg_tpu import (IPHI, IRES, IRHS, NUM_VARS, BCType, MGConfig,
                           MGSolver, build_amr_centered)

N_MODES = 5
ISOL = NUM_VARS  # extra variable holding the analytic solution


def solution(x):
    out = 1.0
    for d in range(x.shape[-1]):
        out = out * np.sin(2 * np.pi * N_MODES * x[..., d])
    return out


def setup(ndim, n_levels, domain_size, box_size):
    dsz = np.full(ndim, domain_size)
    tree = build_amr_centered(ndim, n_levels, dsz, box_size, 1.0 / dsz)
    cfg = MGConfig(operator="laplacian", n_extra_vars=1)
    solver = MGSolver(tree, cfg)
    state = solver.allocate()

    # i_sol := analytic solution everywhere, restricted + ghost-filled
    for lvl in solver.levels:
        x = solver.cell_centers(lvl)
        state["cc"][lvl] = state["cc"][lvl].at[ISOL].set(
            jnp.asarray(solution(x)))
    state = solver.restrict(state, ISOL)
    state = solver.fill_ghost(state, ISOL)

    # rhs := A(i_sol) using the ghost-consistent field; phi := 0
    for lvl in solver.levels:
        state["cc"][lvl] = state["cc"][lvl].at[IPHI].set(
            state["cc"][lvl][ISOL])
    state = solver.apply_operator(state, i_out=IRHS)
    for lvl in solver.levels:
        state["cc"][lvl] = state["cc"][lvl].at[IPHI].set(0.0)
    return solver, state


def max_leaf_err(solver, state):
    err = 0.0
    for lvl in [l for l in solver.levels if l >= 1]:
        m = solver.maps[lvl]
        if len(m.leaf_locs) == 0:
            continue
        isl = (slice(1, -1),) * solver.ndim
        cc = np.asarray(state["cc"][lvl])
        diff = cc[IPHI][(m.leaf_locs,) + isl] - cc[ISOL][(m.leaf_locs,) + isl]
        err = max(err, float(np.max(np.abs(diff))))
    return err


@pytest.mark.parametrize("ndim,n_levels,size,box", [(2, 3, 64, 16),
                                                    (3, 2, 16, 8)])
def test_amr_fmg_converges_to_discrete_solution(ndim, n_levels, size, box):
    solver, state = setup(ndim, n_levels, size, box)
    errs = []
    for i in range(6):
        state, res = solver.fas_fmg(state, have_guess=(i > 0))
        errs.append(max_leaf_err(solver, state))
    # the rhs is generated from the discrete operator on i_sol, so the
    # discrete solution equals i_sol: FMG must drive the leaf error to
    # ~machine zero, with the first cycle already small
    assert errs[0] < 5e-2
    assert errs[-1] < 1e-9
    # residual converges
    rhs_scale = max(float(jnp.max(jnp.abs(state["cc"][lvl][IRHS])))
                    for lvl in solver.levels)
    assert float(res) < 1e-7 * rhs_scale


def test_amr_vcycles_match_fmg_2d():
    solver, state = setup(2, 3, 64, 16)
    for _ in range(10):
        state, res = solver.fas_vcycle(state)
    err_v = max_leaf_err(solver, state)

    solver2, state2 = setup(2, 3, 64, 16)
    for i in range(10):
        state2, _ = solver2.fas_fmg(state2, have_guess=(i > 0))
    err_f = max_leaf_err(solver2, state2)
    # both converge to the same discrete solution
    assert abs(err_v - err_f) < 1e-6 * max(err_v, 1e-10) + 1e-9


def test_amr_mixed_bc_types():
    """Refinement x BC-type interaction (the reference's
    test_refinement runs Dirichlet only; bc_to_gc handles three types,
    m_ghost_cells.f90:682-698): Neumann on x faces, continuous on y
    faces, Dirichlet on z — the discretely-generated rhs must converge
    back to the manufactured field to machine zero on an AMR tree."""
    ndim, n_levels, size, box = 3, 2, 16, 8
    dsz = np.full(ndim, size)
    tree = build_amr_centered(ndim, n_levels, dsz, box, 1.0 / dsz)
    cfg = MGConfig(operator="laplacian", n_extra_vars=1)
    solver = MGSolver(tree, cfg)
    for iv in (IPHI, ISOL):
        solver.set_bc(iv, BCType.NEUMANN, 0.3, nb=0)
        solver.set_bc(iv, BCType.NEUMANN, -0.1, nb=1)
        solver.set_bc(iv, BCType.CONTINUOUS, nb=2)
        solver.set_bc(iv, BCType.CONTINUOUS, nb=3)
        solver.set_bc(iv, BCType.DIRICHLET, 0.5, nb=4)
        solver.set_bc(iv, BCType.DIRICHLET, -0.25, nb=5)
    state = solver.allocate()
    for lvl in solver.levels:
        x = solver.cell_centers(lvl)
        state["cc"][lvl] = state["cc"][lvl].at[ISOL].set(
            jnp.asarray(solution(x)))
    state = solver.restrict(state, ISOL)
    state = solver.fill_ghost(state, ISOL)
    for lvl in solver.levels:
        state["cc"][lvl] = state["cc"][lvl].at[IPHI].set(
            state["cc"][lvl][ISOL])
    state = solver.apply_operator(state, i_out=IRHS)
    for lvl in solver.levels:
        state["cc"][lvl] = state["cc"][lvl].at[IPHI].set(0.0)
    errs = []
    for i in range(16):
        state, res = solver.fas_fmg(state, have_guess=(i > 0))
        errs.append(max_leaf_err(solver, state))
    # Neumann/continuous faces smooth slower than Dirichlet (~3-6x per
    # FMG instead of ~10x) but converge to the same machine-level
    # discrete solution (verified to 5e-13 at 24 cycles)
    assert errs[-1] < 1e-8, errs
    assert errs[0] / errs[-1] > 1e6, errs


def test_amr_periodic_exterior():
    """Periodic exterior + refinement: the singular fully-periodic
    laplacian rides subtract_mean (m_multigrid.f90:237-239); the leaf
    error modulo the mean must reach machine zero."""
    ndim, n_levels, size, box = 3, 2, 16, 8
    dsz = np.full(ndim, size)
    tree = build_amr_centered(ndim, n_levels, dsz, box, 1.0 / dsz,
                              periodic=[True] * ndim)
    assert tree.subtract_mean
    cfg = MGConfig(operator="laplacian", n_extra_vars=1)
    solver = MGSolver(tree, cfg)
    state = solver.allocate()
    for lvl in solver.levels:
        x = solver.cell_centers(lvl)
        state["cc"][lvl] = state["cc"][lvl].at[ISOL].set(
            jnp.asarray(solution(x)))
    state = solver.restrict(state, ISOL)
    state = solver.fill_ghost(state, ISOL)
    for lvl in solver.levels:
        state["cc"][lvl] = state["cc"][lvl].at[IPHI].set(
            state["cc"][lvl][ISOL])
    state = solver.apply_operator(state, i_out=IRHS)
    for lvl in solver.levels:
        state["cc"][lvl] = state["cc"][lvl].at[IPHI].set(0.0)

    def leaf_diffs():
        out = []
        for lvl in [l for l in solver.levels if l >= 1]:
            m = solver.maps[lvl]
            if len(m.leaf_locs) == 0:
                continue
            isl = (slice(1, -1),) * ndim
            cc = np.asarray(state["cc"][lvl])
            out.append((cc[IPHI][(m.leaf_locs,) + isl]
                        - cc[ISOL][(m.leaf_locs,) + isl]).ravel())
        return np.concatenate(out)

    for i in range(8):
        state, res = solver.fas_fmg(state, have_guess=(i > 0))
    d = leaf_diffs()
    err = np.max(np.abs(d - d.mean()))
    assert err < 1e-9, err
