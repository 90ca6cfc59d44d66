"""2D cylindrical (r,z) Laplacian tests (box_clpl/box_gs_clpl,
m_laplacian.f90:197-271)."""
import jax.numpy as jnp
import numpy as np

from octree_mg_tpu import (IPHI, IRES, IRHS, BCType, MGConfig, MGSolver,
                           build_rectangle)


def make_solver(size):
    # r in [1, 2], z in [0, 1] (away from the axis)
    dsz = np.array([size, size])
    dr = np.array([1.0 / size, 1.0 / size])
    tree = build_rectangle(2, dsz, 8, dr, np.array([1.0, 0.0]))
    return MGSolver(tree, MGConfig(operator="laplacian",
                                   geometry="cylindrical"))


def sol_fn(x):
    r, z = x[..., 0], x[..., 1]
    return r ** 2 * np.sin(2 * np.pi * z)


def rhs_fn(x):
    # (1/r) d/dr(r d/dr) (r^2) = 4;  d2/dz2 -> -(2 pi)^2 r^2
    r, z = x[..., 0], x[..., 1]
    return (4.0 - (2 * np.pi) ** 2 * r ** 2) * np.sin(2 * np.pi * z)


def test_cylindrical_operator_consistency():
    errs = []
    for size in (32, 64):
        solver = make_solver(size)
        state = solver.allocate()
        top = solver.levels[-1]
        x = solver.cell_centers(top)
        state["cc"][top] = state["cc"][top].at[IPHI].set(
            jnp.asarray(sol_fn(x)))
        state = solver.apply_operator(state, i_out=IRES)
        isl = (slice(None),) + (slice(1, -1),) * 2
        got = np.asarray(state["cc"][top][IRES])[isl]
        errs.append(np.max(np.abs(got - rhs_fn(x)[isl])))
    assert errs[0] / errs[1] > 3.5  # second-order


def run_solve(size):
    solver = make_solver(size)
    solver.set_bc(IPHI, BCType.DIRICHLET, fn=sol_fn)
    state = solver.allocate()
    isl = (slice(None),) + (slice(1, -1),) * 2
    for lvl in solver.levels:
        x = solver.cell_centers(lvl)
        rhs = np.zeros(x.shape[:-1])
        rhs[isl] = rhs_fn(x)[isl]
        state["cc"][lvl] = state["cc"][lvl].at[IRHS].set(jnp.asarray(rhs))
    for i in range(8):
        state, res = solver.fas_fmg(state, have_guess=(i > 0))
    top = solver.levels[-1]
    x = solver.cell_centers(top)
    err = np.max(np.abs(np.asarray(state["cc"][top][IPHI])[isl]
                        - sol_fn(x)[isl]))
    rhs_scale = float(jnp.max(jnp.abs(state["cc"][top][IRHS])))
    return err, float(res) / rhs_scale


def test_cylindrical_solve_second_order():
    err32, rel32 = run_solve(32)
    err64, rel64 = run_solve(64)
    # converged discrete solves, second-order discretization error
    assert rel64 < 1e-7
    assert err32 / err64 > 3.5, (err32, err64)
    assert err64 < 5e-3