"""Throughput smoke test — the reference's tests/test_performance.f90
workflow (Dirichlet-0, rhs=1, N cycles, unknowns/microsec + timer table)
at a CI-friendly size.  The real benchmark is bench.py on TPU."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from octree_mg_tpu import IRHS, MGConfig, MGSolver, build_rectangle


def test_performance_smoke_3d():
    size, box, n_its = 32, 16, 4
    dsz = np.full(3, size)
    tree = build_rectangle(3, dsz, box, 1.0 / dsz, np.zeros(3))
    solver = MGSolver(tree, MGConfig(operator="laplacian"))
    state = solver.allocate()
    top = solver.levels[-1]
    isl = (slice(None),) + (slice(1, -1),) * 3
    state["cc"][top] = state["cc"][top].at[IRHS].set(
        state["cc"][top][IRHS].at[isl].set(1.0))

    state, res = solver.fas_vcycle(state)  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(n_its):
        state, res = solver.fas_vcycle(state)
    jax.block_until_ready(res)
    dt = time.perf_counter() - t0

    n_boxes = sum(solver.static[l]["n_boxes"] for l in solver.levels)
    n_unknowns = float(n_boxes) * box ** 3
    rate = 1e-6 * n_its * n_unknowns / dt
    print(f"\nunknowns/microsec {rate:.3f}")
    solver.timers.show()
    assert np.isfinite(float(res))
    assert rate > 0


def test_phase_report_both_paths():
    """The reference's 7-phase timer table (m_multigrid.f90:72-81,
    mg_timers_show) via utils.phases.phase_report, on both solver
    paths."""
    from octree_mg_tpu.solve.dense import make_solver
    from octree_mg_tpu.utils.phases import phase_report

    size, box = 32, 8
    dsz = np.full(3, size)
    tree = build_rectangle(3, dsz, box, 1.0 / dsz, np.zeros(3))

    dense = make_solver(tree, MGConfig(operator="laplacian"))
    assert type(dense).__name__ == "DenseMGSolver"
    st = dense.allocate()
    st = dense.set_interior(st, dense.levels[-1], "rhs",
                            jnp.ones((size,) * 3, dense.cfg.dtype))
    t = phase_report(dense, st, show=False)
    for phase in ("smoother(+gc) [1 cycle]", "smoother ghost-cells",
                  "update-coarse", "correct", "coarse-solve",
                  "total FMG cycle"):
        assert phase in t._acc, phase

    boxed = MGSolver(tree, MGConfig(operator="laplacian"))
    stb = boxed.allocate()
    t = phase_report(boxed, stb, show=False)
    assert "coarse-solve" in t._acc and "smoother ghost-cells" in t._acc
