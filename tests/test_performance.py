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
