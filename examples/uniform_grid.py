"""Uniform-grid Poisson solve with a manufactured solution.

The library-API version of the reference's tests/test_uniform_grid.f90:
    python examples/uniform_grid.py [box_size] [domain_size] [ndim] [n_its] [fmg]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    # the preloaded axon backend ignores the env var; force it here so
    # `JAX_PLATFORMS=cpu python examples/...` works as documented
    jax.config.update("jax_platforms", "cpu")
if jax.default_backend() == "cpu":
    jax.config.update("jax_enable_x64", True)  # float64 parity workflow

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from octree_mg_tpu import (IPHI, IRES, IRHS, BCType, MGConfig, MGSolver,
                           build_rectangle)

N_MODES = 5


def solution(x):
    out = 1.0
    for d in range(x.shape[-1]):
        out = out * np.sin(2 * np.pi * N_MODES * x[..., d])
    return out


def main():
    box_size = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    ndim = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    n_its = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    fmg = (sys.argv[5].lower() in ("t", "true", "1")) \
        if len(sys.argv) > 5 else True

    dsz = np.full(ndim, size)
    t0 = time.perf_counter()
    tree = build_rectangle(ndim, dsz, box_size, 1.0 / dsz, np.zeros(ndim))
    solver = MGSolver(tree, MGConfig(operator="laplacian"))
    solver.set_bc(IPHI, BCType.DIRICHLET, fn=solution)
    state = solver.allocate()
    print(f"mesh construction + maps (s) {time.perf_counter() - t0:.3f}")

    # rhs = A(exact solution), phi = 0
    for lvl in solver.levels:
        x = solver.cell_centers(lvl)
        state["cc"][lvl] = state["cc"][lvl].at[IPHI].set(
            jnp.asarray(solution(x)))
    state = solver.apply_operator(state, i_out=IRHS)
    for lvl in solver.levels:
        state["cc"][lvl] = state["cc"][lvl].at[IPHI].set(0.0)

    top = solver.levels[-1]
    x_top = solver.cell_centers(top)
    sol_top = solution(x_top)
    isl = (slice(None),) + (slice(1, -1),) * ndim

    t0 = time.perf_counter()
    for n in range(1, n_its + 1):
        if fmg:
            state, res = solver.fas_fmg(state, have_guess=(n > 1))
        else:
            state, res = solver.fas_vcycle(state)
        err = np.max(np.abs(np.asarray(state["cc"][top][IPHI])[isl]
                            - sol_top[isl]))
        print(f"{n:4d}  max solution error {err:.4e}  max residual "
              f"{float(res):.4e}")
    jax.block_until_ready(res)
    dt = time.perf_counter() - t0

    n_boxes = sum(solver.static[l]["n_boxes"] for l in solver.levels)
    print(f"cycle type        {'FMG' if fmg else 'V-cycle'}")
    print(f"problem_size      {tuple(int(x) for x in dsz)}")
    print(f"box_size          {box_size}")
    print(f"n_iterations      {n_its}")
    print(f"time/iteration    {dt / n_its:.5f}")
    print(f"unknowns/microsec {1e-6 * n_its * n_boxes * box_size**ndim / dt:.2f}")
    solver.timers.show()


if __name__ == "__main__":
    main()
