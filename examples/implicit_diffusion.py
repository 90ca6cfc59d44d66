"""Implicit heat-equation stepping (m_diffusion.f90 workflow):
    python examples/implicit_diffusion.py [order] [n_steps]
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

import numpy as np
import jax.numpy as jnp

from octree_mg_tpu import IPHI, MGConfig, MGSolver, build_rectangle
from octree_mg_tpu.solve import diffusion


def main():
    order = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    D = 1.0
    k2 = 2 * (2 * np.pi) ** 2
    dt = 0.2 / k2
    dsz = np.full(2, 64)
    tree = build_rectangle(2, dsz, 16, 1.0 / dsz, np.zeros(2),
                           periodic=[True, True])
    solver = MGSolver(tree, MGConfig(operator="helmholtz"))
    state = solver.allocate()
    for lvl in solver.levels:
        x = solver.cell_centers(lvl)
        f = np.sin(2 * np.pi * x[..., 0]) * np.cos(2 * np.pi * x[..., 1])
        state["cc"][lvl] = state["cc"][lvl].at[IPHI].set(jnp.asarray(f))
    state = solver.fill_ghost(state, IPHI)

    top = solver.levels[-1]
    isl = (slice(None),) + (slice(1, -1),) * 2
    x = solver.cell_centers(top)
    base = np.sin(2 * np.pi * x[..., 0]) * np.cos(2 * np.pi * x[..., 1])
    for n in range(1, n_steps + 1):
        state, res = diffusion.diffusion_solve(solver, state, dt, D,
                                               order=order, max_res=1e-9)
        exact = np.exp(-D * k2 * dt * n) * base
        err = np.max(np.abs(np.asarray(state["cc"][top][IPHI])[isl]
                            - exact[isl]))
        print(f"step {n}: residual {res:.2e}, error vs analytic decay "
              f"{err:.4e}")


if __name__ == "__main__":
    main()
