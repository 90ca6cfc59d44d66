"""Dense-patch AMR solve (the TPU-native AMR fast path):
    python examples/dense_amr.py [n_levels] [box_size] [domain_size] [n_its]

Builds the reference AMR test's nested centered tree
(tests/test_refinement.f90:191-247), routes it through make_solver —
which picks the dense-patch AMR solver for rectangular levels — and
converges a manufactured solution, printing the max leaf error and
residual per FMG cycle.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")
if jax.default_backend() == "cpu":
    jax.config.update("jax_enable_x64", True)  # float64 parity workflow

import numpy as np
import jax.numpy as jnp

from octree_mg_tpu import (BCType, DenseAMRMGSolver, MGConfig,
                           build_amr_centered, make_solver)

N_MODES = 2


def solution(x):
    out = 1.0
    for d in range(x.shape[-1]):
        out = out * np.sin(2 * np.pi * N_MODES * x[..., d])
    return out


def main():
    n_levels = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    box_size = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    n_its = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    dsz = np.full(3, size)
    tree = build_amr_centered(3, n_levels, dsz, box_size, 1.0 / dsz)
    solver = make_solver(tree, MGConfig(operator="laplacian"))
    assert isinstance(solver, DenseAMRMGSolver), "dense AMR path expected"
    solver.set_bc(0, BCType.DIRICHLET, fn=solution)
    state = solver.allocate()
    print("patches:", {l: solver.dims[l] for l in solver.levels
                       if l >= 1})

    # discretely-generated rhs: rhs = A(phi_exact) per level
    for lvl in solver.levels:
        x = solver.cell_centers(lvl)
        state = solver.set_interior(state, lvl, "phi",
                                    jnp.asarray(solution(x)))
    state = solver.apply_operator(state, lam=0.0, out_key="rhs")
    for lvl in solver.levels:
        state = solver.set_interior(
            state, lvl, "phi",
            jnp.zeros_like(solver.interior(state, lvl, "phi")))

    top = solver.levels[-1]
    x_top = solver.cell_centers(top)
    exact = solution(x_top)
    for it in range(n_its):
        state, res = solver.fas_fmg(state, have_guess=(it > 0))
        err = float(jnp.max(jnp.abs(
            solver.interior(state, top, "phi") - jnp.asarray(exact))))
        print(f"FMG {it + 1}: max residual {float(res):.3e}, "
              f"top-level error {err:.4e}", flush=True)


if __name__ == "__main__":
    main()
