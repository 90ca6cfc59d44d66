"""f64-class Poisson solve at f32 speed (iterative refinement).

The reference computes in float64 (m_data_structures.f90:8); TPUs have
no hardware f64.  This example runs the double-float refinement driver
(solve/refine + ops/df32) and prints the true f64-class outer residual
per iteration — it keeps contracting ~1.5-2 orders per outer, far past
the ~1e-6 relative floor a plain f32 solve hits.

    python examples/refined_precision.py [domain_size] [box_size] [n_outer]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from octree_mg_tpu import (BCType, MGConfig, build_rectangle, make_solver,
                           split_f64, solve_refined)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    box = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_outer = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    dsz = np.full(3, size)
    tree = build_rectangle(3, dsz, box, 1.0 / dsz, np.zeros(3))
    # the inner solver is f32 and carries the HOMOGENEOUS error
    # equation; the true boundary values go through bc_values below
    solver = make_solver(tree, MGConfig(operator="laplacian",
                                        dtype=jnp.float32))
    solver.set_bc(0, BCType.DIRICHLET, 0.0)
    state = solver.allocate()

    rng = np.random.default_rng(0)
    rhs64 = rng.normal(size=(size,) * 3)
    rhi, rlo = split_f64(rhs64)  # exact f32 pair of the f64 rhs

    bvals = [0.5, -0.25, 0.1, 0.3, 0.0, 1.0]
    xhi, xlo, norms, state = solve_refined(
        solver, state, rhi, rlo, n_outer=n_outer, bc_values=bvals)

    print(f"refined Poisson {size}^3, box {box}, Dirichlet {bvals}")
    for i, n in enumerate(norms):
        print(f"  outer {i:2d}: max|r_f64| = {n:.6e}"
              + ("" if i == 0 else f"   ({norms[i-1]/max(n,1e-300):.1f}x)"))
    rel = norms[-1] / norms[0]
    print(f"final relative residual {rel:.3e} "
          f"({'f64-class' if rel < 1e-9 else 'still contracting'})")
    x64 = np.asarray(xhi, np.float64) + np.asarray(xlo, np.float64)
    print(f"solution range [{x64.min():.6f}, {x64.max():.6f}]")


if __name__ == "__main__":
    main()
