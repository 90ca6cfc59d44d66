"""3D free-space Poisson solve of a Gaussian charge (the reference's
tests/test_free_space.f90 workflow):
    python examples/free_space_gaussian.py [box_size] [domain_size] [fft_frac]
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
from scipy.special import erf

from octree_mg_tpu import IPHI, IRHS, MGConfig, MGSolver, build_rectangle
from octree_mg_tpu.solve.free_space import FreeSpacePoisson3D

SIGMA = 0.1
R0 = np.array([0.5, 0.5, 0.5])


def main():
    box_size = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    fft_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15
    kernel = sys.argv[4] if len(sys.argv) > 4 else "igf"  # or "spectral"

    dsz = np.full(3, size)
    tree = build_rectangle(3, dsz, box_size, 1.0 / dsz, np.zeros(3))
    solver = MGSolver(tree, MGConfig(operator="laplacian"))
    state = solver.allocate()
    isl = (slice(None),) + (slice(1, -1),) * 3
    for lvl in solver.levels:
        x = solver.cell_centers(lvl)
        r = np.linalg.norm(x - R0, axis=-1)
        rhs = np.zeros(r.shape)
        rhs[isl] = (-1.0 / (SIGMA ** 3 * np.pi ** 1.5)
                    * np.exp(-(r[isl] / SIGMA) ** 2))
        state["cc"][lvl] = state["cc"][lvl].at[IRHS].set(jnp.asarray(rhs))

    fs = FreeSpacePoisson3D(solver, max_fft_frac=fft_frac,
                            kernel=kernel)
    top = solver.levels[-1]
    x = solver.cell_centers(top)
    r = np.linalg.norm(x - R0, axis=-1)
    rsafe = np.where(r > 1e-12, r, 1.0)
    sol = erf(rsafe / SIGMA) / (4 * np.pi * rsafe)

    for n in range(5):
        state, res = fs.solve(state, new_rhs=(n == 0), fmg_cycle=True)
        phi = np.asarray(state["cc"][top][IPHI])[isl]
        diff = phi - sol[isl]
        print(f"{n + 1}  max err {np.max(np.abs(diff)):.4e}  "
              f"L2 err {np.sqrt(np.mean(diff ** 2)):.4e}  "
              f"residual {float(res):.4e}")


if __name__ == "__main__":
    main()
