"""AMR octree solve (the reference's tests/test_refinement.f90 workflow):
    python examples/amr_refinement.py [n_levels] [box_size] [domain_size] [n_its]
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

from octree_mg_tpu import (IPHI, IRHS, NUM_VARS, MGConfig, MGSolver,
                           build_amr_centered)

N_MODES = 5
ISOL = NUM_VARS


def solution(x):
    out = 1.0
    for d in range(x.shape[-1]):
        out = out * np.sin(2 * np.pi * N_MODES * x[..., d])
    return out


def main():
    n_levels = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    box_size = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    n_its = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    dsz = np.full(2, size)
    tree = build_amr_centered(2, n_levels, dsz, box_size, 1.0 / dsz)
    solver = MGSolver(tree, MGConfig(operator="laplacian", n_extra_vars=1))
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

    for n in range(1, n_its + 1):
        state, res = solver.fas_fmg(state, have_guess=(n > 1))
        err = 0.0
        for lvl in [l for l in solver.levels if l >= 1]:
            locs = solver.maps[lvl].leaf_locs
            if len(locs) == 0:
                continue
            cc = np.asarray(state["cc"][lvl])
            isl = (slice(1, -1),) * 2
            err = max(err, np.max(np.abs(
                cc[IPHI][(locs,) + isl] - cc[ISOL][(locs,) + isl])))
        print(f"{n:4d}  max leaf err {err:.4e}  residual {float(res):.4e}")

    for lvl in solver.levels:
        print(f" lvl_{lvl}: {len(tree.lvls[lvl].ids)} boxes, "
              f"{len(tree.lvls[lvl].leaves)} leaves, box size: "
              f"{tree.box_size_lvl[lvl]}")


if __name__ == "__main__":
    main()
