"""2D AMR perf probe on the real chip: boxed vs dense-patch FMG.

3-level centered quadtree (build_amr_centered), leaf unknowns =
lvl3 cells + uncovered lvl2 + uncovered lvl1.  Timing per CLAUDE.md:
>= 4 jitted FMGs per measurement, ends with a device->host scalar read.
"""
import sys
import time

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from octree_mg_tpu import (BCType, IPHI, MGConfig, MGSolver,
                           build_amr_centered)
from octree_mg_tpu.solve.dense_amr2d import Dense2DAMRMGSolver

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
BOX = int(sys.argv[2]) if len(sys.argv) > 2 else 16
N_LEVELS = 3
REPS = 8


def leaf_unknowns(tree):
    n = 0
    for lvl in range(1, tree.highest_lvl + 1):
        n += len(tree.lvls[lvl].leaves) * tree.box_size_lvl[lvl] ** 2
    return n


def run(kind):
    dsz = np.full(2, SIZE)
    tree = build_amr_centered(2, N_LEVELS, dsz, BOX, 1.0 / dsz)
    cfg = MGConfig(operator="laplacian", dtype=jnp.float32)
    if kind == "dense":
        sv = Dense2DAMRMGSolver(tree, cfg)
        sv.set_bc(0, BCType.DIRICHLET, 0.0)
        st = sv.allocate()
        for lvl in sv.levels:
            st = sv.set_interior(st, lvl, "rhs",
                                 jnp.ones(sv.dims[lvl][::-1],
                                          jnp.float32))
    else:
        sv = MGSolver(tree, cfg)
        sv.set_bc(IPHI, BCType.DIRICHLET, 0.0)
        st = sv.allocate()
        for lvl in sv.levels:
            st["cc"][lvl] = st["cc"][lvl].at[1].set(1.0)
    st, res = sv.fas_fmg(st)
    res0 = float(res)
    st, res = sv.fas_fmg(st, have_guess=True)
    _ = float(res)
    t0 = time.perf_counter()
    for _ in range(REPS):
        st, res = sv.fas_fmg(st, have_guess=True)
    r = float(res)
    dt = (time.perf_counter() - t0) / REPS
    lups = leaf_unknowns(sv.tree) / dt
    print(f"{kind:6s} {N_LEVELS}-lvl base {SIZE}^2 box {BOX}: "
          f"{dt*1e3:8.2f} ms/FMG {lups:.3e} leaf-unknowns/s "
          f"res {res0:.2e}->{r:.2e}", flush=True)
    return dt


def main():
    td = run("dense")
    if "--with-boxed" in sys.argv:
        tb = run("boxed")
        print(f"speedup: {tb / td:.1f}x")


if __name__ == "__main__":
    main()
