"""On-chip throughput of the 2D dense-forest solver vs the boxed solver.

2D counterpart of probe_forest_perf.py: an L-shaped 3-level quadtree
forest (outside the rectangular 2D dense-AMR path's coverage), N FMGs
on both solvers, leaf-unknowns/s.

Usage: python experiments/probe_forest2d_perf.py [base] [box] [n_its]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from octree_mg_tpu import (BCType, IPHI, IRHS, MGConfig, MGSolver,
                           build_rectangle, make_solver)
from octree_mg_tpu.core import tree as tm
from octree_mg_tpu.solve.dense_forest2d import DenseForest2DMGSolver

BASE = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
BOX = int(sys.argv[2]) if len(sys.argv) > 2 else 16
N_ITS = int(sys.argv[3]) if len(sys.argv) > 3 else 16


def _refine(t, lvl, pred):
    ids = t.lvls[lvl].ids
    pick = [int(b) for b in ids if pred(t.ix[int(b)])]
    tm.add_children_bulk(t, np.array(pick, np.int64))
    tm.set_leaves_parents(t, lvl)
    tm.set_next_level_ids(t, lvl)
    tm.set_neighbors_lvl(t, lvl + 1)


def l_forest(base, box):
    nb = base // box
    t = build_rectangle(2, [base] * 2, box, [1.0 / base] * 2, [0] * 2)
    h = (nb + 1) // 2
    _refine(t, 1, lambda ix: ix[0] <= h or ix[1] <= h)
    _refine(t, 2, lambda ix: np.all(ix[:2] <= h))
    tm.finalize_amr(t, 3)
    return t


def leaf_unknowns(t, box):
    return sum(len(t.lvls[l].leaves)
               for l in range(1, t.highest_lvl + 1)) * box ** 2


def time_solver(tag, solve_fmg, n_its):
    st, r0 = solve_fmg(None)
    r0 = float(r0)
    st, r = solve_fmg(st)
    float(r)
    t0 = time.perf_counter()
    for _ in range(n_its):
        st, r = solve_fmg(st)
    r1 = float(r)
    dt = (time.perf_counter() - t0) / n_its
    print(f"{tag}: {dt*1e3:.1f} ms/FMG  res {r0:.3e}->{r1:.3e}",
          flush=True)
    return dt


def main():
    tree = l_forest(BASE, BOX)
    n_unk = leaf_unknowns(tree, BOX)
    per_lvl = {l: (len(tree.lvls[l].ids), len(tree.lvls[l].leaves))
               for l in range(1, tree.highest_lvl + 1)}
    print(f"2D L-forest base={BASE} box={BOX}: boxes/leaves {per_lvl}, "
          f"leaf unknowns {n_unk/1e6:.2f}M", flush=True)

    cfg = MGConfig(operator="laplacian", dtype=jnp.float32, donate=True)
    sd = make_solver(tree, cfg)
    assert isinstance(sd, DenseForest2DMGSolver), type(sd)
    sd.set_bc(0, BCType.DIRICHLET, 0.0)
    std0 = sd.allocate()
    top = sd.levels[-1]
    std0 = sd.set_interior(std0, top, "rhs",
                           jnp.ones(tuple(np.asarray(sd.dims[top])[::-1]),
                                    jnp.float32))

    def run_dense(st):
        if st is None:
            st = std0
        return sd.fas_fmg(st, have_guess=True)

    dt_d = time_solver("dense-forest2d", run_dense, N_ITS)

    sb = MGSolver(tree, MGConfig(operator="laplacian", dtype=jnp.float32,
                                 donate=True))
    sb.set_bc(IPHI, BCType.DIRICHLET, 0.0)
    stb0 = sb.allocate()
    isl = (slice(None),) + (slice(1, -1),) * 2
    for lvl in sb.levels:
        stb0["cc"][lvl] = stb0["cc"][lvl].at[(IRHS,) + isl].set(1.0)

    def run_boxed(st):
        if st is None:
            st = stb0
        return sb.fas_fmg(st, have_guess=True)

    dt_b = time_solver("boxed", run_boxed, max(2, N_ITS // 4))

    print(f"dense-forest2d {n_unk/dt_d/1e6:.1f}M leaf-unknowns/s, "
          f"boxed {n_unk/dt_b/1e6:.1f}M -> speedup {dt_b/dt_d:.1f}x",
          flush=True)


if __name__ == "__main__":
    main()
