"""On-chip throughput of f64-class refined solves on AMR/forest trees.

VERDICT r3 task 2b's perf bar: solve_refined on a 3-level AMR tree and
an L-forest reaching f64-class residual at >1e9 leaf-unknowns/s.  Times
the fused outer step (df composite residual + restriction + accumulate)
plus the inner forest FMG, amortized over n_outer with no per-outer
syncs (rtol=0), and reports leaf-unknowns/s per outer iteration —
each outer contracts the TRUE residual by the inner FMG's factor
(~10-40x), like one reference f64 FMG does.

Usage: python experiments/probe_refine_forest_perf.py [base] [box] [n_outer]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from octree_mg_tpu import BCType, MGConfig, build_amr_centered, build_rectangle
from octree_mg_tpu.core import tree as tm
from octree_mg_tpu.ops.df32 import split_f64
from octree_mg_tpu.solve.dense_forest import DenseForestMGSolver
from octree_mg_tpu.solve.refine_forest import RefinedForestPoisson

BASE = int(sys.argv[1]) if len(sys.argv) > 1 else 256
BOX = int(sys.argv[2]) if len(sys.argv) > 2 else 16
N_OUTER = int(sys.argv[3]) if len(sys.argv) > 3 else 6


def _refine(t, lvl, pred):
    ids = t.lvls[lvl].ids
    pick = [int(b) for b in ids if pred(t.ix[int(b)])]
    tm.add_children_bulk(t, np.array(pick, np.int64))
    tm.set_leaves_parents(t, lvl)
    tm.set_next_level_ids(t, lvl)
    tm.set_neighbors_lvl(t, lvl + 1)


def l_forest(base, box):
    """L-shaped (non-rectangular) lvl-2 footprint, z-capped so the fine
    canvas is [~base, 2*base, 2*base] — bounds peak HBM at 256-base."""
    nb = base // box
    t = build_rectangle(3, [base] * 3, box, [1.0 / base] * 3, [0] * 3)
    h = (nb + 1) // 2
    _refine(t, 1, lambda ix: (ix[0] <= h or ix[1] <= h) and ix[2] <= h)
    tm.finalize_amr(t, 2)
    return t


def leaf_unknowns(t, box):
    return sum(len(t.lvls[l].leaves)
               for l in range(1, t.highest_lvl + 1)) * box ** 3


def run(tag, tree, cadence="half"):
    n_unk = leaf_unknowns(tree, BOX)
    sv = DenseForestMGSolver(tree, MGConfig(operator="laplacian",
                                            dtype=jnp.float32,
                                            donate=True))
    sv.set_bc(0, BCType.DIRICHLET, 0.0)
    ref = RefinedForestPoisson(sv, inner_ghost_refresh=cadence)
    rng = np.random.default_rng(0)
    rh, rl = {}, {}
    for lvl in sv.levels:
        X, Y, Z = sv.dims[lvl]
        h, l = split_f64(rng.normal(size=(Z, Y, X)))
        # pre-transfer: timing the tunnel's ~25 MB/s host->device copy
        # instead of compute was this probe's first-version artifact
        rh[lvl] = jax.device_put(jnp.asarray(h, jnp.float32))
        rl[lvl] = jax.device_put(jnp.asarray(l, jnp.float32))
    # warm (compiles step + FMG)
    _, norms, _ = ref.solve(sv.allocate(), rh, rl, n_outer=2)
    t0 = time.perf_counter()
    _, norms, _ = ref.solve(sv.allocate(), rh, rl, n_outer=N_OUTER)
    dt = (time.perf_counter() - t0) / N_OUTER
    rate = n_unk / dt
    print(f"{tag}: {n_unk/1e6:.1f}M leaf unknowns, {dt*1e3:.1f} ms/outer"
          f" -> {rate/1e9:.2f}e9 leaf-unknowns/s f64-class; "
          f"residual {norms[0]:.3e}->{norms[-1]:.3e} "
          f"({(norms[0]/max(norms[-1],1e-30))**(1/max(1,len(norms)-1)):.0f}x"
          f"/outer)", flush=True)
    return rate


def main():
    run("L-forest 2-lvl", l_forest(BASE, BOX))
    run("L-forest 2-lvl [pair cadence]", l_forest(BASE, BOX),
        cadence="pair")
    run("AMR centered 3-lvl",
        build_amr_centered(3, 3, np.full(3, BASE), BOX,
                           np.full(3, 1.0 / BASE)))


if __name__ == "__main__":
    main()
