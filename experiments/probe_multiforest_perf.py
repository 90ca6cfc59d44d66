"""On-chip throughput of the multi-canvas forest solver vs boxed.

VERDICT r3 task 3's perf bar: a scattered 8-patch forest at <10% fill
must run dense >= 10x the boxed fallback.  Builds a 256^3-base tree
with 8 isolated 2x2x2-box patches at lattice corners (lvl-2 bounding
box fill ~1.6%), runs N FMGs on both solvers, reports leaf-unknowns/s.

Usage: python experiments/probe_multiforest_perf.py [base] [box] [n_its]
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
from octree_mg_tpu.solve.dense_forest import _LevelGeom
from octree_mg_tpu.solve.dense_multiforest import DenseMultiForestMGSolver

BASE = int(sys.argv[1]) if len(sys.argv) > 1 else 256
BOX = int(sys.argv[2]) if len(sys.argv) > 2 else 16
N_ITS = int(sys.argv[3]) if len(sys.argv) > 3 else 8


def scattered_tree(base, box):
    nb = base // box
    t = build_rectangle(3, [base] * 3, box, [1.0 / base] * 3, [0] * 3)
    lo = {2, 3}
    hi = {nb - 2, nb - 1}
    corners = lo | hi

    def pred(ix):
        return all(v in corners for v in ix)

    ids = t.lvls[1].ids
    pick = [int(b) for b in ids if pred(t.ix[int(b)])]
    tm.add_children_bulk(t, np.array(pick, np.int64))
    tm.set_leaves_parents(t, 1)
    tm.set_next_level_ids(t, 1)
    tm.set_neighbors_lvl(t, 2)
    tm.finalize_amr(t, 2)
    return t


def leaf_unknowns(t, box):
    return sum(len(t.lvls[l].leaves)
               for l in range(1, t.highest_lvl + 1)) * box ** 3


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
    tree = scattered_tree(BASE, BOX)
    n_unk = leaf_unknowns(tree, BOX)
    g2 = _LevelGeom(tree, 2)
    print(f"scattered base={BASE}: lvl2 fill "
          f"{g2.n_cells/np.prod(g2.dims)*100:.1f}% of bbox, "
          f"{n_unk/1e6:.2f}M leaf unknowns", flush=True)

    cfg = MGConfig(operator="laplacian", dtype=jnp.float32, donate=True)
    sd = make_solver(tree, cfg)
    assert isinstance(sd, DenseMultiForestMGSolver), type(sd)
    sd.set_bc(0, BCType.DIRICHLET, 0.0)
    std0 = sd.allocate()
    for lvl in sd.levels:
        for u in sd.units_of(lvl):
            std0 = sd.set_interior(
                std0, u, "rhs",
                jnp.ones(tuple(np.asarray(sd.dims[u])[::-1]),
                         jnp.float32))

    def run_dense(st):
        if st is None:
            st = std0
        return sd.fas_fmg(st, have_guess=True)

    dt_d = time_solver("multiforest", run_dense, N_ITS)

    sb = MGSolver(tree, MGConfig(operator="laplacian", dtype=jnp.float32,
                                 donate=True))
    sb.set_bc(IPHI, BCType.DIRICHLET, 0.0)
    stb0 = sb.allocate()
    isl = (slice(None),) + (slice(1, -1),) * 3
    for lvl in sb.levels:
        stb0["cc"][lvl] = stb0["cc"][lvl].at[(IRHS,) + isl].set(1.0)

    def run_boxed(st):
        if st is None:
            st = stb0
        return sb.fas_fmg(st, have_guess=True)

    dt_b = time_solver("boxed", run_boxed, max(2, N_ITS // 4))

    print(f"multiforest {n_unk/dt_d/1e6:.1f}M leaf-unknowns/s, "
          f"boxed {n_unk/dt_b/1e6:.1f}M -> speedup {dt_b/dt_d:.1f}x",
          flush=True)


if __name__ == "__main__":
    main()
