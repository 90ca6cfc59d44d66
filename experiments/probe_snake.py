"""The sparse-component cliff (round-4 verdict item 8): a SNAKE-shaped
refinement — one diagonal staircase of boxes — is a single connected
component whose own bounding-box fill is far below the multiforest
min_fill gate, so it routes boxed today.  Measure what the canvas path
would do anyway (DenseMultiForestMGSolver constructed directly) vs the
boxed fallback, to set the gate from data.

Usage: python experiments/probe_snake.py [base] [box] [n_its]
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
                           build_rectangle)
from octree_mg_tpu.core import tree as tm
from octree_mg_tpu.solve.dense_forest import _LevelGeom
from octree_mg_tpu.solve.dense_multiforest import DenseMultiForestMGSolver

BASE = int(sys.argv[1]) if len(sys.argv) > 1 else 128
BOX = int(sys.argv[2]) if len(sys.argv) > 2 else 16
N_ITS = int(sys.argv[3]) if len(sys.argv) > 3 else 8


def _refine(t, lvl, pred):
    ids = t.lvls[lvl].ids
    pick = [int(b) for b in ids if pred(t.ix[int(b)])]
    tm.add_children_bulk(t, np.array(pick, np.int64))
    tm.set_leaves_parents(t, lvl)
    tm.set_next_level_ids(t, lvl)
    tm.set_neighbors_lvl(t, lvl + 1)


def snake_tree(base, box):
    """A staircase of lvl-1 boxes from one domain corner to the other
    (connected via face adjacency, concave, bbox = whole domain)."""
    nb = base // box
    t = build_rectangle(3, [base] * 3, box, [1.0 / base] * 3, [0] * 3)

    def pred(ix):
        x, y, z = int(ix[0]) - 1, int(ix[1]) - 1, int(ix[2]) - 1
        # staircase: walk +x then +y alternating, at z = diagonal
        s = x + y
        return z == min(s, nb - 1) and (y == x or y == x + 1)
    _refine(t, 1, pred)
    tm.finalize_amr(t, 2)
    return t


def main():
    tree = snake_tree(BASE, BOX)
    lvl2 = 2
    g = _LevelGeom(tree, lvl2)
    fill = g.n_cells / float(np.prod(g.dims))
    n_unk = sum(len(tree.lvls[l].leaves)
                for l in range(1, tree.highest_lvl + 1)) * BOX ** 3
    print(f"snake base={BASE} box={BOX}: lvl2 boxes="
          f"{len(tree.lvls[lvl2].ids)} bbox dims={g.dims} "
          f"fill={fill:.4f} leaf unknowns {n_unk/1e6:.2f}M", flush=True)

    def timeit(tag, solve, st0):
        st, r0 = solve(st0)
        st, r = solve(st)
        float(r)
        t0 = time.perf_counter()
        for _ in range(N_ITS):
            st, r = solve(st)
        r1 = float(r)
        dt = (time.perf_counter() - t0) / N_ITS
        print(f"{tag}: {dt*1e3:.1f} ms/FMG res {float(r0):.3e}->"
              f"{r1:.3e}  {n_unk/dt/1e6:.1f}M leaf-unknowns/s",
              flush=True)
        return dt

    # canvas path, gate bypassed (construct the solver directly)
    sd = DenseMultiForestMGSolver(tree, MGConfig(
        operator="laplacian", dtype=jnp.float32, donate=True))
    sd.set_bc(0, BCType.DIRICHLET, 0.0)
    std = sd.allocate()
    for lvl in sd.levels:
        for u in sd.units_of(lvl):
            X, Y, Z = sd.dims[u]
            std = sd.set_interior(std, u, "rhs",
                                  jnp.ones((Z, Y, X), jnp.float32))
    dt_d = timeit("multiforest(canvas, gate bypassed)",
                  lambda st: sd.fas_fmg(st, have_guess=True), std)

    sb = MGSolver(tree, MGConfig(operator="laplacian",
                                 dtype=jnp.float32, donate=True))
    sb.set_bc(IPHI, BCType.DIRICHLET, 0.0)
    stb = sb.allocate()
    isl = (slice(None),) + (slice(1, -1),) * 3
    for lvl in sb.levels:
        stb["cc"][lvl] = stb["cc"][lvl].at[(IRHS,) + isl].set(1.0)
    dt_b = timeit("boxed fallback",
                  lambda st: sb.fas_fmg(st, have_guess=True),
                  stb)
    print(f"canvas/boxed speedup at fill={fill:.4f}: "
          f"{dt_b/dt_d:.2f}x", flush=True)


if __name__ == "__main__":
    main()
