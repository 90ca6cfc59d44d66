"""Break the refined-forest outer step into timed pieces on the chip.

The first measurement came in at seconds/outer (probe_refine_forest_
perf) — far off the >1e9 leaf-unknowns/s bar.  Times, each as its own
jitted program with a device->host scalar read as the barrier:

  1. inner forest FMG alone
  2. the fused outer step (accumulate + df restrict + df residuals)
  3. df restriction alone
  4. df residuals alone (per level, with the ghost/bdf machinery)
  5. accumulate alone

Usage: python experiments/probe_refine_forest_anatomy.py [base] [box]
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

from octree_mg_tpu import BCType, MGConfig, build_rectangle
from octree_mg_tpu.core import tree as tm
from octree_mg_tpu.ops.df32 import accumulate_df32, split_f64
from octree_mg_tpu.solve.dense_forest import DenseForestMGSolver
from octree_mg_tpu.solve.refine_forest import RefinedForestPoisson

BASE = int(sys.argv[1]) if len(sys.argv) > 1 else 256
BOX = int(sys.argv[2]) if len(sys.argv) > 2 else 16
REPS = 4


def _refine(t, lvl, pred):
    ids = t.lvls[lvl].ids
    pick = [int(b) for b in ids if pred(t.ix[int(b)])]
    tm.add_children_bulk(t, np.array(pick, np.int64))
    tm.set_leaves_parents(t, lvl)
    tm.set_next_level_ids(t, lvl)
    tm.set_neighbors_lvl(t, lvl + 1)


def timeit(tag, fn, *args):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])  # warm + barrier
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / REPS
    print(f"{tag:<28} {dt*1e3:8.1f} ms", flush=True)
    return dt


def main():
    nb = BASE // BOX
    h = (nb + 1) // 2
    t = build_rectangle(3, [BASE] * 3, BOX, [1.0 / BASE] * 3, [0] * 3)
    _refine(t, 1, lambda ix: (ix[0] <= h or ix[1] <= h) and ix[2] <= h)
    tm.finalize_amr(t, 2)
    sv = DenseForestMGSolver(t, MGConfig(operator="laplacian",
                                         dtype=jnp.float32, donate=True))
    sv.set_bc(0, BCType.DIRICHLET, 0.0)
    ref = RefinedForestPoisson(sv)
    rng = np.random.default_rng(0)
    X, RHSh, RHSl, E = {}, {}, {}, {}
    st = sv.allocate()
    for lvl in sv.levels:
        shape = sv._pshape(sv.dims[lvl])
        X[lvl] = (jnp.zeros(shape, jnp.float32),
                  jnp.zeros(shape, jnp.float32))
        v = jnp.asarray(rng.normal(size=shape), jnp.float32)
        RHSh[lvl], RHSl[lvl] = v, 1e-8 * v
        E[lvl] = 0.1 * v
        st = sv.set_interior(st, lvl, "rhs", v[sv._isl])

    print(f"L-forest base={BASE}: canvases "
          f"{[sv.dims[l] for l in sv.levels]}", flush=True)

    # donate=True invalidates the input state: chain it through
    st, r = sv.fas_fmg(st, have_guess=True)
    float(r)
    t0 = time.perf_counter()
    for _ in range(REPS):
        st, r = sv.fas_fmg(st, have_guess=True)
    float(r)
    print(f"{'inner FMG':<28} "
          f"{(time.perf_counter()-t0)/REPS*1e3:8.1f} ms", flush=True)

    def step(X):
        return ref._jit_step(X, E, RHSh, RHSl)

    # donation: chain the returned X
    Xw, R, mx = step(X)
    float(mx)
    t0 = time.perf_counter()
    for _ in range(REPS):
        Xw, R, mx = step(Xw)
    float(mx)
    print(f"{'fused outer step':<28} "
          f"{(time.perf_counter()-t0)/REPS*1e3:8.1f} ms", flush=True)

    top = sv.levels[-1]

    @jax.jit
    def accum_only(X, E):
        out = {}
        for lvl in sv.levels:
            out[lvl] = accumulate_df32(X[lvl][0], X[lvl][1], E[lvl])
        return jnp.max(out[top][0])

    timeit("accumulate only", accum_only, Xw, E)

    @jax.jit
    def restr_only(X):
        X = dict(X)
        for lvl in reversed(sv.levels[1:]):
            X = ref._restrict_into_df(X, lvl)
        return jnp.max(X[sv.levels[0]][0])

    timeit("df restriction only", restr_only, Xw)

    @jax.jit
    def resid_only(X, RHSh, RHSl):
        memo = {}
        out = jnp.zeros((), jnp.float32)
        for lvl in sv.levels:
            r = ref._residual_df(X, RHSh, RHSl, lvl, memo)
            out = jnp.maximum(out, jnp.max(jnp.abs(r)))
        return out

    timeit("df residuals (all levels)", resid_only, Xw, RHSh, RHSl)

    @jax.jit
    def resid_top(X, RHSh, RHSl):
        memo = {}
        r = ref._residual_df(X, RHSh, RHSl, top, memo)
        return jnp.max(jnp.abs(r))

    timeit("df residual (top only)", resid_top, Xw, RHSh, RHSl)

    @jax.jit
    def ghosts_top(X):
        memo = {}
        bdf = ref._bdf(X, top, memo)
        ghosts = [ref._ghost_df(top, seg, X[top][0], X[top][1], bdf, i)
                  for i, seg in enumerate(sv.segs[top])]
        return jnp.max(ghosts[0][0])

    timeit("ghost/bdf machinery (top)", ghosts_top, Xw)


if __name__ == "__main__":
    main()
