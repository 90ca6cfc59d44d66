"""On-chip cost of the forest smoother/residual phases: fused-canvas
(segment-plane kernels) vs the sequential half-sweep+refresh path, on
the L-forest's dominant 256^3-class canvas.

Usage: python experiments/probe_seg_sweep.py [base] [box] [reps]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from octree_mg_tpu import BCType, MGConfig, make_solver
from octree_mg_tpu.solve.dense_forest import DenseForestMGSolver
from experiments.probe_forest_perf import l_forest

BASE = int(sys.argv[1]) if len(sys.argv) > 1 else 128
BOX = int(sys.argv[2]) if len(sys.argv) > 2 else 16
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
LOOP = 4


def mk(fused):
    sd = make_solver(l_forest(BASE, BOX),
                     MGConfig(operator="laplacian", dtype=jnp.float32))
    assert isinstance(sd, DenseForestMGSolver)
    sd.seg_fused = fused
    sd.set_bc(0, BCType.DIRICHLET, 0.0)
    st = sd.allocate()
    lvl = sd.levels[-2]          # the dominant 256^3-class canvas
    key = jax.random.PRNGKey(0)
    X, Y, Z = sd.dims[lvl]
    st = sd.set_interior(st, lvl, "rhs",
                         jax.random.normal(key, (Z, Y, X), jnp.float32))
    return sd, st, lvl


def timeit(tag, fn, st):
    st2 = fn(st)
    float(st2["phi"][list(st2["phi"])[0]].ravel()[0])  # warm + sync
    best = np.inf
    for _ in range(REPS):
        t0 = time.perf_counter()
        st2 = fn(st)
        # device->host read is the only reliable barrier here
        float(st2["phi"][list(st2["phi"])[0]].ravel()[0])
        best = min(best, (time.perf_counter() - t0) / LOOP)
    print(f"{tag}: {best*1e3:.2f} ms/call", flush=True)
    return best


def main():
    lam = jnp.asarray(0.0, jnp.float32)
    for fused in (False, True):
        sd, st, lvl = mk(fused)
        print(f"--- fused={fused} lvl={lvl} dims={sd.dims[lvl]} "
              f"descs={None if sd._seg_desc(lvl) is None else len(sd._seg_desc(lvl)[0])}",
              flush=True)

        @jax.jit
        def smooth4(st):
            for _ in range(LOOP):
                st = sd._smooth(st, lvl, 2, lam)
            return st

        @jax.jit
        def resid4(st):
            for _ in range(LOOP):
                st = sd._residual(st, lvl, lam)
                st = sd._set(st, "phi", lvl, st["phi"][lvl] + 0.0)
            return st

        timeit(f"smooth(n_cycle=2) fused={fused}", smooth4, st)
        timeit(f"residual fused={fused}", resid4, st)


def pieces():
    """Decompose the fused smooth: plane build vs kernel."""
    lam = jnp.asarray(0.0, jnp.float32)
    sd, st, lvl = mk(True)
    from octree_mg_tpu.ops import dense_kernels as dk
    cfg = sd._seg_kcfg(lvl)
    descs, _ = sd._seg_desc(lvl)
    bcache = sd._rb_cache(st, lvl, "phi")
    planes = jax.jit(lambda st: sd._seg_planes(
        st, lvl, sd._rb_cache(st, lvl, "phi")))(st)

    @jax.jit
    def build4(st):
        out = None
        for _ in range(LOOP):
            out = sd._seg_planes(st, lvl, sd._rb_cache(st, lvl, "phi"))
            st = sd._set(st, "phi", lvl, st["phi"][lvl] + 1e-30)
        return st, out

    @jax.jit
    def kern4(canvas, rhs, planes):
        for _ in range(LOOP):
            canvas = dk.pair_sweep_dense(cfg, canvas, rhs, lam,
                                         [None] * 6, red_parity=0,
                                         n_pairs=2, segs=descs,
                                         seg_planes=planes)
        return canvas

    c0, r0 = st["phi"][lvl], st["rhs"][lvl]
    # warm
    st2, _ = build4(st)
    float(st2["phi"][lvl].ravel()[0])
    c1 = kern4(c0, r0, planes)
    float(c1.ravel()[0])
    best_b = best_k = np.inf
    for _ in range(REPS):
        t0 = time.perf_counter()
        st2, pl = build4(st)
        float(st2["phi"][lvl].ravel()[0])
        best_b = min(best_b, (time.perf_counter() - t0) / LOOP)
        t0 = time.perf_counter()
        c1 = kern4(c0, r0, planes)
        float(c1.ravel()[0])
        best_k = min(best_k, (time.perf_counter() - t0) / LOOP)
    print(f"seg_planes build: {best_b*1e3:.2f} ms;  "
          f"pair2 kernel: {best_k*1e3:.2f} ms", flush=True)


if len(sys.argv) > 4 and sys.argv[4] == "pieces":
    main = pieces


if __name__ == "__main__":
    main()
