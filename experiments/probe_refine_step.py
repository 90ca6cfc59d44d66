"""Where does the refined outer step's time at 512^3 go?

Repo probe idiom: chain the op 8x inside ONE jit (outputs feed inputs,
so nothing is DCE'd or CSE'd), return a scalar, float() it; best of 3.

    python experiments/probe_refine_step.py [size]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from octree_mg_tpu import MGConfig, build_rectangle, make_solver
from octree_mg_tpu.ops.df32 import accumulate_df32, residual_df32_dense
from octree_mg_tpu.solve.dense import _ISL
from octree_mg_tpu.solve.refine import RefinedPoisson


def bench(name, loop, args):
    t0 = time.perf_counter()
    float(loop(*args))
    print(f"  [{name} compile {time.perf_counter()-t0:.1f}s]", flush=True)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best/8*1e3:8.2f} ms/call", flush=True)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    dsz = np.full(3, size)
    tree = build_rectangle(3, dsz, 16, 1.0 / dsz, np.zeros(3))
    sv = make_solver(tree, MGConfig(operator="laplacian",
                                    dtype=jnp.float32))
    rp = RefinedPoisson(sv)
    cfg = rp.cfg
    pshape = rp.pshape

    @jax.jit
    def mk(key):
        ks = jax.random.split(key, 5)
        return [jax.random.normal(k, pshape, jnp.float32) * 1e-3
                for k in ks]

    xhi, xlo, e32, rhi, rlo = mk(jax.random.PRNGKey(0))

    @jax.jit
    def loop_acc(a, b, e):
        for _ in range(8):
            a, b = accumulate_df32(a, b, e)
        return jnp.sum(a[6, 16])

    bench("accumulate chain (3R+2W)", loop_acc, (xhi, xlo, e32))

    @jax.jit
    def loop_res(a, b, r1, r2):
        for _ in range(8):
            a = residual_df32_dense(cfg, a, b, r1, r2)
        return jnp.sum(a[6, 16])

    bench("df32 Mosaic residual (4R+1W)", loop_res, (xhi, xlo, rhi, rlo))

    @jax.jit
    def loop_step(a, b, e, r1, r2):
        mxs = 0.0
        for _ in range(8):
            a, b = accumulate_df32(a, b, e)
            ri = residual_df32_dense(cfg, a, b, r1, r2)[_ISL]
            mxs = mxs + jnp.max(jnp.abs(ri))
            e = jnp.zeros(pshape, jnp.float32).at[_ISL].set(ri)
        return mxs

    bench("full step chain (accum+res+max+write)", loop_step,
          (xhi, xlo, e32, rhi, rlo))


if __name__ == "__main__":
    main()
