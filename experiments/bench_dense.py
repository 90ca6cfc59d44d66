"""Dense-path timing on the real TPU: pair kernel, residual, full FMG."""
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from octree_mg_tpu import DenseMGSolver, MGConfig, build_rectangle

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 512
WHAT = sys.argv[2] if len(sys.argv) > 2 else "all"


def main():
    dsz = np.full(3, SIZE)
    tree = build_rectangle(3, dsz, 16, 1.0 / dsz, np.zeros(3))
    sd = DenseMGSolver(tree, MGConfig(operator="laplacian",
                                      dtype=jnp.float32, donate=True))
    st = sd.allocate()
    top = sd.levels[-1]
    key = jax.random.PRNGKey(0)
    st = sd.set_interior(st, top, "rhs",
                         jax.random.normal(key, (SIZE,) * 3, jnp.float32))
    lam = jnp.asarray(0.0, jnp.float32)
    print("levels:", sd.levels, flush=True)

    if WHAT in ("all", "pair"):
        @jax.jit
        def pairs(st):
            for _ in range(4):
                st = sd._smooth(st, top, 1, lam)
            return jnp.sum(st["phi"][top][3, 3])

        t0 = time.perf_counter()
        float(pairs(st))
        print(f"pair compile {time.perf_counter()-t0:.1f}s", flush=True)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(pairs(st))
            best = min(best, time.perf_counter() - t0)
        gb = SIZE ** 3 * 4 * 3.5 / 1e9  # ~3.5 passes incl halo overlap
        print(f"pair kernel: {best/4*1e3:.2f} ms "
              f"(~{gb/(best/4):.0f} GB/s at 3.5-pass model)", flush=True)

    if WHAT in ("all", "res"):
        @jax.jit
        def res4(st):
            for _ in range(4):
                st = sd._residual(st, top, lam)
            return jnp.sum(st["ires"][top][3, 3])

        float(res4(st))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(res4(st))
            best = min(best, time.perf_counter() - t0)
        print(f"residual kernel: {best/4*1e3:.2f} ms", flush=True)

    if WHAT in ("all", "fmg"):
        t0 = time.perf_counter()
        st, r0 = sd.fas_fmg(st, have_guess=True)
        r0 = float(r0)
        print(f"fmg compile+run {time.perf_counter()-t0:.1f}s", flush=True)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            st, r = sd.fas_fmg(st, have_guess=True)
            r = float(r)
            best = min(best, time.perf_counter() - t0)
        unknowns = sum(int(np.prod(sd.dims[l])) for l in sd.levels)
        print(f"FMG: {best*1e3:.1f} ms  res {r0:.3e}->{r:.3e}  "
              f"{unknowns/best:.3e} unknowns/s", flush=True)


if __name__ == "__main__":
    main()
