"""Can the MXU compute the y/z neighbor sums of the GSRB sweeps?

The sweeps are VPU compute-bound; y(sublane) and z(untiled) neighbor
rolls dominate (probe_sweep_anatomy).  s_y = roll(p,+1,y) + roll(p,-1,y)
is a tridiagonal 0/1 matmul over the sublane dim — one MXU op that can
overlap the remaining VPU work.  Open questions probed here, per dim:

1. exactness: TPU f32 matmul (precision HIGHEST = 3xbf16 passes) sums
   the two products in a different rounding order than the single f32
   add; measure max relative deviation (0 would allow bitwise parity).
2. speed inside a Mosaic kernel: 4-sweep chains with the y (and z)
   sums on the MXU vs the roll versions.

argv: SIZE WHAT [tz ty]; WHAT in {exact, mxu4, mxuz4}
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
from jax import lax

from octree_mg_tpu.ops import dense_kernels as dk

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 512
WHAT = sys.argv[2] if len(sys.argv) > 2 else "exact"
TILE = ((int(sys.argv[3]), int(sys.argv[4])) if len(sys.argv) > 4
        else (16, 48))


def tridiag(n, dtype):
    m = np.zeros((n, n), np.float32)
    for i in range(n):
        if i > 0:
            m[i - 1, i] = 1.0
        if i + 1 < n:
            m[i + 1, i] = 1.0
    return jnp.asarray(m, dtype)


def y_mxu(p, M):
    # out[z, w, x] = sum_y p[z, y, x] * M[y, w]
    return lax.dot_general(
        p, M, (((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32).transpose(0, 2, 1)


def z_mxu(p, M):
    # out[w, y, x] = sum_z p[z, y, x] * M[z, w]
    return lax.dot_general(
        p, M, (((0,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32).transpose(2, 0, 1)


def main():
    key = jax.random.PRNGKey(3)
    if WHAT == "exact":
        shape = (24, 48, 512)
        p = jax.random.normal(key, shape, jnp.float32) * 100.0
        M = tridiag(48, jnp.float32)

        @jax.jit
        def both(p):
            ref = jnp.roll(p, 1, 1) + jnp.roll(p, -1, 1)
            mx = y_mxu(p, M)
            return ref, mx

        ref, mx = both(p)
        ref, mx = np.asarray(ref), np.asarray(mx)
        inner = (slice(None), slice(1, -1), slice(None))
        d = np.abs(ref[inner] - mx[inner])
        rel = d / np.maximum(np.abs(ref[inner]), 1e-30)
        print(f"y-sum: max abs diff {d.max():.3e}  max rel "
              f"{rel.max():.3e}  exact={d.max() == 0.0}", flush=True)

        Mz = tridiag(24, jnp.float32)

        @jax.jit
        def bothz(p):
            ref = jnp.roll(p, 1, 0) + jnp.roll(p, -1, 0)
            return ref, z_mxu(p, Mz)

        ref, mz = bothz(p)
        ref, mz = np.asarray(ref), np.asarray(mz)
        inner = (slice(1, -1), slice(None), slice(None))
        d = np.abs(ref[inner] - mz[inner])
        rel = d / np.maximum(np.abs(ref[inner]), 1e-30)
        print(f"z-sum: max abs diff {d.max():.3e}  max rel "
              f"{rel.max():.3e}  exact={d.max() == 0.0}", flush=True)
        return

    # --- kernel speed probes ---------------------------------------
    dims = (SIZE, SIZE, SIZE)
    bc = [(2.0, -1.0, 0.0)] * 6
    cfg = dk.DenseStencilConfig(dims, (1.0, 1.0, 1.0), bc,
                                (False, False, False), jnp.float32,
                                b_const=[0.0] * 6, tile=TILE)
    print(f"tile tz={cfg.tz} ty={cfg.ty}", flush=True)
    k1, k2 = jax.random.split(key)
    phi = jax.random.normal(k1, cfg.pshape, jnp.float32)
    rhs = jax.random.normal(k2, cfg.pshape, jnp.float32)
    lam = jnp.asarray(0.0, jnp.float32)
    planes = [None] * 6
    idr2 = cfg.idr2
    n_sw = 4
    hz = n_sw
    tzw, tyw = cfg.tz + 2 * hz, cfg.ty + 2 * dk.PY

    def tridiag_iota(n):
        # build in-body (pallas kernels cannot capture constants)
        rr = lax.broadcasted_iota(jnp.int32, (n, n), 0)
        cc = lax.broadcasted_iota(jnp.int32, (n, n), 1)
        d = rr - cc
        return ((d == 1) | (d == -1)).astype(jnp.float32)

    def body(p, r, l, m, g, b):
        My = tridiag_iota(tyw)
        Mz = tridiag_iota(tzw)
        def one(i, p):
            acc = -r
            sx = dk._roll(p, 1, 2, False) + dk._roll(p, -1, 2, False)
            acc = acc + idr2[0] * sx
            acc = acc + idr2[1] * y_mxu(p, My)
            if WHAT == "mxuz4":
                acc = acc + idr2[2] * z_mxu(p, Mz)
            else:
                acc = acc + idr2[2] * (dk._roll(p, 1, 0, False)
                                       + dk._roll(p, -1, 0, False))
            return acc * (1.0 / (cfg.den0 + l))
        return lax.fori_loop(0, n_sw, one, p)

    def step(p, r):
        return dk._call_kernel(cfg, body, p, r, lam, planes, None, hz=hz)

    @jax.jit
    def loop(p, r):
        for _ in range(8):
            p = step(p, r)
        return jnp.sum(p[6, 16])

    t0 = time.perf_counter()
    float(loop(phi, rhs))
    print(f"compile {time.perf_counter()-t0:.1f}s", flush=True)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(phi, rhs))
        best = min(best, time.perf_counter() - t0)
    print(f"{WHAT}: {best/8*1e3:.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
