"""Microbench: GSRB half-sweep throughput vs box size at fixed 512^3 total.

Measures the hot kernel (masked half-sweep) and the same-level ghost fill
on the real TPU chip for several (n_boxes, nc) decompositions of the same
512^3 problem.  Timing ends with a device->host scalar read (the tunnel's
block_until_ready returns early).
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

SIZE = 512


def parity_mask_iota(ndim, nc, n_sub, dtype=jnp.int32):
    """(i+j+k+n) parity via broadcasted iota (no materialized mask)."""
    s = None
    for d in range(ndim):
        it = lax.broadcasted_iota(jnp.int32, (nc,) * ndim, d)
        s = it if s is None else s + it
    # 1-based indices: sum of (idx+1) = s + ndim
    return ((s + ndim + n_sub) % 2) == 0


def smooth_half(phi, rhs, nc, idr2, mask):
    """helmholtz_smooth_half clone, [n, nc+2, nc+2, nc+2]."""
    ndim = 3

    def iv(a, d=None, s=0):
        sl = [slice(None)]
        for dd in reversed(range(ndim)):
            off = s if dd == d else 0
            sl.append(slice(1 + off, nc + 1 + off))
        return a[tuple(sl)]

    acc = -iv(rhs)
    tot = 0.0
    for d in range(ndim):
        acc = acc + idr2[d] * (iv(phi, d, -1) + iv(phi, d, +1))
        tot += 2.0 * idr2[d]
    new = acc / tot
    cur = iv(phi)
    return phi.at[(slice(None),) + (slice(1, -1),) * ndim].set(
        jnp.where(mask, new, cur))


def bench_config(nc, n_sweeps=8, dtype=jnp.float32, reps=3):
    n = (SIZE // nc) ** 3
    shape = (n,) + (nc + 2,) * 3
    idr2 = (float(SIZE) ** 2,) * 3
    key = jax.random.PRNGKey(0)
    phi = jax.random.normal(key, shape, dtype)
    rhs = jax.random.normal(jax.random.PRNGKey(1), shape, dtype)

    @jax.jit
    def run(phi, rhs):
        def body(i, p):
            mask = parity_mask_iota(3, nc, i)
            return smooth_half(p, rhs, nc, idr2, mask)
        p = lax.fori_loop(0, n_sweeps, body, p := phi)
        return jnp.sum(p[:, 1, 1, 1])

    t_c0 = time.perf_counter()
    out = float(run(phi, rhs))  # compile+run
    t_compile = time.perf_counter() - t_c0
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = float(run(phi, rhs))
        best = min(best, time.perf_counter() - t0)
    bytes_per_sweep = (np.prod(shape) * 4 * 3)  # read phi+rhs, write phi
    gbs = bytes_per_sweep * n_sweeps / best / 1e9
    per_sweep_ms = best / n_sweeps * 1e3
    print(f"nc={nc:4d} n={n:6d}  {per_sweep_ms:7.2f} ms/sweep  "
          f"eff {gbs:6.1f} GB/s (3-pass model)  compile {t_compile:.1f}s",
          flush=True)
    return per_sweep_ms


if __name__ == "__main__":
    ncs = [int(x) for x in sys.argv[1:]] or [16, 32, 64, 128, 256, 512]
    for nc in ncs:
        try:
            bench_config(nc)
        except Exception as e:
            print(f"nc={nc}: {type(e).__name__}: {str(e)[:200]}", flush=True)
