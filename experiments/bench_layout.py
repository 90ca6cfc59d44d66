"""Microbench: boxes-minor flat layout [S=(nc+2)^D, n] vs boxes-major.

Tests at 512^3/box16 on the real chip:
  1. masked GSRB half-sweep via roll along the flat-spatial (major) axis
  2. ghost fill: face extraction (strided row slice) + lane gather + row set
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE = int(os.environ.get("MG_SIZE", "512"))
NC = 16
S = (NC + 2) ** 3
N = (SIZE // NC) ** 3


def masks_np():
    """Interior+parity masks on the flat spatial axis."""
    shape = (NC + 2,) * 3
    idx = np.indices(shape)
    interior = np.ones(shape, bool)
    for d in range(3):
        interior &= (idx[d] >= 1) & (idx[d] <= NC)
    par = idx.sum(axis=0) % 2
    return (interior & (par == 0)).reshape(-1), (interior & (par == 1)).reshape(-1)


def bench_sweep():
    key = jax.random.PRNGKey(0)
    phi = jax.random.normal(key, (S, N), jnp.float32)
    rhs = jax.random.normal(jax.random.PRNGKey(1), (S, N), jnp.float32)
    m0, m1 = masks_np()
    m0 = jnp.asarray(m0)[:, None]
    m1 = jnp.asarray(m1)[:, None]
    idr2 = (float(SIZE) ** 2,) * 3
    shifts = [1, NC + 2, (NC + 2) ** 2]
    fac = 1.0 / (2.0 * sum(idr2))

    def half(phi, rhs, mask):
        acc = -rhs
        for d, sh in enumerate(shifts):
            acc = acc + idr2[d] * (jnp.roll(phi, sh, axis=0)
                                   + jnp.roll(phi, -sh, axis=0))
        return jnp.where(mask, acc * fac, phi)

    @jax.jit
    def run(phi, rhs):
        def body(i, p):
            p = half(p, rhs, m0)
            p = half(p, rhs, m1)
            return p
        p = lax.fori_loop(0, 4, body, phi)
        return jnp.sum(p[1])

    t0 = time.perf_counter(); float(run(phi, rhs))
    print(f"sweep compile {time.perf_counter()-t0:.1f}s", flush=True)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); float(run(phi, rhs))
        best = min(best, time.perf_counter() - t0)
    per = best / 8 * 1e3
    gbs = S * N * 4 * 3 / (best / 8) / 1e9
    print(f"boxes-minor half-sweep: {per:.2f} ms ({gbs:.0f} GB/s 3-pass)",
          flush=True)


def bench_fill():
    """Same-level fill: 6 directions, extract+lane-gather+row-set."""
    # build flat-position row indices for ghost and src planes
    shape = (NC + 2,) * 3

    def plane_rows(d, idx_normal):
        # rows (flat indices) of the plane normal to dim d at index
        # idx_normal, full transverse extent; d: 0=x (fastest), 2=z
        ix = np.indices(shape)
        ax = 2 - d  # spatial axis of dim d in (z, y, x) order
        sel = ix[ax] == idx_normal
        return np.nonzero(sel.reshape(-1))[0]

    key = jax.random.PRNGKey(0)
    phi = jax.random.normal(key, (S, N), jnp.float32)
    rng = np.random.default_rng(0)
    nb_loc = [jnp.asarray(rng.integers(0, N, N)) for _ in range(6)]

    rows_ghost = []
    rows_src = []
    for d in range(3):
        for side in (0, 1):
            g = 0 if side == 0 else NC + 1
            s = NC if side == 0 else 1  # neighbor's opposite interior plane
            rows_ghost.append(jnp.asarray(plane_rows(d, g)))
            rows_src.append(jnp.asarray(plane_rows(d, s)))

    @jax.jit
    def run(phi):
        def body(i, p):
            out = p
            for nb in range(6):
                faces = p[rows_src[nb]]            # [324, N] strided row slice
                gathered = jnp.take(faces, nb_loc[nb], axis=1)  # lane gather
                out = out.at[rows_ghost[nb]].set(gathered)
            return out * 1.0000001
        p = lax.fori_loop(0, 8, body, phi)
        return jnp.sum(p[1])

    t0 = time.perf_counter(); float(run(phi))
    print(f"fill compile {time.perf_counter()-t0:.1f}s", flush=True)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); float(run(phi))
        best = min(best, time.perf_counter() - t0)
    per = best / 8 * 1e3
    print(f"boxes-minor fill(+scale): {per:.2f} ms", flush=True)


if __name__ == "__main__":
    bench_sweep()
    bench_fill()
