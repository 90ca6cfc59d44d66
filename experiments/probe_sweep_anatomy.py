"""Attribute the fused kernels' VPU cost: time ablated sweep bodies.

Single-pair (hz=2) variants — all DMA-bound, compute hides:
  full = real pair; nobc = periodic cfg (no BC synthesis);
  nosel = skip the parity select (wrong numerics, timing only);
  rolls = 6 rolls + adds only; none = DMA + copy.

Double-pair (hz=4) variants — compute exposed beyond the DMA floor,
these attribute WHERE the ~1ms/sweep of exposed VPU time goes:
  full4  = real double pair (4 half-sweeps)
  none4  = DMA + copy at hz=4 (the DMA floor)
  rolls4 = 4x (6 rolls + adds), no select/BC/divide
  nosel4 = 4x full stencil arithmetic, no parity select
  noz4   = 4x sweeps with x/y neighbor rolls only (4 rolls)
  nox4   = 4x sweeps with y/z neighbor rolls only
  noy4   = 4x sweeps with x/z neighbor rolls only
  comp4  = checkerboard-compacted sweeps: compact phi/rhs along x into
           red/black half-width arrays (x-roll pull networks), run 4
           half-sweeps each computing ONLY the updated color (y/z rolls
           at half width), riffle back.  Timing prototype: stencil
           arithmetic without BC synthesis.
  qeo4   = cost model of PERSISTENT even/odd-(y,z) quadrant storage
           (round-3 "one last swing", VERDICT item 8): with phi stored
           as 4 quarter arrays split by y and z parity, each quadrant's
           y-neighbor sum needs ONE roll of its y-partner quadrant (the
           two global y-neighbors are consecutive rows of the partner)
           and likewise for z — 4 quarter-size rolls = 1 full-size-roll
           equivalent per axis per half-sweep, vs 2 for the standard
           layout.  Emulated exactly in the standard kernel: 1 sublane
           roll + 1 untiled roll + 2 lane rolls per half-sweep, same
           adds, same bytes, same divide — the byte-movement cost
           structure is identical, without building the 4-array kernel.
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
from jax.experimental.pallas import tpu as pltpu

from octree_mg_tpu.ops import dense_kernels as dk

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 512
WHAT = sys.argv[2]
TILE = ((int(sys.argv[3]), int(sys.argv[4])) if len(sys.argv) > 4
        else (16, 48))


def main():
    dims = (SIZE, SIZE, SIZE)
    bc = [(2.0, -1.0, 0.0)] * 6
    per = (True, True, True) if WHAT == "nobc" else (False, False, False)
    cfg = dk.DenseStencilConfig(dims, (1.0, 1.0, 1.0), bc, per,
                                jnp.float32, b_const=[0.0] * 6, tile=TILE)
    print(f"tile tz={cfg.tz} ty={cfg.ty}", flush=True)
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    phi = jax.random.normal(k1, cfg.pshape, jnp.float32)
    rhs = jax.random.normal(k2, cfg.pshape, jnp.float32)
    lam = jnp.asarray(0.0, jnp.float32)
    planes = [None] * 6
    idr2 = cfg.idr2

    def sweep_nosel(p, r, l):
        acc = -r
        for d, axis in ((0, 2), (1, 1), (2, 0)):
            lo = dk._roll(p, +1, axis, False)
            hi = dk._roll(p, -1, axis, False)
            acc = acc + idr2[d] * (lo + hi)
        return acc * (1.0 / (cfg.den0 + l))

    def sweep_axes(p, r, axes):
        acc = -r
        for axis in axes:
            acc = acc + dk._roll(p, 1, axis, False) \
                + dk._roll(p, -1, axis, False)
        return acc

    def shift_cat(p, s, axis):
        """Edge-duplicating shift via concat of static slices (the
        wrapped rows of a roll feed only discarded ring cells)."""
        sl_keep = [slice(None)] * 3
        sl_edge = [slice(None)] * 3
        if s > 0:
            sl_keep[axis] = slice(None, -1)
            sl_edge[axis] = slice(None, 1)
            return jnp.concatenate([p[tuple(sl_edge)],
                                    p[tuple(sl_keep)]], axis)
        sl_keep[axis] = slice(1, None)
        sl_edge[axis] = slice(-1, None)
        return jnp.concatenate([p[tuple(sl_keep)],
                                p[tuple(sl_edge)]], axis)

    def sweep_qeo(p, r, l):
        """Quadrant-storage cost emulation: per half-sweep one sublane
        + one untiled roll (each axis' neighbor pair costs one roll of
        the partner quadrant), x rolls unchanged (lanes, free), same
        add count and divide as the real sweep."""
        acc = -r + idr2[0] * (dk._roll(p, +1, 2, False)
                              + dk._roll(p, -1, 2, False))
        acc = acc + idr2[1] * (dk._roll(p, +1, 1, False) + p)
        acc = acc + idr2[2] * (dk._roll(p, +1, 0, False) + p)
        return acc * (1.0 / (cfg.den0 + l))

    def sweep_cat(p, r, cat_axes):
        """rolls-style sweep, but axes in cat_axes use concat shifts."""
        acc = -r
        for axis in (2, 1, 0):
            if axis in cat_axes:
                acc = acc + shift_cat(p, 1, axis) + shift_cat(p, -1, axis)
            else:
                acc = acc + dk._roll(p, 1, axis, False) \
                    + dk._roll(p, -1, axis, False)
        return acc

    def sweep_comp(n_sw):
        """Checkerboard-compacted chain: compact once, n_sw half-sweeps
        on half-width arrays, riffle back.  Correct stencil arithmetic
        for fully-interior cells; no BC synthesis (timing probe)."""
        inv = 1.0 / cfg.den0

        def body(p, r, l, m, g, b, e=()):
            gx, gy, gz = g
            # row parity: True where red cells sit at odd x (r==1)
            rowsel = ((gy + gz) % 2) == 1  # (ZW, YW, 1) broadcastable

            def split(a):
                even = dk._compact_pairs(a, 2, False)
                odd = dk._compact_pairs(dk._roll(a, -1, 2, False), 2,
                                        False)
                red = jnp.where(rowsel, odd, even)
                black = jnp.where(rowsel, even, odd)
                return red, black

            red, black = split(p)
            r_red, r_black = split(r)

            def half(dst, src, rhs_c, sel_odd):
                # x-neighbor sum: for r==0 rows lo+hi = roll(+1)+src,
                # for r==1 rows src+roll(-1)
                sx = jnp.where(sel_odd,
                               src + dk._roll(src, -1, 2, False),
                               dk._roll(src, +1, 2, False) + src)
                acc = -rhs_c + idr2[0] * sx
                acc = acc + idr2[1] * (dk._roll(src, +1, 1, False)
                                       + dk._roll(src, -1, 1, False))
                acc = acc + idr2[2] * (dk._roll(src, +1, 0, False)
                                       + dk._roll(src, -1, 0, False))
                return acc * inv

            def one(i, carry):
                red, black = carry
                red = half(red, black, r_red, rowsel)
                black = half(black, red, r_black, ~rowsel)
                return red, black

            red, black = lax.fori_loop(0, n_sw // 2, one, (red, black))
            even = jnp.where(rowsel, black, red)
            odd = jnp.where(rowsel, red, black)
            return dk._interleave2(even, odd, 2, False)

        return body

    n_sw = 4 if WHAT.endswith("4") else 2
    base = WHAT[:-1] if WHAT.endswith("4") else WHAT
    hz = n_sw

    if base in ("full", "nobc"):
        def step(p, r):
            return dk.pair_sweep_dense(cfg, p, r, lam, planes, 0,
                                       n_pairs=n_sw // 2)
    else:
        axes_of = {"noz": (2, 1), "nox": (1, 0), "noy": (2, 0)}
        cat_of = {"slz": (0,), "sly": (1,), "slzy": (0, 1)}

        if base == "comp":
            comp_body = sweep_comp(n_sw)

        def body(p, r, l, m, g, b, e=()):
            if base == "comp":
                return comp_body(p, r, l, m, g, b, e)
            if base == "none":
                return p + r

            def one(i, p):
                if base == "nosel":
                    return sweep_nosel(p, r, l)
                if base == "qeo":
                    return sweep_qeo(p, r, l)
                if base == "rolls":
                    return sweep_axes(p, r, (2, 1, 0))
                if base in cat_of:
                    return sweep_cat(p, r, cat_of[base])
                return sweep_axes(p, r, axes_of[base])
            return lax.fori_loop(0, n_sw, one, p)

        def step(p, r):
            return dk._call_kernel(cfg, body, p, r, lam, planes, None,
                                   hz=hz)

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
