"""Pallas stencil kernels for dense uniform levels.

On uniform levels the box decomposition exists in the reference only to
serve MPI distribution and AMR (``src/m_load_balance.f90:1-3``); the
cells themselves form one dense rectangular grid.  Storing such levels
densely removes the per-box ghost ring entirely — the 1.42x traffic
amplification of ``(nc+2)^3/nc^3`` at nc=16 and, more importantly, the
materialized ghost-fill passes between smoother half-sweeps
(``smooth_boxes``, m_multigrid.f90:404-424), which measure ~2x the cost
of a half-sweep at 512^3 under XLA.

Layout: ``[Z+4, Y+4, X]`` — x is the lane dimension (unpadded, so 512 ->
4x128 tiles exactly), z/y carry a 2-deep pad so every tile's halo DMA is
a single rectangular window with no edge cases.  Pad contents are
*garbage by contract*: physical-boundary ghost values are synthesized
inline from the Fortran BC formula (ghost = c0*b + c1*x1 + c2*x2,
m_ghost_cells.f90:682-698) at the cells that read them, and periodic
wraps are maintained by the driver as cheap plane copies (x wraps are
exact lane rolls and need no maintenance).

Kernels:

* ``pair_sweep_dense`` — the fused red+black GSRB pair.  One HBM pass
  replaces [half-sweep, ghost fill, half-sweep, ghost fill] of the boxed
  path.  Correctness of fusing across the mid-pair ghost refresh is the
  recipe validated in ``ops/pair_sweep.py``: the black sweep only needs
  red-updated values in a 2-deep halo, which the tile's window contains
  (including corner data — free in a dense window).  Arithmetic order
  matches ``kernels.helmholtz_smooth_half`` exactly, so results are
  bit-identical to the boxed path (asserted in tests/test_dense.py).
* ``stencil_apply_dense`` — operator application / residual in one pass
  (``box_lpl``/``box_helmh``, m_laplacian.f90:155-195).
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll(a, shift, axis, interpret):
    if interpret:
        return jnp.roll(a, shift, axis=axis)
    return pltpu.roll(a, shift % a.shape[axis], axis=axis)


def pick_tile(n: int, want: int = 32) -> int:
    """Largest divisor of n that is <= want."""
    t = min(want, n)
    while n % t != 0:
        t -= 1
    return t


def _neighbor_ops(p, d, axis, dims, gcoords, periodic, bc, bplanes_w,
                  interpret):
    """(lo, hi) neighbor-value arrays along dim d with inline BC synth.

    p: current iterate over the window; gcoords[d]: global index along d
    per window cell; bc[2*d], bc[2*d+1]: (c0, c1, c2) or None (periodic);
    bplanes_w: per direction the boundary-value plane broadcast to the
    window shape (or scalar 0.0).
    """
    lo_raw = _roll(p, +1, axis, interpret)
    hi_raw = _roll(p, -1, axis, interpret)
    if periodic[d]:
        # x wraps are exact rolls; z/y wraps come from driver-maintained
        # pad planes, and window-border wraparound lands only in rows
        # whose results are never consumed
        return lo_raw, hi_raw
    g = gcoords[d]
    n_d = dims[d]
    c0l, c1l, c2l = bc[2 * d]
    c0h, c1h, c2h = bc[2 * d + 1]
    glo = c0l * bplanes_w[2 * d] + c1l * p
    if c2l != 0.0:
        glo = glo + c2l * hi_raw
    ghi = c0h * bplanes_w[2 * d + 1] + c1h * p
    if c2h != 0.0:
        ghi = ghi + c2h * lo_raw
    lo = jnp.where(g == 0, glo, lo_raw)
    hi = jnp.where(g == n_d - 1, ghi, hi_raw)
    return lo, hi


def _window_iotas(tzp, typ, X, z0, y0):
    shape = (tzp, typ, X)
    gz = lax.broadcasted_iota(jnp.int32, shape, 0) + (z0 - 2)
    gy = lax.broadcasted_iota(jnp.int32, shape, 1) + (y0 - 2)
    gx = lax.broadcasted_iota(jnp.int32, shape, 2)
    return gx, gy, gz


def _start_input_dmas(phi_hbm, rhs_hbm, planes, z0, y0, tzp, typ,
                      hphi, hrhs, hplanes, sems, need_rhs):
    """Kick off all window DMAs; returns the copy descriptors."""
    dmas = [pltpu.make_async_copy(
        phi_hbm.at[pl.ds(z0, tzp), pl.ds(y0, typ), :], hphi, sems.at[0])]
    if need_rhs:
        dmas.append(pltpu.make_async_copy(
            rhs_hbm.at[pl.ds(z0, tzp), pl.ds(y0, typ), :], hrhs,
            sems.at[1]))
    k = 2
    for i, (pln, hp) in enumerate(zip(planes, hplanes)):
        if pln is None:
            continue
        if i < 2:      # x faces: [ZP, YP] window (tzp, typ)
            src = pln.at[pl.ds(z0, tzp), pl.ds(y0, typ)]
        elif i < 4:    # y faces: [ZP, X] window (tzp, X)
            src = pln.at[pl.ds(z0, tzp), :]
        else:          # z faces: [YP, X] window (typ, X)
            src = pln.at[pl.ds(y0, typ), :]
        dmas.append(pltpu.make_async_copy(src, hp, sems.at[k]))
        k += 1
    for d in dmas:
        d.start()
    return dmas


class DenseStencilConfig:
    """Static per-level kernel configuration.

    dims: (X, Y, Z) cell counts (dim order matches the tree's dr order,
    x fastest); idr2 likewise (x, y, z); bc: per direction nb=0..5
    (x-,x+,y-,y+,z-,z+) a (c0,c1,c2) tuple or None when that axis is
    periodic; periodic: (px, py, pz).
    """

    def __init__(self, dims, idr2, bc, periodic, dtype, tile=(32, 32),
                 interpret=False):
        self.X, self.Y, self.Z = int(dims[0]), int(dims[1]), int(dims[2])
        self.idr2 = tuple(float(v) for v in idr2)
        self.bc = bc
        self.periodic = tuple(bool(p) for p in periodic)
        self.dtype = dtype
        self.tz = pick_tile(self.Z, tile[0])
        self.ty = pick_tile(self.Y, tile[1])
        self.interpret = interpret
        # denominator accumulated exactly like the boxed smoother
        s = 0.0
        for d in range(3):
            s = s + 2.0 * self.idr2[d]
        self.den0 = s

    @property
    def padded_shape(self):
        return (self.Z + 4, self.Y + 4, self.X)


def _halfsweep(cfg: DenseStencilConfig, p, hrhs_w, lam, gcoords, bpw,
               par_val):
    """One masked GSRB half-sweep over the window; bitwise-identical
    arithmetic to kernels.helmholtz_smooth_half."""
    acc = -hrhs_w
    # dim order 0=x(axis2), 1=y(axis1), 2=z(axis0), ascending like boxed
    for d, axis in ((0, 2), (1, 1), (2, 0)):
        lo, hi = _neighbor_ops(p, d, axis, (cfg.X, cfg.Y, cfg.Z), gcoords,
                               cfg.periodic, cfg.bc, bpw, cfg.interpret)
        acc = acc + cfg.idr2[d] * (lo + hi)
    new = acc / (cfg.den0 + lam)
    gx, gy, gz = gcoords
    par = (gx + gy + gz) % 2
    return jnp.where(par == par_val, new, p)


def pair_sweep_dense(cfg: DenseStencilConfig, phi, rhs, lam, bplanes,
                     red_parity: int):
    """Fused [red half-sweep, ghost refresh, black half-sweep].

    phi/rhs: [Z+4, Y+4, X]; lam: scalar array; bplanes: list of 6
    padded boundary-value planes (entries for periodic axes ignored).
    red_parity: global (gx+gy+gz)%2 value updated by the red sweep
    (the boxed path's substep-n mask corresponds to (n+1)%2).
    Returns new phi [Z+4, Y+4, X] with garbage pads.
    """
    tz, ty, X = cfg.tz, cfg.ty, cfg.X
    tzp, typ = tz + 4, ty + 4
    dt = cfg.dtype
    planes_in = [None if cfg.periodic[i // 2] else bplanes[i]
                 for i in range(6)]
    n_dma = 2 + sum(p is not None for p in planes_in)

    def kernel(*refs):
        (phi_hbm, rhs_hbm, bx_lo, bx_hi, by_lo, by_hi, bz_lo, bz_hi,
         lam_ref, out_hbm) = refs[:10]
        scr = refs[10:]
        hphi, hrhs = scr[0], scr[1]
        hplanes_all = []
        k = 2
        for i in range(6):
            if planes_in[i] is None:
                hplanes_all.append(None)
            else:
                hplanes_all.append(scr[k])
                k += 1
        sems = scr[k]

        zi = pl.program_id(0)
        yi = pl.program_id(1)
        z0 = zi * tz
        y0 = yi * ty

        plane_refs = [bx_lo, bx_hi, by_lo, by_hi, bz_lo, bz_hi]
        dmas = _start_input_dmas(
            phi_hbm, rhs_hbm,
            [p if planes_in[i] is not None else None
             for i, p in enumerate(plane_refs)],
            z0, y0, tzp, typ, hphi, hrhs,
            [h for h in hplanes_all if h is not None], sems, True)
        for d in dmas:
            d.wait()

        gx, gy, gz = _window_iotas(tzp, typ, X, z0, y0)
        bpw = [0.0] * 6
        for i in range(6):
            if hplanes_all[i] is None:
                continue
            w = hplanes_all[i][:]
            if i < 2:
                bpw[i] = w[:, :, None]
            elif i < 4:
                bpw[i] = w[:, None, :]
            else:
                bpw[i] = w[None, :, :]

        lam = lam_ref[0, 0]
        p0 = hphi[:]
        r0 = hrhs[:]
        p1 = _halfsweep(cfg, p0, r0, lam, (gx, gy, gz), bpw, red_parity)
        p2 = _halfsweep(cfg, p1, r0, lam, (gx, gy, gz), bpw,
                        1 - red_parity)
        hphi[:] = p2
        out_dma = pltpu.make_async_copy(
            hphi.at[pl.ds(2, tz), pl.ds(2, ty), :],
            out_hbm.at[pl.ds(z0 + 2, tz), pl.ds(y0 + 2, ty), :],
            sems.at[n_dma])
        out_dma.start()
        out_dma.wait()

    return _call_dense(cfg, kernel, phi, rhs, lam, bplanes, planes_in,
                       n_dma, need_rhs=True)


def stencil_apply_dense(cfg: DenseStencilConfig, phi, rhs, lam, bplanes,
                        residual: bool):
    """A(phi) (or rhs - A(phi)) on the interior in one pass
    (box_lpl/box_helmh + residual_box, m_multigrid.f90:426-436)."""
    tz, ty, X = cfg.tz, cfg.ty, cfg.X
    tzp, typ = tz + 4, ty + 4
    planes_in = [None if cfg.periodic[i // 2] else bplanes[i]
                 for i in range(6)]
    n_dma = 2 + sum(p is not None for p in planes_in)

    def kernel(*refs):
        (phi_hbm, rhs_hbm, bx_lo, bx_hi, by_lo, by_hi, bz_lo, bz_hi,
         lam_ref, out_hbm) = refs[:10]
        scr = refs[10:]
        hphi, hrhs = scr[0], scr[1]
        hplanes_all = []
        k = 2
        for i in range(6):
            if planes_in[i] is None:
                hplanes_all.append(None)
            else:
                hplanes_all.append(scr[k])
                k += 1
        sems = scr[k]

        zi = pl.program_id(0)
        yi = pl.program_id(1)
        z0 = zi * tz
        y0 = yi * ty
        plane_refs = [bx_lo, bx_hi, by_lo, by_hi, bz_lo, bz_hi]
        dmas = _start_input_dmas(
            phi_hbm, rhs_hbm,
            [p if planes_in[i] is not None else None
             for i, p in enumerate(plane_refs)],
            z0, y0, tzp, typ, hphi, hrhs,
            [h for h in hplanes_all if h is not None], sems,
            residual)
        for d in dmas:
            d.wait()

        gx, gy, gz = _window_iotas(tzp, typ, X, z0, y0)
        bpw = [0.0] * 6
        for i in range(6):
            if hplanes_all[i] is None:
                continue
            w = hplanes_all[i][:]
            bpw[i] = (w[:, :, None] if i < 2
                      else w[:, None, :] if i < 4 else w[None, :, :])

        lam = lam_ref[0, 0]
        p0 = hphi[:]
        # boxed order: out = -lam*c; out += idr2[d]*(lo + hi - 2c)
        out = -lam * p0
        for d, axis in ((0, 2), (1, 1), (2, 0)):
            lo, hi = _neighbor_ops(p0, d, axis, (cfg.X, cfg.Y, cfg.Z),
                                   (gx, gy, gz), cfg.periodic, cfg.bc,
                                   bpw, cfg.interpret)
            out = out + cfg.idr2[d] * (lo + hi - 2.0 * p0)
        if residual:
            out = hrhs[:] - out
        hphi[:] = out
        out_dma = pltpu.make_async_copy(
            hphi.at[pl.ds(2, tz), pl.ds(2, ty), :],
            out_hbm.at[pl.ds(z0 + 2, tz), pl.ds(y0 + 2, ty), :],
            sems.at[n_dma])
        out_dma.start()
        out_dma.wait()

    return _call_dense(cfg, kernel, phi, rhs, lam, bplanes, planes_in,
                       n_dma, need_rhs=residual)


def _call_dense(cfg, kernel, phi, rhs, lam, bplanes, planes_in, n_dma,
                need_rhs):
    tz, ty, X = cfg.tz, cfg.ty, cfg.X
    tzp, typ = tz + 4, ty + 4
    dt = cfg.dtype
    ZP, YP = cfg.Z + 4, cfg.Y + 4
    grid = (cfg.Z // tz, cfg.Y // ty)

    scratch = [pltpu.VMEM((tzp, typ, X), dt), pltpu.VMEM((tzp, typ, X), dt)]
    for i in range(6):
        if planes_in[i] is None:
            continue
        if i < 2:
            scratch.append(pltpu.VMEM((tzp, typ), dt))
        elif i < 4:
            scratch.append(pltpu.VMEM((tzp, X), dt))
        else:
            scratch.append(pltpu.VMEM((typ, X), dt))
    scratch.append(pltpu.SemaphoreType.DMA((n_dma + 1,)))

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    # placeholder (1,1) arrays for periodic-direction plane slots keep
    # the argument list static
    zeros11 = jnp.zeros((1, 1), dt)
    plane_args = [bplanes[i] if planes_in[i] is not None else zeros11
                  for i in range(6)]
    lam_arr = jnp.asarray(lam, dt).reshape(1, 1)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ZP, YP, X), dt),
        grid=grid,
        in_specs=[any_spec] * 8 + [smem_spec],
        out_specs=any_spec,
        scratch_shapes=scratch,
        interpret=cfg.interpret,
    )(phi, rhs, *plane_args, lam_arr)
