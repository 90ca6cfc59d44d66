"""Pallas stencil kernels for dense uniform levels.

On uniform levels the box decomposition exists in the reference only to
serve MPI distribution and AMR (``src/m_load_balance.f90:1-3``); the
cells themselves form one dense rectangular grid.  Storing such levels
densely removes the per-box ghost ring entirely — the 1.42x traffic
amplification of ``(nc+2)^3/nc^3`` at nc=16 and, more importantly, the
materialized ghost-fill passes between smoother half-sweeps
(``smooth_boxes``, m_multigrid.f90:404-424), which measure ~2x the cost
of a half-sweep at 512^3 under XLA.

Layout: ``[Z+2*PZ, Y+2*PY, X]`` with PZ=2, PY=8 — x is the lane
dimension (unpadded, 512 -> 4x128 tiles exactly); z carries the minimal
2-deep halo pad (the z axis is untiled, so HBM windows may slice it
freely); y carries an 8-deep pad because Mosaic requires HBM window
slices along the sublane dimension to be 8-aligned in offset and size.
Pad contents are *garbage by contract*: physical-boundary ghost values
are synthesized inline from the Fortran BC formula (ghost = c0*b +
c1*x1 + c2*x2, m_ghost_cells.f90:682-698) at the cells that read them,
and periodic wraps are maintained by the driver as cheap plane copies
(x wraps are exact lane rolls and need no maintenance).

Kernels:

* ``pair_sweep_dense`` — the fused red+black GSRB pair.  One HBM pass
  replaces [half-sweep, ghost fill, half-sweep, ghost fill] of the
  boxed path.  Correctness of fusing across the mid-pair ghost refresh
  is the recipe validated in ``ops/pair_sweep.py``: the black sweep
  only needs red-updated values in a 2-deep halo, which the tile's
  window contains (including corner data — free in a dense window).
  Arithmetic order matches ``kernels.helmholtz_smooth_half`` exactly,
  so results are bit-identical to the boxed path (tests/test_dense.py).
* ``stencil_apply_dense`` — operator application / residual in one
  pass (``box_lpl``/``box_helmh``, m_laplacian.f90:155-195).

Levels too small (or not 8-aligned in y) run the same computation as
plain jnp over the whole padded array — identical ops, identical
results, negligible cost at those sizes.  Boundary values enter either
as static scalars (the common case) or as padded planes kept resident
in VMEM.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: pad depths: z (untiled axis) needs only the 2-deep stencil halo;
#: y (sublane axis) is padded to the Mosaic window-alignment quantum
PZ = 2
PY = 8


def padded_shape(dims) -> Tuple[int, int, int]:
    X, Y, Z = int(dims[0]), int(dims[1]), int(dims[2])
    return (Z + 2 * PZ, Y + 2 * PY, X)


def _roll(a, shift, axis, interpret):
    if interpret:
        return jnp.roll(a, shift, axis=axis)
    return pltpu.roll(a, shift % a.shape[axis], axis=axis)


def _pick_tile(n: int, want: int, quantum: int = 1) -> Optional[int]:
    """Largest divisor of n that is <= want and a multiple of quantum."""
    for t in range(min(want, n), 0, -1):
        if n % t == 0 and t % quantum == 0:
            return t
    return None


class DenseStencilConfig:
    """Static per-level kernel configuration.

    dims: (X, Y, Z) cell counts (dim order matches the tree's dr order,
    x fastest); idr2 likewise (x, y, z); bc: per direction nb=0..5
    (x-,x+,y-,y+,z-,z+) a (c0,c1,c2) tuple (ignored on periodic axes);
    b_const: per direction a static boundary value, or None when the
    value varies over the face (then a plane input is used);
    periodic: (px, py, pz).
    """

    def __init__(self, dims, idr2, bc, periodic, dtype, b_const=None,
                 tile=(16, 48), interpret=False):
        self.X, self.Y, self.Z = int(dims[0]), int(dims[1]), int(dims[2])
        self.dims = (self.X, self.Y, self.Z)
        self.idr2 = tuple(float(v) for v in idr2)
        self.bc = bc
        self.periodic = tuple(bool(p) for p in periodic)
        self.dtype = dtype
        self.interpret = interpret
        self.b_const = list(b_const) if b_const is not None else [None] * 6
        for i in range(6):
            if self.periodic[i // 2]:
                self.b_const[i] = 0.0
        self.plane_faces = [i for i in range(6)
                            if self.b_const[i] is None]
        # plane-valued faces keep their windows resident in VMEM; use
        # smaller tiles to leave room
        want_z, want_y = tile if not self.plane_faces else (8, 32)
        self.tz = _pick_tile(self.Z, want_z)
        self.ty = _pick_tile(self.Y, want_y, quantum=PY)
        #: whether the Mosaic kernel path is usable (alignment); tiny or
        #: unaligned levels use the identical-jnp fallback.  X must fill
        #: whole lane tiles: DMA windows of a lane-padded array slice
        #: dimension 2 at the logical size, which Mosaic requires to be
        #: 128-aligned.
        self.use_kernel = (self.ty is not None and self.tz is not None
                           and self.Y % PY == 0 and self.X % 128 == 0)
        # denominator accumulated exactly like the boxed smoother
        s = 0.0
        for d in range(3):
            s = s + 2.0 * self.idr2[d]
        self.den0 = s

    @property
    def pshape(self):
        return padded_shape((self.X, self.Y, self.Z))


def _neighbor_ops(cfg, p, d, axis, gcoords, bpw, interpret, zgates=None):
    """(lo, hi) neighbor-value arrays along dim d with inline BC synth.

    bpw: per direction the boundary value (scalar or array broadcast to
    the window shape).  zgates: optional traced (lo, hi) booleans that
    gate the z-face BC synthesis — under z-slab sharding only the first/
    last shard owns a physical z face; interior shards read their
    ppermute-filled halo pads instead."""
    lo_raw = _roll(p, +1, axis, interpret)
    hi_raw = _roll(p, -1, axis, interpret)
    if cfg.periodic[d]:
        # x wraps are exact rolls; z/y wraps come from driver-maintained
        # pad planes, and window-border wraparound lands only in rows
        # whose results are never consumed
        return lo_raw, hi_raw
    g = gcoords[d]
    n_d = cfg.dims[d]
    c0l, c1l, c2l = cfg.bc[2 * d]
    c0h, c1h, c2h = cfg.bc[2 * d + 1]
    glo = c0l * bpw[2 * d] + c1l * p
    if c2l != 0.0:
        glo = glo + c2l * hi_raw
    ghi = c0h * bpw[2 * d + 1] + c1h * p
    if c2h != 0.0:
        ghi = ghi + c2h * lo_raw
    m_lo = g == 0
    m_hi = g == n_d - 1
    if d == 2 and zgates is not None:
        m_lo = m_lo & zgates[0]
        m_hi = m_hi & zgates[1]
    lo = jnp.where(m_lo, glo, lo_raw)
    hi = jnp.where(m_hi, ghi, hi_raw)
    return lo, hi


def _halfsweep(cfg, p, rhs_w, lam, gcoords, bpw, par_val, interpret,
               zgates=None):
    """One masked GSRB half-sweep over a window; bitwise-identical
    arithmetic to kernels.helmholtz_smooth_half."""
    acc = -rhs_w
    # dim order 0=x(axis2), 1=y(axis1), 2=z(axis0), ascending like boxed
    for d, axis in ((0, 2), (1, 1), (2, 0)):
        lo, hi = _neighbor_ops(cfg, p, d, axis, gcoords, bpw, interpret,
                               zgates)
        acc = acc + cfg.idr2[d] * (lo + hi)
    new = acc / (cfg.den0 + lam)
    gx, gy, gz = gcoords
    par = (gx + gy + gz) % 2
    return jnp.where(par == par_val, new, p)


def _apply_expr(cfg, p, lam, gcoords, bpw, interpret, zgates=None):
    """A(phi) over a window (boxed op_apply order: out = -lam*c;
    out += idr2[d]*(lo + hi - 2c))."""
    out = -lam * p
    for d, axis in ((0, 2), (1, 1), (2, 0)):
        lo, hi = _neighbor_ops(cfg, p, d, axis, gcoords, bpw, interpret,
                               zgates)
        out = out + cfg.idr2[d] * (lo + hi - 2.0 * p)
    return out


def _full_iotas(cfg):
    gz = lax.broadcasted_iota(jnp.int32, cfg.pshape, 0) - PZ
    gy = lax.broadcasted_iota(jnp.int32, cfg.pshape, 1) - PY
    gx = lax.broadcasted_iota(jnp.int32, cfg.pshape, 2)
    return gx, gy, gz


def _bpw_full(cfg, bplanes):
    """Boundary values broadcast against the full padded array."""
    out = []
    for i in range(6):
        if cfg.b_const[i] is not None:
            out.append(cfg.b_const[i])
        elif i < 2:    # x faces: [ZP, YPW]
            out.append(bplanes[i][:, :, None])
        elif i < 4:    # y faces: [ZP, X]
            out.append(bplanes[i][:, None, :])
        else:          # z faces: [YPW, X]
            out.append(bplanes[i][None, :, :])
    return out


# ---------------------------------------------------------------------------
# jnp fallback (identical computation over the whole padded array)
# ---------------------------------------------------------------------------

def _pair_jnp(cfg, phi, rhs, lam, bplanes, red_parity, zgates=None):
    g = _full_iotas(cfg)
    bpw = _bpw_full(cfg, bplanes)
    p1 = _halfsweep(cfg, phi, rhs, lam, g, bpw, red_parity, True, zgates)
    return _halfsweep(cfg, p1, rhs, lam, g, bpw, 1 - red_parity, True,
                      zgates)


def _apply_jnp(cfg, phi, rhs, lam, bplanes, residual, zgates=None):
    g = _full_iotas(cfg)
    bpw = _bpw_full(cfg, bplanes)
    out = _apply_expr(cfg, phi, lam, g, bpw, True, zgates)
    return rhs - out if residual else out


# ---------------------------------------------------------------------------
# Mosaic kernels
# ---------------------------------------------------------------------------

def _make_kernel(cfg: DenseStencilConfig, body):
    """Shared scaffolding: window DMA in, ``body`` on the window,
    core DMA out.  body(p_window, rhs_window, lam, gcoords, bpw) ->
    window-shaped result."""
    tz, ty, X = cfg.tz, cfg.ty, cfg.X
    tzw, tyw = tz + 2 * PZ, ty + 2 * PY

    def kernel(phi_hbm, rhs_hbm, b0, b1, b2, b3, b4, b5, lam_ref,
               zg_ref, out_hbm, hphi, hrhs, sems):
        zi = pl.program_id(0)
        yi = pl.program_id(1)
        z0 = zi * tz
        y0 = yi * ty

        in_phi = pltpu.make_async_copy(
            phi_hbm.at[pl.ds(z0, tzw), pl.ds(y0, tyw), :], hphi,
            sems.at[0])
        in_rhs = pltpu.make_async_copy(
            rhs_hbm.at[pl.ds(z0, tzw), pl.ds(y0, tyw), :], hrhs,
            sems.at[1])
        in_phi.start()
        in_rhs.start()
        in_phi.wait()
        in_rhs.wait()

        shape = (tzw, tyw, X)
        gz = lax.broadcasted_iota(jnp.int32, shape, 0) + (z0 - PZ)
        gy = lax.broadcasted_iota(jnp.int32, shape, 1) + (y0 - PY)
        gx = lax.broadcasted_iota(jnp.int32, shape, 2)

        # boundary values: static scalars, or windows of the resident
        # VMEM planes (dynamic in-VMEM slices, no HBM windowing rules)
        brefs = [b0, b1, b2, b3, b4, b5]
        bpw = []
        for i in range(6):
            if cfg.b_const[i] is not None:
                bpw.append(cfg.b_const[i])
            elif i < 2:
                w = brefs[i][pl.ds(z0, tzw), pl.ds(y0, tyw)]
                bpw.append(w[:, :, None])
            elif i < 4:
                w = brefs[i][pl.ds(z0, tzw), :]
                bpw.append(w[:, None, :])
            else:
                w = brefs[i][pl.ds(y0, tyw), :]
                bpw.append(w[None, :, :])

        lam = lam_ref[0, 0]
        zgates = (zg_ref[0, 0] != 0, zg_ref[0, 1] != 0)
        hphi[:] = body(hphi[:], hrhs[:], lam, (gx, gy, gz), bpw, zgates)
        out_dma = pltpu.make_async_copy(
            hphi.at[pl.ds(PZ, tz), pl.ds(PY, ty), :],
            out_hbm.at[pl.ds(z0 + PZ, tz), pl.ds(y0 + PY, ty), :],
            sems.at[2])
        out_dma.start()
        out_dma.wait()

    return kernel


def _call_kernel(cfg, body, phi, rhs, lam, bplanes, z_gates):
    tz, ty, X = cfg.tz, cfg.ty, cfg.X
    tzw, tyw = tz + 2 * PZ, ty + 2 * PY
    dt = cfg.dtype
    grid = (cfg.Z // tz, cfg.Y // ty)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    zeros11 = jnp.zeros((1, 1), dt)
    plane_args = []
    plane_specs = []
    for i in range(6):
        if cfg.b_const[i] is None:
            plane_args.append(bplanes[i])
            plane_specs.append(vmem_spec)
        else:
            plane_args.append(zeros11)
            plane_specs.append(smem_spec)
    lam_arr = jnp.asarray(lam, dt).reshape(1, 1)
    if z_gates is None:
        zg_arr = jnp.ones((1, 2), jnp.int32)
    else:
        zg_arr = jnp.stack([jnp.asarray(z_gates[0], jnp.int32),
                            jnp.asarray(z_gates[1], jnp.int32)]
                           ).reshape(1, 2)

    return pl.pallas_call(
        _make_kernel(cfg, body),
        out_shape=jax.ShapeDtypeStruct(cfg.pshape, dt),
        grid=grid,
        in_specs=[any_spec, any_spec] + plane_specs + [smem_spec,
                                                       smem_spec],
        out_specs=any_spec,
        scratch_shapes=[pltpu.VMEM((tzw, tyw, X), dt),
                        pltpu.VMEM((tzw, tyw, X), dt),
                        pltpu.SemaphoreType.DMA((3,))],
        interpret=cfg.interpret,
    )(phi, rhs, *plane_args, lam_arr, zg_arr)


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------

def pair_sweep_dense(cfg: DenseStencilConfig, phi, rhs, lam, bplanes,
                     red_parity: int, z_gates=None):
    """Fused [red half-sweep, ghost refresh, black half-sweep].

    phi/rhs: padded_shape(dims); lam: scalar; bplanes: 6 padded
    boundary-value planes (only plane-valued faces are read).
    red_parity: global (gx+gy+gz)%2 value updated by the red sweep
    (the boxed path's substep-n mask corresponds to (n+1)%2).
    Returns new phi with garbage pads.
    """
    if not cfg.use_kernel:
        return _pair_jnp(cfg, phi, rhs, lam, bplanes, red_parity, z_gates)

    def body(p, r, lam_s, g, bpw, zgates):
        p1 = _halfsweep(cfg, p, r, lam_s, g, bpw, red_parity,
                        cfg.interpret, zgates)
        return _halfsweep(cfg, p1, r, lam_s, g, bpw, 1 - red_parity,
                          cfg.interpret, zgates)

    return _call_kernel(cfg, body, phi, rhs, lam, bplanes, z_gates)


def stencil_apply_dense(cfg: DenseStencilConfig, phi, rhs, lam, bplanes,
                        residual: bool, z_gates=None):
    """A(phi) (or rhs - A(phi)) in one pass (box_lpl/box_helmh +
    residual_box, m_multigrid.f90:426-436)."""
    if not cfg.use_kernel:
        return _apply_jnp(cfg, phi, rhs, lam, bplanes, residual, z_gates)

    def body(p, r, lam_s, g, bpw, zgates):
        out = _apply_expr(cfg, p, lam_s, g, bpw, cfg.interpret, zgates)
        return r - out if residual else out

    return _call_kernel(cfg, body, phi, rhs, lam, bplanes, z_gates)
