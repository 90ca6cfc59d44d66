"""Dense-level 2D stencil kernels (XLA).

2D analogue of ``ops/dense_kernels``: on a uniform 2D level the cells
form one dense ``[Y, X]`` array (x on lanes, y on sublanes) and the
GSRB smoother / operator run as whole-array masked expressions with NO
materialized ghost cells at all — physical-BC ghosts are synthesized
inline from the Fortran formula (ghost = c0*b + c1*x1 + c2*x2,
m_ghost_cells.f90:682-698) at the cells that read them, and periodic
wraps are exact ``jnp.roll``s.  This removes the boxed path's per-box
ghost ring ((nc+2)^2/nc^2 = 1.27x traffic at nc=16), its ghost-fill
passes between half-sweeps (smooth_boxes, m_multigrid.f90:404-424) and
its catastrophic TPU layout ([n, 18, 18] puts an 18-wide dim on the
128-lane axis).

2D problems are small relative to the chip (4096^2 = 1/8 the cells of
512^3), so XLA's fused masked expressions reach the dispatch/pass-count
floor without Mosaic kernels; there is no pad geometry and no kernel/
fallback split.

Arithmetic orders match the boxed kernels exactly (bitwise — see
tests/test_dense2d.py): ``kernels.helmholtz_smooth_half`` /
``vhelmholtz_smooth_half`` / ``ahelmholtz_smooth_half`` /
``cyl_laplacian_smooth_half`` and the corresponding apply forms
(m_laplacian.f90:52-195, m_vlaplacian.f90:51-189, m_ahelmholtz.f90:
69-237, the 2D cylindrical variants m_laplacian.f90:197-271).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax


class Dense2DConfig:
    """Static per-level kernel configuration (2D).

    dims: (X, Y) cell counts; idr2 likewise (x, y); bc: per direction
    nb=0..3 (x-,x+,y-,y+) a (c0,c1,c2) tuple (ignored on periodic
    axes); b_const: per direction a static boundary value or None when
    the value varies over the face (then a vector input is used);
    cyl_w: optional (w_lo, w_hi) radial face-weight rows [1, X] for the
    2D cylindrical laplacian (box_clpl, m_laplacian.f90:209-212).
    """

    def __init__(self, dims, idr2, bc, periodic, dtype, b_const=None,
                 n_eps=0, cyl_w=None, eps_bc=None):
        self.X, self.Y = int(dims[0]), int(dims[1])
        self.dims = (self.X, self.Y)
        self.idr2 = tuple(float(v) for v in idr2)
        self.bc = bc
        self.periodic = tuple(bool(p) for p in periodic)
        self.dtype = dtype
        self.n_eps = int(n_eps)
        #: per-face (c0,c1,c2) ghost synthesis for the coefficient
        #: fields, or None = the reference default (Neumann-zero,
        #: m_vlaplacian.f90:25-28).  The 2D dense-patch AMR solver sets
        #: refinement faces to the sides_rb combination (0.5, 0.75,
        #: -0.25) with vector-valued b (m_ghost_cells.f90:769-861).
        self.eps_bc = eps_bc
        self.cyl_w = cyl_w
        self.b_const = list(b_const) if b_const is not None else [None] * 4
        for i in range(4):
            if self.periodic[i // 2]:
                self.b_const[i] = 0.0
        #: shared solver code inspects these (no Mosaic path in 2D)
        self.use_kernel = False
        self.fused_down_ok = False
        s = 0.0
        for d in range(2):
            s = s + 2.0 * self.idr2[d]
        self.den0 = s

    @property
    def pshape(self):
        return (self.Y, self.X)


def _iotas(cfg):
    gx = lax.broadcasted_iota(jnp.int32, (1, cfg.X), 1)
    gy = lax.broadcasted_iota(jnp.int32, (cfg.Y, 1), 0)
    return gx, gy


def _face_masks(cfg):
    """Boundary masks per non-periodic dim (rank-1 iotas, tiny)."""
    gx, gy = _iotas(cfg)
    masks = {}
    for d, g in ((0, gx), (1, gy)):
        if cfg.periodic[d]:
            masks[d] = None
        else:
            masks[d] = (g == 0, g == cfg.dims[d] - 1)
    return masks


def _parity_mask(cfg, red_parity: int):
    """(gx+gy)%2 == red_parity — the global checkerboard, identical to
    the boxed parity because box sizes are even (SURVEY §7.3.1)."""
    gx, gy = _iotas(cfg)
    return ((gx + gy) % 2) == red_parity


def _bvals(cfg, bvecs):
    """Boundary values broadcast against [Y, X]: x faces vary along y
    ([Y] -> [Y,1]), y faces along x ([X] -> [1,X])."""
    out = []
    for i in range(4):
        if cfg.b_const[i] is not None:
            out.append(cfg.b_const[i])
        elif i < 2:
            out.append(bvecs[i][:, None])
        else:
            out.append(bvecs[i][None, :])
    return out


def _neighbor_ops(cfg, p, d, masks, bpw):
    """(lo, hi) neighbor values along dim d with inline BC synthesis
    (same recipe as dense_kernels._neighbor_ops)."""
    axis = 1 - d
    lo_raw = jnp.roll(p, +1, axis=axis)
    hi_raw = jnp.roll(p, -1, axis=axis)
    if masks[d] is None:
        return lo_raw, hi_raw
    c0l, c1l, c2l = cfg.bc[2 * d]
    c0h, c1h, c2h = cfg.bc[2 * d + 1]
    glo = c0l * bpw[2 * d] + c1l * p
    if c2l != 0.0:
        glo = glo + c2l * hi_raw
    ghi = c0h * bpw[2 * d + 1] + c1h * p
    if c2h != 0.0:
        ghi = ghi + c2h * lo_raw
    m_lo, m_hi = masks[d]
    return jnp.where(m_lo, glo, lo_raw), jnp.where(m_hi, ghi, hi_raw)


def _eps_neighbor_ops(cfg, e, d, masks, ebpw=None):
    """Coefficient-field neighbors: Neumann-zero physical ghosts
    (ghost = own value, m_vlaplacian.f90:25-28), or — with cfg.eps_bc
    set — the full bc_to_gc synthesis per face (the 2D dense-patch AMR
    solver: sides_rb (0.5, 0.75, -0.25) with vector-valued b at
    refinement faces; faces whose c0 is 0 never read ``ebpw``)."""
    axis = 1 - d
    lo_raw = jnp.roll(e, +1, axis=axis)
    hi_raw = jnp.roll(e, -1, axis=axis)
    if masks[d] is None:
        return lo_raw, hi_raw
    m_lo, m_hi = masks[d]
    if cfg.eps_bc is None:
        return jnp.where(m_lo, e, lo_raw), jnp.where(m_hi, e, hi_raw)
    c0l, c1l, c2l = cfg.eps_bc[2 * d]
    c0h, c1h, c2h = cfg.eps_bc[2 * d + 1]
    # same accumulation order as _neighbor_ops (c0*b + c1*x1 + c2*x2)
    glo = c1l * e
    if c0l != 0.0:
        glo = c0l * ebpw[2 * d] + glo
    if c2l != 0.0:
        glo = glo + c2l * hi_raw
    ghi = c1h * e
    if c0h != 0.0:
        ghi = c0h * ebpw[2 * d + 1] + ghi
    if c2h != 0.0:
        ghi = ghi + c2h * lo_raw
    return jnp.where(m_lo, glo, lo_raw), jnp.where(m_hi, ghi, hi_raw)


def _bvals_eps(eps_planes):
    """Coefficient-field boundary vectors broadcast against [Y, X]:
    per eps field a 4-list (``None`` faces broadcast as 0.0)."""
    if eps_planes is None:
        return None
    out = []
    for planes in eps_planes:
        row = []
        for i in range(4):
            p = planes[i]
            if p is None:
                row.append(0.0)
            elif i < 2:
                row.append(p[:, None])
            else:
                row.append(p[None, :])
        out.append(row)
    return out


def _halfsweep(cfg, p, rhs, lam, masks, upd, red, bpw, eps, ebpw=None):
    """One masked GSRB half-sweep; bitwise the boxed smoothers."""
    if cfg.cyl_w is not None:
        # 2D cylindrical laplacian (cyl_laplacian_smooth_half order)
        w_lo, w_hi = cfg.cyl_w
        xlo, xhi = _neighbor_ops(cfg, p, 0, masks, bpw)
        ylo, yhi = _neighbor_ops(cfg, p, 1, masks, bpw)
        fac = 0.5 / (cfg.idr2[0] + cfg.idr2[1])
        new = fac * (cfg.idr2[0] * (w_hi * xhi + w_lo * xlo)
                     + cfg.idr2[1] * (yhi + ylo) - rhs)
        return jnp.where(upd, new, p) if red else jnp.where(upd, p, new)
    if cfg.n_eps:
        num = -rhs
        den = lam
        for d in range(2):
            e0 = eps[0] if cfg.n_eps == 1 else eps[d]
            eb = None if ebpw is None else ebpw[0 if cfg.n_eps == 1
                                                else d]
            elo, ehi = _eps_neighbor_ops(cfg, e0, d, masks, eb)
            plo, phi_ = _neighbor_ops(cfg, p, d, masks, bpw)
            c = 2.0 * e0 * elo / (e0 + elo) * cfg.idr2[d]
            num = num + c * plo
            den = den + c
            c = 2.0 * e0 * ehi / (e0 + ehi) * cfg.idr2[d]
            num = num + c * phi_
            den = den + c
        new = num / den
        return jnp.where(upd, new, p) if red else jnp.where(upd, p, new)
    acc = -rhs
    for d in range(2):
        lo, hi = _neighbor_ops(cfg, p, d, masks, bpw)
        acc = acc + cfg.idr2[d] * (lo + hi)
    new = acc * (1.0 / (cfg.den0 + lam))
    return jnp.where(upd, new, p) if red else jnp.where(upd, p, new)


def _apply_expr(cfg, p, lam, masks, bpw, eps, ebpw=None):
    """A(phi): boxed op_apply order."""
    if cfg.cyl_w is not None:
        w_lo, w_hi = cfg.cyl_w
        xlo, xhi = _neighbor_ops(cfg, p, 0, masks, bpw)
        ylo, yhi = _neighbor_ops(cfg, p, 1, masks, bpw)
        return (cfg.idr2[0] * (w_lo * xlo + w_hi * xhi - 2.0 * p)
                + cfg.idr2[1] * (ylo + yhi - 2.0 * p))
    out = -lam * p
    if cfg.n_eps:
        for d in range(2):
            e0 = eps[0] if cfg.n_eps == 1 else eps[d]
            eb = None if ebpw is None else ebpw[0 if cfg.n_eps == 1
                                                else d]
            elo, ehi = _eps_neighbor_ops(cfg, e0, d, masks, eb)
            plo, phi_ = _neighbor_ops(cfg, p, d, masks, bpw)
            c = 2.0 * e0 * elo / (e0 + elo) * cfg.idr2[d]
            out = out + c * (plo - p)
            c = 2.0 * e0 * ehi / (e0 + ehi) * cfg.idr2[d]
            out = out + c * (phi_ - p)
        return out
    for d in range(2):
        lo, hi = _neighbor_ops(cfg, p, d, masks, bpw)
        out = out + cfg.idr2[d] * (lo + hi - 2.0 * p)
    return out


def _lam_2d(lam, dtype):
    """Materialize the traced Helmholtz scalar as a [1,1] array.

    Measured on TPU (experiments/probe_dense2d_perf.py bisect): a
    traced 0-d scalar multiplied into the fused whole-array chain makes
    XLA emit a ~50x-slower kernel (161 ms vs 3.1 ms for the GSRB pair
    at 2048^2 f32); a [1,1] broadcast costs nothing and keeps the
    no-recompile-per-lambda property."""
    return jnp.asarray(lam, dtype).reshape(1, 1)


def pair_sweep_2d(cfg: Dense2DConfig, phi, rhs, lam, bvecs,
                  red_parity: int, eps=(), eps_planes=None):
    """One fused red+black GSRB pair over the dense [Y, X] level."""
    lam = _lam_2d(lam, cfg.dtype)
    masks = _face_masks(cfg)
    upd = _parity_mask(cfg, red_parity)
    bpw = _bvals(cfg, bvecs)
    ebpw = _bvals_eps(eps_planes)
    p1 = _halfsweep(cfg, phi, rhs, lam, masks, upd, True, bpw, eps, ebpw)
    return _halfsweep(cfg, p1, rhs, lam, masks, upd, False, bpw, eps,
                      ebpw)


def stencil_apply_2d(cfg: Dense2DConfig, phi, rhs, lam, bvecs,
                     residual: bool, eps=(), eps_planes=None):
    """A(phi) or rhs - A(phi) in one pass."""
    lam = _lam_2d(lam, cfg.dtype)
    masks = _face_masks(cfg)
    bpw = _bvals(cfg, bvecs)
    out = _apply_expr(cfg, phi, lam, masks, bpw, eps,
                      _bvals_eps(eps_planes))
    return rhs - out if residual else out
