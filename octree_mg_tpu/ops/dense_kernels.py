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

#: pad depths: z (untiled axis) needs >=5 for the fused downsweep
#: kernel's halo (4 half-sweeps + residual ring) and is 8 so that the
#: boundary-value planes — whose z extent sits on the SUBLANE dim of
#: their 2D layout — admit 8-aligned window loads (offset z0 multiple
#: of tz, size tz+2*PZ, then a static in-register subslice); y (sublane
#: axis of the 3D arrays) is padded to the Mosaic window-alignment
#: quantum, which also covers the deepest y halo
PZ = 8
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
                 tile=(16, 48), interpret=False, n_eps=0, eps_bc=None):
        self.X, self.Y, self.Z = int(dims[0]), int(dims[1]), int(dims[2])
        self.dims = (self.X, self.Y, self.Z)
        self.idr2 = tuple(float(v) for v in idr2)
        self.bc = bc
        self.periodic = tuple(bool(p) for p in periodic)
        self.dtype = dtype
        self.interpret = interpret
        #: number of coefficient fields riding along with phi/rhs:
        #: 0 = constant-coefficient (laplacian/helmholtz), 1 = scalar
        #: cell-centered eps (vlaplacian/vhelmholtz, m_vlaplacian.f90),
        #: 3 = per-direction eps (ahelmholtz, m_ahelmholtz.f90)
        self.n_eps = int(n_eps)
        #: per-face (c0,c1,c2) ghost synthesis for the coefficient
        #: fields, or None = the reference default (Neumann-zero: ghost
        #: = own value, m_vlaplacian.f90:25-28).  The dense-patch AMR
        #: solvers set refinement faces to the sides_rb combination
        #: (0.5, 0.75, -0.25) with plane-valued b — eps ghosts at
        #: refinement boundaries follow the same two-stage scheme as
        #: any variable (m_ghost_cells.f90:131-175).
        self.eps_bc = eps_bc
        self.b_const = list(b_const) if b_const is not None else [None] * 6
        for i in range(6):
            if self.periodic[i // 2]:
                self.b_const[i] = 0.0
        self.plane_faces = [i for i in range(6)
                            if self.b_const[i] is None]
        # plane-valued faces keep their windows resident in VMEM; use
        # smaller tiles to leave room.  Their z extent sits on the
        # sublane dim of the 2D plane layout, so the aligned-superset
        # window loads additionally need tz % 8 == 0.
        want_z, want_y = tile if not self.plane_faces else (8, 32)
        self.tz = _pick_tile(self.Z, want_z,
                             quantum=8 if self.plane_faces else 1)
        self.ty = _pick_tile(self.Y, want_y, quantum=PY)
        #: whether the Mosaic kernel path is usable (alignment); tiny or
        #: unaligned levels use the identical-jnp fallback.  X must fill
        #: whole lane tiles: DMA windows of a lane-padded array slice
        #: dimension 2 at the logical size, which Mosaic requires to be
        #: 128-aligned.
        self.use_kernel = (self.ty is not None and self.tz is not None
                           and self.Y % PY == 0 and self.X % 128 == 0)
        # float64 has no Mosaic support on TPU; the identical-jnp path
        # serves it (XLA f64 emulation).  Interpret mode (CPU tests)
        # keeps the kernel path so f64 parity tests cover it.
        if not interpret and np.dtype(dtype).itemsize > 4:
            self.use_kernel = False
        # plane-valued eps ghost synthesis is not plumbed through the
        # Mosaic plane windows; the identical-jnp path serves it (AMR
        # patch levels — smaller than the uniform top level anyway)
        if eps_bc is not None:
            self.use_kernel = False
        #: fused downsweep (smooth+residual+restrict) eligibility: the
        #: in-kernel restriction writes coarse tiles, so the coarse
        #: lane extent must be a 128-multiple, x a power of two (the
        #: compaction network), and the tile must halve onto the coarse
        #: 8-aligned sublane grid
        self.fused_down_ok = (self.use_kernel
                              and _is_pow2(self.X) and self.X >= 256
                              and self.tz % 2 == 0 and self.ty % 16 == 0
                              and all(d % 2 == 0 for d in self.dims))
        # denominator accumulated exactly like the boxed smoother
        s = 0.0
        for d in range(3):
            s = s + 2.0 * self.idr2[d]
        self.den0 = s

    @property
    def pshape(self):
        return padded_shape((self.X, self.Y, self.Z))


def _face_masks(cfg, gcoords, zgates=None, active=(True, True, True)):
    """Boundary masks per non-periodic dim, computed ONCE per window
    and shared by all sweeps/bodies.  gcoords are rank-1-broadcastable
    iotas ((1,1,X) / (1,YW,1) / (ZW,1,1)) so the masks stay tiny in
    VMEM — mask/iota arithmetic materialized at window size is pure
    VPU + VMEM overhead on every cell.

    zgates: optional traced (lo, hi) booleans that gate the z-face BC
    synthesis — under z-slab sharding only the first/last shard owns a
    physical z face; interior shards read their ppermute-filled halo
    pads instead.

    active[d]=False marks a dim whose boundary rows provably lie
    outside this window: the mask is dropped entirely so the sweeps
    skip that dim's ghost synthesis (bitwise exact — the synthesized
    values would be where'd away on every cell anyway)."""
    masks = {}
    for d in range(3):
        if cfg.periodic[d] or not active[d]:
            masks[d] = None
            continue
        g = gcoords[d]
        m_lo = g == 0
        m_hi = g == cfg.dims[d] - 1
        if d == 2 and zgates is not None:
            m_lo = m_lo & zgates[0]
            m_hi = m_hi & zgates[1]
        masks[d] = (m_lo, m_hi)
    return masks


def _parity_mask(gcoords, red_parity: int):
    """Boolean "cell parity == red parity" mask (full window shape, the
    only window-sized mask the sweeps need).  (gx+gy+gz)%2 == rp is
    evaluated as an xor of per-axis parities so no window-sized int32
    intermediate is materialized."""
    gx, gy, gz = gcoords
    pyx = (gy + gx) % 2
    pz = gz % 2
    return (pyx != pz) if red_parity == 1 else (pyx == pz)


def _neighbor_ops(cfg, p, d, axis, masks, bpw, interpret, segd=None,
                  g=None):
    """(lo, hi) neighbor-value arrays along dim d with inline BC synth.

    bpw: per direction the boundary value (scalar or array broadcast to
    the window shape); masks: from :func:`_face_masks`.

    segd: optional forest SEGMENT synthesis (reader-indexed): a list of
    (c, side, (a0, a1, a2, m) transverse-plane windows) for ghost layers
    at canvas coordinate c along dim d.  A reader whose dim-d neighbor
    at distance 1 is a ghost cell of such a layer substitutes
    ghost = (a0 + a1*x1) + a2*x2 with x1 = the reader itself and x2 =
    the reader's other dim-d neighbor — the same expression tree as the
    ring/face synthesis in DenseForestMGSolver._ring_values (c0*b
    pre-multiplied into a0), so values are bit-identical.  side 0:
    ghost at the LOW side of its footprint run (seg.nb even; readers at
    c+1 read their LO neighbor); side 1: readers at c-1 read HI.
    Computed at READ time per direction, which also resolves
    concave-corner conflicts exactly (per-box ghost-storage semantics —
    each direction's reads see that direction's ghosts)."""
    lo_raw = _roll(p, +1, axis, interpret)
    hi_raw = _roll(p, -1, axis, interpret)
    if masks[d] is None:
        # periodic (x wraps are exact rolls; z/y wraps come from driver-
        # maintained pad planes, and window-border wraparound lands only
        # in rows whose results are never consumed), or a dim whose
        # boundary lies outside this window (interior-tile fast path)
        lo, hi = lo_raw, hi_raw
    else:
        c0l, c1l, c2l = cfg.bc[2 * d]
        c0h, c1h, c2h = cfg.bc[2 * d + 1]
        glo = c0l * bpw[2 * d] + c1l * p
        if c2l != 0.0:
            glo = glo + c2l * hi_raw
        ghi = c0h * bpw[2 * d + 1] + c1h * p
        if c2h != 0.0:
            ghi = ghi + c2h * lo_raw
        m_lo, m_hi = masks[d]
        lo = jnp.where(m_lo, glo, lo_raw)
        hi = jnp.where(m_hi, ghi, hi_raw)
    if segd:
        gq = g[d]
        for (c, side, (a0w, a1w, a2w, mw)) in segd:
            if side == 0:
                m = (gq == c + 1) & (mw != 0.0)
                lo = jnp.where(m, (a0w + a1w * p) + a2w * hi_raw, lo)
            else:
                m = (gq == c - 1) & (mw != 0.0)
                hi = jnp.where(m, (a0w + a1w * p) + a2w * lo_raw, hi)
    return lo, hi


def _eps_neighbor_ops(cfg, e, d, axis, masks, interpret, ebpw=None):
    """(lo, hi) neighbor values of a coefficient field along dim d.

    Default (cfg.eps_bc None): Neumann-zero physical ghosts
    (m_vlaplacian.f90:25-28, m_ahelmholtz.f90:28-41): ghost = x1, i.e.
    at a physical face the neighbor value IS the cell's own value.
    With cfg.eps_bc set, the full bc_to_gc synthesis runs per face —
    the dense-patch AMR solvers put the sides_rb combination
    (0.5, 0.75, -0.25) with the coarse-interp plane b on refinement
    faces (m_ghost_cells.f90:769-861) and (0, 1, 0) (= Neumann-zero)
    on physical faces; faces whose c0 is 0 never read ``ebpw``."""
    lo_raw = _roll(e, +1, axis, interpret)
    hi_raw = _roll(e, -1, axis, interpret)
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


def _halfsweep(cfg, p, rhs_w, lam, masks, upd, red, bpw, interpret,
               eps=(), ebpw=None, segw=None, g=None):
    """One masked GSRB half-sweep over a window; bitwise-identical
    arithmetic to kernels.helmholtz_smooth_half (constant coefficient)
    / kernels.vhelmholtz_smooth_half / kernels.ahelmholtz_smooth_half
    (eps present — same harmonic-mean face coefficients, same num/den
    accumulation order, m_vlaplacian.f90:51-128, m_ahelmholtz.f90:69-162).

    upd: boolean "parity == red parity" mask; red=True updates those
    cells, red=False the complement (same mask, swapped select arms)."""
    if cfg.n_eps:
        num = -rhs_w
        den = lam
        for d, axis in ((0, 2), (1, 1), (2, 0)):
            e0 = eps[0] if cfg.n_eps == 1 else eps[d]
            eb = None if ebpw is None else ebpw[0 if cfg.n_eps == 1
                                                else d]
            elo, ehi = _eps_neighbor_ops(cfg, e0, d, axis, masks,
                                         interpret, eb)
            plo, phi_ = _neighbor_ops(cfg, p, d, axis, masks, bpw,
                                      interpret)
            c = 2.0 * e0 * elo / (e0 + elo) * cfg.idr2[d]
            num = num + c * plo
            den = den + c
            c = 2.0 * e0 * ehi / (e0 + ehi) * cfg.idr2[d]
            num = num + c * phi_
            den = den + c
        new = num / den
        return jnp.where(upd, new, p) if red else jnp.where(upd, p, new)
    acc = -rhs_w
    # dim order 0=x(axis2), 1=y(axis1), 2=z(axis0), ascending like boxed
    for d, axis in ((0, 2), (1, 1), (2, 0)):
        lo, hi = _neighbor_ops(cfg, p, d, axis, masks, bpw, interpret,
                               None if segw is None else segw[d], g)
        acc = acc + cfg.idr2[d] * (lo + hi)
    new = acc * (1.0 / (cfg.den0 + lam))
    return jnp.where(upd, new, p) if red else jnp.where(upd, p, new)


def _apply_expr(cfg, p, lam, masks, bpw, interpret, eps=(), ebpw=None,
                segw=None, g=None):
    """A(phi) over a window (boxed op_apply order: out = -lam*c;
    out += idr2[d]*(lo + hi - 2c), or with eps the harmonic-mean form
    out += c*(nbr - c0), kernels.vhelmholtz_apply/ahelmholtz_apply)."""
    out = -lam * p
    if cfg.n_eps:
        for d, axis in ((0, 2), (1, 1), (2, 0)):
            e0 = eps[0] if cfg.n_eps == 1 else eps[d]
            eb = None if ebpw is None else ebpw[0 if cfg.n_eps == 1
                                                else d]
            elo, ehi = _eps_neighbor_ops(cfg, e0, d, axis, masks,
                                         interpret, eb)
            plo, phi_ = _neighbor_ops(cfg, p, d, axis, masks, bpw,
                                      interpret)
            c = 2.0 * e0 * elo / (e0 + elo) * cfg.idr2[d]
            out = out + c * (plo - p)
            c = 2.0 * e0 * ehi / (e0 + ehi) * cfg.idr2[d]
            out = out + c * (phi_ - p)
        return out
    for d, axis in ((0, 2), (1, 1), (2, 0)):
        lo, hi = _neighbor_ops(cfg, p, d, axis, masks, bpw, interpret,
                               None if segw is None else segw[d], g)
        out = out + cfg.idr2[d] * (lo + hi - 2.0 * p)
    return out


def _iotas(shape, z_off, y_off):
    """Broadcastable per-axis global-coordinate iotas for a window (or
    the full padded array)."""
    ZW, YW, X = shape
    gz = lax.broadcasted_iota(jnp.int32, (ZW, 1, 1), 0) + z_off
    gy = lax.broadcasted_iota(jnp.int32, (1, YW, 1), 1) + y_off
    gx = lax.broadcasted_iota(jnp.int32, (1, 1, X), 2)
    return gx, gy, gz


def _full_iotas(cfg):
    return _iotas(cfg.pshape, -PZ, -PY)


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


def _bpw_eps_full(eps_planes):
    """Coefficient-field boundary planes broadcast against the padded
    array: per eps field a 6-list of planes (``None`` faces — whose
    synthesis never reads b — broadcast as 0.0).  Plane layouts match
    :func:`_bpw_full`: x faces [ZP, YPW], y faces [ZP, X], z faces
    [YPW, X]."""
    if eps_planes is None:
        return None
    out = []
    for planes in eps_planes:
        row = []
        for i in range(6):
            p = planes[i]
            if p is None:
                row.append(0.0)
            elif i < 2:
                row.append(p[:, :, None])
            elif i < 4:
                row.append(p[:, None, :])
            else:
                row.append(p[None, :, :])
        out.append(row)
    return out


# ---------------------------------------------------------------------------
# jnp fallback (identical computation over the whole padded array)
# ---------------------------------------------------------------------------

def _pair_jnp(cfg, phi, rhs, lam, bplanes, red_parity, zgates=None,
              eps=(), eps_planes=None):
    g = _full_iotas(cfg)
    masks = _face_masks(cfg, g, zgates)
    upd = _parity_mask(g, red_parity)
    bpw = _bpw_full(cfg, bplanes)
    ebpw = _bpw_eps_full(eps_planes)
    p1 = _halfsweep(cfg, phi, rhs, lam, masks, upd, True, bpw, True, eps,
                    ebpw)
    return _halfsweep(cfg, p1, rhs, lam, masks, upd, False, bpw, True,
                      eps, ebpw)


def _apply_jnp(cfg, phi, rhs, lam, bplanes, residual, zgates=None,
               eps=(), eps_planes=None):
    g = _full_iotas(cfg)
    masks = _face_masks(cfg, g, zgates)
    bpw = _bpw_full(cfg, bplanes)
    out = _apply_expr(cfg, phi, lam, masks, bpw, True, eps,
                      _bpw_eps_full(eps_planes))
    return rhs - out if residual else out


# ---------------------------------------------------------------------------
# Mosaic kernels
# ---------------------------------------------------------------------------

def _restrict_window(core, interp):
    """Full-weighting restriction of a core tile [2*tzc, ty, X] ->
    [tzc, ty/2, X/2]; identical add/compact order to restrict_dense
    (z pairs, then y roll+compact, then x roll+compact, /8)."""
    tz2, ty2, X = core.shape
    h = core.reshape(tz2 // 2, 2, ty2, X)
    t = h[:, 0] + h[:, 1]
    u = t + _roll(t, -1, 1, interp)
    t = _compact_pairs(u, 1, interp)
    u = t + _roll(t, -1, 2, interp)
    t = _compact_pairs(u, 2, interp)
    return t / 8.0


def _make_kernel(cfg: DenseStencilConfig, body, hz: int,
                 restrict_outs: bool = False, fine_out: bool = True,
                 zstream: bool = False, segs=None):
    """Shared scaffolding: window DMA in, ``body`` on the window,
    core DMA out.  body(p_window, rhs_window, lam, masks, gcoords, bpw) ->
    window-shaped result.

    hz: z halo depth of the phi window (<= PZ): 1 for one-ring stencil
    application, 2 per fused GSRB pair.  The z axis is untiled so the
    window may start at any row; y always carries the full PY halo
    (sublane alignment).  The rhs window is trimmed by one row per side
    (a k-sweep chain only ever consumes rhs within ring hz-1; the
    untouched edge rows of the scratch hold stale values that feed only
    discarded ring computations).

    zstream: walk tiles z-fastest and carry the 2*hz-row window overlap
    between consecutive z-tiles of a y-column through VMEM (a tiny
    in-VMEM head copy) instead of re-reading it from HBM — the z read
    amplification drops from (tz+2*hz)/tz to ~1.  Bitwise identical
    (the carried rows are the same bytes a re-read would fetch).
    Measured NEGATIVE on this chip and OFF by default: the sweep kernels
    are compute-bound (pair2 12.56 -> 12.40 ms, downsweep unchanged), and
    the DMA-bound residual+restrict kernel got 16% slower (7.61 -> 8.85
    ms, predicated-DMA overhead beats the saved bytes).  Kept as an
    option for future bandwidth-starved parts.

    restrict_outs: body returns (phi_window, res_window); both are
    full-weighting-restricted in-window and written to two extra padded
    coarse outputs (the downsweep fusion — update_coarse's two
    restriction passes ride along for ~1/4 extra write traffic).
    fine_out=False drops the fine phi output entirely (the plain
    update_coarse fusion: residual + both restrictions, no smoothing,
    nothing full-size written back)."""
    tz, ty, X = cfg.tz, cfg.ty, cfg.X
    tzw, tyw = tz + 2 * hz, ty + 2 * PY

    nyt = cfg.Y // ty
    nzt = cfg.Z // tz
    T = nzt * nyt

    if zstream:
        def tile_org(t):
            z0 = pl.multiple_of((t % nzt) * tz, tz)
            y0 = pl.multiple_of((t // nzt) * ty, ty)
            return z0, y0
    else:
        def tile_org(t):
            z0 = pl.multiple_of((t // nyt) * tz, tz)
            y0 = pl.multiple_of((t % nyt) * ty, ty)
            return z0, y0

    n_eps = cfg.n_eps

    n_seg = 0 if segs is None else len(segs)

    def kernel(*refs):
        phi_hbm, rhs_hbm = refs[0], refs[1]
        eps_hbm = refs[2:2 + n_eps]
        (b0, b1, b2, b3, b4, b5, lam_ref,
         zg_ref) = refs[2 + n_eps:10 + n_eps]
        seg_refs = refs[10 + n_eps:10 + n_eps + n_seg]
        rest = list(refs[10 + n_eps + n_seg:])
        out_hbm = rest.pop(0) if fine_out else None
        if restrict_outs:
            outpc_hbm = rest.pop(0)
            outrc_hbm = rest.pop(0)
        hphi, hrhs = rest.pop(0), rest.pop(0)
        heps = [rest.pop(0) for _ in range(n_eps)]
        hout = rest.pop(0) if fine_out else None
        if restrict_outs:
            hpc, hrc = rest.pop(0), rest.pop(0)
        sems_in = rest.pop(0)
        sems_out = rest.pop(0) if fine_out else None
        if restrict_outs:
            sems_c = rest.pop(0)
        # double-buffered pipeline over a linearized grid: the window
        # DMAs of tile t+1 are in flight while tile t computes, and the
        # core write-back of tile t drains under tile t+1's compute
        t = pl.program_id(0)
        slot = lax.rem(t, jnp.int32(2))
        nslot = lax.rem(t + 1, jnp.int32(2))

        def full_in_dmas(tt, s):
            zz, yy = tile_org(tt)
            zo = zz + (PZ - hz)
            dmas = [
                pltpu.make_async_copy(
                    phi_hbm.at[pl.ds(zo, tzw), pl.ds(yy, tyw), :],
                    hphi.at[s], sems_in.at[s, 0]),
                pltpu.make_async_copy(
                    rhs_hbm.at[pl.ds(zo + 1, tzw - 2), pl.ds(yy, tyw), :],
                    hrhs.at[s, pl.ds(1, tzw - 2)], sems_in.at[s, 1]),
            ]
            # coefficient windows travel with phi (same halo: sweep k at
            # valid ring r reads eps at ring r+1, exactly like phi)
            for i in range(n_eps):
                dmas.append(pltpu.make_async_copy(
                    eps_hbm[i].at[pl.ds(zo, tzw), pl.ds(yy, tyw), :],
                    heps[i].at[s], sems_in.at[s, 2 + i]))
            return dmas

        def part_in_dmas(tt, s):
            # z-streamed continuation tile: only the tz new rows come
            # from HBM; the 2*hz-row head is copied from the previous
            # window's tail (disjoint scratch rows, so both may be in
            # flight together)
            zz, yy = tile_org(tt)
            zo = zz + (PZ - hz)
            return [
                pltpu.make_async_copy(
                    phi_hbm.at[pl.ds(zo + 2 * hz, tz), pl.ds(yy, tyw), :],
                    hphi.at[s, pl.ds(2 * hz, tz)], sems_in.at[s, 0]),
                pltpu.make_async_copy(
                    rhs_hbm.at[pl.ds(zo + tzw - 1 - tz, tz),
                               pl.ds(yy, tyw), :],
                    hrhs.at[s, pl.ds(tzw - 1 - tz, tz)], sems_in.at[s, 1]),
            ]

        def start_in(tt, s):
            if not zstream:
                for d in full_in_dmas(tt, s):
                    d.start()
                return

            @pl.when(lax.rem(tt, jnp.int32(nzt)) == 0)
            def _():
                for d in full_in_dmas(tt, s):
                    d.start()

            @pl.when(lax.rem(tt, jnp.int32(nzt)) != 0)
            def _():
                for d in part_in_dmas(tt, s):
                    d.start()

        def wait_in(tt, s):
            if not zstream:
                for d in full_in_dmas(tt, s):
                    d.wait()
                return

            @pl.when(lax.rem(tt, jnp.int32(nzt)) == 0)
            def _():
                for d in full_in_dmas(tt, s):
                    d.wait()

            @pl.when(lax.rem(tt, jnp.int32(nzt)) != 0)
            def _():
                for d in part_in_dmas(tt, s):
                    d.wait()

        def out_dma(tt, s):
            zz, yy = tile_org(tt)
            return pltpu.make_async_copy(
                hout.at[s],
                out_hbm.at[pl.ds(zz + PZ, tz), pl.ds(yy + PY, ty), :],
                sems_out.at[s])

        @pl.when(t == 0)
        def _():
            start_in(0, 0)

        @pl.when(t + 1 < T)
        def _():
            start_in(t + 1, nslot)

        wait_in(t, slot)

        if zstream:
            # hand the next z-tile its head rows (the same bytes a full
            # re-read would fetch — bitwise identical, ~1/tz the bytes)
            @pl.when((t + 1 < T)
                     & (lax.rem(t + 1, jnp.int32(nzt)) != 0))
            def _():
                hphi[nslot, 0:2 * hz] = hphi[slot, tz:tz + 2 * hz]
                if hz > 1:
                    hrhs[nslot, 1:2 * hz - 1] = \
                        hrhs[slot, tz + 1:tz + 2 * hz - 1]

        z0, y0 = tile_org(t)
        zo = z0 + (PZ - hz)
        gx, gy, gz = _iotas((tzw, tyw, X), z0 - hz, y0 - PY)

        # boundary values: static scalars, or windows of the resident
        # VMEM planes (dynamic in-VMEM slices, no HBM windowing rules)
        brefs = [b0, b1, b2, b3, b4, b5]
        bpw = []
        for i in range(6):
            if cfg.b_const[i] is not None:
                bpw.append(cfg.b_const[i])
                continue
            if i < 4:
                # x/y-face planes put z on the SUBLANE dim: the window
                # offset zo = z0 + (PZ - hz) is not 8-aligned, so load
                # the aligned superset [z0, z0+tz+2*PZ) (z0 is a tz
                # multiple and tz%8==0 whenever plane faces exist) and
                # subslice statically in registers.  x-face planes
                # additionally carry y on LANES (no dynamic lane
                # windows): they arrive pre-blocked [nyt, ZP, tyw] and
                # the kernel indexes the untiled tile axis.
                zb = pl.multiple_of(z0, tz)
                if i < 2:
                    yi = lax.div(y0, jnp.int32(ty))
                    w = brefs[i][yi, pl.ds(zb, tz + 2 * PZ), :]
                    bpw.append(w[PZ - hz:PZ - hz + tzw][:, :, None])
                else:
                    w = brefs[i][pl.ds(zb, tz + 2 * PZ), :]
                    bpw.append(w[PZ - hz:PZ - hz + tzw][:, None, :])
            else:
                w = brefs[i][pl.ds(y0, tyw), :]
                bpw.append(w[None, :, :])

        lam = lam_ref[0, 0]
        zgates = (zg_ref[0, 0] != 0, zg_ref[0, 1] != 0)
        g = (gx, gy, gz)
        pw = hphi[slot]
        rw = hrhs[slot]
        ew = tuple(h[slot] for h in heps)
        if n_seg:
            # forest canvases: OUTPUT pads of prior kernel calls are
            # uninitialized (core tiles only are ever written), and the
            # seg path has no BC masks to hide pad reads at canvas-edge
            # GARBAGE cells — zero the pad rows in-window (one fused
            # VPU select; value-identical to zeroing the pads in HBM,
            # which footprint results never read)
            pad_m = ((gz < 0) | (gz >= cfg.Z)
                     | (gy < 0) | (gy >= cfg.Y))
            pw = jnp.where(pad_m, jnp.zeros((), pw.dtype), pw)

        # forest segment-plane windows (VMEM-resident like the bc
        # planes; layouts per axis mirror the face-plane treatment).
        # Slicing is LAZY — materialized only inside switch branches
        # whose axis is active, so interior windows pay nothing.
        segw = None
        if n_seg:
            def _seg_slice(sd, ref):
                if sd == 2:                      # z: [4, YPW, X]
                    w = ref[:, pl.ds(y0, tyw), :]
                    return tuple(w[k][None, :, :] for k in range(4))
                if sd == 1:                      # y: [4, ZP, X]
                    zb = pl.multiple_of(z0, tz)
                    w = ref[:, pl.ds(zb, tz + 2 * PZ), :]
                    w = w[:, PZ - hz:PZ - hz + tzw, :]
                    return tuple(w[k][:, None, :] for k in range(4))
                # x: [4, nyt, ZP, tyw]
                yi = lax.div(y0, jnp.int32(ty))
                zb = pl.multiple_of(z0, tz)
                w = ref[:, yi, pl.ds(zb, tz + 2 * PZ), :]
                w = w[:, PZ - hz:PZ - hz + tzw, :]
                return tuple(w[k][:, :, None] for k in range(4))

            segw = {0: [], 1: [], 2: []}
            for (sd, sc, ss), ref in zip(segs, seg_refs):
                segw[sd].append((sc, ss, (sd, ref)))

        def run(active, seg_on=(True, True, True)):
            def f():
                masks = _face_masks(cfg, g, zgates, active=active)
                sl = segw
                if segw is not None:
                    sl = {d: [(c, side, _seg_slice(*lazy))
                              for (c, side, lazy) in segw[d]]
                          for d in (0, 1, 2)
                          if d == 0 or seg_on[d]}
                    sl.setdefault(1, [])
                    sl.setdefault(2, [])
                return body(pw, rw, lam, masks, g, bpw, ew, sl)
            return f

        # interior-tile fast path: most windows contain no y/z boundary
        # row (nor any forest ghost-layer reader row), so their
        # ghost-synthesis ops (the bulk of the per-cell VPU work beyond
        # the stencil itself) are dropped via a scalar switch — bitwise
        # exact, the masks/selects would be all-false.  x boundaries
        # and x-axis ghost layers span every window (full-width lanes),
        # so x synthesis always runs.
        sw = [d for d in (1, 2) if not cfg.periodic[d]]
        seg_sw = [d for d in (1, 2) if segw is not None and segw[d]]
        if not sw and not seg_sw:
            res = run((True, True, True))()
        else:
            preds = {
                1: (y0 <= PY) | (y0 + ty + PY >= cfg.Y),
                2: (z0 <= hz) | (z0 + tz + hz >= cfg.Z),
            }
            seg_preds = {}
            for d in seg_sw:
                pr = None
                for (c, side, _p) in segw[d]:
                    reader = c + 1 if side == 0 else c - 1
                    if d == 2:
                        inr = ((reader >= z0 - hz)
                               & (reader < z0 + tz + hz))
                    else:
                        inr = ((reader >= y0 - PY)
                               & (reader < y0 + ty + PY))
                    pr = inr if pr is None else (pr | inr)
                seg_preds[d] = pr
            keys = [("m", d) for d in sw] + [("s", d) for d in seg_sw]
            idx = jnp.int32(0)
            for k, (kind, d) in enumerate(keys):
                pv = preds[d] if kind == "m" else seg_preds[d]
                idx = idx + (1 << k) * pv.astype(jnp.int32)
            branches = []
            for bits in range(1 << len(keys)):
                active = [True, True, True]
                seg_on = [True, True, True]
                for k, (kind, d) in enumerate(keys):
                    on = bool((bits >> k) & 1)
                    if kind == "m":
                        active[d] = on
                    else:
                        seg_on[d] = on
                branches.append(run(tuple(active), tuple(seg_on)))
            res = lax.switch(idx, branches)

        if restrict_outs:
            res, resid_w = res

        if fine_out:
            # reclaim this slot's out buffer (written two steps ago)
            @pl.when(t >= 2)
            def _():
                out_dma(t - 2, slot).wait()

            hout[slot] = res[hz:hz + tz, PY:PY + ty, :]
            out_dma(t, slot).start()

        if restrict_outs:
            # coarse tiles are 1/8 the fine tile: serialized small DMAs
            tzc, tyc = tz // 2, ty // 2
            zi = lax.rem(t, jnp.int32(nzt)) if zstream else t // nyt
            yi = t // nzt if zstream else lax.rem(t, jnp.int32(nyt))
            z0c = pl.multiple_of(zi * tzc, tzc)
            y0c = pl.multiple_of(yi * tyc, tyc)
            pcore = (hout[slot] if fine_out
                     else res[hz:hz + tz, PY:PY + ty, :])
            hpc[:] = _restrict_window(pcore, cfg.interpret)
            cpd = pltpu.make_async_copy(
                hpc, outpc_hbm.at[pl.ds(z0c + PZ, tzc),
                                  pl.ds(y0c + PY, tyc), :], sems_c.at[0])
            cpd.start()
            hrc[:] = _restrict_window(
                resid_w[hz:hz + tz, PY:PY + ty, :], cfg.interpret)
            crd = pltpu.make_async_copy(
                hrc, outrc_hbm.at[pl.ds(z0c + PZ, tzc),
                                  pl.ds(y0c + PY, tyc), :], sems_c.at[1])
            crd.start()
            cpd.wait()
            crd.wait()

        if fine_out:
            @pl.when(t == T - 1)
            def _():
                out_dma(t, slot).wait()

            @pl.when((t == T - 1) & (T >= 2))
            def _():
                out_dma(t - 1, nslot).wait()

    return kernel, T


def _call_kernel(cfg, body, phi, rhs, lam, bplanes, z_gates, hz,
                 restrict_outs: bool = False, fine_out: bool = True,
                 zstream: bool = False, eps=(), segs=None,
                 seg_planes=None):
    assert len(eps) == cfg.n_eps
    assert cfg.eps_bc is None, \
        "eps-plane ghost synthesis rides the jnp path only"
    assert not (zstream and cfg.n_eps), \
        "z-streaming not plumbed for coefficient windows"
    tz, ty, X = cfg.tz, cfg.ty, cfg.X
    tzw, tyw = tz + 2 * hz, ty + 2 * PY
    dt = cfg.dtype
    if segs:
        # y/x-axis planes put z on the sublane dim: superset loads need
        # tz % 8 == 0 (callers gate on seg_kernel_ok)
        assert tz % 8 == 0 and not cfg.n_eps
    kernel, T = _make_kernel(cfg, body, hz, restrict_outs, fine_out,
                             zstream, segs)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    zeros11 = jnp.zeros((1, 1), dt)
    plane_args = []
    plane_specs = []
    for i in range(6):
        if cfg.b_const[i] is None:
            p = bplanes[i]
            if i < 2:
                # x-face planes: y lives on lanes where dynamic windows
                # are not expressible — pre-block per y tile (the
                # overlap duplication is tiny; planes are face-sized)
                nyt = cfg.Y // ty
                p = jnp.stack([p[:, k * ty:k * ty + tyw]
                               for k in range(nyt)])
            plane_args.append(p)
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

    seg_args = []
    seg_specs = []
    if segs:
        nyt = cfg.Y // ty
        for (sd, sc, ss), pl_arr in zip(segs, seg_planes):
            if sd == 0:
                # x-axis planes [4, ZP, YPW]: y lives on lanes (no
                # dynamic lane windows) — pre-block per y tile, like
                # the x-face bc planes
                pl_arr = jnp.stack(
                    [pl_arr[:, :, k * ty:k * ty + tyw]
                     for k in range(nyt)], axis=1)
            seg_args.append(pl_arr)
            seg_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    fshape = jax.ShapeDtypeStruct(cfg.pshape, dt)
    cshape = jax.ShapeDtypeStruct(
        padded_shape((cfg.X // 2, cfg.Y // 2, cfg.Z // 2)), dt)
    scratch = [pltpu.VMEM((2, tzw, tyw, X), dt),
               pltpu.VMEM((2, tzw, tyw, X), dt)]
    scratch += [pltpu.VMEM((2, tzw, tyw, X), dt)
                for _ in range(cfg.n_eps)]
    if fine_out:
        scratch += [pltpu.VMEM((2, tz, ty, X), dt)]
    if restrict_outs:
        scratch += [pltpu.VMEM((tz // 2, ty // 2, X // 2), dt),
                    pltpu.VMEM((tz // 2, ty // 2, X // 2), dt)]
    scratch += [pltpu.SemaphoreType.DMA((2, 2 + cfg.n_eps))]
    if fine_out:
        scratch += [pltpu.SemaphoreType.DMA((2,))]
    if restrict_outs:
        scratch += [pltpu.SemaphoreType.DMA((2,))]
    if restrict_outs and fine_out:
        out_shape = (fshape, cshape, cshape)
        out_specs = (any_spec, any_spec, any_spec)
    elif restrict_outs:
        out_shape = (cshape, cshape)
        out_specs = (any_spec, any_spec)
    else:
        out_shape = fshape
        out_specs = any_spec
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(T,),
        in_specs=([any_spec] * (2 + cfg.n_eps) + plane_specs
                  + [smem_spec, smem_spec] + seg_specs),
        out_specs=out_specs,
        scratch_shapes=scratch,
        # the 4-sweep body's scoped temporaries exceed the 16 MiB
        # default accounting limit at 512-class windows; v5e cores carry
        # more physical VMEM than the default admits
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=cfg.interpret,
    )(phi, rhs, *eps, *plane_args, lam_arr, zg_arr, *seg_args)


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------

def pair_sweep_dense(cfg: DenseStencilConfig, phi, rhs, lam, bplanes,
                     red_parity: int, z_gates=None, n_pairs: int = 1,
                     eps=(), eps_planes=None, segs=None,
                     seg_planes=None):
    """Fused [red half-sweep, ghost refresh, black half-sweep] x n_pairs.

    phi/rhs: padded_shape(dims); lam: scalar; bplanes: 6 padded
    boundary-value planes (only plane-valued faces are read).
    red_parity: global (gx+gy+gz)%2 value updated by the red sweep
    (the boxed path's substep-n mask corresponds to (n+1)%2).
    Returns new phi with garbage pads.

    n_pairs=2 fuses two full GSRB iterations (4 half-sweeps) into one
    HBM pass with a 4-deep halo — each sweep shrinks the window's valid
    ring by one, so a 4-sweep chain needs halo 4 (= PZ; the y halo PY=8
    covers it).  Arithmetic per cell is unchanged: identical to running
    two pair kernels with pad re-sync between (periodic pad rows evolve
    in lockstep with their source rows, see the driver's _sync_pads).
    """
    if not cfg.use_kernel:
        assert n_pairs == 1, "jnp fallback runs single pairs"
        assert segs is None
        return _pair_jnp(cfg, phi, rhs, lam, bplanes, red_parity, z_gates,
                         eps, eps_planes)
    assert eps_planes is None, "eps planes ride the jnp path only"
    assert 2 * n_pairs <= PZ

    def body(p, r, lam_s, masks, g, bpw, epw, segw=None):
        upd = _parity_mask(g, red_parity)

        def one(i, p):
            p = _halfsweep(cfg, p, r, lam_s, masks, upd, True, bpw,
                           cfg.interpret, epw, segw=segw, g=g)
            return _halfsweep(cfg, p, r, lam_s, masks, upd, False, bpw,
                              cfg.interpret, epw, segw=segw, g=g)

        if n_pairs == 1:
            return one(0, p)
        # fori_loop (not unrolled python) so Mosaic reuses one pair's
        # worth of scoped-VMEM temporaries across the chain
        return lax.fori_loop(0, n_pairs, one, p)

    return _call_kernel(cfg, body, phi, rhs, lam, bplanes, z_gates,
                        hz=2 * n_pairs, eps=eps, segs=segs,
                        seg_planes=seg_planes)


def half_sweep_dense(cfg: DenseStencilConfig, phi, rhs, lam, bplanes,
                     parity: int, z_gates=None, eps=(), eps_planes=None):
    """ONE GSRB half-sweep: update cells with (gx+gy+gz)%2 == parity.

    The dense-forest AMR path runs at half-sweep granularity because its
    cross-patch ghosts (refinement rings written into the canvas and the
    per-face ghost planes) must be recomputed between half-sweeps — the
    reference's refill cadence (smooth_boxes, m_multigrid.f90:404-424).
    Arithmetic per updated cell is identical to pair_sweep_dense's red
    half, so two half_sweep calls with a pad/ghost refresh in between ==
    one pair."""
    if not cfg.use_kernel:
        g = _full_iotas(cfg)
        masks = _face_masks(cfg, g, z_gates)
        upd = _parity_mask(g, parity)
        bpw = _bpw_full(cfg, bplanes)
        return _halfsweep(cfg, phi, rhs, lam, masks, upd, True, bpw,
                          True, eps, _bpw_eps_full(eps_planes))
    assert eps_planes is None, "eps planes ride the jnp path only"

    def body(p, r, lam_s, masks, g, bpw, epw, segw=None):
        upd = _parity_mask(g, parity)
        return _halfsweep(cfg, p, r, lam_s, masks, upd, True, bpw,
                          cfg.interpret, epw)

    return _call_kernel(cfg, body, phi, rhs, lam, bplanes, z_gates, hz=1,
                        eps=eps)


def downsweep_dense(cfg: DenseStencilConfig, phi, rhs, lam, bplanes,
                    red_parity: int, z_gates=None, n_pairs: int = 2,
                    eps=()):
    """Fused V-cycle down-leg: n_pairs GSRB pairs, residual, and
    full-weighting restriction of BOTH phi and the residual, in ONE
    HBM pass (smooth_boxes + update_coarse's residual/restrict,
    m_multigrid.f90:347-384,404-424).

    Returns (phi_new, phi_coarse, ires_coarse) — the coarse arrays are
    padded_shape(dims/2) with garbage pads.  Requires cfg.fused_down_ok
    and hz = 2*n_pairs + 1 <= PZ.  Bitwise identical to
    [pair_sweep_dense(n_pairs), stencil_apply_dense(residual),
    restrict_dense x2]."""
    assert cfg.fused_down_ok
    hz = 2 * n_pairs + 1
    assert hz <= PZ

    def body(p, r, lam_s, masks, g, bpw, epw, segw=None):
        upd = _parity_mask(g, red_parity)

        def one(i, p):
            p = _halfsweep(cfg, p, r, lam_s, masks, upd, True, bpw,
                           cfg.interpret, epw)
            return _halfsweep(cfg, p, r, lam_s, masks, upd, False, bpw,
                              cfg.interpret, epw)

        p = lax.fori_loop(0, n_pairs, one, p) if n_pairs > 1 else one(0, p)
        resid = r - _apply_expr(cfg, p, lam_s, masks, bpw, cfg.interpret,
                                epw)
        return p, resid

    return _call_kernel(cfg, body, phi, rhs, lam, bplanes, z_gates,
                        hz=hz, restrict_outs=True, eps=eps)


def residual_restrict_dense(cfg: DenseStencilConfig, phi, rhs, lam,
                            bplanes, z_gates=None, eps=()):
    """Fused plain update_coarse: residual + full-weighting restriction
    of BOTH phi and the residual in one pass, with NO full-size output
    (m_multigrid.f90:347-384 minus the smoothing).  Returns
    (phi_coarse, ires_coarse).  Bitwise identical to
    [stencil_apply_dense(residual=True), restrict_dense x2]."""
    assert cfg.fused_down_ok

    def body(p, r, lam_s, masks, g, bpw, epw, segw=None):
        resid = r - _apply_expr(cfg, p, lam_s, masks, bpw, cfg.interpret,
                                epw)
        return p, resid

    return _call_kernel(cfg, body, phi, rhs, lam, bplanes, z_gates,
                        hz=1, restrict_outs=True, fine_out=False, eps=eps)


def stencil_apply_dense(cfg: DenseStencilConfig, phi, rhs, lam, bplanes,
                        residual: bool, z_gates=None, eps=(),
                        eps_planes=None, segs=None, seg_planes=None):
    """A(phi) (or rhs - A(phi)) in one pass (box_lpl/box_helmh +
    residual_box, m_multigrid.f90:426-436; box_vlpl/box_ahelmh when
    eps fields are present)."""
    if not cfg.use_kernel:
        assert segs is None
        return _apply_jnp(cfg, phi, rhs, lam, bplanes, residual, z_gates,
                          eps, eps_planes)
    assert eps_planes is None, "eps planes ride the jnp path only"

    def body(p, r, lam_s, masks, g, bpw, epw, segw=None):
        out = _apply_expr(cfg, p, lam_s, masks, bpw, cfg.interpret, epw,
                          segw=segw, g=g)
        return r - out if residual else out

    return _call_kernel(cfg, body, phi, rhs, lam, bplanes, z_gates, hz=1,
                        eps=eps, segs=segs, seg_planes=seg_planes)


# ---------------------------------------------------------------------------
# inter-level transfer kernels (restriction / prolongation+correction)
#
# XLA's pooling/interleave ops measure ~20-35 GB/s on this chip class;
# these kernels do the same numerics in one pass each.  Lane/sublane
# pair-compaction uses a log-step pull network (exact permutation);
# interleaving uses the riffle shuffle expressed as adjacent index-bit
# swaps — both built from rolls + selects only (verified exact in
# experiments/probe_mosaic_ops*.py).
# ---------------------------------------------------------------------------

def _compact_pairs(w, axis, interpret):
    """w[..., j, ...] = w_in[..., 2j, ...]: keep even positions.

    Pull network: after processing bit k, lane l holds input
    l + (l mod 2^(k+1)); after all log2(n/2) bits, lane l < n/2 holds
    input 2l."""
    n = w.shape[axis]
    idx = lax.broadcasted_iota(jnp.int32, w.shape, axis)
    for k in range(int(np.log2(n // 2))):
        sh = 1 << k
        rolled = _roll(w, -sh, axis, interpret)
        w = jnp.where((idx >> k) & 1 == 1, rolled, w)
    sl = [slice(None)] * w.ndim
    sl[axis] = slice(0, n // 2)
    return w[tuple(sl)]


def _riffle(c, axis, interpret):
    """out[l] = c[rot_right_bits(l)]: interleave the two halves of c
    (adjacent index-bit swaps, high to low)."""
    n = c.shape[axis]
    B = int(np.log2(n))
    idx = lax.broadcasted_iota(jnp.int32, c.shape, axis)
    for k in range(B - 2, -1, -1):
        bit_lo = (idx >> k) & 1
        bit_hi = (idx >> (k + 1)) & 1
        up = _roll(c, (1 << k), axis, interpret)
        dn = _roll(c, -(1 << k), axis, interpret)
        c = jnp.where((bit_hi == 0) & (bit_lo == 1), dn,
                      jnp.where((bit_hi == 1) & (bit_lo == 0), up, c))
    return c


def _interleave2(a, b, axis, interpret):
    """[a0 b0 a1 b1 ...] along axis.

    axis 0 (untiled z): stack+reshape is layout-trivial; tiled axes use
    the riffle network."""
    if axis == 0:
        st = jnp.stack([a, b], axis=1)
        return st.reshape((2 * a.shape[0],) + a.shape[1:])
    c = jnp.concatenate([a, b], axis=axis)
    return _riffle(c, axis, interpret)


def _is_pow2(n):
    return n > 0 and (n & (n - 1)) == 0


def transfer_tiles(dims_c):
    """(tzc, tyc) coarse tile sizes for the transfer kernels, or None
    when the level pair cannot satisfy the alignment rules (the
    compaction/riffle networks additionally need power-of-two lane and
    tile-y extents)."""
    Xc, Yc, Zc = dims_c
    if Xc % 128 != 0 or Yc % PY != 0 or not _is_pow2(Xc):
        return None
    tzc = _pick_tile(Zc, 8)
    tyc = next((t for t in (32, 16, 8) if Yc % t == 0), None)
    if tzc is None or tyc is None:
        return None
    return tzc, tyc


def restrict_dense(cfg_f: DenseStencilConfig, fine):
    """Full-weighting restriction (m_restrict.f90:183-194) as one
    kernel pass: fine padded -> coarse padded (garbage pads)."""
    Xf, Yf, Zf = cfg_f.dims
    dims_c = (Xf // 2, Yf // 2, Zf // 2)
    tiles = transfer_tiles(dims_c)
    interp = cfg_f.interpret
    if tiles is None or Xf % 128 != 0:
        raise ValueError("restrict_dense: unaligned level pair")
    tzc, tyc = tiles
    Xc = Xf // 2
    dt = cfg_f.dtype

    def kernel(fine_hbm, out_hbm, hfine, sems):
        zi = pl.program_id(0)
        yi = pl.program_id(1)
        z0c = zi * tzc
        y0c = yi * tyc
        dma = pltpu.make_async_copy(
            fine_hbm.at[pl.ds(2 * z0c + PZ, 2 * tzc),
                        pl.ds(2 * y0c + PY, 2 * tyc), :],
            hfine, sems.at[0])
        dma.start()
        dma.wait()
        h = hfine[:].reshape(tzc, 2, 2 * tyc, Xf)
        t = h[:, 0] + h[:, 1]
        u = t + _roll(t, -1, 1, interp)
        t = _compact_pairs(u, 1, interp)
        u = t + _roll(t, -1, 2, interp)
        t = _compact_pairs(u, 2, interp)
        hout = t / 8.0

        def write(scr, sem):
            scr[:] = hout
            out = pltpu.make_async_copy(
                scr, out_hbm.at[pl.ds(z0c + PZ, tzc),
                                pl.ds(y0c + PY, tyc), :], sem)
            out.start()
            out.wait()

        pl.run_scoped(write, pltpu.VMEM((tzc, tyc, Xc), dt),
                      pltpu.SemaphoreType.DMA)

    grid = (dims_c[2] // tzc, dims_c[1] // tyc)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(padded_shape(dims_c), dt),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((2 * tzc, 2 * tyc, Xf), dt),
                        pltpu.SemaphoreType.DMA((1,))],
        interpret=interp,
    )(fine)


def prolong_correct_dense(cfg_c: DenseStencilConfig, phi_c, iold_c,
                          phi_f, bplanes_c, z_gates=None,
                          add: bool = True, corr_ready: bool = False):
    """Fused correct_children (m_multigrid.f90:387-402): one kernel
    computes corr = phi_c - iold_c with ghost-ring semantics (BC
    synthesis / halo pads), applies mg_prolong_sparse D-linear weights
    (m_prolong.f90:159-240), and adds the result into phi_f.

    With add=False, iold_c is ignored and the prolonged phi_c replaces
    phi_f's interior (mg_prolong set mode, used by FFT seeding).
    With corr_ready=True, phi_c already IS the correction (iold_c
    ignored) and the prolonged values ADD into phi_f — the forest
    path's mode (its correction window is assembled with ring/rb ghost
    semantics the plane inputs carry)."""
    Xc, Yc, Zc = cfg_c.dims
    tiles = transfer_tiles((Xc, Yc, Zc))
    if tiles is None or (2 * Xc) % 128 != 0:
        raise ValueError("prolong_correct_dense: unaligned level pair")
    tzc, tyc = tiles
    interp = cfg_c.interpret
    dt = cfg_c.dtype
    Xf = 2 * Xc
    dims_f = (Xf, 2 * Yc, 2 * Zc)
    # prolongation reads a 1-ring of the coarse correction only
    hz = 1
    tzw, tyw = tzc + 2 * hz, tyc + 2 * PY

    planes_in = [None if cfg_c.b_const[i] is not None else bplanes_c[i]
                 for i in range(6)]

    def kernel(phic_hbm, ioldc_hbm, phif_hbm, b0, b1, b2, b3, b4, b5,
               zg_ref, out_hbm, hpc, hic, hf, sems):
        zi = pl.program_id(0)
        yi = pl.program_id(1)
        z0c = zi * tzc
        y0c = yi * tyc
        zo = z0c + (PZ - hz)
        d1 = pltpu.make_async_copy(
            phic_hbm.at[pl.ds(zo, tzw), pl.ds(y0c, tyw), :], hpc,
            sems.at[0])
        d1.start()
        d3 = pltpu.make_async_copy(
            phif_hbm.at[pl.ds(2 * z0c + PZ, 2 * tzc),
                        pl.ds(2 * y0c + PY, 2 * tyc), :], hf, sems.at[2])
        d3.start()
        if add and not corr_ready:
            d2 = pltpu.make_async_copy(
                ioldc_hbm.at[pl.ds(zo, tzw), pl.ds(y0c, tyw), :], hic,
                sems.at[1])
            d2.start()
            d2.wait()
        d1.wait()
        d3.wait()

        gco = _iotas((tzw, tyw, Xc), z0c - hz, y0c - PY)
        brefs = [b0, b1, b2, b3, b4, b5]
        bpw = []
        for i in range(6):
            if cfg_c.b_const[i] is not None:
                bpw.append(cfg_c.b_const[i])
                continue
            # plane windows need 8-aligned sublane offsets: load the
            # tile-aligned superset and subslice statically; x-face
            # planes carry y on lanes (no dynamic lane windows) and
            # arrive pre-blocked per y tile (cf. _make_kernel)
            zb = pl.multiple_of(z0c, tzc)
            if i < 2:
                w = brefs[i][yi, pl.ds(zb, tzc + 2 * PZ), :]
                bpw.append(w[PZ - hz:PZ - hz + tzw][:, :, None])
            elif i < 4:
                w = brefs[i][pl.ds(zb, tzc + 2 * PZ), :]
                bpw.append(w[PZ - hz:PZ - hz + tzw][:, None, :])
            else:
                yb = pl.multiple_of(y0c, tyc)
                bpw.append(brefs[i][pl.ds(yb, tyw), :][None, :, :])
        zgates = (zg_ref[0, 0] != 0, zg_ref[0, 1] != 0)
        masks = _face_masks(cfg_c, gco, zgates)

        pc = hpc[:]
        if add and not corr_ready:
            ic = hic[:]
            corr = pc - ic
        else:
            corr = pc
        # neighbor values of corr with ghost semantics: synth(phi) -
        # synth(iold) at physical faces (matching the XLA path exactly)
        lo = {}
        hi = {}
        for d, axis in ((0, 2), (1, 1), (2, 0)):
            lop, hip = _neighbor_ops(cfg_c, pc, d, axis, masks, bpw,
                                     interp)
            if add and not corr_ready:
                loi, hii = _neighbor_ops(cfg_c, ic, d, axis, masks, bpw,
                                         interp)
                lo[d] = lop - loi
                hi[d] = hip - hii
            else:
                lo[d] = lop
                hi[d] = hip

        # mg_prolong_sparse parity values (same accumulation order as
        # transfer._prolong_block)
        f0 = 0.25 * corr
        vals = {0: f0}
        for d in range(3):
            new = {}
            for key, a in vals.items():
                new[key] = a + 0.25 * lo[d]
                new[key | (1 << d)] = a + 0.25 * hi[d]
            vals = new
        core = (slice(hz, hz + tzc), slice(PY, PY + tyc), slice(None))
        vals = {k: v[core] for k, v in vals.items()}

        # assemble the fine tile: interleave x, then y, then z
        def build(d_hi, bits):
            if d_hi < 0:
                return vals[bits]
            a = build(d_hi - 1, bits)
            b = build(d_hi - 1, bits | (1 << d_hi))
            return _interleave2(a, b, 2 - d_hi, interp)

        fine_vals = build(2, 0)
        if add:
            hf[:] = hf[:] + fine_vals
        else:
            hf[:] = fine_vals
        out = pltpu.make_async_copy(
            hf, out_hbm.at[pl.ds(2 * z0c + PZ, 2 * tzc),
                           pl.ds(2 * y0c + PY, 2 * tyc), :], sems.at[3])
        out.start()
        out.wait()

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    zeros11 = jnp.zeros((1, 1), dt)
    plane_args = []
    plane_specs = []
    for i in range(6):
        if cfg_c.b_const[i] is None:
            pa = bplanes_c[i]
            if i < 2:
                nyt = Yc // tyc
                pa = jnp.stack([pa[:, k * tyc:k * tyc + tyw]
                                for k in range(nyt)])
            plane_args.append(pa)
            plane_specs.append(vmem_spec)
        else:
            plane_args.append(zeros11)
            plane_specs.append(smem_spec)
    if z_gates is None:
        zg_arr = jnp.ones((1, 2), jnp.int32)
    else:
        zg_arr = jnp.stack([jnp.asarray(z_gates[0], jnp.int32),
                            jnp.asarray(z_gates[1], jnp.int32)]
                           ).reshape(1, 2)

    grid = (Zc // tzc, Yc // tyc)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(padded_shape(dims_f), dt),
        grid=grid,
        in_specs=[any_spec] * 3 + plane_specs + [smem_spec],
        out_specs=any_spec,
        scratch_shapes=[pltpu.VMEM((tzw, tyw, Xc), dt),
                        pltpu.VMEM((tzw, tyw, Xc), dt),
                        pltpu.VMEM((2 * tzc, 2 * tyc, Xf), dt),
                        pltpu.SemaphoreType.DMA((4,))],
        interpret=interp,
    )(phi_c, iold_c, phi_f, *plane_args, zg_arr)
