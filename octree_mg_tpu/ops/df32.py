"""Double-float (f32-pair) residual for f64-class iterative refinement.

TPU has no hardware float64 (XLA emulates it unfused at ~20 GB/s —
docs/PERF.md "dtype study").  For the mixed-precision outer loop
(SURVEY §7.3.7: f32 sweeps + f64 residual; the reference is f64
throughout, m_data_structures.f90:8) the residual

    r = rhs - A(x)

is the only place f64 accuracy is needed, and A is linear.  This module
evaluates it EXACTLY over a double-float representation x = x_hi + x_lo
(two f32 arrays, ~2^-48 relative precision) using error-free
transformations built from plain f32 adds (Knuth TwoSum) — no f64 ops
at all, so everything fuses into fast XLA elementwise chains.

Exactness gating (``df32_ok``): every stencil product must be exact in
f32, which holds when

* the operator is the constant-coefficient cartesian laplacian or
  helmholtz (the +lam*x term rides an exact Dekker TwoProduct with lam
  split host-side — ``split_lam``/``two_prod``) with equal grid
  spacing per dim,
* 1/dx^2 is a power of two (unit-cube power-of-two grids — the common
  case and every benchmark config; den0 = 6/dx^2 splits into the exact
  4/dx^2 + 2/dx^2 pair),
* BC coefficient triples have c1, c2 in {0, +-1, +-2} — Dirichlet
  (2,-1,0), continuous (0,2,-1) and zero-gradient Neumann qualify
  (m_ghost_cells.f90:682-698) — with static boundary values (their
  c0*b products are pre-split host-side into exact f32 pairs).

Everything else falls back to the chunked XLA-f64 residual (bench.py).

The error analysis: with exact products, the main-term sum is exact
(TwoSum chain) and all cancellation error lands in a compensation
channel that is applied at the end, so the returned f32 r is the
correctly-rounded true residual of the represented x up to (a) its own
f32 rounding, RELATIVE to |r| (2^-24 — harmless for refinement, the
error shrinks with r), and (b) an absolute floor of ~2^-45 of the
stencil term magnitudes from the compensation channel's second-order
rounding and the double-float representation itself.  A plain f32
residual instead carries ~2^-24-of-term-magnitude ABSOLUTE cancellation
noise, which is what caps plain f32 solves at ~1e-6 relative.

Cost: ~12 rolls + ~60 f32 flops/cell, all fused by XLA; measured ~6x
faster than the emulated-f64 residual at 512^3 (docs/PERF.md).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from . import dense_kernels as dk


# ---------------------------------------------------------------------------
# error-free transformations (f32 adds only — safe under XLA, which
# does not reassociate floats and cannot fma-contract pure additions)
# ---------------------------------------------------------------------------

def two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly (6 flops, branch-free).

    CAUTION (measured on this toolchain): `a` must be a TRACED value,
    not a python/np constant.  With a constant `a`, XLA's algebraic
    simplifier sees `s - a` / `s - bb` and rewrites the error term away
    (jit result loses exactness, ~2^-24 relative error re-appears —
    tests/test_df32.py::test_two_sum_jit_exact).  TwoSum is symmetric,
    so call with the traced operand first; constants go in `b`."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Dekker FastTwoSum (requires |a| >= |b|): s + e == a + b."""
    s = a + b
    e = b - (s - a)
    return s, e


def veltkamp_split(a):
    """Split a into (a1, a2), a == a1 + a2 with both halves carrying
    <= 12 significant bits, so any a_i * b_j product of two splits is
    EXACT in f32 (Veltkamp; Dekker 1971).  Pure mul/add — no fma
    needed.  Under XLA, `c - (c - a)` is a float-add chain the
    simplifier does not collapse (unlike TwoSum's constant-operand
    hazard, both operands here are traced; pinned by
    tests/test_df32.py::test_two_prod_jit_exact)."""
    c = jnp.float32(4097.0) * a          # 2^12 + 1
    a1 = c - (c - a)
    return a1, a - a1


def two_prod(a, b):
    """Dekker TwoProduct: p + e == a * b exactly (f32, no overflow
    range issues at the magnitudes the residual handles).  Used for the
    λ·x term of the Helmholtz residual — the only stencil product that
    is not exact by construction (ops/df32 module docstring)."""
    p = a * b
    a1, a2 = veltkamp_split(a)
    b1, b2 = veltkamp_split(b)
    e = ((a1 * b1 - p) + a1 * b2 + a2 * b1) + a2 * b2
    return p, e


def accumulate_df32(xhi, xlo, delta):
    """(xhi + xlo) + delta in double-f32: the outer-loop solution
    update x += e with no precision loss (delta is a plain f32)."""
    s, err = two_sum(xhi, delta)
    lo = xlo + err
    return fast_two_sum(s, lo)


def split_f64(a64) -> Tuple[np.ndarray, np.ndarray]:
    """Split a float64 array/scalar into an (hi, lo) f32 pair with
    hi + lo == a64 to f32-pair precision (host-side, setup only)."""
    hi = np.asarray(a64, np.float64).astype(np.float32)
    lo = (np.asarray(a64, np.float64) - hi.astype(np.float64)).astype(
        np.float32)
    return hi, lo


def _is_pow2(v: float) -> bool:
    m, _ = np.frexp(np.float64(v))
    return m == 0.5


# ---------------------------------------------------------------------------
# gating
# ---------------------------------------------------------------------------

_OK_C = (0.0, 1.0, -1.0, 2.0, -2.0)


def df32_ok(cfg: dk.DenseStencilConfig) -> bool:
    """Whether the exact double-float residual covers this config
    (see module docstring for the conditions)."""
    if cfg.n_eps:
        return False
    if len(set(cfg.idr2)) != 1 or not _is_pow2(cfg.idr2[0]):
        return False
    for d in range(3):
        if cfg.periodic[d]:
            continue
        for nb in (2 * d, 2 * d + 1):
            c0, c1, c2 = cfg.bc[nb]
            if c1 not in _OK_C or c2 not in _OK_C:
                return False
            if cfg.b_const[nb] is None:
                return False  # traced plane values: pre-split constants only
    return True


def _cb_pairs(cfg, b_values=None) -> List[Tuple[float, float]]:
    """Host-side exact split of the c0*b boundary constants (2*ndim
    faces — works for the 2D and 3D configs alike).

    b_values overrides cfg.b_const: iterative refinement keeps the TRUE
    inhomogeneous boundary values in the outer residual only, while the
    inner solver runs the homogeneous error equation (solve/refine)."""
    bs = cfg.b_const if b_values is None else list(b_values)
    out = []
    for nb in range(len(cfg.b_const)):
        b = bs[nb]
        c0 = cfg.bc[nb][0] if not cfg.periodic[nb // 2] else 0.0
        hi, lo = split_f64(np.float64(c0) * np.float64(b if b is not None
                                                       else 0.0))
        out.append((float(hi), float(lo)))
    return out


# ---------------------------------------------------------------------------
# the residual
# ---------------------------------------------------------------------------

def _df32_expr(cfg, xhi, xlo, rhshi, rhslo, masks, cbs, interpret,
               lam_pair=None):
    """The shared residual expression over one (window or full) array
    set — see residual_df32 for semantics.

    lam_pair: (lam_hi, lam_lo) host-side f32 split of the Helmholtz λ
    (None for the λ=0 laplacian).  The +λ·x residual term rides a
    Dekker TwoProduct (exact), with the cross terms λ_hi·x_lo and
    λ_lo·x_hi landing in the compensation channel — keeping the whole
    residual in the double-float exactness class
    (m_helmholtz.f90:111-154's operator at f64 accuracy)."""
    idr2 = cfg.idr2[0]

    comp = jnp.zeros_like(xhi)   # first-order compensation channel
    s = rhshi                    # exact-sum accumulator
    alo = jnp.zeros_like(xhi)    # plain A_hom(x_lo)

    for d, axis in ((0, 2), (1, 1), (2, 0)):
        rlo_h = dk._roll(xhi, +1, axis, interpret)
        rhi_h = dk._roll(xhi, -1, axis, interpret)
        rlo_l = dk._roll(xlo, +1, axis, interpret)
        rhi_l = dk._roll(xlo, -1, axis, interpret)
        vlo_h, vhi_h, vlo_l, vhi_l = rlo_h, rhi_h, rlo_l, rhi_l
        if masks[d] is not None:
            m_lo, m_hi = masks[d]
            # ghost(x) = (c0*b)_hi + c1*x1 + c2*x2 + (c0*b)_lo, the hi
            # part via an exact TwoSum chain; x1 is the boundary cell
            # itself, x2 its inner neighbor read from the RAW roll
            # (ops.dense_kernels._neighbor_ops / bc_to_gc,
            # m_ghost_cells.f90:682-698).  The x_lo ghost is the same
            # formula with b = 0 (the boundary value is carried once).
            c0l, c1l, c2l = cfg.bc[2 * d]
            c0h, c1h, c2h = cfg.bc[2 * d + 1]
            cbl_h, cbl_l = cbs[2 * d]
            cbh_h, cbh_l = cbs[2 * d + 1]

            gv, ge = two_sum(c1l * xhi, cbl_h)  # traced first (two_sum)
            if c2l != 0.0:
                gv, e2 = two_sum(gv, c2l * rhi_h)
                ge = ge + e2
            ge = ge + cbl_l
            vlo_h = jnp.where(m_lo, gv, rlo_h)
            vlo_l = jnp.where(m_lo, c1l * xlo
                              + (c2l * rhi_l if c2l != 0.0 else 0.0),
                              rlo_l)
            e_lo = jnp.where(m_lo, ge, 0.0)

            gv, ge = two_sum(c1h * xhi, cbh_h)  # traced first (two_sum)
            if c2h != 0.0:
                gv, e2 = two_sum(gv, c2h * rlo_h)
                ge = ge + e2
            ge = ge + cbh_l
            vhi_h = jnp.where(m_hi, gv, rhi_h)
            vhi_l = jnp.where(m_hi, c1h * xlo
                              + (c2h * rlo_l if c2h != 0.0 else 0.0),
                              rhi_l)
            e_hi = jnp.where(m_hi, ge, 0.0)
            comp = comp - idr2 * (e_lo + e_hi)
        sd, ed = two_sum(vlo_h, vhi_h)
        s, e = two_sum(s, -(idr2 * sd))
        comp = comp + (e - idr2 * ed)
        alo = alo + idr2 * (vlo_l + vhi_l)

    # + (den0 + lam) * x with den0 = 6*idr2 split into the exact
    # 4*idr2 + 2*idr2 pair
    s, e = two_sum(s, (4.0 * idr2) * xhi)
    comp = comp + e
    s, e = two_sum(s, (2.0 * idr2) * xhi)
    comp = comp + e
    comp = comp + rhslo - (alo - (6.0 * idr2) * xlo)
    if lam_pair is not None:
        lam_h, lam_l = lam_pair
        p, pe = two_prod(xhi, lam_h)      # traced first (cf. two_sum)
        s, e = two_sum(s, p)
        comp = comp + (e + pe) + (lam_h * xlo + lam_l * xhi)
    r_hi, _ = two_sum(s, comp)
    return r_hi


def split_lam(lam: float):
    """Host-side split of a Helmholtz λ into the (hi, lo) f32 pair the
    residual's TwoProduct term consumes; None for λ == 0 (keeps the
    laplacian expression free of the extra flops)."""
    if float(lam) == 0.0:
        return None
    hi, lo = split_f64(np.float64(lam))
    return (float(hi), float(lo))


def residual_df32(cfg: dk.DenseStencilConfig, xhi, xlo, rhshi, rhslo,
                  z_gates=None, cbs=None, lam_pair=None):
    """r_hi ~= (rhshi + rhslo) - A(xhi + xlo), exact to the double-float
    representation (see module docstring).  Inputs are padded arrays in
    the dense layout; pads follow the usual garbage-by-contract rules
    (periodic pads maintained by the caller, non-periodic synthesized
    inline).  z_gates: slab semantics as in stencil_apply_dense —
    callers may chunk over z to bound temporaries.  Pure-XLA whole-array
    evaluation; `residual_df32_dense` is the Mosaic fast path."""
    assert df32_ok(cfg), "residual_df32 called outside its gate"
    g = dk._full_iotas(cfg)
    masks = dk._face_masks(cfg, g, z_gates)
    return _df32_expr(cfg, xhi, xlo, rhshi, rhslo, masks,
                      cbs if cbs is not None else _cb_pairs(cfg), True,
                      lam_pair=lam_pair)


def residual_df32_dense(cfg: dk.DenseStencilConfig, xhi, xlo, rhshi,
                        rhslo, z_gates=None, cbs=None, lam_pair=None):
    """Mosaic rendering of residual_df32: one window-DMA pass over the
    four inputs (x_lo and rhs_lo ride the kernel machinery's
    coefficient-window plumbing, which slices them with the same halo
    windows as phi).  Falls back to the jnp form on ineligible
    shapes.  Bitwise-identical to residual_df32 (tests/test_df32.py)."""
    assert df32_ok(cfg), "residual_df32_dense called outside its gate"
    if not cfg.use_kernel:
        return residual_df32(cfg, xhi, xlo, rhshi, rhslo, z_gates, cbs,
                             lam_pair=lam_pair)
    kcfg = dk.DenseStencilConfig(
        dims=cfg.dims, idr2=cfg.idr2, bc=cfg.bc, periodic=cfg.periodic,
        dtype=cfg.dtype, b_const=cfg.b_const, interpret=cfg.interpret,
        n_eps=2)
    if cbs is None:
        cbs = _cb_pairs(cfg)

    def body(p, r, lam_s, masks, g, bpw, epw, segw=None):
        xlo_w, rhslo_w = epw
        return _df32_expr(cfg, p, xlo_w, r, rhslo_w, masks, cbs,
                          cfg.interpret, lam_pair=lam_pair)

    return dk._call_kernel(kcfg, body, xhi, rhshi,
                           jnp.zeros((), cfg.dtype), [None] * 6,
                           z_gates, hz=1, eps=(xlo, rhslo))


# ---------------------------------------------------------------------------
# double-float PAIR arithmetic (variable-coefficient operators)
#
# The constant-coefficient residual above is ERROR-FREE (every product
# exact by construction).  Variable-coefficient operators
# (vlaplacian/vhelmholtz/ahelmholtz, m_vlaplacian.f90:84-128,
# m_ahelmholtz.f90:69-162) have harmonic-mean face coefficients
# 2*ea*eb/(ea+eb) whose product and quotient cannot be exact — but
# double-float ARITHMETIC (Dekker/Bailey pair operations built on the
# same TwoSum/TwoProduct EFTs) evaluates them to ~1-2 ulp of the f32
# PAIR (~2^-47 relative), which is still the f64 accuracy class the
# reference has (m_data_structures.f90:8).  Each op renormalizes with
# FastTwoSum, so errors do not accumulate past the pair ulp class over
# the ~20-op residual chain.
# ---------------------------------------------------------------------------

def df_add(a, b):
    """(ah, al) + (bh, bl), ~1 ulp of the pair."""
    s, e = two_sum(a[0], b[0])
    return fast_two_sum(s, a[1] + b[1] + e)


def df_sub(a, b):
    s, e = two_sum(a[0], -b[0])
    return fast_two_sum(s, a[1] - b[1] + e)


def df_mul(a, b):
    """(ah, al) * (bh, bl), ~2 ulp of the pair (Dekker mul2)."""
    p, pe = two_prod(a[0], b[0])
    return fast_two_sum(p, pe + a[0] * b[1] + a[1] * b[0])


def df_div(a, b):
    """(ah, al) / (bh, bl), ~3 ulp of the pair (Dekker div2: high
    quotient + one exact-remainder correction step)."""
    q1 = a[0] / b[0]
    p, pe = two_prod(q1, b[0])
    # r = a - q1*b, the high part via TwoSum (p is close to a[0])
    rh, re = two_sum(a[0], -p)
    rl = a[1] - pe - q1 * b[1] + re
    q2 = (rh + rl) / b[0]
    return fast_two_sum(q1, q2)


def df_scale_pow2(a, s: float):
    """Exact power-of-two scale of a pair."""
    return s * a[0], s * a[1]


def df32_vcoeff_ok(cfg: dk.DenseStencilConfig) -> bool:
    """Gate for the double-float variable-coefficient residual: eps
    present, per-dim power-of-two 1/dx^2 (the c*idr2 scale stays
    exact), exact BC coefficient classes with static boundary values,
    default Neumann-zero eps ghosts.  Unlike ``df32_ok`` the per-dim
    spacings need not be equal (ahelmholtz grids)."""
    if not cfg.n_eps:
        return False
    if getattr(cfg, "eps_bc", None) is not None:
        return False
    for d in range(3):
        if not _is_pow2(cfg.idr2[d]):
            return False
        if cfg.periodic[d]:
            continue
        for nb in (2 * d, 2 * d + 1):
            c0, c1, c2 = cfg.bc[nb]
            if c1 not in _OK_C or c2 not in _OK_C:
                return False
            if cfg.b_const[nb] is None:
                return False
    return True


def _ghost_pair(xh, xl, x2h, x2l, bc3, cb):
    """Physical-face ghost as a df pair: c0*b + c1*x1 + c2*x2 with the
    (c0*b) constant pre-split (cb) and c1, c2 in the exact class."""
    c0, c1, c2 = bc3
    cb_h, cb_l = cb
    gv, ge = two_sum(c1 * xh, cb_h)       # traced first (two_sum)
    gl = c1 * xl + cb_l
    if c2 != 0.0:
        gv, e2 = two_sum(gv, c2 * x2h)
        ge = ge + e2
        gl = gl + c2 * x2l
    return fast_two_sum(gv, gl + ge)


def residual_df32_vcoeff(cfg: dk.DenseStencilConfig, xhi, xlo, rhshi,
                         rhslo, eps_pairs, z_gates=None, cbs=None,
                         lam_pair=None):
    """r_hi ~= (rhs) - A(x) for the variable-coefficient operators on
    the padded dense layout, evaluated in double-float pair arithmetic
    (~2^-47 relative — f64-class, see the section comment):

        A(x) = -lam*x + sum_d [ c_lo*(x_lo - x) + c_hi*(x_hi - x) ],
        c = 2*e0*e_nbr/(e0 + e_nbr) * idr2[d]

    (kernels._apply_expr's harmonic-mean form, m_vlaplacian.f90:84-128;
    ahelmholtz uses eps_pairs[d] per dim, m_ahelmholtz.f90:69-162 with
    the reference's :145 index bug fixed as everywhere in this repo).
    eps_pairs: tuple of (eps_hi, eps_lo) padded pairs, length cfg.n_eps;
    eps ghosts are the Neumann-zero mirror (= own value, exact).
    Pure-XLA whole-array evaluation (fuses into one elementwise chain).
    """
    assert df32_vcoeff_ok(cfg), "residual_df32_vcoeff outside its gate"
    if cbs is None:
        cbs = _cb_pairs(cfg)
    g = dk._full_iotas(cfg)
    masks = dk._face_masks(cfg, g, z_gates)
    interpret = True
    x = (xhi, xlo)
    acc = (rhshi, rhslo)
    for d, axis in ((0, 2), (1, 1), (2, 0)):
        e0 = eps_pairs[0 if cfg.n_eps == 1 else d]
        elo = (dk._roll(e0[0], +1, axis, interpret),
               dk._roll(e0[1], +1, axis, interpret))
        ehi = (dk._roll(e0[0], -1, axis, interpret),
               dk._roll(e0[1], -1, axis, interpret))
        vlo = (dk._roll(xhi, +1, axis, interpret),
               dk._roll(xlo, +1, axis, interpret))
        vhi = (dk._roll(xhi, -1, axis, interpret),
               dk._roll(xlo, -1, axis, interpret))
        if masks[d] is not None:
            m_lo, m_hi = masks[d]
            # eps: Neumann-zero mirror (ghost = own value — exact)
            elo = (jnp.where(m_lo, e0[0], elo[0]),
                   jnp.where(m_lo, e0[1], elo[1]))
            ehi = (jnp.where(m_hi, e0[0], ehi[0]),
                   jnp.where(m_hi, e0[1], ehi[1]))
            # phi: full bc_to_gc synthesis as a pair
            gl = _ghost_pair(xhi, xlo, vhi[0], vhi[1], cfg.bc[2 * d],
                             cbs[2 * d])
            gh = _ghost_pair(xhi, xlo, vlo[0], vlo[1], cfg.bc[2 * d + 1],
                             cbs[2 * d + 1])
            vlo = (jnp.where(m_lo, gl[0], vlo[0]),
                   jnp.where(m_lo, gl[1], vlo[1]))
            vhi = (jnp.where(m_hi, gh[0], vhi[0]),
                   jnp.where(m_hi, gh[1], vhi[1]))
        for enb, v in ((elo, vlo), (ehi, vhi)):
            c = df_div(df_mul(e0, enb), df_add(e0, enb))
            c = df_scale_pow2(c, 2.0 * cfg.idr2[d])
            acc = df_sub(acc, df_mul(c, df_sub(v, x)))
    if lam_pair is not None:
        acc = df_add(acc, df_mul(x, lam_pair))
    return acc[0]


# ---------------------------------------------------------------------------
# double-float refinement-boundary ghost synthesis (forest/AMR trees)
# ---------------------------------------------------------------------------

def interp_rb_strip_df(th, tl, ndim: int):
    """Double-float rendering of ops.ghost.interp_rb_strip: coarse
    strip pair (th, tl) -> interpolated plane pair next to the fine
    points (box_gc_for_fine_neighbor, m_ghost_cells.f90:557-576).

    All weights are 0.125/1.0 (exact powers of two), and every sum
    rides a TwoSum with the error folded into the lo channel, so the
    returned pair represents the exact interpolation of the exact
    strip values up to the ~2^-48 double-float class."""
    def pair_add(ah, al, bh, bl):
        s, e = two_sum(ah, bh)
        return s, al + bl + e

    def pair_sub(ah, al, bh, bl):
        s, e = two_sum(ah, -bh)
        return s, al - bl + e

    if ndim == 2:
        mh, ml = th[:, 1:-1], tl[:, 1:-1]
        dh, de = two_sum(th[:, 2:], -th[:, :-2])
        gh = 0.125 * dh
        gl = 0.125 * (tl[:, 2:] - tl[:, :-2] + de)
        lo_h, lo_l = pair_sub(mh, ml, gh, gl)
        hi_h, hi_l = pair_add(mh, ml, gh, gl)

        def ilv(a, b):
            return jnp.stack([a, b], axis=-1).reshape(a.shape[0], -1)

        return ilv(lo_h, hi_h), ilv(lo_l, hi_l)
    # 3D: tmp [m, t_hi, t_lo]
    mh, ml = th[:, 1:-1, 1:-1], tl[:, 1:-1, 1:-1]
    dh, de = two_sum(th[:, 1:-1, 2:], -th[:, 1:-1, :-2])
    glo_h = 0.125 * dh
    glo_l = 0.125 * (tl[:, 1:-1, 2:] - tl[:, 1:-1, :-2] + de)
    dh, de = two_sum(th[:, 2:, 1:-1], -th[:, :-2, 1:-1])
    ghi_h = 0.125 * dh
    ghi_l = 0.125 * (tl[:, 2:, 1:-1] - tl[:, :-2, 1:-1] + de)
    m = th.shape[0]

    def combo(slo, shi):
        h, l = (pair_sub, pair_add)[slo](mh, ml, glo_h, glo_l)
        return (pair_sub, pair_add)[shi](h, l, ghi_h, ghi_l)

    c00 = combo(0, 0)
    c10 = combo(1, 0)
    c01 = combo(0, 1)
    c11 = combo(1, 1)

    def assemble(i):
        def ilv_last(a, b):
            return jnp.stack([a, b], axis=-1).reshape(
                *a.shape[:-1], 2 * a.shape[-1])
        row_lo = ilv_last(c00[i], c10[i])
        row_hi = ilv_last(c01[i], c11[i])
        return jnp.stack([row_lo, row_hi], axis=2).reshape(
            m, 2 * mh.shape[1], 2 * mh.shape[2])

    return assemble(0), assemble(1)


# ---------------------------------------------------------------------------
# 2D (the dense [Y, X] path — pure XLA, no pads: rolls wrap exactly)
# ---------------------------------------------------------------------------

def df32_ok_2d(cfg) -> bool:
    """The 2D gate: cartesian constant-coefficient laplacian with equal
    power-of-two 1/dx^2 and exact BC coefficient classes (the 2D den0
    = 4/dx^2 is itself a power of two — no splitting needed)."""
    if cfg.n_eps or cfg.cyl_w is not None:
        return False
    if len(set(cfg.idr2)) != 1 or not _is_pow2(cfg.idr2[0]):
        return False
    for d in range(2):
        if cfg.periodic[d]:
            continue
        for nb in (2 * d, 2 * d + 1):
            c0, c1, c2 = cfg.bc[nb]
            if c1 not in _OK_C or c2 not in _OK_C:
                return False
            if cfg.b_const[nb] is None:
                return False
    return True


def residual_df32_2d(cfg, xhi, xlo, rhshi, rhslo, cbs=None,
                     lam_pair=None):
    """r_hi ~= (rhshi + rhslo) - A(xhi + xlo) on the dense 2D [Y, X]
    layout — the 2D rendering of :func:`residual_df32` (same error-free
    transformation structure, exactness argument and two_sum operand
    convention; ops/dense2d._neighbor_ops ghost recipe)."""
    from . import dense2d as d2
    assert df32_ok_2d(cfg), "residual_df32_2d called outside its gate"
    if cbs is None:
        cbs = _cb_pairs(cfg)
    masks = d2._face_masks(cfg)
    idr2 = cfg.idr2[0]

    comp = jnp.zeros_like(xhi)
    s = rhshi
    alo = jnp.zeros_like(xhi)
    for d in (0, 1):
        axis = 1 - d
        rlo_h = jnp.roll(xhi, +1, axis=axis)
        rhi_h = jnp.roll(xhi, -1, axis=axis)
        rlo_l = jnp.roll(xlo, +1, axis=axis)
        rhi_l = jnp.roll(xlo, -1, axis=axis)
        vlo_h, vhi_h, vlo_l, vhi_l = rlo_h, rhi_h, rlo_l, rhi_l
        if masks[d] is not None:
            m_lo, m_hi = masks[d]
            c0l, c1l, c2l = cfg.bc[2 * d]
            c0h, c1h, c2h = cfg.bc[2 * d + 1]
            cbl_h, cbl_l = cbs[2 * d]
            cbh_h, cbh_l = cbs[2 * d + 1]

            gv, ge = two_sum(c1l * xhi, cbl_h)  # traced first (two_sum)
            if c2l != 0.0:
                gv, e2 = two_sum(gv, c2l * rhi_h)
                ge = ge + e2
            ge = ge + cbl_l
            vlo_h = jnp.where(m_lo, gv, rlo_h)
            vlo_l = jnp.where(m_lo, c1l * xlo
                              + (c2l * rhi_l if c2l != 0.0 else 0.0),
                              rlo_l)
            e_lo = jnp.where(m_lo, ge, 0.0)

            gv, ge = two_sum(c1h * xhi, cbh_h)
            if c2h != 0.0:
                gv, e2 = two_sum(gv, c2h * rlo_h)
                ge = ge + e2
            ge = ge + cbh_l
            vhi_h = jnp.where(m_hi, gv, rhi_h)
            vhi_l = jnp.where(m_hi, c1h * xlo
                              + (c2h * rlo_l if c2h != 0.0 else 0.0),
                              rhi_l)
            e_hi = jnp.where(m_hi, ge, 0.0)
            comp = comp - idr2 * (e_lo + e_hi)
        sd, ed = two_sum(vlo_h, vhi_h)
        s, e = two_sum(s, -(idr2 * sd))
        comp = comp + (e - idr2 * ed)
        alo = alo + idr2 * (vlo_l + vhi_l)

    # + den0 * x with den0 = 4*idr2 (a power of two: one exact product)
    s, e = two_sum(s, (4.0 * idr2) * xhi)
    comp = comp + e
    comp = comp + rhslo - (alo - (4.0 * idr2) * xlo)
    if lam_pair is not None:
        lam_h, lam_l = lam_pair
        p, pe = two_prod(xhi, lam_h)      # traced first (cf. two_sum)
        s, e = two_sum(s, p)
        comp = comp + (e + pe) + (lam_h * xlo + lam_l * xhi)
    r_hi, _ = two_sum(s, comp)
    return r_hi
