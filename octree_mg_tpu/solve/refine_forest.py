"""f64-class iterative refinement on AMR / arbitrary-forest trees.

The uniform-grid driver (solve/refine.py) recovers the reference's f64
accuracy class (m_data_structures.f90:8) around the f32 dense solver.
This module extends it to the multi-level dense solvers: the outer
residual is evaluated in double-float over EVERY level of the composite
AMR discretization, including the refinement-boundary ghost synthesis
(the part the uniform driver never needed):

    x = 0 (double-float pair per level)
    repeat:
      x_coarse(image) = restrict(x_fine)      df-exact 8-cell average
      r_l = rhs_l - A_l(x)                    df-exact per level, with
                                              rb ghosts interpolated
                                              from the COARSE x pair
      solve A e = r (forest FAS FMG, f32)     the fast inner path
      x_l += e_l                              df accumulation

Exactness: every ghost coefficient in the reference's scheme is a sum
of powers of two — bc_to_gc's (2,-1,0)/(±dr,1,0)/(0,2,-1)
(m_ghost_cells.f90:682-698), sides_rb's 0.5/0.75/-0.25 (:769-861,
0.75 = 0.5 + 0.25), the strip interpolation's ±0.125 (:557-576), and
full weighting's 1/8 — so the whole composite residual rides error-free
transformations (TwoSum chains, exact power-of-two products; Helmholtz
λ·x via Dekker TwoProduct).  The fixed point satisfies the reference's
converged state: leaf residuals -> 0 with non-leaf coarse cells equal
to the restriction of the fine solution (update_coarse,
m_multigrid.f90:369-383).

Works on any tree a DenseForestMGSolver accepts — rectangular 3-level
AMR trees included (build the forest solver directly on the tree; the
forest path is bitwise the boxed path per phase).  Gating: f32 inner
solver, power-of-two 1/dx², exact BC coefficient classes, constant
homogeneous boundary values on the inner solver (true values via
``bc_values``), not fully-periodic.  Variable-coefficient operators
(vlaplacian/vhelmholtz/ahelmholtz) are covered via double-float PAIR
arithmetic (~2^-47, f64-class though not error-free — ops/df32 pair
ops) with ``eps={lvl: [f64 canvas] * n_eps}``.

2D quadtree trees ride :class:`RefinedForest2DPoisson` (same design on
the pure-XLA [Y, X] canvas machinery; den0 = 4/dx² is itself a power of
two).  ``solve_refined`` routes 2D AMR solvers here transparently.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.df32 import (_OK_C, _is_pow2, accumulate_df32, df_add,
                        df_div, df_mul, df_scale_pow2, df_sub,
                        fast_two_sum, interp_rb_strip_df, split_f64,
                        split_lam, two_prod, two_sum)
from .dense import _ISL
from .dense_forest import DenseForestMGSolver


class RefinedForestPoisson:
    """Iterative refinement over a :class:`DenseForestMGSolver`.

    ``solve`` takes per-level interior rhs pairs and returns per-level
    interior (x_hi, x_lo) pairs (leaf cells meaningful), the leaf
    residual-max history, and the inner state.
    """

    def __init__(self, solver: DenseForestMGSolver,
                 bc_values: Optional[List[float]] = None,
                 lam: float = 0.0, inner_ghost_refresh: str = "half",
                 eps=None):
        assert isinstance(solver, DenseForestMGSolver), solver
        # "pair": relaxed inner-smoother cadence (one fused Mosaic pass
        # per red+black pair, DenseForestMGSolver._smooth_pairs) — the
        # inner FMG is only a preconditioner here, but the stale
        # boundary ghosts cost real contraction (measured ~2x/outer on
        # small canvases vs ~20x at "half"), so the reference-faithful
        # cadence stays the default; opt in where the boundary fraction
        # is small and measured contraction holds.
        assert inner_ghost_refresh in ("half", "pair")
        # applied per-solve (not persisted on the shared solver: a
        # permanent mutation would silently drop the solver's
        # bitwise-vs-boxed cadence contract for later standalone calls)
        self.inner_ghost_refresh = inner_ghost_refresh
        self.s = solver
        if solver.cfg.dtype != jnp.float32:
            raise ValueError("refines an f32 inner solver; got %s"
                             % solver.cfg.dtype)
        self.n_eps = int(solver.n_eps)
        if self.n_eps and eps is None:
            raise ValueError(
                "variable-coefficient forest refinement needs the f64 "
                "coefficient fields: eps={lvl: [interior f64 canvas] * "
                "n_eps} (per level; the hi parts are installed on the "
                "inner solver)")
        if not self.n_eps and eps is not None:
            raise ValueError("eps= given for a constant-coeff solver")
        if solver.subtract_mean:
            raise ValueError("fully-periodic (subtract-mean) trees are "
                             "outside the refined gate")
        self.lam = float(lam)
        self.lam_pair = split_lam(lam)
        if self.lam != 0.0 and solver.cfg.operator not in (
                "helmholtz", "vhelmholtz", "ahelmholtz"):
            raise ValueError("lam != 0 needs a helmholtz-family solver")
        #: per-level (c0*b)_hi/lo pairs for the physical faces; the
        #: inner solver must be HOMOGENEOUS (the refinement lesson:
        #: nonzero inner b re-adds the boundary offset every outer)
        self.cbs: Dict[int, List] = {}
        for lvl in solver.levels:
            cfg = solver._kcfgs[lvl]
            if self.n_eps:
                # vcoeff: per-dim power-of-two (the 2*idr2 coefficient
                # scale stays exact; dims need not be equal)
                if not all(_is_pow2(v) for v in cfg.idr2):
                    raise ValueError("1/dx^2 must be powers of two "
                                     "(lvl %d: %r)" % (lvl, cfg.idr2))
            elif len(set(cfg.idr2)) != 1 or not _is_pow2(cfg.idr2[0]):
                raise ValueError("1/dx^2 must be an equal power of two "
                                 "per level (lvl %d: %r)"
                                 % (lvl, cfg.idr2))
            bc = solver._bc_static(lvl)
            row = []
            for nb in range(6):
                if bc[nb] is None:
                    row.append((0.0, 0.0))
                    continue
                c0, c1, c2 = bc[nb]
                if c1 not in _OK_C or c2 not in _OK_C:
                    raise ValueError("BC coefficient class outside the "
                                     "exact set (face %d)" % nb)
                spec = solver.bc_spec[nb]
                if spec["fn"] is not None:
                    raise ValueError("constant boundary values only")
                if float(spec["value"]) != 0.0:
                    raise ValueError(
                        "inner solver must be homogeneous (b=0); pass "
                        "true values via bc_values= (face %d)" % nb)
                bv = 0.0 if bc_values is None else float(bc_values[nb])
                hi, lo = split_f64(np.float64(c0) * np.float64(bv))
                row.append((float(hi), float(lo)))
            self.cbs[lvl] = row
        #: leaf masks [Z, Y, X] (footprint minus the finer image)
        self.leaf_mask = {}
        for lvl in solver.levels:
            m = solver.footprint_mask(lvl).copy()
            if lvl + 1 in solver.levels:
                for clo, chi in solver._image_rects(lvl + 1):
                    m[int(clo[2]):int(chi[2]), int(clo[1]):int(chi[1]),
                      int(clo[0]):int(chi[0])] = False
            self.leaf_mask[lvl] = jnp.asarray(m)
        self.n_leaf_cells = int(sum(np.asarray(m).sum()
                                    for m in self.leaf_mask.values()))
        #: {"eps{i}": {lvl: (hi, lo) padded canvas pair}} — the
        #: variable coefficients of the composite operator, fixed
        #: across outers (per-level values are authoritative: the test
        #: derives coarse levels by f64 restriction, matching the
        #: reference's f64 prepare; the hi parts become the inner
        #: solver's f32 coefficients in ``solve``)
        self._eps_df = {}
        if self.n_eps:
            for i in range(self.n_eps):
                per = {}
                for lvl in solver.levels:
                    hi, lo = split_f64(np.asarray(eps[lvl][i],
                                                  np.float64))
                    shape = solver._pshape(solver.dims[lvl])
                    per[lvl] = (
                        jnp.zeros(shape, jnp.float32).at[_ISL].set(
                            jnp.asarray(hi)),
                        jnp.zeros(shape, jnp.float32).at[_ISL].set(
                            jnp.asarray(lo)))
                self._eps_df[f"eps{i}"] = per

    # ------------------------------------------------------------------
    # double-float ghost synthesis per segment
    # ------------------------------------------------------------------
    def _ghost_df(self, lvl, seg, xh, xl, bdf, i, is_eps=False):
        """(g_hi, g_lo) pair for one ghost segment, expanded to its 3D
        rect shape.  Same coefficient arithmetic as the f32 path
        (_ring_values / _face_planes) but with every sum a TwoSum and
        every product an exact power-of-two multiply; synthesis errors
        fold into the lo channel (~2^-48 class).

        is_eps: coefficient-field semantics — physical faces take the
        Neumann-zero copy (ghost = own value, m_vlaplacian.f90:25-28);
        rb faces and wraps behave like phi."""
        sv = self.s
        d = seg.nb // 2
        ax = 2 - d
        if seg.kind == "wrap":
            lo = seg.lo.copy()
            hi = seg.hi.copy()
            lo[d] = seg.src
            hi[d] = seg.src + 1
            sl = sv._cansl(lo, hi)
            return xh[sl], xl[sl]
        x1h, x2h = sv._seg_x12(xh, seg)
        x1l, x2l = sv._seg_x12(xl, seg)
        if is_eps and seg.kind != "rb":
            # phys face: exact copy of the boundary cell pair
            return (jnp.expand_dims(1.0 * x1h, ax),
                    jnp.expand_dims(1.0 * x1l, ax))
        if seg.kind == "rb":
            bh, bl = bdf[i]
            # 0.5*b + 0.75*x1 - 0.25*x2 with 0.75 = 0.5 + 0.25
            g, e1 = two_sum(0.5 * bh, 0.5 * x1h)
            g, e2 = two_sum(g, 0.25 * x1h)
            g, e3 = two_sum(g, -(0.25 * x2h))
            gl = (0.5 * bl + (0.5 * x1l + 0.25 * x1l) - 0.25 * x2l) \
                + ((e1 + e2) + e3)
        else:  # phys: c0*b + c1*x1 + c2*x2, b constant (pre-split)
            c0, c1, c2 = sv._bc_static(lvl)[seg.nb]
            cbh, cbl = self.cbs[lvl][seg.nb]
            g, ge = two_sum(c1 * x1h, cbh)  # traced first (two_sum)
            gl = c1 * x1l + cbl
            if c2 != 0.0:
                g, e2 = two_sum(g, c2 * x2h)
                ge = ge + e2
                gl = gl + c2 * x2l
            gl = gl + ge
        return jnp.expand_dims(g, ax), jnp.expand_dims(gl, ax)

    def _ext_df(self, X, lvl, memo, prefer=None, tag="phi"):
        """[Z+2, Y+2, X+2] double-float canvas with ALL ghosts
        materialized (the df rendering of DenseForestMGSolver._ext);
        ``prefer``: axis whose ring segments write last at conflicted
        concave-corner cells.  ``tag``: "phi" or a coefficient field
        ("eps{i}" — Neumann-zero phys ghosts, same rb/wrap handling)."""
        key = ("ext", tag, lvl, prefer)
        if key in memo:
            return memo[key]
        sv = self.s
        xh, xl = X[lvl]
        X_, Y_, Z_ = sv.dims[lvl]
        dt = jnp.float32
        bdf = self._bdf(X, lvl, memo, tag)
        is_eps = tag != "phi"
        eh = jnp.zeros((Z_ + 2, Y_ + 2, X_ + 2), dt)
        el = jnp.zeros((Z_ + 2, Y_ + 2, X_ + 2), dt)
        eh = eh.at[(slice(1, -1),) * 3].set(xh[_ISL])
        el = el.at[(slice(1, -1),) * 3].set(xl[_ISL])
        items = list(enumerate(sv.segs[lvl]))
        if prefer is not None:
            items.sort(key=lambda t: (t[1].sink == "ring"
                                      and t[1].nb // 2 == prefer))
        for i, seg in items:
            gh, gl = self._ghost_df(lvl, seg, xh, xl, bdf, i, is_eps)
            sl = tuple(slice(1 + int(seg.lo[dd]), 1 + int(seg.hi[dd]))
                       for dd in (2, 1, 0))
            eh = eh.at[sl].set(gh)
            el = el.at[sl].set(gl)
        memo[key] = (eh, el)
        return memo[key]

    def _bdf(self, X, lvl, memo, tag="phi"):
        """{seg index: (b_hi, b_lo)} coarse-interp planes for the rb
        segments of lvl (df rendering of _rb_cache, with the same
        per-axis strip-end patching at conflicted coarse levels)."""
        key = ("bdf", tag, lvl)
        if key in memo:
            return memo[key]
        sv = self.s
        segs_rb = [s for s in sv.segs[lvl] if s.kind == "rb"]
        if not segs_rb:
            memo[key] = {}
            return memo[key]
        need = sv.conflicts.get(lvl - 1) is not None
        if need:
            ext_ax = {a: self._ext_df(X, lvl - 1, memo, prefer=a,
                                      tag=tag)
                      for a in range(3)}
            exth, extl = ext_ax[0]
        else:
            exth, extl = self._ext_df(X, lvl - 1, memo, tag=tag)
        off_c = sv.offsets[lvl - 1]
        off_f = sv.offsets[lvl]
        out = {}
        for i, seg in enumerate(sv.segs[lvl]):
            if seg.kind != "rb":
                continue
            d = seg.nb // 2
            sl: List = [0, 0, 0]
            sl[2 - d] = seg.cg - int(off_c[d]) + 1
            for dd in range(3):
                if dd == d:
                    continue
                c0 = (int(off_f[dd]) + int(seg.lo[dd])) // 2 \
                    - int(off_c[dd])
                c1 = (int(off_f[dd]) + int(seg.hi[dd])) // 2 \
                    - int(off_c[dd])
                sl[2 - dd] = slice(c0, c1 + 2)
            th, tl = exth[tuple(sl)], extl[tuple(sl)]
            if need:
                t_lo, t_hi = [dd for dd in range(3) if dd != d]
                hh, hl = ext_ax[t_hi]
                lh, ll = ext_ax[t_lo]
                th = th.at[0, :].set(hh[tuple(sl)][0, :]).at[-1, :].set(
                    hh[tuple(sl)][-1, :])
                tl = tl.at[0, :].set(hl[tuple(sl)][0, :]).at[-1, :].set(
                    hl[tuple(sl)][-1, :])
                th = th.at[:, 0].set(lh[tuple(sl)][:, 0]).at[:, -1].set(
                    lh[tuple(sl)][:, -1])
                tl = tl.at[:, 0].set(ll[tuple(sl)][:, 0]).at[:, -1].set(
                    ll[tuple(sl)][:, -1])
            out[i] = interp_rb_strip_df(th[None], tl[None], 3)
            out[i] = (out[i][0][0], out[i][1][0])
        memo[key] = out
        return memo[key]

    # ------------------------------------------------------------------
    # double-float residual per level
    # ------------------------------------------------------------------
    def _residual_df(self, X, RHSh, RHSl, lvl, memo):
        """r_hi ~= rhs - A(x) on the padded canvas, df-exact at
        footprint cells.  Neighbor reads are SHIFTED SLICES of the
        materialized df ext pair (all ghosts in place), so the whole
        chain fuses into one elementwise program — rolling raw pair
        canvases with per-segment overlays measured 46 ms at a 512-class
        canvas (unfused-roll class, ~25 GB/s) vs ~3x less for the
        slice form (probe_refine_forest_anatomy).  Conflicted levels
        use per-axis exts so direction-d reads see d-axis ghosts
        (per-box ghost storage semantics)."""
        sv = self.s
        cfg = sv._kcfgs[lvl]
        idr2 = cfg.idr2[0]
        xh, xl = X[lvl]
        if sv.conflicts.get(lvl) is None:
            e0 = self._ext_df(X, lvl, memo)
            exts = [e0, e0, e0]
        else:
            exts = [self._ext_df(X, lvl, memo, prefer=a)
                    for a in range(3)]
        X_, Y_, Z_ = sv.dims[lvl]

        def shifted(arr, d, step):
            sl = [slice(1, -1)] * 3
            sl[2 - d] = slice(1 + step, arr.shape[2 - d] - 1 + step)
            return arr[tuple(sl)]

        if self.n_eps:
            return self._residual_df_vcoeff(X, RHSh, RHSl, lvl, memo,
                                            cfg, exts, shifted)

        ch = xh[_ISL]
        cl = xl[_ISL]
        s = RHSh[lvl][_ISL]
        comp = jnp.zeros_like(ch)
        alo = jnp.zeros_like(ch)
        for d in range(3):
            eh, el = exts[d]
            vlo_h = shifted(eh, d, -1)
            vhi_h = shifted(eh, d, +1)
            vlo_l = shifted(el, d, -1)
            vhi_l = shifted(el, d, +1)
            sd, ed = two_sum(vlo_h, vhi_h)
            s, e = two_sum(s, -(idr2 * sd))
            comp = comp + (e - idr2 * ed)
            alo = alo + idr2 * (vlo_l + vhi_l)
        s, e = two_sum(s, (4.0 * idr2) * ch)
        comp = comp + e
        s, e = two_sum(s, (2.0 * idr2) * ch)
        comp = comp + e
        comp = comp + RHSl[lvl][_ISL] - (alo - (6.0 * idr2) * cl)
        if self.lam_pair is not None:
            lam_h, lam_l = self.lam_pair
            p, pe = two_prod(ch, lam_h)  # traced first
            s, e = two_sum(s, p)
            comp = comp + (e + pe) + (lam_h * cl + lam_l * ch)
        r_hi, _ = two_sum(s, comp)
        return jnp.zeros_like(xh).at[_ISL].set(r_hi)

    def _residual_df_vcoeff(self, X, RHSh, RHSl, lvl, memo, cfg, exts,
                            shifted):
        """Variable-coefficient composite residual in double-float PAIR
        arithmetic (~2^-47 relative; ops.df32 pair-op section):

            r = rhs - sum_d sum_side c*(v - x) + lam*x,
            c = 2*e0*e_nbr/(e0+e_nbr) * idr2[d]

        — the harmonic-mean form of kernels._apply_expr
        (m_vlaplacian.f90:84-128, m_ahelmholtz.f90:69-162) with phi AND
        eps neighbor reads taken from materialized df ext pairs (eps rb
        ghosts ride the same coarse-strip interpolation as phi,
        _ring_values; phys faces the Neumann-zero copy)."""
        sv = self.s
        xh, xl = X[lvl]
        x = (xh[_ISL], xl[_ISL])
        acc = (RHSh[lvl][_ISL], RHSl[lvl][_ISL])
        exts_e = []
        for i in range(self.n_eps):
            tag = f"eps{i}"
            F = self._eps_df[tag]  # all levels: _bdf recurses coarser
            if sv.conflicts.get(lvl) is None:
                e0 = self._ext_df(F, lvl, memo, tag=tag)
                exts_e.append([e0, e0, e0])
            else:
                exts_e.append([self._ext_df(F, lvl, memo, prefer=a,
                                            tag=tag) for a in range(3)])
        for d in range(3):
            ph_, pl_ = exts[d]
            eeh, eel = exts_e[0 if self.n_eps == 1 else d][d]
            e0 = (eeh[(slice(1, -1),) * 3], eel[(slice(1, -1),) * 3])
            for step in (-1, +1):
                v = (shifted(ph_, d, step), shifted(pl_, d, step))
                enb = (shifted(eeh, d, step), shifted(eel, d, step))
                c = df_div(df_mul(e0, enb), df_add(e0, enb))
                c = df_scale_pow2(c, 2.0 * cfg.idr2[d])
                acc = df_sub(acc, df_mul(c, df_sub(v, x)))
        if self.lam_pair is not None:
            acc = df_add(acc, df_mul(x, self.lam_pair))
        return jnp.zeros_like(xh).at[_ISL].set(acc[0])

    # ------------------------------------------------------------------
    # double-float restriction (exact 8-cell average)
    # ------------------------------------------------------------------
    @staticmethod
    @functools.lru_cache(maxsize=None)
    def _even_selector(n: int):
        """0/1 matrix [n/2, n] selecting even indices — a matmul by it
        is EXACT (one nonzero per row, no sums) and runs on the MXU.
        Lane/sublane stride-2 slicing measures ~0.2 GB/s on this chip
        (docs/PERF.md); the selector form is the same trick as the
        dense2d restriction matmuls."""
        S = np.zeros((n // 2, n), np.float32)
        S[np.arange(n // 2), 2 * np.arange(n // 2)] = 1.0
        return S  # numpy: converted per trace (jnp would leak tracers)

    def _restrict_pair(self, h, l):
        """[Z, Y, X] pair -> [Z/2, Y/2, X/2] pair: full-weighting mean
        of 8 with the pair sums as TwoSums (errors fold into lo) and
        the 1/8 scale exact.  Pair sums ride roll+TwoSum (fused
        elementwise); even-index extraction along the tiled y/x axes
        rides exact selector matmuls (z, untiled, slices cheaply)."""
        for axis in (0, 1, 2):
            hs, e = two_sum(h, jnp.roll(h, -1, axis=axis))
            ls = l + jnp.roll(l, -1, axis=axis) + e
            if axis == 0:
                h, l = hs[::2], ls[::2]
            else:
                S = self._even_selector(hs.shape[axis])
                sub = "cy,zyx->zcx" if axis == 1 else "cx,zyx->zyc"
                h = jnp.einsum(sub, S, hs, precision="highest")
                l = jnp.einsum(sub, S, ls, precision="highest")
        return fast_two_sum(0.125 * h, 0.125 * l)

    def _restrict_into_df(self, X, lvl):
        """Write restrict(x_fine) into the coarse image rectangles —
        the composite discretization's non-leaf coarse values
        (update_coarse, m_multigrid.f90:369-383)."""
        sv = self.s
        fh, fl = X[lvl]
        ah, al = self._restrict_pair(fh[_ISL], fl[_ISL])
        ch, cl = X[lvl - 1]
        for (lo, hi), (clo, chi) in zip(sv.geom[lvl].rects,
                                        sv._image_rects(lvl)):
            win = (slice(int(lo[2]) // 2, int(hi[2]) // 2),
                   slice(int(lo[1]) // 2, int(hi[1]) // 2),
                   slice(int(lo[0]) // 2, int(hi[0]) // 2))
            sl = sv._cansl(clo, chi)
            ch = ch.at[sl].set(ah[win])
            cl = cl.at[sl].set(al[win])
        X[lvl - 1] = (ch, cl)
        return X

    # ------------------------------------------------------------------
    # the fused outer step
    # ------------------------------------------------------------------
    @functools.cached_property
    def _jit_step(self):
        sv = self.s

        @functools.partial(jax.jit, donate_argnums=(0,))
        def f(X, E, RHSh, RHSl):
            X = dict(X)
            for lvl in sv.levels:
                xh, xl = X[lvl]
                X[lvl] = accumulate_df32(xh, xl, E[lvl])
            for lvl in reversed(sv.levels[1:]):
                X = self._restrict_into_df(X, lvl)
            memo = {}
            R = {}
            norm = jnp.zeros((), jnp.float32)
            for lvl in sv.levels:
                r = self._residual_df(X, RHSh, RHSl, lvl, memo)
                R[lvl] = r
                norm = jnp.maximum(norm, jnp.max(jnp.where(
                    self.leaf_mask[lvl], jnp.abs(r[_ISL]), 0.0)))
            return X, R, norm

        return f

    @functools.cached_property
    def _jit_outer(self):
        """One WHOLE outer iteration as a single program (the uniform
        driver's round-4 pattern): accumulate + df restriction + df
        residuals become the inner rhs + the inner zero-guess forest
        FMG — one dispatch instead of two plus host pytree churn."""
        sv = self.s
        lam_a = sv._lam(self.lam)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def f(X, state, RHSh, RHSl):
            E = {lvl: state["phi"][lvl] for lvl in sv.levels}
            X = dict(X)
            for lvl in sv.levels:
                xh, xl = X[lvl]
                X[lvl] = accumulate_df32(xh, xl, E[lvl])
            for lvl in reversed(sv.levels[1:]):
                X = self._restrict_into_df(X, lvl)
            memo = {}
            norm = jnp.zeros((), jnp.float32)
            state = dict(state)
            state["rhs"] = dict(state["rhs"])
            for lvl in sv.levels:
                r = self._residual_df(X, RHSh, RHSl, lvl, memo)
                state["rhs"][lvl] = r
                norm = jnp.maximum(norm, jnp.max(jnp.where(
                    self.leaf_mask[lvl], jnp.abs(r[_ISL]), 0.0)))
            state, _ = sv._fmg(state, lam_a, have_guess=False,
                               need_res=False)
            return X, state, norm

        return f

    def solve(self, state, rhs_hi: Dict, rhs_lo: Dict, n_outer: int = 8,
              rtol: float = 0.0):
        """rhs_hi/rhs_lo: {lvl: interior [Z, Y, X] f32} pairs
        (``ops.df32.split_f64`` converts float64 fields; leaf cells are
        what matters).  Returns ({lvl: (x_hi, x_lo) interior}, leaf
        residual-max history, inner state)."""
        sv = self.s
        saved_refresh = getattr(sv, "ghost_refresh", "half")
        sv.ghost_refresh = self.inner_ghost_refresh
        try:
            return self._solve(state, rhs_hi, rhs_lo, n_outer, rtol)
        finally:
            sv.ghost_refresh = saved_refresh

    def _solve(self, state, rhs_hi, rhs_lo, n_outer, rtol):
        sv = self.s
        if self.n_eps:
            # install the coefficient hi parts on the inner solver (all
            # levels explicit — the per-level eps are authoritative)
            for i in range(self.n_eps):
                tag = f"eps{i}"
                for lvl in sv.levels:
                    state = sv.set_interior(
                        state, lvl, tag, self._eps_df[tag][lvl][0][_ISL])
            sv._direct = None  # coarse matrix depends on eps
        # Under a GSPMD-sharded inner state, the OUTER df arrays are
        # kept REPLICATED: sharding the step's inputs miscompiles its
        # ext-scatter/strip-interleave chains at shard boundaries
        # (measured — the 2D forest's documented jax 0.9.0 family; the
        # replicated rendering is bitwise the single-device one).  The
        # bulk of the work — the inner forest FMG — still distributes;
        # the outer residual is computed redundantly per device.
        repl = None
        if getattr(sv, "_gspmd_mesh", None) is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            repl = NamedSharding(sv._gspmd_mesh, PartitionSpec())
        place = ((lambda a: a) if repl is None
                 else (lambda a: jax.device_put(a, repl)))
        X = {}
        RHSh, RHSl = {}, {}
        for lvl in sv.levels:
            shape = sv._pshape(sv.dims[lvl])
            # distinct buffers: the step donates X, so no aliasing
            X[lvl] = (place(jnp.zeros(shape, jnp.float32)),
                      place(jnp.zeros(shape, jnp.float32)))
            RHSh[lvl] = place(jnp.zeros(shape, jnp.float32).at[_ISL].set(
                jnp.asarray(rhs_hi[lvl], jnp.float32)))
            RHSl[lvl] = place(jnp.zeros(shape, jnp.float32).at[_ISL].set(
                jnp.asarray(rhs_lo[lvl], jnp.float32)))
        norms_dev: List = []
        state = dict(state)
        state["rhs"] = dict(state["rhs"])
        sv._ensure_direct(state)
        # first accumulation must be a no-op: zero the inner phi
        for lvl in sv.levels:
            state = sv._set(state, "phi", lvl,
                            jnp.zeros_like(state["phi"][lvl]))
        if getattr(sv, "_gspmd_mesh", None) is None:
            for i in range(n_outer):
                X, state, mx = self._jit_outer(X, state, RHSh, RHSl)
                norms_dev.append(mx)
                if rtol and float(mx) <= rtol * float(norms_dev[0]):
                    break
            # closing norm: accumulate last correction + residuals only
            E = {lvl: state["phi"][lvl] for lvl in sv.levels}
            X, R, mx = self._jit_step(X, E, RHSh, RHSl)
            for lvl in sv.levels:
                state["rhs"][lvl] = R[lvl]
            norms_dev.append(mx)
        else:
            # GSPMD: TWO dispatches per outer — the replicated df step,
            # then the solver's own DISTRIBUTED FMG; R reshards to the
            # state's canonical placements between them, E (the FMG
            # correction) replicates before each step.  Asserted
            # bitwise vs single-device (tests/test_refine_forest.py).
            E = {lvl: place(jnp.zeros_like(state["phi"][lvl]))
                 for lvl in sv.levels}
            for i in range(n_outer + 1):
                X, R, mx = self._jit_step(X, E, RHSh, RHSl)
                for lvl in sv.levels:
                    state["rhs"][lvl] = jax.device_put(
                        R[lvl], state["phi"][lvl].sharding)
                norms_dev.append(mx)
                if i == n_outer:
                    break
                if rtol and float(mx) <= rtol * float(norms_dev[0]):
                    break
                state, _ = sv.fas_fmg(state, lam=self.lam,
                                      need_res=False)
                E = {lvl: place(state["phi"][lvl])
                     for lvl in sv.levels}
        norms = [float(m) for m in norms_dev]
        out = {lvl: (X[lvl][0][_ISL], X[lvl][1][_ISL])
               for lvl in sv.levels}
        return out, norms, state


class RefinedForest2DPoisson:
    """f64-class iterative refinement on 2D quadtree AMR / forest trees
    — the 2D rendering of :class:`RefinedForestPoisson` on the pure-XLA
    [Y, X] canvas machinery (solve/dense_forest2d.py).  The reference's
    2D AMR is f64 like everything else (m_data_structures.f90:8).

    Same exactness structure: all ghost coefficients are sums of powers
    of two (bc_to_gc triples, sides_rb 0.5/0.75/-0.25, strip ±0.125,
    full weighting 1/4), so the constant-coefficient composite residual
    is error-free over the double-float representation; the 2D den0 =
    4/dx² is itself a power of two (one exact product).  Variable
    coefficients ride the df pair arithmetic (~2^-47; ops.df32).

    ``solve`` takes/returns per-level [Y, X] canvases (leaf cells
    meaningful).  Gating mirrors the 3D driver; cylindrical geometry is
    outside the gate (non-power-of-two radial weights).
    """

    def __init__(self, solver, bc_values: Optional[List[float]] = None,
                 lam: float = 0.0, eps=None):
        from .dense_forest2d import DenseForest2DMGSolver
        assert isinstance(solver, DenseForest2DMGSolver), solver
        self.s = solver
        if solver.cfg.dtype != jnp.float32:
            raise ValueError("refines an f32 inner solver; got %s"
                             % solver.cfg.dtype)
        if solver.cfg.geometry != "cartesian":
            raise ValueError("cylindrical geometry is outside the df32 "
                             "gate (non-power-of-two radial weights)")
        self.n_eps = int(solver.n_eps)
        if self.n_eps and eps is None:
            raise ValueError(
                "variable-coefficient refinement needs eps={lvl: "
                "[interior f64 canvas] * n_eps}")
        if not self.n_eps and eps is not None:
            raise ValueError("eps= given for a constant-coeff solver")
        if solver.subtract_mean:
            raise ValueError("fully-periodic (subtract-mean) trees are "
                             "outside the refined gate")
        self.lam = float(lam)
        self.lam_pair = split_lam(lam)
        if self.lam != 0.0 and solver.cfg.operator not in (
                "helmholtz", "vhelmholtz", "ahelmholtz"):
            raise ValueError("lam != 0 needs a helmholtz-family solver")
        self.cbs: Dict[int, List] = {}
        for lvl in solver.levels:
            cfg = solver._kcfgs[lvl]
            if self.n_eps:
                if not all(_is_pow2(v) for v in cfg.idr2):
                    raise ValueError("1/dx^2 must be powers of two "
                                     "(lvl %d: %r)" % (lvl, cfg.idr2))
            elif len(set(cfg.idr2)) != 1 or not _is_pow2(cfg.idr2[0]):
                raise ValueError("1/dx^2 must be an equal power of two "
                                 "per level (lvl %d: %r)"
                                 % (lvl, cfg.idr2))
            bc = solver._bc_static(lvl)
            row = []
            for nb in range(4):
                if bc[nb] is None:
                    row.append((0.0, 0.0))
                    continue
                c0, c1, c2 = bc[nb]
                if c1 not in _OK_C or c2 not in _OK_C:
                    raise ValueError("BC coefficient class outside the "
                                     "exact set (face %d)" % nb)
                spec = solver.bc_spec[nb]
                if spec["fn"] is not None:
                    raise ValueError("constant boundary values only")
                if float(spec["value"]) != 0.0:
                    raise ValueError(
                        "inner solver must be homogeneous (b=0); pass "
                        "true values via bc_values= (face %d)" % nb)
                bv = 0.0 if bc_values is None else float(bc_values[nb])
                hi, lo = split_f64(np.float64(c0) * np.float64(bv))
                row.append((float(hi), float(lo)))
            self.cbs[lvl] = row
        self.leaf_mask = {}
        for lvl in solver.levels:
            m = solver.footprint_mask(lvl).copy()
            if lvl + 1 in solver.levels:
                for clo, chi in solver._image_rects(lvl + 1):
                    m[int(clo[1]):int(chi[1]),
                      int(clo[0]):int(chi[0])] = False
            self.leaf_mask[lvl] = jnp.asarray(m)
        self._eps_df = {}
        if self.n_eps:
            for i in range(self.n_eps):
                per = {}
                for lvl in solver.levels:
                    hi, lo = split_f64(np.asarray(eps[lvl][i],
                                                  np.float64))
                    per[lvl] = (jnp.asarray(hi), jnp.asarray(lo))
                self._eps_df[f"eps{i}"] = per

    # ------------------------------------------------------------------
    # double-float ghost synthesis / ext materialization (2D)
    # ------------------------------------------------------------------
    def _ghost_df(self, lvl, seg, xh, xl, bdf, i, is_eps=False):
        sv = self.s
        d = seg.nb // 2
        ax = 1 - d
        if seg.kind == "wrap":
            lo = seg.lo.copy()
            hi = seg.hi.copy()
            lo[d] = seg.src
            hi[d] = seg.src + 1
            sl = sv._cansl(lo, hi)
            return xh[sl], xl[sl]
        x1h, x2h = sv._seg_x12(xh, seg)
        x1l, x2l = sv._seg_x12(xl, seg)
        if is_eps and seg.kind != "rb":
            return (jnp.expand_dims(1.0 * x1h, ax),
                    jnp.expand_dims(1.0 * x1l, ax))
        if seg.kind == "rb":
            bh, bl = bdf[i]
            g, e1 = two_sum(0.5 * bh, 0.5 * x1h)
            g, e2 = two_sum(g, 0.25 * x1h)
            g, e3 = two_sum(g, -(0.25 * x2h))
            gl = (0.5 * bl + (0.5 * x1l + 0.25 * x1l) - 0.25 * x2l) \
                + ((e1 + e2) + e3)
        else:
            c0, c1, c2 = sv._bc_static(lvl)[seg.nb]
            cbh, cbl = self.cbs[lvl][seg.nb]
            g, ge = two_sum(c1 * x1h, cbh)  # traced first (two_sum)
            gl = c1 * x1l + cbl
            if c2 != 0.0:
                g, e2 = two_sum(g, c2 * x2h)
                ge = ge + e2
                gl = gl + c2 * x2l
            gl = gl + ge
        return jnp.expand_dims(g, ax), jnp.expand_dims(gl, ax)

    def _ext_df(self, X, lvl, memo, prefer=None, tag="phi"):
        """[Y+2, X+2] df canvas pair with ALL ghosts materialized."""
        key = ("ext", tag, lvl, prefer)
        if key in memo:
            return memo[key]
        sv = self.s
        xh, xl = X[lvl]
        X_, Y_ = sv.dims[lvl]
        bdf = self._bdf(X, lvl, memo, tag)
        is_eps = tag != "phi"
        eh = jnp.zeros((Y_ + 2, X_ + 2), jnp.float32)
        el = jnp.zeros((Y_ + 2, X_ + 2), jnp.float32)
        eh = eh.at[1:-1, 1:-1].set(xh)
        el = el.at[1:-1, 1:-1].set(xl)
        items = list(enumerate(sv.segs[lvl]))
        if prefer is not None:
            items.sort(key=lambda t: (t[1].sink == "ring"
                                      and t[1].nb // 2 == prefer))
        for i, seg in items:
            gh, gl = self._ghost_df(lvl, seg, xh, xl, bdf, i, is_eps)
            sl = tuple(slice(1 + int(seg.lo[dd]), 1 + int(seg.hi[dd]))
                       for dd in (1, 0))
            eh = eh.at[sl].set(gh)
            el = el.at[sl].set(gl)
        memo[key] = (eh, el)
        return memo[key]

    def _bdf(self, X, lvl, memo, tag="phi"):
        key = ("bdf", tag, lvl)
        if key in memo:
            return memo[key]
        sv = self.s
        segs_rb = [s for s in sv.segs[lvl] if s.kind == "rb"]
        if not segs_rb:
            memo[key] = {}
            return memo[key]
        uc = sv._coarse_of(lvl)
        need = bool(sv.conflicted.get(uc))
        if need:
            ext_ax = {a: self._ext_df(X, uc, memo, prefer=a, tag=tag)
                      for a in range(2)}
            exth, extl = ext_ax[0]
        else:
            exth, extl = self._ext_df(X, uc, memo, tag=tag)
        off_c = sv.offsets[uc]
        off_f = sv.offsets[lvl]
        out = {}
        for i, seg in enumerate(sv.segs[lvl]):
            if seg.kind != "rb":
                continue
            d = seg.nb // 2
            td = 1 - d
            sl: List = [0, 0]
            sl[1 - d] = seg.cg - int(off_c[d]) + 1
            c0 = (int(off_f[td]) + int(seg.lo[td])) // 2 - int(off_c[td])
            c1 = (int(off_f[td]) + int(seg.hi[td])) // 2 - int(off_c[td])
            sl[1 - td] = slice(c0, c1 + 2)
            th, tl = exth[tuple(sl)], extl[tuple(sl)]
            if need:
                hh, hl = ext_ax[td]
                th = th.at[0].set(hh[tuple(sl)][0]).at[-1].set(
                    hh[tuple(sl)][-1])
                tl = tl.at[0].set(hl[tuple(sl)][0]).at[-1].set(
                    hl[tuple(sl)][-1])
            rh, rl = interp_rb_strip_df(th[None], tl[None], 2)
            out[i] = (rh[0], rl[0])
        memo[key] = out
        return memo[key]

    # ------------------------------------------------------------------
    # double-float residual per level (2D)
    # ------------------------------------------------------------------
    def _residual_df(self, X, RHSh, RHSl, lvl, memo):
        sv = self.s
        cfg = sv._kcfgs[lvl]
        idr2 = cfg.idr2[0]
        xh, xl = X[lvl]
        if not sv.conflicted.get(lvl):
            e0 = self._ext_df(X, lvl, memo)
            exts = [e0, e0]
        else:
            exts = [self._ext_df(X, lvl, memo, prefer=a)
                    for a in range(2)]

        def shifted(arr, d, step):
            sl = [slice(1, -1)] * 2
            sl[1 - d] = slice(1 + step, arr.shape[1 - d] - 1 + step)
            return arr[tuple(sl)]

        if self.n_eps:
            x = (xh, xl)
            acc = (RHSh[lvl], RHSl[lvl])
            exts_e = []
            for i in range(self.n_eps):
                tag = f"eps{i}"
                F = self._eps_df[tag]
                if not sv.conflicted.get(lvl):
                    e0 = self._ext_df(F, lvl, memo, tag=tag)
                    exts_e.append([e0, e0])
                else:
                    exts_e.append([self._ext_df(F, lvl, memo, prefer=a,
                                                tag=tag)
                                   for a in range(2)])
            for d in range(2):
                ph_, pl_ = exts[d]
                eeh, eel = exts_e[0 if self.n_eps == 1 else d][d]
                e0 = (eeh[1:-1, 1:-1], eel[1:-1, 1:-1])
                for step in (-1, +1):
                    v = (shifted(ph_, d, step), shifted(pl_, d, step))
                    enb = (shifted(eeh, d, step), shifted(eel, d, step))
                    c = df_div(df_mul(e0, enb), df_add(e0, enb))
                    c = df_scale_pow2(c, 2.0 * cfg.idr2[d])
                    acc = df_sub(acc, df_mul(c, df_sub(v, x)))
            if self.lam_pair is not None:
                acc = df_add(acc, df_mul(x, self.lam_pair))
            return acc[0]

        ch, cl = xh, xl
        s = RHSh[lvl]
        comp = jnp.zeros_like(ch)
        alo = jnp.zeros_like(ch)
        for d in range(2):
            eh, el = exts[d]
            vlo_h = shifted(eh, d, -1)
            vhi_h = shifted(eh, d, +1)
            vlo_l = shifted(el, d, -1)
            vhi_l = shifted(el, d, +1)
            sd, ed = two_sum(vlo_h, vhi_h)
            s, e = two_sum(s, -(idr2 * sd))
            comp = comp + (e - idr2 * ed)
            alo = alo + idr2 * (vlo_l + vhi_l)
        # den0 = 4*idr2 is a power of two: one exact product
        s, e = two_sum(s, (4.0 * idr2) * ch)
        comp = comp + e
        comp = comp + RHSl[lvl] - (alo - (4.0 * idr2) * cl)
        if self.lam_pair is not None:
            lam_h, lam_l = self.lam_pair
            p, pe = two_prod(ch, lam_h)  # traced first
            s, e = two_sum(s, p)
            comp = comp + (e + pe) + (lam_h * cl + lam_l * ch)
        r_hi, _ = two_sum(s, comp)
        return r_hi

    # ------------------------------------------------------------------
    # double-float restriction (exact 4-cell average) into coarse images
    # ------------------------------------------------------------------
    def _restrict_pair(self, h, l):
        for axis in (0, 1):
            hs, e = two_sum(h, jnp.roll(h, -1, axis=axis))
            ls = l + jnp.roll(l, -1, axis=axis) + e
            if axis == 0:
                h, l = hs[::2], ls[::2]
            else:
                S = RefinedForestPoisson._even_selector(hs.shape[1])
                h = jnp.einsum("cx,yx->yc", S, hs, precision="highest")
                l = jnp.einsum("cx,yx->yc", S, ls, precision="highest")
        return fast_two_sum(0.25 * h, 0.25 * l)

    def _restrict_into_df(self, X, lvl):
        sv = self.s
        fh, fl = X[lvl]
        ah, al = self._restrict_pair(fh, fl)
        uc = sv._coarse_of(lvl)
        ch, cl = X[uc]
        for (lo, hi), (clo, chi) in zip(sv.geom[lvl].rects,
                                        sv._image_rects(lvl)):
            win = (slice(int(lo[1]) // 2, int(hi[1]) // 2),
                   slice(int(lo[0]) // 2, int(hi[0]) // 2))
            sl = sv._cansl(clo, chi)
            ch = ch.at[sl].set(ah[win])
            cl = cl.at[sl].set(al[win])
        X[uc] = (ch, cl)
        return X

    # ------------------------------------------------------------------
    # the fused outer step
    # ------------------------------------------------------------------
    @functools.cached_property
    def _jit_step(self):
        sv = self.s

        @functools.partial(jax.jit, donate_argnums=(0,))
        def f(X, E, RHSh, RHSl):
            X = dict(X)
            for lvl in sv.levels:
                xh, xl = X[lvl]
                X[lvl] = accumulate_df32(xh, xl, E[lvl])
            for lvl in reversed(sv.levels[1:]):
                X = self._restrict_into_df(X, lvl)
            memo = {}
            R = {}
            norm = jnp.zeros((), jnp.float32)
            for lvl in sv.levels:
                r = self._residual_df(X, RHSh, RHSl, lvl, memo)
                R[lvl] = r
                norm = jnp.maximum(norm, jnp.max(jnp.where(
                    self.leaf_mask[lvl], jnp.abs(r), 0.0)))
            return X, R, norm

        return f

    @functools.cached_property
    def _jit_outer(self):
        sv = self.s
        lam_a = sv._lam(self.lam)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def f(X, state, RHSh, RHSl):
            X = dict(X)
            for lvl in sv.levels:
                xh, xl = X[lvl]
                X[lvl] = accumulate_df32(xh, xl, state["phi"][lvl])
            for lvl in reversed(sv.levels[1:]):
                X = self._restrict_into_df(X, lvl)
            memo = {}
            norm = jnp.zeros((), jnp.float32)
            state = dict(state)
            state["rhs"] = dict(state["rhs"])
            for lvl in sv.levels:
                r = self._residual_df(X, RHSh, RHSl, lvl, memo)
                state["rhs"][lvl] = r
                norm = jnp.maximum(norm, jnp.max(jnp.where(
                    self.leaf_mask[lvl], jnp.abs(r), 0.0)))
            state, _ = sv._fmg(state, lam_a, have_guess=False,
                               need_res=False)
            return X, state, norm

        return f

    def solve(self, state, rhs_hi: Dict, rhs_lo: Dict,
              n_outer: int = 8, rtol: float = 0.0):
        """rhs_hi/rhs_lo: {lvl: [Y, X] f32} canvas pairs.  Returns
        ({lvl: (x_hi, x_lo)}, leaf residual-max history, inner
        state)."""
        sv = self.s
        if self.n_eps:
            for i in range(self.n_eps):
                tag = f"eps{i}"
                for lvl in sv.levels:
                    state = sv.set_interior(state, lvl, tag,
                                            self._eps_df[tag][lvl][0])
            sv._direct = None
        X, RHSh, RHSl = {}, {}, {}
        for lvl in sv.levels:
            shape = sv._pshape(sv.dims[lvl])
            X[lvl] = (jnp.zeros(shape, jnp.float32),
                      jnp.zeros(shape, jnp.float32))
            RHSh[lvl] = jnp.asarray(rhs_hi[lvl], jnp.float32)
            RHSl[lvl] = jnp.asarray(rhs_lo[lvl], jnp.float32)
        norms_dev: List = []
        state = dict(state)
        state["rhs"] = dict(state["rhs"])
        sv._ensure_direct(state)
        for lvl in sv.levels:
            state = sv._set(state, "phi", lvl,
                            jnp.zeros_like(state["phi"][lvl]))
        for i in range(n_outer):
            X, state, mx = self._jit_outer(X, state, RHSh, RHSl)
            norms_dev.append(mx)
            if rtol and float(mx) <= rtol * float(norms_dev[0]):
                break
        E = {lvl: state["phi"][lvl] for lvl in sv.levels}
        X, R, mx = self._jit_step(X, E, RHSh, RHSl)
        for lvl in sv.levels:
            state["rhs"][lvl] = R[lvl]
        norms_dev.append(mx)
        norms = [float(m) for m in norms_dev]
        out = {lvl: (X[lvl][0], X[lvl][1]) for lvl in sv.levels}
        return out, norms, state
