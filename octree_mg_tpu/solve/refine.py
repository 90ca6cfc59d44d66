"""f64-class iterative refinement around the f32 dense solver.

The reference solves in float64 end to end (m_data_structures.f90:8);
TPU f32 FMG reaches its residual floor at ~1e-6 relative.  This driver
recovers the f64 accuracy class at f32 speed:

    x = 0 (double-float pair)
    repeat:  r = rhs - A(x)      exact double-float residual (ops/df32)
             solve A e = r       one f32 FMG (the 67 ms/512^3 fast path)
             x += e              double-float accumulation

Because A is linear and the FMG contracts the residual ~40x per cycle,
the true (f64-class) residual keeps contracting at that rate far past
the f32 floor (docs/PERF.md "dtype study").  The residual runs in
z-chunks so peak memory stays ~5 f32 fields.

Gating: `ops.df32.df32_ok` (power-of-two 1/dx^2, constant-coefficient
laplacian or helmholtz — lam rides an exact TwoProduct — and exact BC
coefficient classes).  bench.py falls back to the XLA-emulated-f64
chunked residual outside the gate.
"""
from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import dense_kernels as dk
from ..ops.df32 import (_cb_pairs, accumulate_df32, df32_ok,
                        df32_vcoeff_ok, residual_df32,
                        residual_df32_dense, residual_df32_vcoeff,
                        split_f64, split_lam)
from .dense import DenseMGSolver, _ISL


class RefinedPoisson:
    """Iteratively-refined solve on the dense solver's top level.

    Jitted programs are built once per instance and reused across
    ``solve`` calls (bench-friendly).

    lam: Helmholtz λ (∇²φ − λφ = f, m_helmholtz.f90) — the residual's
    +λ·x term rides an exact Dekker TwoProduct with λ split host-side
    into a double-float pair (ops.df32.split_lam), so Helmholtz solves
    reach the same f64 accuracy class as Poisson.  Requires the solver
    to be built with operator="helmholtz" when lam != 0 (the inner FMG
    must smooth with the same λ).
    """

    def __init__(self, solver: DenseMGSolver, nch: Optional[int] = None,
                 bc_values: Optional[List[float]] = None,
                 lam: float = 0.0, eps=None):
        self.solver = solver
        self.lam = float(lam)
        self.lam_pair = split_lam(lam)
        if self.lam != 0.0 and solver.cfg.operator not in (
                "helmholtz", "vhelmholtz", "ahelmholtz"):
            raise ValueError("lam != 0 needs a helmholtz-family "
                             "inner solver (got %r)" % solver.cfg.operator)
        top = solver.levels[-1]
        self.top = top
        cfg = solver._kcfgs[top]
        if cfg.dtype != jnp.float32:
            raise ValueError("RefinedPoisson refines an f32 inner "
                             "solver (build with MGConfig(dtype="
                             "jnp.float32)); got %s" % cfg.dtype)
        self.n_eps = int(cfg.n_eps)
        if self.n_eps:
            # variable-coefficient operators: double-float pair
            # arithmetic (~2^-47 relative — f64-class but not
            # error-free; ops.df32 section comment)
            assert df32_vcoeff_ok(cfg), ("rhs/operator outside the "
                                         "df32 vcoeff gate")
            if eps is None:
                raise ValueError(
                    "variable-coefficient refinement needs the f64 "
                    "coefficient fields: eps=[interior f64 array] * "
                    "n_eps (the driver splits them into df pairs and "
                    "installs the hi parts on the inner solver)")
        else:
            assert df32_ok(cfg), "rhs/operator outside the df32 gate"
            assert eps is None, "eps= given for a constant-coeff solver"
        self._eps64 = eps
        # Refinement solves the error equation, which is HOMOGENEOUS:
        # the inner FMG must carry b = 0 on every face (else each outer
        # pass re-adds the boundary offset and the loop stalls at the
        # inhomogeneity).  The TRUE boundary values enter through the
        # outer residual only (bc_values -> the c0*b pairs of ops.df32).
        for nb in range(6):
            if cfg.periodic[nb // 2]:
                continue
            if float(cfg.b_const[nb]) != 0.0:
                raise ValueError(
                    "inner solver must have homogeneous (b=0) BCs; set "
                    "the boundary value to 0 on the solver and pass the "
                    "true values via bc_values= (face %d has b=%r)"
                    % (nb, cfg.b_const[nb]))
        self.cbs = _cb_pairs(cfg, bc_values)
        self.cfg = cfg
        X, Y, Z = (int(v) for v in solver.dims[top])
        self.shape = (Z, Y, X)
        if nch is None:
            nch = 8 if (Z % 8 == 0 and Z >= 64) else 1
        self.nch = nch
        self.CH = Z // nch
        self.ccfg = dk.DenseStencilConfig(
            dims=(cfg.X, cfg.Y, self.CH), idr2=cfg.idr2, bc=cfg.bc,
            periodic=cfg.periodic, dtype=cfg.dtype, b_const=cfg.b_const,
            interpret=cfg.interpret, n_eps=0) if nch > 1 else cfg
        self.pshape = dk.padded_shape(solver.dims[top])
        self._eps_pairs = ()
        if self.n_eps:
            import numpy as np
            assert len(eps) == self.n_eps, (len(eps), self.n_eps)
            pairs = []
            for a in eps:
                hi, lo = split_f64(np.asarray(a, np.float64))
                pairs.append((solver._sync_pads(self.pad(hi), top),
                              solver._sync_pads(self.pad(lo), top)))
            self._eps_pairs = tuple(pairs)

    def _residual_padded(self, xhi, xlo, rhshi_p, rhslo_p, eps_pairs):
        """Padded df residual: the error-free Mosaic/XLA kernel for
        constant coefficients, double-float pair arithmetic for the
        variable-coefficient operators."""
        if self.n_eps:
            return residual_df32_vcoeff(self.cfg, xhi, xlo, rhshi_p,
                                        rhslo_p, eps_pairs, cbs=self.cbs,
                                        lam_pair=self.lam_pair)
        return residual_df32_dense(self.cfg, xhi, xlo, rhshi_p, rhslo_p,
                                   cbs=self.cbs, lam_pair=self.lam_pair)

    def pad(self, v):
        return jnp.zeros(self.pshape, jnp.float32).at[_ISL].set(
            jnp.asarray(v, jnp.float32))

    @functools.cached_property
    def _jit_residual(self):
        solver, top, nch, CH = self.solver, self.top, self.nch, self.CH
        Z, Y, X = self.shape
        PZ = dk.PZ

        @jax.jit
        def f(xhi, xlo, rhshi_p, rhslo_p):
            xhi = solver._sync_pads(xhi, top)
            xlo = solver._sync_pads(xlo, top)
            if self.cfg.use_kernel:
                # Mosaic path: one window-DMA pass, no chunking needed
                ri = residual_df32_dense(self.cfg, xhi, xlo, rhshi_p,
                                         rhslo_p, cbs=self.cbs,
                                         lam_pair=self.lam_pair)[_ISL]
                return jnp.max(jnp.abs(ri)), ri
            if nch == 1:
                ri = residual_df32(self.cfg, xhi, xlo, rhshi_p,
                                   rhslo_p, cbs=self.cbs,
                                   lam_pair=self.lam_pair)[_ISL]
                return jnp.max(jnp.abs(ri)), ri

            def chunk(i, carry):
                out, mx = carry
                w = [lax.dynamic_slice_in_dim(a, i * CH, CH + 2 * PZ,
                                              axis=0)
                     for a in (xhi, xlo, rhshi_p, rhslo_p)]
                r = residual_df32(self.ccfg, *w,
                                  z_gates=(i == 0, i == nch - 1),
                                  cbs=self.cbs, lam_pair=self.lam_pair)
                ri = r[_ISL]
                mx = jnp.maximum(mx, jnp.max(jnp.abs(ri)))
                out = lax.dynamic_update_slice_in_dim(out, ri, i * CH,
                                                      axis=0)
                return out, mx

            out = jnp.zeros((Z, Y, X), jnp.float32)
            mx = jnp.zeros((), jnp.float32)
            out, mx = lax.fori_loop(0, nch, chunk, (out, mx))
            return mx, out

        return f

    @functools.cached_property
    def _jit_accum(self):
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def f(xhi, xlo, e32):
            return accumulate_df32(xhi, xlo, e32)
        return f

    @functools.cached_property
    def _jit_step(self):
        """Fused outer step for the Mosaic path: double-float
        accumulation of the previous FMG correction, pad sync, and the
        df32 residual kernel — one dispatch, x_hi/x_lo donated.  The
        kernel's PADDED output becomes the next rhs directly (pads are
        garbage-by-contract everywhere; _sync_pads rebuilds periodic
        pads before every sweep) — the old interior rewrite into the
        previous rhs buffer cost a full extra HBM pass (~5 ms at 512^3,
        probe_refine_step)."""
        solver, top = self.solver, self.top

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def f(xhi, xlo, e32, rhshi_p, rhslo_p, eps_pairs):
            xhi, xlo = accumulate_df32(xhi, xlo, e32)
            xhi = solver._sync_pads(xhi, top)
            xlo = solver._sync_pads(xlo, top)
            rp = self._residual_padded(xhi, xlo, rhshi_p, rhslo_p,
                                       eps_pairs)
            mx = jnp.max(jnp.abs(rp[_ISL]))
            return xhi, xlo, rp, mx
        return f

    #: whether the single-dispatch fused outer (step + inner FMG in one
    #: program) applies; the sharded driver keeps its shard_map split
    _outer_fusable = True

    def _zeros_padded(self):
        return jnp.zeros(self.pshape, jnp.float32)

    def _interior(self, a):
        return a[_ISL]

    @functools.cached_property
    def _jit_outer(self):
        """One WHOLE outer iteration as a single program: double-float
        accumulation of the previous correction, the df32 residual
        kernel (its padded output becomes the inner rhs), and the inner
        zero-guess FMG.  One dispatch per outer instead of two — the
        tunnel's per-dispatch latency and host pytree plumbing cost
        several ms/outer at 512^3 (probe_solve_clean: 79-88 measured vs
        the 76.5 piece-sum floor)."""
        solver, top = self.solver, self.top
        lam_a = solver._lam(self.lam)

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def f(state, xhi, xlo, rhshi_p, rhslo_p, eps_pairs):
            e32 = state["phi"][top]
            xhi, xlo = accumulate_df32(xhi, xlo, e32)
            xhi = solver._sync_pads(xhi, top)
            xlo = solver._sync_pads(xlo, top)
            rp = self._residual_padded(xhi, xlo, rhshi_p, rhslo_p,
                                       eps_pairs)
            mx = jnp.max(jnp.abs(rp[_ISL]))
            state = solver._set(state, "rhs", top, rp)
            state, _ = solver._fmg(state, lam_a, have_guess=False,
                                   need_res=False)
            return state, xhi, xlo, mx
        return f

    def _solve_fused(self, state, rhshi_p, rhslo_p, n_outer, rtol):
        """Fused outer loop: ONE dispatch per outer (accumulate +
        residual + inner FMG), plus a final step call for the closing
        norm.

        With rtol == 0 (fixed outer count) the per-outer norm scalars
        stay on device and are read back once at the end — a per-outer
        device->host float() stalls the dispatch pipeline on the TPU
        tunnel for more than the step itself costs (probe_refine_step:
        18.7 ms/step amortized vs ~43 ms with per-outer syncs)."""
        solver, top = self.solver, self.top
        if self.n_eps:
            # install the coefficient hi parts on the inner solver so
            # the preconditioner matches the outer operator, and
            # rebuild the coarse coefficient chain
            state = dict(state)
            for i, (ph, _pl) in enumerate(self._eps_pairs):
                state = solver.set_interior(state, top, f"eps{i}",
                                            ph[_ISL])
            state = solver.prepare_coefficient(state)
            solver._direct = None  # coarse matrix depends on eps
        solver._ensure_direct(state)
        xhi = self._zeros_padded()
        xlo = self._zeros_padded()
        norms_dev: List = []
        state = dict(state)
        state["rhs"] = dict(state["rhs"])
        if self._outer_fusable:
            # first iteration: phi must be zero so the accumulation is
            # a no-op (fresh allocate states are; reused may not be)
            state = solver._set(state, "phi", top,
                                jnp.zeros_like(state["phi"][top]))
            for i in range(n_outer):
                state, xhi, xlo, mx = self._jit_outer(
                    state, xhi, xlo, rhshi_p, rhslo_p, self._eps_pairs)
                norms_dev.append(mx)
                if rtol:  # early exit requested: sync each outer
                    if float(mx) <= rtol * float(norms_dev[0]):
                        break
            # closing norm: accumulate last correction + residual only
            xhi, xlo, rhs_new, mx = self._jit_step(
                xhi, xlo, state["phi"][top], rhshi_p, rhslo_p,
                self._eps_pairs)
            state["rhs"][top] = rhs_new
            norms_dev.append(mx)
            norms = [float(m) for m in norms_dev]
            return self._interior(xhi), self._interior(xlo), norms, state
        # two-dispatch loop (sharded path: the inner FMG runs through
        # the solver's own shard_map programs)
        e32 = self._zeros_padded()
        for i in range(n_outer + 1):
            xhi, xlo, rhs_new, mx = self._jit_step(
                xhi, xlo, e32, rhshi_p, rhslo_p, self._eps_pairs)
            state["rhs"][top] = rhs_new
            norms_dev.append(mx)
            if i == n_outer:
                break
            if rtol:
                if float(mx) <= rtol * float(norms_dev[0]):
                    break
            state, _ = solver.fas_fmg(state, lam=self.lam,
                                      need_res=False)
            e32 = state["phi"][top]
        norms = [float(m) for m in norms_dev]
        return self._interior(xhi), self._interior(xlo), norms, state

    def solve(self, state, rhs_hi, rhs_lo, n_outer: int = 8,
              rtol: float = 0.0):
        """rhs_hi/rhs_lo: interior [Z, Y, X] f32 pair
        (`ops.df32.split_f64` converts a float64 rhs).  Returns
        (x_hi, x_lo interior pair, residual-max history, state)."""
        solver, top = self.solver, self.top
        rhshi_p = self.pad(rhs_hi)
        rhslo_p = self.pad(rhs_lo)
        if self.cfg.use_kernel or self.n_eps:
            # vcoeff always fuses: its residual is pure XLA, kernel or
            # not, and the fused outer carries the eps pairs as args
            return self._solve_fused(state, rhshi_p, rhslo_p, n_outer,
                                     rtol)
        xhi = jnp.zeros(self.pshape, jnp.float32)
        xlo = jnp.zeros(self.pshape, jnp.float32)
        norms: List[float] = []
        for _ in range(n_outer):
            mx, r32 = self._jit_residual(xhi, xlo, rhshi_p, rhslo_p)
            norms.append(float(mx))
            if rtol and norms[-1] <= rtol * norms[0]:
                break
            state = solver.set_interior(state, top, "rhs", r32)
            state, _ = solver.fas_fmg(state, lam=self.lam,
                                      need_res=False)
            xhi, xlo = self._jit_accum(xhi, xlo, state["phi"][top])
        mx, _ = self._jit_residual(xhi, xlo, rhshi_p, rhslo_p)
        norms.append(float(mx))
        return xhi[_ISL], xlo[_ISL], norms, state


class ShardedRefinedPoisson(RefinedPoisson):
    """Iterative refinement over :class:`ShardedDenseMGSolver`: the
    fused outer step runs inside ``shard_map`` on the z-slab layout —
    double-float accumulation, ppermute halo exchange, the df32
    residual with per-shard z gates, a ``pmax`` norm, and the rhs
    write.  The inner FMG is the sharded solver's own.  Bitwise vs the
    single-device RefinedPoisson (tests/test_dense_shard.py)."""

    _outer_fusable = False

    def __init__(self, solver, bc_values: Optional[List[float]] = None,
                 lam: float = 0.0):
        from .dense_shard import ShardedDenseMGSolver
        assert isinstance(solver, ShardedDenseMGSolver)
        super().__init__(solver, nch=1, bc_values=bc_values, lam=lam)
        self.sharded_top = solver.sharded[self.top]
        if self.sharded_top:
            Z, Y, X = self.shape
            K = solver.K
            self.pshape = (K, Z // K + 2 * dk.PZ, Y + 2 * dk.PY, X)
            self._isl4 = (slice(None), slice(dk.PZ, -dk.PZ),
                          slice(dk.PY, -dk.PY), slice(None))

    def pad(self, v):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from .dense_shard import AXIS
        sv = self.solver
        if not self.sharded_top:
            return jax.device_put(super().pad(v),
                                  NamedSharding(sv.mesh, P()))
        Z, Y, X = self.shape
        K = sv.K
        a = jnp.zeros(self.pshape, jnp.float32).at[self._isl4].set(
            jnp.asarray(v, jnp.float32).reshape(K, Z // K, Y, X))
        return jax.device_put(a, NamedSharding(sv.mesh, P(AXIS)))

    def _zeros_padded(self):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from .dense_shard import AXIS
        sp = P(AXIS) if self.sharded_top else P()
        return jax.device_put(jnp.zeros(self.pshape, jnp.float32),
                              NamedSharding(self.solver.mesh, sp))

    def _interior(self, a):
        if not self.sharded_top:
            return a[_ISL]
        Z, Y, X = self.shape
        return a[self._isl4].reshape(Z, Y, X)

    @functools.cached_property
    def _jit_step(self):
        from jax.sharding import PartitionSpec as P
        from .dense_shard import AXIS
        solver, top, cfg = self.solver, self.top, self.cfg
        if not self.sharded_top:
            # replicated top: the plain step runs under GSPMD as-is
            return RefinedPoisson._jit_step.func(self)

        def local(xhi, xlo, e32, rhi, rlo):
            xhi, xlo, e32, rhi, rlo = (
                a[0] for a in (xhi, xlo, e32, rhi, rlo))
            solver._ctx = {"idx": lax.axis_index(AXIS)}
            try:
                xhi, xlo = accumulate_df32(xhi, xlo, e32)
                xhi = solver._sync_pads(xhi, top)
                xlo = solver._sync_pads(xlo, top)
                rp = residual_df32_dense(cfg, xhi, xlo, rhi, rlo,
                                         z_gates=solver._gates(top),
                                         cbs=self.cbs,
                                         lam_pair=self.lam_pair)
                mx = lax.pmax(jnp.max(jnp.abs(rp[_ISL])), AXIS)
            finally:
                solver._ctx = None
            return xhi[None], xlo[None], rp[None], mx

        sp = P(AXIS)

        def run(xhi, xlo, e32, rhi, rlo, eps_pairs):
            del eps_pairs  # vcoeff is outside the sharded refined gate
            f = jax.shard_map(local, mesh=solver.mesh,
                              in_specs=(sp,) * 5,
                              out_specs=(sp, sp, sp, P()),
                              check_vma=False)
            return f(xhi, xlo, e32, rhi, rlo)

        return jax.jit(run, donate_argnums=(0, 1))

    def solve(self, state, rhs_hi, rhs_lo, n_outer: int = 8,
              rtol: float = 0.0):
        rhshi_p = self.pad(rhs_hi)
        rhslo_p = self.pad(rhs_lo)
        return self._solve_fused(state, rhshi_p, rhslo_p, n_outer, rtol)


class RefinedPoisson2D:
    """Iterative refinement on the dense 2D [Y, X] path (pure XLA, no
    pads: rolls wrap exactly, so the step is one fused elementwise
    chain).  Distributes under GSPMD y-slab placement unchanged — the
    step inherits the state's shardings."""

    def __init__(self, solver, bc_values: Optional[List[float]] = None,
                 lam: float = 0.0):
        from ..ops.df32 import df32_ok_2d
        from .dense2d import Dense2DMGSolver
        assert isinstance(solver, Dense2DMGSolver)
        self.solver = solver
        self.lam = float(lam)
        self.lam_pair = split_lam(lam)
        if self.lam != 0.0 and solver.cfg.operator != "helmholtz":
            raise ValueError("lam != 0 needs an operator='helmholtz' "
                             "inner solver (got %r)" % solver.cfg.operator)
        top = solver.levels[-1]
        self.top = top
        cfg = solver._kcfgs[top]
        if cfg.dtype != jnp.float32:
            raise ValueError("RefinedPoisson2D refines an f32 inner "
                             "solver; got %s" % cfg.dtype)
        assert df32_ok_2d(cfg), "rhs/operator outside the 2D df32 gate"
        for nb in range(4):
            if cfg.periodic[nb // 2]:
                continue
            if float(cfg.b_const[nb]) != 0.0:
                raise ValueError(
                    "inner solver must have homogeneous (b=0) BCs; pass "
                    "the true values via bc_values= (face %d has b=%r)"
                    % (nb, cfg.b_const[nb]))
        self.cbs = _cb_pairs(cfg, bc_values)
        self.cfg = cfg
        X, Y = cfg.X, cfg.Y
        self.shape = (Y, X)

    @functools.cached_property
    def _jit_step(self):
        from ..ops.df32 import residual_df32_2d
        cfg = self.cfg

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def f(xhi, xlo, e32, rhi, rlo):
            xhi, xlo = accumulate_df32(xhi, xlo, e32)
            ri = residual_df32_2d(cfg, xhi, xlo, rhi, rlo, cbs=self.cbs,
                                  lam_pair=self.lam_pair)
            return xhi, xlo, ri, jnp.max(jnp.abs(ri))
        return f

    def solve(self, state, rhs_hi, rhs_lo, n_outer: int = 8,
              rtol: float = 0.0):
        """rhs_hi/rhs_lo: [Y, X] f32 pair.  Returns (x_hi, x_lo,
        residual-max history, state)."""
        solver, top = self.solver, self.top
        like = state["rhs"][top]  # carries the GSPMD placement, if any
        to_dev = lambda v: jax.device_put(
            jnp.asarray(v, jnp.float32), like.sharding)
        rhi, rlo = to_dev(rhs_hi), to_dev(rhs_lo)
        xhi = to_dev(jnp.zeros(self.shape, jnp.float32))
        xlo = to_dev(jnp.zeros(self.shape, jnp.float32))
        e32 = to_dev(jnp.zeros(self.shape, jnp.float32))
        norms_dev: List = []
        state = dict(state)
        state["rhs"] = dict(state["rhs"])
        for i in range(n_outer + 1):
            xhi, xlo, ri, mx = self._jit_step(xhi, xlo, e32, rhi, rlo)
            state["rhs"][top] = ri
            norms_dev.append(mx)
            if i == n_outer:
                break
            if rtol and float(mx) <= rtol * float(norms_dev[0]):
                break
            state, _ = solver.fas_fmg(state, lam=self.lam,
                                      need_res=False)
            e32 = state["phi"][top]
        norms = [float(m) for m in norms_dev]
        return xhi, xlo, norms, state


def solve_refined(solver: DenseMGSolver, state, rhs_hi, rhs_lo,
                  n_outer: int = 8, rtol: float = 0.0,
                  nch: Optional[int] = None,
                  bc_values: Optional[List[float]] = None,
                  lam: float = 0.0, eps=None):
    """One-shot convenience wrapper: picks the forest/AMR, sharded,
    2D, or plain refinement driver by solver type.  lam != 0 =
    f64-class Helmholtz (operator='helmholtz' inner solver).  For
    forest/AMR solvers rhs_hi/rhs_lo are {lvl: interior array} dicts
    and the returned solution is {lvl: (x_hi, x_lo)}
    (solve/refine_forest.py)."""
    from .dense2d import Dense2DMGSolver
    from .dense_forest import DenseForestMGSolver
    from .dense_multiforest import (DenseMultiForest2DMGSolver,
                                    DenseMultiForestMGSolver)
    from .dense_shard import ShardedDenseMGSolver
    if isinstance(solver, (DenseMultiForestMGSolver,
                           DenseMultiForest2DMGSolver)):
        # multi-canvas solvers key geometry/state by (lvl, c) unit
        # tuples; the refinement drivers index by int level and would
        # die with an opaque KeyError (advisor round-4 finding)
        raise NotImplementedError(
            "iterative refinement does not support multi-canvas "
            "(sparse) forest solvers; build a single-canvas forest "
            "solver (DenseForestMGSolver) or use the f32 path")
    if isinstance(solver, DenseForestMGSolver):
        from .refine_forest import RefinedForestPoisson
        return RefinedForestPoisson(solver, bc_values=bc_values,
                                    lam=lam, eps=eps).solve(
            state, rhs_hi, rhs_lo, n_outer=n_outer, rtol=rtol)
    if isinstance(solver, ShardedDenseMGSolver):
        return ShardedRefinedPoisson(solver, bc_values=bc_values,
                                     lam=lam).solve(
            state, rhs_hi, rhs_lo, n_outer=n_outer, rtol=rtol)
    from .dense_amr2d import Dense2DAMRMGSolver
    from .dense_forest2d import DenseForest2DMGSolver
    if isinstance(solver, DenseForest2DMGSolver):
        from .refine_forest import RefinedForest2DPoisson
        return RefinedForest2DPoisson(solver, bc_values=bc_values,
                                      lam=lam, eps=eps).solve(
            state, rhs_hi, rhs_lo, n_outer=n_outer, rtol=rtol)
    if isinstance(solver, Dense2DAMRMGSolver):
        # different internal representation (plane-valued rb faces, no
        # ghost segments); the forest solver covers the same trees and
        # carries the 2D refined driver — rebuild transparently (round-4
        # verdict: these used to die on an unrelated df32-gate assert)
        from .refine_forest import RefinedForest2DPoisson
        fs = DenseForest2DMGSolver(solver.tree, solver.cfg)
        for nb, spec in enumerate(solver.bc_spec):
            fs.set_bc(0, spec["type"], spec["value"], nb=nb,
                      fn=spec["fn"])
        return RefinedForest2DPoisson(fs, bc_values=bc_values,
                                      lam=lam, eps=eps).solve(
            fs.allocate(), rhs_hi, rhs_lo, n_outer=n_outer, rtol=rtol)
    if isinstance(solver, Dense2DMGSolver):
        return RefinedPoisson2D(solver, bc_values=bc_values,
                                lam=lam).solve(
            state, rhs_hi, rhs_lo, n_outer=n_outer, rtol=rtol)
    return RefinedPoisson(solver, nch=nch, bc_values=bc_values,
                          lam=lam, eps=eps).solve(
        state, rhs_hi, rhs_lo, n_outer=n_outer, rtol=rtol)
