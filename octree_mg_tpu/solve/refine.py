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
laplacian, exact BC coefficient classes).  bench.py falls back to the
XLA-emulated-f64 chunked residual outside the gate.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops import dense_kernels as dk
from ..ops.df32 import (accumulate_df32, df32_ok, residual_df32,
                        residual_df32_dense)
from .dense import DenseMGSolver, _ISL


class RefinedPoisson:
    """Iteratively-refined solve on the dense solver's top level.

    Jitted programs are built once per instance and reused across
    ``solve`` calls (bench-friendly).
    """

    def __init__(self, solver: DenseMGSolver, nch: Optional[int] = None):
        self.solver = solver
        top = solver.levels[-1]
        self.top = top
        cfg = solver._kcfgs[top]
        if cfg.dtype != jnp.float32:
            raise ValueError("RefinedPoisson refines an f32 inner "
                             "solver (build with MGConfig(dtype="
                             "jnp.float32)); got %s" % cfg.dtype)
        assert df32_ok(cfg), "rhs/operator outside the df32 gate"
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
                                         rhslo_p)[_ISL]
                return jnp.max(jnp.abs(ri)), ri
            if nch == 1:
                ri = residual_df32(self.cfg, xhi, xlo, rhshi_p,
                                   rhslo_p)[_ISL]
                return jnp.max(jnp.abs(ri)), ri

            def chunk(i, carry):
                out, mx = carry
                w = [lax.dynamic_slice_in_dim(a, i * CH, CH + 2 * PZ,
                                              axis=0)
                     for a in (xhi, xlo, rhshi_p, rhslo_p)]
                r = residual_df32(self.ccfg, *w,
                                  z_gates=(i == 0, i == nch - 1))
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
        accumulation of the previous FMG correction, pad sync, the
        df32 residual kernel, and the rhs write — one dispatch, all
        big buffers donated (x_hi, x_lo and the rhs buffer update in
        place; only the Mosaic kernel output is fresh)."""
        solver, top = self.solver, self.top

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def f(xhi, xlo, rhs_buf, e32, rhshi_p, rhslo_p):
            xhi, xlo = accumulate_df32(xhi, xlo, e32)
            xhi = solver._sync_pads(xhi, top)
            xlo = solver._sync_pads(xlo, top)
            ri = residual_df32_dense(self.cfg, xhi, xlo, rhshi_p,
                                     rhslo_p)[_ISL]
            mx = jnp.max(jnp.abs(ri))
            return xhi, xlo, rhs_buf.at[_ISL].set(ri), mx
        return f

    def solve(self, state, rhs_hi, rhs_lo, n_outer: int = 8,
              rtol: float = 0.0):
        """rhs_hi/rhs_lo: interior [Z, Y, X] f32 pair
        (`ops.df32.split_f64` converts a float64 rhs).  Returns
        (x_hi, x_lo interior pair, residual-max history, state)."""
        solver, top = self.solver, self.top
        rhshi_p = self.pad(rhs_hi)
        rhslo_p = self.pad(rhs_lo)
        xhi = jnp.zeros(self.pshape, jnp.float32)
        xlo = jnp.zeros(self.pshape, jnp.float32)
        norms: List[float] = []
        if self.cfg.use_kernel:
            # fused-step loop: 2 dispatches per outer (step + FMG)
            e32 = jnp.zeros(self.pshape, jnp.float32)
            state = dict(state)
            state["rhs"] = dict(state["rhs"])
            for i in range(n_outer + 1):
                xhi, xlo, rhs_new, mx = self._jit_step(
                    xhi, xlo, state["rhs"][top], e32, rhshi_p, rhslo_p)
                state["rhs"][top] = rhs_new
                norms.append(float(mx))
                if i == n_outer or (rtol
                                    and norms[-1] <= rtol * norms[0]):
                    break
                state, _ = solver.fas_fmg(state, need_res=False)
                e32 = state["phi"][top]
            return xhi[_ISL], xlo[_ISL], norms, state
        for _ in range(n_outer):
            mx, r32 = self._jit_residual(xhi, xlo, rhshi_p, rhslo_p)
            norms.append(float(mx))
            if rtol and norms[-1] <= rtol * norms[0]:
                break
            state = solver.set_interior(state, top, "rhs", r32)
            state, _ = solver.fas_fmg(state, need_res=False)
            xhi, xlo = self._jit_accum(xhi, xlo, state["phi"][top])
        mx, _ = self._jit_residual(xhi, xlo, rhshi_p, rhslo_p)
        norms.append(float(mx))
        return xhi[_ISL], xlo[_ISL], norms, state


def solve_refined(solver: DenseMGSolver, state, rhs_hi, rhs_lo,
                  n_outer: int = 8, rtol: float = 0.0,
                  nch: Optional[int] = None):
    """One-shot convenience wrapper around :class:`RefinedPoisson`."""
    return RefinedPoisson(solver, nch=nch).solve(state, rhs_hi, rhs_lo,
                                                 n_outer=n_outer,
                                                 rtol=rtol)
