"""High-level Poisson/Helmholtz solver models.

Convenience drivers over the core MGSolver, covering the reference's test
program workflows (tests/test_uniform_grid.f90, test_refinement.f90) as a
library API: build tree -> set BCs -> set rhs -> solve to tolerance.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.constants import IPHI, IRHS, BCType
from ..core.tree import Tree, build_rectangle
from ..solve.dense import DenseMGSolver, make_solver
from ..solve.multigrid import MGConfig, MGSolver


class PoissonSolver:
    """Solve A(phi) = rhs on a uniform rectangular grid or an AMR tree.

    Uniform trees route to the dense fast paths via ``make_solver``
    (147x the boxed solver in 2D, fused Mosaic kernels in 3D); AMR
    trees and non-GSRB configs use the boxed solver.  ``solve``/``phi``
    return the assembled global interior array for dense solvers and
    the ghost-padded per-box plane for the boxed solver.

    Example::

        ps = PoissonSolver(ndim=3, domain_size=(256,)*3, box_size=16)
        ps.set_dirichlet(0.0)
        phi, info = ps.solve(rhs_fn=lambda x: ...)
    """

    def __init__(self, ndim: int, domain_size: Sequence[int], box_size: int,
                 dr: Optional[Sequence[float]] = None,
                 r_min: Optional[Sequence[float]] = None,
                 periodic: bool | Sequence[bool] = False,
                 operator: str = "laplacian", geometry: str = "cartesian",
                 dtype=jnp.float64, tree: Optional[Tree] = None,
                 **cfg_kwargs):
        domain_size = np.asarray(domain_size, np.int64)
        if dr is None:
            dr = 1.0 / domain_size
        if r_min is None:
            r_min = np.zeros(ndim)
        if isinstance(periodic, bool):
            periodic = [periodic] * ndim
        if tree is None:
            tree = build_rectangle(ndim, domain_size, box_size, dr, r_min,
                                   periodic)
        self.tree = tree
        self.solver = make_solver(tree, MGConfig(operator=operator,
                                                 geometry=geometry,
                                                 dtype=dtype, **cfg_kwargs))
        self.dense = isinstance(self.solver, DenseMGSolver)
        self.state = None

    # -- BCs ------------------------------------------------------------
    def set_dirichlet(self, value=0.0, fn: Optional[Callable] = None):
        self.solver.set_bc(IPHI, BCType.DIRICHLET, value=value, fn=fn)

    def set_neumann(self, value=0.0, fn: Optional[Callable] = None):
        self.solver.set_bc(IPHI, BCType.NEUMANN, value=value, fn=fn)

    def set_continuous(self):
        self.solver.set_bc(IPHI, BCType.CONTINUOUS)

    # -- problem data ---------------------------------------------------
    def _ensure_state(self):
        if self.state is None:
            self.state = self.solver.allocate()
        return self.state

    def set_rhs(self, rhs_fn: Optional[Callable] = None,
                arrays: Optional[dict] = None):
        """rhs from a coordinate function x[...,D]->f (evaluated on every
        level) or explicit per-level arrays (interior-shaped for dense
        solvers, per-box ghost-padded for the boxed solver)."""
        state = self._ensure_state()
        sv = self.solver
        if self.dense:
            for lvl in sv.levels:
                if arrays is not None and lvl in arrays:
                    vals = jnp.asarray(arrays[lvl], sv.cfg.dtype)
                elif rhs_fn is not None:
                    vals = jnp.asarray(rhs_fn(sv.cell_centers(lvl)),
                                       sv.cfg.dtype)
                else:
                    continue
                state = sv.set_interior(state, lvl, "rhs", vals)
            self.state = state
            return
        isl = (slice(None),) + (slice(1, -1),) * sv.ndim
        for lvl in sv.levels:
            if arrays is not None and lvl in arrays:
                vals = jnp.asarray(arrays[lvl], sv.cfg.dtype)
            elif rhs_fn is not None:
                x = sv.cell_centers(lvl)
                vals = jnp.asarray(rhs_fn(x[isl]), sv.cfg.dtype)
            else:
                continue
            plane = state["cc"][lvl][IRHS].at[isl].set(vals)
            state = sv._set_plane(state, lvl, IRHS, plane)
        self.state = state

    # -- solve ----------------------------------------------------------
    def solve(self, lam: float = 0.0, rtol: float = 1e-8,
              atol: float = 0.0, max_cycles: int = 50,
              use_fmg: bool = True) -> Tuple[jnp.ndarray, dict]:
        """Cycle until the residual drops below max(rtol*initial, atol).

        Returns (top-level phi plane, info dict).
        """
        state = self._ensure_state()
        sv = self.solver
        history = []
        res0 = None
        for it in range(max_cycles):
            if use_fmg:
                state, res = sv.fas_fmg(state, lam=lam, have_guess=(it > 0))
            else:
                state, res = sv.fas_vcycle(state, lam=lam)
            r = float(res)
            history.append(r)
            if res0 is None:
                res0 = max(r, 1e-300)
            if r < max(rtol * res0, atol):
                break
        self.state = state
        top = sv.levels[-1]
        info = {"residuals": history, "cycles": len(history)}
        if self.dense:
            return sv.interior(state, top, "phi"), info
        return state["cc"][top][IPHI], info

    def phi(self, lvl: Optional[int] = None) -> np.ndarray:
        lvl = self.solver.levels[-1] if lvl is None else lvl
        if self.dense:
            return np.asarray(self.solver.interior(self.state, lvl, "phi"))
        return np.asarray(self.state["cc"][lvl][IPHI])

    # -- f64-class solve at f32 speed (TPU) -------------------------------
    def solve_refined(self, rhs, n_outer: int = 8, rtol: float = 0.0,
                      bc_values: Optional[Sequence[float]] = None
                      ) -> Tuple[np.ndarray, dict]:
        """Iteratively-refined solve to the f64 accuracy class with f32
        kernels (solve/refine.RefinedPoisson; the reference is f64
        throughout, m_data_structures.f90:8 — this is the TPU rendering
        of that accuracy class, since TPUs have no hardware f64).

        ``rhs``: a float64 interior array [Z, Y, X] (split into an
        exact f32 pair), or an (rhs_hi, rhs_lo) f32 pair.  Requires the
        dense 3D path and the df32 gate (power-of-two 1/dx^2,
        constant-coefficient laplacian — `octree_mg_tpu.df32_ok`).
        Inhomogeneous boundary values go through ``bc_values`` (6 face
        constants); the solver's own BCs must be set with value 0 (the
        inner loop solves the homogeneous error equation).  Returns
        (phi as float64 [Z, Y, X], info with the f64-class
        outer-residual history)."""
        from ..ops.df32 import split_f64
        from ..solve.dense2d import Dense2DMGSolver
        from ..solve.refine import RefinedPoisson, RefinedPoisson2D
        if not (self.dense and hasattr(self.solver, "_kcfgs")):
            raise ValueError("solve_refined requires a dense fast path")
        state = self._ensure_state()
        if isinstance(rhs, tuple):
            rhs_hi, rhs_lo = rhs
        else:
            rhs_hi, rhs_lo = split_f64(np.asarray(rhs, np.float64))
        cls = (RefinedPoisson2D if isinstance(self.solver,
                                              Dense2DMGSolver)
               else RefinedPoisson)
        rp = cls(self.solver, bc_values=bc_values)
        xhi, xlo, norms, state = rp.solve(state, rhs_hi, rhs_lo,
                                          n_outer=n_outer, rtol=rtol)
        self.state = state
        phi = (np.asarray(xhi, np.float64)
               + np.asarray(xlo, np.float64))
        return phi, {"residuals": norms, "cycles": len(norms) - 1}
