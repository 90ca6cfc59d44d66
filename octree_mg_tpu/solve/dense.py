"""Dense-level FAS multigrid solver for uniform (non-AMR) trees.

The TPU-native fast path.  On a uniform tree every level is one dense
rectangular grid; this solver stores each level as
``[Z+2*PZ, Y+2*PY, X]`` per variable (see ops/dense_kernels for the
pad geometry) and runs the cycle
(``mg_fas_vcycle``/``mg_fas_fmg``, /root/reference/src/m_multigrid.f90
:84-243) with:

* a fused Pallas red+black pair kernel per smoothing pair — no
  materialized ghost fills inside the smoother at all (the reference
  fills after every half-sweep, m_multigrid.f90:412-423; the boxed path
  here did too);
* Pallas one-pass operator/residual application;
* restriction/prolongation as dense reshapes (m_restrict.f90:183-194 /
  m_prolong.f90:159-240 numerics);
* a **direct coarse solve**: the coarsest cycled level's operator is
  probed into a dense matrix at setup and eigendecomposed, so the
  coarse solve is two small matmuls instead of the reference's
  launch-latency-bound smoothing loop (m_multigrid.f90:196-209).  The
  reference-faithful smooth-to-tolerance loop remains available as
  ``coarse_solver="smooth"`` and is bitwise-identical to the boxed
  path.

Results are bit-identical to the boxed ``MGSolver`` (same arithmetic
per cell in the same order) — asserted in tests/test_dense.py.

Gating: 3D cartesian operators (laplacian/helmholtz and the
variable-coefficient vlaplacian/vhelmholtz/ahelmholtz families — the
coefficient fields ride the kernels as extra DMA windows with inline
Neumann-zero ghosts) with GSRB on uniform trees; anything else falls
back to the boxed solver (``make_solver``).
"""
from __future__ import annotations

import dataclasses
import functools
import warnings
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import topology as topo
from ..core.constants import BCType
from ..core.tree import Tree
from ..ops import dense_kernels as dk
from ..ops.ghost import bc_coeffs
from .multigrid import MGConfig, _enable_compilation_cache


#: coefficient-field count per operator (m_vlaplacian.f90:17-21,
#: m_ahelmholtz.f90:22-26)
_OP_N_EPS = {"laplacian": 0, "helmholtz": 0,
             "vlaplacian": 1, "vhelmholtz": 1, "ahelmholtz": 3}


def dense_supported(tree: Tree, cfg: MGConfig) -> bool:
    """Whether the dense fast path covers this configuration."""
    return (tree.ndim == 3
            and tree.highest_lvl == 1          # uniform, no AMR
            and cfg.operator in _OP_N_EPS
            and cfg.geometry == "cartesian"
            and cfg.smoother in ("gsrb", "gs"))


def make_solver(tree: Tree, config: Optional[MGConfig] = None):
    """Pick the dense fast path when applicable, else the boxed solver."""
    from .multigrid import MGSolver
    cfg = config or MGConfig()
    if dense_supported(tree, cfg):
        return DenseMGSolver(tree, cfg)
    from .dense2d import Dense2DMGSolver, dense2d_supported
    if dense2d_supported(tree, cfg):
        return Dense2DMGSolver(tree, cfg)
    from .dense_amr import DenseAMRMGSolver, dense_amr_supported
    if dense_amr_supported(tree, cfg):
        return DenseAMRMGSolver(tree, cfg)
    from .dense_amr2d import Dense2DAMRMGSolver, dense_amr2d_supported
    if dense_amr2d_supported(tree, cfg):
        return Dense2DAMRMGSolver(tree, cfg)
    from .dense_forest import DenseForestMGSolver, dense_forest_supported
    if dense_forest_supported(tree, cfg):
        return DenseForestMGSolver(tree, cfg)
    from .dense_forest2d import (DenseForest2DMGSolver,
                                 dense_forest2d_supported)
    if dense_forest2d_supported(tree, cfg):
        return DenseForest2DMGSolver(tree, cfg)
    from .dense_multiforest import (DenseMultiForest2DMGSolver,
                                    DenseMultiForestMGSolver,
                                    dense_multiforest2d_supported,
                                    dense_multiforest_supported)
    if dense_multiforest_supported(tree, cfg):
        return DenseMultiForestMGSolver(tree, cfg)
    if dense_multiforest2d_supported(tree, cfg):
        return DenseMultiForest2DMGSolver(tree, cfg)
    return MGSolver(tree, cfg)


_ISL = (slice(dk.PZ, -dk.PZ), slice(dk.PY, -dk.PY), slice(None))


class DenseMGSolver:
    """FAS multigrid on dense uniform levels.

    State pytree:
        {"phi": {lvl: [Z+2*PZ, Y+2*PY, X]}, "rhs": {...}, "iold": {...},
         "ires": {...}, "bc": {lvl: [6 padded boundary-value planes]}}
    """

    #: finest level whose cell count is <= this bound becomes the direct
    #: coarse-solve level (matrix size bound)
    DIRECT_MAX_CELLS = 512

    #: support predicate checked at construction (2D subclass overrides)
    _supported = staticmethod(dense_supported)

    def __init__(self, tree: Tree, config: Optional[MGConfig] = None):
        _enable_compilation_cache()
        self.tree = tree
        self.cfg = config or MGConfig()
        cfg = self.cfg
        assert self._supported(tree, cfg), "dense path gating violated"
        if cfg.smoother == "gs":
            warnings.warn("lexicographic GS does not vectorize on TPU; "
                          "using red-black GS (the reference's gsrb mode)")
            cfg.smoother = "gsrb"
        self.ndim = tree.ndim
        #: interior slicer into the padded per-level arrays
        self._isl = _ISL
        self.n_vars = 4 + cfg.n_extra_vars
        #: coefficient fields carried by the state as eps0..eps{n-1}
        #: (the boxed path's IVEPS.. extra variables); ahelmholtz takes
        #: one per dimension (m_ahelmholtz.f90:25)
        self.n_eps = min(_OP_N_EPS[cfg.operator], self.ndim)
        self.subtract_mean = tree.subtract_mean and cfg.operator == "laplacian"
        #: "direct" (default) or "smooth" (reference-faithful loop)
        self.coarse_solver = cfg.coarse_solver
        self.interpret = jax.default_backend() == "cpu"

        from ..utils.timers import Timers
        self.timers = Timers()

        self.periodic = tuple(bool(p) for p in tree.periodic)
        self._build_levels()
        self._build_bc()
        self._direct = None  # built lazily after BC spec is final

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------
    def _build_levels(self):
        t = self.tree
        all_lvls = list(range(t.lowest_lvl, t.highest_lvl + 1))
        self.dims = {lvl: tuple(int(v) for v in t.domain_size_lvl[lvl])
                     for lvl in all_lvls}  # (X, Y, Z) per tree dim order
        if self.coarse_solver == "direct":
            # coarsest cycled level = finest level small enough to solve
            # directly; levels below it exist in the tree but are unused
            direct = None
            for lvl in all_lvls:  # coarsest -> finest
                if int(np.prod(self.dims[lvl])) <= self.DIRECT_MAX_CELLS:
                    direct = lvl
            if direct is None:
                direct = all_lvls[0]
            self.levels = [l for l in all_lvls if l >= direct]
        else:
            self.levels = all_lvls

    def _build_bc(self):
        nnb = 2 * self.ndim
        self.bc_spec: List[Dict] = [
            {"type": BCType.DIRICHLET, "value": 0.0, "fn": None}
            for _ in range(nnb)]

    def set_bc(self, iv: int, bc_type: BCType, value: float = 0.0,
               nb: Optional[int] = None, fn: Optional[Callable] = None):
        """Physical BCs for phi (mg_subr_bc analogue; dense path only
        carries BCs for the solution variable)."""
        assert iv == 0, "dense path: BCs apply to phi"
        nbs = range(2 * self.ndim) if nb is None else [nb]
        for b in nbs:
            self.bc_spec[b] = {"type": bc_type, "value": value, "fn": fn}
        self._direct = None
        # BC type/layout feeds the kernel configs and the traced cycle
        # programs — drop the caches so later solves re-specialize
        for cached in ("_kcfgs", "_jit_vcycle", "_jit_fmg",
                       "_jit_fmg_sharded", "_jit_vcycle_sharded"):
            self.__dict__.pop(cached, None)

    @staticmethod
    def _lvl_of(u) -> int:
        """Real tree level of a unit key (int here; the multi-canvas
        forest subclass uses (lvl, c) tuples for component canvases) —
        for per-LEVEL tree-attribute lookups (dr, box_size)."""
        return u if isinstance(u, int) else u[0]

    def _bc_static(self, lvl: int):
        """Per-direction (c0,c1,c2) or None on periodic axes."""
        out = []
        t = self.tree
        dr = t.dr[self._lvl_of(lvl)]
        for nbd in range(2 * self.ndim):
            d = nbd // 2
            if self.periodic[d]:
                out.append(None)
                continue
            spec = self.bc_spec[nbd]
            out.append(bc_coeffs(spec["type"], float(dr[d]), nbd))
        return out

    def _kcfg(self, lvl: int) -> dk.DenseStencilConfig:
        t = self.tree
        idr2 = tuple(float(x) for x in 1.0 / t.dr[lvl] ** 2)
        bc = self._bc_static(lvl)
        bc_full = [c if c is not None else (0.0, 0.0, 0.0) for c in bc]
        # static boundary value per face where it is a constant (the
        # common case; plane-valued faces keep a VMEM-resident plane)
        b_const = []
        for nbd in range(6):
            spec = self.bc_spec[nbd]
            b_const.append(float(spec["value"]) if spec["fn"] is None
                           else None)
        return dk.DenseStencilConfig(
            dims=self.dims[lvl], idr2=idr2, bc=bc_full,
            periodic=self.periodic, dtype=self.cfg.dtype,
            b_const=b_const, interpret=self.interpret,
            n_eps=self.n_eps)

    @functools.cached_property
    def _kcfgs(self):
        return {lvl: self._kcfg(lvl) for lvl in self.levels}

    def _transfer_ok(self, lvl: int) -> bool:
        """Whether the Mosaic transfer kernels cover lvl -> lvl-1."""
        if lvl - 1 not in self.levels:
            return False
        cfg_f = self._kcfgs[lvl]
        cfg_c = self._kcfgs[lvl - 1]
        return (cfg_f.use_kernel
                and dk.transfer_tiles(cfg_c.dims) is not None)

    # ------------------------------------------------------------------
    # state
    # ------------------------------------------------------------------
    @property
    def _eps_keys(self):
        return tuple(f"eps{i}" for i in range(self.n_eps))

    @property
    def _field_keys(self):
        """All per-level field arrays carried by the state pytree."""
        return ("phi", "rhs", "iold", "ires") + self._eps_keys

    def _pshape(self, dims) -> Tuple[int, ...]:
        """Padded per-level array shape for this rank."""
        return dk.padded_shape(dims)

    def _ishape(self, lvl) -> Tuple[int, ...]:
        """Interior array shape (spatial dims reversed, x fastest)."""
        return tuple(int(v) for v in self.dims[lvl][::-1])

    def allocate(self) -> Dict:
        dt = self.cfg.dtype
        state: Dict = {k: {} for k in self._field_keys}
        state["bc"] = {}
        for lvl in self.levels:
            shape = self._pshape(self.dims[lvl])
            for k in ("phi", "rhs", "iold", "ires"):
                state[k][lvl] = jnp.zeros(shape, dt)
            # coefficient fields default to 1 (harmless harmonic means
            # everywhere; the user overwrites via set_coefficient)
            for k in self._eps_keys:
                state[k][lvl] = jnp.ones(shape, dt)
            state["bc"][lvl] = self._eval_bc_planes(lvl)
        return state

    def set_coefficient(self, state, values, d: int = 0,
                        lvl: Optional[int] = None):
        """Write the cell-centered coefficient field (the boxed path's
        IVEPS+d variable) on the finest level — or, on AMR patch trees,
        on the given level's patch interior (coarse-level leaves live
        outside the fine footprint, so every level needs values there);
        follow with prepare_coefficient before solving."""
        assert 0 <= d < self.n_eps
        if lvl is None:
            lvl = self.levels[-1]
        return self.set_interior(state, lvl, f"eps{d}", values)

    def prepare_coefficient(self, state):
        """Restrict the coefficient field(s) down every level (the
        reference expects eps present on all levels,
        m_vhelmholtz.f90:7-10; ghost values are synthesized inline by
        the kernels).  Invalidates the direct coarse factorization —
        it is rebuilt from the new coarse-level eps on the next solve."""
        for i in range(self.n_eps):
            key = f"eps{i}"
            for lvl in range(self.levels[-1], self.levels[0], -1):
                state = self._restrict_into(state, lvl, key)
        self._direct = None
        return state

    def _eval_bc_planes(self, lvl: int) -> List[jnp.ndarray]:
        """Boundary-value planes b per direction, padded to match the
        kernels' halo windows (mg_phi_bc_store analogue)."""
        t = self.tree
        X, Y, Z = self.dims[lvl]
        dr = t.dr[lvl]
        r0 = t.r_min
        dt = self.cfg.dtype
        # cell-center coordinate vectors
        cx = r0[0] + (np.arange(X) + 0.5) * dr[0]
        cy = r0[1] + (np.arange(Y) + 0.5) * dr[1]
        cz = r0[2] + (np.arange(Z) + 0.5) * dr[2]
        hi = [r0[d] + self.dims[lvl][d] * dr[d] for d in range(3)]
        out = []
        for nbd in range(6):
            d = nbd // 2
            if self.periodic[d]:
                out.append(jnp.zeros((1, 1), dt))
                continue
            spec = self.bc_spec[nbd]
            # face coordinates: on-face position along d, centers across
            if d == 0:
                shape = (Z, Y)
                coords = np.zeros(shape + (3,))
                coords[..., 0] = r0[0] if nbd % 2 == 0 else hi[0]
                coords[..., 1] = cy[None, :]
                coords[..., 2] = cz[:, None]
                pad = ((dk.PZ, dk.PZ), (dk.PY, dk.PY))
            elif d == 1:
                shape = (Z, X)
                coords = np.zeros(shape + (3,))
                coords[..., 1] = r0[1] if nbd % 2 == 0 else hi[1]
                coords[..., 0] = cx[None, :]
                coords[..., 2] = cz[:, None]
                pad = ((dk.PZ, dk.PZ), (0, 0))
            else:
                shape = (Y, X)
                coords = np.zeros(shape + (3,))
                coords[..., 2] = r0[2] if nbd % 2 == 0 else hi[2]
                coords[..., 0] = cx[None, :]
                coords[..., 1] = cy[:, None]
                pad = ((dk.PY, dk.PY), (0, 0))
            if spec["fn"] is not None:
                vals = np.asarray(spec["fn"](coords))
            else:
                vals = np.full(shape, spec["value"])
            # pad axes that are periodic with wrapped values: halo pad
            # rows (copies of wrapped interior rows) must synthesize
            # their BC ghosts from the *source* row's boundary value so
            # they evolve in lockstep through fused multi-sweep kernels
            ax_dims = (2, 1) if d == 0 else ((2,) if d == 1 else (1,))
            for ax, dim in enumerate(ax_dims):
                p1 = [(0, 0)] * vals.ndim
                p1[ax] = pad[ax]
                mode = "wrap" if self.periodic[dim] else "constant"
                vals = np.pad(vals, p1, mode=mode)
            out.append(jnp.asarray(vals, dt))
        return out

    def cell_centers(self, lvl: int) -> np.ndarray:
        """Interior cell-center coordinates [Z, Y, X, 3] (host-side)."""
        t = self.tree
        X, Y, Z = self.dims[lvl]
        dr = t.dr[lvl]
        out = np.zeros((Z, Y, X, 3))
        out[..., 0] = (t.r_min[0] + (np.arange(X) + 0.5) * dr[0])[None, None, :]
        out[..., 1] = (t.r_min[1] + (np.arange(Y) + 0.5) * dr[1])[None, :, None]
        out[..., 2] = (t.r_min[2] + (np.arange(Z) + 0.5) * dr[2])[:, None, None]
        return out

    def set_interior(self, state, lvl, key, values):
        """Write interior values [Z, Y, X] of a variable."""
        state = dict(state)
        state[key] = dict(state[key])
        state[key][lvl] = state[key][lvl].at[self._isl].set(values)
        return state

    def interior(self, state, lvl, key):
        return state[key][lvl][self._isl]

    # ------------------------------------------------------------------
    # building blocks
    # ------------------------------------------------------------------
    def _sync_pads(self, arr, lvl):
        """Periodic wrap maintenance of the z/y pad planes (x wraps are
        exact in-kernel rolls).  No-op on non-periodic axes.

        Depth PZ(=5, clamped to the extent) feeds the fused downsweep
        kernel's 5-deep halo; double pairs read 4, single pairs and the
        jnp fallback only the innermost 2."""
        X, Y, Z = self.dims[lvl]
        PZ, PY = dk.PZ, dk.PY
        if self.periodic[2]:
            d = min(PZ, Z)
            arr = arr.at[PZ - d:PZ].set(arr[Z + PZ - d:Z + PZ])
            arr = arr.at[Z + PZ:Z + PZ + d].set(arr[PZ:PZ + d])
        if self.periodic[1]:
            d = min(PZ, Y)
            arr = arr.at[:, PY - d:PY].set(arr[:, Y + PY - d:Y + PY])
            arr = arr.at[:, Y + PY:Y + PY + d].set(arr[:, PY:PY + d])
        return arr

    def _set(self, state, key, lvl, arr):
        state = dict(state)
        state[key] = dict(state[key])
        state[key][lvl] = arr
        return state

    def _planes(self, state, lvl, key="phi"):
        """Boundary-value planes consumed by the kernels at lvl; the
        AMR subclass swaps refinement faces for traced interpolation
        planes of ``key``'s coarse field here."""
        return state["bc"][lvl]

    def _lam(self, lam):
        # the lam-free operators ignore the helmholtz parameter, like
        # the boxed dispatch (kernels.op_apply passes 0.0)
        if self.cfg.operator in ("laplacian", "vlaplacian"):
            lam = 0.0
        return jnp.asarray(lam, self.cfg.dtype)

    def _eps(self, state, lvl):
        """Synced coefficient windows for the kernels (empty for the
        constant-coefficient family)."""
        return tuple(self._sync_pads(state[f"eps{i}"][lvl], lvl)
                     for i in range(self.n_eps))

    def _eps_planes(self, state, lvl):
        """Boundary planes for the coefficient-field ghost synthesis,
        or None for the reference Neumann-zero default (the AMR patch
        solvers substitute coarse-interp planes at refinement faces)."""
        return None

    def _smooth(self, state, lvl, n_cycle, lam):
        """n_cycle GSRB cycles as fused pair kernels — double pairs (4
        half-sweeps, one HBM pass) where the Mosaic path is available
        (smooth_boxes, m_multigrid.f90:404-424)."""
        cfg = self._kcfgs[lvl]
        phi = state["phi"][lvl]
        rhs = self._sync_pads(state["rhs"][lvl], lvl)
        bp = self._planes(state, lvl)
        eps = self._eps(state, lvl)
        epl = self._eps_planes(state, lvl)
        rem = n_cycle
        while rem > 0:
            k = 2 if (rem >= 2 and cfg.use_kernel) else 1
            phi = self._sync_pads(phi, lvl)
            # substeps n=1,2 -> red parity (n+1)%2 = 0
            phi = dk.pair_sweep_dense(cfg, phi, rhs, lam, bp,
                                      red_parity=0, n_pairs=k, eps=eps,
                                      eps_planes=epl)
            rem -= k
        return self._set(state, "phi", lvl, phi)

    def _residual(self, state, lvl, lam):
        cfg = self._kcfgs[lvl]
        phi = self._sync_pads(state["phi"][lvl], lvl)
        ires = dk.stencil_apply_dense(cfg, phi, state["rhs"][lvl], lam,
                                      self._planes(state, lvl), residual=True,
                                      eps=self._eps(state, lvl),
                                      eps_planes=self._eps_planes(state, lvl))
        return self._set(state, "ires", lvl, ires)

    def _apply_op(self, state, lvl, lam):
        cfg = self._kcfgs[lvl]
        phi = self._sync_pads(state["phi"][lvl], lvl)
        return dk.stencil_apply_dense(cfg, phi, state["rhs"][lvl], lam,
                                      self._planes(state, lvl), residual=False,
                                      eps=self._eps(state, lvl),
                                      eps_planes=self._eps_planes(state, lvl))

    def _kernel_apply(self, cfg, phi, rhs, lam, bplanes, eps):
        """Raw operator application on explicit arrays (used by the
        column-probing direct-solve build; 2D subclass redirects)."""
        return dk.stencil_apply_dense(cfg, phi, rhs, lam, bplanes,
                                      residual=False, eps=eps)

    def _max_residual(self, state, lvl, lam):
        state = self._residual(state, lvl, lam)
        return state, jnp.max(jnp.abs(state["ires"][lvl][self._isl]))

    def _restrict_into(self, state, lvl, key):
        """Full-weighting restriction lvl -> lvl-1 (m_restrict.f90:183-194).

        One Mosaic kernel pass on aligned level pairs; smaller levels
        use lax.reduce_window (the TPU pooling path — a [Zc,2,Yc,2,Xc,2]
        reshape would tile-pad the trailing (2,2) dims 256x, and
        lane-strided slice sums measure ~100x slower)."""
        if self._transfer_ok(lvl):
            coarse = dk.restrict_dense(self._kcfgs[lvl], state[key][lvl])
            return self._set(state, key, lvl - 1, coarse)
        fine = state[key][lvl][self._isl]
        win = (2,) * self.ndim
        avg = jax.lax.reduce_window(fine, jnp.zeros((), fine.dtype),
                                    jax.lax.add, win, win,
                                    "VALID") / float(2 ** self.ndim)
        coarse = state[key][lvl - 1].at[self._isl].set(avg)
        return self._set(state, key, lvl - 1, coarse)

    def _update_coarse(self, state, lvl, lam):
        """FAS tau correction (update_coarse, m_multigrid.f90:347-384);
        residual + both restrictions fuse into one no-full-output
        kernel where eligible."""
        if self._fused_transfer_ok(lvl):
            cfg = self._kcfgs[lvl]
            phi = self._sync_pads(state["phi"][lvl], lvl)
            rhs = self._sync_pads(state["rhs"][lvl], lvl)
            phi_c, ires_c = dk.residual_restrict_dense(
                cfg, phi, rhs, lam, self._planes(state, lvl),
                eps=self._eps(state, lvl))
            state = self._set(state, "phi", lvl - 1, phi_c)
            state = self._set(state, "ires", lvl - 1, ires_c)
        else:
            state = self._residual(state, lvl, lam)
            state = self._restrict_into(state, lvl, "phi")
            state = self._restrict_into(state, lvl, "ires")
        return self._finish_coarse_rhs(state, lvl, lam)

    def _finish_coarse_rhs(self, state, lvl, lam):
        """rhs_c = A(restrict phi) + restrict(res); iold_c = phi_c."""
        a_phi = self._apply_op(state, lvl - 1, lam)
        isl = self._isl
        rhs_c = state["rhs"][lvl - 1].at[isl].set(
            a_phi[isl] + state["ires"][lvl - 1][isl])
        state = self._set(state, "rhs", lvl - 1, rhs_c)
        state = self._set(state, "iold", lvl - 1, state["phi"][lvl - 1])
        return state

    def _fused_transfer_ok(self, lvl):
        """Whether the fused residual+restrict kernels cover lvl ->
        lvl-1 (single-chip dense path only; the sharded subclass opts
        out)."""
        return lvl - 1 in self.levels and self._kcfgs[lvl].fused_down_ok

    def _fused_down_ok(self, lvl):
        """Whether the fused downsweep kernel covers [smooth(2) +
        update_coarse] at lvl."""
        return self.cfg.n_cycle_down == 2 and self._fused_transfer_ok(lvl)

    def _down_leg(self, state, lvl, lam):
        """smooth(n_cycle_down) + update_coarse, fused into one kernel
        pass where eligible (bitwise identical to the separate path,
        tests/test_dense.py)."""
        if not self._fused_down_ok(lvl):
            state = self._smooth(state, lvl, self.cfg.n_cycle_down, lam)
            return self._update_coarse(state, lvl, lam)
        cfg = self._kcfgs[lvl]
        phi = self._sync_pads(state["phi"][lvl], lvl)
        rhs = self._sync_pads(state["rhs"][lvl], lvl)
        phi, phi_c, ires_c = dk.downsweep_dense(
            cfg, phi, rhs, lam, self._planes(state, lvl), red_parity=0,
            eps=self._eps(state, lvl))
        state = self._set(state, "phi", lvl, phi)
        state = self._set(state, "phi", lvl - 1, phi_c)
        state = self._set(state, "ires", lvl - 1, ires_c)
        return self._finish_coarse_rhs(state, lvl, lam)

    # -- prolongation ---------------------------------------------------
    def _corr_with_ring(self, state, lvl):
        """(phi - iold) with a 1-ghost ring [Z+2, Y+2, X+2].

        Ring values reproduce the boxed path bitwise: ghost(phi) -
        ghost(iold) with the bc_to_gc formula per face (the c0*b terms
        cancel only mathematically, so both synths are evaluated), and
        periodic wraps of the difference (exact copies either way).
        """
        X, Y, Z = self.dims[lvl]
        phi = state["phi"][lvl]
        iold = state["iold"][lvl]
        bp = state["bc"][lvl]
        corr = jnp.zeros((Z + 2, Y + 2, X + 2), self.cfg.dtype)
        ci = (slice(1, -1),) * 3
        corr = corr.at[ci].set(phi[_ISL] - iold[_ISL])
        bc = self._bc_static(lvl)

        def synth(a, nbd, x1, x2, bplane):
            c0, c1, c2 = bc[nbd]
            g = c0 * bplane + c1 * x1
            if c2 != 0.0:
                g = g + c2 * x2
            return g

        for nbd in range(6):
            d = nbd // 2
            lowside = nbd % 2 == 0
            # slices of the interior arrays along dim d
            ax = 2 - d  # array axis of dim d
            n_d = (X, Y, Z)[d]

            def pick(a, idx):
                """Interior plane of dim d at interior index idx."""
                sl = list(_ISL)
                pad = (dk.PZ, dk.PY, 0)[ax]
                sl[ax] = idx + pad
                return a[tuple(sl)]

            if self.periodic[d]:
                gphi = pick(phi, n_d - 1 if lowside else 0)
                giold = pick(iold, n_d - 1 if lowside else 0)
            else:
                x1p = pick(phi, 0 if lowside else n_d - 1)
                x2p = pick(phi, 1 if lowside else n_d - 2)
                x1i = pick(iold, 0 if lowside else n_d - 1)
                x2i = pick(iold, 1 if lowside else n_d - 2)
                if d == 0:
                    bpl = bp[nbd][dk.PZ:-dk.PZ, dk.PY:-dk.PY]
                elif d == 1:
                    bpl = bp[nbd][dk.PZ:-dk.PZ, :]
                else:
                    bpl = bp[nbd][dk.PY:-dk.PY, :]
                gphi = synth(phi, nbd, x1p, x2p, bpl)
                giold = synth(iold, nbd, x1i, x2i, bpl)
            ring = gphi - giold
            sl: List = [slice(1, -1)] * 3
            sl[ax] = 0 if lowside else -1
            corr = corr.at[tuple(sl)].set(ring)
        return corr

    def _prolong_rect(self, sub):
        """D-linear prolongation of [Zc+2, Yc+2, Xc+2] -> [2Zc, 2Yc, 2Xc]
        (mg_prolong_sparse weights, m_prolong.f90:159-240; same
        arithmetic order as transfer._prolong_block)."""
        w0 = 0.25
        ctr = sub[1:-1, 1:-1, 1:-1]

        def shifted(d, s):
            sl = [slice(1, -1)] * 3
            ax = 2 - d
            sl[ax] = slice(1 + s, sub.shape[ax] - 1 + s)
            return sub[tuple(sl)]

        f0 = w0 * ctr
        lo = [0.25 * shifted(d, -1) for d in range(3)]
        hi = [0.25 * shifted(d, +1) for d in range(3)]
        vals = {0: f0}
        for d in range(3):
            new = {}
            for key, a in vals.items():
                new[key] = a + lo[d]
                new[key | (1 << d)] = a + hi[d]
            vals = new

        def interleave(a, b, d):
            ax = 2 - d
            if ax >= 1:
                # lane/sublane axes: stack+reshape would create a tiled
                # intermediate padding the size-2 dim to a full tile
                # (up to 64x memory blowup at scale); strided scatters
                # keep clean layouts
                shape = list(a.shape)
                shape[ax] *= 2
                out = jnp.zeros(shape, a.dtype)
                lo = [slice(None)] * 3
                hi = [slice(None)] * 3
                lo[ax] = slice(0, None, 2)
                hi[ax] = slice(1, None, 2)
                return out.at[tuple(lo)].set(a).at[tuple(hi)].set(b)
            st = jnp.stack([a, b], axis=1)
            shape = list(a.shape)
            shape[0] *= 2
            return st.reshape(shape)

        def build(d_hi, bits):
            if d_hi < 0:
                return vals[bits]
            return interleave(build(d_hi - 1, bits),
                              build(d_hi - 1, bits | (1 << d_hi)), d_hi)

        return build(2, 0)

    def _correct_children(self, state, lvl_c, lam):
        """phi_fine += prolong(phi_c - iold_c) (correct_children,
        m_multigrid.f90:387-402); fused Mosaic kernel on aligned pairs."""
        lvl = lvl_c + 1
        if self._transfer_ok(lvl):
            phi_c = self._sync_pads(state["phi"][lvl_c], lvl_c)
            iold_c = self._sync_pads(state["iold"][lvl_c], lvl_c)
            phi = dk.prolong_correct_dense(
                self._kcfgs[lvl_c], phi_c, iold_c, state["phi"][lvl],
                self._planes(state, lvl_c))
            return self._set(state, "phi", lvl, phi)
        corr = self._corr_with_ring(state, lvl_c)
        vals = self._prolong_rect(corr)
        phi = state["phi"][lvl].at[self._isl].add(vals)
        return self._set(state, "phi", lvl, phi)

    def _ring_bc(self, lvl, key="phi"):
        """(c0,c1,c2) per face used for ghost-ring synthesis; the AMR
        subclass substitutes refinement-face coefficients.  Coefficient
        fields (eps*) take the reference's Neumann-zero default — ghost
        = own value, i.e. (0, 1, 0) (m_vlaplacian.f90:25-28)."""
        if key.startswith("eps"):
            return [(0.0, 1.0, 0.0)] * (2 * self.ndim)
        return self._bc_static(lvl)

    def _var_with_ring(self, state, lvl, key):
        """One variable with a 1-ghost ring [Z+2, Y+2, X+2]: ring faces
        from the bc_to_gc formula (ghost = c0*b + c1*x1 + c2*x2,
        m_ghost_cells.f90:682-698) or periodic wrap.  On AMR patches the
        refinement faces use (0.5, 0.75, -0.25) with the coarse-interp
        plane (via _ring_bc/_planes)."""
        X, Y, Z = self.dims[lvl]
        arr = state[key][lvl]
        bp = self._planes(state, lvl, key)
        bc = self._ring_bc(lvl, key)
        out = jnp.zeros((Z + 2, Y + 2, X + 2), self.cfg.dtype)
        out = out.at[(slice(1, -1),) * 3].set(arr[_ISL])
        for nbd in range(6):
            d = nbd // 2
            lowside = nbd % 2 == 0
            ax = 2 - d
            n_d = (X, Y, Z)[d]

            def pick(idx):
                sl = list(_ISL)
                pad = (dk.PZ, dk.PY, 0)[ax]
                sl[ax] = idx + pad
                return arr[tuple(sl)]

            if self.periodic[d]:
                ring = pick(n_d - 1 if lowside else 0)
            else:
                x1 = pick(0 if lowside else n_d - 1)
                x2 = pick(1 if lowside else n_d - 2)
                if d == 0:
                    bpl = bp[nbd][dk.PZ:-dk.PZ, dk.PY:-dk.PY]
                elif d == 1:
                    bpl = bp[nbd][dk.PZ:-dk.PZ, :]
                else:
                    bpl = bp[nbd][dk.PY:-dk.PY, :]
                c0, c1, c2 = bc[nbd]
                ring = c0 * bpl + c1 * x1
                if c2 != 0.0:
                    ring = ring + c2 * x2
            sl: List = [slice(1, -1)] * 3
            sl[ax] = 0 if lowside else -1
            out = out.at[tuple(sl)].set(ring)
        return out

    def prolong_set(self, state, lvl_c, key_from="phi", key_to="phi",
                    with_ring: bool = False):
        """Non-additive prolongation (used by free-space seeding).

        with_ring=True synthesizes the coarse ghost ring from the BC
        planes (mg_prolong's use of parent ghost cells); otherwise the
        ring is zero."""
        if with_ring:
            corr = self._var_with_ring(state, lvl_c, key_from)
        else:
            corr = jnp.zeros(tuple(np.array(self.dims[lvl_c])[::-1] + 2),
                             self.cfg.dtype)
            src = state[key_from][lvl_c]
            corr = corr.at[(slice(1, -1),) * 3].set(src[_ISL])
        vals = self._prolong_rect(corr)
        lvl = lvl_c + 1
        arr = state[key_to][lvl].at[_ISL].set(vals)
        return self._set(state, key_to, lvl, arr)

    # -- subtract mean (fully periodic) ---------------------------------
    def _subtract_mean(self, state, key):
        """Leaf mean removal (subtract_mean, m_multigrid.f90:245-294;
        uniform tree -> mean over the finest level)."""
        top = self.levels[-1]
        mean = (jnp.sum(state[key][top][self._isl])
                / float(np.prod(self.dims[top])))
        for lvl in self.levels:
            state = self._set(state, key, lvl, state[key][lvl] - mean)
        return state

    # ------------------------------------------------------------------
    # coarse solve
    # ------------------------------------------------------------------
    def _build_direct(self):
        """Probe the coarsest cycled level's operator into a dense
        matrix (host, float64) and eigendecompose.  BC ghosts are
        eliminated into the matrix; the inhomogeneous b-contribution is
        evaluated at runtime as A(0)."""
        lvl = self.levels[0]
        X, Y, Z = self.dims[lvl]
        m = X * Y * Z
        idr2 = tuple(float(x) for x in 1.0 / self.tree.dr[lvl] ** 2)
        bc = self._bc_static(lvl)
        A = np.zeros((m, m))
        strides = (1, X, X * Y)
        sizes = (X, Y, Z)
        for z in range(Z):
            for y in range(Y):
                for x in range(X):
                    i = (z * Y + y) * X + x
                    pos = (x, y, z)
                    for d in range(3):
                        A[i, i] -= 2.0 * idr2[d]
                        for side, step in ((0, -1), (1, +1)):
                            p = pos[d] + step
                            if 0 <= p < sizes[d]:
                                A[i, i + step * strides[d]] += idr2[d]
                            elif self.periodic[d]:
                                j = i + (step - step * sizes[d]) * strides[d]
                                A[i, j] += idr2[d]
                            else:
                                c0, c1, c2 = bc[2 * d + side]
                                A[i, i] += idr2[d] * c1
                                if c2 != 0.0:
                                    A[i, i - step * strides[d]] += idr2[d] * c2
        return self._eigen_package(A)

    def _eigen_package(self, A):
        """Eigendecompose the probed coarse operator (symmetric fast
        path, general real fallback); None when unusable."""
        if np.allclose(A, A.T, atol=1e-12):
            d_eig, V = np.linalg.eigh(A)
            Vinv = V.T
        else:
            d_c, V_c = np.linalg.eig(A)
            if np.max(np.abs(d_c.imag)) > 1e-8 * np.max(np.abs(d_c.real)):
                return None  # fall back to smoothing
            d_eig = d_c.real
            V = V_c.real
            Vinv = np.linalg.inv(V)
        dt = self.cfg.dtype
        return {"V": jnp.asarray(V, dt), "Vinv": jnp.asarray(Vinv, dt),
                "d": jnp.asarray(d_eig, dt),
                "tiny": jnp.asarray(1e-10 * np.max(np.abs(d_eig)), dt)}

    def _build_direct_probe(self, state):
        """Probe the coarse operator column-by-column through the same
        jnp code path the runtime uses (variable-coefficient operators:
        the matrix depends on the coarse-level eps values in ``state``).
        A(lam) = A0 - lam*I, so probing at lam=0 suffices."""
        lvl = self.levels[0]
        ishape = self._ishape(lvl)
        m = int(np.prod(ishape))
        cfg = self._kcfg(lvl)
        cfg.use_kernel = False  # tiny level; force the jnp path
        dt = self.cfg.dtype
        eps = self._eps(state, lvl)
        bp = state["bc"][lvl]
        zeros = jnp.zeros(self._pshape(self.dims[lvl]), dt)
        lam0 = jnp.asarray(0.0, dt)
        isl = self._isl

        def apply_flat(v):
            phi = self._sync_pads(zeros.at[isl].set(v.reshape(ishape)),
                                  lvl)
            out = self._kernel_apply(cfg, phi, zeros, lam0, bp, eps)
            return out[isl].reshape(-1)

        cols = jax.jit(jax.vmap(apply_flat))(jnp.eye(m, dtype=dt))
        a0 = apply_flat(jnp.zeros(m, dt))  # affine BC contribution
        A = (np.asarray(cols, np.float64).T
             - np.asarray(a0, np.float64)[:, None])
        return self._eigen_package(A)

    def _ensure_direct(self, state=None):
        if self.coarse_solver != "direct" or self._direct is not None:
            return
        if self.n_eps:
            if state is None:
                return  # needs eps values; public entries pass state
            self._direct = self._build_direct_probe(state) or "unavailable"
        else:
            self._direct = self._build_direct() or "unavailable"

    def _coarse_solve(self, state, lam):
        self._ensure_direct()
        if isinstance(self._direct, dict):
            return self._coarse_direct(state, lam)
        return self._coarse_smooth(state, lam)

    def _unit0(self, lvl):
        """State key of a level's (single) canvas — the multi-canvas
        forest subclass maps it to the level's first component unit."""
        return lvl

    def _coarse_of(self, u):
        """Coarse unit under a fine unit: lvl - 1 here; the multi-canvas
        forest subclasses map a component to the coarse component
        containing its image."""
        return u - 1

    def _coarse_direct(self, state, lam):
        """phi = A^{-1}(rhs - A(0)) via the precomputed eigenbasis."""
        lvl = self._unit0(self.levels[0])
        dd = self._direct
        isl = self._isl
        zero = self._set(state, "phi", lvl,
                         jnp.zeros_like(state["phi"][lvl]))
        bterm = self._apply_op(zero, lvl, lam)[isl].reshape(-1)
        r = state["rhs"][lvl][isl].reshape(-1) - bterm
        comp = dd["Vinv"] @ r
        # a null mode of A stays null only while lam leaves it unshifted
        # (singular laplacian: drop the mean component; helmholtz with
        # lam != 0: the shifted spectrum is regular and must be solved)
        denom = dd["d"] - lam
        safe = jnp.abs(denom) > dd["tiny"]
        comp = jnp.where(safe, comp / jnp.where(safe, denom, 1.0), 0.0)
        x = (dd["V"] @ comp).reshape(self._ishape(lvl))
        phi = state["phi"][lvl].at[isl].set(x)
        return self._set(state, "phi", lvl, phi)

    def _coarse_smooth(self, state, lam):
        """Reference-faithful coarse smoothing loop with the rel/abs
        1e-8, <=1000 rule (m_multigrid.f90:196-209)."""
        cfg = self.cfg
        lvl = self.levels[0]
        n_cyc = cfg.n_cycle_up + cfg.n_cycle_down
        state, init_res = self._max_residual(state, lvl, lam)

        def cond(carry):
            st, it, res = carry
            return ((it < cfg.max_coarse_cycles)
                    & (res >= cfg.residual_coarse_rel * init_res)
                    & (res >= cfg.residual_coarse_abs))

        def body(carry):
            st, it, res = carry
            st = self._smooth(st, lvl, n_cyc, lam)
            st, r = self._max_residual(st, lvl, lam)
            return (st, it + 1, r)

        state, _, _ = jax.lax.while_loop(
            cond, body, (state, jnp.array(0),
                         jnp.asarray(jnp.inf, cfg.dtype)))
        return state

    # ------------------------------------------------------------------
    # cycle drivers (mg_fas_vcycle / mg_fas_fmg)
    # ------------------------------------------------------------------
    def _vcycle(self, state, lam, max_lvl, standalone, need_res):
        cfg = self.cfg
        min_lvl = self.levels[0]
        top = self.levels[-1] if max_lvl is None else max_lvl

        if self.subtract_mean and max_lvl is None:
            state = self._subtract_mean(state, "rhs")

        for lvl in range(top, min_lvl, -1):
            state = self._down_leg(state, lvl, lam)

        state = self._coarse_solve(state, lam)

        for lvl in range(min_lvl + 1, top + 1):
            state = self._correct_children(state, lvl - 1, lam)
            state = self._smooth(state, lvl, cfg.n_cycle_up, lam)

        res = jnp.asarray(0.0, cfg.dtype)
        if need_res:
            for lvl in range(min_lvl, top + 1):
                state, r = self._max_residual(state, lvl, lam)
                res = jnp.maximum(res, r)

        if self.subtract_mean:
            state = self._subtract_mean(state, "phi")
        return state, res

    def _a0_zero(self) -> bool:
        """Whether A(0) == 0 exactly on every level — all faces periodic
        or homogeneous constant BCs (ghost(0) = c0*b = 0).  Then the
        zero-guess FMG's initial update_coarse chain is exactly
        rhs_c = restrict(rhs) (ires = rhs - A(0) = rhs, phi_c = 0,
        A(phi_c) = 0), so the down pass needs only the restriction
        kernels — no residual/apply passes (saves ~8% of the 512^3 FMG;
        the refined drivers' homogeneous inner solves always
        qualify)."""
        for lvl in self.levels:
            cfg = self._kcfgs[lvl]
            for nb in range(2 * self.ndim):
                if cfg.periodic[nb // 2]:
                    continue
                b = cfg.b_const[nb]
                if b is None or float(b) != 0.0:
                    return False
        return True

    def _zero_phi(self, state, lvl):
        return self._set(state, "phi", lvl,
                         jnp.zeros_like(state["phi"][lvl]))

    def _save_iold(self, state, lvl):
        return self._set(state, "iold", lvl, state["phi"][lvl])

    def _fmg(self, state, lam, have_guess, need_res):
        min_lvl, top = self.levels[0], self.levels[-1]
        zero_fast = not have_guess and self._a0_zero()
        if not have_guess:
            for lvl in self.levels:
                state = self._zero_phi(state, lvl)
        for lvl in range(top, min_lvl, -1):
            if zero_fast:
                # A(0) = 0: the whole update_coarse collapses to the
                # rhs restriction (values equal the full chain's; the
                # boxed reference path keeps the full computation)
                state = self._restrict_into(state, lvl, "rhs")
                state = self._save_iold(state, lvl - 1)
            else:
                state = self._update_coarse(state, lvl, lam)
        if self.subtract_mean:
            state = self._subtract_mean(state, "rhs")

        res = jnp.asarray(0.0, self.cfg.dtype)
        for lvl in range(min_lvl, top + 1):
            state = self._save_iold(state, lvl)
            if lvl > min_lvl:
                state = self._correct_children(state, lvl - 1, lam)
            last = lvl == top
            state, r = self._vcycle(state, lam, max_lvl=lvl,
                                    standalone=False,
                                    need_res=(need_res and last))
            if last:
                res = r
        return state, res

    # ------------------------------------------------------------------
    # public entry points
    # ------------------------------------------------------------------
    def _donate(self):
        return (0,) if self.cfg.donate else ()

    @functools.cached_property
    def _jit_vcycle(self):
        @functools.partial(jax.jit,
                           static_argnames=("max_lvl", "standalone",
                                            "need_res"),
                           donate_argnums=self._donate())
        def f(state, lam, max_lvl, standalone, need_res):
            return self._vcycle(state, lam, max_lvl, standalone, need_res)
        return f

    @functools.cached_property
    def _jit_fmg(self):
        @functools.partial(jax.jit,
                           static_argnames=("have_guess", "need_res"),
                           donate_argnums=self._donate())
        def f(state, lam, have_guess, need_res):
            return self._fmg(state, lam, have_guess, need_res)
        return f

    def fas_vcycle(self, state, lam=0.0, max_lvl=None, need_res=True):
        self._ensure_direct(state)
        with self.timers.section("total V-cycle"):
            return self._jit_vcycle(state, self._lam(lam), max_lvl=max_lvl,
                                    standalone=True, need_res=need_res)

    def fas_fmg(self, state, lam=0.0, have_guess=False, need_res=True):
        self._ensure_direct(state)
        with self.timers.section("total FMG cycle"):
            return self._jit_fmg(state, self._lam(lam),
                                 have_guess=have_guess, need_res=need_res)

    def apply_operator(self, state, lam=0.0, out_key: str = "ires"):
        lam = self._lam(lam)
        for lvl in self.levels:
            out = self._apply_op(state, lvl, lam)
            state = self._set(state, out_key, lvl, out)
        return state
