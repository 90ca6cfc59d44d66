"""Multi-canvas dense-forest multigrid: SPARSE forests on the fast path.

The single-canvas forest solver (solve/dense_forest.py) stores each
refinement level as one dense array over the bounding box of its leaf
footprint and gates on footprint fill >= min_fill — a scattered-patch
refinement (the typical astrophysics AMR shape: a few disjoint blobs in
a big domain) fills <10% of its bounding box and used to fall back to
the boxed solver at ~2.3e7 leaf-unknowns/s, below the Fortran baseline
class.  The reference's ghost machinery is footprint-agnostic
(m_ghost_cells.f90:769-861) — this solver closes that gap:

* Each level's box set is decomposed host-side into CONNECTED
  COMPONENTS (face adjacency, the tree's neighbor table); every
  component becomes its own dense canvas with its own ghost-segment
  plan — exactly the single-canvas machinery per component ("unit").
  Disjoint components have no same-level ghosts between them by
  construction (adjacent boxes share a component), so every missing
  neighbor is a refinement-boundary / physical face, as before.
* The per-unit phases reuse DenseForestMGSolver's methods verbatim —
  they index geometry/state by dict key ("units", always (lvl, c)
  tuples: jax pytree flattening sorts dict keys, so key types must not
  mix), and the ``_coarse_of`` hook maps each fine component to the
  coarse component containing its image (unique: parents of a
  connected box set are connected).  The ``_unit0`` hook points the
  direct coarse solve at the coarsest level's single canvas.

Gating (``dense_multiforest_supported``): the single-canvas gate minus
the whole-level fill requirement, plus per-COMPONENT fill >= min_fill
(a blob's own bounding box is dense even when the level's is not) and
no fully-periodic trees (subtract-mean would need cross-component
plumbing).  Periodic wrap never crosses components: tree.neighbors
stores wrap neighbors as real box ids (core/tree.py), so ``_components``
merges wrap-adjacent boxes into one (domain-spanning) component whose
fill gate then decides.  Bitwise per phase vs the boxed solver
(tests/test_dense_multiforest.py).
"""
from __future__ import annotations

import functools
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from ..core.constants import NO_BOX
from ..core.tree import Tree
from .dense_forest import (DenseForestMGSolver, _build_conflict_plan,
                           _forest_balanced, _LevelGeom)
from .dense_forest2d import (DenseForest2DMGSolver, _has_ring_conflicts,
                             _LevelGeom2D)
from .multigrid import MGConfig


def _components(tree: Tree, lvl: int) -> List[np.ndarray]:
    """Connected components of a level's boxes under face adjacency
    (tree.neighbors), each as a sorted id array."""
    ids = [int(b) for b in tree.lvls[lvl].ids]
    idset = set(ids)
    seen = set()
    out = []
    for b in ids:
        if b in seen:
            continue
        comp = []
        stack = [b]
        seen.add(b)
        while stack:
            cur = stack.pop()
            comp.append(cur)
            for nb in range(2 * tree.ndim):
                q = int(tree.neighbors[cur, nb])
                if q > NO_BOX and q in idset and q not in seen:
                    seen.add(q)
                    stack.append(q)
        out.append(np.array(sorted(comp), np.int64))
    out.sort(key=lambda c: int(c[0]))
    return out


def dense_multiforest_supported(tree: Tree, cfg: MGConfig,
                                min_fill: float = 0.01) -> bool:
    """Whether the multi-canvas forest path covers this configuration
    (intended for trees the single-canvas fill gate rejects).

    min_fill (per COMPONENT bounding box) defaults to 1%: measured on
    chip, a concave snake component at 2.9% fill runs 83x FASTER than
    the boxed fallback (12.9 vs 1074 ms/FMG, identical residuals —
    experiments/probe_snake.py), and the canvas cost scales with bbox
    volume so the break-even sits near 0.04%.  What actually bounds
    low-fill canvases is HBM capacity (4 fields x bbox cells), not
    speed — keep components' bboxes within memory and lower min_fill
    freely."""
    if not (tree.ndim == 3
            and tree.highest_lvl > 1
            and cfg.operator in ("laplacian", "helmholtz", "vlaplacian",
                                 "vhelmholtz", "ahelmholtz")
            and cfg.geometry == "cartesian"
            and cfg.smoother in ("gsrb", "gs")):
        return False
    if tree.subtract_mean:
        return False
    if not _forest_balanced(tree):
        return False
    for lvl in range(tree.lowest_lvl, tree.highest_lvl + 1):
        if len(tree.lvls[lvl].ids) == 0:
            return False
        for ids in _components(tree, lvl):
            g = _LevelGeom(tree, lvl, ids)
            if g.n_cells < min_fill * int(np.prod(g.dims)):
                return False
    return True


class _MultiUnitMixin:
    """Per-component-canvas machinery shared by the 3D and 2D
    multi-canvas forest solvers.

    State keys: ``(lvl, c)`` component tuples — ``units_of(lvl)``
    lists them.  All per-unit machinery (ghost segments, smoother,
    transfers, exports) is the single-canvas parent's, reused verbatim
    through the unit-keyed dicts and the ``_coarse_of`` component map.
    Subclasses set ``_GEOM`` (the canvas-geometry class taking an ids
    subset) and implement ``_build_unit_plans`` (segments +
    conflict bookkeeping in the parent's representation)."""

    _GEOM = None

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------
    def _build_levels(self):
        t = self.tree
        all_lvls = list(range(t.lowest_lvl, t.highest_lvl + 1))
        comps = {lvl: _components(t, lvl) for lvl in all_lvls}
        self.units: Dict[int, List] = {}
        self.geom = {}
        for lvl in all_lvls:
            us = []
            for c, ids in enumerate(comps[lvl]):
                # ALWAYS (lvl, c) tuples: jax pytree flattening sorts
                # dict keys, and int/tuple mixes are not comparable
                u = (lvl, c)
                self.geom[u] = self._GEOM(t, lvl, ids)
                us.append(u)
            self.units[lvl] = us
        self.dims = {u: self.geom[u].dims for us in self.units.values()
                     for u in us}
        self.offsets = {u: self.geom[u].off for us in self.units.values()
                        for u in us}
        #: fine unit -> coarse unit (the component containing its image)
        self._coarse_unit: Dict = {}
        comp_of = {lvl: {} for lvl in all_lvls}
        for lvl in all_lvls:
            for u in self.units[lvl]:
                for b in self.geom[u].ids:
                    comp_of[lvl][int(b)] = u
        for lvl in all_lvls[1:]:
            for u in self.units[lvl]:
                parents = {comp_of[lvl - 1][int(t.parent[int(b)])]
                           for b in self.geom[u].ids}
                assert len(parents) == 1, (
                    "fine component spans coarse components", u, parents)
                self._coarse_unit[u] = parents.pop()
        if self.coarse_solver == "direct":
            direct = None
            for lvl in all_lvls:
                u = self.units[lvl][0]
                if (len(self.units[lvl]) == 1 and self.geom[u].full
                        and int(np.prod(self.dims[u]))
                        <= self.DIRECT_MAX_CELLS):
                    direct = lvl
            if direct is None:
                direct = all_lvls[0]
            self.levels = [l for l in all_lvls if l >= direct]
        else:
            self.levels = all_lvls
        per = tuple(bool(p) for p in t.periodic)
        self._build_unit_plans(per)

    def units_of(self, lvl: int) -> List:
        """State keys of a level's component canvases."""
        return self.units[lvl]

    def _transfer_ok(self, lvl) -> bool:
        return False

    def _fused_transfer_ok(self, lvl) -> bool:
        # forest transfers never fuse (and the base implementation
        # indexes _kcfgs by int level, which multi keys by unit)
        return False

    @functools.cached_property
    def _kcfgs(self):
        return {u: self._kcfg(u)
                for lvl in self.levels for u in self.units[lvl]}

    def _coarse_of(self, u):
        if u in self._coarse_unit:
            return self._coarse_unit[u]
        lvl = self._lvl_of(u)
        assert len(self.units[lvl - 1]) == 1, (u, "no coarse mapping")
        return self.units[lvl - 1][0]

    def _unit0(self, lvl):
        return self.units[lvl][0]

    # ------------------------------------------------------------------
    # state
    # ------------------------------------------------------------------
    def allocate(self) -> Dict:
        dt = self.cfg.dtype
        state: Dict = {k: {} for k in self._field_keys}
        state["bc"] = {}
        for lvl in self.levels:
            for u in self.units[lvl]:
                shape = self._pshape(self.dims[u])
                for k in ("phi", "rhs", "iold", "ires"):
                    state[k][u] = jnp.zeros(shape, dt)
                for k in self._eps_keys:
                    state[k][u] = jnp.ones(shape, dt)
                state["bc"][u] = self._eval_bc_planes(u)
        return state

    # ------------------------------------------------------------------
    # per-level phases = loops over the parent's per-unit phases
    # ------------------------------------------------------------------
    def _zero_phi(self, state, lvl):
        for u in self.units[lvl]:
            state = self._set(state, "phi", u,
                              jnp.zeros_like(state["phi"][u]))
        return state

    def _save_iold(self, state, lvl):
        for u in self.units[lvl]:
            state = self._set(state, "iold", u, state["phi"][u])
        return state

    # NB: each loop delegates to the parent per-unit body; a tuple
    # argument means the call already IS per-unit (the parent's methods
    # cross-call through self, e.g. _max_residual -> _residual)

    def _smooth(self, state, lvl, n_cycle, lam):
        if isinstance(lvl, tuple):
            return super()._smooth(state, lvl, n_cycle, lam)
        for u in self.units[lvl]:
            state = super()._smooth(state, u, n_cycle, lam)
        return state

    def _residual(self, state, lvl, lam):
        if isinstance(lvl, tuple):
            return super()._residual(state, lvl, lam)
        for u in self.units[lvl]:
            state = super()._residual(state, u, lam)
        return state

    def _max_residual(self, state, lvl, lam):
        if isinstance(lvl, tuple):
            return super()._max_residual(state, lvl, lam)
        m = jnp.asarray(0.0, self.cfg.dtype)
        for u in self.units[lvl]:
            state, r = super()._max_residual(state, u, lam)
            m = jnp.maximum(m, r)
        return state, m

    def _restrict_into(self, state, lvl, key):
        if isinstance(lvl, tuple):
            return super()._restrict_into(state, lvl, key)
        for u in self.units[lvl]:
            state = super()._restrict_into(state, u, key)
        return state

    def _finish_coarse_rhs(self, state, lvl, lam):
        """rhs_c = A(phi_c) + restrict(res) on the union of the fine
        components' image rectangles in each coarse unit; iold_c =
        phi_c (parents, m_multigrid.f90:369-383)."""
        by_coarse: Dict = {}
        for u in self.units[lvl]:
            by_coarse.setdefault(self._coarse_of(u), []).append(u)
        for uc, fines in by_coarse.items():
            a_phi = self._apply_op(state, uc, lam)
            rhs_c = state["rhs"][uc]
            for u in fines:
                for clo, chi in self._image_rects(u):
                    sl = self._cansl(clo, chi)
                    rhs_c = rhs_c.at[sl].set(
                        a_phi[sl] + state["ires"][uc][sl])
            state = self._set(state, "rhs", uc, rhs_c)
            state = self._set(state, "iold", uc, state["phi"][uc])
        return state

    def _correct_children(self, state, lvl_c, lam):
        for u in self.units[lvl_c + 1]:
            state = self._correct_unit(state, self._coarse_of(u), u, lam)
        return state

    def _subtract_mean(self, state, key):
        raise NotImplementedError(
            "fully-periodic trees are outside the multi-canvas gate")

    def apply_operator(self, state, lam=0.0, out_key: str = "ires"):
        lam = self._lam(lam)
        for lvl in self.levels:
            for u in self.units[lvl]:
                state = self._set(state, out_key, u,
                                  self._apply_op(state, u, lam))
        return state

    def shard_state(self, state, mesh, min_local: int = 8):
        """Place the multi-canvas forest state on a 1D device mesh
        (GSPMD) — the reference's any-tree-any-rank-count capability
        (m_load_balance.f90:71-136) for SPARSE forests.

        Each unit canvas slab-shards along its slowest axis (z in 3D,
        y in 2D) when the local slab stays >= ``min_local`` with even
        extent — at production sizes that is the full-domain base
        level, where the dominant work lives (docs/PERF.md: component
        canvases add ~launch-floor cost).  Units too small to slab
        (scattered blob canvases, the coarsest cycled level) replicate
        — coarse/smallest agglomeration, as every other GSPMD path
        here.  Sharded execution uses the parent class's overlay
        formulation per unit (rolls of the RAW canvas + ring-ghost
        overlays; rolls of scatter outputs miscompile under GSPMD),
        which indexes all geometry by dict key and therefore works
        unchanged with ``(lvl, c)`` unit keys.  Asserted sharded ==
        single in tests/test_dense_multiforest.py and the
        __graft_entry__ dryrun."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        ndim = self.tree.ndim
        ax = mesh.axis_names[0]
        K = int(np.prod(mesh.devices.shape))
        repl = NamedSharding(mesh, PartitionSpec())
        slab = NamedSharding(
            mesh, PartitionSpec(ax, *([None] * (ndim - 1))))
        self._gspmd_mesh = mesh
        # constraint ops must be IN the trace: drop pre-mesh traces
        for cached in ("_jit_vcycle", "_jit_fmg"):
            self.__dict__.pop(cached, None)
        flags = {}
        for lvl in self.levels:
            for u in self.units[lvl]:
                S = int(self.dims[u][-1])  # z extent (3D) / y (2D)
                flags[u] = (lvl != self.levels[0] and K > 1
                            and S % K == 0 and (S // K) % 2 == 0
                            and S // K >= min_local)
        # per-unit decision, inspectable under both naming conventions
        self.z_sharded = self.y_sharded = flags
        out = {}
        for key, per_u in state.items():
            if key == "bc":
                out[key] = {u: [jax.device_put(v, repl) for v in ps]
                            for u, ps in per_u.items()}
            else:
                out[key] = {u: jax.device_put(
                    a, slab if flags[u] else repl)
                    for u, a in per_u.items()}
        return out


class DenseMultiForestMGSolver(_MultiUnitMixin, DenseForestMGSolver):
    """3D FAS multigrid on per-component dense canvases (see
    :class:`_MultiUnitMixin`)."""

    _supported = staticmethod(dense_multiforest_supported)
    _GEOM = _LevelGeom

    def _build_unit_plans(self, per):
        self.segs = {u: self.geom[u].build_segments(per)
                     for lvl in self.levels for u in self.units[lvl]}
        self.conflicts = {
            u: _build_conflict_plan(self.segs[u], self.dims[u])
            for lvl in self.levels for u in self.units[lvl]}


def dense_multiforest2d_supported(tree: Tree, cfg: MGConfig,
                                  min_fill: float = 0.01) -> bool:
    """2D form of :func:`dense_multiforest_supported` (sparse quadtree
    forests; same component/fill/wrap rules, forest2d's operator and
    geometry gate incl. the cylindrical laplacian)."""
    ok_op = (cfg.operator in ("laplacian", "helmholtz", "vlaplacian",
                              "vhelmholtz", "ahelmholtz")
             and cfg.geometry == "cartesian") \
        or (cfg.operator == "laplacian"
            and cfg.geometry == "cylindrical")
    if not (tree.ndim == 2
            and tree.highest_lvl > 1
            and ok_op
            and cfg.smoother in ("gsrb", "gs")):
        return False
    if tree.subtract_mean:
        return False
    if not _forest_balanced(tree):
        return False
    for lvl in range(tree.lowest_lvl, tree.highest_lvl + 1):
        if len(tree.lvls[lvl].ids) == 0:
            return False
        for ids in _components(tree, lvl):
            g = _LevelGeom2D(tree, lvl, ids)
            if g.n_cells < min_fill * int(np.prod(g.dims)):
                return False
    return True


class DenseMultiForest2DMGSolver(_MultiUnitMixin,
                                 DenseForest2DMGSolver):
    """2D FAS multigrid on per-component dense canvases (see
    :class:`_MultiUnitMixin`)."""

    _supported = staticmethod(dense_multiforest2d_supported)
    _GEOM = _LevelGeom2D

    def _build_unit_plans(self, per):
        self.segs = {u: self.geom[u].build_segments(per)
                     for lvl in self.levels for u in self.units[lvl]}
        self.conflicted = {u: _has_ring_conflicts(self.segs[u])
                           for lvl in self.levels
                           for u in self.units[lvl]}
