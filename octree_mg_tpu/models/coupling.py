"""Host-application coupling: mirror an external AMR forest into the
multigrid tree and move fields in/out.

TPU-native equivalent of the reference's AMRVAC coupling layer
(``/root/reference/coupling_amrvac/mod_multigrid_coupling.t``):

* :func:`tree_from_forest` — build a multigrid tree that contains an
  external quadtree/octree forest plus the automatically derived coarser
  levels (``mg_tree_from_amrvac`` :272-351).  The external forest is
  described purely by the refinement decisions (which boxes are refined),
  so any host AMR code can drive it.
* :class:`HostCoupling` — field transfer between per-leaf host arrays and
  the SoA level arrays, including the one-ghost-layer variants
  (``mg_copy_to_tree`` :133-171, ``mg_copy_from_tree{,_gc}`` :206-267),
  boundary-condition translation (``mg_copy_boundary_conditions``
  :88-113), and tree rebuild on regrid (``mg_update_refinement``
  :116-130).
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..core import tree as tree_mod
from ..core.constants import IOLD, IPHI, IRES, IRHS, IVEPS, BCType
from ..core.tree import Tree
from ..solve.dense import DenseMGSolver, make_solver
from ..solve.multigrid import MGConfig


def _dense_key(solver, iv: int) -> str:
    """Boxed variable index -> dense state key."""
    base = {IPHI: "phi", IRHS: "rhs", IOLD: "iold", IRES: "ires"}
    if iv in base:
        return base[iv]
    d = iv - IVEPS
    if 0 <= d < solver.n_eps:
        return f"eps{d}"
    raise ValueError(f"variable {iv} not carried by the dense solver")

#: host boundary-type names -> multigrid BCs (mod_multigrid_coupling.t:95-110)
BC_TRANSLATION = {
    "symm": (BCType.NEUMANN, 0.0),
    "asymm": (BCType.DIRICHLET, 0.0),
    "cont": (BCType.CONTINUOUS, 0.0),
}


def tree_from_forest(ndim: int, domain_size, box_size: int, dx, r_min,
                     periodic, refine_fn: Callable[[int, np.ndarray], bool],
                     max_lvl: int) -> Tree:
    """Build a tree mirroring an external forest.

    ``refine_fn(lvl, ix)`` must return True when the external forest
    refines the box with 1-based spatial index ``ix`` at level ``lvl``
    (this replaces the reference's direct pnode pointer walk, which is a
    host-data-structure detail).
    """
    t = tree_mod.build_rectangle(ndim, domain_size, box_size, dx, r_min,
                                 periodic)
    for lvl in range(1, max_lvl + 1):
        to_refine = [int(b) for b in t.lvls[lvl].ids
                     if refine_fn(lvl, t.ix[int(b)])]
        tree_mod.add_children_bulk(t, np.array(to_refine, dtype=np.int64))
        tree_mod.set_leaves_parents(t, lvl)
        if lvl < max_lvl:
            tree_mod.set_next_level_ids(t, lvl)
            tree_mod.set_neighbors_lvl(t, lvl + 1)
    tree_mod.finalize_amr(t, max_lvl)
    return t


class HostCoupling:
    """Bind a host AMR application to a multigrid solver."""

    def __init__(self, ndim: int, domain_size, box_size: int, dx, r_min,
                 periodic, config: Optional[MGConfig] = None):
        self.ndim = ndim
        self.domain_size = np.asarray(domain_size, np.int64)
        self.box_size = box_size
        self.dx = np.asarray(dx, float)
        self.r_min = np.asarray(r_min, float)
        self.periodic = periodic
        self.config = config or MGConfig()
        self.solver = None
        self.state = None
        self.dense = False
        self._bc_calls: List[tuple] = []
        self._leaf_index: Dict[Tuple[int, Tuple[int, ...]], Tuple[int, int]] = {}
        self._leaf_unit: Dict = {}

    # -- tree lifecycle -------------------------------------------------
    def update_refinement(self, refine_fn, max_lvl: int,
                          changed: bool = True,
                          leaf_ranks=None, n_ranks: Optional[int] = None):
        """(Re)build the tree after a host regrid
        (mg_update_refinement, mod_multigrid_coupling.t:116-130).

        The solver is re-picked by ``make_solver`` each rebuild —
        rectangular forests get the dense fast paths (17x+ the boxed
        solver on TPU), anything else the boxed solver; recorded BC
        settings are replayed onto the new solver.

        leaf_ranks: optional {(lvl, ix_tuple): host_rank} fixing each
        leaf's placement (the reference copies pnode%ipe,
        mod_multigrid_coupling.t:310,331) — parents are then assigned by
        mg_load_balance_parents semantics and the level id lists are
        re-ordered so equal box-axis chunks over an ``n_ranks``-device
        mesh realize those ranks (load_balance.apply_load_balance).
        Placement ordering only matters to the boxed (sharded) solver;
        the dense fast paths shard geometrically."""
        if self.solver is not None and not changed:
            return
        tree = tree_from_forest(self.ndim, self.domain_size, self.box_size,
                                self.dx, self.r_min, self.periodic,
                                refine_fn, max_lvl)
        if leaf_ranks is not None:
            from ..core.load_balance import apply_load_balance
            by_id = {}
            for lvl in range(1, tree.highest_lvl + 1):
                for b in tree.lvls[lvl].leaves:
                    key = (lvl, tuple(int(v) for v in tree.ix[int(b)]))
                    if key in leaf_ranks:
                        by_id[int(b)] = int(leaf_ranks[key])
            if n_ranks is None:
                n_ranks = 1 + max(by_id.values(), default=0)
            apply_load_balance(tree, n_ranks, policy="parents",
                               leaf_ranks=by_id)
        self.solver = make_solver(tree, self.config)
        self.dense = isinstance(self.solver, DenseMGSolver)
        for iv, bc_type, value, nb, fn in self._bc_calls:
            if self.dense and iv != IPHI:
                continue  # dense paths carry BCs for phi only
            self.solver.set_bc(iv, bc_type, value=value, nb=nb, fn=fn)
        self.state = self.solver.allocate()
        self._build_leaf_index()

    def set_bc(self, iv: int, bc_type: BCType, value: float = 0.0,
               nb: Optional[int] = None, fn: Optional[Callable] = None):
        """Set (and record, for replay across regrids) a physical BC."""
        self._bc_calls.append((iv, bc_type, value, nb, fn))
        if self.solver is not None and not (self.dense and iv != IPHI):
            self.solver.set_bc(iv, bc_type, value=value, nb=nb, fn=fn)

    def _build_leaf_index(self):
        """(lvl, ix) -> (lvl, loc) lookup for leaves, the analogue of the
        reference's igrid <-> node id links.  Multi-canvas (sparse
        forest) solvers additionally get a leaf -> unit map so field
        copies address the right component canvas."""
        self._leaf_index.clear()
        t = self.solver.tree
        for lvl in [l for l in self.solver.levels if l >= 1]:
            locs = self.solver.tree.loc_in_level(t.lvls[lvl].leaves, lvl) \
                if len(t.lvls[lvl].leaves) else []
            for b, loc in zip(t.lvls[lvl].leaves, locs):
                self._leaf_index[(lvl, tuple(t.ix[int(b)]))] = (lvl, int(loc))
        self._leaf_unit = {}
        if self.dense and hasattr(self.solver, "units_of"):
            id2unit = {}
            for lvl in self.solver.levels:
                for u in self.solver.units_of(lvl):
                    for b in self.solver.geom[u].ids:
                        id2unit[int(b)] = u
            for lvl in [l for l in self.solver.levels if l >= 1]:
                for b in t.lvls[lvl].leaves:
                    self._leaf_unit[(lvl, tuple(t.ix[int(b)]))] = \
                        id2unit[int(b)]

    def _units_of(self, lvl):
        """State keys of a level's canvases (just ``lvl`` unless the
        solver is multi-canvas)."""
        us = getattr(self.solver, "units_of", None)
        return us(lvl) if us is not None else [lvl]

    def _unit_of(self, lvl, ix):
        """Canvas key holding a given leaf."""
        return self._leaf_unit.get((lvl, tuple(np.asarray(ix))), lvl)

    def set_boundary_conditions(self, type_names: Sequence[str],
                                iv: int = IPHI):
        """Translate host boundary names per direction
        (mg_copy_boundary_conditions)."""
        for nb, name in enumerate(type_names):
            if name == "periodic":
                continue
            if name not in BC_TRANSLATION:
                raise ValueError(
                    f"'{name}' is not a standard boundary; set a "
                    "user-defined method via coupling.set_bc")
            bc_type, value = BC_TRANSLATION[name]
            self.set_bc(iv, bc_type, value=value, nb=nb)
        self.state = self.solver.allocate() if self.state is None else self.state

    # -- field transfer -------------------------------------------------
    def _leaf_start(self, unit, ix) -> np.ndarray:
        """Canvas-local cell start of a leaf box (x, y, z order);
        ``unit`` is a level int or a multi-canvas (lvl, c) key."""
        nc = self.solver.tree.box_size_lvl[self.solver._lvl_of(unit)]
        off = (self.solver.offsets[unit]
               if hasattr(self.solver, "offsets") else 0)
        return (np.asarray(ix) - 1) * nc - off

    def copy_to_tree(self, leaf_fields: Dict, iv: int,
                     restrict: bool = False, restrict_gc: bool = False):
        """Copy per-leaf host arrays (incl. one ghost layer,
        [(nc+2)^D]) into tree variable ``iv`` (mg_copy_to_tree)."""
        state = self.state
        if self.dense:
            sv = self.solver
            key = _dense_key(sv, iv)
            per_unit: Dict = {}
            for (lvl, ix), arr in leaf_fields.items():
                u = self._unit_of(lvl, ix)
                per_unit.setdefault(u, []).append((ix, np.asarray(arr)))
            for u, items in per_unit.items():
                nc = sv.tree.box_size_lvl[sv._lvl_of(u)]
                cur = np.array(sv.interior(state, u, key))
                for ix, a in items:
                    if a.shape[-1] == nc + 2:  # strip the host ghost layer
                        a = a[(slice(1, -1),) * self.ndim]
                    s = self._leaf_start(u, ix)
                    sl = tuple(slice(int(s[d]), int(s[d]) + nc)
                               for d in reversed(range(self.ndim)))
                    cur[sl] = a
                state = sv.set_interior(state, u, key,
                                        jnp.asarray(cur, sv.cfg.dtype))
            if restrict:
                for lvl in range(sv.levels[-1], sv.levels[0], -1):
                    state = sv._restrict_into(state, lvl, key)
                # restrict_gc is a no-op: dense ghosts are synthesized
                # inline at the cells that read them
            self.state = state
            return
        per_level: Dict[int, Tuple[List[int], List[np.ndarray]]] = {}
        for (lvl, ix), arr in leaf_fields.items():
            l2, loc = self._leaf_index[(lvl, tuple(ix))]
            per_level.setdefault(l2, ([], []))
            per_level[l2][0].append(loc)
            per_level[l2][1].append(np.asarray(arr))
        for lvl, (locs, arrs) in per_level.items():
            plane = state["cc"][lvl][iv]
            plane = plane.at[jnp.asarray(np.array(locs))].set(
                jnp.asarray(np.stack(arrs), self.solver.cfg.dtype))
            state = self.solver.set_plane(state, lvl, iv, plane)
        if restrict:
            state = self.solver.restrict(state, iv)
            if restrict_gc:
                state = self.solver.fill_ghost(state, iv)
        self.state = state

    def copy_from_tree(self, iv: int, with_ghosts: bool = False) -> Dict:
        """Per-leaf arrays from tree variable ``iv``
        (mg_copy_from_tree / mg_copy_from_tree_gc; corner ghost cells are
        not meaningful)."""
        out = {}
        if self.dense:
            sv = self.solver
            key = _dense_key(sv, iv)
            ringed: Dict = {}
            # forest solvers expose per-axis rings: at concave-corner
            # conflict cells the exported face-d ghost must carry the
            # axis-d value (per-box ghost storage semantics)
            axes_fn = getattr(sv, "_var_with_ring_axes", None)
            ringed_ax: Dict = {}
            for lvl in sv.levels:
                if lvl < 1:
                    continue
                for u in self._units_of(lvl):
                    if with_ghosts:
                        if axes_fn is not None:
                            ringed_ax[u] = [
                                np.asarray(v)
                                for v in axes_fn(self.state, u, key)]
                            ringed[u] = ringed_ax[u][0]
                        else:
                            ringed_ax[u] = None
                            ringed[u] = np.asarray(
                                sv._var_with_ring(self.state, u, key))
                    else:
                        ringed[u] = np.asarray(sv.interior(self.state,
                                                           u, key))
            for (lvl, ix) in self._leaf_index:
                u = self._unit_of(lvl, ix)
                nc = sv.tree.box_size_lvl[lvl]
                s = self._leaf_start(u, np.asarray(ix))
                if with_ghosts:
                    sl = tuple(slice(int(s[d]), int(s[d]) + nc + 2)
                               for d in reversed(range(self.ndim)))
                else:
                    sl = tuple(slice(int(s[d]), int(s[d]) + nc)
                               for d in reversed(range(self.ndim)))
                w = ringed[u][sl]
                if with_ghosts and ringed_ax.get(u) is not None:
                    w = w.copy()
                    for d in range(self.ndim):
                        wa = ringed_ax[u][d][sl]
                        ax = self.ndim - 1 - d
                        for side in (0, -1):
                            fsl = [slice(None)] * self.ndim
                            fsl[ax] = side
                            w[tuple(fsl)] = wa[tuple(fsl)]
                out[(lvl, tuple(np.asarray(ix)))] = w
            return out
        for (lvl, ix), (l2, loc) in self._leaf_index.items():
            arr = np.asarray(self.state["cc"][l2][iv][loc])
            if not with_ghosts:
                arr = arr[(slice(1, -1),) * self.ndim]
            out[(lvl, ix)] = arr
        return out
