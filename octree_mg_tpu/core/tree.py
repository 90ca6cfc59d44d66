"""Host-side tree construction for quadtree/octree multigrid hierarchies.

Re-implements the semantics of ``/root/reference/src/m_build_tree.f90``
(automatic coarse-level derivation, neighbor wiring incl. periodic
wraparound, AMR refinement, leaves/parents/refinement-boundary lists) as a
NumPy metadata builder.  This runs once per (re)mesh on the host — the
reference likewise treats tree metadata as replicated and cheap
(``src/m_load_balance.f90:1-3``).  All hot-path data movement derived from
this tree is compiled to static gather/scatter maps (see ``indexmaps.py``).

Ids are 0-based.  Spatial indices ``ix`` are 1-based (reference
convention).  Sentinels: ``NO_BOX=-1`` (refinement boundary),
``PHYS_BOUNDARY=-2``.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from . import topology as topo
from .constants import LVL_HI, LVL_LO, NO_BOX, PHYS_BOUNDARY


@dataclasses.dataclass
class Level:
    """Box-id lists for one refinement level (m_data_structures.f90:194-203).

    The reference keeps both global and ``my_*`` (per-rank) lists; on TPU
    the box axis is sharded, so only the global lists exist and rank
    locality is expressed through sharding specs (see parallel/).
    """

    ids: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0, np.int64))
    leaves: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0, np.int64))
    parents: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0, np.int64))
    ref_bnds: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0, np.int64))


class Tree:
    """Replicated tree metadata (the reference's ``mg_t`` topology subset,
    m_data_structures.f90:250-342, minus payload/comm state)."""

    def __init__(self, ndim: int):
        self.ndim = ndim
        self.box_size: int = -1
        self.highest_lvl: int = -1
        self.lowest_lvl: int = -1
        self.first_normal_lvl: int = -1
        self.n_boxes: int = 0
        self.periodic = np.zeros(ndim, dtype=bool)
        self.r_min = np.zeros(ndim)
        self.coarsest_grid = np.full(ndim, 2, dtype=np.int64)
        self.subtract_mean = False
        # per-level scalars, indexed by lvl via dicts (lvl in LVL_LO..LVL_HI)
        self.box_size_lvl: Dict[int, int] = {}
        self.domain_size_lvl: Dict[int, np.ndarray] = {}
        self.dr: Dict[int, np.ndarray] = {}
        self.lvls: Dict[int, Level] = {}
        # box arrays (capacity-managed)
        self._cap = 0
        self.ix = np.zeros((0, ndim), dtype=np.int64)
        self.lvl = np.zeros(0, dtype=np.int64)
        self.parent = np.zeros(0, dtype=np.int64)
        self.children = np.zeros((0, topo.num_children(ndim)), dtype=np.int64)
        self.neighbors = np.zeros((0, topo.num_neighbors(ndim)), dtype=np.int64)
        self.rank = np.zeros(0, dtype=np.int64)
        self.tree_created = False

    # -- capacity management -------------------------------------------------
    def _reserve(self, n: int) -> None:
        if n <= self._cap:
            return
        new_cap = max(n, max(16, 2 * self._cap))
        D, nc_, nn_ = self.ndim, topo.num_children(self.ndim), topo.num_neighbors(self.ndim)

        def grow(a, shape_tail, fill):
            out = np.full((new_cap, *shape_tail), fill, dtype=a.dtype)
            out[: a.shape[0]] = a
            return out

        self.ix = grow(self.ix, (D,), 0)
        self.lvl = grow(self.lvl, (), 0)
        self.parent = grow(self.parent, (), NO_BOX)
        self.children = grow(self.children, (nc_,), NO_BOX)
        self.neighbors = grow(self.neighbors, (nn_,), NO_BOX)
        self.rank = grow(self.rank, (), 0)
        self._cap = new_cap

    def _new_boxes(self, n: int) -> np.ndarray:
        self._reserve(self.n_boxes + n)
        ids = np.arange(self.n_boxes, self.n_boxes + n, dtype=np.int64)
        self.n_boxes += n
        return ids

    # -- queries --------------------------------------------------------------
    def has_children(self, ids) -> np.ndarray:
        """m_data_structures.f90:430-436 (boxes are fully refined or not)."""
        return self.children[ids, 0] != NO_BOX

    def get_child_offset(self, box_id: int) -> np.ndarray:
        """Offset of a box inside its parent's cell grid.

        m_data_structures.f90:456-467: zero at/below first_normal_lvl
        (single-child coarsening levels), else (ix-1 odd?)*box_size/2.
        """
        if self.lvl[box_id] <= self.first_normal_lvl:
            return np.zeros(self.ndim, dtype=np.int64)
        return ((self.ix[box_id] - 1) & 1) * (self.box_size // 2)

    def highest_uniform_lvl(self) -> int:
        """Finest level that is not partially refined (m_data_structures.f90:469-479)."""
        for lvl in range(self.first_normal_lvl, self.highest_lvl):
            if len(self.lvls[lvl].leaves) != 0 and len(self.lvls[lvl].parents) != 0:
                return lvl
        return self.highest_lvl

    def number_of_unknowns(self) -> int:
        """Total leaf unknowns. Faithful to m_data_structures.f90:482-492
        including its use of box_size**3 regardless of ndim (quirk kept so
        fft-level selection matches the reference in 3D, its only use)."""
        n = 0
        for lvl in range(self.first_normal_lvl, self.highest_lvl + 1):
            n += len(self.lvls[lvl].leaves)
        return n * self.box_size ** 3

    # -- level-local indexing ---------------------------------------------
    def loc_in_level(self, ids: np.ndarray, lvl: int) -> np.ndarray:
        """Positions of box ids inside lvls[lvl].ids."""
        order = self.lvls[lvl].ids
        lookup = {int(b): i for i, b in enumerate(order)}
        return np.array([lookup[int(b)] for b in np.atleast_1d(ids)], dtype=np.int64)


# ---------------------------------------------------------------------------
# construction
# ---------------------------------------------------------------------------

def build_rectangle(ndim: int, domain_size, box_size: int, dx, r_min,
                    periodic=None, smoother_gs_single_cell_guard: bool = False) -> Tree:
    """Build a uniform rectangular forest and derive coarse levels.

    Faithful to ``mg_build_rectangle`` (m_build_tree.f90:18-174): walking
    from level 1 downward, either merge 2^D boxes into one parent of equal
    box_size (when boxes_per_dim is even) or halve the box size keeping a
    single child per parent; stop at odd cell counts / coarsest_grid.

    ``smoother_gs_single_cell_guard`` mirrors the reference's extra stop
    condition for the non-red-black GS smoother (m_build_tree.f90:52-56).
    """
    domain_size = np.asarray(domain_size, dtype=np.int64)
    dx = np.asarray(dx, dtype=np.float64)
    r_min = np.asarray(r_min, dtype=np.float64)
    if periodic is None:
        periodic = np.zeros(ndim, dtype=bool)
    periodic = np.asarray(periodic, dtype=bool)

    if box_size % 2 != 0:
        raise ValueError("box_size should be even")
    if np.any(domain_size % box_size != 0):
        raise ValueError("box_size does not divide domain_size")

    t = Tree(ndim)
    t.box_size = box_size
    t.periodic = periodic
    t.r_min = r_min.copy()
    if bool(np.all(periodic)):
        t.subtract_mean = True

    nx = domain_size.copy()
    t.box_size_lvl[1] = box_size
    t.domain_size_lvl[1] = domain_size.copy()
    t.first_normal_lvl = 1
    t.dr[1] = dx.copy()
    boxes_per_dim: Dict[int, np.ndarray] = {1: domain_size // box_size}

    # derive coarse levels (m_build_tree.f90:51-70)
    lvl = 1
    while lvl > LVL_LO + 1:
        stop = np.any(
            (nx % 2 == 1) | (nx == t.coarsest_grid)
            | (smoother_gs_single_cell_guard
               & (t.box_size_lvl[lvl] == t.coarsest_grid)))
        if stop:
            break
        if np.all((nx // t.box_size_lvl[lvl]) % 2 == 0):
            t.box_size_lvl[lvl - 1] = t.box_size_lvl[lvl]
            boxes_per_dim[lvl - 1] = boxes_per_dim[lvl] // 2
            t.first_normal_lvl = lvl - 1
        else:
            t.box_size_lvl[lvl - 1] = t.box_size_lvl[lvl] // 2
            boxes_per_dim[lvl - 1] = boxes_per_dim[lvl].copy()
        t.dr[lvl - 1] = t.dr[lvl] * 2
        nx = nx // 2
        t.domain_size_lvl[lvl - 1] = nx.copy()
        lvl -= 1

    t.lowest_lvl = lvl
    t.highest_lvl = 1

    for l in range(2, LVL_HI + 1):
        t.dr[l] = t.dr[l - 1] * 0.5
        t.box_size_lvl[l] = box_size
        t.domain_size_lvl[l] = 2 * t.domain_size_lvl[l - 1]

    for l in range(LVL_LO, LVL_HI + 1):
        t.lvls.setdefault(l, Level())

    # create lowest level (m_build_tree.f90:84-140)
    nxl = boxes_per_dim[t.lowest_lvl]
    strides = np.ones(ndim, dtype=np.int64)
    for d in range(1, ndim):
        strides[d] = strides[d - 1] * nxl[d - 1]
    periodic_offset = (nxl - 1) * strides

    n_base = int(np.prod(nxl))
    ids = t._new_boxes(n_base)
    # iterate x fastest (KJI_DO_VEC)
    grids = np.meshgrid(*[np.arange(1, nxl[d] + 1) for d in range(ndim)],
                        indexing="ij")
    # meshgrid 'ij' with dims ordered (x,y,z); flatten with x fastest means
    # order='F' on the (x,y,z)-indexed arrays
    ix_cols = [g.flatten(order="F") for g in grids]
    ix_arr = np.stack(ix_cols, axis=1).astype(np.int64)  # [n_base, D]
    t.ix[ids] = ix_arr
    t.lvl[ids] = t.lowest_lvl
    t.parent[ids] = NO_BOX
    t.children[ids] = NO_BOX
    for d in range(ndim):
        lo = ids - strides[d]
        hi = ids + strides[d]
        at_lo = ix_arr[:, d] == 1
        at_hi = ix_arr[:, d] == nxl[d]
        if periodic[d]:
            lo = np.where(at_lo, ids + periodic_offset[d], lo)
            hi = np.where(at_hi, ids - periodic_offset[d], hi)
        else:
            lo = np.where(at_lo, PHYS_BOUNDARY, lo)
            hi = np.where(at_hi, PHYS_BOUNDARY, hi)
        t.neighbors[ids, 2 * d] = lo
        t.neighbors[ids, 2 * d + 1] = hi

    t.lvls[t.lowest_lvl].ids = ids.copy()

    # add higher levels up to lvl 1 (m_build_tree.f90:143-162)
    for l in range(t.lowest_lvl, 1):
        if t.box_size_lvl[l + 1] == t.box_size_lvl[l]:
            add_children_bulk(t, t.lvls[l].ids)
            set_leaves_parents(t, l)
            set_next_level_ids(t, l)
            set_neighbors_lvl(t, l + 1)
        else:
            n_lvl = len(t.lvls[l].ids)
            for b in t.lvls[l].ids:
                _add_single_child(t, int(b), n_lvl)
            set_leaves_parents(t, l)
            set_next_level_ids(t, l)

    set_leaves_parents(t, 1)
    for l in range(t.lowest_lvl, 2):
        t.lvls[l].ref_bnds = np.zeros(0, dtype=np.int64)

    t.tree_created = True
    return t


def add_children_bulk(t: Tree, parent_ids) -> None:
    """Refine many boxes at once; uses the native C++ kernel when
    available (native/treebuild.cpp), else the NumPy path."""
    parent_ids = np.asarray(parent_ids, dtype=np.int64)
    if len(parent_ids) == 0:
        return
    from .. import native
    t._reserve(t.n_boxes + len(parent_ids) * topo.num_children(t.ndim))
    if native.add_children_bulk(t, parent_ids):
        return
    for b in parent_ids:
        add_children(t, int(b))


def add_children(t: Tree, box_id: int) -> None:
    """Refine one box into 2^D children (m_build_tree.f90:330-367)."""
    D = t.ndim
    nch = topo.num_children(D)
    c_ids = t._new_boxes(nch)
    t.children[box_id] = c_ids
    c_ix_base = 2 * t.ix[box_id] - 1
    lvl = int(t.lvl[box_id]) + 1
    dix = topo.child_dix(D)
    t.rank[c_ids] = t.rank[box_id]
    t.ix[c_ids] = c_ix_base[None, :] + dix
    t.lvl[c_ids] = lvl
    t.parent[c_ids] = box_id
    t.children[c_ids] = NO_BOX
    t.neighbors[c_ids] = NO_BOX
    # inherit physical/periodic-exterior boundaries on outward faces
    for nb in range(topo.num_neighbors(D)):
        if t.neighbors[box_id, nb] < NO_BOX:  # physical boundary sentinel
            adj = topo.child_adj_nb(D, nb)
            t.neighbors[c_ids[adj], nb] = t.neighbors[box_id, nb]


def _add_single_child(t: Tree, box_id: int, n_boxes_lvl: int) -> None:
    """Coarsening level with one child per parent (m_build_tree.f90:369-393).

    Neighbor ids shift by the per-level box count because children are
    created in the same order as their parents.
    """
    c_id = int(t._new_boxes(1)[0])
    t.children[box_id, 0] = c_id
    lvl = int(t.lvl[box_id]) + 1
    t.rank[c_id] = t.rank[box_id]
    t.ix[c_id] = t.ix[box_id]
    t.lvl[c_id] = lvl
    t.parent[c_id] = box_id
    t.children[c_id] = NO_BOX
    nbs = t.neighbors[box_id]
    t.neighbors[c_id] = np.where(nbs == PHYS_BOUNDARY, nbs, nbs + n_boxes_lvl)


def set_leaves_parents(t: Tree, lvl: int) -> None:
    """Split a level's ids into leaves and parents (m_build_tree.f90:258-293)."""
    ids = t.lvls[lvl].ids
    has = t.has_children(ids)
    t.lvls[lvl].parents = ids[has]
    t.lvls[lvl].leaves = ids[~has]


def set_next_level_ids(t: Tree, lvl: int) -> None:
    """Next level ids = children of this level's parents, in parent order
    (m_build_tree.f90:187-216).  This ordering invariant (children of one
    parent are 2^D consecutive entries) is what lets restriction and
    prolongation on TPU be pure reshapes instead of indexed gathers."""
    parents = t.lvls[lvl].parents
    if t.box_size_lvl[lvl + 1] == t.box_size_lvl[lvl]:
        t.lvls[lvl + 1].ids = t.children[parents].reshape(-1).copy()
    else:
        t.lvls[lvl + 1].ids = t.children[parents, 0].copy()


def set_neighbors_lvl(t: Tree, lvl: int) -> None:
    """Wire same-level neighbors through parents (m_build_tree.f90:176-233).
    Native C++ fast path with NumPy fallback."""
    from .. import native
    if native.set_neighbors_lvl(t, t.lvls[lvl].ids):
        return
    for b in t.lvls[lvl].ids:
        _set_neighbs(t, int(b))


def _set_neighbs(t: Tree, box_id: int) -> None:
    for nb in range(topo.num_neighbors(t.ndim)):
        if t.neighbors[box_id, nb] == NO_BOX:
            nb_id = _find_neighb(t, box_id, nb)
            if nb_id > NO_BOX:
                t.neighbors[box_id, nb] = nb_id
                t.neighbors[nb_id, topo.neighb_rev(nb)] = box_id


def _find_neighb(t: Tree, box_id: int, nb: int) -> int:
    """Find neighbor through the parent (m_build_tree.f90:236-255)."""
    p_id = int(t.parent[box_id])
    c_ix = topo.ix_to_ichild(t.ix[box_id])
    d = topo.neighb_dim(nb)
    if topo.child_low(t.ndim, c_ix, d) == topo.neighb_low(nb):
        p_id = int(t.neighbors[p_id, nb])
        if p_id <= NO_BOX:
            return p_id
    return int(t.children[p_id, topo.child_rev(c_ix, d)])


def set_refinement_boundaries(t: Tree, lvl: int) -> None:
    """Coarse-side refinement boundary list (m_build_tree.f90:296-328)."""
    level = t.lvls[lvl]
    if len(level.parents) == 0:
        level.ref_bnds = np.zeros(0, dtype=np.int64)
        return
    from .. import native
    rb = native.ref_bnds(t, level.leaves)
    if rb is not None:
        level.ref_bnds = rb
        return
    out: List[int] = []
    for b in level.leaves:
        for nb in range(topo.num_neighbors(t.ndim)):
            nb_id = t.neighbors[b, nb]
            if nb_id > NO_BOX and t.has_children(nb_id):
                out.append(int(b))
                break
    level.ref_bnds = np.array(out, dtype=np.int64)


def finalize_amr(t: Tree, highest_lvl: int) -> None:
    """Finish an AMR tree built via add_children (cf. test_refinement.f90:191-247)."""
    set_leaves_parents(t, highest_lvl)
    t.highest_lvl = highest_lvl
    for lvl in range(1, highest_lvl + 1):
        set_refinement_boundaries(t, lvl)


def build_amr_centered(ndim: int, n_amr_levels: int, lvl1_size, box_size: int,
                       dx, periodic=None) -> Tree:
    """Nested refinement around the domain center, mirroring the reference
    AMR test's tree (tests/test_refinement.f90:191-247)."""
    lvl1_size = np.asarray(lvl1_size, dtype=np.int64)
    dx = np.asarray(dx, dtype=np.float64)
    domain_len = lvl1_size * dx
    t = build_rectangle(ndim, lvl1_size, box_size, dx, np.zeros(ndim), periodic)
    for lvl in range(1, n_amr_levels):
        r0 = 0.5 * domain_len - domain_len * 0.5 ** (lvl + 1)
        r1 = 0.5 * domain_len + domain_len * 0.5 ** (lvl + 1)
        to_refine = []
        for b in t.lvls[lvl].ids:
            r_min_b = box_r_min(t, int(b))
            center = r_min_b + 0.5 * box_size * t.dr[lvl]
            if np.all((center >= r0) & (center <= r1)):
                to_refine.append(int(b))
        add_children_bulk(t, np.array(to_refine, dtype=np.int64))
        set_leaves_parents(t, lvl)
        set_next_level_ids(t, lvl)
        set_neighbors_lvl(t, lvl + 1)
    finalize_amr(t, n_amr_levels)
    return t


def box_r_min(t: Tree, box_id: int) -> np.ndarray:
    """Minimum coordinate of a box (cf. mg_box_t%r_min, recomputed from ix)."""
    lvl = int(t.lvl[box_id])
    return t.r_min + (t.ix[box_id] - 1) * t.box_size_lvl[lvl] * t.dr[lvl]
