"""Load balancing: rank assignment of boxes across ranks/chips.

Re-implements ``/root/reference/src/m_load_balance.f90``:

* :func:`load_balance_simple` — equal Morton chunks per level (:22-63).
  This is exactly what the box-axis sharding in ``parallel/sharding.py``
  realizes on a TPU mesh, so on uniform grids the rank array is
  informational; it becomes load-bearing for rank-aware orderings.
* :func:`load_balance` — leaves balanced, parents placed on the most
  popular child rank (:71-136).
* :func:`load_balance_parents` — leaf ranks fixed externally (host-AMR
  coupling mode), only parents/coarse assigned (:140-193).

Coarse levels below ``first_normal_lvl`` are all assigned one rank
("single_cpu_lvl", :27-29) for parity; the TPU runtime instead
*replicates* those levels (see parallel/sharding.py).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .tree import Tree, set_leaves_parents, set_next_level_ids, \
    set_refinement_boundaries


def _most_popular(ranks: np.ndarray, work: np.ndarray) -> int:
    """Most frequent rank; ties broken by least existing work
    (m_load_balance.f90:197-221)."""
    best_count, best_work, best = 0, 0, -1
    for r in ranks:
        r = int(r)
        count = int(np.sum(ranks == r))
        w = int(work[r])
        if count > best_count or (count == best_count and w < best_work):
            best_count, best_work, best = count, w, r
    return best


def _chunk_ranks(n: int, n_ranks: int) -> np.ndarray:
    """Equal-chunk assignment over a Morton-ordered list
    (m_load_balance.f90:38-56)."""
    out = np.empty(n, dtype=np.int64)
    work_left, my_work, i_cpu = n, 0, 0
    for i in range(n):
        if (n_ranks - i_cpu - 1) * my_work >= work_left:
            i_cpu += 1
            my_work = 0
        my_work += 1
        work_left -= 1
        out[i] = i_cpu
    return out


def single_cpu_lvl(tree: Tree) -> int:
    return max(tree.first_normal_lvl - 1, tree.lowest_lvl)


def load_balance_simple(tree: Tree, n_ranks: int) -> None:
    """mg_load_balance_simple (m_load_balance.f90:22-63)."""
    scl = single_cpu_lvl(tree)
    for lvl in range(tree.lowest_lvl, scl + 1):
        tree.rank[tree.lvls[lvl].ids] = 0
    for lvl in range(scl + 1, tree.highest_lvl + 1):
        ids = tree.lvls[lvl].ids
        tree.rank[ids] = _chunk_ranks(len(ids), n_ranks)


def load_balance(tree: Tree, n_ranks: int) -> None:
    """mg_load_balance (m_load_balance.f90:71-136): balance leaves with
    equal chunks, parents on the most popular child rank, coarse levels
    on the most popular rank of the first distributed level."""
    scl = single_cpu_lvl(tree)
    for lvl in range(tree.highest_lvl, scl, -1):
        work = np.zeros(n_ranks + 1, dtype=np.int64)
        for pid in tree.lvls[lvl].parents:
            c_ranks = tree.rank[tree.children[int(pid)]]
            r = _most_popular(c_ranks, work)
            tree.rank[int(pid)] = r
            work[r] += 1
        leaves = tree.lvls[lvl].leaves
        work_left = len(leaves)
        i_cpu = 0
        for lid in leaves:
            if (n_ranks - i_cpu - 1) * work[i_cpu] >= \
                    work_left + int(np.sum(work[i_cpu + 1:n_ranks])):
                i_cpu += 1
            work[i_cpu] += 1
            work_left -= 1
            tree.rank[int(lid)] = i_cpu

    if scl < tree.highest_lvl:
        work = np.zeros(n_ranks + 1, dtype=np.int64)
        coarse_rank = _most_popular(tree.rank[tree.lvls[scl + 1].ids], work)
    else:
        coarse_rank = 0
    for lvl in range(tree.lowest_lvl, scl + 1):
        tree.rank[tree.lvls[lvl].ids] = coarse_rank


def load_balance_parents(tree: Tree, n_ranks: int) -> None:
    """mg_load_balance_parents (m_load_balance.f90:140-193): keep the
    externally-set leaf ranks (e.g. copied from a host AMR code), assign
    parents to the most popular child rank."""
    scl = single_cpu_lvl(tree)
    work = np.zeros(n_ranks + 1, dtype=np.int64)
    for lvl in range(tree.highest_lvl - 1, scl, -1):
        work[:] = 0
        for lid in tree.lvls[lvl].leaves:
            work[int(tree.rank[int(lid)])] += 1
        for pid in tree.lvls[lvl].parents:
            c_ranks = tree.rank[tree.children[int(pid)]]
            r = _most_popular(c_ranks, work)
            tree.rank[int(pid)] = r
            work[r] += 1

    if scl < tree.highest_lvl:
        coarse_rank = _most_popular(tree.rank[tree.lvls[scl + 1].ids], work)
    else:
        coarse_rank = 0
    for lvl in range(tree.lowest_lvl, scl + 1):
        tree.rank[tree.lvls[lvl].ids] = coarse_rank

# ---------------------------------------------------------------------------
# placement realization
# ---------------------------------------------------------------------------
#
# On TPU the box axis of each level array is sharded in equal positional
# chunks (parallel/sharding.py), so "where a box lives" is decided by its
# POSITION in the level's id list.  The reference instead writes
# mg%boxes(id)%rank and allocates payload only locally
# (m_load_balance.f90:71-136, m_allocate_storage.f90:68-78).  The bridge:
# re-order every level's id list by the computed rank assignment
# (stable, so Morton order survives within a rank), then equal chunks
# ARE the chosen policy.  The tree builder's transfer invariant — a
# level's ids are the concatenation of its parents' children in order
# (m_build_tree.f90:187-216) — is preserved by sorting the *parents*
# list of each level and regenerating the finer level from it: children
# of one parent move as a group, carrying their parent's rank (which
# load_balance sets to the most popular child rank).


def realize_ranks(tree: Tree) -> None:
    """Re-order every level's id lists so that equal positional chunks
    of the box axis realize ``tree.rank`` (stable within a rank)."""
    t = tree
    for lvl in range(t.lowest_lvl, t.highest_lvl + 1):
        if lvl == t.lowest_lvl:
            ids = t.lvls[lvl].ids
            order = np.argsort(t.rank[ids], kind="stable")
            t.lvls[lvl].ids = ids[order]
        else:
            # regenerate from the rank-sorted coarse parents, keeping
            # the children-consecutive transfer invariant
            set_next_level_ids(t, lvl - 1)
        set_leaves_parents(t, lvl)
        p = t.lvls[lvl].parents
        if len(p):
            t.lvls[lvl].parents = p[np.argsort(t.rank[p], kind="stable")]
    # refinement-boundary lists follow the leaves order; refresh
    for lvl in range(t.lowest_lvl, t.highest_lvl + 1):
        if len(t.lvls[lvl].parents) and len(t.lvls[lvl].leaves):
            set_refinement_boundaries(t, lvl)


def apply_load_balance(tree: Tree, n_ranks: int, policy: str = "balance",
                       leaf_ranks: Optional[dict] = None) -> None:
    """Assign ranks by ``policy`` and realize them as level ordering.

    policy: "simple" (equal Morton chunks, m_load_balance.f90:22-63),
    "balance" (leaves balanced, parents on the most popular child rank,
    :71-136), or "parents" (externally fixed leaf ranks — the AMRVAC
    coupling mode, :140-193; consumed at
    coupling_amrvac/mod_multigrid_coupling.t:310,331).

    leaf_ranks (policy="parents"): {box_id: rank} for every leaf; when
    omitted the current ``tree.rank`` entries of leaves are kept.
    """
    if policy == "simple":
        load_balance_simple(tree, n_ranks)
    elif policy == "balance":
        load_balance(tree, n_ranks)
    elif policy == "parents":
        if leaf_ranks is not None:
            for b, r in leaf_ranks.items():
                tree.rank[int(b)] = int(r)
        load_balance_parents(tree, n_ranks)
    else:
        raise ValueError(f"unknown load-balance policy '{policy}'")
    realize_ranks(tree)
