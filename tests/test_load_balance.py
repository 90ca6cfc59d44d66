"""Load-balancing policy parity tests (m_load_balance.f90)."""
import numpy as np

from octree_mg_tpu import build_amr_centered, build_rectangle
from octree_mg_tpu.core import load_balance as lb


def test_simple_equal_chunks():
    t = build_rectangle(2, [64, 64], 16, [1 / 64] * 2, [0, 0])
    lb.load_balance_simple(t, 4)
    ids = t.lvls[1].ids  # 16 boxes over 4 ranks
    counts = np.bincount(t.rank[ids], minlength=4)
    np.testing.assert_array_equal(counts, [4, 4, 4, 4])
    # coarse levels on rank 0
    for lvl in range(t.lowest_lvl, lb.single_cpu_lvl(t) + 1):
        assert np.all(t.rank[t.lvls[lvl].ids] == 0)


def test_load_balance_parents_follow_children():
    t = build_amr_centered(2, 3, [64, 64], 16, [1 / 64] * 2)
    lb.load_balance(t, 4)
    # each parent's rank is one of its children's ranks
    for lvl in range(lb.single_cpu_lvl(t) + 1, t.highest_lvl + 1):
        for pid in t.lvls[lvl].parents:
            c_ranks = t.rank[t.children[int(pid)]]
            assert t.rank[int(pid)] in c_ranks
    # leaves are reasonably balanced at the top level
    top_leaves = t.lvls[t.highest_lvl].leaves
    counts = np.bincount(t.rank[top_leaves], minlength=4)
    assert counts.max() - counts.min() <= max(2, len(top_leaves) // 4)


def test_load_balance_parents_mode_keeps_leaf_ranks():
    t = build_amr_centered(2, 3, [64, 64], 16, [1 / 64] * 2)
    rng = np.random.default_rng(0)
    # external (host) leaf ranks
    leaf_ranks = {}
    for lvl in range(1, t.highest_lvl + 1):
        for lid in t.lvls[lvl].leaves:
            r = int(rng.integers(0, 4))
            t.rank[int(lid)] = r
            leaf_ranks[int(lid)] = r
    lb.load_balance_parents(t, 4)
    for lid, r in leaf_ranks.items():
        assert t.rank[lid] == r
    for lvl in range(lb.single_cpu_lvl(t) + 1, t.highest_lvl):
        for pid in t.lvls[lvl].parents:
            assert t.rank[int(pid)] in t.rank[t.children[int(pid)]]
