"""Tree construction parity tests against hand-derived reference semantics
(m_build_tree.f90)."""
import numpy as np
import pytest

from octree_mg_tpu.core import topology as topo
from octree_mg_tpu.core.constants import NO_BOX, PHYS_BOUNDARY
from octree_mg_tpu.core.tree import (add_children, build_amr_centered,
                                     build_rectangle, box_r_min)


def test_coarse_level_derivation_2d_256():
    # 256^2, box 16 -> boxes/dim 16,8,4,2,1 (merging), then box halving 8,4,2
    t = build_rectangle(2, [256, 256], 16, [1 / 256] * 2, [0, 0])
    assert t.highest_lvl == 1
    assert t.first_normal_lvl == -3
    assert t.lowest_lvl == -6
    sizes = {l: t.box_size_lvl[l] for l in range(t.lowest_lvl, 2)}
    assert sizes == {-6: 2, -5: 4, -4: 8, -3: 16, -2: 16, -1: 16, 0: 16, 1: 16}
    counts = {l: len(t.lvls[l].ids) for l in range(t.lowest_lvl, 2)}
    assert counts == {-6: 1, -5: 1, -4: 1, -3: 1, -2: 4, -1: 16, 0: 64, 1: 256}
    # domain sizes halve per coarser level
    assert tuple(t.domain_size_lvl[-6]) == (2, 2)
    np.testing.assert_allclose(t.dr[-6], 2 ** 7 / 256)


def test_coarse_level_derivation_3d_rectangular():
    # 512x256x256 box 16: boxes/dim (32,16,16)->(16,8,8)->(8,4,4)->(4,2,2)
    # ->(2,1,1): y,z reach 1 -> not all even -> box halving until grid 2
    t = build_rectangle(3, [512, 256, 256], 16, [1 / 512] * 3, [0, 0, 0])
    assert t.box_size_lvl[t.first_normal_lvl] == 16
    l = t.lowest_lvl
    # coarsest grid has min dimension == 2 cells
    assert np.min(t.domain_size_lvl[l]) == 2
    for lvl in range(t.lowest_lvl, 1):
        assert len(t.lvls[lvl].ids) > 0


def test_neighbors_uniform_2d():
    t = build_rectangle(2, [64, 64], 16, [1 / 64] * 2, [0, 0])
    ids = t.lvls[1].ids
    assert len(ids) == 16
    # box at ix (1,1): low faces physical
    b00 = ids[0]
    assert tuple(t.ix[b00]) == (1, 1)
    assert t.neighbors[b00, 0] == PHYS_BOUNDARY
    assert t.neighbors[b00, 2] == PHYS_BOUNDARY
    nbx = t.neighbors[b00, 1]
    assert tuple(t.ix[nbx]) == (2, 1)
    nby = t.neighbors[b00, 3]
    assert tuple(t.ix[nby]) == (1, 2)
    # neighbor reciprocity
    for b in ids:
        for nb in range(4):
            o = t.neighbors[b, nb]
            if o > NO_BOX:
                assert t.neighbors[o, topo.neighb_rev(nb)] == b


def test_periodic_wraparound():
    t = build_rectangle(2, [32, 32], 16, [1 / 32] * 2, [0, 0], periodic=[1, 1])
    assert t.subtract_mean
    lvl = t.first_normal_lvl  # 2x2 boxes at some level... use level 1
    ids = t.lvls[1].ids
    b00 = ids[0]
    lo = t.neighbors[b00, 0]
    assert lo > NO_BOX and tuple(t.ix[lo]) == (2, 1)


def test_r_min_consistency():
    t = build_rectangle(2, [64, 32], 8, [1 / 64, 1 / 32], [0.5, -0.25])
    for lvl in range(t.lowest_lvl, 2):
        for b in t.lvls[lvl].ids:
            r = box_r_min(t, int(b))
            assert np.all(r >= np.array([0.5, -0.25]) - 1e-12)
    # box (2,1) at level 1 starts one box-length in
    ids = t.lvls[1].ids
    b = [int(x) for x in ids if tuple(t.ix[int(x)]) == (2, 1)][0]
    np.testing.assert_allclose(box_r_min(t, b), [0.5 + 8 / 64, -0.25])


def test_amr_tree_structure():
    t = build_amr_centered(2, 3, [64, 64], 16, [1 / 64] * 2)
    assert t.highest_lvl == 3
    # center 2x2 boxes refined at lvl1 -> 16 children at lvl2, center 4 of
    # those refined -> lvl3
    assert len(t.lvls[1].parents) == 4
    assert len(t.lvls[2].ids) == 16
    assert len(t.lvls[2].parents) == 4
    assert len(t.lvls[3].ids) == 16
    # refinement boundaries exist on lvl1 and lvl2
    assert len(t.lvls[1].ref_bnds) > 0
    assert len(t.lvls[2].ref_bnds) > 0
    # children contiguity invariant (set_next_level_ids)
    par = t.lvls[1].parents
    np.testing.assert_array_equal(t.lvls[2].ids, t.children[par].reshape(-1))


def test_child_topology_tables():
    assert topo.ix_to_ichild(np.array([1, 1])) == 0
    assert topo.ix_to_ichild(np.array([2, 1])) == 1
    assert topo.ix_to_ichild(np.array([1, 2])) == 2
    assert topo.ix_to_ichild(np.array([2, 2])) == 3
    np.testing.assert_array_equal(topo.child_adj_nb(2, 0), [0, 2])
    np.testing.assert_array_equal(topo.child_adj_nb(3, 5), [4, 5, 6, 7])
