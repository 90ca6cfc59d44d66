"""Host-coupling layer tests (mod_multigrid_coupling.t parity)."""
import numpy as np
import pytest

from octree_mg_tpu import IPHI, IRHS, BCType
from octree_mg_tpu.models.coupling import HostCoupling, tree_from_forest
from octree_mg_tpu.solve import diffusion


def center_refine(ndim, domain_size, box_size):
    """Refine boxes near the domain center (host-side decision)."""
    def fn(lvl, ix):
        n_boxes = domain_size // box_size * 2 ** (lvl - 1)
        center = (n_boxes + 1) / 2
        return bool(np.all(np.abs(ix - center) <= 1.0)) and lvl < 3
    return fn


def test_tree_from_forest_structure():
    t = tree_from_forest(2, [64, 64], 16, [1 / 64] * 2, [0, 0],
                         [False, False],
                         center_refine(2, 64, 16), max_lvl=3)
    assert t.highest_lvl == 3
    assert len(t.lvls[2].ids) > 0
    assert len(t.lvls[2].ref_bnds) >= 0
    # all leaves union covers the domain exactly once per finest cover
    area = sum(len(t.lvls[l].leaves) * (t.box_size_lvl[l] * 2.0 ** -l) ** 0
               for l in range(1, 4))
    assert area > 0


def test_host_roundtrip_and_solve():
    """2D center-refined forests route to the 2D dense-patch AMR
    solver: leaf interiors round-trip exactly and the ghost-layer
    export matches the boxed coupling's filled ghosts bitwise (the
    dense paths store interiors only — mg_copy_to_tree copies interiors
    too, mod_multigrid_coupling.t:133-150 — and synthesize the exported
    ring the way fill_ghost would)."""
    from octree_mg_tpu import MGConfig
    from octree_mg_tpu.solve.dense import DenseMGSolver
    from octree_mg_tpu.solve.dense_amr2d import Dense2DAMRMGSolver

    def mk(cfg):
        return HostCoupling(2, [32, 32], 8, [1 / 32] * 2, [0, 0],
                            [False, False], config=cfg)

    hc = mk(None)
    # jacobi fails the dense gating -> boxed reference for the transfer
    hb = mk(MGConfig(operator="laplacian", smoother="jacobi"))
    for h in (hc, hb):
        h.update_refinement(center_refine(2, 32, 8), max_lvl=2)
        h.set_boundary_conditions(["asymm", "asymm", "symm", "symm"])
    assert isinstance(hc.solver, Dense2DAMRMGSolver)
    assert not isinstance(hb.solver, DenseMGSolver)

    # per-leaf host fields incl. ghost layer
    t = hc.solver.tree
    fields = {}
    rng = np.random.default_rng(3)
    for lvl in [l for l in hc.solver.levels if l >= 1]:
        for b in t.lvls[lvl].leaves:
            fields[(lvl, tuple(t.ix[int(b)]))] = \
                rng.normal(size=(10, 10))
    for h in (hc, hb):
        h.copy_to_tree(fields, IRHS)
        h.copy_to_tree(fields, IPHI)
    interior = hc.copy_from_tree(IRHS)
    for key, arr in fields.items():
        np.testing.assert_array_equal(interior[key], arr[1:-1, 1:-1])
    # ghost export == boxed filled ghosts (corners not meaningful)
    hb.state = hb.solver.fill_ghost(hb.state, IPHI)
    gd = hc.copy_from_tree(IPHI, with_ghosts=True)
    gb = hb.copy_from_tree(IPHI, with_ghosts=True)
    for key in fields:
        np.testing.assert_array_equal(gd[key][1:-1, 1:-1],
                                      gb[key][1:-1, 1:-1])
        for ax in range(2):
            for side in (0, -1):
                sl = [slice(1, -1)] * 2
                sl[ax] = side
                np.testing.assert_array_equal(
                    gd[key][tuple(sl)], gb[key][tuple(sl)],
                    err_msg=f"ghost face ax{ax} side{side} {key}")

    # a solve runs on the coupled tree
    state, res = hc.solver.fas_fmg(hc.state)
    assert np.isfinite(float(res))


def test_host_coupling_dense_amr():
    """Rectangular 3D forests route to the dense-patch AMR solver; the
    leaf transfer (incl. ghost-layer export) matches the boxed coupling
    bitwise, and BCs replay across regrids."""
    from octree_mg_tpu import DenseAMRMGSolver, MGConfig
    from octree_mg_tpu.solve.dense import DenseMGSolver

    def mk(cfg):
        return HostCoupling(3, [32] * 3, 8, [1 / 32] * 3, [0] * 3,
                            [False] * 3, config=cfg)

    hd = mk(MGConfig(operator="laplacian"))
    # jacobi fails the dense gating -> boxed reference for the transfer
    hb = mk(MGConfig(operator="laplacian", smoother="jacobi"))
    for hc in (hd, hb):
        hc.update_refinement(center_refine(3, 32, 8), max_lvl=2)
        hc.set_boundary_conditions(["asymm"] * 6)
    assert isinstance(hd.solver, DenseAMRMGSolver)
    assert not isinstance(hb.solver, DenseMGSolver)

    t = hb.solver.tree
    rng = np.random.default_rng(5)
    fields = {}
    for lvl in [l for l in hb.solver.levels if l >= 1]:
        for b in t.lvls[lvl].leaves:
            fields[(lvl, tuple(t.ix[int(b)]))] = rng.normal(size=(10,) * 3)
    for hc in (hd, hb):
        hc.copy_to_tree(fields, IPHI)
    # canonical boxed ghosts for comparison
    hb.state = hb.solver.fill_ghost(hb.state, IPHI)
    gd = hd.copy_from_tree(IPHI, with_ghosts=True)
    gb = hb.copy_from_tree(IPHI, with_ghosts=True)
    ci = (slice(1, -1),) * 3
    for key in fields:
        np.testing.assert_array_equal(gd[key][ci], gb[key][ci],
                                      err_msg=f"interior {key}")
        a, b = gd[key], gb[key]
        for ax in range(3):
            for side in (0, -1):
                sl = [slice(1, -1)] * 3
                sl[ax] = side
                np.testing.assert_array_equal(
                    a[tuple(sl)], b[tuple(sl)],
                    err_msg=f"ghost face ax{ax} side{side} {key}")

    # a solve runs on the dense-coupled tree and converges
    hd.copy_to_tree(fields, IRHS)
    st, res0 = hd.solver.fas_fmg(hd.state)
    st, res = hd.solver.fas_fmg(st, have_guess=True)
    assert float(res) < 0.2 * float(res0)

    # regrid: BCs replay onto the rebuilt solver
    hd.update_refinement(center_refine(3, 32, 8), max_lvl=2)
    assert hd.solver.bc_spec[0]["type"] == BCType.DIRICHLET


def test_host_coupling_dense_forest2d():
    """Non-rectangular (L-shaped) 2D host forests route to the 2D
    dense-FOREST solver; leaf transfer incl. ghost-layer export matches
    the boxed coupling bitwise."""
    from octree_mg_tpu import MGConfig
    from octree_mg_tpu.solve.dense import DenseMGSolver
    from octree_mg_tpu.solve.dense_forest2d import DenseForest2DMGSolver

    def l_refine(lvl, ix):
        return lvl < 2 and (ix[0] <= 2 or ix[1] <= 2)

    def mk(cfg):
        return HostCoupling(2, [32, 32], 4, [1 / 32] * 2, [0, 0],
                            [False, False], config=cfg)

    hd = mk(MGConfig(operator="laplacian"))
    hb = mk(MGConfig(operator="laplacian", smoother="jacobi"))
    for hc in (hd, hb):
        hc.update_refinement(l_refine, max_lvl=2)
        hc.set_boundary_conditions(["asymm"] * 4)
    assert isinstance(hd.solver, DenseForest2DMGSolver)
    assert not isinstance(hb.solver, DenseMGSolver)

    t = hb.solver.tree
    rng = np.random.default_rng(9)
    fields = {}
    for lvl in [l for l in hb.solver.levels if l >= 1]:
        for b in t.lvls[lvl].leaves:
            fields[(lvl, tuple(t.ix[int(b)]))] = rng.normal(size=(6, 6))
    for hc in (hd, hb):
        hc.copy_to_tree(fields, IPHI)
    interior = hd.copy_from_tree(IPHI)
    for key, arr in fields.items():
        np.testing.assert_array_equal(interior[key], arr[1:-1, 1:-1])
    hb.state = hb.solver.fill_ghost(hb.state, IPHI)
    gd = hd.copy_from_tree(IPHI, with_ghosts=True)
    gb = hb.copy_from_tree(IPHI, with_ghosts=True)
    for key in fields:
        a, b = gd[key], gb[key]
        np.testing.assert_array_equal(a[1:-1, 1:-1], b[1:-1, 1:-1],
                                      err_msg=f"interior {key}")
        for ax in range(2):
            for side in (0, -1):
                sl = [slice(1, -1)] * 2
                sl[ax] = side
                np.testing.assert_array_equal(
                    a[tuple(sl)], b[tuple(sl)],
                    err_msg=f"ghost face ax{ax} side{side} {key}")

    # a solve runs on the forest-coupled tree and converges
    hd.copy_to_tree(fields, IRHS)
    st, res0 = hd.solver.fas_fmg(hd.state)
    st, res = hd.solver.fas_fmg(st, have_guess=True)
    assert float(res) < 0.2 * float(res0)


def test_host_coupling_sparse_forest_multicanvas():
    """A coupled host tree whose refinement is sparse (below the
    single-canvas fill gates) routes to the multi-canvas solver; leaf
    field copies address the right component canvas and round-trip
    exactly, ghost-inclusive export matches the boxed coupling, and
    the coupled solve converges."""
    from octree_mg_tpu import IRHS, MGConfig
    from octree_mg_tpu.solve.dense_multiforest import (
        DenseMultiForest2DMGSolver)

    def sparse_refine(lvl, ix):
        # two isolated corner boxes of an 8x8 box lattice
        return lvl == 1 and (all(v == 2 for v in ix[:2])
                             or all(v == 7 for v in ix[:2]))

    def mk(cfg):
        hcx = HostCoupling(2, [64, 64], 8, [1 / 64] * 2, [0, 0],
                           [False, False], config=cfg)
        hcx.update_refinement(sparse_refine, max_lvl=2)
        hcx.set_boundary_conditions(["asymm", "asymm", "symm", "symm"])
        return hcx

    hc = mk(MGConfig(operator="laplacian"))
    hb = mk(MGConfig(operator="laplacian", smoother="jacobi"))  # boxed
    assert isinstance(hc.solver, DenseMultiForest2DMGSolver)
    rng = np.random.default_rng(3)
    # copy_to_tree takes leaves INCLUDING the one-ghost layer
    fields = {k: rng.normal(size=(10, 10))
              for k in hc.copy_from_tree(0)}
    hc.copy_to_tree(fields, 0)
    hb.copy_to_tree(fields, 0)
    out = hc.copy_from_tree(0)
    for k in fields:
        assert np.array_equal(out[k], fields[k][1:-1, 1:-1])
    # ghost-inclusive export matches the boxed coupling's fill_ghost
    hb.state = hb.solver.fill_ghost(hb.state, 0)
    gm = hc.copy_from_tree(0, with_ghosts=True)
    gb = hb.copy_from_tree(0, with_ghosts=True)
    for k in gm:
        # faces only (corner ghosts are not meaningful)
        a, b = gm[k], gb[k]
        for side in (0, -1):
            assert np.allclose(a[side, 1:-1], b[side, 1:-1],
                               atol=1e-12), k
            assert np.allclose(a[1:-1, side], b[1:-1, side],
                               atol=1e-12), k
    # and the coupled solve runs on the multi solver
    rhs = {k: np.ones((8, 8)) for k in fields}
    hc.copy_to_tree(rhs, IRHS)
    st, r0 = hc.solver.fas_fmg(hc.state)
    st, r1 = hc.solver.fas_vcycle(st)
    assert float(r1) < 0.5 * float(r0)
