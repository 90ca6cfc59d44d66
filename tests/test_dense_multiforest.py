"""Multi-canvas forest solver vs the boxed solver on SPARSE forests.

The scattered-patch trees here fill <10% of their level bounding boxes
— the single-canvas forest gate rejects them (min_fill) and round 3
routed them boxed.  Every phase must be bit-identical to the boxed
path, exactly like the single-canvas forest tests: the per-component
canvases run the same ghost/smoother machinery
(m_ghost_cells.f90:665-861, m_multigrid.f90:404-424).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from octree_mg_tpu import (IOLD, IPHI, IRES, IRHS, BCType, MGConfig,
                           MGSolver, build_rectangle, make_solver)
from octree_mg_tpu.core import tree as tm
from octree_mg_tpu.solve.dense_forest import dense_forest_supported
from octree_mg_tpu.solve.dense_multiforest import (
    DenseMultiForestMGSolver, dense_multiforest_supported)


def _refine(t, lvl, pred):
    ids = t.lvls[lvl].ids
    pick = [int(b) for b in ids if pred(t.ix[int(b)])]
    tm.add_children_bulk(t, np.array(pick, np.int64))
    tm.set_leaves_parents(t, lvl)
    tm.set_next_level_ids(t, lvl)
    tm.set_neighbors_lvl(t, lvl + 1)


def sparse_tree(kind):
    """Scattered-patch forests below the single-canvas fill gate."""
    if kind == "eight":
        # 8 isolated single-box patches at the corners of a 6^3 box
        # lattice: lvl-2 fill = 8*8^3 / 48^3 = 3.7%
        t = build_rectangle(3, [32] * 3, 4, [1 / 32.] * 3, [0] * 3)
        corners = {1, 6}
        _refine(t, 1, lambda ix: all(v in corners for v in ix))
        tm.finalize_amr(t, 2)
    elif kind == "mixed":
        # one 2x2x2 blob + one L-shaped (concave) patch + one lone box:
        # multi-box components, ring-ghost conflicts inside a component
        t = build_rectangle(3, [32] * 3, 4, [1 / 32.] * 3, [0] * 3)

        def pred(ix):
            if all(1 <= v <= 2 for v in ix):
                return True                      # blob
            if ix[2] == 7 and ix[0] >= 6 and ix[1] >= 6 \
                    and not (ix[0] == 7 and ix[1] == 7):
                return True                      # L (concave corner)
            return bool(ix[0] == 7 and ix[1] == 1 and ix[2] == 4)
        _refine(t, 1, pred)
        tm.finalize_amr(t, 2)
    elif kind == "threelvl":
        # sparse at two depths: two lvl-2 blobs, one refined again
        t = build_rectangle(3, [16] * 3, 4, [1 / 16.] * 3, [0] * 3)
        _refine(t, 1, lambda ix: np.all(ix <= 1) or np.all(ix >= 4))
        # corner-most child only: keeps the 2:1 one-level-jump rule at
        # the blob's interior boundary (outward faces are physical)
        _refine(t, 2, lambda ix: np.all(ix <= 1))
        tm.finalize_amr(t, 3)
    else:
        raise ValueError(kind)
    return t


def boxed_to_unit(solver_b, solver_d, state_b, u, iv):
    """Scatter a boxed level's component boxes into a unit canvas."""
    t = solver_b.tree
    g = solver_d.geom[u]
    lvl = g.lvl
    nc = t.box_size_lvl[lvl]
    X, Y, Z = solver_d.dims[u]
    off = solver_d.offsets[u] // nc
    out = np.zeros((Z, Y, X))
    arr = np.asarray(state_b["cc"][lvl][iv])
    pos = {int(b): i for i, b in enumerate(t.lvls[lvl].ids)}
    for b in g.ids:
        ix = t.ix[int(b)] - 1 - off
        sl = tuple(slice(ix[d] * nc, (ix[d] + 1) * nc) for d in (2, 1, 0))
        out[sl] = arr[pos[int(b)]][(slice(1, -1),) * 3]
    return out


def setup_pair(kind, seed=3, operator="laplacian"):
    tree = sparse_tree(kind)
    sb = MGSolver(tree, MGConfig(operator=operator, smoother="gsrb"))
    sd = DenseMultiForestMGSolver(
        tree, MGConfig(operator=operator, smoother="gsrb",
                       coarse_solver="smooth"))
    sb.set_bc(IPHI, BCType.DIRICHLET, 0.25)
    sd.set_bc(0, BCType.DIRICHLET, 0.25)
    st_b = sb.allocate()
    st_d = sd.allocate()
    rng = np.random.default_rng(seed)
    for lvl in sb.levels:
        nb = sb.static[lvl]["n_boxes"]
        nc = sb.static[lvl]["nc"]
        isl = (slice(None),) + (slice(1, -1),) * 3
        for iv in (IPHI, IRHS):
            vals = rng.normal(size=(nb,) + (nc,) * 3)
            st_b["cc"][lvl] = st_b["cc"][lvl].at[(iv,) + isl].set(vals)
    st_b = sb.fill_ghost(st_b, IPHI)
    st_b = sb.fill_ghost(st_b, IRHS)
    for lvl in sd.levels:
        for u in sd.units_of(lvl):
            for k, iv in (("phi", IPHI), ("rhs", IRHS)):
                vals = boxed_to_unit(sb, sd, st_b, u, iv)
                st_d = sd.set_interior(st_d, u, k, jnp.asarray(vals))
    return sb, st_b, sd, st_d


def unit_mask(sd, u):
    X, Y, Z = sd.dims[u]
    m = np.zeros((Z, Y, X), dtype=bool)
    for lo, hi in sd.geom[u].rects:
        m[lo[2]:hi[2], lo[1]:hi[1], lo[0]:hi[0]] = True
    return m


def cmp_level(sb, st_b, sd, st_d, lvl, iv, key, tol=0.0):
    worst = 0.0
    for u in sd.units_of(lvl):
        want = boxed_to_unit(sb, sd, st_b, u, iv)
        got = np.asarray(st_d[key][u]
                         [sd._isl]) * unit_mask(sd, u)
        worst = max(worst, float(np.max(np.abs(got - want))))
    return worst


@pytest.mark.parametrize("kind", ["eight", "mixed", "threelvl"])
def test_gating_and_routing(kind):
    tree = sparse_tree(kind)
    cfg = MGConfig(operator="laplacian")
    assert not dense_forest_supported(tree, cfg), "should be sub-fill"
    assert dense_multiforest_supported(tree, cfg)
    assert isinstance(make_solver(tree, cfg), DenseMultiForestMGSolver)
    sd = DenseMultiForestMGSolver(tree, cfg)
    n_units = max(len(sd.units_of(lvl)) for lvl in sd.levels)
    assert n_units >= 2, sd.units
    # the eight-patch level really is sparse in its bounding box
    if kind == "eight":
        from octree_mg_tpu.solve.dense_forest import _LevelGeom
        g = _LevelGeom(tree, sd.levels[-1])
        assert g.n_cells < 0.1 * int(np.prod(g.dims))
        assert n_units == 8


def test_refine_rejects_multiforest_clearly():
    """solve_refined must not route a multi-canvas solver into
    RefinedForestPoisson (unit-tuple keys vs int levels -> opaque
    KeyError; advisor round-4 finding)."""
    from octree_mg_tpu.solve.refine import solve_refined
    tree = sparse_tree("eight")
    sd = DenseMultiForestMGSolver(tree, MGConfig(operator="laplacian"))
    st = sd.allocate()
    with pytest.raises(NotImplementedError, match="multi-canvas"):
        solve_refined(sd, st, {}, {})


@pytest.mark.parametrize("kind", ["eight", "mixed", "threelvl"])
def test_smooth_bitwise(kind):
    """Per-component canvas smoothing == boxed smooth_boxes bitwise on
    every component footprint (rb/phys ghost synthesis between
    half-sweeps, per unit)."""
    sb, st_b, sd, st_d = setup_pair(kind)
    lam = jnp.asarray(0.0, jnp.float64)
    lvl = sb.levels[-1]
    st_b2 = sb._smooth_boxes(st_b, sb._to_device(), lvl, 1, lam)
    st_d2 = sd._smooth(st_d, lvl, 1, lam)
    assert cmp_level(sb, st_b2, sd, st_d2, lvl, IPHI, "phi") == 0.0


@pytest.mark.parametrize("kind", ["eight", "mixed"])
def test_residual_bitwise(kind):
    sb, st_b, sd, st_d = setup_pair(kind)
    lam = jnp.asarray(0.0, jnp.float64)
    lvl = sb.levels[-1]
    st_b2 = sb._residual_lvl(st_b, sb._to_device(), lvl, lam)
    st_d2 = sd._residual(st_d, lvl, lam)
    assert cmp_level(sb, st_b2, sd, st_d2, lvl, IRES, "ires") == 0.0


@pytest.mark.parametrize("kind", ["eight", "mixed", "threelvl"])
def test_vcycle_equivalent(kind):
    sb, st_b, sd, st_d = setup_pair(kind)
    st_b2, res_b = sb.fas_vcycle(st_b)
    st_d2, res_d = sd.fas_vcycle(st_d)
    top = sd.levels[-1]
    scale = float(np.max(np.abs(np.asarray(st_b2["cc"][top][IPHI]))))
    diff = cmp_level(sb, st_b2, sd, st_d2, top, IPHI, "phi")
    assert diff <= 1e-13 * scale, (diff, scale)
    assert abs(float(res_b) - float(res_d)) <= 1e-12 * float(res_b)


def test_fmg_convergence():
    """FMG + V-cycles converge on the scattered tree (residual keeps
    contracting; the composite solve is well-posed across disjoint
    patches)."""
    sb, st_b, sd, st_d = setup_pair("eight")
    st_d, r0 = sd.fas_fmg(st_d)
    st_d, r1 = sd.fas_vcycle(st_d)
    st_d, r2 = sd.fas_vcycle(st_d)
    assert float(r1) < 0.2 * float(r0)
    assert float(r2) < 0.2 * float(r1)


def test_vcoeff_multiforest():
    """Variable-coefficient operators ride the component canvases
    (same eps ring/face synthesis per unit)."""
    tree = sparse_tree("eight")
    cfg = MGConfig(operator="vhelmholtz")
    assert dense_multiforest_supported(tree, cfg)
    sd = make_solver(tree, cfg)
    assert isinstance(sd, DenseMultiForestMGSolver)
    sd.set_bc(0, BCType.DIRICHLET, 0.0)
    st = sd.allocate()
    rng = np.random.default_rng(9)
    for lvl in sd.levels:
        for u in sd.units_of(lvl):
            X, Y, Z = sd.dims[u]
            st = sd.set_interior(st, u, "rhs",
                                 jnp.asarray(rng.normal(size=(Z, Y, X))))
            st = sd.set_interior(st, u, "eps0",
                                 jnp.asarray(0.5 + rng.random((Z, Y, X))))
    st, r0 = sd.fas_fmg(st, lam=0.4)
    st, r1 = sd.fas_vcycle(st, lam=0.4)
    assert float(r1) < 0.5 * float(r0), (float(r0), float(r1))


# ---------------------------------------------------------------------------
# 2D sparse forests (DenseMultiForest2DMGSolver)
# ---------------------------------------------------------------------------

from octree_mg_tpu.solve.dense_forest2d import dense_forest2d_supported  # noqa: E402
from octree_mg_tpu.solve.dense_multiforest import (  # noqa: E402
    DenseMultiForest2DMGSolver, dense_multiforest2d_supported)


def sparse_tree_2d(geometry="cartesian"):
    """4 isolated corner patches on a 64^2-base quadtree: lvl-2 fill
    4*8^2 / 96^2 = 2.8%."""
    t = build_rectangle(2, [64] * 2, 8, [1 / 64.] * 2,
                        [0.5, 0] if geometry == "cylindrical" else [0] * 2)
    corners = {2, 7}
    _refine(t, 1, lambda ix: all(v in corners for v in ix[:2]))
    tm.finalize_amr(t, 2)
    return t


def boxed_to_unit_2d(sb, sd, st_b, u, iv):
    t = sb.tree
    g = sd.geom[u]
    lvl = g.lvl
    nc = t.box_size_lvl[lvl]
    X, Y = sd.dims[u]
    off = sd.offsets[u] // nc
    out = np.zeros((Y, X))
    arr = np.asarray(st_b["cc"][lvl][iv])
    pos = {int(b): i for i, b in enumerate(t.lvls[lvl].ids)}
    for b in g.ids:
        ix = t.ix[int(b)][:2] - 1 - off
        sl = (slice(ix[1] * nc, (ix[1] + 1) * nc),
              slice(ix[0] * nc, (ix[0] + 1) * nc))
        out[sl] = arr[pos[int(b)]][1:-1, 1:-1]
    return out


def unit_mask_2d(sd, u):
    X, Y = sd.dims[u]
    m = np.zeros((Y, X), dtype=bool)
    for lo, hi in sd.geom[u].rects:
        m[lo[1]:hi[1], lo[0]:hi[0]] = True
    return m


@pytest.mark.parametrize("geometry", ["cartesian", "cylindrical"])
def test_multiforest2d_vcycle_equivalent(geometry):
    """2D scattered patches: gating + V-cycle vs boxed (~1 ulp),
    cartesian and cylindrical."""
    tree = sparse_tree_2d(geometry)
    cfg = MGConfig(operator="laplacian", geometry=geometry)
    assert not dense_forest2d_supported(tree, cfg)
    assert dense_multiforest2d_supported(tree, cfg)
    sd = make_solver(tree, MGConfig(operator="laplacian",
                                    geometry=geometry,
                                    coarse_solver="smooth"))
    assert isinstance(sd, DenseMultiForest2DMGSolver)
    sb = MGSolver(tree, MGConfig(operator="laplacian",
                                 geometry=geometry, smoother="gsrb"))
    sb.set_bc(IPHI, BCType.DIRICHLET, 0.25)
    sd.set_bc(0, BCType.DIRICHLET, 0.25)
    st_b = sb.allocate()
    st_d = sd.allocate()
    rng = np.random.default_rng(5)
    for lvl in sb.levels:
        nb = sb.static[lvl]["n_boxes"]
        nc = sb.static[lvl]["nc"]
        isl = (slice(None),) + (slice(1, -1),) * 2
        for iv in (IPHI, IRHS):
            vals = rng.normal(size=(nb,) + (nc,) * 2)
            st_b["cc"][lvl] = st_b["cc"][lvl].at[(iv,) + isl].set(vals)
    st_b = sb.fill_ghost(st_b, IPHI)
    st_b = sb.fill_ghost(st_b, IRHS)
    for lvl in sd.levels:
        for u in sd.units_of(lvl):
            for k, iv in (("phi", IPHI), ("rhs", IRHS)):
                st_d = sd.set_interior(
                    st_d, u, k,
                    jnp.asarray(boxed_to_unit_2d(sb, sd, st_b, u, iv)))
    st_b2, res_b = sb.fas_vcycle(st_b)
    st_d2, res_d = sd.fas_vcycle(st_d)
    lvl = sd.levels[-1]
    worst = 0.0
    scale = 1e-30
    for u in sd.units_of(lvl):
        want = boxed_to_unit_2d(sb, sd, st_b2, u, IPHI)
        got = np.asarray(st_d2["phi"][u]) * unit_mask_2d(sd, u)
        worst = max(worst, float(np.max(np.abs(got - want))))
        scale = max(scale, float(np.max(np.abs(want))))
    assert worst <= 1e-13 * scale, (worst, scale)
    assert abs(float(res_b) - float(res_d)) <= 1e-12 * float(res_b)


# ---------------------------------------------------------------------------
# GSPMD sharding of multi-canvas forests (sharded == single-device)
# ---------------------------------------------------------------------------

def shardy_tree_3d():
    """Sparse 3-level tree with slab-shardable canvases: lvl-2 full
    (32^3, z-shards on the 8-device mesh), lvl-3 = one z-spanning
    column component (4x4x32 canvas, z-shards) + one isolated box
    (4^3, replicates)."""
    t = build_rectangle(3, [16] * 3, 4, [1 / 16.] * 3, [0] * 3)
    _refine(t, 1, lambda ix: True)
    _refine(t, 2, lambda ix: (ix[0] == 2 and ix[1] == 2)
            or all(v == 7 for v in ix))
    tm.finalize_amr(t, 3)
    return t


def _mf_gspmd_run_3d(shard, mesh):
    sd = make_solver(shardy_tree_3d(), MGConfig(operator="laplacian"))
    assert isinstance(sd, DenseMultiForestMGSolver)
    sd.set_bc(0, BCType.DIRICHLET, 0.25)
    st = sd.allocate()
    rng = np.random.default_rng(11)
    for lvl in sd.levels:
        for u in sd.units_of(lvl):
            X, Y, Z = sd.dims[u]
            st = sd.set_interior(
                st, u, "rhs", jnp.asarray(rng.normal(size=(Z, Y, X))))
    if shard:
        st = sd.shard_state(st, mesh, min_local=4)
        assert sum(sd.z_sharded.values()) >= 2, sd.z_sharded
    st, _ = sd.fas_fmg(st)
    st, res_v = sd.fas_vcycle(st)
    out = {u: np.asarray(st["phi"][u][sd._isl]) * unit_mask(sd, u)
           for lvl in sd.levels for u in sd.units_of(lvl)}
    return out, float(res_v)


def test_multiforest_gspmd_sharded_matches_single():
    """Sparse multi-canvas forest distributed over an 8-device mesh:
    big unit canvases z-slab shard (incl. a sparse z-column component),
    small ones replicate; results match single-device (the reference
    runs any tree at any rank count, m_load_balance.f90:71-136)."""
    import jax
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:8]), ("z",))
    a, ra = _mf_gspmd_run_3d(False, mesh)
    b, rb = _mf_gspmd_run_3d(True, mesh)
    for u in a:
        scale = max(float(np.max(np.abs(a[u]))), 1e-30)
        assert np.max(np.abs(a[u] - b[u])) <= 1e-11 * scale, (
            u, float(np.max(np.abs(a[u] - b[u]))), scale)
    assert abs(ra - rb) <= 1e-9 * max(1.0, ra)


def shardy_tree_2d():
    """2D analogue: lvl-2 full 32^2 (y-shards), lvl-3 = a y-spanning
    column component (4x32) + an isolated box (4^2)."""
    t = build_rectangle(2, [16] * 2, 4, [1 / 16.] * 2, [0] * 2)
    _refine(t, 1, lambda ix: True)
    _refine(t, 2, lambda ix: ix[0] == 2 or all(v == 7 for v in ix[:2]))
    tm.finalize_amr(t, 3)
    return t


def test_multiforest2d_gspmd_sharded_matches_single():
    import jax
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:8]), ("y",))

    def run(shard):
        sd = make_solver(shardy_tree_2d(),
                         MGConfig(operator="laplacian",
                                  coarse_solver="smooth"))
        assert isinstance(sd, DenseMultiForest2DMGSolver)
        sd.set_bc(0, BCType.DIRICHLET, 0.25)
        st = sd.allocate()
        rng = np.random.default_rng(12)
        for lvl in sd.levels:
            for u in sd.units_of(lvl):
                X, Y = sd.dims[u]
                st = sd.set_interior(
                    st, u, "rhs", jnp.asarray(rng.normal(size=(Y, X))))
        if shard:
            st = sd.shard_state(st, mesh, min_local=4)
            assert sum(sd.y_sharded.values()) >= 2, sd.y_sharded
        st, _ = sd.fas_fmg(st)
        st, res_v = sd.fas_vcycle(st)
        out = {u: np.asarray(st["phi"][u]) * unit_mask_2d(sd, u)
               for lvl in sd.levels for u in sd.units_of(lvl)}
        return out, float(res_v)

    a, ra = run(False)
    b, rb = run(True)
    for u in a:
        scale = max(float(np.max(np.abs(a[u]))), 1e-30)
        assert np.max(np.abs(a[u] - b[u])) <= 1e-11 * scale, (
            u, float(np.max(np.abs(a[u] - b[u]))), scale)
    assert abs(ra - rb) <= 1e-9 * max(1.0, ra)


def test_snake_component_admitted():
    """Round-4 verdict item 8 (the sparse-component cliff): a concave
    snake component at ~3% of its own bbox is ADMITTED by the lowered
    1% gate — measured 83x faster than the boxed fallback on chip at
    identical residuals (experiments/probe_snake.py); the break-even
    sits near 0.04% fill, so speed never favors boxed above the gate."""
    nb = 8
    t = build_rectangle(3, [32] * 3, 4, [1 / 32.] * 3, [0] * 3)

    def pred(ix):
        x, y, z = int(ix[0]) - 1, int(ix[1]) - 1, int(ix[2]) - 1
        s = x + y
        return z == min(s, nb - 1) and (y == x or y == x + 1)
    _refine(t, 1, pred)
    tm.finalize_amr(t, 2)
    cfg = MGConfig(operator="laplacian")
    assert dense_multiforest_supported(t, cfg)
    sd = make_solver(t, cfg)
    assert isinstance(sd, DenseMultiForestMGSolver)
    # and it solves: residual contracts
    sd.set_bc(0, BCType.DIRICHLET, 0.0)
    st = sd.allocate()
    top = sd.levels[-1]
    for u in sd.units_of(top):
        X, Y, Z = sd.dims[u]
        st = sd.set_interior(st, u, "rhs", jnp.ones((Z, Y, X)))
    st, r0 = sd.fas_fmg(st)
    st, r1 = sd.fas_fmg(st, have_guess=True)
    assert float(r1) < 0.5 * float(r0)
