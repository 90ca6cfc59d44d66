"""Dense-forest solver vs the boxed solver on ARBITRARY octree forests.

The forests here are exactly the cases the rectangular dense-AMR path
cannot take (multi-patch, L-shaped, periodic exteriors): every phase
must be *bit-identical* to the boxed path — the canvas smoother's ring
and face-plane ghosts evaluate the same bc_to_gc / sides_rb arithmetic
(m_ghost_cells.f90:665-766, 769-861) with the same coarse-strip
interpolation values as the boxed ghost machinery.  Full cycles match
to ~1 ulp (restriction rounding).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from octree_mg_tpu import (IOLD, IPHI, IRES, IRHS, BCType, MGConfig,
                           MGSolver, build_amr_centered, build_rectangle,
                           make_solver)
from octree_mg_tpu.core import tree as tm
from octree_mg_tpu.solve.dense_amr import dense_amr_supported
from octree_mg_tpu.solve.dense_forest import (DenseForestMGSolver,
                                              dense_forest_supported)

N_MODES = 2


def solution(x):
    out = 1.0
    for d in range(x.shape[-1]):
        out = out * np.sin(2 * np.pi * N_MODES * x[..., d])
    return out


def _refine(t, lvl, pred):
    ids = t.lvls[lvl].ids
    pick = [int(b) for b in ids if pred(t.ix[int(b)])]
    tm.add_children_bulk(t, np.array(pick, np.int64))
    tm.set_leaves_parents(t, lvl)
    tm.set_next_level_ids(t, lvl)
    tm.set_neighbors_lvl(t, lvl + 1)


def forest_tree(kind):
    """Forests OUTSIDE the rectangular dense-AMR path's coverage."""
    if kind == "L":
        # L-shaped (non-rectangular) lvl-2 footprint + corner lvl 3
        t = build_rectangle(3, [16] * 3, 4, [1 / 16.] * 3, [0] * 3)
        _refine(t, 1, lambda ix: ix[0] <= 2 or ix[1] <= 2)
        _refine(t, 2, lambda ix: np.all(ix <= 2))
        tm.finalize_amr(t, 3)
    elif kind == "two":
        # two disjoint corner patches (multi-patch level)
        t = build_rectangle(3, [16] * 3, 4, [1 / 16.] * 3, [0] * 3)
        _refine(t, 1, lambda ix: np.all(ix <= 2) or np.all(ix >= 3))
        tm.finalize_amr(t, 2)
    elif kind == "periodic":
        # fully periodic exterior, off-center corner refinement: the
        # refinement level's exterior ghosts interpolate from wrapped
        # coarse cells
        t = build_rectangle(3, [16] * 3, 4, [1 / 16.] * 3, [0] * 3,
                            periodic=[True] * 3)
        _refine(t, 1, lambda ix: np.all(ix <= 2))
        tm.finalize_amr(t, 2)
    else:
        raise ValueError(kind)
    return t


def boxed_to_canvas(solver_b, solver_d, state_b, lvl, iv):
    """Scatter a boxed level into the dense canvas [Z, Y, X] (garbage
    cells zero)."""
    t = solver_b.tree
    nc = t.box_size_lvl[lvl]
    X, Y, Z = solver_d.dims[lvl]
    off = solver_d.offsets[lvl] // nc
    out = np.zeros((Z, Y, X))
    arr = np.asarray(state_b["cc"][lvl][iv])
    for loc, b in enumerate(t.lvls[lvl].ids):
        ix = t.ix[b] - 1 - off
        sl = tuple(slice(ix[d] * nc, (ix[d] + 1) * nc) for d in (2, 1, 0))
        out[sl] = arr[loc][(slice(1, -1),) * 3]
    return out


def setup_pair(kind="L", coarse="smooth", seed=3, operator="laplacian",
               bc_fn=solution):
    tree = forest_tree(kind)
    cfg_b = MGConfig(operator=operator, smoother="gsrb")
    sb = MGSolver(tree, cfg_b)
    sd = DenseForestMGSolver(tree, MGConfig(operator=operator,
                                            smoother="gsrb",
                                            coarse_solver=coarse))
    if not all(tree.periodic):
        sb.set_bc(IPHI, BCType.DIRICHLET, fn=bc_fn)
        sd.set_bc(0, BCType.DIRICHLET, fn=bc_fn)
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
        for k, iv in (("phi", IPHI), ("rhs", IRHS)):
            vals = boxed_to_canvas(sb, sd, st_b, lvl, iv)
            st_d = sd.set_interior(st_d, lvl, k, jnp.asarray(vals))
    return sb, st_b, sd, st_d


def _mask(sd, lvl):
    return sd.footprint_mask(lvl)


def test_gating_and_routing():
    cfg = MGConfig(operator="laplacian")
    for kind in ("L", "two", "periodic"):
        t = forest_tree(kind)
        assert not dense_amr_supported(t, cfg), kind
        assert dense_forest_supported(t, cfg), kind
        assert isinstance(make_solver(t, cfg), DenseForestMGSolver), kind
    # rectangular centered AMR keeps riding the dense-AMR path
    rt = build_amr_centered(3, 3, np.full(3, 16), 8, np.full(3, 1.0 / 16))
    assert dense_amr_supported(rt, cfg)
    assert not isinstance(make_solver(rt, cfg), DenseForestMGSolver)
    # uniform tree -> dense path, untouched
    ut = build_rectangle(3, np.full(3, 16), 8, np.full(3, 1.0 / 16),
                         np.zeros(3))
    assert not dense_forest_supported(ut, cfg)


@pytest.mark.parametrize("kind", ["L", "two", "periodic"])
def test_smooth_bitwise(kind):
    """Canvas smoothing == boxed smooth_boxes bitwise on the footprint,
    including rb/phys/wrap ghost synthesis between half-sweeps."""
    sb, st_b, sd, st_d = setup_pair(kind)
    lam = jnp.asarray(0.0, jnp.float64)
    lvl = sb.levels[-1]
    st_b = sb._smooth_boxes(st_b, sb._to_device(), lvl, 1, lam)
    st_d = sd._smooth(st_d, lvl, 1, lam)
    m = _mask(sd, lvl)
    ref = boxed_to_canvas(sb, sd, st_b, lvl, IPHI)
    got = np.asarray(sd.interior(st_d, lvl, "phi")) * m
    assert np.array_equal(got, ref * m), (
        f"max diff {np.max(np.abs(got - ref * m))}")


@pytest.mark.parametrize("kind", ["L", "periodic"])
def test_residual_bitwise(kind):
    sb, st_b, sd, st_d = setup_pair(kind, operator="helmholtz"
                                    if kind == "L" else "laplacian")
    lam = jnp.asarray(0.7 if kind == "L" else 0.0, jnp.float64)
    lvl = sb.levels[-1]
    st_b = sb._residual_lvl(st_b, sb._to_device(), lvl, lam)
    st_d = sd._residual(st_d, lvl, lam)
    m = _mask(sd, lvl)
    ref = boxed_to_canvas(sb, sd, st_b, lvl, IRES)
    got = np.asarray(sd.interior(st_d, lvl, "ires")) * m
    assert np.array_equal(got, ref * m)


def test_update_coarse_matches():
    """Down-leg FAS transfer: restriction image, tau-corrected rhs and
    iold match the boxed update_coarse (~1 ulp: restriction order)."""
    sb, st_b, sd, st_d = setup_pair("L")
    lam = jnp.asarray(0.0, jnp.float64)
    top = sb.levels[-1]
    st_b = sb._update_coarse(st_b, sb._to_device(), top, lam)
    st_d = sd._update_coarse(st_d, top, lam)
    img = np.zeros_like(_mask(sd, top - 1))
    for clo, chi in sd._image_rects(top):
        img[clo[2]:chi[2], clo[1]:chi[1], clo[0]:chi[0]] = True
    for key, iv in (("phi", IPHI), ("rhs", IRHS), ("iold", IOLD)):
        ref = boxed_to_canvas(sb, sd, st_b, top - 1, iv)
        got = np.asarray(sd.interior(st_d, top - 1, key))
        if key == "iold":
            ref, got = ref * img, got * img
        else:
            m = _mask(sd, top - 1)
            ref, got = ref * m, got * m
        np.testing.assert_allclose(got, ref, rtol=0, atol=2e-13,
                                   err_msg=f"update_coarse {key}")


def test_correct_children_matches():
    """Up-leg correction: prolongation of (phi_c - iold_c) with the
    ghost-synthesized corr ring."""
    sb, st_b, sd, st_d = setup_pair("L", seed=11)
    lam = jnp.asarray(0.0, jnp.float64)
    top = sb.levels[-1]
    lvl_c = top - 1
    rng = np.random.default_rng(4)
    nb = sb.static[lvl_c]["n_boxes"]
    nc = sb.static[lvl_c]["nc"]
    isl = (slice(None),) + (slice(1, -1),) * 3
    iold = rng.normal(size=(nb,) + (nc,) * 3)
    st_b["cc"][lvl_c] = st_b["cc"][lvl_c].at[(IOLD,) + isl].set(iold)
    st_b = sb.fill_ghost(st_b, IOLD)
    st_d = sd.set_interior(st_d, lvl_c, "iold",
                           jnp.asarray(boxed_to_canvas(sb, sd, st_b,
                                                       lvl_c, IOLD)))
    st_b = sb._correct_children(st_b, sb._to_device(), lvl_c)
    st_d = sd._correct_children(st_d, lvl_c, lam)
    m = _mask(sd, top)
    ref = boxed_to_canvas(sb, sd, st_b, top, IPHI) * m
    got = np.asarray(sd.interior(st_d, top, "phi")) * m
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(got - ref)) <= 1e-14 * scale, (
        f"max diff {np.max(np.abs(got - ref))}")


@pytest.mark.parametrize("kind", ["L", "two", "periodic"])
def test_vcycle_equivalent(kind):
    """Full FAS V-cycle matches the boxed path to ~1 ulp."""
    sb, st_b, sd, st_d = setup_pair(kind, coarse="smooth")
    st_b, res_b = sb.fas_vcycle(st_b)
    st_d, res_d = sd.fas_vcycle(st_d)
    for lvl in sd.levels:
        m = _mask(sd, lvl)
        ref = boxed_to_canvas(sb, sd, st_b, lvl, IPHI) * m
        got = np.asarray(sd.interior(st_d, lvl, "phi")) * m
        scale = max(np.max(np.abs(ref)), 1e-30)
        assert np.max(np.abs(got - ref)) <= 5e-13 * scale, (
            f"{kind} lvl {lvl}: max diff {np.max(np.abs(got - ref))}")
    assert abs(float(res_b) - float(res_d)) <= 1e-11 * max(
        1.0, abs(float(res_b)))


def test_fmg_equivalent():
    sb, st_b, sd, st_d = setup_pair("L", coarse="smooth", seed=8)
    st_b, res_b = sb.fas_fmg(st_b)
    st_d, res_d = sd.fas_fmg(st_d)
    top = sb.levels[-1]
    m = _mask(sd, top)
    ref = boxed_to_canvas(sb, sd, st_b, top, IPHI) * m
    got = np.asarray(sd.interior(st_d, top, "phi")) * m
    scale = max(np.max(np.abs(ref)), 1e-30)
    assert np.max(np.abs(got - ref)) <= 5e-13 * scale
    assert abs(float(res_b) - float(res_d)) <= 1e-11 * max(
        1.0, abs(float(res_b)))


def test_forest_convergence():
    """Manufactured solution on the L forest: FMG converges the leaf
    error to the discretization level (test_refinement.f90 semantics)."""
    t = forest_tree("L")
    sd = make_solver(t, MGConfig(operator="laplacian"))
    assert isinstance(sd, DenseForestMGSolver)
    sd.set_bc(0, BCType.DIRICHLET, fn=solution)
    st = sd.allocate()
    for lvl in sd.levels:
        x = sd.cell_centers(lvl)
        st = sd.set_interior(st, lvl, "phi", jnp.asarray(solution(x)))
    st = sd.apply_operator(st, lam=0.0, out_key="rhs")
    for lvl in sd.levels:
        st = sd.set_interior(st, lvl, "phi",
                             jnp.zeros_like(sd.interior(st, lvl, "phi")))
    for i in range(8):
        st, res = sd.fas_fmg(st, have_guess=(i > 0))
    top = sd.levels[-1]
    m = _mask(sd, top)
    x = sd.cell_centers(top)
    err = np.max(np.abs((np.asarray(sd.interior(st, top, "phi"))
                         - solution(x)) * m))
    assert err < 5e-2, f"solution error {err}"


# ---------------------------------------------------------------------------
# multi-chip: GSPMD z-slab sharding of the forest canvases
# ---------------------------------------------------------------------------

def _gspmd_tree():
    """L-shaped forest big enough for >=2 z-sharded levels on the
    8-device mesh (lvl 1: z=32, lvl 2: z=64)."""
    t = build_rectangle(3, [32] * 3, 4, [1 / 32.] * 3, [0] * 3)
    _refine(t, 1, lambda ix: ix[0] <= 4 or ix[1] <= 4)
    tm.finalize_amr(t, 2)
    return t


def _gspmd_run(operator, shard, mesh, seed=31):
    sd = make_solver(_gspmd_tree(), MGConfig(operator=operator))
    assert isinstance(sd, DenseForestMGSolver)
    sd.set_bc(0, BCType.DIRICHLET, 0.25)
    st = sd.allocate()
    rng = np.random.default_rng(seed)
    for lvl in sd.levels:
        X, Y, Z = sd.dims[lvl]
        st = sd.set_interior(st, lvl, "rhs",
                             jnp.asarray(rng.normal(size=(Z, Y, X))))
        if sd.n_eps:
            for i in range(sd.n_eps):
                st = sd.set_interior(
                    st, lvl, f"eps{i}",
                    jnp.asarray(0.5 + rng.random((Z, Y, X))))
    if shard:
        st = sd.shard_state(st, mesh, min_local=4)
        assert sum(sd.z_sharded[l] for l in sd.levels) >= 2, sd.z_sharded
    st, res = sd.fas_fmg(st, lam=0.6 if "helmholtz" in operator else 0.0)
    st, res_v = sd.fas_vcycle(st,
                              lam=0.6 if "helmholtz" in operator else 0.0)
    top = sd.levels[-1]
    phi = np.asarray(sd.interior(st, top, "phi")) * _mask(sd, top)
    return phi, float(res_v)


@pytest.mark.parametrize("operator", ["laplacian", "vhelmholtz"])
def test_forest_gspmd_sharded_matches_single(operator):
    """The z-slab GSPMD placement (overlay formulation: rolls of the
    raw canvas + ring-ghost overlays) distributes the arbitrary-forest
    solver over the 8-device mesh with the same results as
    single-device — the reference's any-tree-any-rank-count capability
    (m_load_balance.f90:71-136).  FMG + V-cycle, >=2 sharded levels."""
    import jax
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:8]), ("z",))
    a, res_a = _gspmd_run(operator, False, mesh)
    b, res_b = _gspmd_run(operator, True, mesh)
    scale = max(float(np.max(np.abs(a))), 1e-30)
    assert np.max(np.abs(a - b)) <= 1e-12 * scale, (
        f"GSPMD forest diff {np.max(np.abs(a - b)):.3e} vs {scale:.3e}")
    assert abs(res_a - res_b) <= 1e-10 * max(1.0, res_a)


def test_forest_gspmd_overlay_matches_ringwrite_single_device():
    """The overlay formulation itself (forced via _gspmd_mesh on a
    1-device mesh semantics: no sharded levels, replicated placement)
    must reproduce the ring-written path at footprint cells — pinning
    that the two formulations are the same arithmetic before sharding
    enters."""
    import jax
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:1]), ("z",))
    a, _ = _gspmd_run("laplacian", False, mesh)
    sd = make_solver(_gspmd_tree(), MGConfig(operator="laplacian"))
    sd.set_bc(0, BCType.DIRICHLET, 0.25)
    st = sd.allocate()
    rng = np.random.default_rng(31)
    for lvl in sd.levels:
        X, Y, Z = sd.dims[lvl]
        st = sd.set_interior(st, lvl, "rhs",
                             jnp.asarray(rng.normal(size=(Z, Y, X))))
    st = sd.shard_state(st, mesh, min_local=4)   # K=1: all replicated
    assert not any(sd.z_sharded[l] for l in sd.levels)
    st, _ = sd.fas_fmg(st)
    st, _ = sd.fas_vcycle(st)
    top = sd.levels[-1]
    b = np.asarray(sd.interior(st, top, "phi")) * _mask(sd, top)
    scale = max(float(np.max(np.abs(a))), 1e-30)
    assert np.max(np.abs(a - b)) <= 1e-12 * scale


# ---------------------------------------------------------------------------
# fused-canvas smoother (round-5): in-kernel ring/face ghost synthesis
# ---------------------------------------------------------------------------

def _seg_tree(kind):
    """Kernel-eligible canvases (X = 128 lanes) on CPU-sized domains."""
    t = build_rectangle(3, [64, 16, 16], 4,
                        [1 / 64., 1 / 16., 1 / 16.], [0] * 3)
    if kind == "L":
        _refine(t, 1, lambda ix: ix[1] <= 2 or ix[2] <= 2)
    elif kind == "slab":
        _refine(t, 1, lambda ix: ix[1] in (2, 3) and ix[2] in (2, 3))
    tm.finalize_amr(t, 2)
    return t


def _seg_run(kind, fused, operator="laplacian", lam=0.0, bcv=0.25):
    sv = DenseForestMGSolver(_seg_tree(kind),
                             MGConfig(operator=operator))
    sv.seg_fused = fused
    sv.set_bc(0, BCType.DIRICHLET, bcv)
    st = sv.allocate()
    rng = np.random.default_rng(7)
    for lvl in sv.levels:
        X, Y, Z = sv.dims[lvl]
        st = sv.set_interior(st, lvl, "rhs",
                             jnp.asarray(rng.normal(size=(Z, Y, X))))
    top = sv.levels[-1]
    if fused:
        assert sv._seg_desc(top) is not None, "gate must admit this tree"
    st, _ = sv.fas_fmg(st)
    st, res_v = sv.fas_vcycle(st)
    # garbage cells are garbage-by-contract (may hold non-finite in the
    # fused path): select, don't multiply (NaN*0 = NaN)
    phi = np.where(sv.footprint_mask(top),
                   np.asarray(sv.interior(st, top, "phi")), 0.0)
    return phi, float(res_v)


@pytest.mark.parametrize("kind,operator,lam", [
    ("L", "laplacian", 0.0),
    ("L", "helmholtz", 0.42),
    ("slab", "laplacian", 0.0),
])
def test_seg_fused_smoother_matches_sequential(kind, operator, lam):
    """The fused-canvas path (rb/phys ghosts synthesized INSIDE the
    Mosaic pair/apply kernels from in-window data — exact mid-pair
    refresh, ops/pair_sweep recipe generalized to segment planes) is
    value-identical to the sequential half-sweep+refresh path.  NOT
    asserted bitwise: the two programs have different fusion shapes and
    XLA's fma-contraction is only value-stable per program shape (the
    measured class documented for the GSPMD overlay formulation,
    __graft_entry__ forest cases) — bound: 32 ulp of the field scale;
    anything past that is a real regression."""
    a, ra = _seg_run(kind, False, operator, lam)
    b, rb = _seg_run(kind, True, operator, lam)
    scale = float(np.max(np.abs(a)))
    tol = 32 * np.finfo(np.float64).eps * scale
    assert np.max(np.abs(a - b)) <= tol, (
        float(np.max(np.abs(a - b))), tol)
    assert abs(ra - rb) <= 1e-10 * max(ra, 1.0)


def test_seg_fused_engages_and_gates():
    """The gate: kernel-eligible non-periodic trees engage; wrap
    segments (periodic) fall back to the sequential path."""
    sv = DenseForestMGSolver(_seg_tree("L"), MGConfig(operator="laplacian"))
    assert sv._seg_desc(sv.levels[-1]) is not None
    tp = build_rectangle(3, [64, 16, 16], 4,
                         [1 / 64., 1 / 16., 1 / 16.], [0] * 3,
                         periodic=[True] * 3)
    _refine(tp, 1, lambda ix: ix[1] <= 2)
    tm.finalize_amr(tp, 2)
    svp = DenseForestMGSolver(tp, MGConfig(operator="laplacian"))
    for lvl in svp.levels:
        if any(s.kind == "wrap" for s in svp.segs[lvl]):
            assert svp._seg_desc(lvl) is None


def test_prolong_add_kernel_bitwise():
    """The forest correction's fused-prolong route (corr_ready mode,
    window ring riding the identity face planes) is bitwise the XLA
    interleave path at a kernel-eligible window size."""
    from octree_mg_tpu.ops import dense_kernels as dk
    from octree_mg_tpu.solve.dense import _ISL
    t = build_rectangle(3, [128, 32, 32], 4,
                        [1 / 128., 1 / 32., 1 / 32.], [0] * 3)
    _refine(t, 1, lambda ix: ix[1] <= 4 or ix[2] <= 4)
    tm.finalize_amr(t, 2)
    sv = DenseForestMGSolver(t, MGConfig(operator="laplacian"))
    top = sv.levels[-1]
    X, Y, Z = sv.dims[top]
    assert dk.transfer_tiles((X // 2, Y // 2, Z // 2)) is not None
    rng = np.random.default_rng(1)
    sub = jnp.asarray(rng.normal(size=(Z // 2 + 2, Y // 2 + 2,
                                       X // 2 + 2)))
    phi_f = jnp.asarray(rng.normal(size=dk.padded_shape(sv.dims[top])))
    a = np.asarray(phi_f.at[_ISL].add(sv._prolong_rect(sub)))
    b = np.asarray(sv._prolong_add(sub, phi_f))
    assert np.array_equal(a[_ISL], b[_ISL])
