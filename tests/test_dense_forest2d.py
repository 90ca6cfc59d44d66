"""2D dense-forest solver vs the boxed solver on ARBITRARY quadtree
forests (the 2D counterpart of tests/test_dense_forest.py: multi-patch,
L-shaped, periodic exteriors — cases the rectangular dense-AMR 2D path
cannot take).  Every phase must be bit-identical to the boxed path;
full cycles match to ~1 ulp (restriction rounding)."""
import jax.numpy as jnp
import numpy as np
import pytest

from octree_mg_tpu import (IOLD, IPHI, IRES, IRHS, BCType, MGConfig,
                           MGSolver, build_rectangle, make_solver)
from octree_mg_tpu.core import tree as tm
from octree_mg_tpu.solve.dense_amr2d import dense_amr2d_supported
from octree_mg_tpu.solve.dense_forest2d import (DenseForest2DMGSolver,
                                                dense_forest2d_supported)

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
    """Forests OUTSIDE the rectangular 2D dense-AMR path's coverage."""
    if kind == "L":
        t = build_rectangle(2, [32] * 2, 4, [1 / 32.] * 2, [0] * 2)
        _refine(t, 1, lambda ix: ix[0] <= 4 or ix[1] <= 4)
        _refine(t, 2, lambda ix: np.all(ix[:2] <= 4))
        tm.finalize_amr(t, 3)
    elif kind == "two":
        t = build_rectangle(2, [32] * 2, 4, [1 / 32.] * 2, [0] * 2)
        _refine(t, 1, lambda ix: np.all(ix[:2] <= 4)
                or np.all(ix[:2] >= 5))
        tm.finalize_amr(t, 2)
    elif kind == "periodic":
        t = build_rectangle(2, [32] * 2, 4, [1 / 32.] * 2, [0] * 2,
                            periodic=[True] * 2)
        _refine(t, 1, lambda ix: np.all(ix[:2] <= 4))
        tm.finalize_amr(t, 2)
    else:
        raise ValueError(kind)
    return t


def boxed_to_canvas(solver_b, solver_d, state_b, lvl, iv):
    """Scatter a boxed level into the dense canvas [Y, X] (garbage
    cells zero)."""
    t = solver_b.tree
    nc = t.box_size_lvl[lvl]
    X, Y = solver_d.dims[lvl]
    off = solver_d.offsets[lvl] // nc
    out = np.zeros((Y, X))
    arr = np.asarray(state_b["cc"][lvl][iv])
    for loc, b in enumerate(t.lvls[lvl].ids):
        ix = t.ix[b][:2] - 1 - off
        sl = (slice(ix[1] * nc, (ix[1] + 1) * nc),
              slice(ix[0] * nc, (ix[0] + 1) * nc))
        out[sl] = arr[loc][1:-1, 1:-1]
    return out


def setup_pair(kind="L", coarse="smooth", seed=3, operator="laplacian",
               bc_fn=solution, geometry="cartesian"):
    tree = forest_tree(kind)
    sb = MGSolver(tree, MGConfig(operator=operator, smoother="gsrb",
                                 geometry=geometry))
    sd = DenseForest2DMGSolver(tree, MGConfig(operator=operator,
                                              smoother="gsrb",
                                              coarse_solver=coarse,
                                              geometry=geometry))
    if not all(tree.periodic):
        sb.set_bc(IPHI, BCType.DIRICHLET, fn=bc_fn)
        sd.set_bc(0, BCType.DIRICHLET, fn=bc_fn)
    st_b = sb.allocate()
    st_d = sd.allocate()
    rng = np.random.default_rng(seed)
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
        assert not dense_amr2d_supported(t, cfg), kind
        assert dense_forest2d_supported(t, cfg), kind
        assert isinstance(make_solver(t, cfg), DenseForest2DMGSolver), kind
    # uniform 2D tree keeps the dense 2D path
    ut = build_rectangle(2, np.full(2, 16), 8, np.full(2, 1.0 / 16),
                         np.zeros(2))
    assert not dense_forest2d_supported(ut, cfg)


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
    sb, st_b, sd, st_d = setup_pair("L")
    lam = jnp.asarray(0.0, jnp.float64)
    top = sb.levels[-1]
    st_b = sb._update_coarse(st_b, sb._to_device(), top, lam)
    st_d = sd._update_coarse(st_d, top, lam)
    img = np.zeros_like(_mask(sd, top - 1))
    for clo, chi in sd._image_rects(top):
        img[clo[1]:chi[1], clo[0]:chi[0]] = True
    for key, iv in (("phi", IPHI), ("rhs", IRHS), ("iold", IOLD)):
        ref = boxed_to_canvas(sb, sd, st_b, top - 1, iv)
        got = np.asarray(sd.interior(st_d, top - 1, key))
        if key == "iold":
            ref, got = ref * img, got * img
        else:
            m = _mask(sd, top - 1)
            ref, got = ref * m, got * m
        # ~1 ulp of the tau-corrected rhs magnitude (matmul-restriction
        # summation order vs the boxed reduce)
        scale = max(np.max(np.abs(ref)), 1.0)
        np.testing.assert_allclose(got, ref, rtol=0, atol=5e-13 * scale,
                                   err_msg=f"update_coarse {key}")


def test_correct_children_matches():
    sb, st_b, sd, st_d = setup_pair("L", seed=11)
    lam = jnp.asarray(0.0, jnp.float64)
    top = sb.levels[-1]
    lvl_c = top - 1
    rng = np.random.default_rng(4)
    nb = sb.static[lvl_c]["n_boxes"]
    nc = sb.static[lvl_c]["nc"]
    isl = (slice(None),) + (slice(1, -1),) * 2
    iold = rng.normal(size=(nb,) + (nc,) * 2)
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


def test_forest2d_convergence():
    """Manufactured solution on the 2D L forest: FMG converges the leaf
    error to the discretization level."""
    t = forest_tree("L")
    sd = make_solver(t, MGConfig(operator="laplacian"))
    assert isinstance(sd, DenseForest2DMGSolver)
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


def test_forest2d_gspmd_sharded_matches_single():
    """GSPMD y-slab placement distributes the 2D forest cycle (pure
    XLA): sharded == single on the 8-device CPU mesh."""
    import jax
    from jax.sharding import Mesh

    t = forest_tree("L")
    results = {}
    for shard in (False, True):
        sd = make_solver(t, MGConfig(operator="laplacian"))
        assert isinstance(sd, DenseForest2DMGSolver)
        sd.set_bc(0, BCType.DIRICHLET, fn=solution)
        st = sd.allocate()
        rng = np.random.default_rng(21)
        top = sd.levels[-1]
        for lvl in sd.levels:
            X, Y = sd.dims[lvl]
            st = sd.set_interior(st, lvl, "rhs",
                                 jnp.asarray(rng.normal(size=(Y, X))))
        if shard:
            mesh = Mesh(np.array(jax.devices()[:8]), ("y",))
            st = sd.shard_state(st, mesh, min_local=8)
            assert any(sd.y_sharded[l] for l in sd.levels)
        st, res = sd.fas_fmg(st)
        results[shard] = (np.asarray(sd.interior(st, top, "phi"))
                          * _mask(sd, top), float(res))
    a, b = results[False][0], results[True][0]
    scale = max(np.max(np.abs(a)), 1e-30)
    assert np.max(np.abs(a - b)) <= 1e-12 * scale, (
        f"GSPMD forest diff {np.max(np.abs(a - b))}")
    assert abs(results[False][1] - results[True][1]) <= 1e-10 * max(
        1.0, results[False][1])


# ---------------------------------------------------------------------------
# cylindrical (r, z) geometry on forests (box_clpl/box_gs_clpl,
# m_laplacian.f90:197-271 — the radial face weights ride the canvas
# columns at the canvas offset)
# ---------------------------------------------------------------------------

def test_cylindrical_forest_gating():
    cfg = MGConfig(operator="laplacian", geometry="cylindrical")
    t = forest_tree("L")
    assert dense_forest2d_supported(t, cfg)
    assert isinstance(make_solver(t, cfg), DenseForest2DMGSolver)
    # cylindrical is laplacian-only (the reference has no cyl helmholtz)
    assert not dense_forest2d_supported(
        t, MGConfig(operator="helmholtz", geometry="cylindrical"))


def test_cylindrical_forest_smooth_residual_bitwise():
    sb, st_b, sd, st_d = setup_pair("L", geometry="cylindrical")
    lam = jnp.asarray(0.0, jnp.float64)
    lvl = sb.levels[-1]
    st_b2 = sb._smooth_boxes(st_b, sb._to_device(), lvl, 1, lam)
    st_d2 = sd._smooth(st_d, lvl, 1, lam)
    m = _mask(sd, lvl)
    ref = boxed_to_canvas(sb, sd, st_b2, lvl, IPHI)
    got = np.asarray(sd.interior(st_d2, lvl, "phi")) * m
    assert np.array_equal(got, ref * m), (
        f"max diff {np.max(np.abs(got - ref * m))}")
    st_b3 = sb._residual_lvl(st_b, sb._to_device(), lvl, lam)
    st_d3 = sd._residual(st_d, lvl, lam)
    ref_r = boxed_to_canvas(sb, sd, st_b3, lvl, IRES)
    got_r = np.asarray(sd.interior(st_d3, lvl, "ires")) * m
    assert np.array_equal(got_r, ref_r * m)


def test_cylindrical_forest_vcycle():
    sb, st_b, sd, st_d = setup_pair("two", geometry="cylindrical")
    st_b2, res_b = sb.fas_vcycle(st_b)
    st_d2, res_d = sd.fas_vcycle(st_d)
    lvl = sb.levels[-1]
    m = _mask(sd, lvl)
    ref = boxed_to_canvas(sb, sd, st_b2, lvl, IPHI) * m
    got = np.asarray(sd.interior(st_d2, lvl, "phi")) * m
    scale = max(float(np.max(np.abs(ref))), 1e-30)
    assert np.max(np.abs(got - ref)) <= 1e-13 * scale
    assert abs(float(res_b) - float(res_d)) <= 1e-12 * float(res_b)
