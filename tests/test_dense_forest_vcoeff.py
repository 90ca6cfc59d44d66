"""Variable-coefficient operators on the dense-forest solver.

Round-3 closed the rectangular-AMR vcoeff gap (test_dense_amr_vcoeff);
this extends the same operators — vlaplacian/vhelmholtz/ahelmholtz —
to ARBITRARY forests (L-shaped, multi-patch, periodic exteriors).  The
machinery under test: eps fields ride the forest's ring/face ghost
synthesis (Neumann-zero physical ghosts = own value,
m_vlaplacian.f90:25-28; two-stage sides_rb refinement faces,
m_ghost_cells.f90:769-861; periodic wraps), the kernels consume
identity-coefficient eps planes, and the concave-corner fix-up passes
recompute the harmonic-mean expressions (m_vlaplacian.f90:84-100) with
direction-correct eps ghosts.  Every phase must be bit-identical to the
boxed path; full cycles ~1 ulp.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from octree_mg_tpu import IPHI, IRES, IRHS, IVEPS, MGConfig, MGSolver, \
    make_solver
from octree_mg_tpu.solve.dense_amr import dense_amr_supported
from octree_mg_tpu.solve.dense_forest import (DenseForestMGSolver,
                                              dense_forest_supported)

from test_dense_forest import boxed_to_canvas, forest_tree, solution

N_EPS = {"vlaplacian": 1, "vhelmholtz": 1, "ahelmholtz": 3}


def setup_pair(kind="L", operator="vlaplacian", coarse="smooth", seed=7):
    """Boxed + forest solver pair with identical random phi/rhs and
    positive eps on every level (eps ghosts filled on the boxed side;
    the forest synthesizes them inline)."""
    from octree_mg_tpu import BCType

    tree = forest_tree(kind)
    cfg_kw = dict(operator=operator, smoother="gsrb")
    sb = MGSolver(tree, MGConfig(**cfg_kw))
    sd = DenseForestMGSolver(tree, MGConfig(coarse_solver=coarse,
                                            **cfg_kw))
    if not all(tree.periodic):
        sb.set_bc(IPHI, BCType.DIRICHLET, fn=solution)
        sd.set_bc(0, BCType.DIRICHLET, fn=solution)
    st_b = sb.allocate()
    st_d = sd.allocate()
    rng = np.random.default_rng(seed)
    n_eps = N_EPS[operator]
    for lvl in sb.levels:
        nb = sb.static[lvl]["n_boxes"]
        nc = sb.static[lvl]["nc"]
        isl = (slice(None),) + (slice(1, -1),) * 3
        fields = {IPHI: rng.normal(size=(nb,) + (nc,) * 3),
                  IRHS: rng.normal(size=(nb,) + (nc,) * 3)}
        for d in range(n_eps):
            fields[IVEPS + d] = 0.5 + rng.random(size=(nb,) + (nc,) * 3)
        for iv, vals in fields.items():
            st_b["cc"][lvl] = st_b["cc"][lvl].at[(iv,) + isl].set(vals)
    kmap = {"phi": IPHI, "rhs": IRHS}
    for d in range(n_eps):
        kmap[f"eps{d}"] = IVEPS + d
    for iv in kmap.values():
        st_b = sb.fill_ghost(st_b, iv)
    for lvl in sd.levels:
        for k, iv in kmap.items():
            vals = boxed_to_canvas(sb, sd, st_b, lvl, iv)
            st_d = sd.set_interior(st_d, lvl, k, jnp.asarray(vals))
    return sb, st_b, sd, st_d


def _mask(sd, lvl):
    return sd.footprint_mask(lvl)


def test_gating_and_routing():
    for op in ("vlaplacian", "vhelmholtz", "ahelmholtz"):
        cfg = MGConfig(operator=op)
        for kind in ("L", "two", "periodic"):
            t = forest_tree(kind)
            assert not dense_amr_supported(t, cfg), (op, kind)
            assert dense_forest_supported(t, cfg), (op, kind)
            assert isinstance(make_solver(t, cfg), DenseForestMGSolver)


@pytest.mark.parametrize("kind", ["L", "periodic"])
@pytest.mark.parametrize("operator", ["vlaplacian", "ahelmholtz"])
def test_smooth_bitwise(kind, operator):
    """Canvas smoothing == boxed smooth_boxes bitwise on the footprint,
    including eps ring/plane synthesis and the eps-aware concave-corner
    fix-ups (the L forest has conflicted ring cells)."""
    sb, st_b, sd, st_d = setup_pair(kind, operator)
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
    sb, st_b, sd, st_d = setup_pair(kind, "vhelmholtz")
    lam = jnp.asarray(0.7, jnp.float64)
    lvl = sb.levels[-1]
    st_b = sb._residual_lvl(st_b, sb._to_device(), lvl, lam)
    st_d = sd._residual(st_d, lvl, lam)
    m = _mask(sd, lvl)
    ref = boxed_to_canvas(sb, sd, st_b, lvl, IRES)
    got = np.asarray(sd.interior(st_d, lvl, "ires")) * m
    assert np.array_equal(got, ref * m)


@pytest.mark.parametrize("kind", ["L", "two", "periodic"])
@pytest.mark.parametrize("operator", ["vlaplacian", "vhelmholtz",
                                      "ahelmholtz"])
def test_vcycle_equivalent(kind, operator):
    """Full FAS V-cycle matches the boxed path to ~1 ulp (restriction
    rounding)."""
    sb, st_b, sd, st_d = setup_pair(kind, operator)
    lam = 0.4 if operator != "vlaplacian" else 0.0
    st_b, res_b = sb.fas_vcycle(st_b, lam=lam)
    st_d, res_d = sd.fas_vcycle(st_d, lam=lam)
    for lvl in sd.levels:
        m = _mask(sd, lvl)
        ref = boxed_to_canvas(sb, sd, st_b, lvl, IPHI) * m
        got = np.asarray(sd.interior(st_d, lvl, "phi")) * m
        scale = max(np.max(np.abs(ref)), 1e-30)
        assert np.max(np.abs(got - ref)) <= 5e-13 * scale, (
            f"{kind}/{operator} lvl {lvl}: "
            f"max diff {np.max(np.abs(got - ref))}")
    assert abs(float(res_b) - float(res_d)) <= 1e-11 * max(
        1.0, abs(float(res_b)))


def test_fmg_direct_coarse():
    """FMG with the probed direct coarse solve: the probe captures the
    restricted coarse-level eps (not ones) and converges to the boxed
    answer class."""
    sb, st_b, sd, st_d = setup_pair("L", "vlaplacian", coarse="direct")
    st_b, res_b = sb.fas_fmg(st_b)
    st_d, res_d = sd.fas_fmg(st_d)
    assert float(res_d) <= 2.0 * float(res_b) + 1e-8


# ---------------------------------------------------------------------------
# 2D forests
# ---------------------------------------------------------------------------

def setup_pair2d(kind="L", operator="vlaplacian", coarse="smooth",
                 seed=9):
    from octree_mg_tpu import BCType
    from octree_mg_tpu.solve.dense_forest2d import DenseForest2DMGSolver
    import test_dense_forest2d as f2d

    tree = f2d.forest_tree(kind)
    cfg_kw = dict(operator=operator, smoother="gsrb")
    sb = MGSolver(tree, MGConfig(**cfg_kw))
    sd = DenseForest2DMGSolver(tree, MGConfig(coarse_solver=coarse,
                                              **cfg_kw))
    if not all(tree.periodic):
        sb.set_bc(IPHI, BCType.DIRICHLET, fn=f2d.solution)
        sd.set_bc(0, BCType.DIRICHLET, fn=f2d.solution)
    st_b = sb.allocate()
    st_d = sd.allocate()
    rng = np.random.default_rng(seed)
    n_eps = min(N_EPS[operator], 2)
    for lvl in sb.levels:
        nb = sb.static[lvl]["n_boxes"]
        nc = sb.static[lvl]["nc"]
        isl = (slice(None),) + (slice(1, -1),) * 2
        fields = {IPHI: rng.normal(size=(nb,) + (nc,) * 2),
                  IRHS: rng.normal(size=(nb,) + (nc,) * 2)}
        for d in range(n_eps):
            fields[IVEPS + d] = 0.5 + rng.random(size=(nb,) + (nc,) * 2)
        for iv, vals in fields.items():
            st_b["cc"][lvl] = st_b["cc"][lvl].at[(iv,) + isl].set(vals)
    kmap = {"phi": IPHI, "rhs": IRHS}
    for d in range(n_eps):
        kmap[f"eps{d}"] = IVEPS + d
    for iv in kmap.values():
        st_b = sb.fill_ghost(st_b, iv)
    for lvl in sd.levels:
        for k, iv in kmap.items():
            vals = f2d.boxed_to_canvas(sb, sd, st_b, lvl, iv)
            st_d = sd.set_interior(st_d, lvl, k, jnp.asarray(vals))
    return sb, st_b, sd, st_d


def test_gating_2d():
    from octree_mg_tpu.solve.dense_forest2d import (
        DenseForest2DMGSolver, dense_forest2d_supported)
    import test_dense_forest2d as f2d
    for op in ("vlaplacian", "vhelmholtz", "ahelmholtz"):
        cfg = MGConfig(operator=op)
        t = f2d.forest_tree("L")
        assert dense_forest2d_supported(t, cfg), op
        assert isinstance(make_solver(t, cfg), DenseForest2DMGSolver)


@pytest.mark.parametrize("kind", ["L", "periodic"])
@pytest.mark.parametrize("operator", ["vlaplacian", "ahelmholtz"])
def test_smooth_bitwise_2d(kind, operator):
    """2D canvas smoothing == boxed bitwise, including the eps
    direction-correct neighbor overlays at concave corners."""
    import test_dense_forest2d as f2d
    sb, st_b, sd, st_d = setup_pair2d(kind, operator)
    lam = jnp.asarray(0.0, jnp.float64)
    lvl = sb.levels[-1]
    st_b = sb._smooth_boxes(st_b, sb._to_device(), lvl, 1, lam)
    st_d = sd._smooth(st_d, lvl, 1, lam)
    m = sd.footprint_mask(lvl)
    ref = f2d.boxed_to_canvas(sb, sd, st_b, lvl, IPHI)
    got = np.asarray(sd.interior(st_d, lvl, "phi")) * m
    assert np.array_equal(got, ref * m), (
        f"max diff {np.max(np.abs(got - ref * m))}")


@pytest.mark.parametrize("kind", ["L", "periodic"])
def test_residual_bitwise_2d(kind):
    import test_dense_forest2d as f2d
    sb, st_b, sd, st_d = setup_pair2d(kind, "vhelmholtz")
    lam = jnp.asarray(0.7, jnp.float64)
    lvl = sb.levels[-1]
    st_b = sb._residual_lvl(st_b, sb._to_device(), lvl, lam)
    st_d = sd._residual(st_d, lvl, lam)
    m = sd.footprint_mask(lvl)
    ref = f2d.boxed_to_canvas(sb, sd, st_b, lvl, IRES)
    got = np.asarray(sd.interior(st_d, lvl, "ires")) * m
    assert np.array_equal(got, ref * m)


@pytest.mark.parametrize("kind", ["L", "two", "periodic"])
@pytest.mark.parametrize("operator", ["vlaplacian", "vhelmholtz",
                                      "ahelmholtz"])
def test_vcycle_equivalent_2d(kind, operator):
    import test_dense_forest2d as f2d
    sb, st_b, sd, st_d = setup_pair2d(kind, operator)
    lam = 0.4 if operator != "vlaplacian" else 0.0
    st_b, res_b = sb.fas_vcycle(st_b, lam=lam)
    st_d, res_d = sd.fas_vcycle(st_d, lam=lam)
    for lvl in sd.levels:
        m = sd.footprint_mask(lvl)
        ref = f2d.boxed_to_canvas(sb, sd, st_b, lvl, IPHI) * m
        got = np.asarray(sd.interior(st_d, lvl, "phi")) * m
        scale = max(np.max(np.abs(ref)), 1e-30)
        assert np.max(np.abs(got - ref)) <= 5e-13 * scale, (
            f"{kind}/{operator} lvl {lvl}: "
            f"max diff {np.max(np.abs(got - ref))}")
    assert abs(float(res_b) - float(res_d)) <= 1e-11 * max(
        1.0, abs(float(res_b)))


def test_fmg_direct_coarse_2d():
    sb, st_b, sd, st_d = setup_pair2d("L", "vlaplacian", coarse="direct")
    st_b, res_b = sb.fas_fmg(st_b)
    st_d, res_d = sd.fas_fmg(st_d)
    assert float(res_d) <= 2.0 * float(res_b) + 1e-8


def test_prepare_coefficient_restricts():
    """set_coefficient on the finest level + prepare_coefficient builds
    the coarse eps by footprint restriction (the reference expects eps
    on all levels, m_vhelmholtz.f90:7-10)."""
    t = forest_tree("L")
    sd = DenseForestMGSolver(t, MGConfig(operator="vlaplacian"))
    st = sd.allocate()
    rng = np.random.default_rng(3)
    top = sd.levels[-1]
    vals = 0.5 + rng.random(np.asarray(sd.dims[top])[::-1])
    st = sd.set_coefficient(st, jnp.asarray(vals))
    st = sd.prepare_coefficient(st)
    # coarse image cells = mean of their 8 fine children
    lvl = top - 1
    got = np.asarray(sd.interior(st, lvl, "eps0"))
    fine = vals
    Z, Y, X = fine.shape
    avg = fine.reshape(Z // 2, 2, Y // 2, 2, X // 2, 2).mean((1, 3, 5))
    off_f = sd.offsets[top]
    off_c = sd.offsets[lvl]
    for lo, hi in sd.geom[top].rects:
        clo = (off_f + lo) // 2 - off_c
        chi = (off_f + hi) // 2 - off_c
        win = (slice(int(lo[2]) // 2, int(hi[2]) // 2),
               slice(int(lo[1]) // 2, int(hi[1]) // 2),
               slice(int(lo[0]) // 2, int(hi[0]) // 2))
        np.testing.assert_allclose(
            got[clo[2]:chi[2], clo[1]:chi[1], clo[0]:chi[0]],
            avg[win], rtol=0, atol=1e-14)
