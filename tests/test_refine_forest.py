"""f64-class iterative refinement on AMR / forest trees
(solve/refine_forest).

CPU x64 available: the refined double-float solution is validated
against the TRUE float64 composite residual of the same represented
solution, evaluated by an independent formulation (the f64 forest
solver's ring-written ghost machinery) — leaf cells only, with coarse
non-leaf cells holding the restriction of the fine solution (the
reference's converged state, update_coarse m_multigrid.f90:369-383).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from octree_mg_tpu import (BCType, MGConfig, build_amr_centered,
                           build_rectangle)
from octree_mg_tpu.core import tree as tm
from octree_mg_tpu.ops.df32 import split_f64
from octree_mg_tpu.solve.dense import _ISL
from octree_mg_tpu.solve.dense_forest import DenseForestMGSolver
from octree_mg_tpu.solve.refine_forest import RefinedForestPoisson


def _refine(t, lvl, pred):
    ids = t.lvls[lvl].ids
    pick = [int(b) for b in ids if pred(t.ix[int(b)])]
    tm.add_children_bulk(t, np.array(pick, np.int64))
    tm.set_leaves_parents(t, lvl)
    tm.set_next_level_ids(t, lvl)
    tm.set_neighbors_lvl(t, lvl + 1)


def mk_tree(kind):
    if kind == "L":
        # L-shaped (non-rectangular) lvl-2 footprint + corner lvl 3
        t = build_rectangle(3, [16] * 3, 4, [1 / 16.] * 3, [0] * 3)
        _refine(t, 1, lambda ix: ix[0] <= 2 or ix[1] <= 2)
        _refine(t, 2, lambda ix: np.all(ix <= 2))
        tm.finalize_amr(t, 3)
    elif kind == "amr3":
        # the reference AMR test's centered 3-level tree (rectangular
        # patches — the dense-AMR shape, run through the forest solver)
        t = build_amr_centered(3, 3, np.full(3, 16), 4,
                               np.full(3, 1.0 / 16))
    else:
        raise ValueError(kind)
    return t


def mk_solver(kind, operator="laplacian", dtype=jnp.float32):
    sv = DenseForestMGSolver(mk_tree(kind),
                             MGConfig(operator=operator, dtype=dtype))
    sv.set_bc(0, BCType.DIRICHLET, 0.0)
    return sv


def rhs_fields(sv, seed):
    rng = np.random.default_rng(seed)
    out = {}
    for lvl in sv.levels:
        X, Y, Z = sv.dims[lvl]
        out[lvl] = rng.normal(size=(Z, Y, X))
    return out


def f64_leaf_residual(kind, operator, lam, x_pairs, rhs64, ref):
    """True float64 composite residual at leaf cells: an independent
    f64 forest solver evaluates A(x) with its own (ring-written) ghost
    machinery on the represented solution."""
    sv = mk_solver(kind, operator, dtype=jnp.float64)
    st = sv.allocate()
    for lvl in sv.levels:
        xh, xl = x_pairs[lvl]
        x64 = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
        st = sv.set_interior(st, lvl, "phi", jnp.asarray(x64))
        st = sv.set_interior(st, lvl, "rhs", jnp.asarray(rhs64[lvl]))
    lam_a = sv._lam(lam)
    worst = 0.0
    for lvl in sv.levels:
        st = sv._residual(st, lvl, lam_a)
        r = np.asarray(st["ires"][lvl][_ISL])
        worst = max(worst, float(np.max(np.abs(
            r * np.asarray(ref.leaf_mask[lvl])))))
    return worst


@pytest.mark.parametrize("kind,operator,lam", [
    ("L", "laplacian", 0.0),
    ("L", "helmholtz", 0.37),
    ("amr3", "laplacian", 0.0),
])
def test_refined_forest_reaches_f64_class(kind, operator, lam):
    """The outer leaf residual contracts past the f32 floor to the
    1e-10-relative class on composite AMR discretizations — VERDICT r3
    task 2b (the reference is f64 on every tree,
    m_data_structures.f90:8)."""
    sv = mk_solver(kind, operator)
    ref = RefinedForestPoisson(sv, lam=lam)
    st = sv.allocate()
    rhs64 = rhs_fields(sv, seed=5)
    rh = {lvl: split_f64(rhs64[lvl])[0] for lvl in sv.levels}
    rl = {lvl: split_f64(rhs64[lvl])[1] for lvl in sv.levels}
    x_pairs, norms, st = ref.solve(st, rh, rl, n_outer=9)
    assert norms[-1] <= 1e-9 * norms[0], norms
    # independent f64 ground truth (ring-written ghost machinery)
    worst = f64_leaf_residual(kind, operator, lam, x_pairs, rhs64, ref)
    assert worst <= 1e-7 * norms[0], (worst, norms)


def test_refined_forest_inhomogeneous_bc():
    """True boundary values ride the outer residual only; the converged
    x satisfies the inhomogeneous composite operator in f64."""
    bvals = [0.5, -0.25, 0.1, 0.3, 0.0, 1.0]
    sv = mk_solver("L")
    ref = RefinedForestPoisson(sv, bc_values=bvals)
    st = sv.allocate()
    rhs64 = rhs_fields(sv, seed=7)
    rh = {lvl: split_f64(rhs64[lvl])[0] for lvl in sv.levels}
    rl = {lvl: split_f64(rhs64[lvl])[1] for lvl in sv.levels}
    x_pairs, norms, st = ref.solve(st, rh, rl, n_outer=9)
    assert norms[-1] <= 1e-9 * norms[0], norms
    # f64 check against a solver carrying the TRUE boundary values
    sv64 = DenseForestMGSolver(mk_tree("L"),
                               MGConfig(operator="laplacian",
                                        dtype=jnp.float64))
    for nb, v in enumerate(bvals):
        sv64.set_bc(0, BCType.DIRICHLET, v, nb=nb)
    st64 = sv64.allocate()
    for lvl in sv64.levels:
        xh, xl = x_pairs[lvl]
        x64 = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
        st64 = sv64.set_interior(st64, lvl, "phi", jnp.asarray(x64))
        st64 = sv64.set_interior(st64, lvl, "rhs",
                                 jnp.asarray(rhs64[lvl]))
    lam_a = sv64._lam(0.0)
    worst = 0.0
    for lvl in sv64.levels:
        st64 = sv64._residual(st64, lvl, lam_a)
        r = np.asarray(st64["ires"][lvl][_ISL])
        worst = max(worst, float(np.max(np.abs(
            r * np.asarray(ref.leaf_mask[lvl])))))
    assert worst <= 1e-7 * norms[0], (worst, norms)
    # misconfiguration: nonzero inner b rejected
    svbad = DenseForestMGSolver(mk_tree("L"), MGConfig())
    svbad.cfg.dtype = jnp.float32
    with pytest.raises(ValueError):
        svbad2 = mk_solver("L")
        svbad2.set_bc(0, BCType.DIRICHLET, 0.5)
        RefinedForestPoisson(svbad2)


def test_refined_forest_gate():
    # non-power-of-two spacing rejected
    t = build_rectangle(3, [24] * 3, 4, [1 / 24.] * 3, [0] * 3)
    _refine(t, 1, lambda ix: ix[0] <= 2)
    tm.finalize_amr(t, 2)
    sv = DenseForestMGSolver(t, MGConfig(operator="laplacian",
                                         dtype=jnp.float32))
    sv.set_bc(0, BCType.DIRICHLET, 0.0)
    with pytest.raises(ValueError, match="power of two"):
        RefinedForestPoisson(sv)
    # f64 inner solver rejected
    sv2 = mk_solver("L", dtype=jnp.float64)
    with pytest.raises(ValueError, match="f32"):
        RefinedForestPoisson(sv2)


@pytest.mark.parametrize("kind,operator,lam,neps", [
    ("L", "vlaplacian", 0.0, 1),
    ("L", "vhelmholtz", 0.41, 1),
    ("amr3", "ahelmholtz", 0.27, 3),
])
def test_refined_forest_vcoeff_f64_class(kind, operator, lam, neps):
    """Variable-coefficient composite refinement (df pair arithmetic:
    harmonic-mean face coefficients via Dekker mul2/div2, eps rb ghosts
    coarse-interpolated like phi — VERDICT r4 item 3).  The independent
    f64 forest solver (given the same per-level eps) confirms the leaf
    residual well under the 1e-9-relative target."""
    sv = mk_solver(kind, operator)
    rng = np.random.default_rng(5)
    rhs64, eps64 = {}, {}
    for lvl in sv.levels:
        X, Y, Z = sv.dims[lvl]
        rhs64[lvl] = rng.normal(size=(Z, Y, X))
        eps64[lvl] = [0.5 + rng.random((Z, Y, X)) for _ in range(neps)]
    ref = RefinedForestPoisson(sv, lam=lam, eps=eps64)
    st = sv.allocate()
    rh = {l: split_f64(rhs64[l])[0] for l in sv.levels}
    rl = {l: split_f64(rhs64[l])[1] for l in sv.levels}
    x_pairs, norms, st = ref.solve(st, rh, rl, n_outer=10)
    assert norms[-1] <= 1e-10 * norms[0], norms
    sv6 = mk_solver(kind, operator, dtype=jnp.float64)
    st6 = sv6.allocate()
    for lvl in sv6.levels:
        xh, xl = x_pairs[lvl]
        x64 = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
        st6 = sv6.set_interior(st6, lvl, "phi", jnp.asarray(x64))
        st6 = sv6.set_interior(st6, lvl, "rhs", jnp.asarray(rhs64[lvl]))
        for i in range(neps):
            st6 = sv6.set_interior(st6, lvl, f"eps{i}",
                                   jnp.asarray(eps64[lvl][i]))
    lam_a = sv6._lam(lam)
    worst = 0.0
    for lvl in sv6.levels:
        st6 = sv6._residual(st6, lvl, lam_a)
        r = np.asarray(st6["ires"][lvl][_ISL])
        worst = max(worst, float(np.max(np.abs(
            r * np.asarray(ref.leaf_mask[lvl])))))
    assert worst <= 1e-9 * norms[0], (worst, norms)


# ---------------------------------------------------------------------------
# 2D trees (RefinedForest2DPoisson) — VERDICT r4 item 4
# ---------------------------------------------------------------------------

from octree_mg_tpu.solve.dense_forest2d import (  # noqa: E402
    DenseForest2DMGSolver)
from octree_mg_tpu.solve.refine_forest import (  # noqa: E402
    RefinedForest2DPoisson)


def mk_tree_2d():
    """L-shaped 3-level quadtree (concave footprint, rb conflicts)."""
    t = build_rectangle(2, [32] * 2, 4, [1 / 32.] * 2, [0] * 2)
    _refine(t, 1, lambda ix: ix[0] <= 3 or ix[1] <= 3)
    _refine(t, 2, lambda ix: np.all(ix[:2] <= 3))
    tm.finalize_amr(t, 3)
    return t


def mk_solver_2d(operator="laplacian", dtype=jnp.float32):
    sv = DenseForest2DMGSolver(mk_tree_2d(),
                               MGConfig(operator=operator, dtype=dtype))
    sv.set_bc(0, BCType.DIRICHLET, 0.0)
    return sv


def f64_leaf_residual_2d(operator, lam, x_pairs, rhs64, eps64, ref):
    sv = mk_solver_2d(operator, dtype=jnp.float64)
    st = sv.allocate()
    for lvl in sv.levels:
        xh, xl = x_pairs[lvl]
        x64 = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
        st = sv.set_interior(st, lvl, "phi", jnp.asarray(x64))
        st = sv.set_interior(st, lvl, "rhs", jnp.asarray(rhs64[lvl]))
        for i in range(len(eps64.get(lvl, []))):
            st = sv.set_interior(st, lvl, f"eps{i}",
                                 jnp.asarray(eps64[lvl][i]))
    lam_a = sv._lam(lam)
    worst = 0.0
    for lvl in sv.levels:
        st = sv._residual(st, lvl, lam_a)
        r = np.asarray(st["ires"][lvl])
        worst = max(worst, float(np.max(np.abs(
            r * np.asarray(ref.leaf_mask[lvl])))))
    return worst


@pytest.mark.parametrize("operator,lam,neps", [
    ("laplacian", 0.0, 0),
    ("helmholtz", 0.41, 0),
    ("vlaplacian", 0.0, 1),
])
def test_refined_forest2d_f64_class(operator, lam, neps):
    """2D composite refinement reaches the f64 class on an L-quadtree
    (the reference's 2D AMR is f64 like everything else)."""
    sv = mk_solver_2d(operator)
    rng = np.random.default_rng(5)
    rhs64, eps64 = {}, {}
    for lvl in sv.levels:
        X, Y = sv.dims[lvl]
        rhs64[lvl] = rng.normal(size=(Y, X))
        eps64[lvl] = [0.5 + rng.random((Y, X)) for _ in range(neps)]
    ref = RefinedForest2DPoisson(sv, lam=lam,
                                 eps=eps64 if neps else None)
    st = sv.allocate()
    rh = {l: split_f64(rhs64[l])[0] for l in sv.levels}
    rl = {l: split_f64(rhs64[l])[1] for l in sv.levels}
    x_pairs, norms, st = ref.solve(st, rh, rl, n_outer=10)
    assert norms[-1] <= 1e-10 * norms[0], norms
    worst = f64_leaf_residual_2d(operator, lam, x_pairs, rhs64,
                                 eps64 if neps else {}, ref)
    assert worst <= 1e-9 * norms[0], (worst, norms)


def test_solve_refined_routes_2d_amr():
    """Round-4 verdict Missing #3 regression: a 2-level 2D AMR tree
    through solve_refined used to die on an opaque 2D-df32-gate assert;
    it must now solve to the f64 class (transparent forest rebuild)."""
    from octree_mg_tpu import build_amr_centered, make_solver
    from octree_mg_tpu.solve.dense_amr2d import Dense2DAMRMGSolver
    from octree_mg_tpu.solve.refine import solve_refined
    tree = build_amr_centered(2, 2, np.full(2, 32), 8,
                              np.full(2, 1.0 / 32))
    sv = make_solver(tree, MGConfig(operator="laplacian",
                                    dtype=jnp.float32))
    assert isinstance(sv, Dense2DAMRMGSolver)
    sv.set_bc(0, BCType.DIRICHLET, 0.0)
    st = sv.allocate()
    rng = np.random.default_rng(5)
    rhs64 = {}
    for lvl in sv.levels:
        X, Y = sv.dims[lvl]
        rhs64[lvl] = rng.normal(size=(Y, X))
    rh = {l: split_f64(rhs64[l])[0] for l in rhs64}
    rl = {l: split_f64(rhs64[l])[1] for l in rhs64}
    x_pairs, norms, _ = solve_refined(sv, st, rh, rl, n_outer=8)
    assert norms[-1] <= 1e-10 * norms[0], norms


def test_refined_forest_gspmd_sharded_matches_single():
    """f64-class refinement composed with the GSPMD-sharded forest
    state (round-4 verdict item 6): the inner FMG distributes (overlay
    formulation, z-slabs), the outer df step runs replicated (sharding
    its ext-scatter/strip chains miscompiles — the documented jax-CPU
    partitioner family; the replicated rendering is bitwise).  The
    reference is f64 at every rank count (m_data_structures.f90:8)."""
    import jax
    from jax.sharding import Mesh
    t = build_rectangle(3, [32] * 3, 4, [1 / 32.] * 3, [0] * 3)
    _refine(t, 1, lambda ix: ix[0] <= 4 or ix[1] <= 4)
    tm.finalize_amr(t, 2)

    def mk():
        sv = DenseForestMGSolver(t, MGConfig(operator="laplacian",
                                             dtype=jnp.float32))
        sv.set_bc(0, BCType.DIRICHLET, 0.0)
        return sv

    rng = np.random.default_rng(5)
    rhs64 = {}
    svp = mk()
    for lvl in svp.levels:
        X, Y, Z = svp.dims[lvl]
        rhs64[lvl] = rng.normal(size=(Z, Y, X))
    rh = {l: split_f64(rhs64[l])[0] for l in rhs64}
    rl = {l: split_f64(rhs64[l])[1] for l in rhs64}

    def run(shard):
        sv = mk()
        st = sv.allocate()
        if shard:
            mesh = Mesh(np.array(jax.devices()[:8]), ("z",))
            st = sv.shard_state(st, mesh, min_local=4)
            assert sum(sv.z_sharded[l] for l in sv.levels) >= 1
        return RefinedForestPoisson(sv).solve(st, rh, rl, n_outer=6)[:2]

    xa, na = run(False)
    xb, nb = run(True)
    assert na[-1] <= 1e-8 * na[0], na
    # not bitwise: program shapes differ between the partitioned and
    # single-device compilations and XLA's fma-contraction is only
    # value-stable per program shape (the documented forest-GSPMD
    # class) — bound: f32-ulp-relative per outer norm, 8 ulp of the
    # field scale on the solution pairs
    assert all(abs(a - b) <= 1e-5 * max(a, 1e-30)
               for a, b in zip(na, nb)), (na, nb)
    sv_m = mk()
    masks = {lvl: sv_m.footprint_mask(lvl) for lvl in xa}
    scale = max(float(np.max(np.abs(np.where(
        masks[lvl], np.asarray(xa[lvl][0]), 0.0)))) for lvl in xa)
    tol = 8 * np.finfo(np.float32).eps * scale
    for lvl in xa:
        for c in (0, 1):
            d = float(np.max(np.abs(np.where(
                masks[lvl],
                np.asarray(xa[lvl][c]) - np.asarray(xb[lvl][c]), 0.0))))
            assert d <= tol, (lvl, c, d, tol)


def test_refined_forest_f32_fused_smoother_regression():
    """f32 + kernel-eligible canvases (the fused-canvas smoother
    engages): the refined outer must reach the df32 floor.  Regression
    for the uninitialized-output-pad NaN (Mosaic kernels write core
    tiles only; canvas-edge garbage cells read pads raw in the seg
    kernels — without pad sanitization NaN infected the garbage region
    and, through the df driver's whole-interior pair arithmetic, leaf
    cells after ONE outer)."""
    t = build_rectangle(3, [64] * 3, 4, [1 / 64.] * 3, [0] * 3)
    _refine(t, 1, lambda ix: ix[1] <= 8 or ix[2] <= 8)
    tm.finalize_amr(t, 2)
    sv = DenseForestMGSolver(t, MGConfig(operator="laplacian",
                                         dtype=jnp.float32))
    sv.set_bc(0, BCType.DIRICHLET, 0.0)
    assert sv._seg_desc(sv.levels[-1]) is not None, "gate must engage"
    st = sv.allocate()
    rng = np.random.default_rng(5)
    rh, rl = {}, {}
    for lvl in sv.levels:
        X, Y, Z = sv.dims[lvl]
        rh[lvl], rl[lvl] = split_f64(rng.normal(size=(Z, Y, X)))
    _, norms, _ = RefinedForestPoisson(sv).solve(st, rh, rl, n_outer=8)
    assert all(np.isfinite(norms)), norms
    assert norms[-1] <= 1e-9 * norms[0], norms
