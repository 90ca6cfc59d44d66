"""Dense 2D fast path vs the boxed solver.

Cartesian phases must be *bit-identical* to the boxed path (same
per-cell arithmetic in the same order — ops/dense2d mirrors
kernels.helmholtz_smooth_half / vhelmholtz / ahelmholtz).  Cylindrical
is compared at ~1 ulp tolerance: the radial face weights associate
``r_min + dr*i`` differently (global vs per-box) so the products differ
in the last bit.  Also covers the probed direct coarse solve, FMG
convergence on manufactured solutions (tests/test_uniform_grid.f90
semantics in 2D), rectangular domains, and periodic wrap.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from octree_mg_tpu import (IPHI, IRES, IRHS, IVEPS, BCType,
                           Dense2DMGSolver, MGConfig, MGSolver,
                           build_rectangle, dense2d_supported,
                           make_solver)

N_MODES = 2
N_EPS = {"laplacian": 0, "helmholtz": 0, "vlaplacian": 1,
         "vhelmholtz": 1, "ahelmholtz": 2}


def solution(x):
    out = 1.0
    for d in range(x.shape[-1]):
        out = out * np.sin(2 * np.pi * N_MODES * x[..., d])
    return out


def boxed_to_dense2d(solver_b, state_b, lvl, iv):
    """Assemble the dense interior [Y, X] from a boxed level array."""
    t = solver_b.tree
    nc = t.box_size_lvl[lvl]
    dsz = t.domain_size_lvl[lvl]
    out = np.zeros((dsz[1], dsz[0]))
    arr = np.asarray(state_b["cc"][lvl][iv])
    for loc, b in enumerate(t.lvls[lvl].ids):
        ix = t.ix[b] - 1
        sl = tuple(slice(ix[d] * nc, (ix[d] + 1) * nc) for d in (1, 0))
        out[sl] = arr[loc][(slice(1, -1),) * 2]
    return out


def setup_pair(operator="laplacian", size=(32, 32), box=8,
               periodic=False, coarse="smooth", geometry="cartesian",
               r_min=(0.0, 0.0), seed=3):
    dsz = np.asarray(size)
    tree = build_rectangle(2, dsz, box, 1.0 / dsz, np.asarray(r_min),
                           periodic=[periodic] * 2)
    cfg_b = MGConfig(operator=operator, smoother="gsrb",
                     geometry=geometry)
    cfg_d = MGConfig(operator=operator, smoother="gsrb",
                     geometry=geometry, coarse_solver=coarse)
    sb = MGSolver(tree, cfg_b)
    sd = Dense2DMGSolver(tree, cfg_d)
    if not periodic:
        sb.set_bc(IPHI, BCType.DIRICHLET, fn=solution)
        sd.set_bc(0, BCType.DIRICHLET, fn=solution)
    st_b = sb.allocate()
    st_d = sd.allocate()
    rng = np.random.default_rng(seed)
    n_eps = N_EPS[operator]
    for lvl in sb.levels:
        nb = sb.static[lvl]["n_boxes"]
        nc = sb.static[lvl]["nc"]
        isl = (slice(None),) + (slice(1, -1),) * 2
        fields = {IPHI: rng.normal(size=(nb, nc, nc)),
                  IRHS: rng.normal(size=(nb, nc, nc))}
        for d in range(n_eps):
            fields[IVEPS + d] = 0.5 + rng.random(size=(nb, nc, nc))
        for iv, vals in fields.items():
            st_b["cc"][lvl] = st_b["cc"][lvl].at[(iv,) + isl].set(vals)
    for iv in [IPHI, IRHS] + [IVEPS + d for d in range(n_eps)]:
        st_b = sb.fill_ghost(st_b, iv)
    kmap = {"phi": IPHI, "rhs": IRHS}
    for d in range(n_eps):
        kmap[f"eps{d}"] = IVEPS + d
    for lvl in sd.levels:
        for k, iv in kmap.items():
            vals = boxed_to_dense2d(sb, st_b, lvl, iv)
            st_d = sd.set_interior(st_d, lvl, k, jnp.asarray(vals))
    return sb, st_b, sd, st_d


@pytest.mark.parametrize("operator", ["laplacian", "helmholtz",
                                      "vlaplacian", "ahelmholtz"])
@pytest.mark.parametrize("periodic", [False, True])
def test_smooth_bitwise(operator, periodic):
    """One dense 2D smoothing pair == boxed smooth_boxes(1) bitwise."""
    sb, st_b, sd, st_d = setup_pair(operator, periodic=periodic)
    lam = jnp.asarray(0.6 if operator.endswith("helmholtz") else 0.0,
                      jnp.float64)
    top = sb.levels[-1]
    st_b = sb._smooth_boxes(st_b, sb._to_device(), top, 1, lam)
    st_d = sd._smooth(st_d, top, 1, lam)
    ref = boxed_to_dense2d(sb, st_b, top, IPHI)
    got = np.asarray(sd.interior(st_d, top, "phi"))
    assert np.array_equal(got, ref), (
        f"max diff {np.max(np.abs(got - ref))}")


@pytest.mark.parametrize("operator", ["helmholtz", "vhelmholtz"])
def test_residual_bitwise(operator):
    sb, st_b, sd, st_d = setup_pair(operator)
    lam = jnp.asarray(0.7, jnp.float64)
    top = sb.levels[-1]
    st_b = sb._residual_lvl(st_b, sb._to_device(), top, lam)
    st_d = sd._residual(st_d, top, lam)
    ref = boxed_to_dense2d(sb, st_b, top, IRES)
    got = np.asarray(sd.interior(st_d, top, "ires"))
    assert np.array_equal(got, ref)


def test_smooth_cylindrical_close():
    """Cylindrical smoothing pair matches boxed to ~1 ulp (the radial
    weights associate r_min + dr*i differently)."""
    sb, st_b, sd, st_d = setup_pair("laplacian", geometry="cylindrical",
                                    r_min=(1.0, 0.0))
    lam = jnp.asarray(0.0, jnp.float64)
    top = sb.levels[-1]
    st_b = sb._smooth_boxes(st_b, sb._to_device(), top, 1, lam)
    st_d = sd._smooth(st_d, top, 1, lam)
    ref = boxed_to_dense2d(sb, st_b, top, IPHI)
    got = np.asarray(sd.interior(st_d, top, "phi"))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-13)


@pytest.mark.parametrize("operator,geometry", [
    ("laplacian", "cartesian"), ("vhelmholtz", "cartesian"),
    ("ahelmholtz", "cartesian"), ("laplacian", "cylindrical")])
def test_vcycle_equivalent(operator, geometry):
    """Full FAS V-cycle matches the boxed path to ~1 ulp."""
    r_min = (1.0, 0.0) if geometry == "cylindrical" else (0.0, 0.0)
    sb, st_b, sd, st_d = setup_pair(operator, coarse="smooth",
                                    geometry=geometry, r_min=r_min)
    lam = 0.4 if operator.endswith("helmholtz") else 0.0
    st_b, res_b = sb.fas_vcycle(st_b, lam=lam)
    st_d, res_d = sd.fas_vcycle(st_d, lam=lam)
    top = sb.levels[-1]
    ref = boxed_to_dense2d(sb, st_b, top, IPHI)
    got = np.asarray(sd.interior(st_d, top, "phi"))
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(got - ref)) <= 1e-13 * scale
    assert abs(float(res_b) - float(res_d)) <= 1e-12 * max(
        1.0, abs(float(res_b)))


@pytest.mark.parametrize("periodic", [False, True])
def test_fmg_manufactured(periodic):
    """FMG reaches discretization accuracy (1 cycle) and machine error
    on a discretely-generated rhs (test_uniform_grid.f90 semantics)."""
    size = np.array([64, 32])  # rectangular
    tree = build_rectangle(2, size, 8, 1.0 / size, np.zeros(2),
                           periodic=[periodic] * 2)
    sd = Dense2DMGSolver(tree, MGConfig(operator="laplacian"))
    if not periodic:
        sd.set_bc(0, BCType.DIRICHLET, fn=solution)
    st = sd.allocate()
    # rhs = A(exact) so the discrete solution IS the manufactured one
    for lvl in sd.levels:
        x = sd.cell_centers(lvl)
        st = sd.set_interior(st, lvl, "phi", jnp.asarray(solution(x)))
    st = sd.apply_operator(st, lam=0.0, out_key="rhs")
    for lvl in sd.levels:
        st = sd.set_interior(st, lvl, "phi",
                             jnp.zeros_like(sd.interior(st, lvl, "phi")))
    residuals = []
    for i in range(10):
        st, res = sd.fas_fmg(st, have_guess=(i > 0))
        residuals.append(float(res))
    assert isinstance(sd._direct, dict)
    top = sd.levels[-1]
    x = sd.cell_centers(top)
    exact = solution(x)
    if periodic:
        exact = exact - exact.mean()
    err = np.max(np.abs(np.asarray(sd.interior(st, top, "phi")) - exact))
    # ~10x/cycle contraction, no floor (measured 5e-13 at 10 cycles
    # non-periodic); the bar leaves one cycle of slack
    assert err < 1e-11, f"solution error {err}"
    # pre-floor contraction >= 8x per cycle
    rate = (residuals[0] / residuals[2]) ** 0.5
    assert rate > 8.0, f"FMG contraction {rate}"


def test_fmg_vcoeff_converges():
    size = np.full(2, 64)
    tree = build_rectangle(2, size, 8, 1.0 / size, np.zeros(2))
    sd = make_solver(tree, MGConfig(operator="vhelmholtz"))
    assert isinstance(sd, Dense2DMGSolver)
    sd.set_bc(0, BCType.DIRICHLET, fn=solution)
    st = sd.allocate()
    x = sd.cell_centers(sd.levels[-1])
    eps = 1.0 + 0.5 * np.cos(2 * np.pi * x[..., 0])
    st = sd.set_coefficient(st, jnp.asarray(eps))
    st = sd.prepare_coefficient(st)
    lam = 1.5
    for lvl in sd.levels:
        x = sd.cell_centers(lvl)
        st = sd.set_interior(st, lvl, "phi", jnp.asarray(solution(x)))
    st = sd.apply_operator(st, lam=lam, out_key="rhs")
    for lvl in sd.levels:
        st = sd.set_interior(st, lvl, "phi",
                             jnp.zeros_like(sd.interior(st, lvl, "phi")))
    st, res0 = sd.fas_fmg(st, lam=lam)
    for _ in range(5):
        st, res = sd.fas_fmg(st, lam=lam, have_guess=True)
    top = sd.levels[-1]
    x = sd.cell_centers(top)
    err = np.max(np.abs(np.asarray(sd.interior(st, top, "phi"))
                        - solution(x)))
    assert err < 1e-9, f"solution error {err}"
    assert float(res) < float(res0) * 1e-4


def test_cylindrical_solve_second_order():
    """Manufactured cylindrical solve (test_cylindrical.py problem) on
    the dense 2D path reaches the same discretization error."""
    def sol_fn(x):
        return x[..., 0] ** 2 * np.sin(2 * np.pi * x[..., 1])

    def rhs_fn(x):
        r, z = x[..., 0], x[..., 1]
        return (4.0 - (2 * np.pi) ** 2 * r ** 2) * np.sin(2 * np.pi * z)

    errs = []
    for size in (32, 64):
        dsz = np.full(2, size)
        tree = build_rectangle(2, dsz, 8, 1.0 / dsz,
                               np.array([1.0, 0.0]))
        sd = make_solver(tree, MGConfig(operator="laplacian",
                                        geometry="cylindrical"))
        assert isinstance(sd, Dense2DMGSolver)
        sd.set_bc(0, BCType.DIRICHLET, fn=sol_fn)
        st = sd.allocate()
        for lvl in sd.levels:
            x = sd.cell_centers(lvl)
            st = sd.set_interior(st, lvl, "rhs", jnp.asarray(rhs_fn(x)))
        for i in range(8):
            st, res = sd.fas_fmg(st, have_guess=(i > 0))
        top = sd.levels[-1]
        x = sd.cell_centers(top)
        err = np.max(np.abs(np.asarray(sd.interior(st, top, "phi"))
                            - sol_fn(x)))
        errs.append(err)
    assert errs[0] / errs[1] > 3.5  # second order


def test_supported_gating():
    dsz = np.full(2, 16)
    tree = build_rectangle(2, dsz, 8, 1.0 / dsz, np.zeros(2))
    assert dense2d_supported(tree, MGConfig())
    assert dense2d_supported(tree, MGConfig(operator="ahelmholtz"))
    assert not dense2d_supported(tree, MGConfig(smoother="jacobi"))
    assert not dense2d_supported(tree, MGConfig(operator="vhelmholtz",
                                                geometry="cylindrical"))
    tree3 = build_rectangle(3, np.full(3, 16), 8, np.full(3, 1 / 16.),
                            np.zeros(3))
    assert not dense2d_supported(tree3, MGConfig())
