"""Variable-coefficient operators on the dense fast path.

The dense vlaplacian/vhelmholtz/ahelmholtz kernels must be bit-identical
to the boxed path (same harmonic-mean face coefficients, same num/den
accumulation order — kernels.vhelmholtz_smooth_half /
ahelmholtz_smooth_half vs the inline eps-window form in
ops/dense_kernels).  Also covers the probed direct coarse solve, the
Mosaic kernel scaffolding with eps DMA windows (interpret mode), and
the diffusion drivers on the dense path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octree_mg_tpu import (IPHI, IRES, IRHS, IVEPS, BCType, DenseMGSolver,
                           MGConfig, MGSolver, build_rectangle,
                           dense_supported, make_solver)

from test_dense import boxed_to_dense, solution

N_EPS = {"vlaplacian": 1, "vhelmholtz": 1, "ahelmholtz": 3}


def eps_field(x, d=0):
    """Smooth positive coefficient field."""
    return 1.0 + 0.5 * np.cos(2 * np.pi * (x[..., d % x.shape[-1]] + 0.1 * d))


def setup_pair(operator, size=32, box=8, periodic=False, coarse="smooth"):
    dsz = np.full(3, size)
    tree = build_rectangle(3, dsz, box, 1.0 / dsz, np.zeros(3),
                           periodic=[periodic] * 3)
    sb = MGSolver(tree, MGConfig(operator=operator, smoother="gsrb"))
    sd = DenseMGSolver(tree, MGConfig(operator=operator, smoother="gsrb",
                                      coarse_solver=coarse))
    if not periodic:
        sb.set_bc(IPHI, BCType.DIRICHLET, fn=solution)
        sd.set_bc(0, BCType.DIRICHLET, fn=solution)
    st_b = sb.allocate()
    st_d = sd.allocate()
    rng = np.random.default_rng(9)
    n_eps = N_EPS[operator]
    # identical random phi/rhs and positive eps on every level, both paths
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
    for iv in [IPHI, IRHS] + [IVEPS + d for d in range(n_eps)]:
        st_b = sb.fill_ghost(st_b, iv)
    kmap = {"phi": IPHI, "rhs": IRHS}
    for d in range(n_eps):
        kmap[f"eps{d}"] = IVEPS + d
    for lvl in sd.levels:
        for k, iv in kmap.items():
            vals = boxed_to_dense(sb, st_b, lvl, iv)
            st_d = sd.set_interior(st_d, lvl, k, jnp.asarray(vals))
    return sb, st_b, sd, st_d


@pytest.mark.parametrize("operator", ["vlaplacian", "ahelmholtz"])
@pytest.mark.parametrize("periodic", [False, True])
def test_smooth_bitwise(operator, periodic):
    """One dense smoothing pair == boxed smooth_boxes(1) bitwise."""
    sb, st_b, sd, st_d = setup_pair(operator, periodic=periodic)
    lam = jnp.asarray(0.0, jnp.float64)
    top = sb.levels[-1]
    st_b = sb._smooth_boxes(st_b, sb._to_device(), top, 1, lam)
    st_d = sd._smooth(st_d, top, 1, lam)
    ref = boxed_to_dense(sb, st_b, top, IPHI)
    got = np.asarray(sd.interior(st_d, top, "phi"))
    assert np.array_equal(got, ref), (
        f"max diff {np.max(np.abs(got - ref))}")


@pytest.mark.parametrize("operator", ["vhelmholtz", "ahelmholtz"])
def test_residual_bitwise(operator):
    sb, st_b, sd, st_d = setup_pair(operator)
    lam = jnp.asarray(0.7, jnp.float64)
    top = sb.levels[-1]
    st_b = sb._residual_lvl(st_b, sb._to_device(), top, lam)
    st_d = sd._residual(st_d, top, lam)
    ref = boxed_to_dense(sb, st_b, top, IRES)
    got = np.asarray(sd.interior(st_d, top, "ires"))
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("operator", ["vlaplacian", "vhelmholtz",
                                      "ahelmholtz"])
def test_vcycle_equivalent(operator):
    """Full FAS V-cycle matches the boxed path to ~1 ulp (see
    test_dense.test_vcycle_equivalent for why not bitwise)."""
    sb, st_b, sd, st_d = setup_pair(operator, coarse="smooth")
    lam = 0.4 if operator != "vlaplacian" else 0.0
    st_b, res_b = sb.fas_vcycle(st_b, lam=lam)
    st_d, res_d = sd.fas_vcycle(st_d, lam=lam)
    top = sb.levels[-1]
    ref = boxed_to_dense(sb, st_b, top, IPHI)
    got = np.asarray(sd.interior(st_d, top, "phi"))
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(got - ref)) <= 1e-13 * scale
    assert abs(float(res_b) - float(res_d)) <= 1e-12 * max(
        1.0, abs(float(res_b)))


def test_prepare_coefficient_matches_boxed():
    """Dense prepare_coefficient (restriction down the hierarchy)
    produces the boxed prepare_coefficient values."""
    sb, st_b, sd, st_d = setup_pair("vlaplacian")
    # start from the finest-level eps only
    st_b = sb.prepare_coefficient(st_b, IVEPS)
    st_d = sd.prepare_coefficient(st_d)
    for lvl in sd.levels:
        ref = boxed_to_dense(sb, st_b, lvl, IVEPS)
        got = np.asarray(sd.interior(st_d, lvl, "eps0"))
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-14,
                                   err_msg=f"eps at lvl {lvl}")


@pytest.mark.parametrize("operator", ["vhelmholtz", "ahelmholtz"])
def test_fmg_direct_probe_converges(operator):
    """FMG with the probed direct coarse solve reaches discretization
    accuracy on a manufactured variable-coefficient problem."""
    size = 32
    dsz = np.full(3, size)
    tree = build_rectangle(3, dsz, 8, 1.0 / dsz, np.zeros(3))
    sd = DenseMGSolver(tree, MGConfig(operator=operator))
    sd.set_bc(0, BCType.DIRICHLET, fn=solution)
    st = sd.allocate()
    lam = 1.5
    for d in range(sd.n_eps):
        x = sd.cell_centers(sd.levels[-1])
        st = sd.set_coefficient(st, jnp.asarray(eps_field(x, d)), d)
    st = sd.prepare_coefficient(st)
    for lvl in sd.levels:
        x = sd.cell_centers(lvl)
        st = sd.set_interior(st, lvl, "phi", jnp.asarray(solution(x)))
    st = sd.apply_operator(st, lam=lam, out_key="rhs")
    for lvl in sd.levels:
        st = sd.set_interior(st, lvl, "phi",
                             jnp.zeros_like(sd.interior(st, lvl, "phi")))
    st, res0 = sd.fas_fmg(st, lam=lam)
    assert isinstance(sd._direct, dict), "probe direct solve unavailable"
    # anisotropic coefficients contract slower under point smoothing
    # (~6x/cycle measured vs ~13x isotropic) — same physics as the
    # reference; give the ahelmholtz case more cycles
    for _ in range(8 if operator == "ahelmholtz" else 5):
        st, res = sd.fas_fmg(st, lam=lam, have_guess=True)
    top = sd.levels[-1]
    x = sd.cell_centers(top)
    err = np.max(np.abs(np.asarray(sd.interior(st, top, "phi"))
                        - solution(x)))
    assert err < 1e-8, f"solution error {err} after 6 FMG"
    assert float(res) < float(res0) * 1e-4


@pytest.mark.parametrize("n_eps", [1, 3])
def test_stencil_kernels_interpret_eps(n_eps):
    """Mosaic pair / double-pair / apply kernels with eps DMA windows
    (interpret mode) match the jnp fallback (~1 ulp; see
    test_dense.test_stencil_kernels_interpret for why not bitwise)."""
    from octree_mg_tpu.ops import dense_kernels as dk

    dims = (128, 16, 16)
    bc = [(2.0, -1.0, 0.0)] * 6
    cfg = dk.DenseStencilConfig(dims, (1.0, 2.0, 3.0), bc, (False,) * 3,
                                jnp.float64, b_const=[0.5] * 6,
                                interpret=True, n_eps=n_eps)
    assert cfg.use_kernel
    rng = np.random.default_rng(21)
    phi = jnp.asarray(rng.normal(size=cfg.pshape))
    rhs = jnp.asarray(rng.normal(size=cfg.pshape))
    eps = tuple(jnp.asarray(0.5 + rng.random(size=cfg.pshape))
                for _ in range(n_eps))
    lam = jnp.asarray(0.3, jnp.float64)
    planes = [None] * 6
    X, Y, Z = dims
    core = (slice(dk.PZ, dk.PZ + Z), slice(dk.PY, dk.PY + Y),
            slice(None))
    close = lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=0, atol=5e-14)

    a = dk.pair_sweep_dense(cfg, phi, rhs, lam, planes, 0, eps=eps)[core]
    b = dk._pair_jnp(cfg, phi, rhs, lam, planes, 0, eps=eps)[core]
    close(a, b)

    a2 = dk.pair_sweep_dense(cfg, phi, rhs, lam, planes, 0, n_pairs=2,
                             eps=eps)[core]
    mid = dk._pair_jnp(cfg, phi, rhs, lam, planes, 0, eps=eps)
    b2 = dk._pair_jnp(cfg, mid, rhs, lam, planes, 0, eps=eps)[core]
    close(a2, b2)

    ra = dk.stencil_apply_dense(cfg, phi, rhs, lam, planes, True,
                                eps=eps)[core]
    rb = dk._apply_jnp(cfg, phi, rhs, lam, planes, True, eps=eps)[core]
    close(ra, rb)


def test_fused_downsweep_eps():
    """Fused downsweep with eps windows == the separate path."""
    dsz = np.array([256, 16, 16])
    tree = build_rectangle(3, dsz, 8, np.full(3, 1.0 / 256), np.zeros(3))
    sd = DenseMGSolver(tree, MGConfig(operator="vhelmholtz"))
    sd.set_bc(0, BCType.DIRICHLET, fn=solution)
    st = sd.allocate()
    top = sd.levels[-1]
    assert sd._fused_down_ok(top)
    rng = np.random.default_rng(13)
    for lvl in (top, top - 1):
        X, Y, Z = sd.dims[lvl]
        for k in ("phi", "rhs"):
            st = sd.set_interior(st, lvl, k,
                                 jnp.asarray(rng.normal(size=(Z, Y, X))))
        st = sd.set_interior(st, lvl, "eps0",
                             jnp.asarray(0.5 + rng.random((Z, Y, X))))
    lam = jnp.asarray(0.6, jnp.float64)

    def copy(s):
        return {k: dict(v) if isinstance(v, dict) else v
                for k, v in s.items()}

    st_f = sd._down_leg(copy(st), top, lam)
    ok = sd._fused_transfer_ok
    sd._fused_transfer_ok = lambda lvl: False
    st_s = sd._down_leg(copy(st), top, lam)
    sd._fused_transfer_ok = ok
    for lvl, keys in ((top, ("phi",)),
                      (top - 1, ("phi", "rhs", "iold", "ires"))):
        for k in keys:
            a = np.asarray(sd.interior(st_f, lvl, k))
            b = np.asarray(sd.interior(st_s, lvl, k))
            np.testing.assert_allclose(a, b, rtol=0, atol=5e-13,
                                       err_msg=f"down {k}@{lvl}")


def test_diffusion_vcoeff_dense():
    """diffusion_solve_vcoeff drives the dense solver (m_diffusion.f90
    :66-108); the total "mass" is conserved under Neumann-0 walls and
    the solution diffuses toward the mean."""
    from octree_mg_tpu.solve.diffusion import diffusion_solve_vcoeff

    size = 32
    dsz = np.full(3, size)
    tree = build_rectangle(3, dsz, 8, 1.0 / dsz, np.zeros(3))
    sd = make_solver(tree, MGConfig(operator="vhelmholtz"))
    assert isinstance(sd, DenseMGSolver)
    sd.set_bc(0, BCType.NEUMANN, 0.0)
    st = sd.allocate()
    top = sd.levels[-1]
    x = sd.cell_centers(top)
    st = sd.set_coefficient(st, jnp.asarray(eps_field(x)))
    st = sd.prepare_coefficient(st)
    phi0 = solution(x) + 2.0
    st = sd.set_interior(st, top, "phi", jnp.asarray(phi0))
    mass0 = float(jnp.sum(sd.interior(st, top, "phi")))
    var0 = float(jnp.var(sd.interior(st, top, "phi")))
    # rhs scale is 2*phi/(dt*D) ~ 400, so 1e-7 absolute is ~2.5e-10
    # relative (the cycles contract ~7.7x each, measured)
    for _ in range(3):
        st, res = diffusion_solve_vcoeff(sd, st, dt=0.01, order=2,
                                         max_res=1e-7)
    phi = sd.interior(st, top, "phi")
    assert abs(float(jnp.sum(phi)) - mass0) < 1e-6 * abs(mass0)
    assert float(jnp.var(phi)) < 0.2 * var0
    assert res <= 1e-7
