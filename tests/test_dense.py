"""Dense-path (uniform-level) solver tests.

The dense solver must be *bit-identical* to the boxed solver: both
implement the same per-cell arithmetic in the same order (fused pair
kernel == [half-sweep, fill, half-sweep, fill] of the boxed path, the
recipe validated in tests/test_pair_sweep.py).  Also checks the direct
coarse solve and the reference manufactured-solution behavior
(tests/test_uniform_grid.f90), including a rectangular domain.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octree_mg_tpu import (IPHI, IRES, IRHS, BCType, DenseMGSolver,
                           MGConfig, MGSolver, build_rectangle,
                           dense_supported, make_solver)
from octree_mg_tpu.core.tree import box_r_min

N_MODES = 2


def solution(x):
    out = 1.0
    for d in range(x.shape[-1]):
        out = out * np.sin(2 * np.pi * N_MODES * x[..., d])
    return out


def boxed_to_dense(solver_b, state_b, lvl, iv):
    """Assemble the dense interior [Z, Y, X] from a boxed level array."""
    t = solver_b.tree
    nc = t.box_size_lvl[lvl]
    dsz = t.domain_size_lvl[lvl]
    out = np.zeros((dsz[2], dsz[1], dsz[0]))
    arr = np.asarray(state_b["cc"][lvl][iv])
    for loc, b in enumerate(t.lvls[lvl].ids):
        ix = t.ix[b] - 1  # 0-based box index per dim
        sl = tuple(slice(ix[d] * nc, (ix[d] + 1) * nc) for d in (2, 1, 0))
        out[sl] = arr[loc][(slice(1, -1),) * 3]
    return out


def dense_from_boxed(solver_b, state_b, solver_d, state_d, keys=("phi",)):
    kmap = {"phi": IPHI, "rhs": IRHS}
    for lvl in solver_d.levels:
        for k in keys:
            vals = boxed_to_dense(solver_b, state_b, lvl, kmap[k])
            state_d = solver_d.set_interior(state_d, lvl, k,
                                            jnp.asarray(vals))
    return state_d


def setup_pair(size=32, box=8, periodic=False, coarse="smooth",
               operator="laplacian"):
    dsz = np.full(3, size)
    tree = build_rectangle(3, dsz, box, 1.0 / dsz, np.zeros(3),
                           periodic=[periodic] * 3)
    cfg_b = MGConfig(operator=operator, smoother="gsrb")
    cfg_d = MGConfig(operator=operator, smoother="gsrb",
                     coarse_solver=coarse)
    sb = MGSolver(tree, cfg_b)
    sd = DenseMGSolver(tree, cfg_d)
    if not periodic:
        sb.set_bc(IPHI, BCType.DIRICHLET, fn=solution)
        sd.set_bc(0, BCType.DIRICHLET, fn=solution)
    st_b = sb.allocate()
    st_d = sd.allocate()
    rng = np.random.default_rng(3)
    # random interior phi and rhs on every level, identical on both paths
    for lvl in sb.levels:
        nb = sb.static[lvl]["n_boxes"]
        nc = sb.static[lvl]["nc"]
        for iv in (IPHI, IRHS):
            vals = rng.normal(size=(nb,) + (nc,) * 3)
            isl = (slice(None),) + (slice(1, -1),) * 3
            st_b["cc"][lvl] = st_b["cc"][lvl].at[(iv,) + isl].set(vals)
    st_b = sb.fill_ghost(st_b, IPHI)
    st_b = sb.fill_ghost(st_b, IRHS)
    st_d = dense_from_boxed(sb, st_b, sd, st_d, keys=("phi", "rhs"))
    return sb, st_b, sd, st_d


@pytest.mark.parametrize("periodic", [False, True])
def test_pair_kernel_bitwise(periodic):
    """One fused dense pair == boxed smooth_boxes(1) bitwise."""
    sb, st_b, sd, st_d = setup_pair(periodic=periodic)
    lam = jnp.asarray(0.0, jnp.float64)
    top = sb.levels[-1]
    dmaps = sb._to_device()
    st_b = sb._smooth_boxes(st_b, dmaps, top, 1, lam)
    st_d = sd._smooth(st_d, top, 1, lam)
    ref = boxed_to_dense(sb, st_b, top, IPHI)
    got = np.asarray(sd.interior(st_d, top, "phi"))
    assert np.array_equal(got, ref), (
        f"max diff {np.max(np.abs(got - ref))}")


def test_residual_bitwise():
    sb, st_b, sd, st_d = setup_pair()
    lam = jnp.asarray(0.0, jnp.float64)
    top = sb.levels[-1]
    dmaps = sb._to_device()
    st_b = sb._residual_lvl(st_b, dmaps, top, lam)
    st_d = sd._residual(st_d, top, lam)
    ref = boxed_to_dense(sb, st_b, top, IRES)
    got = np.asarray(sd.interior(st_d, top, "ires"))
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("periodic", [False, True])
def test_vcycle_equivalent(periodic):
    """A full standalone FAS V-cycle matches the boxed path to ~1 ulp
    (smooth coarse solver = the same stopping loop).  Individual phases
    are bitwise (tests above); the whole-cycle drift comes from XLA
    making different FMA-contraction choices when fusing the two
    different full programs, which op-for-op identical code cannot
    control."""
    sb, st_b, sd, st_d = setup_pair(periodic=periodic, coarse="smooth")
    st_b, res_b = sb.fas_vcycle(st_b)
    st_d, res_d = sd.fas_vcycle(st_d)
    top = sb.levels[-1]
    ref = boxed_to_dense(sb, st_b, top, IPHI)
    got = np.asarray(sd.interior(st_d, top, "phi"))
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(got - ref)) <= 1e-13 * scale
    assert abs(float(res_b) - float(res_d)) <= 1e-12 * max(
        1.0, abs(float(res_b)))


def test_fmg_direct_coarse_converges():
    """FMG with the direct coarse solve reaches discretization accuracy
    in one cycle and keeps contracting (test_uniform_grid.f90 behavior)."""
    size = 32
    dsz = np.full(3, size)
    tree = build_rectangle(3, dsz, 8, 1.0 / dsz, np.zeros(3))
    sd = DenseMGSolver(tree, MGConfig(operator="laplacian"))
    sd.set_bc(0, BCType.DIRICHLET, fn=solution)
    st = sd.allocate()
    # rhs = A(exact) so the discrete solution is exact; then solve
    for lvl in sd.levels:
        x = sd.cell_centers(lvl)
        st = sd.set_interior(st, lvl, "phi", jnp.asarray(solution(x)))
    st = sd.apply_operator(st, out_key="rhs")
    for lvl in sd.levels:
        st = sd.set_interior(st, lvl, "phi",
                             jnp.zeros_like(sd.interior(st, lvl, "phi")))
    top = sd.levels[-1]
    x = sd.cell_centers(top)
    sol = solution(x)
    st, res0 = sd.fas_fmg(st)
    for _ in range(5):
        st, res = sd.fas_fmg(st, have_guess=True)
    err = np.max(np.abs(np.asarray(sd.interior(st, top, "phi")) - sol))
    assert err < 1e-8, f"solution error {err} after 6 FMG"
    # ~10x or better residual reduction per FMG cycle (classic FAS)
    assert float(res) < float(res0) * 1e-5


def test_vcycle_convergence_rate_direct():
    """>=8x residual reduction per V-cycle (geometric mean), the
    reference's classic-FAS observable, with the direct coarse solve."""
    size = 32
    dsz = np.full(3, size)
    tree = build_rectangle(3, dsz, 8, 1.0 / dsz, np.zeros(3))
    sd = DenseMGSolver(tree, MGConfig(operator="laplacian"))
    st = sd.allocate()
    rng = np.random.default_rng(0)
    top = sd.levels[-1]
    st = sd.set_interior(st, top, "rhs",
                         jnp.asarray(rng.normal(size=(size,) * 3)))
    residuals = []
    for _ in range(5):
        st, r = sd.fas_vcycle(st)
        residuals.append(float(r))
    rate = (residuals[0] / residuals[4]) ** 0.25
    assert rate >= 8.0, f"V-cycle contraction {rate:.2f}x < 8x"


def test_rectangular_domain():
    """64x32x32 rectangular FMG (README.md:24 advertises rectangular
    domains; the reference test takes per-dim domain sizes).  dx is
    uniform across dims — the reference's point smoothers require
    dx ~= dy ~= dz (README.md:34)."""
    dsz = np.array([64, 32, 32])
    tree = build_rectangle(3, dsz, 8, np.full(3, 1.0 / dsz[0]),
                           np.zeros(3))
    sd = DenseMGSolver(tree, MGConfig(operator="laplacian"))
    sd.set_bc(0, BCType.DIRICHLET, fn=solution)
    st = sd.allocate()
    for lvl in sd.levels:
        x = sd.cell_centers(lvl)
        st = sd.set_interior(st, lvl, "phi", jnp.asarray(solution(x)))
    st = sd.apply_operator(st, out_key="rhs")
    for lvl in sd.levels:
        st = sd.set_interior(st, lvl, "phi",
                             jnp.zeros_like(sd.interior(st, lvl, "phi")))
    st, res = sd.fas_fmg(st)
    for _ in range(5):
        st, res = sd.fas_fmg(st, have_guess=True)
    top = sd.levels[-1]
    x = sd.cell_centers(top)
    err = np.max(np.abs(np.asarray(sd.interior(st, top, "phi"))
                        - solution(x)))
    assert err < 1e-8


def test_helmholtz_dense():
    """Helmholtz with traced lambda on the dense path."""
    size = 16
    dsz = np.full(3, size)
    tree = build_rectangle(3, dsz, 8, 1.0 / dsz, np.zeros(3))
    sd = DenseMGSolver(tree, MGConfig(operator="helmholtz"))
    sd.set_bc(0, BCType.DIRICHLET, fn=solution)
    st = sd.allocate()
    lam = 4.0
    for lvl in sd.levels:
        x = sd.cell_centers(lvl)
        st = sd.set_interior(st, lvl, "phi", jnp.asarray(solution(x)))
    st = sd.apply_operator(st, lam=lam, out_key="rhs")
    for lvl in sd.levels:
        st = sd.set_interior(st, lvl, "phi",
                             jnp.zeros_like(sd.interior(st, lvl, "phi")))
    st, res = sd.fas_fmg(st, lam=lam)
    for _ in range(5):
        st, res = sd.fas_fmg(st, lam=lam, have_guess=True)
    top = sd.levels[-1]
    x = sd.cell_centers(top)
    err = np.max(np.abs(np.asarray(sd.interior(st, top, "phi"))
                        - solution(x)))
    assert err < 1e-8


def test_make_solver_dispatch():
    dsz = np.full(3, 16)
    tree = build_rectangle(3, dsz, 8, 1.0 / dsz, np.zeros(3))
    assert isinstance(make_solver(tree, MGConfig(operator="laplacian")),
                      DenseMGSolver)
    assert isinstance(make_solver(tree, MGConfig(operator="vlaplacian")),
                      DenseMGSolver)
    assert isinstance(make_solver(tree, MGConfig(smoother="jacobi")),
                      MGSolver)
    from octree_mg_tpu import Dense2DMGSolver
    dsz2 = np.full(2, 16)
    tree2 = build_rectangle(2, dsz2, 8, 1.0 / dsz2, np.zeros(2))
    assert isinstance(make_solver(tree2, MGConfig()), Dense2DMGSolver)
    assert isinstance(make_solver(tree2, MGConfig(smoother="jacobi")),
                      MGSolver)


def test_transfer_kernels_match_xla():
    """Mosaic restriction/prolongation kernels (interpret mode) match
    the XLA fallback path on an alignment-eligible rectangular grid."""
    from octree_mg_tpu.ops import dense_kernels as dk

    dsz = np.array([256, 16, 16])
    tree = build_rectangle(3, dsz, 8, np.full(3, 1.0 / 256), np.zeros(3))
    sd = DenseMGSolver(tree, MGConfig(operator="laplacian"))
    sd.set_bc(0, BCType.DIRICHLET, fn=solution)
    st = sd.allocate()
    top = sd.levels[-1]
    assert sd._transfer_ok(top)
    rng = np.random.default_rng(11)
    X, Y, Z = sd.dims[top]
    st = sd.set_interior(st, top, "phi",
                         jnp.asarray(rng.normal(size=(Z, Y, X))))
    st = sd.set_interior(st, top, "iold",
                         jnp.asarray(rng.normal(size=(Z, Y, X))))
    Xc, Yc, Zc = sd.dims[top - 1]
    st = sd.set_interior(st, top - 1, "phi",
                         jnp.asarray(rng.normal(size=(Zc, Yc, Xc))))
    st = sd.set_interior(st, top - 1, "iold",
                         jnp.asarray(rng.normal(size=(Zc, Yc, Xc))))

    # restriction: kernel vs reduce_window
    coarse_k = dk.restrict_dense(sd._kcfgs[top], st["phi"][top])
    fine = st["phi"][top][
        (slice(dk.PZ, -dk.PZ), slice(dk.PY, -dk.PY), slice(None))]
    avg = jax.lax.reduce_window(fine, jnp.zeros((), fine.dtype),
                                jax.lax.add, (2, 2, 2), (2, 2, 2),
                                "VALID") / 8.0
    got = np.asarray(coarse_k[(slice(dk.PZ, -dk.PZ),
                               slice(dk.PY, -dk.PY), slice(None))])
    np.testing.assert_allclose(got, np.asarray(avg), rtol=0, atol=1e-13)

    # prolongation+correction: kernel vs the XLA ring+interleave path
    lam = jnp.asarray(0.0, jnp.float64)
    st_k = sd._correct_children(dict(st), top - 1, lam)
    # force the XLA path
    ok = sd._transfer_ok
    sd._transfer_ok = lambda lvl: False
    st_x = sd._correct_children(dict(st), top - 1, lam)
    sd._transfer_ok = ok
    a = np.asarray(sd.interior(st_k, top, "phi"))
    b = np.asarray(sd.interior(st_x, top, "phi"))
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-13)


@pytest.mark.parametrize("periodic", [False, True])
def test_stencil_kernels_interpret(periodic):
    """Mosaic pair / double-pair / apply kernels (interpret mode) are
    bitwise equal to the jnp fallback on an alignment-eligible grid —
    including the double pair vs two synced single pairs."""
    from octree_mg_tpu.ops import dense_kernels as dk

    dims = (128, 16, 16)  # X mult of 128, Y mult of 8: kernel-eligible
    per = (periodic,) * 3
    bc = [(2.0, -1.0, 0.0)] * 6
    cfg = dk.DenseStencilConfig(dims, (1.0, 2.0, 3.0), bc, per,
                                jnp.float64, b_const=[0.5] * 6,
                                interpret=True)
    assert cfg.use_kernel
    rng = np.random.default_rng(7)
    phi = jnp.asarray(rng.normal(size=cfg.pshape))
    rhs = jnp.asarray(rng.normal(size=cfg.pshape))
    lam = jnp.asarray(0.0 if periodic else 0.3, jnp.float64)
    planes = [None] * 6
    X, Y, Z = dims
    core = (slice(dk.PZ, dk.PZ + Z), slice(dk.PY, dk.PY + Y),
            slice(None))

    def sync(a):
        if not periodic:
            return a
        PZ, PY = dk.PZ, dk.PY
        d = min(4, Z)
        a = a.at[PZ - d:PZ].set(a[Z + PZ - d:Z + PZ])
        a = a.at[Z + PZ:Z + PZ + d].set(a[PZ:PZ + d])
        d = min(4, Y)
        a = a.at[:, PY - d:PY].set(a[:, Y + PY - d:Y + PY])
        a = a.at[:, Y + PY:Y + PY + d].set(a[:, PY:PY + d])
        return a

    # NB: on-chip (Mosaic) the kernels are BITWISE equal to the jnp
    # path (experiments/probe_dense_parity.py asserts == 0.0); under
    # CPU interpret mode XLA contracts FMAs differently between the two
    # programs, so this structural test allows ~1 ulp.
    close = lambda x, y: np.testing.assert_allclose(
        np.asarray(x), np.asarray(y), rtol=0, atol=5e-14)
    phi_s, rhs_s = sync(phi), sync(rhs)
    a = dk.pair_sweep_dense(cfg, phi_s, rhs_s, lam, planes, 0)[core]
    b = dk._pair_jnp(cfg, phi_s, rhs_s, lam, planes, 0)[core]
    close(a, b)

    a2 = dk.pair_sweep_dense(cfg, phi_s, rhs_s, lam, planes, 0,
                             n_pairs=2)[core]
    mid = dk._pair_jnp(cfg, phi_s, rhs_s, lam, planes, 0)
    b2 = dk._pair_jnp(cfg, sync(mid), rhs_s, lam, planes, 0)[core]
    close(a2, b2)

    ra = dk.stencil_apply_dense(cfg, phi_s, rhs_s, lam, planes,
                                True)[core]
    rb = dk._apply_jnp(cfg, phi_s, rhs_s, lam, planes, True)[core]
    close(ra, rb)


def test_fused_downsweep_interpret():
    """Fused downsweep kernel (smooth+residual+restrict in one pass) is
    equivalent to the separate path (bitwise on-chip; ~1 ulp under CPU
    interpret, see test_stencil_kernels_interpret)."""
    dsz = np.array([256, 16, 16])
    tree = build_rectangle(3, dsz, 8, np.full(3, 1.0 / 256), np.zeros(3))
    sd = DenseMGSolver(tree, MGConfig(operator="laplacian"))
    sd.set_bc(0, BCType.DIRICHLET, fn=solution)
    st = sd.allocate()
    top = sd.levels[-1]
    assert sd._fused_down_ok(top)
    rng = np.random.default_rng(5)
    for lvl in (top, top - 1):
        X, Y, Z = sd.dims[lvl]
        for k in ("phi", "rhs"):
            st = sd.set_interior(st, lvl, k,
                                 jnp.asarray(rng.normal(size=(Z, Y, X))))
    lam = jnp.asarray(0.0, jnp.float64)

    def copy(s):
        return {k: dict(v) if isinstance(v, dict) else v
                for k, v in s.items()}

    st_f = sd._down_leg(copy(st), top, lam)
    st_uf = sd._update_coarse(copy(st), top, lam)
    ok = sd._fused_transfer_ok
    sd._fused_transfer_ok = lambda lvl: False
    st_s = sd._down_leg(copy(st), top, lam)
    st_us = sd._update_coarse(copy(st), top, lam)
    sd._fused_transfer_ok = ok

    for lvl, keys in ((top, ("phi",)),
                      (top - 1, ("phi", "rhs", "iold", "ires"))):
        for k in keys:
            a = np.asarray(sd.interior(st_f, lvl, k))
            b = np.asarray(sd.interior(st_s, lvl, k))
            np.testing.assert_allclose(a, b, rtol=0, atol=5e-13,
                                       err_msg=f"down {k}@{lvl}")
    for k in ("phi", "rhs", "iold", "ires"):
        a = np.asarray(sd.interior(st_uf, top - 1, k))
        b = np.asarray(sd.interior(st_us, top - 1, k))
        np.testing.assert_allclose(a, b, rtol=0, atol=5e-13,
                                   err_msg=f"uc {k}")
