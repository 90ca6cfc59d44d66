"""Double-float residual (ops/df32) + iterative refinement (solve/refine).

CPU x64 is available here, so the f32-pair residual is validated
against the TRUE float64 residual of the same represented solution —
the error must sit at the double-float representation level (~2^-45 of
the stencil term magnitudes), orders below a plain f32 residual.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octree_mg_tpu import BCType, MGConfig, build_rectangle, make_solver
from octree_mg_tpu.ops import dense_kernels as dk
from octree_mg_tpu.ops.df32 import (accumulate_df32, df32_ok,
                                    residual_df32, split_f64, two_sum)
from octree_mg_tpu.solve.dense import DenseMGSolver, _ISL
from octree_mg_tpu.solve.refine import solve_refined

SIZE, BOX = 32, 8


def mk_solver(periodic=False, bc=None, operator="laplacian"):
    dsz = np.full(3, SIZE)
    tree = build_rectangle(3, dsz, BOX, 1.0 / dsz, np.zeros(3),
                           periodic=[periodic] * 3)
    sv = make_solver(tree, MGConfig(operator=operator,
                                    dtype=jnp.float32))
    assert isinstance(sv, DenseMGSolver)
    if bc:
        for nb, (t, v) in enumerate(bc):
            sv.set_bc(0, t, v, nb=nb)
    return sv


def pair_fields(sv, seed=0):
    """Random double-float x and rhs (padded), pads synced."""
    top = sv.levels[-1]
    rng = np.random.default_rng(seed)
    pshape = dk.padded_shape(sv.dims[top])
    x64 = rng.normal(size=(SIZE,) * 3)
    rhs64 = rng.normal(size=(SIZE,) * 3)
    xhi_i, xlo_i = split_f64(x64)
    rhi_i, rlo_i = split_f64(rhs64)

    def pad(v):
        return jnp.zeros(pshape, jnp.float32).at[_ISL].set(
            jnp.asarray(v))

    xhi = sv._sync_pads(pad(xhi_i), top)
    xlo = sv._sync_pads(pad(xlo_i), top)
    return xhi, xlo, pad(rhi_i), pad(rlo_i), x64, rhs64


def f64_residual(sv, x64, rhs64, lam=0.0):
    """Reference: true float64 residual of the represented solution."""
    top = sv.levels[-1]
    cfg = sv._kcfgs[top]
    cfg64 = dk.DenseStencilConfig(
        dims=cfg.dims, idr2=cfg.idr2, bc=cfg.bc, periodic=cfg.periodic,
        dtype=jnp.float64, b_const=cfg.b_const, interpret=True, n_eps=0)
    pshape = dk.padded_shape(sv.dims[top])
    # the represented x is exactly xhi + xlo
    xhi_i, xlo_i = split_f64(x64)
    xr = xhi_i.astype(np.float64) + xlo_i.astype(np.float64)
    rhi_i, rlo_i = split_f64(rhs64)
    rr = rhi_i.astype(np.float64) + rlo_i.astype(np.float64)
    p64 = jnp.zeros(pshape, jnp.float64).at[_ISL].set(jnp.asarray(xr))
    p64 = sv._sync_pads(p64, top)
    r64p = jnp.zeros(pshape, jnp.float64).at[_ISL].set(jnp.asarray(rr))
    lam_a = jnp.full((1, 1, 1), lam, jnp.float64)
    r = dk.stencil_apply_dense(cfg64, p64, r64p, lam_a, [None] * 6,
                               residual=True)
    return np.asarray(r[_ISL], np.float64)


BC_CASES = {
    "dirichlet0": [(BCType.DIRICHLET, 0.0)] * 6,
    "dirichlet_val": [(BCType.DIRICHLET, 0.5), (BCType.DIRICHLET, -0.25),
                      (BCType.DIRICHLET, 0.1), (BCType.DIRICHLET, 0.3),
                      (BCType.DIRICHLET, 0.0), (BCType.DIRICHLET, 1.0)],
    "mixed": [(BCType.NEUMANN, 0.3), (BCType.NEUMANN, -0.1),
              (BCType.CONTINUOUS, 0.0), (BCType.CONTINUOUS, 0.0),
              (BCType.DIRICHLET, 0.5), (BCType.DIRICHLET, -0.25)],
}


@pytest.mark.parametrize("case", list(BC_CASES) + ["periodic"])
def test_residual_matches_f64(case):
    """The regime that matters for refinement: x near the solution, so
    the true residual is ~1e-6 of the stencil term magnitudes.  The
    double-float evaluation must recover it to f32-relative accuracy
    (+ the ~2^-45*scale representation floor); a plain f32 residual
    drowns the signal in ~2^-24*scale cancellation noise."""
    if case == "periodic":
        sv = mk_solver(periodic=True)
    else:
        sv = mk_solver(bc=BC_CASES[case])
    top = sv.levels[-1]
    cfg = sv._kcfgs[top]
    assert df32_ok(cfg)
    rng = np.random.default_rng(1)
    x64 = rng.normal(size=(SIZE,) * 3)
    # rhs = A(x_repr) in f64 + a small perturbation => true residual
    # ~= -perturbation, tiny against the idr2-scale terms
    ax = f64_residual(sv, x64, np.zeros((SIZE,) * 3))  # = -A(x_repr)
    delta = 1e-6 * rng.normal(size=(SIZE,) * 3)
    rhs64 = -ax + delta

    pshape = dk.padded_shape(sv.dims[top])

    def pad(v):
        return jnp.zeros(pshape, jnp.float32).at[_ISL].set(jnp.asarray(v))

    xhi_i, xlo_i = split_f64(x64)
    rhi_i, rlo_i = split_f64(rhs64)
    xhi = sv._sync_pads(pad(xhi_i), top)
    xlo = sv._sync_pads(pad(xlo_i), top)
    # under jit: XLA's simplifier is exactly what the traced-first
    # two_sum convention guards against (see ops.df32.two_sum)
    r32 = np.asarray(jax.jit(lambda *w: residual_df32(cfg, *w))(
        xhi, xlo, pad(rhi_i), pad(rlo_i))[_ISL])
    r64 = f64_residual(sv, x64, rhs64)
    scale = float(cfg.idr2[0]) * float(np.max(np.abs(x64)))
    rmax = float(np.max(np.abs(r64)))
    err = float(np.max(np.abs(r32 - r64)))
    # f32-relative + double-float representation floor
    assert err <= 3e-7 * rmax + 1e-11 * scale, (err, rmax, scale)
    # sanity: the plain f32 residual (of the f32-rounded x) really is
    # orders worse — its cancellation error is absolute in scale
    p32 = sv._sync_pads(pad(x64.astype(np.float32)), top)
    rplain = dk.stencil_apply_dense(
        cfg, p32, pad(rhs64.astype(np.float32)),
        jnp.zeros((1, 1, 1), jnp.float32), [None] * 6, residual=True)
    err_plain = float(np.max(np.abs(np.asarray(rplain[_ISL]) - r64)))
    assert err_plain > 50 * err, (err_plain, err)


def test_residual_chunked_bitwise():
    """The z-chunked evaluation (z_gates slabs) is bitwise the
    monolithic one."""
    sv = mk_solver(bc=BC_CASES["mixed"])
    top = sv.levels[-1]
    cfg = sv._kcfgs[top]
    xhi, xlo, rhi, rlo, _, _ = pair_fields(sv, seed=3)
    full = np.asarray(residual_df32(cfg, xhi, xlo, rhi, rlo)[_ISL])
    CH = SIZE // 4
    ccfg = dk.DenseStencilConfig(
        dims=(cfg.X, cfg.Y, CH), idr2=cfg.idr2, bc=cfg.bc,
        periodic=cfg.periodic, dtype=cfg.dtype, b_const=cfg.b_const,
        interpret=True, n_eps=0)
    PZ = dk.PZ
    out = np.zeros((SIZE,) * 3, np.float32)
    for i in range(4):
        w = [a[i * CH:i * CH + CH + 2 * PZ] for a in (xhi, xlo, rhi, rlo)]
        r = residual_df32(ccfg, *w, z_gates=(jnp.asarray(i == 0),
                                             jnp.asarray(i == 3)))
        out[i * CH:(i + 1) * CH] = np.asarray(r[_ISL])
    assert np.array_equal(out, full)


@pytest.mark.parametrize("periodic", [False, True])
def test_residual_dense_kernel_bitwise(periodic):
    """The Mosaic rendering (residual_df32_dense, x_lo/rhs_lo riding the
    eps-window plumbing) is bitwise the whole-array jnp evaluation at a
    kernel-eligible size (X % 128 == 0)."""
    X, Y, Z = 128, 16, 16
    bc = [(2.0, -1.0, 0.0), (0.0, 1.0, 0.0),   # dirichlet / neumann0
          (0.0, 2.0, -1.0), (2.0, -1.0, 0.0),  # continuous / dirichlet
          (2.0, -1.0, 0.0), (0.0, 1.0, 0.0)]
    idr2 = (64.0,) * 3
    cfg = dk.DenseStencilConfig(
        dims=(X, Y, Z), idr2=idr2, bc=bc, periodic=(periodic,) * 3,
        dtype=jnp.float32,
        b_const=[0.5, 0.0, 0.0, -0.25, 1.0, 0.0], interpret=True)
    assert cfg.use_kernel and df32_ok(cfg)
    rng = np.random.default_rng(5)
    pshape = dk.padded_shape((X, Y, Z))

    def pad(v):
        a = jnp.zeros(pshape, jnp.float32).at[_ISL].set(jnp.asarray(v))
        if periodic:  # maintain periodic pads (garbage-by-contract else)
            PZ, PY = dk.PZ, dk.PY
            a = a.at[:PZ].set(a[-2 * PZ:-PZ]).at[-PZ:].set(a[PZ:2 * PZ])
            a = (a.at[:, :PY].set(a[:, -2 * PY:-PY])
                 .at[:, -PY:].set(a[:, PY:2 * PY]))
        return a

    args = [pad(rng.normal(size=(Z, Y, X)).astype(np.float32))
            for _ in range(4)]
    from octree_mg_tpu.ops.df32 import residual_df32_dense
    r_jnp = np.asarray(residual_df32(cfg, *args)[_ISL])
    r_ker = np.asarray(residual_df32_dense(cfg, *args)[_ISL])
    assert np.array_equal(r_jnp, r_ker)


def test_two_sum_jit_exact():
    """two_sum stays error-free under jit with the traced operand
    first.  (With a CONSTANT first operand, XLA's algebraic simplifier
    rewrites the error term away — the regression this pins.)"""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=4096).astype(np.float32))
    for f in (lambda x: two_sum(2.0 * x, 0.5),
              lambda x: two_sum(-x, 0.5),
              lambda x: two_sum(x, jnp.float32(0.25))):
        s, e = jax.jit(f)(x)
        s64 = np.asarray(s, np.float64) + np.asarray(e, np.float64)
        se, ee = f(x)  # eager = ground truth (exact by construction)
        t64 = np.asarray(se, np.float64) + np.asarray(ee, np.float64)
        assert np.array_equal(s64, t64)


def test_accumulate_df32_exact():
    rng = np.random.default_rng(1)
    x64 = np.zeros(1000)
    xhi = jnp.zeros(1000, jnp.float32)
    xlo = jnp.zeros(1000, jnp.float32)
    for _ in range(20):
        d = rng.normal(size=1000).astype(np.float32) * 10.0 ** rng.integers(-6, 0)
        x64 = x64 + d.astype(np.float64)
        xhi, xlo = accumulate_df32(xhi, xlo, jnp.asarray(d))
    got = np.asarray(xhi, np.float64) + np.asarray(xlo, np.float64)
    assert np.max(np.abs(got - x64)) <= 1e-12 * np.max(np.abs(x64))


def test_solve_refined_reaches_f64_class():
    """End-to-end: outer residual contracts past the f32 floor to the
    1e-10-relative class (the reference's f64 behavior)."""
    sv = mk_solver(bc=BC_CASES["dirichlet0"])
    st = sv.allocate()
    rng = np.random.default_rng(7)
    rhs64 = rng.normal(size=(SIZE,) * 3)
    rhi, rlo = split_f64(rhs64)
    xhi, xlo, norms, st = solve_refined(sv, st, rhi, rlo, n_outer=8,
                                        nch=4)
    assert norms[-1] <= 1e-10 * norms[0], norms
    # and the solution satisfies the f64 operator to the same class
    x64 = np.asarray(xhi, np.float64) + np.asarray(xlo, np.float64)
    r64 = f64_residual(sv, x64, rhs64)
    # (f64_residual re-splits x64; splitting a double-float sum is not
    # lossless, so compare at a slightly looser level)
    assert np.max(np.abs(r64)) <= 1e-8 * norms[0]


def test_solve_refined_fused_kernel_path():
    """The Mosaic fused-step loop (accum + pad sync + df32 residual +
    rhs write in one donated program) at a kernel-eligible size; same
    f64-class convergence as the fallback loop."""
    dsz = np.array([128, 16, 16])
    tree = build_rectangle(3, dsz, 8, np.full(3, 1.0 / 128), np.zeros(3))
    sv = make_solver(tree, MGConfig(operator="laplacian",
                                    dtype=jnp.float32))
    assert isinstance(sv, DenseMGSolver)
    sv.set_bc(0, BCType.DIRICHLET, 0.0)
    top = sv.levels[-1]
    assert sv._kcfgs[top].use_kernel
    st = sv.allocate()
    rng = np.random.default_rng(11)
    rhs64 = rng.normal(size=(16, 16, 128))
    rhi, rlo = split_f64(rhs64)
    xhi, xlo, norms, st = solve_refined(sv, st, rhi, rlo, n_outer=8)
    assert norms[-1] <= 1e-10 * norms[0], norms


def test_solve_refined_inhomogeneous_bc():
    """Inhomogeneous BCs through bc_values: the inner FMG runs the
    HOMOGENEOUS error equation, the true boundary values live in the
    outer residual, and the converged solution satisfies the f64
    inhomogeneous operator.  (Passing nonzero b on the inner solver
    instead stalls the loop — that misconfiguration is rejected.)"""
    bvals = [0.5, -0.25, 0.1, 0.3, 0.0, 1.0]
    sv = mk_solver(bc=[(BCType.DIRICHLET, 0.0)] * 6)
    st = sv.allocate()
    rng = np.random.default_rng(13)
    rhs64 = rng.normal(size=(SIZE,) * 3)
    rhi, rlo = split_f64(rhs64)
    xhi, xlo, norms, st = solve_refined(sv, st, rhi, rlo, n_outer=8,
                                        nch=4, bc_values=bvals)
    assert norms[-1] <= 1e-10 * norms[0], norms
    # the converged x satisfies the TRUE (inhomogeneous) f64 operator
    sv_true = mk_solver(bc=[(BCType.DIRICHLET, v) for v in bvals])
    x64 = np.asarray(xhi, np.float64) + np.asarray(xlo, np.float64)
    r64 = f64_residual(sv_true, x64, rhs64)
    assert np.max(np.abs(r64)) <= 1e-8 * norms[0]
    # misconfiguration (nonzero b on the inner solver) is rejected
    from octree_mg_tpu.solve.refine import RefinedPoisson
    with pytest.raises(ValueError, match="homogeneous"):
        RefinedPoisson(sv_true)


def test_df32_gate():
    sv = mk_solver()
    assert df32_ok(sv._kcfgs[sv.levels[-1]])
    # non-power-of-two spacing is rejected
    tree = build_rectangle(3, np.full(3, 24), 8, np.full(3, 1.0 / 24),
                           np.zeros(3))
    sv2 = make_solver(tree, MGConfig(operator="laplacian",
                                     dtype=jnp.float32))
    assert not df32_ok(sv2._kcfgs[sv2.levels[-1]])


def test_two_prod_jit_exact():
    """two_prod (Veltkamp split, no fma) stays error-free under jit —
    the compensated-arithmetic jit hazard class (cf. two_sum) checked
    for the product path, with both traced x traced and traced x
    constant operand patterns as the Helmholtz residual uses them."""
    from octree_mg_tpu.ops.df32 import two_prod
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=4096).astype(np.float32))
    y = jnp.asarray(rng.normal(size=4096).astype(np.float32))
    lam_h = float(np.float32(0.3))
    for f in (lambda a, b: two_prod(a, b),
              lambda a, b: two_prod(a, lam_h),
              lambda a, b: two_prod(a, jnp.float32(1.0 / 3.0))):
        p, e = jax.jit(f)(x, y)
        got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
        # ground truth: the exact product in f64 (f32 x f32 is exact
        # in f64 — 24+24 < 53 bits)
        if f(x, y)[0].shape == p.shape:
            pe, ee = f(x, y)
            want = np.asarray(pe, np.float64) + np.asarray(ee, np.float64)
            assert np.array_equal(got, want)
    # direct exactness check against the f64 product
    p, e = jax.jit(lambda a: two_prod(a, lam_h))(x)
    want = np.asarray(x, np.float64) * np.float64(np.float32(lam_h))
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    assert np.array_equal(got, want)
    p, e = jax.jit(lambda a, b: two_prod(a, b))(x, y)
    want = np.asarray(x, np.float64) * np.asarray(y, np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    assert np.array_equal(got, want)


def test_residual_helmholtz_matches_f64():
    """The +lam*x term (exact TwoProduct + compensation cross terms)
    keeps the Helmholtz residual in the double-float accuracy class —
    same regime as the laplacian test (x near the solution)."""
    from octree_mg_tpu.ops.df32 import split_lam
    lam = 0.37  # not a power of two: lam*x rounds without TwoProduct
    sv = mk_solver(bc=BC_CASES["mixed"], operator="helmholtz")
    top = sv.levels[-1]
    cfg = sv._kcfgs[top]
    assert df32_ok(cfg)
    rng = np.random.default_rng(19)
    x64 = rng.normal(size=(SIZE,) * 3)
    ax = f64_residual(sv, x64, np.zeros((SIZE,) * 3), lam=lam)
    rhs64 = -ax + 1e-6 * rng.normal(size=(SIZE,) * 3)

    pshape = dk.padded_shape(sv.dims[top])

    def pad(v):
        return jnp.zeros(pshape, jnp.float32).at[_ISL].set(jnp.asarray(v))

    xhi_i, xlo_i = split_f64(x64)
    rhi_i, rlo_i = split_f64(rhs64)
    xhi = sv._sync_pads(pad(xhi_i), top)
    xlo = sv._sync_pads(pad(xlo_i), top)
    lp = split_lam(lam)
    r32 = np.asarray(jax.jit(
        lambda *w: residual_df32(cfg, *w, lam_pair=lp))(
        xhi, xlo, pad(rhi_i), pad(rlo_i))[_ISL])
    r64 = f64_residual(sv, x64, rhs64, lam=lam)
    scale = float(cfg.idr2[0]) * float(np.max(np.abs(x64)))
    rmax = float(np.max(np.abs(r64)))
    err = float(np.max(np.abs(r32 - r64)))
    assert err <= 3e-7 * rmax + 1e-11 * scale, (err, rmax, scale)


def test_solve_refined_helmholtz_f64_class():
    """End-to-end f64-class Helmholtz refinement (VERDICT r3 task 2a):
    outer residual contracts past the f32 floor with lam != 0."""
    lam = 0.37
    sv = mk_solver(bc=BC_CASES["dirichlet0"], operator="helmholtz")
    st = sv.allocate()
    rng = np.random.default_rng(23)
    rhs64 = rng.normal(size=(SIZE,) * 3)
    rhi, rlo = split_f64(rhs64)
    xhi, xlo, norms, st = solve_refined(sv, st, rhi, rlo, n_outer=8,
                                        nch=4, lam=lam)
    assert norms[-1] <= 1e-10 * norms[0], norms
    x64 = np.asarray(xhi, np.float64) + np.asarray(xlo, np.float64)
    r64 = f64_residual(sv, x64, rhs64, lam=lam)
    assert np.max(np.abs(r64)) <= 1e-8 * norms[0]
    # a laplacian inner solver with lam != 0 is rejected
    from octree_mg_tpu.solve.refine import RefinedPoisson
    with pytest.raises(ValueError, match="helmholtz"):
        RefinedPoisson(mk_solver(), lam=lam)


# ---------------------------------------------------------------------------
# 2D
# ---------------------------------------------------------------------------

def mk_solver_2d(periodic=False, bc=None, size=64):
    from octree_mg_tpu import Dense2DMGSolver
    dsz = np.full(2, size)
    tree = build_rectangle(2, dsz, 16, 1.0 / dsz, np.zeros(2),
                           periodic=[periodic] * 2)
    sv = make_solver(tree, MGConfig(operator="laplacian",
                                    dtype=jnp.float32))
    assert isinstance(sv, Dense2DMGSolver)
    if bc:
        for nb, (t, v) in enumerate(bc):
            sv.set_bc(0, t, v, nb=nb)
    return sv


@pytest.mark.parametrize("case", ["mixed", "periodic"])
def test_residual_2d_matches_f64(case):
    """2D df32 residual vs the true f64 residual (same regime as the 3D
    test: x near the solution, cancellation-dominated)."""
    from octree_mg_tpu.ops import dense2d as d2
    from octree_mg_tpu.ops.df32 import df32_ok_2d, residual_df32_2d
    size = 64
    if case == "periodic":
        sv = mk_solver_2d(periodic=True, size=size)
    else:
        sv = mk_solver_2d(bc=[(BCType.NEUMANN, 0.3),
                              (BCType.CONTINUOUS, 0.0),
                              (BCType.DIRICHLET, 0.5),
                              (BCType.DIRICHLET, -0.25)], size=size)
    top = sv.levels[-1]
    cfg = sv._kcfgs[top]
    assert df32_ok_2d(cfg)
    cfg64 = d2.Dense2DConfig(dims=cfg.dims, idr2=cfg.idr2, bc=cfg.bc,
                             periodic=cfg.periodic, dtype=jnp.float64,
                             b_const=cfg.b_const)
    rng = np.random.default_rng(2)
    x64 = rng.normal(size=(size, size))
    lam = jnp.zeros((1, 1), jnp.float64)

    def f64_res(x, rhs):
        return np.asarray(d2.stencil_apply_2d(
            cfg64, jnp.asarray(x), jnp.asarray(rhs), lam, [None] * 4,
            residual=True), np.float64)

    xhi_i, xlo_i = split_f64(x64)
    xr = xhi_i.astype(np.float64) + xlo_i.astype(np.float64)
    ax = -f64_res(xr, np.zeros((size, size)))
    rhs64 = ax + 1e-6 * rng.normal(size=(size, size))
    rhi_i, rlo_i = split_f64(rhs64)
    r64 = rhs64 - ax
    r32 = np.asarray(jax.jit(
        lambda *w: residual_df32_2d(cfg, *w))(
        jnp.asarray(xhi_i), jnp.asarray(xlo_i),
        jnp.asarray(rhi_i), jnp.asarray(rlo_i)), np.float64)
    scale = float(cfg.idr2[0]) * float(np.max(np.abs(x64)))
    err = float(np.max(np.abs(r32 - r64)))
    assert err <= 3e-7 * float(np.max(np.abs(r64))) + 1e-11 * scale, (
        err, np.max(np.abs(r64)), scale)


def test_solve_refined_2d_reaches_f64_class():
    """End-to-end 2D refinement with inhomogeneous Dirichlet BCs.
    (The inner 2D FMG contracts ~80x/cycle for Dirichlet but only
    ~10x/cycle for Neumann+continuous mixes — the refinement rate IS
    the inner-FMG rate, so the mixed-BC correctness lives in the
    residual-parity test above and this pins the convergence class.)"""
    from octree_mg_tpu.solve.refine import solve_refined as sr
    bvals = [0.3, 0.0, 0.5, -0.25]
    sv = mk_solver_2d(bc=[(BCType.DIRICHLET, 0.0)] * 4)
    st = sv.allocate()
    rng = np.random.default_rng(17)
    rhs64 = rng.normal(size=(64, 64))
    rhi, rlo = split_f64(rhs64)
    xhi, xlo, norms, st = sr(sv, st, rhi, rlo, n_outer=8,
                             bc_values=bvals)
    assert norms[-1] <= 1e-10 * norms[0], norms
    # and the solution satisfies the f64 inhomogeneous operator
    from octree_mg_tpu.ops import dense2d as d2
    cfg = sv._kcfgs[sv.levels[-1]]
    cfg64 = d2.Dense2DConfig(dims=cfg.dims, idr2=cfg.idr2, bc=cfg.bc,
                             periodic=cfg.periodic, dtype=jnp.float64,
                             b_const=bvals)
    x64 = np.asarray(xhi, np.float64) + np.asarray(xlo, np.float64)
    r64 = np.asarray(d2.stencil_apply_2d(
        cfg64, jnp.asarray(x64), jnp.asarray(rhs64),
        jnp.zeros((1, 1), jnp.float64), [None] * 4, residual=True))
    assert np.max(np.abs(r64)) <= 1e-8 * norms[0]


@pytest.mark.parametrize("operator,lam,neps", [
    ("vlaplacian", 0.0, 1),
    ("vhelmholtz", 0.53, 1),
    ("ahelmholtz", 0.31, 3),
])
def test_solve_refined_vcoeff_f64_class(operator, lam, neps):
    """Variable-coefficient refinement (df pair arithmetic: exact
    TwoProduct eps products, Dekker div2 harmonic means — ~2^-47, not
    error-free but f64-class; VERDICT r4 item 3).  Validated against
    the independent f64 operator: relative leaf residual well under
    the 1e-9 target (the reference is f64 for all five operators,
    m_data_structures.f90:8, m_vlaplacian.f90:84-128)."""
    size = 16
    dsz = np.full(3, size)
    tree = build_rectangle(3, dsz, 8, 1.0 / dsz, np.zeros(3))
    sv = DenseMGSolver(tree, MGConfig(operator=operator,
                                      dtype=jnp.float32))
    sv.set_bc(0, BCType.DIRICHLET, 0.0)
    st = sv.allocate()
    rng = np.random.default_rng(3)
    rhs64 = rng.normal(size=(size,) * 3)
    eps64 = [0.5 + rng.random((size,) * 3) for _ in range(neps)]
    rhi, rlo = split_f64(rhs64)
    xhi, xlo, norms, st = solve_refined(sv, st, rhi, rlo, n_outer=10,
                                        lam=lam, eps=eps64)
    assert norms[-1] <= 1e-10 * norms[0], norms
    # independent f64 ground truth
    sv6 = DenseMGSolver(tree, MGConfig(operator=operator,
                                       dtype=jnp.float64))
    sv6.set_bc(0, BCType.DIRICHLET, 0.0)
    st6 = sv6.allocate()
    x64 = np.asarray(xhi, np.float64) + np.asarray(xlo, np.float64)
    top = sv6.levels[-1]
    st6 = sv6.set_interior(st6, top, "phi", jnp.asarray(x64))
    st6 = sv6.set_interior(st6, top, "rhs", jnp.asarray(rhs64))
    for i in range(neps):
        st6 = sv6.set_interior(st6, top, f"eps{i}",
                               jnp.asarray(eps64[i]))
    st6 = sv6.prepare_coefficient(st6)
    st6 = sv6.apply_operator(st6, lam=lam)
    r = np.asarray(st6["ires"][top][_ISL])
    worst = float(np.max(np.abs(rhs64 - r)))
    assert worst <= 1e-9 * norms[0], (worst, norms)


def test_refine_vcoeff_gate_errors():
    """Clear errors: vcoeff solver without eps=, eps= on a
    constant-coefficient solver."""
    from octree_mg_tpu.solve.refine import RefinedPoisson
    size = 16
    dsz = np.full(3, size)
    tree = build_rectangle(3, dsz, 8, 1.0 / dsz, np.zeros(3))
    sv = DenseMGSolver(tree, MGConfig(operator="vlaplacian",
                                      dtype=jnp.float32))
    sv.set_bc(0, BCType.DIRICHLET, 0.0)
    with pytest.raises(ValueError, match="eps"):
        RefinedPoisson(sv)
    sc = DenseMGSolver(tree, MGConfig(operator="laplacian",
                                      dtype=jnp.float32))
    sc.set_bc(0, BCType.DIRICHLET, 0.0)
    with pytest.raises(AssertionError, match="eps"):
        RefinedPoisson(sc, eps=[np.ones((size,) * 3)])
