"""Dense-patch AMR solver vs the boxed solver.

Every phase must be *bit-identical* to the boxed path on rectangular
AMR trees: the patch smoother's refinement faces evaluate the same
sides_rb arithmetic (0.5*interp + 0.75*x1 - 0.25*x2) with the same
coarse-strip interpolation values, restriction/tau-correction touch
exactly the parent region, and the up-leg correction ring reproduces
the boxed corr ghosts.  Full cycles match to ~1 ulp (restriction
rounding, see test_dense.test_vcycle_equivalent).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octree_mg_tpu import (IOLD, IPHI, IRES, IRHS, BCType,
                           DenseAMRMGSolver, MGConfig, MGSolver,
                           build_amr_centered, build_rectangle,
                           dense_amr_supported, make_solver)

N_MODES = 2


def solution(x):
    out = 1.0
    for d in range(x.shape[-1]):
        out = out * np.sin(2 * np.pi * N_MODES * x[..., d])
    return out


def boxed_to_patch(solver_b, solver_d, state_b, lvl, iv):
    """Assemble the dense patch interior [Z, Y, X] from a boxed level."""
    t = solver_b.tree
    nc = t.box_size_lvl[lvl]
    X, Y, Z = solver_d.dims[lvl]
    off = solver_d.offsets[lvl] // nc  # box offset of the patch
    out = np.zeros((Z, Y, X))
    arr = np.asarray(state_b["cc"][lvl][iv])
    for loc, b in enumerate(t.lvls[lvl].ids):
        ix = t.ix[b] - 1 - off
        sl = tuple(slice(ix[d] * nc, (ix[d] + 1) * nc) for d in (2, 1, 0))
        out[sl] = arr[loc][(slice(1, -1),) * 3]
    return out


def setup_pair(n_levels=3, size=16, box=8, coarse="smooth", seed=3,
               operator="laplacian"):
    tree = build_amr_centered(3, n_levels, np.full(3, size), box,
                              np.full(3, 1.0 / size))
    sb = MGSolver(tree, MGConfig(operator=operator, smoother="gsrb"))
    sd = DenseAMRMGSolver(tree, MGConfig(operator=operator,
                                         smoother="gsrb",
                                         coarse_solver=coarse))
    sb.set_bc(IPHI, BCType.DIRICHLET, fn=solution)
    sd.set_bc(0, BCType.DIRICHLET, fn=solution)
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
            vals = boxed_to_patch(sb, sd, st_b, lvl, iv)
            st_d = sd.set_interior(st_d, lvl, k, jnp.asarray(vals))
    return sb, st_b, sd, st_d


def test_geometry_and_gating():
    tree = build_amr_centered(3, 3, np.full(3, 16), 8,
                              np.full(3, 1.0 / 16))
    cfg = MGConfig(operator="laplacian")
    assert dense_amr_supported(tree, cfg)
    sd = DenseAMRMGSolver(tree, cfg)
    # 16^3 base: lvl2 refines everywhere (all 8 box centers are inside
    # the middle half), lvl3 is the true AMR patch (middle half at 4x)
    assert sd.dims[2] == (32, 32, 32) and sd._whole_region(2)
    assert sd.dims[3] == (32, 32, 32) and not sd._whole_region(3)
    assert tuple(sd.offsets[3]) == (16, 16, 16)
    assert sd.face_kind[3] == ["rb"] * 6
    assert sd.face_kind[2] == ["phys"] * 6
    assert isinstance(make_solver(tree, cfg), DenseAMRMGSolver)
    # uniform tree -> not this solver
    ut = build_rectangle(3, np.full(3, 16), 8, np.full(3, 1.0 / 16),
                         np.zeros(3))
    assert not dense_amr_supported(ut, cfg)
    # periodic AMR -> boxed
    pt = build_amr_centered(3, 2, np.full(3, 16), 8, np.full(3, 1.0 / 16),
                            periodic=[True] * 3)
    assert not dense_amr_supported(pt, cfg)


@pytest.mark.parametrize("lvl_kind", ["top", "mid"])
def test_smooth_bitwise(lvl_kind):
    """Patch smoothing == boxed smooth_boxes bitwise, including the
    refinement-boundary ghost synthesis from the coarse strip."""
    sb, st_b, sd, st_d = setup_pair(n_levels=3)
    lam = jnp.asarray(0.0, jnp.float64)
    lvl = sb.levels[-1] if lvl_kind == "top" else sb.levels[-1] - 1
    st_b = sb._smooth_boxes(st_b, sb._to_device(), lvl, 1, lam)
    st_d = sd._smooth(st_d, lvl, 1, lam)
    ref = boxed_to_patch(sb, sd, st_b, lvl, IPHI)
    got = np.asarray(sd.interior(st_d, lvl, "phi"))
    assert np.array_equal(got, ref), (
        f"max diff {np.max(np.abs(got - ref))}")


def test_residual_bitwise():
    sb, st_b, sd, st_d = setup_pair(n_levels=3, operator="helmholtz")
    lam = jnp.asarray(0.7, jnp.float64)
    lvl = sb.levels[-1]
    st_b = sb._residual_lvl(st_b, sb._to_device(), lvl, lam)
    st_d = sd._residual(st_d, lvl, lam)
    ref = boxed_to_patch(sb, sd, st_b, lvl, IRES)
    got = np.asarray(sd.interior(st_d, lvl, "ires"))
    assert np.array_equal(got, ref)


def test_update_coarse_matches():
    """Down-leg FAS transfer: restriction region, tau-corrected rhs and
    iold match the boxed update_coarse (~1 ulp: restriction order)."""
    sb, st_b, sd, st_d = setup_pair(n_levels=3)
    lam = jnp.asarray(0.0, jnp.float64)
    top = sb.levels[-1]
    st_b = sb._update_coarse(st_b, sb._to_device(), top, lam)
    st_d = sd._update_coarse(st_d, top, lam)
    r0, r1 = sd.regions[top]
    reg = tuple(slice(int(r0[d]), int(r1[d])) for d in (2, 1, 0))
    for key, iv in (("phi", IPHI), ("rhs", IRHS), ("iold", IOLD)):
        ref = boxed_to_patch(sb, sd, st_b, top - 1, iv)
        got = np.asarray(sd.interior(st_d, top - 1, key))
        if key == "iold":
            # the boxed path stores iold only on parent boxes (reading
            # the ring from parent ghosts instead); values agree on the
            # region, storage differs outside it
            ref, got = ref[reg], got[reg]
        np.testing.assert_allclose(got, ref, rtol=0, atol=2e-13,
                                   err_msg=f"update_coarse {key}")


def test_correct_children_matches():
    """Up-leg correction: prolongation from the region + corr ring."""
    sb, st_b, sd, st_d = setup_pair(n_levels=3, seed=11)
    lam = jnp.asarray(0.0, jnp.float64)
    top = sb.levels[-1]
    rng = np.random.default_rng(4)
    # install a distinct iold on the coarse level in both solvers
    lvl_c = top - 1
    nb = sb.static[lvl_c]["n_boxes"]
    nc = sb.static[lvl_c]["nc"]
    isl = (slice(None),) + (slice(1, -1),) * 3
    iold = rng.normal(size=(nb,) + (nc,) * 3)
    st_b["cc"][lvl_c] = st_b["cc"][lvl_c].at[(IOLD,) + isl].set(iold)
    st_b = sb.fill_ghost(st_b, IOLD)
    st_d = sd.set_interior(st_d, lvl_c, "iold",
                           jnp.asarray(boxed_to_patch(sb, sd, st_b,
                                                      lvl_c, IOLD)))
    st_b = sb._correct_children(st_b, sb._to_device(), lvl_c)
    st_d = sd._correct_children(st_d, lvl_c, lam)
    ref = boxed_to_patch(sb, sd, st_b, top, IPHI)
    got = np.asarray(sd.interior(st_d, top, "phi"))
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(got - ref)) <= 1e-14 * scale, (
        f"max diff {np.max(np.abs(got - ref))}")


@pytest.mark.parametrize("n_levels", [2, 3])
def test_vcycle_equivalent(n_levels):
    """Full FAS V-cycle matches the boxed path to ~1 ulp."""
    sb, st_b, sd, st_d = setup_pair(n_levels=n_levels, coarse="smooth")
    st_b, res_b = sb.fas_vcycle(st_b)
    st_d, res_d = sd.fas_vcycle(st_d)
    for lvl in sd.levels:
        ref = boxed_to_patch(sb, sd, st_b, lvl, IPHI)
        got = np.asarray(sd.interior(st_d, lvl, "phi"))
        scale = max(np.max(np.abs(ref)), 1e-30)
        assert np.max(np.abs(got - ref)) <= 5e-13 * scale, (
            f"lvl {lvl}: max diff {np.max(np.abs(got - ref))}")
    assert abs(float(res_b) - float(res_d)) <= 1e-11 * max(
        1.0, abs(float(res_b)))


def test_fmg_equivalent():
    """Full FMG matches the boxed path to ~1 ulp on a 3-level tree."""
    sb, st_b, sd, st_d = setup_pair(n_levels=3, coarse="smooth", seed=8)
    st_b, res_b = sb.fas_fmg(st_b)
    st_d, res_d = sd.fas_fmg(st_d)
    top = sb.levels[-1]
    ref = boxed_to_patch(sb, sd, st_b, top, IPHI)
    got = np.asarray(sd.interior(st_d, top, "phi"))
    scale = max(np.max(np.abs(ref)), 1e-30)
    assert np.max(np.abs(got - ref)) <= 5e-13 * scale
    assert abs(float(res_b) - float(res_d)) <= 1e-11 * max(
        1.0, abs(float(res_b)))


def test_diffusion_on_dense_amr():
    """Implicit diffusion (helmholtz order 2) on a dense AMR tree:
    mass conserved under Neumann-0 walls, variance decays, residual
    target met (diffusion_solve, m_diffusion.f90:19-60)."""
    from octree_mg_tpu.solve.diffusion import diffusion_solve

    tree = build_amr_centered(3, 2, np.full(3, 16), 8,
                              np.full(3, 1.0 / 16))
    sd = make_solver(tree, MGConfig(operator="helmholtz"))
    assert isinstance(sd, DenseAMRMGSolver)
    sd.set_bc(0, BCType.NEUMANN, 0.0)
    st = sd.allocate()
    # initial condition on the leaves of both levels
    mass0 = 0.0
    for lvl in sd.levels[-2:]:
        x = sd.cell_centers(lvl)
        phi0 = 2.0 + solution(x)
        st = sd.set_interior(st, lvl, "phi", jnp.asarray(phi0))
    top = sd.levels[-1]
    var0 = float(jnp.var(sd.interior(st, top, "phi")))
    for _ in range(3):
        st, res = diffusion_solve(sd, st, dt=0.005, diffusion_coeff=1.0,
                                  order=2, max_res=1e-7)
    assert res <= 1e-7
    assert float(jnp.var(sd.interior(st, top, "phi"))) < 0.5 * var0


def test_refinement_convergence():
    """test_refinement.f90 semantics: manufactured solution on an AMR
    tree, FMG converges the leaf error to the discretization level and
    keeps contracting the residual."""
    tree = build_amr_centered(3, 3, np.full(3, 16), 8,
                              np.full(3, 1.0 / 16))
    sd = make_solver(tree, MGConfig(operator="laplacian"))
    assert isinstance(sd, DenseAMRMGSolver)
    sd.set_bc(0, BCType.DIRICHLET, fn=solution)
    st = sd.allocate()
    # discretely-generated rhs: rhs = A(phi_exact) per level
    for lvl in sd.levels:
        x = sd.cell_centers(lvl)
        st = sd.set_interior(st, lvl, "phi", jnp.asarray(solution(x)))
    st = sd.apply_operator(st, lam=0.0, out_key="rhs")
    for lvl in sd.levels:
        st = sd.set_interior(st, lvl, "phi",
                             jnp.zeros_like(sd.interior(st, lvl, "phi")))
    residuals = []
    for i in range(8):
        st, res = sd.fas_fmg(st, have_guess=(i > 0))
        residuals.append(float(res))
    # the AMR-level rhs was generated with refinement-face planes from
    # the exact coarse solution, so the discrete system is consistent
    # only to discretization order at the refinement boundary; check
    # the top-level error reaches that level and residual contracts
    top = sd.levels[-1]
    x = sd.cell_centers(top)
    err = np.max(np.abs(np.asarray(sd.interior(st, top, "phi"))
                        - solution(x)))
    assert err < 5e-2, f"solution error {err}"
    rate = (residuals[0] / residuals[4]) ** 0.25
    assert rate > 5.0, f"FMG contraction {rate}"
