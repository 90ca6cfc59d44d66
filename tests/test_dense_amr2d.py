"""2D dense-patch AMR solver vs the boxed solver.

2D counterpart of tests/test_dense_amr.py: every phase on quadtree AMR
trees must be bit-identical to the boxed path (refinement faces
evaluate the same sides_rb arithmetic with the same coarse-strip
interpolation values, FAS transfer touches exactly the parent region),
and full cycles match to ~1 ulp.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from octree_mg_tpu import (IOLD, IPHI, IRES, IRHS, BCType,
                           Dense2DAMRMGSolver, MGConfig, MGSolver,
                           build_amr_centered, build_rectangle,
                           dense_amr2d_supported, make_solver)

N_MODES = 2


def solution(x):
    out = 1.0
    for d in range(x.shape[-1]):
        out = out * np.sin(2 * np.pi * N_MODES * x[..., d])
    return out


def boxed_to_patch(solver_b, solver_d, state_b, lvl, iv):
    """Assemble the dense patch interior [Y, X] from a boxed level."""
    t = solver_b.tree
    nc = t.box_size_lvl[lvl]
    X, Y = solver_d.dims[lvl]
    off = solver_d.offsets[lvl] // nc
    out = np.zeros((Y, X))
    arr = np.asarray(state_b["cc"][lvl][iv])
    for loc, b in enumerate(t.lvls[lvl].ids):
        ix = t.ix[b] - 1 - off
        sl = tuple(slice(ix[d] * nc, (ix[d] + 1) * nc) for d in (1, 0))
        out[sl] = arr[loc][(slice(1, -1),) * 2]
    return out


def setup_pair(n_levels=3, size=16, box=8, coarse="smooth", seed=3,
               operator="laplacian"):
    tree = build_amr_centered(2, n_levels, np.full(2, size), box,
                              np.full(2, 1.0 / size))
    sb = MGSolver(tree, MGConfig(operator=operator, smoother="gsrb"))
    sd = Dense2DAMRMGSolver(tree, MGConfig(operator=operator,
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
        isl = (slice(None),) + (slice(1, -1),) * 2
        for iv in (IPHI, IRHS):
            vals = rng.normal(size=(nb,) + (nc,) * 2)
            st_b["cc"][lvl] = st_b["cc"][lvl].at[(iv,) + isl].set(vals)
    st_b = sb.fill_ghost(st_b, IPHI)
    st_b = sb.fill_ghost(st_b, IRHS)
    for lvl in sd.levels:
        for k, iv in (("phi", IPHI), ("rhs", IRHS)):
            vals = boxed_to_patch(sb, sd, st_b, lvl, iv)
            st_d = sd.set_interior(st_d, lvl, k, jnp.asarray(vals))
    return sb, st_b, sd, st_d


def test_geometry_and_gating():
    tree = build_amr_centered(2, 3, np.full(2, 16), 8,
                              np.full(2, 1.0 / 16))
    cfg = MGConfig(operator="laplacian")
    assert dense_amr2d_supported(tree, cfg)
    sd = Dense2DAMRMGSolver(tree, cfg)
    assert sd.dims[2] == (32, 32) and sd._whole_region(2)
    assert sd.dims[3] == (32, 32) and not sd._whole_region(3)
    assert tuple(sd.offsets[3]) == (16, 16)
    assert sd.face_kind[3] == ["rb"] * 4
    assert sd.face_kind[2] == ["phys"] * 4
    assert isinstance(make_solver(tree, cfg), Dense2DAMRMGSolver)
    ut = build_rectangle(2, np.full(2, 16), 8, np.full(2, 1.0 / 16),
                         np.zeros(2))
    assert not dense_amr2d_supported(ut, cfg)
    pt = build_amr_centered(2, 2, np.full(2, 16), 8,
                            np.full(2, 1.0 / 16), periodic=[True] * 2)
    assert not dense_amr2d_supported(pt, cfg)


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
    sb, st_b, sd, st_d = setup_pair(n_levels=3)
    lam = jnp.asarray(0.0, jnp.float64)
    top = sb.levels[-1]
    st_b = sb._update_coarse(st_b, sb._to_device(), top, lam)
    st_d = sd._update_coarse(st_d, top, lam)
    r0, r1 = sd.regions[top]
    reg = tuple(slice(int(r0[d]), int(r1[d])) for d in (1, 0))
    for key, iv in (("phi", IPHI), ("rhs", IRHS), ("iold", IOLD)):
        ref = boxed_to_patch(sb, sd, st_b, top - 1, iv)
        got = np.asarray(sd.interior(st_d, top - 1, key))
        if key == "iold":
            ref, got = ref[reg], got[reg]
        # ~1 ulp: the 2D matmul restriction associates the 4-cell sum
        # differently from the boxed reshape path (rel diff <= 2e-14)
        scale = np.max(np.abs(ref))
        np.testing.assert_allclose(got, ref, rtol=0, atol=5e-14 * scale,
                                   err_msg=f"update_coarse {key}")


def test_correct_children_matches():
    sb, st_b, sd, st_d = setup_pair(n_levels=3, seed=11)
    lam = jnp.asarray(0.0, jnp.float64)
    top = sb.levels[-1]
    rng = np.random.default_rng(4)
    lvl_c = top - 1
    nb = sb.static[lvl_c]["n_boxes"]
    nc = sb.static[lvl_c]["nc"]
    isl = (slice(None),) + (slice(1, -1),) * 2
    iold = rng.normal(size=(nb,) + (nc,) * 2)
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


def test_manufactured_convergence():
    """FMG + V-cycles drive the leaf error to the discretization level
    on a 3-level quadtree (test_refinement.f90 semantics, discrete rhs
    from the exact solution)."""
    tree = build_amr_centered(2, 3, np.full(2, 32), 8,
                              np.full(2, 1.0 / 32))
    cfg = MGConfig(operator="laplacian", coarse_solver="direct")
    sd = make_solver(tree, cfg)
    assert isinstance(sd, Dense2DAMRMGSolver)
    sd.set_bc(0, BCType.DIRICHLET, fn=solution)
    state = sd.allocate()
    # discrete rhs: exact solution on every level, restricted down so
    # the refinement-boundary ghosts are consistent (the reference test
    # restricts + ghost-fills the solution field first,
    # tests/test_refinement.f90:124-145), then one operator apply
    for lvl in sd.levels:
        state = sd.set_interior(
            state, lvl, "phi",
            jnp.asarray(solution(sd.cell_centers(lvl))))
    for lvl in reversed(sd.levels[1:]):
        state = sd._restrict_into(state, lvl, "phi")
    lam = jnp.asarray(0.0, jnp.float64)
    rhs_all = {lvl: sd._apply_op(state, lvl, lam) for lvl in sd.levels}
    for lvl in sd.levels:
        state = sd.set_interior(state, lvl, "rhs", rhs_all[lvl])
        state = sd.set_interior(state, lvl, "phi",
                                jnp.zeros(sd.dims[lvl][::-1]))
    state, _ = sd.fas_fmg(state)
    for _ in range(6):
        state, _ = sd.fas_vcycle(state)
    top = sd.levels[-1]
    err = np.max(np.abs(np.asarray(sd.interior(state, top, "phi"))
                        - solution(sd.cell_centers(top))))
    assert err < 1e-8, f"top-level error {err}"
