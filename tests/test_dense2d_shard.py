"""Multi-chip dense 2D path: GSPMD y-slab sharding on the CPU mesh.

The 2D fast path is pure XLA, so it goes multi-chip by placing the
[Y, X] level arrays with a y-slab NamedSharding and letting the SPMD
partitioner insert the halo collective-permutes (Dense2DMGSolver.
shard_state) — validated here against the single-device solver on 8
virtual devices.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from octree_mg_tpu import BCType, MGConfig, build_rectangle, make_solver
from octree_mg_tpu.solve.dense2d import Dense2DMGSolver

N_MODES = 2


def solution(x):
    out = 1.0
    for d in range(x.shape[-1]):
        out = out * np.sin(2 * np.pi * N_MODES * x[..., d])
    return out


def setup(size=128, operator="laplacian", periodic=False, n_dev=8):
    dsz = np.full(2, size)
    tree = build_rectangle(2, dsz, 16, 1.0 / dsz, np.zeros(2),
                           periodic=[periodic] * 2)
    solver = make_solver(tree, MGConfig(operator=operator))
    assert isinstance(solver, Dense2DMGSolver)
    if not periodic:
        solver.set_bc(0, BCType.DIRICHLET, fn=solution)
    state = solver.allocate()
    rng = np.random.default_rng(11)
    top = solver.levels[-1]
    state = solver.set_interior(state, top, "rhs",
                                jnp.asarray(rng.normal(size=(size, size))))
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("y",))
    return solver, state, mesh, rng


def test_sharding_decisions():
    solver, state, mesh, _ = setup(size=128)
    st = solver.shard_state(state, mesh)
    # 128 rows / 8 = 16-row slabs sharded; 64/8=8 < 16 replicated
    top = solver.levels[-1]
    assert solver.y_sharded[top]
    assert not solver.y_sharded[solver.levels[0]]
    spec = st["phi"][top].sharding.spec
    assert tuple(spec) == ("y", None)
    # replicated levels carry no partition
    assert all(s is None for s in (st["phi"][solver.levels[0]]
                                   .sharding.spec or (None,)))


@pytest.mark.parametrize("periodic", [False, True])
def test_sharded_fmg_matches_single(periodic):
    solver, state, mesh, _ = setup(size=128, periodic=periodic)
    st_ref, res_ref = solver.fas_fmg(state)
    solver2, state2, _, _ = setup(size=128, periodic=periodic)
    st_sh = solver2.shard_state(state2, mesh)
    st_sh, res_sh = solver2.fas_fmg(st_sh)
    top = solver.levels[-1]
    a = np.asarray(solver.interior(st_ref, top, "phi"))
    b = np.asarray(solver2.interior(st_sh, top, "phi"))
    scale = np.max(np.abs(a)) + 1e-300
    assert np.max(np.abs(a - b)) <= 1e-12 * scale
    assert abs(float(res_ref) - float(res_sh)) <= 1e-12 * (
        abs(float(res_ref)) + 1e-300)
    # the distributed program kept the fine level distributed
    assert tuple(st_sh["phi"][top].sharding.spec)[0] == "y"


def test_sharded_vcycle_converges():
    solver, state, mesh, _ = setup(size=128)
    st = solver.shard_state(state, mesh)
    st, r0 = solver.fas_vcycle(st)
    st, r1 = solver.fas_vcycle(st)
    assert float(r1) < 0.2 * float(r0)


def test_sharded_amr2d_matches_single():
    """The 2D dense-patch AMR solver is pure XLA too: GSPMD y-slab
    placement distributes the whole AMR cycle (refinement-boundary
    strip interpolation included) — multi-chip AMR on a fast path."""
    from octree_mg_tpu import build_amr_centered
    from octree_mg_tpu.solve.dense_amr2d import Dense2DAMRMGSolver

    def mk():
        tree = build_amr_centered(2, 3, np.full(2, 128), 16,
                                  np.full(2, 1.0 / 128))
        sv = make_solver(tree, MGConfig(operator="laplacian"))
        assert isinstance(sv, Dense2DAMRMGSolver)
        sv.set_bc(0, BCType.DIRICHLET, fn=solution)
        st = sv.allocate()
        rng = np.random.default_rng(5)
        for lvl in sv.levels:
            st = sv.set_interior(
                st, lvl, "rhs",
                jnp.asarray(rng.normal(size=sv.dims[lvl][::-1])))
        return sv, st

    sv1, st1 = mk()
    st1, res1 = sv1.fas_fmg(st1)
    sv2, st2 = mk()
    mesh = Mesh(np.array(jax.devices()[:8]), ("y",))
    st2 = sv2.shard_state(st2, mesh)
    assert any(sv2.y_sharded[l] for l in sv2.levels)
    st2, res2 = sv2.fas_fmg(st2)
    top = sv1.levels[-1]
    a = np.asarray(sv1.interior(st1, top, "phi"))
    b = np.asarray(sv2.interior(st2, top, "phi"))
    scale = np.max(np.abs(a)) + 1e-300
    assert np.max(np.abs(a - b)) <= 1e-12 * scale
    assert abs(float(res1) - float(res2)) <= 1e-12 * (
        abs(float(res1)) + 1e-300)


def test_sharded_vhelmholtz_matches_single():
    solver, state, mesh, rng = setup(size=128, operator="vhelmholtz")
    eps = jnp.asarray(0.5 + rng.random((128, 128)))
    state = solver.prepare_coefficient(solver.set_coefficient(state, eps))
    st_ref, _ = solver.fas_fmg(state, lam=0.3)
    solver2, state2, _, rng2 = setup(size=128, operator="vhelmholtz")
    eps2 = jnp.asarray(0.5 + rng2.random((128, 128)))
    state2 = solver2.prepare_coefficient(
        solver2.set_coefficient(state2, eps2))
    st_sh = solver2.shard_state(state2, mesh)
    st_sh, _ = solver2.fas_fmg(st_sh, lam=0.3)
    top = solver.levels[-1]
    a = np.asarray(solver.interior(st_ref, top, "phi"))
    b = np.asarray(solver2.interior(st_sh, top, "phi"))
    scale = np.max(np.abs(a)) + 1e-300
    assert np.max(np.abs(a - b)) <= 1e-12 * scale
