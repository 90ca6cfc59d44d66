"""Multi-chip sharding tests on a virtual 8-device CPU mesh: the sharded
V-cycle/FMG must produce the same result as single-device (the reference
engineers rank-count-independent determinism via sorted buffers,
m_communication.f90:37-88; here it follows from the static gather maps)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octree_mg_tpu import IPHI, IRHS, BCType, MGConfig, MGSolver, build_rectangle
from octree_mg_tpu.parallel import sharding as sh


def make_problem(ndim=3, size=32, box=8):
    dsz = np.full(ndim, size)
    tree = build_rectangle(ndim, dsz, box, 1.0 / dsz, np.zeros(ndim))
    solver = MGSolver(tree, MGConfig(operator="laplacian"))
    state = solver.allocate()
    rng = np.random.default_rng(5)
    top = solver.levels[-1]
    rhs = rng.normal(size=np.asarray(state["cc"][top][IRHS]).shape)
    isl = (slice(None),) + (slice(1, -1),) * ndim
    z = np.zeros_like(rhs)
    z[isl] = rhs[isl]
    state["cc"][top] = state["cc"][top].at[IRHS].set(jnp.asarray(z))
    return solver, state


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_vcycle_matches_single_device():
    solver, state = make_problem()
    # single-device result
    state1, res1 = solver.fas_vcycle(state)

    mesh = sh.make_mesh(8)
    sstate = sh.shard_state(solver, state, mesh)
    state8, res8 = solver.fas_vcycle(sstate)

    top = solver.levels[-1]
    a = np.asarray(state1["cc"][top][IPHI])
    b = np.asarray(state8["cc"][top][IPHI])
    np.testing.assert_allclose(a, b, rtol=1e-13, atol=1e-13)
    assert np.isclose(float(res1), float(res8), rtol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_fmg_converges():
    solver, state = make_problem()
    mesh = sh.make_mesh(8)
    state = sh.shard_state(solver, state, mesh)
    state, res0 = solver.fas_fmg(state)
    for _ in range(3):
        state, res = solver.fas_fmg(state, have_guess=True)
    assert float(res) < float(res0) * 1e-3


def test_shardings_structure():
    solver, state = make_problem(2, 32, 8)
    mesh = sh.make_mesh(min(8, len(jax.devices())))
    specs = sh.state_shardings(solver, mesh)
    # top level sharded along boxes, coarsest replicated
    top, bot = solver.levels[-1], solver.levels[0]
    assert specs["cc"][top].spec == jax.sharding.PartitionSpec(None, "boxes")
    assert specs["cc"][bot].spec == jax.sharding.PartitionSpec()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_padded_amr_sharding_matches_single():
    """AMR levels shard with pad_boxes_multiple=8 (inert pad boxes):
    no level with >= 8 boxes stays replicated, and the sharded V-cycle
    matches the unpadded single-device result (VERDICT r1 item 4)."""
    from octree_mg_tpu import build_amr_centered

    def build(pad):
        tree = build_amr_centered(3, 3, np.full(3, 16), 4,
                                  np.full(3, 1.0 / 16))
        solver = MGSolver(tree, MGConfig(operator="laplacian",
                                         pad_boxes_multiple=pad))
        state = solver.allocate()
        rng = np.random.default_rng(5)
        top = solver.levels[-1]
        nr = solver.static[top]["n_real"]
        nc = solver.static[top]["nc"]
        rhs = rng.normal(size=(nr,) + (nc,) * 3)
        isl = (slice(0, nr),) + (slice(1, -1),) * 3
        state["cc"][top] = state["cc"][top].at[(IRHS,) + isl].set(
            jnp.asarray(rhs))
        return solver, state

    s1, st1 = build(pad=0)
    st1, res1 = s1.fas_vcycle(st1)

    s8, st8 = build(pad=8)
    mesh = sh.make_mesh(8)
    # every level with >= 8 boxes must shard now
    for lvl in s8.levels:
        if s8.static[lvl]["n_real"] >= 8:
            assert sh.level_shardable(s8, lvl, mesh), lvl
    st8 = sh.shard_state(s8, st8, mesh)
    st8, res8 = s8.fas_vcycle(st8)

    top = s1.levels[-1]
    nr = s1.static[top]["n_real"]
    a = np.asarray(st1["cc"][top][IPHI])[:nr]
    b = np.asarray(st8["cc"][top][IPHI])[:nr]
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-13)
    assert np.isclose(float(res1), float(res8), rtol=1e-11)
