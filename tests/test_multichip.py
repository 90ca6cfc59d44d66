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
