"""Pallas half-sweep == jnp masked half-sweep (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from octree_mg_tpu.core.indexmaps import checkerboard_parity
from octree_mg_tpu.ops import kernels
from octree_mg_tpu.ops.pallas_smoother import half_sweep_boxes


@pytest.mark.parametrize("ndim,nc", [(2, 8), (3, 8)])
@pytest.mark.parametrize("parity_val", [0, 1])
def test_pallas_half_sweep_matches_jnp(ndim, nc, parity_val):
    rng = np.random.default_rng(0)
    n = 16
    shape = (n,) + (nc + 2,) * ndim
    phi = rng.normal(size=shape).astype(np.float32)
    rhs = rng.normal(size=shape).astype(np.float32)
    idr2 = tuple(float(x) for x in (1.0, 2.0, 0.5)[:ndim])
    lam = 0.7

    ref = kernels.helmholtz_smooth_half(
        jnp.asarray(phi), jnp.asarray(rhs), ndim, nc, idr2, lam,
        jnp.asarray(checkerboard_parity(ndim, nc)) == parity_val)
    got = half_sweep_boxes(jnp.asarray(phi), jnp.asarray(rhs), ndim, nc,
                           idr2, lam, parity_val, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pallas_smoother_in_solver_bitwise():
    """cfg.pallas_smoother=True produces identical V-cycle results to the
    XLA smoother (interpret mode on CPU)."""
    from octree_mg_tpu import (IPHI, IRHS, MGConfig, MGExperimental,
                               MGSolver, build_rectangle)

    results = []
    for use_pallas in (False, True):
        dsz = np.full(3, 16)
        tree = build_rectangle(3, dsz, 8, 1.0 / dsz, np.zeros(3))
        solver = MGSolver(tree, MGConfig(operator="laplacian",
                                         experimental=MGExperimental(pallas_smoother=use_pallas)))
        state = solver.allocate()
        top = solver.levels[-1]
        rng = np.random.default_rng(21)
        isl = (slice(None),) + (slice(1, -1),) * 3
        rhs = np.zeros(np.asarray(state["cc"][top][IRHS]).shape)
        rhs[isl] = rng.normal(size=rhs[isl].shape)
        state["cc"][top] = state["cc"][top].at[IRHS].set(jnp.asarray(rhs))
        for _ in range(2):
            state, res = solver.fas_vcycle(state)
        results.append((np.asarray(state["cc"][top][IPHI]), float(res)))
    np.testing.assert_array_equal(results[0][0], results[1][0])
    assert results[0][1] == results[1][1]
