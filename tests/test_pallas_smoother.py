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
