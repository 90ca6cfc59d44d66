"""Explicit shard_map halo exchange == gather-based ghost fill."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octree_mg_tpu import IPHI, MGConfig, MGSolver, build_rectangle
from octree_mg_tpu.parallel import halo, sharding as sh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("periodic", [False, True])
def test_shardmap_halo_matches_reference_fill(periodic):
    ndim, size, box = 3, 32, 8
    dsz = np.full(ndim, size)
    tree = build_rectangle(ndim, dsz, box, 1.0 / dsz, np.zeros(ndim),
                           periodic=[periodic] * ndim)
    solver = MGSolver(tree, MGConfig(operator="laplacian"))
    state = solver.allocate()
    top = solver.levels[-1]
    rng = np.random.default_rng(11)
    vals = rng.normal(size=np.asarray(state["cc"][top][IPHI]).shape)
    state["cc"][top] = state["cc"][top].at[IPHI].set(jnp.asarray(vals))

    # reference path (single device)
    ref_state = solver.fill_ghost(state, IPHI, lvl=top)
    ref = np.asarray(ref_state["cc"][top][IPHI])

    # explicit shard_map path on an 8-device mesh
    mesh = sh.make_mesh(8)
    dmaps = solver._to_device()
    maps = halo.stack_dir_maps(dmaps[top])
    v = jax.device_put(state["cc"][top][IPHI],
                       jax.sharding.NamedSharding(
                           mesh, jax.sharding.PartitionSpec(sh.BOX_AXIS)))
    out = halo.fill_same_level_ghosts_shardmap(
        v, maps["nb_loc"], maps["has_nb"], mesh, ndim, box)
    got = np.asarray(out)

    # same-level ghost faces must agree exactly; physical faces are not
    # touched by the shard_map fill, so compare only where a neighbor
    # exists
    for nb in range(2 * ndim):
        from octree_mg_tpu.core.indexmaps import face_slicer
        gh = face_slicer(ndim, nb, box, 0)
        has = np.asarray(solver.maps[top].dirs[nb].has_nb)
        np.testing.assert_array_equal(got[gh][has], ref[gh][has])
