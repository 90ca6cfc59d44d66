"""Explicit halo exchange under ``jax.shard_map``.

The default execution mode lets GSPMD partition the ghost-fill gathers.
This module is the *explicit* TPU-native exchange for multi-host runs,
mirroring the reference's communication structure
(``src/m_ghost_cells.f90`` + ``src/m_communication.f90``) with
collectives instead of rank-pair buffers:

* every shard extracts its 2*D interior face planes (the analogue of
  ``buffer_ghost_cells``);
* one ``all_gather`` over the box axis makes all faces visible — face
  payloads are ``2*D*nc^(D-1)/(nc+2)^D`` (~1/3 at nc=16, ~1/6 at nc=32)
  of the full field, the same data volume the reference ships through
  MPI, delivered over ICI;
* each shard row-gathers its own ghosts locally (the analogue of
  ``set_ghost_cells`` consuming the recv buffer).

Under the equal Morton chunking of ``parallel/sharding.py``, restriction
and prolongation are shard-local by construction (children of one parent
are contiguous in level order, and fine chunk boundaries align with
coarse chunk boundaries when both levels shard evenly), so the halo is
the only communication in the smoother path — as in the reference.

This module provides the building block + parity test hook; wiring it
through the cycle drivers (with interior-compute/halo overlap, the
opportunity SURVEY §2.4.3 notes the reference leaves on the table) is the
next scaling step.
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import topology as topo
from ..core.indexmaps import face_slicer
from .sharding import BOX_AXIS


def fill_same_level_ghosts_shardmap(v: jnp.ndarray, nb_loc: jnp.ndarray,
                                    has_nb: jnp.ndarray, mesh: Mesh,
                                    ndim: int, nc: int) -> jnp.ndarray:
    """Same-level neighbor ghost fill of one variable plane
    ``v [n, (nc+2)^D]`` sharded along the box axis.

    Equivalent to the same-level part of ops.ghost.fill_ghost_lvl, but
    with the cross-shard movement expressed as an explicit face
    all-gather inside shard_map.
    """
    nnb = topo.num_neighbors(ndim)
    n = v.shape[0]
    k = mesh.devices.size
    assert n % k == 0

    def body(v_sh, nb_loc_sh, has_nb_sh):
        # [2D, n/k, face]: my interior face planes
        faces = jnp.stack([
            v_sh[face_slicer(ndim, topo.neighb_rev(nb), nc, 1)]
            for nb in range(nnb)])
        # faces of every shard: [k, 2D, n/k, face] -> [2D, n, face]
        all_faces = jax.lax.all_gather(faces, BOX_AXIS)
        all_faces = jnp.moveaxis(all_faces, 0, 1).reshape(
            (nnb, n) + faces.shape[2:])
        out = v_sh
        mshape = (-1,) + (1,) * (ndim - 1)
        for nb in range(nnb):
            gh_sl = face_slicer(ndim, nb, nc, 0)
            gathered = all_faces[nb][nb_loc_sh[nb]]
            newface = jnp.where(has_nb_sh[nb].reshape(mshape), gathered,
                                out[gh_sl])
            out = out.at[gh_sl].set(newface)
        return out

    spec_v = P(BOX_AXIS)
    spec_maps = P(None, BOX_AXIS)
    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(spec_v, spec_maps, spec_maps),
                       out_specs=spec_v)
    nb_loc_all = nb_loc
    has_nb_all = has_nb
    return fn(v, nb_loc_all, has_nb_all)


def stack_dir_maps(dmaps_lvl: Dict) -> Dict:
    """[2D, n] stacked neighbor maps for the shard_map fill."""
    nb_loc = jnp.stack([d["nb_loc"] for d in dmaps_lvl["dirs"]])
    has_nb = jnp.stack([d["has_nb"] for d in dmaps_lvl["dirs"]])
    return {"nb_loc": nb_loc, "has_nb": has_nb}
