"""Multi-chip distribution of the multigrid state over a device mesh.

The reference's only parallelism model is block/domain decomposition:
each level's Morton-ordered box list is chunked across MPI ranks with all
tree metadata replicated (``src/m_load_balance.f90:22-63``), coarse levels
agglomerated onto one rank (:27-29,117-130), and halo exchange done with
per-rank-pair buffers.

TPU-native equivalent: the box axis of each level array is sharded across
a 1D mesh in equal contiguous chunks, coarse levels are **replicated**
instead of serialized (their compute is trivial; this removes the
reference's coarse-grid bottleneck and the single-rank restriction of
m_multigrid.f90:197-200), and the halo gathers lower to XLA collectives
over ICI.  No communication code is written by hand — the static gather
maps express the exchange pattern and GSPMD partitions it.

Load-balance contract: equal contiguous chunks by themselves realize
only ``mg_load_balance_simple`` (Morton chunks).  The full/parents
policies are realized by REORDERING each level's box-id list so that the
boxes a policy assigns to rank k occupy chunk k —
``core.load_balance.realize_ranks`` (called by ``apply_load_balance``)
performs that id reordering on the tree before this module chunks it.
Callers that want `mg_load_balance` / `mg_load_balance_parents`
placement semantics MUST build the tree through ``apply_load_balance``
(tests/test_load_balance.py pins chunk == policy rank sets); trees that
skip it get the simple policy.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BOX_AXIS = "boxes"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (BOX_AXIS,))


def level_shardable(solver, lvl: int, mesh: Mesh) -> bool:
    """A level is sharded when its box count is a multiple of the mesh
    size (Morton chunks of equal size); coarser levels are replicated —
    the TPU analogue of coarse-level agglomeration.

    AMR levels rarely have mesh-multiple box counts naturally; build
    the solver with ``MGConfig(pad_boxes_multiple=mesh.devices.size)``
    so every level with >= mesh-size boxes shards (pad boxes are inert,
    see indexmaps.build_level_maps)."""
    n = solver.static[lvl]["n_boxes"]
    nd = mesh.devices.size
    return n >= nd and n % nd == 0


def state_shardings(solver, mesh: Mesh) -> Dict:
    """Sharding pytree matching the solver state structure."""
    repl = NamedSharding(mesh, P())
    cc = {}
    bc = {}
    for lvl in solver.levels:
        if level_shardable(solver, lvl, mesh):
            cc[lvl] = NamedSharding(mesh, P(None, BOX_AXIS))
        else:
            cc[lvl] = repl
        # bc value arrays index physical-face subsets; replicate
        bc[lvl] = [repl] * len(solver.maps[lvl].dirs)
    return {"cc": cc, "bc": bc}


def shard_state(solver, state, mesh: Mesh):
    """Place a state pytree onto the mesh."""
    sh = state_shardings(solver, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, sh,
        is_leaf=lambda x: not isinstance(x, (dict, list)))


def replicate_maps(dmaps, mesh: Mesh):
    """Index maps are replicated metadata (as in the reference,
    m_load_balance.f90:1-3)."""
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), dmaps)
