"""Multi-chip dense-patch AMR: z-slabs on the uniform base, replicated
patches.

Extends the z-slab shard_map machinery (solve/dense_shard.py) to the
dense-patch AMR solver (solve/dense_amr.py): whole-domain uniform
levels shard as z-slabs over the 1D mesh exactly like the uniform
solver; rectangular refinement patches REPLICATE — every shard smooths
the patch identically, the TPU analogue of the reference's coarse-level
agglomeration (m_load_balance.f90:27-29) applied upward.  This keeps
every inter-level transfer deterministic and bitwise vs the
single-device dense-AMR solver while the dominant full-domain work
distributes:

* patch -> sharded-coarse restriction / tau-corrected rhs: computed
  replicated on the patch, written into each shard's slab through a
  traced z mask over the footprint region (update_coarse touches
  parents only, m_multigrid.f90:347-384);
* sharded-coarse -> patch strips/corrections: the coarse level is
  reassembled from its slabs with ``lax.all_gather`` (one collective),
  then the single-device region machinery runs replicated
  (box_gc_for_fine_neighbor strips, correct_children rings).

When the refined region is a large fraction of the domain the
replicated patch work bounds scaling — see docs/PERF.md for the
comm/compute budget; slab-decomposing thick patches is the extension
point.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh

from ..core.tree import Tree
from ..ops import dense_kernels as dk
from .dense import DenseMGSolver, _ISL
from .dense_amr import DenseAMRMGSolver, dense_amr_supported
from .dense_shard import AXIS, ShardedDenseMGSolver
from .multigrid import MGConfig


class ShardedDenseAMRMGSolver(ShardedDenseMGSolver, DenseAMRMGSolver):
    """Dense-patch AMR distributed over a 1D mesh by z-slabs."""

    _supported = staticmethod(dense_amr_supported)

    def __init__(self, tree: Tree, config: Optional[MGConfig] = None,
                 mesh: Optional[Mesh] = None):
        super().__init__(tree, config, mesh)
        # only whole-domain uniform levels shard; patches replicate
        for lvl in self.levels:
            self.sharded[lvl] = bool(self.sharded[lvl]
                                     and self._full_level(lvl))
        # eager: planes built inside a shard_map trace would leak
        # tracers through the cache
        self._fpl_cache: Dict[int, List] = {
            lvl: DenseAMRMGSolver._eval_bc_planes(self, lvl)
            for lvl in self.levels if self.sharded[lvl]}

    def set_bc(self, iv: int, bc_type, value: float = 0.0,
               nb: Optional[int] = None, fn=None):
        super().set_bc(iv, bc_type, value=value, nb=nb, fn=fn)
        self._fpl_cache = {
            lvl: DenseAMRMGSolver._eval_bc_planes(self, lvl)
            for lvl in self.levels if self.sharded[lvl]}

    def _full_level(self, lvl: int) -> bool:
        return bool(np.all(self.offsets[lvl] == 0) and np.all(
            np.asarray(self.dims[lvl])
            == np.asarray(self.tree.domain_size_lvl[lvl])))

    def _full_planes(self, lvl: int):
        """Full-extent physical BC planes of a (sharded) full level,
        for the gathered-view consumers (built eagerly at construction:
        creating them inside a shard_map trace would leak tracers)."""
        return self._fpl_cache[lvl]

    # ------------------------------------------------------------------
    # gathered views (sharded level -> full replicated array)
    # ------------------------------------------------------------------
    def _gather_full(self, state, lvl, key):
        """Reassemble the full padded level array from the z slabs
        (agglomeration-by-replication at the patch transitions)."""
        arr = state[key][lvl]
        slabs = lax.all_gather(arr[_ISL], AXIS)     # [K, Zl, Y, X]
        X, Y, Z = self.dims[lvl]
        full = slabs.reshape(Z, Y, X)
        out = jnp.zeros(dk.padded_shape(self.dims[lvl]), self.cfg.dtype)
        return out.at[_ISL].set(full)

    def _gathered_state(self, state, lvl, keys):
        tmp = dict(state)
        for key in keys:
            tmp[key] = dict(state[key])
            tmp[key][lvl] = self._gather_full(state, lvl, key)
        tmp["bc"] = dict(state["bc"])
        tmp["bc"][lvl] = self._full_planes(lvl)
        return tmp

    def _var_with_ring(self, state, lvl, key):
        """Patch strips/rings read the coarse level globally; gather it
        when sharded (one all_gather — the analogue of the reference's
        coarse owners shipping interpolated faces,
        m_ghost_cells.f90:200-229)."""
        if self._ctx is not None and self.sharded[lvl]:
            tmp = self._gathered_state(state, lvl, (key,))
            return DenseMGSolver._var_with_ring(self, tmp, lvl, key)
        return super()._var_with_ring(state, lvl, key)

    # ------------------------------------------------------------------
    # level-kind dispatch
    # ------------------------------------------------------------------
    def _smooth(self, state, lvl, n_cycle, lam):
        if self._ctx is not None and self.sharded[lvl]:
            return ShardedDenseMGSolver._smooth(self, state, lvl,
                                                n_cycle, lam)
        # replicated level (patch or agglomerated): single-device
        # machinery (rb planes via _planes), identical on every shard
        return DenseMGSolver._smooth(self, state, lvl, n_cycle, lam)

    def _residual(self, state, lvl, lam):
        if self._ctx is not None and self.sharded[lvl]:
            return ShardedDenseMGSolver._residual(self, state, lvl, lam)
        return DenseMGSolver._residual(self, state, lvl, lam)

    def _apply_op(self, state, lvl, lam):
        if self._ctx is not None and self.sharded[lvl]:
            return ShardedDenseMGSolver._apply_op(self, state, lvl, lam)
        return DenseMGSolver._apply_op(self, state, lvl, lam)

    # ------------------------------------------------------------------
    # transfers across the replicated/sharded boundary
    # ------------------------------------------------------------------
    def _region_z_mask(self, lvl):
        """(local z rows inside lvl's footprint region) of my slab of
        lvl-1, as a broadcastable [Zl, 1, 1] bool."""
        r0, r1 = self.regions[lvl]
        Zlc = self._zl(lvl - 1)
        idx = self._ctx["idx"]
        gz = lax.broadcasted_iota(jnp.int32, (Zlc, 1, 1), 0) + idx * Zlc
        return (gz >= int(r0[2])) & (gz < int(r1[2]))

    def _region_slab_slices(self, lvl):
        """Slab-local padded slices of the region's y/x columns over all
        local z rows of lvl-1."""
        r0, r1 = self.regions[lvl]
        Zlc = self._zl(lvl - 1)
        return (slice(dk.PZ, dk.PZ + Zlc),
                slice(dk.PY + int(r0[1]), dk.PY + int(r1[1])),
                slice(int(r0[0]), int(r1[0])))

    def _region_fullz(self, lvl, vals):
        """Region-shaped values -> full-z column array [Zc, ny, nx],
        then my slab's rows [Zlc, ny, nx]."""
        r0, r1 = self.regions[lvl]
        Zc = self.dims[lvl - 1][2]
        Zlc = self._zl(lvl - 1)
        full = jnp.zeros((Zc, int(r1[1] - r0[1]), int(r1[0] - r0[0])),
                         self.cfg.dtype)
        full = full.at[int(r0[2]):int(r1[2])].set(vals)
        idx = self._ctx["idx"]
        return lax.dynamic_slice_in_dim(full, idx * Zlc, Zlc, axis=0)

    def _restrict_into(self, state, lvl, key):
        cross = (self._ctx is not None and not self.sharded[lvl]
                 and self.sharded.get(lvl - 1)
                 and not self._whole_region(lvl))
        if not cross:
            return super()._restrict_into(state, lvl, key)
        # replicated patch -> sharded coarse: full-weighting on the
        # patch (identical on every shard), masked write into my slab
        fine = state[key][lvl]
        cfg = self._kcfgs[lvl]
        half = tuple(v // 2 for v in cfg.dims)
        if cfg.use_kernel and dk.transfer_tiles(half) is not None:
            avg = dk.restrict_dense(cfg, fine)[_ISL]
        else:
            avg = lax.reduce_window(
                fine[_ISL], jnp.zeros((), fine.dtype), lax.add,
                (2, 2, 2), (2, 2, 2), "VALID") / 8.0
        my = self._region_fullz(lvl, avg)
        sl = self._region_slab_slices(lvl)
        mask = self._region_z_mask(lvl)
        coarse = state[key][lvl - 1]
        coarse = coarse.at[sl].set(jnp.where(mask, my, coarse[sl]))
        return self._set(state, key, lvl - 1, coarse)

    def _finish_coarse_rhs(self, state, lvl, lam):
        cross = (self._ctx is not None and self.sharded.get(lvl - 1)
                 and not self._whole_region(lvl))
        if not cross:
            return super()._finish_coarse_rhs(state, lvl, lam)
        a_phi = self._apply_op(state, lvl - 1, lam)   # slab-local
        sl = self._region_slab_slices(lvl)
        mask = self._region_z_mask(lvl)
        rhs_c = state["rhs"][lvl - 1]
        tau = a_phi[sl] + state["ires"][lvl - 1][sl]
        rhs_c = rhs_c.at[sl].set(jnp.where(mask, tau, rhs_c[sl]))
        state = self._set(state, "rhs", lvl - 1, rhs_c)
        state = self._set(state, "iold", lvl - 1, state["phi"][lvl - 1])
        return state

    def _correct_children(self, state, lvl_c, lam):
        lvl = lvl_c + 1
        if (self._ctx is not None and self.sharded[lvl_c]
                and not self._whole_region(lvl)):
            # sharded coarse -> replicated patch: gather, then the
            # single-device region correction (identical per shard)
            tmp = self._gathered_state(state, lvl_c, ("phi", "iold"))
            out = DenseAMRMGSolver._correct_children(self, tmp, lvl_c,
                                                     lam)
            return self._set(state, "phi", lvl, out["phi"][lvl])
        if self._ctx is not None and not self.sharded[lvl_c] \
                and not self.sharded.get(lvl):
            return DenseAMRMGSolver._correct_children(self, state,
                                                      lvl_c, lam)
        return ShardedDenseMGSolver._correct_children(self, state,
                                                      lvl_c, lam)

    def _max_residual(self, state, lvl, lam):
        state = self._residual(state, lvl, lam)
        r = jnp.max(jnp.abs(state["ires"][lvl][_ISL]))
        if self._ctx is not None and self.sharded[lvl]:
            r = lax.pmax(r, AXIS)
        return state, r
