"""Multi-chip dense solver: z-slab decomposition under ``shard_map``.

TPU-native replacement for the reference's MPI rank decomposition
(``src/m_load_balance.f90``, ``src/m_communication.f90:37-66``): each
uniform level is split into z-slabs across a 1D device mesh; the only
communication in the smoother path is the 2-deep z halo, exchanged with
``lax.ppermute`` between mesh neighbors — the direct analogue of the
reference's neighbor-face isend/irecv, riding ICI instead of MPI.
Coarse levels whose slabs would become too thin are **replicated**
(every shard computes them identically), the TPU analogue of the
reference's coarse-level agglomeration (m_load_balance.f90:27-29) that
removes its single-rank bottleneck (m_multigrid.f90:197-200).

Layout: a sharded level is stored as ``[K, Zl+2*PZ, YPW, X]`` with the
leading shard axis sharded over the mesh — each device's chunk is a
local padded dense array whose z pads double as the halo receive
buffers.  All kernels run unchanged on the local slab; physical-BC
ghost synthesis at z faces is gated to the first/last shard
(``z_gates``), interior shards read their halo pads instead.

The whole FMG/V-cycle runs inside one ``shard_map`` — halo exchange,
reductions (pmax residual, psum mean) and the sharded<->replicated
level transitions (all_gather / slab slicing) are explicit collectives
in the cycle, overlapping-friendly and inspectable.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.tree import Tree
from ..ops import dense_kernels as dk
from .dense import DenseMGSolver, _ISL
from .multigrid import MGConfig

AXIS = "z"

#: minimum local slab thickness to keep a level sharded; thinner levels
#: are replicated (coarse-level agglomeration)
MIN_LOCAL_Z = 4


class ShardedDenseMGSolver(DenseMGSolver):
    """Dense solver distributed over a 1D mesh by z-slabs."""

    def __init__(self, tree: Tree, config: Optional[MGConfig] = None,
                 mesh: Optional[Mesh] = None):
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), (AXIS,))
        self.mesh = mesh
        self.K = mesh.devices.size
        super().__init__(tree, config)
        self.sharded = {}
        for lvl in self.levels:
            X, Y, Z = self.dims[lvl]
            # the coarsest cycled level never shards: the direct coarse
            # solve reshapes it globally (and it is tiny anyway)
            self.sharded[lvl] = (lvl != self.levels[0]
                                 and Z % self.K == 0
                                 and (Z // self.K) % 2 == 0
                                 and Z // self.K >= MIN_LOCAL_Z
                                 and self.K > 1)
        self._ctx = None  # set inside shard_map traces

    # -- local kernel configs ------------------------------------------
    def _kcfg(self, lvl: int) -> dk.DenseStencilConfig:
        cfg = super()._kcfg(lvl)
        if getattr(self, "sharded", {}).get(lvl):
            # rebuild with the local z extent
            return dk.DenseStencilConfig(
                dims=(cfg.X, cfg.Y, cfg.Z // self.K), idr2=cfg.idr2,
                bc=cfg.bc, periodic=cfg.periodic, dtype=cfg.dtype,
                b_const=cfg.b_const, interpret=cfg.interpret,
                n_eps=cfg.n_eps)
        return cfg

    def _zl(self, lvl):
        return self.dims[lvl][2] // self.K

    def _gates(self, lvl):
        """(lo, hi) z-face BC gates for this shard, or None if global."""
        if self._ctx is None or not self.sharded[lvl]:
            return None
        idx = self._ctx["idx"]
        return (idx == 0, idx == self.K - 1)

    # ------------------------------------------------------------------
    # state allocation (global, sharded layout)
    # ------------------------------------------------------------------
    def allocate(self) -> Dict:
        dt = self.cfg.dtype
        state: Dict = {k: {} for k in self._field_keys}
        state["bc"] = {}
        for lvl in self.levels:
            X, Y, Z = self.dims[lvl]
            if self.sharded[lvl]:
                shape = (self.K, self._zl(lvl) + 2 * dk.PZ,
                         Y + 2 * dk.PY, X)
                sh = NamedSharding(self.mesh, P(AXIS))
            else:
                shape = dk.padded_shape(self.dims[lvl])
                sh = NamedSharding(self.mesh, P())
            for k in ("phi", "rhs", "iold", "ires"):
                state[k][lvl] = jax.device_put(jnp.zeros(shape, dt), sh)
            for k in self._eps_keys:
                state[k][lvl] = jax.device_put(jnp.ones(shape, dt), sh)
            state["bc"][lvl] = self._alloc_bc(lvl)
        return state

    def prepare_coefficient(self, state):
        """Restrict the coefficient field(s) down every level on the
        global (gathered-interior) view — setup-time work, so it stays
        outside shard_map (the in-cycle halo exchange keeps the pads
        fresh at runtime)."""
        for key in self._eps_keys:
            for lvl in range(self.levels[-1], self.levels[0], -1):
                fine = self.interior(state, lvl, key)
                avg = lax.reduce_window(
                    fine, jnp.zeros((), fine.dtype), lax.add,
                    (2, 2, 2), (2, 2, 2), "VALID") / 8.0
                state = self.set_interior(state, lvl - 1, key, avg)
        self._direct = None
        return state

    def _alloc_bc(self, lvl):
        """Boundary-value planes in the sharded layout: x/y-face planes
        span z and are slab-stacked; z-face planes are replicated."""
        planes = self._eval_bc_planes(lvl)
        if not self.sharded[lvl]:
            repl = NamedSharding(self.mesh, P())
            return [jax.device_put(p, repl) for p in planes]
        out = []
        Zl = self._zl(lvl)
        shd = NamedSharding(self.mesh, P(AXIS))
        repl = NamedSharding(self.mesh, P())
        for i, p in enumerate(planes):
            if i >= 4 or self.periodic[i // 2]:
                out.append(jax.device_put(p, repl))
                continue
            # [Z+2PZ, ...] -> stacked [K, Zl+2PZ, ...] overlapping slabs
            rows = []
            for k in range(self.K):
                rows.append(np.asarray(p)[k * Zl:k * Zl + Zl + 2 * dk.PZ])
            out.append(jax.device_put(jnp.asarray(np.stack(rows)), shd))
        return out

    # -- host-side interior access (tests / setup) ----------------------
    def set_interior(self, state, lvl, key, values):
        state = dict(state)
        state[key] = dict(state[key])
        if not self.sharded[lvl]:
            state[key][lvl] = state[key][lvl].at[_ISL].set(values)
            return state
        X, Y, Z = self.dims[lvl]
        Zl = self._zl(lvl)
        v = values.reshape(self.K, Zl, Y, X)
        isl = (slice(None), slice(dk.PZ, -dk.PZ),
               slice(dk.PY, -dk.PY), slice(None))
        state[key][lvl] = state[key][lvl].at[isl].set(v)
        return state

    def interior(self, state, lvl, key):
        if not self.sharded[lvl]:
            return state[key][lvl][_ISL]
        X, Y, Z = self.dims[lvl]
        isl = (slice(None), slice(dk.PZ, -dk.PZ),
               slice(dk.PY, -dk.PY), slice(None))
        return state[key][lvl][isl].reshape(Z, Y, X)

    # ------------------------------------------------------------------
    # sharded building blocks (active inside shard_map traces)
    # ------------------------------------------------------------------
    def _sync_y(self, arr, lvl):
        """Local y-periodic wrap pads (no communication)."""
        X, Y, _ = self.dims[lvl]
        PY = dk.PY
        if self.periodic[1]:
            d = min(dk.PZ, Y)
            arr = arr.at[:, PY - d:PY].set(arr[:, Y + PY - d:Y + PY])
            arr = arr.at[:, Y + PY:Y + PY + d].set(arr[:, PY:PY + d])
        return arr

    def _sync_z(self, arr, lvl):
        """z halo exchange: my boundary interior planes -> neighbor pads
        (the reference's per-face isend/irecv, m_communication.f90:37-66).
        Deep halo: one ppermute pair per direction feeds the double-pair
        kernel's whole 4-deep halo (two GSRB iterations per exchange —
        half the per-pair ICI latency of a 2-deep halo); depth clamps to
        the slab thickness."""
        K = self.K
        Zl = self._zl(lvl)
        PZ = dk.PZ
        if self.periodic[2]:
            fwd = [(i, (i + 1) % K) for i in range(K)]
            bwd = [(i, (i - 1) % K) for i in range(K)]
        else:
            fwd = [(i, i + 1) for i in range(K - 1)]
            bwd = [(i, i - 1) for i in range(1, K)]
        e = min(PZ, Zl)
        top = arr[Zl + PZ - e:Zl + PZ]      # my top e interior planes
        bot = arr[PZ:PZ + e]                # my bottom e interior planes
        from_prev = lax.ppermute(top, AXIS, fwd)
        from_next = lax.ppermute(bot, AXIS, bwd)
        arr = arr.at[PZ - e:PZ].set(from_prev)
        arr = arr.at[Zl + PZ:Zl + PZ + e].set(from_next)
        return arr

    def _sync_pads(self, arr, lvl):
        if self._ctx is None or not self.sharded[lvl]:
            return super()._sync_pads(arr, lvl)
        return self._sync_y(self._sync_z(arr, lvl), lvl)

    def _edge_cfg(self, lvl, h):
        """Kernel config for an h-plane z-edge strip of a sharded
        level."""
        cfg = self._kcfgs[lvl]
        return dk.DenseStencilConfig(
            dims=(cfg.X, cfg.Y, h), idr2=cfg.idr2, bc=cfg.bc,
            periodic=cfg.periodic, dtype=cfg.dtype, b_const=cfg.b_const,
            interpret=cfg.interpret, n_eps=cfg.n_eps)

    def _overlapped_pairs(self, lvl, cfg, phi, rhs, lam, bp, zg, k, eps):
        """Halo-overlapped sweep pair group (SURVEY §2.4.3 — the
        opportunity the reference leaves on the table):

        1. issue the z ppermutes (async collectives on ICI),
        2. sweep the whole slab from pre-exchange data only — cells
           whose dependency cone (h = 2*n_pairs planes) reaches the
           halo produce garbage there,
        3. recompute the two h-plane edge strips with the fresh halos
           and patch them in.

        Bitwise identical to exchange-then-sweep: interior cells never
        read the halo, edge cells are recomputed with the exact same
        per-cell expression (sub-array runs the identical kernel/jnp
        body)."""
        PZ = dk.PZ
        Zl = self._zl(lvl)
        h = 2 * k
        loc = self._sync_y(phi, lvl)        # local wraps only
        arr = self._sync_z(loc, lvl)        # issues the ppermutes
        full = dk.pair_sweep_dense(cfg, loc, rhs, lam, bp, red_parity=0,
                                   z_gates=zg, n_pairs=k, eps=eps)
        ecfg = self._edge_cfg(lvl, h)
        w = h + 2 * PZ

        def windows(z0):
            sl = slice(z0, z0 + w)
            bpw = [p[sl] if i < 4 else p for i, p in enumerate(bp)]
            epw = tuple(e[sl] for e in eps)
            return arr[sl], rhs[sl], bpw, epw

        a_lo, r_lo, bp_lo, ep_lo = windows(0)
        lo = dk.pair_sweep_dense(ecfg, a_lo, r_lo, lam, bp_lo,
                                 red_parity=0, z_gates=(zg[0], False),
                                 n_pairs=k, eps=ep_lo)
        a_hi, r_hi, bp_hi, ep_hi = windows(Zl - h)
        hi = dk.pair_sweep_dense(ecfg, a_hi, r_hi, lam, bp_hi,
                                 red_parity=0, z_gates=(False, zg[1]),
                                 n_pairs=k, eps=ep_hi)
        full = full.at[PZ:PZ + h].set(lo[PZ:PZ + h])
        full = full.at[PZ + Zl - h:PZ + Zl].set(hi[PZ:PZ + h])
        return full

    def _smooth(self, state, lvl, n_cycle, lam):
        cfg = self._kcfgs[lvl]
        phi = state["phi"][lvl]
        rhs = self._sync_pads(state["rhs"][lvl], lvl)
        bp = state["bc"][lvl]
        zg = self._gates(lvl)
        eps = self._eps(state, lvl)
        sharded_now = self._ctx is not None and self.sharded[lvl]
        rem = n_cycle
        while rem > 0:
            k = 2 if (rem >= 2 and cfg.use_kernel) else 1
            if (sharded_now and self.cfg.overlap_halo
                    and self._zl(lvl) >= 4 * k):
                phi = self._overlapped_pairs(lvl, cfg, phi, rhs, lam, bp,
                                             zg, k, eps)
            else:
                phi = self._sync_pads(phi, lvl)
                phi = dk.pair_sweep_dense(cfg, phi, rhs, lam, bp,
                                          red_parity=0, z_gates=zg,
                                          n_pairs=k, eps=eps)
            rem -= k
        return self._set(state, "phi", lvl, phi)

    def _fused_transfer_ok(self, lvl):
        # the fused downsweep/update_coarse kernels need an hz<=5 halo
        # and in-kernel restriction across slab boundaries — sharded
        # levels run the separate kernels; replicated (agglomerated)
        # levels use the base path
        if self.sharded[lvl] or self.sharded.get(lvl - 1):
            return False
        return super()._fused_transfer_ok(lvl)

    def _residual(self, state, lvl, lam):
        cfg = self._kcfgs[lvl]
        phi = self._sync_pads(state["phi"][lvl], lvl)
        ires = dk.stencil_apply_dense(cfg, phi, state["rhs"][lvl], lam,
                                      state["bc"][lvl], residual=True,
                                      z_gates=self._gates(lvl),
                                      eps=self._eps(state, lvl))
        return self._set(state, "ires", lvl, ires)

    def _apply_op(self, state, lvl, lam):
        cfg = self._kcfgs[lvl]
        phi = self._sync_pads(state["phi"][lvl], lvl)
        return dk.stencil_apply_dense(cfg, phi, state["rhs"][lvl], lam,
                                      state["bc"][lvl], residual=False,
                                      z_gates=self._gates(lvl),
                                      eps=self._eps(state, lvl))

    def _max_residual(self, state, lvl, lam):
        state = self._residual(state, lvl, lam)
        r = jnp.max(jnp.abs(state["ires"][lvl][_ISL]))
        if self._ctx is not None and self.sharded[lvl]:
            r = lax.pmax(r, AXIS)
        return state, r

    def _restrict_into(self, state, lvl, key):
        if self._ctx is None or not self.sharded[lvl]:
            return super()._restrict_into(state, lvl, key)
        if self.sharded[lvl - 1] and self._transfer_ok(lvl):
            coarse = dk.restrict_dense(self._kcfgs[lvl], state[key][lvl])
            return self._set(state, key, lvl - 1, coarse)
        fine = state[key][lvl][_ISL]
        avg = lax.reduce_window(fine, jnp.zeros((), fine.dtype),
                                lax.add, (2, 2, 2), (2, 2, 2),
                                "VALID") / 8.0
        if self.sharded[lvl - 1]:
            coarse = state[key][lvl - 1].at[_ISL].set(avg)
        else:
            # transition: gather all slabs into the replicated level
            # (coarse-level agglomeration-by-replication)
            slabs = lax.all_gather(avg, AXIS)  # [K, Zl/2, Yc, Xc]
            Xc, Yc, Zc = self.dims[lvl - 1]
            full = slabs.reshape(Zc, Yc, Xc)
            coarse = state[key][lvl - 1].at[_ISL].set(full)
        return self._set(state, key, lvl - 1, coarse)

    def _correct_children(self, state, lvl_c, lam):
        if self._ctx is None or (not self.sharded[lvl_c]
                                 and not self.sharded[lvl_c + 1]):
            return super()._correct_children(state, lvl_c, lam)
        if self.sharded[lvl_c]:
            if self._transfer_ok(lvl_c + 1):
                phi_c = self._sync_pads(state["phi"][lvl_c], lvl_c)
                iold_c = self._sync_pads(state["iold"][lvl_c], lvl_c)
                phi = dk.prolong_correct_dense(
                    self._kcfgs[lvl_c], phi_c, iold_c,
                    state["phi"][lvl_c + 1], state["bc"][lvl_c],
                    z_gates=self._gates(lvl_c))
                return self._set(state, "phi", lvl_c + 1, phi)
            corr = self._corr_with_ring_sharded(state, lvl_c)
        else:
            # replicated coarse -> sharded fine: every shard builds the
            # full ring (identical) and prolongs only its z-window
            corr_g = super()._corr_with_ring(state, lvl_c)
            Zlc = self.dims[lvl_c][2] // self.K
            idx = self._ctx["idx"]
            corr = lax.dynamic_slice_in_dim(corr_g, idx * Zlc,
                                            Zlc + 2, axis=0)
        vals = self._prolong_rect(corr)
        lvl = lvl_c + 1
        phi = state["phi"][lvl].at[_ISL].add(vals)
        return self._set(state, "phi", lvl, phi)

    def _corr_with_ring_sharded(self, state, lvl):
        """(phi - iold) with a 1-ghost ring on the local slab; the z
        ring comes from neighbor shards via ppermute (or BC synthesis
        at true domain edges)."""
        X, Y, _ = self.dims[lvl]
        Zl = self._zl(lvl)
        K = self.K
        PZc, PYc = dk.PZ, dk.PY
        phi = state["phi"][lvl]
        iold = state["iold"][lvl]
        corr_full = phi - iold  # exact: pads garbage, interior exact
        corr = jnp.zeros((Zl + 2, Y + 2, X + 2), self.cfg.dtype)
        ci = (slice(1, -1),) * 3
        corr = corr.at[ci].set(corr_full[_ISL])
        bc = self._bc_static(lvl)
        bp = state["bc"][lvl]

        def synth_pair(nbd, x1p, x2p, x1i, x2i, bpl):
            c0, c1, c2 = bc[nbd]
            gp = c0 * bpl + c1 * x1p
            gi = c0 * bpl + c1 * x1i
            if c2 != 0.0:
                gp = gp + c2 * x2p
                gi = gi + c2 * x2i
            return gp - gi

        isl_l = _ISL

        def pick(a, ax, idx):
            sl = list(isl_l)
            pad = (PZc, PYc, 0)[ax]
            sl[ax] = idx + pad
            return a[tuple(sl)]

        # x and y rings (dims d=0,1): same as base, local extents
        for nbd in range(4):
            d = nbd // 2
            lowside = nbd % 2 == 0
            ax = 2 - d
            n_d = (X, Y)[d]
            if self.periodic[d]:
                ring = pick(corr_full, ax, n_d - 1 if lowside else 0)
            else:
                x1p = pick(phi, ax, 0 if lowside else n_d - 1)
                x2p = pick(phi, ax, 1 if lowside else n_d - 2)
                x1i = pick(iold, ax, 0 if lowside else n_d - 1)
                x2i = pick(iold, ax, 1 if lowside else n_d - 2)
                if d == 0:
                    bpl = bp[nbd][dk.PZ:-dk.PZ, dk.PY:-dk.PY]
                else:
                    bpl = bp[nbd][dk.PZ:-dk.PZ, :]
                ring = synth_pair(nbd, x1p, x2p, x1i, x2i, bpl)
            sl: List = [slice(1, -1)] * 3
            sl[ax] = 0 if lowside else -1
            corr = corr.at[tuple(sl)].set(ring)

        # z ring: neighbor shards' boundary corr planes via ppermute;
        # true domain edges synthesize instead
        my_top = corr_full[Zl + PZc - 1, dk.PY:-dk.PY, :]
        my_bot = corr_full[PZc, dk.PY:-dk.PY, :]
        if self.periodic[2]:
            fwd = [(i, (i + 1) % K) for i in range(K)]
            bwd = [(i, (i - 1) % K) for i in range(K)]
        else:
            fwd = [(i, i + 1) for i in range(K - 1)]
            bwd = [(i, i - 1) for i in range(1, K)]
        from_prev = lax.ppermute(my_top, AXIS, fwd)
        from_next = lax.ppermute(my_bot, AXIS, bwd)
        idx = self._ctx["idx"]
        if not self.periodic[2]:
            x1p = pick(phi, 0, 0)
            x2p = pick(phi, 0, 1)
            x1i = pick(iold, 0, 0)
            x2i = pick(iold, 0, 1)
            bpl = bp[4][dk.PY:-dk.PY, :]
            synth_lo = synth_pair(4, x1p, x2p, x1i, x2i, bpl)
            from_prev = jnp.where(idx == 0, synth_lo, from_prev)
            x1p = pick(phi, 0, Zl - 1)
            x2p = pick(phi, 0, Zl - 2)
            x1i = pick(iold, 0, Zl - 1)
            x2i = pick(iold, 0, Zl - 2)
            bpl = bp[5][dk.PY:-dk.PY, :]
            synth_hi = synth_pair(5, x1p, x2p, x1i, x2i, bpl)
            from_next = jnp.where(idx == self.K - 1, synth_hi, from_next)
        corr = corr.at[0, 1:-1, 1:-1].set(from_prev)
        corr = corr.at[-1, 1:-1, 1:-1].set(from_next)
        return corr

    def _subtract_mean(self, state, key):
        if self._ctx is None:
            return super()._subtract_mean(state, key)
        top = self.levels[-1]
        X, Y, Z = self.dims[top]
        s = jnp.sum(state[key][top][_ISL])
        if self.sharded[top]:
            s = lax.psum(s, AXIS)
        mean = s / float(X * Y * Z)
        for lvl in self.levels:
            state = self._set(state, key, lvl, state[key][lvl] - mean)
        return state

    # ------------------------------------------------------------------
    # sharded entry points
    # ------------------------------------------------------------------
    def _state_specs(self):
        specs: Dict = {k: {} for k in self._field_keys}
        specs["bc"] = {}
        for lvl in self.levels:
            sp = P(AXIS) if self.sharded[lvl] else P()
            for k in self._field_keys:
                specs[k][lvl] = sp
            bcs = []
            for i in range(6):
                bcs.append(P(AXIS) if (self.sharded[lvl] and i < 4
                                       and not self.periodic[i // 2])
                           else P())
            specs["bc"][lvl] = bcs
        return specs

    def _to_local(self, state):
        """Squeeze the leading shard axis off sharded-level arrays."""
        out: Dict = {k: {} for k in self._field_keys}
        out["bc"] = {}
        for lvl in self.levels:
            for k in self._field_keys:
                a = state[k][lvl]
                out[k][lvl] = a[0] if self.sharded[lvl] else a
            bcs = []
            for i, p in enumerate(state["bc"][lvl]):
                shd = (self.sharded[lvl] and i < 4
                       and not self.periodic[i // 2])
                bcs.append(p[0] if shd else p)
            out["bc"][lvl] = bcs
        return out

    def _from_local(self, state):
        out: Dict = {k: {} for k in self._field_keys}
        out["bc"] = {}
        for lvl in self.levels:
            for k in self._field_keys:
                a = state[k][lvl]
                out[k][lvl] = a[None] if self.sharded[lvl] else a
            bcs = []
            for i, p in enumerate(state["bc"][lvl]):
                shd = (self.sharded[lvl] and i < 4
                       and not self.periodic[i // 2])
                bcs.append(p[None] if shd else p)
            out["bc"][lvl] = bcs
        return out

    @functools.cached_property
    def _jit_fmg_sharded(self):
        specs = self._state_specs()

        def local_fmg(state, lam, have_guess, need_res):
            self._ctx = {"idx": lax.axis_index(AXIS)}
            try:
                st, res = self._fmg(self._to_local(state), lam,
                                    have_guess, need_res)
                return self._from_local(st), res
            finally:
                self._ctx = None

        def run(state, lam, have_guess, need_res):
            f = jax.shard_map(
                lambda s, l: local_fmg(s, l, have_guess, need_res),
                mesh=self.mesh, in_specs=(specs, P()),
                out_specs=(specs, P()), check_vma=False)
            return f(state, lam)

        return jax.jit(run, static_argnames=("have_guess", "need_res"))

    @functools.cached_property
    def _jit_vcycle_sharded(self):
        specs = self._state_specs()

        def local_vc(state, lam, need_res):
            self._ctx = {"idx": lax.axis_index(AXIS)}
            try:
                st, res = self._vcycle(self._to_local(state), lam,
                                       max_lvl=None, standalone=True,
                                       need_res=need_res)
                return self._from_local(st), res
            finally:
                self._ctx = None

        def run(state, lam, need_res):
            f = jax.shard_map(
                lambda s, l: local_vc(s, l, need_res),
                mesh=self.mesh, in_specs=(specs, P()),
                out_specs=(specs, P()), check_vma=False)
            return f(state, lam)

        return jax.jit(run, static_argnames=("need_res",))

    def fas_fmg(self, state, lam=0.0, have_guess=False, need_res=True):
        self._ensure_direct(state)
        with self.timers.section("total FMG cycle"):
            return self._jit_fmg_sharded(state, self._lam(lam),
                                         have_guess=have_guess,
                                         need_res=need_res)

    def fas_vcycle(self, state, lam=0.0, max_lvl=None, need_res=True):
        assert max_lvl is None, "sharded path: full cycles only"
        self._ensure_direct(state)
        with self.timers.section("total V-cycle"):
            return self._jit_vcycle_sharded(state, self._lam(lam),
                                            need_res=need_res)
