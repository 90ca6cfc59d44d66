"""Dense-level FAS multigrid solver for uniform 2D trees.

2D counterpart of :class:`DenseMGSolver` (solve/dense.py): each level
is one dense ``[Y, X]`` array, the GSRB pair / operator / residual run
as whole-array masked XLA expressions with inline BC-ghost synthesis
(ops/dense2d.py), and the cycle drivers — FAS V-cycle / FMG, FAS tau
correction, coarse solve (m_multigrid.f90:84-243) — are inherited
unchanged from the 3D dense solver.  Covers the 2D cylindrical (r,z)
laplacian (m_laplacian.f90:197-271) via per-column radial face weights.

Bit-identical per phase to the boxed ``MGSolver`` (same arithmetic per
cell in the same order) — asserted in tests/test_dense2d.py.

Gating: 2D laplacian/helmholtz/vlaplacian/vhelmholtz/ahelmholtz with
GSRB on uniform trees, cartesian or cylindrical (laplacian-only, like
the boxed dispatch); anything else falls back to the boxed solver.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..core.tree import Tree
from ..ops import dense2d as d2
from .dense import DenseMGSolver, _OP_N_EPS
from .multigrid import MGConfig


def dense2d_supported(tree: Tree, cfg: MGConfig) -> bool:
    """Whether the dense 2D fast path covers this configuration."""
    geom_ok = (cfg.geometry == "cartesian"
               or (cfg.geometry == "cylindrical"
                   and cfg.operator == "laplacian"))
    return (tree.ndim == 2
            and tree.highest_lvl == 1          # uniform, no AMR
            and cfg.operator in _OP_N_EPS
            and geom_ok
            and cfg.smoother in ("gsrb", "gs"))


class Dense2DMGSolver(DenseMGSolver):
    """FAS multigrid on dense uniform 2D levels.

    State pytree:
        {"phi": {lvl: [Y, X]}, "rhs": {...}, "iold": {...}, "ires":
         {...}, eps0.., "bc": {lvl: [4 boundary-value vectors]}}
    """

    _supported = staticmethod(dense2d_supported)

    def __init__(self, tree: Tree, config: Optional[MGConfig] = None):
        super().__init__(tree, config)
        # no pad geometry in 2D: the arrays ARE the interiors
        self._isl = (slice(None), slice(None))

    # ------------------------------------------------------------------
    # geometry-specific pieces (3D overrides)
    # ------------------------------------------------------------------
    def _pshape(self, dims):
        return (int(dims[1]), int(dims[0]))

    def _kcfg(self, lvl: int) -> d2.Dense2DConfig:
        t = self.tree
        idr2 = tuple(float(x) for x in 1.0 / t.dr[lvl] ** 2)
        bc = self._bc_static(lvl)
        bc_full = [c if c is not None else (0.0, 0.0, 0.0) for c in bc]
        b_const = []
        for nbd in range(4):
            spec = self.bc_spec[nbd]
            b_const.append(float(spec["value"]) if spec["fn"] is None
                           else None)
        cyl_w = None
        if self.cfg.geometry == "cylindrical":
            cyl_w = self._cyl_weights(lvl)
        return d2.Dense2DConfig(
            dims=self.dims[lvl], idr2=idr2, bc=bc_full,
            periodic=self.periodic, dtype=self.cfg.dtype,
            b_const=b_const, n_eps=self.n_eps, cyl_w=cyl_w)

    def _cyl_weights(self, lvl: int):
        """Radial face weights w_lo = r_face(i)/r_center(i), w_hi =
        r_face(i+1)/r_center(i) as [1, X] rows (box_clpl,
        m_laplacian.f90:209-212; same arithmetic as the boxed
        MGSolver._cyl_weights on the dense x axis)."""
        t = self.tree
        X = self.dims[lvl][0]
        dr0 = float(t.dr[lvl][0])
        rmin = float(t.r_min[0])
        i = np.arange(1, X + 1)
        r_face = rmin + dr0 * (i - 1)
        r_face_hi = rmin + dr0 * i
        r_inv = 1.0 / (rmin + dr0 * (i - 0.5))
        # keep as numpy: the configs are cached across jit traces, and a
        # jnp constant materialized inside one trace would leak into the
        # next (UnexpectedTracerError); numpy re-enters each trace fresh
        dt = np.dtype(self.cfg.dtype)
        return ((r_face * r_inv)[None, :].astype(dt),
                (r_face_hi * r_inv)[None, :].astype(dt))

    def _eval_bc_planes(self, lvl: int) -> List[jnp.ndarray]:
        """Boundary-value vectors b per direction: x faces vary along y
        ([Y]), y faces along x ([X]) (mg_phi_bc_store analogue)."""
        t = self.tree
        X, Y = self.dims[lvl]
        dr = t.dr[lvl]
        r0 = t.r_min
        dt = self.cfg.dtype
        cx = r0[0] + (np.arange(X) + 0.5) * dr[0]
        cy = r0[1] + (np.arange(Y) + 0.5) * dr[1]
        hi = [r0[d] + self.dims[lvl][d] * dr[d] for d in range(2)]
        out = []
        for nbd in range(4):
            d = nbd // 2
            if self.periodic[d]:
                out.append(jnp.zeros((1,), dt))
                continue
            spec = self.bc_spec[nbd]
            if d == 0:
                coords = np.zeros((Y, 2))
                coords[:, 0] = r0[0] if nbd % 2 == 0 else hi[0]
                coords[:, 1] = cy
            else:
                coords = np.zeros((X, 2))
                coords[:, 1] = r0[1] if nbd % 2 == 0 else hi[1]
                coords[:, 0] = cx
            if spec["fn"] is not None:
                vals = np.asarray(spec["fn"](coords))
            else:
                vals = np.full(coords.shape[0], spec["value"])
            out.append(jnp.asarray(vals, dt))
        return out

    def cell_centers(self, lvl: int) -> np.ndarray:
        """Interior cell-center coordinates [Y, X, 2] (host-side)."""
        t = self.tree
        X, Y = self.dims[lvl]
        dr = t.dr[lvl]
        out = np.zeros((Y, X, 2))
        out[..., 0] = (t.r_min[0] + (np.arange(X) + 0.5) * dr[0])[None, :]
        out[..., 1] = (t.r_min[1] + (np.arange(Y) + 0.5) * dr[1])[:, None]
        return out

    # ------------------------------------------------------------------
    # compute building blocks (no pads, rolls wrap exactly)
    # ------------------------------------------------------------------
    def _pin_repl(self, x):
        """Pin a small traced intermediate to replicated under GSPMD.

        The SPMD partitioner back-propagates a consumer's y-sharding
        into the refinement-boundary strip chain (stack+reshape
        interleaves over strip lengths not divisible by the mesh) and
        miscompiles it (measured: wrong plane values whenever the plane
        computation fuses into a y-sharded sweep, jax 0.9.0 CPU).  The
        strips are O(N) vectors built from replicated coarse levels —
        forcing them replicated costs nothing and keeps the whole chain
        on the known-correct replicated partitioning."""
        mesh = getattr(self, "_gspmd_mesh", None)
        if mesh is None:
            return x
        import jax
        from jax.sharding import NamedSharding, PartitionSpec
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, PartitionSpec()))

    def _sync_pads(self, arr, lvl):
        return arr

    def _smooth(self, state, lvl, n_cycle, lam):
        cfg = self._kcfgs[lvl]
        phi = state["phi"][lvl]
        rhs = state["rhs"][lvl]
        bp = self._planes(state, lvl)
        eps = self._eps(state, lvl)
        epl = self._eps_planes(state, lvl)
        for _ in range(n_cycle):
            # boxed substep n updates 1-based parity n%2, i.e. 0-based
            # (n%2 + ndim) % 2; substeps n=1,2 with ndim=2 -> red
            # parity 1 (the opposite color of the 3D dense path)
            phi = d2.pair_sweep_2d(cfg, phi, rhs, lam, bp,
                                   red_parity=1, eps=eps,
                                   eps_planes=epl)
        return self._set(state, "phi", lvl, phi)

    def _residual(self, state, lvl, lam):
        cfg = self._kcfgs[lvl]
        ires = d2.stencil_apply_2d(cfg, state["phi"][lvl],
                                   state["rhs"][lvl], lam,
                                   self._planes(state, lvl),
                                   residual=True,
                                   eps=self._eps(state, lvl),
                                   eps_planes=self._eps_planes(state, lvl))
        return self._set(state, "ires", lvl, ires)

    def _apply_op(self, state, lvl, lam):
        cfg = self._kcfgs[lvl]
        return d2.stencil_apply_2d(cfg, state["phi"][lvl],
                                   state["rhs"][lvl], lam,
                                   self._planes(state, lvl),
                                   residual=False,
                                   eps=self._eps(state, lvl),
                                   eps_planes=self._eps_planes(state, lvl))

    def _kernel_apply(self, cfg, phi, rhs, lam, bplanes, eps):
        return d2.stencil_apply_2d(cfg, phi, rhs, lam, bplanes,
                                   residual=False, eps=eps)

    # ------------------------------------------------------------------
    # prolongation (2D weights 1/2, 1/4, 1/4 — m_prolong.f90:159-240)
    # ------------------------------------------------------------------
    def _corr_with_ring(self, state, lvl):
        """(phi - iold) with a 1-ghost ring [Y+2, X+2]; ring values
        reproduce the boxed path bitwise (see the 3D docstring)."""
        X, Y = self.dims[lvl]
        phi = state["phi"][lvl]
        iold = state["iold"][lvl]
        bp = state["bc"][lvl]
        corr = jnp.zeros((Y + 2, X + 2), self.cfg.dtype)
        ci = (slice(1, -1),) * 2
        corr = corr.at[ci].set(phi - iold)
        bc = self._bc_static(lvl)

        def synth(nbd, x1, x2, bvec):
            c0, c1, c2 = bc[nbd]
            g = c0 * bvec + c1 * x1
            if c2 != 0.0:
                g = g + c2 * x2
            return g

        for nbd in range(4):
            d = nbd // 2
            lowside = nbd % 2 == 0
            ax = 1 - d
            n_d = (X, Y)[d]

            def pick(a, idx):
                sl = [slice(None)] * 2
                sl[ax] = idx
                return a[tuple(sl)]

            if self.periodic[d]:
                ring = pick(phi - iold, n_d - 1 if lowside else 0)
            else:
                x1p = pick(phi, 0 if lowside else n_d - 1)
                x2p = pick(phi, 1 if lowside else n_d - 2)
                x1i = pick(iold, 0 if lowside else n_d - 1)
                x2i = pick(iold, 1 if lowside else n_d - 2)
                ring = (synth(nbd, x1p, x2p, bp[nbd])
                        - synth(nbd, x1i, x2i, bp[nbd]))
            sl: List = [slice(1, -1)] * 2
            sl[ax] = 0 if lowside else -1
            corr = corr.at[tuple(sl)].set(ring)
        return corr

    def _var_with_ring(self, state, lvl, key):
        """One variable with a 1-ghost ring [Y+2, X+2] (2D bc_to_gc
        synthesis / periodic wrap; used by the coupling layer's
        ghost-inclusive leaf export)."""
        X, Y = self.dims[lvl]
        arr = state[key][lvl]
        bp = self._planes(state, lvl, key)
        bc = self._ring_bc(lvl, key)
        out = jnp.zeros((Y + 2, X + 2), self.cfg.dtype)
        out = out.at[1:-1, 1:-1].set(arr)
        for nbd in range(4):
            d = nbd // 2
            lowside = nbd % 2 == 0
            ax = 1 - d
            n_d = (X, Y)[d]

            def pick(idx):
                sl = [slice(None)] * 2
                sl[ax] = idx
                return arr[tuple(sl)]

            if self.periodic[d]:
                ring = pick(n_d - 1 if lowside else 0)
            else:
                c0, c1, c2 = bc[nbd]
                ring = c0 * bp[nbd] + c1 * pick(0 if lowside else n_d - 1)
                if c2 != 0.0:
                    ring = ring + c2 * pick(1 if lowside else n_d - 2)
            sl: List = [slice(1, -1)] * 2
            sl[ax] = 0 if lowside else -1
            out = out.at[tuple(sl)].set(ring)
        return out

    def _prolong_rect(self, sub):
        """Bilinear prolongation [Yc+2, Xc+2] -> [2Yc, 2Xc]
        (mg_prolong_sparse 2D weights 1/2, 1/4, 1/4; same arithmetic
        order as transfer._prolong_block)."""
        w0 = 0.5
        ctr = sub[1:-1, 1:-1]

        def shifted(d, s):
            sl = [slice(1, -1)] * 2
            ax = 1 - d
            sl[ax] = slice(1 + s, sub.shape[ax] - 1 + s)
            return sub[tuple(sl)]

        f0 = w0 * ctr
        lo = [0.25 * shifted(d, -1) for d in range(2)]
        hi = [0.25 * shifted(d, +1) for d in range(2)]
        vals = {0: f0}
        for d in range(2):
            new = {}
            for key, a in vals.items():
                new[key] = a + lo[d]
                new[key | (1 << d)] = a + hi[d]
            vals = new

        def interleave(a, b, d):
            # lane/sublane axes: strided scatters keep clean layouts
            # (a stack+reshape would tile-pad the size-2 dim)
            ax = 1 - d
            shape = list(a.shape)
            shape[ax] *= 2
            out = jnp.zeros(shape, a.dtype)
            losl = [slice(None)] * 2
            hisl = [slice(None)] * 2
            losl[ax] = slice(0, None, 2)
            hisl[ax] = slice(1, None, 2)
            return out.at[tuple(losl)].set(a).at[tuple(hisl)].set(b)

        def build(d_hi, bits):
            if d_hi < 0:
                return vals[bits]
            return interleave(build(d_hi - 1, bits),
                              build(d_hi - 1, bits | (1 << d_hi)), d_hi)

        return build(1, 0)

    # ------------------------------------------------------------------
    # restriction: separable 0/1 matmuls on the MXU.  Measured on TPU:
    # reduce_window (2,2) stride 2 runs at ~0.2 GB/s at 2048^2 (the
    # lane-dim stride-2 pathology), the R_y @ fine @ R_x^T form at
    # ~3 ms — 30x faster (experiments/probe_dense2d_perf.py).
    # ------------------------------------------------------------------
    def _restrict_mats(self, lvl):
        """(R_y, R_x) pair-sum 0/1 matrices [n/2, n] for lvl's dims
        (numpy: cached across jit traces without leaking tracers)."""
        if not hasattr(self, "_rmat_cache"):
            self._rmat_cache = {}
        if lvl not in self._rmat_cache:
            dt = np.dtype(self.cfg.dtype)
            mats = []
            for n in (self.dims[lvl][1], self.dims[lvl][0]):  # (Y, X)
                R = np.zeros((n // 2, n), dt)
                R[np.arange(n // 2), 2 * np.arange(n // 2)] = 1.0
                R[np.arange(n // 2), 2 * np.arange(n // 2) + 1] = 1.0
                mats.append(R)
            self._rmat_cache[lvl] = tuple(mats)
        return self._rmat_cache[lvl]

    def _restrict_into(self, state, lvl, key):
        """Full-weighting restriction lvl -> lvl-1 (m_restrict.f90:
        183-194) as two pair-sum matmuls + *0.25."""
        Ry, Rx = self._restrict_mats(lvl)
        fine = state[key][lvl]
        avg = jnp.dot(jnp.dot(Ry, fine, precision="highest"), Rx.T,
                      precision="highest") * 0.25
        return self._set(state, key, lvl - 1, avg)

    # ------------------------------------------------------------------
    # multi-chip: GSPMD y-slab sharding
    # ------------------------------------------------------------------
    def shard_state(self, state, mesh, min_local: int = 16):
        """Place the state on a 1D device mesh as y-slabs (GSPMD).

        The 2D fast path is a pure-XLA whole-array program (no Mosaic
        kernels), so multi-chip execution needs no shard_map: sharding
        the ``[Y, X]`` level arrays along Y and jitting the unchanged
        cycle lets XLA's SPMD partitioner insert the neighbor
        collective-permutes for the shifted stencil reads and the
        psum/pmax reductions — the GSPMD rendering of the reference's
        slab MPI decomposition (m_load_balance.f90; the 3D dense path
        implements the same decomposition explicitly with lax.ppermute
        in solve/dense_shard.py, which Mosaic kernels require).  Levels
        whose local slab would fall under ``min_local`` rows are
        replicated — coarse-level agglomeration, the TPU analogue of
        the reference's single-rank coarse levels
        (m_load_balance.f90:27-29).

        Returns the re-placed state; the existing jitted cycle drivers
        recompile once for the sharded layout and run distributed
        (asserted sharded == single-device in tests/test_dense2d_shard
        and __graft_entry__.dryrun_multichip).
        """
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        ax = mesh.axis_names[0]
        K = int(np.prod(mesh.devices.shape))
        repl = NamedSharding(mesh, PartitionSpec())
        ysh = NamedSharding(mesh, PartitionSpec(ax, None))
        #: remembered so traced programs can pin small cross-level
        #: intermediates (rb strips) to replicated — see _pin_repl
        self._gspmd_mesh = mesh
        # the constraint ops must be IN the trace: drop cached traces
        # built before the mesh was known (same avals would reuse them)
        for cached in ("_jit_vcycle", "_jit_fmg"):
            self.__dict__.pop(cached, None)
        #: per-level decision, inspectable (mirrors dense_shard.sharded)
        self.y_sharded = {}
        for lvl in self.levels:
            Y = self.dims[lvl][1]
            # even local slabs keep the restriction pair-sums and the
            # checkerboard shard-local (correct either way under GSPMD,
            # but this avoids gratuitous boundary collectives)
            self.y_sharded[lvl] = (lvl != self.levels[0] and K > 1
                                   and Y % K == 0
                                   and (Y // K) % 2 == 0
                                   and Y // K >= min_local)
        out = {}
        for key, per_lvl in state.items():
            if key == "bc":
                out[key] = {lvl: [jax.device_put(v, repl) for v in vecs]
                            for lvl, vecs in per_lvl.items()}
            else:
                out[key] = {lvl: jax.device_put(
                    arr, ysh if self.y_sharded[lvl] else repl)
                    for lvl, arr in per_lvl.items()}
        return out

    # ------------------------------------------------------------------
    # coarse solve: always probe through the runtime operator (covers
    # constant-coefficient, eps and cylindrical uniformly)
    # ------------------------------------------------------------------
    def _ensure_direct(self, state=None):
        if self.coarse_solver != "direct" or self._direct is not None:
            return
        if state is None:
            return  # public entries pass state
        self._direct = self._build_direct_probe(state) or "unavailable"
