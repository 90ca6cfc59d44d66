"""FAS multigrid cycling on SoA level arrays.

TPU-native re-design of ``/root/reference/src/m_multigrid.f90``:

* ``fas_vcycle`` / ``fas_fmg`` reproduce the reference cycle structure
  (:150-243 / :84-147) including the FAS tau correction in
  ``update_coarse`` (:347-384), ``correct_children`` (:387-402), the
  coarse-grid smoothing loop with the rel/abs 1e-8, <=1000 iteration
  stopping rule (:196-209, defaults m_data_structures.f90:318-327) and
  ``subtract_mean`` for fully periodic problems (:245-294).
* The per-box hot loops become whole-level batched kernels; the coarse
  solve is a ``lax.while_loop``; every driver is one jitted computation
  with the level loop unrolled (level shapes are static).
* The reference's procedure-pointer dispatch (``mg%box_op`` etc.,
  m_data_structures.f90:329-336) becomes static operator selection before
  tracing.
"""
from __future__ import annotations

import dataclasses
import functools
import warnings
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import indexmaps, topology as topo
from ..core.constants import (IPHI, IRES, IRHS, IOLD, IVEPS, NUM_VARS, BCType)
from ..core.tree import Tree, box_r_min
from ..ops import ghost as ghost_ops
from ..ops import kernels
from ..ops import transfer


_cache_enabled = False


def _enable_compilation_cache():
    """Persistent XLA compilation cache (~/.cache/octree_mg_tpu_xla or
    $JAX_COMPILATION_CACHE_DIR).  Cycle-driver programs are large and TPU
    compile times run into minutes; caching makes them one-time."""
    global _cache_enabled
    if _cache_enabled:
        return
    _cache_enabled = True
    import os
    try:
        if jax.default_backend() == "cpu":
            # CPU compiles are fast and AOT cache entries are machine-
            # feature sensitive (SIGILL risk across heterogeneous hosts)
            return
        path = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "octree_mg_tpu_xla"))
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


@dataclasses.dataclass
class MGExperimental:
    """Measured-negative / research options, kept runnable for their
    tests but not part of the shipped configuration surface (every
    shipped path is covered by bench.py / docs/PERF.md)."""

    #: read neighbor faces directly inside smoother half-sweeps instead
    #: of materializing ghost cells between sweeps.  Bitwise-identical
    #: but ~15% slower on TPU than the materialized path, superseded by
    #: the dense-path fused pair kernel.
    gathered_smoother: bool = False
    #: Pallas lane-roll half-sweep kernel for the boxed
    #: constant-coefficient cartesian smoother (the dense path's pair
    #: kernels are the production Mosaic smoothers).
    pallas_smoother: bool = False


@dataclasses.dataclass
class MGConfig:
    """Runtime configuration (the reference's mg_t public fields,
    m_data_structures.f90:250-342)."""

    operator: str = "laplacian"          # laplacian|helmholtz|vlaplacian|vhelmholtz|ahelmholtz
    geometry: str = "cartesian"          # cartesian|cylindrical (2D)
    smoother: str = "gsrb"               # gsrb|gs (aliased)|jacobi
    n_cycle_down: int = 2
    n_cycle_up: int = 2
    max_coarse_cycles: int = 1000
    residual_coarse_abs: float = 1e-8
    residual_coarse_rel: float = 1e-8
    n_extra_vars: int = 0
    dtype: object = jnp.float64
    #: donate the state buffers to the jitted cycle drivers (halves HBM
    #: footprint; the caller must rebind ``state = f(state)`` and never
    #: reuse the donated pytree)
    donate: bool = False
    #: "split" compiles FMG as per-level programs (fast compile, one
    #: dispatch per level — right when dispatch is cheap or the tree is
    #: deep); "fused" compiles the whole FMG into one program (minimal
    #: dispatch overhead, heavy one-time compile — right for production
    #: serving of one configuration)
    fmg_mode: str = "split"
    #: pad every level's box count to a multiple of this (0/1 = off):
    #: required for even box-axis sharding of AMR levels across a device
    #: mesh (pad boxes are inert and stay zero); set to the mesh size
    #: (see parallel/sharding.py)
    pad_boxes_multiple: int = 0
    #: coarse-grid solve strategy on the dense path: "direct" solves
    #: the coarsest cycled level exactly via a precomputed eigenbasis
    #: (two small matmuls); "smooth" is the reference's iterate-to-
    #: tolerance loop (m_multigrid.f90:196-209).  The boxed path always
    #: smooths.
    coarse_solver: str = "direct"
    #: cross-shard halo movement: "gspmd" lets XLA partition the global
    #: ghost gathers; "ppermute" ships neighbor faces explicitly as
    #: per-shard-offset lax.ppermute exchanges inside shard_map (the
    #: TPU-native rendering of the reference's per-rank-pair buffers,
    #: m_communication.f90:37-66) — requires MGSolver.attach_mesh and
    #: applies to levels that shard evenly; results are bitwise equal
    #: either way (tests/test_explicit_halo.py)
    halo: str = "gspmd"
    #: overlap the z-slab halo exchange with interior compute in the
    #: sharded dense smoother (solve/dense_shard.py): the full-slab
    #: sweep consumes only pre-exchange data while the ppermutes fly,
    #: then the edge strips (the halo's dependency cone) are recomputed
    #: with the fresh halos and patched in — bitwise identical to the
    #: exchange-then-sweep order (the reference never overlaps,
    #: SURVEY §2.4.3)
    overlap_halo: bool = True
    #: research/negative-result options (see MGExperimental)
    experimental: MGExperimental = dataclasses.field(
        default_factory=MGExperimental)


class MGSolver:
    """Multigrid solver bound to one tree.

    Precomputes all gather/scatter maps host-side (replacing the
    reference's buffer sizing dry-runs, m_allocate_storage.f90:80-96) and
    exposes jitted cycle drivers operating on a functional state pytree:

        state = {"cc": {lvl: [n_vars, n_boxes, (nc+2)^D]},
                 "bc": {lvl: [per-direction boundary-value arrays]}}
    """

    def __init__(self, tree: Tree, config: Optional[MGConfig] = None):
        _enable_compilation_cache()
        self.tree = tree
        self.cfg = config or MGConfig()
        cfg = self.cfg
        self.ndim = tree.ndim
        if cfg.smoother == "gs":
            warnings.warn("lexicographic GS does not vectorize on TPU; "
                          "using red-black GS (the reference's gsrb mode)")
            cfg.smoother = "gsrb"
        self.substeps = 2 if cfg.smoother == "gsrb" else 1
        # operator-required extra variables (m_vlaplacian.f90:17-21,
        # m_ahelmholtz.f90:22-26)
        if cfg.operator in ("vlaplacian", "vhelmholtz"):
            cfg.n_extra_vars = max(1, cfg.n_extra_vars)
        if cfg.operator == "ahelmholtz":
            cfg.n_extra_vars = max(self.ndim, cfg.n_extra_vars)
        self.n_vars = NUM_VARS + cfg.n_extra_vars
        self.subtract_mean = tree.subtract_mean and cfg.operator == "laplacian"

        from ..utils.timers import Timers
        #: named phase timers (mg_add_timers, m_multigrid.f90:72-81);
        #: whole-cycle granularity — XLA fuses the phases inside one
        #: program, so per-phase splits come from utils.timers.trace
        self.timers = Timers()
        self.maps = indexmaps.build_all_maps(
            tree, pad_to=max(1, cfg.pad_boxes_multiple))
        self._build_static()
        self._build_bc_defaults()
        self._dmaps = None  # built lazily (after BCs are final)
        #: pluggable prolongation (the reference's mg%box_prolong pointer,
        #: m_data_structures.f90:335-336): signature
        #: (coarse_plane, dmaps_f, static_f) -> fine interior values
        self.box_prolong = transfer.prolong_from_coarse
        #: device mesh + per-level exchange plans for the explicit
        #: ppermute halo (MGConfig.halo == "ppermute")
        self.mesh = None
        self._halo_plans = None

    def attach_mesh(self, mesh):
        """Bind a device mesh for the explicit ppermute halo exchange
        (MGConfig.halo == "ppermute").  Builds per-level exchange plans
        host-side (the analogue of the reference's buffer-size dry runs,
        m_allocate_storage.f90:82-96 — here they become static index
        maps).  Levels that cannot shard evenly get no plan and keep the
        gather path (they are replicated anyway)."""
        from ..parallel import halo as halo_mod
        self.mesh = mesh
        k = mesh.devices.size
        self._halo_plans = {lvl: halo_mod.build_exchange_plan(
            self.maps[lvl], k) for lvl in self.levels}
        self._dmaps = None  # halo plan arrays ride in dmaps

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------
    def _build_static(self):
        t = self.tree
        self.levels = list(range(t.lowest_lvl, t.highest_lvl + 1))
        self.static: Dict[int, Dict] = {}
        for lvl in self.levels:
            m = self.maps[lvl]
            # uniform levels: every coarse box is a parent in id order, so
            # parent indexing degenerates to the identity and restriction/
            # prolongation need no gather/scatter (disabled when the box
            # axis is padded — pad rows sit between levels' counts)
            coarse_padded = (lvl - 1 >= t.lowest_lvl and
                             self.maps[lvl - 1].n_boxes
                             != self.maps[lvl - 1].n_real)
            parents_identity = (
                m.parent_locs is not None
                and lvl - 1 >= t.lowest_lvl
                and not coarse_padded
                and m.n_boxes == m.n_real
                and len(m.parent_locs) == len(t.lvls[lvl - 1].ids)
                and bool(np.array_equal(m.parent_locs,
                                        np.arange(len(m.parent_locs)))))
            self.static[lvl] = {
                "ndim": self.ndim,
                "nc": m.nc,
                "n_boxes": m.n_boxes,
                "n_real": m.n_real,
                "mp": [len(d.phys_loc) for d in m.dirs],
                "mr": [len(d.rb_loc) for d in m.dirs],
                "multi_child": m.multi_child,
                "idr2": tuple(float(x) for x in 1.0 / t.dr[lvl] ** 2),
                "dr": tuple(float(x) for x in t.dr[lvl]),
                "parents_identity": parents_identity,
                "leaves_all": (len(t.lvls[lvl].leaves)
                               == len(t.lvls[lvl].ids)
                               and m.n_boxes == m.n_real),
            }

    def _build_bc_defaults(self):
        nnb = topo.num_neighbors(self.ndim)
        # per-variable BC spec: list per direction of
        # {"type": BCType, "value": float, "fn": callable|None}
        self.bc_spec: Dict[int, List[Dict]] = {}
        for iv in range(self.n_vars):
            self.bc_spec[iv] = [
                {"type": BCType.DIRICHLET, "value": 0.0, "fn": None}
                for _ in range(nnb)]
        # coefficient variables get Neumann-zero ghosts
        # (m_vlaplacian.f90:25-28, m_ahelmholtz.f90:28-41)
        if self.cfg.operator in ("vlaplacian", "vhelmholtz"):
            for nb in range(nnb):
                self.bc_spec[IVEPS][nb] = {"type": BCType.NEUMANN,
                                           "value": 0.0, "fn": None}
        if self.cfg.operator == "ahelmholtz":
            for d in range(self.ndim):
                for nb in range(nnb):
                    self.bc_spec[IVEPS + d][nb] = {"type": BCType.NEUMANN,
                                                   "value": 0.0, "fn": None}

    def set_bc(self, iv: int, bc_type: BCType, value: float = 0.0,
               nb: Optional[int] = None, fn: Optional[Callable] = None):
        """Set physical boundary conditions for a variable.

        ``fn(x)`` receives face cell-center coordinates [..., ndim] and
        returns boundary values (the reference's mg_subr_bc callback,
        m_data_structures.f90:346-361, evaluated at setup like
        mg_phi_bc_store, m_ghost_cells.f90:66-117).
        """
        nbs = range(topo.num_neighbors(self.ndim)) if nb is None else [nb]
        for b in nbs:
            self.bc_spec[iv][b] = {"type": bc_type, "value": value, "fn": fn}
        self._dmaps = None  # bc consts change

    # -- device maps ----------------------------------------------------
    def _to_device(self):
        if self._dmaps is not None:
            return self._dmaps
        dm: Dict[int, Dict] = {}
        for lvl in self.levels:
            m = self.maps[lvl]
            dirs = []
            for d in m.dirs:
                is_phys = np.zeros(m.n_boxes, dtype=bool)
                is_phys[d.phys_loc] = True
                dirs.append({
                    "nb_loc": jnp.asarray(d.nb_loc),
                    "has_nb": jnp.asarray(d.has_nb),
                    "is_phys": jnp.asarray(is_phys),
                    "phys_loc": jnp.asarray(d.phys_loc),
                    "rb_loc": jnp.asarray(d.rb_loc),
                    "rb_cidx": (jnp.asarray(d.rb_cidx)
                                if d.rb_cidx is not None else jnp.zeros((0,), jnp.int32)),
                })
            entry = {
                "dirs": dirs,
                "parent_locs": (jnp.asarray(m.parent_locs)
                                if m.parent_locs is not None else jnp.zeros((0,), jnp.int32)),
                "leaf_locs": jnp.asarray(m.leaf_locs),
                "parity": jnp.asarray(
                    indexmaps.checkerboard_parity(self.ndim, m.nc)),
            }
            if self.cfg.geometry == "cylindrical":
                entry.update(self._cyl_weights(lvl))
            if (self.cfg.halo == "ppermute"
                    and self._halo_plans is not None
                    and self._halo_plans.get(lvl) is not None):
                from ..parallel import halo as halo_mod
                entry["halo"] = halo_mod.plan_arrays(self._halo_plans[lvl])
            dm[lvl] = entry
        self._dmaps = dm
        return dm

    def _cyl_weights(self, lvl: int):
        """Per-box radial face weights (box_clpl, m_laplacian.f90:209-212)."""
        t = self.tree
        nc = t.box_size_lvl[lvl]
        dr0 = t.dr[lvl][0]
        ids = t.lvls[lvl].ids
        rmin = np.stack([box_r_min(t, int(b)) for b in ids])[:, 0]  # [n]
        n_pad = self.static[lvl]["n_boxes"]
        if n_pad > len(ids):  # inert pad boxes: any nonzero radius works
            rmin = np.concatenate([rmin, np.ones(n_pad - len(ids))])
        i = np.arange(1, nc + 1)
        r_face = rmin[:, None] + dr0 * (i - 1)[None, :]       # face left of cell i
        r_face_hi = rmin[:, None] + dr0 * i[None, :]
        r_inv = 1.0 / (rmin[:, None] + dr0 * (i - 0.5)[None, :])
        w_lo = (r_face * r_inv)[:, None, :]    # [n, 1(y), nc(x)]
        w_hi = (r_face_hi * r_inv)[:, None, :]
        return {"cyl_w_lo": jnp.asarray(w_lo, self.cfg.dtype),
                "cyl_w_hi": jnp.asarray(w_hi, self.cfg.dtype)}

    def _op_ctx(self, lvl: int, dmaps) -> kernels.OpContext:
        st = self.static[lvl]
        return kernels.OpContext(
            ndim=self.ndim, nc=st["nc"], idr2=st["idr2"],
            geometry=self.cfg.geometry,
            cyl_w_lo=dmaps[lvl].get("cyl_w_lo"),
            cyl_w_hi=dmaps[lvl].get("cyl_w_hi"))

    def _bc_static(self, iv: int, lvl: int) -> List[Dict]:
        """Per-direction static BC coefficients at a level."""
        out = []
        st = self.static[lvl]
        for nb in range(topo.num_neighbors(self.ndim)):
            spec = self.bc_spec[iv][nb]
            d = topo.neighb_dim(nb)
            c0, c1, c2 = ghost_ops.bc_coeffs(spec["type"], st["dr"][d], nb)
            out.append({"c0": c0, "c1": c1, "c2": c2,
                        "value": spec["value"]})
        return out

    # ------------------------------------------------------------------
    # state allocation / access
    # ------------------------------------------------------------------
    def allocate(self) -> Dict:
        """Allocate the state pytree (mg_allocate_storage,
        m_allocate_storage.f90:51-99; buffers are replaced by index maps)."""
        cc = {}
        bc = {}
        dt = self.cfg.dtype
        for lvl in self.levels:
            st = self.static[lvl]
            shape = (self.n_vars, st["n_boxes"]) + (st["nc"] + 2,) * self.ndim
            cc[lvl] = jnp.zeros(shape, dt)
            bc[lvl] = self._eval_bc_values(lvl)
        return {"cc": cc, "bc": bc}

    def _eval_bc_values(self, lvl: int) -> List[jnp.ndarray]:
        """Evaluate IPHI boundary values on physical faces (cf.
        mg_phi_bc_store, m_ghost_cells.f90:66-117).  Stored as full-face
        [n_boxes, nc^(D-1)] arrays (zeros away from physical faces) so
        the hot ghost fill needs no scatter."""
        out = []
        m = self.maps[lvl]
        st = self.static[lvl]
        dt = self.cfg.dtype
        fshape = (st["nc"],) * (self.ndim - 1) if self.ndim > 1 else ()
        for nb in range(topo.num_neighbors(self.ndim)):
            spec = self.bc_spec[IPHI][nb]
            full = np.zeros((st["n_boxes"],) + fshape)
            coords = m.phys_face_coords[nb]  # [mp, (nc,)*(D-1), D]
            if coords.shape[0] > 0:
                if spec["fn"] is not None:
                    vals = np.asarray(spec["fn"](coords))
                else:
                    vals = np.full(coords.shape[:-1], spec["value"])
                full[m.dirs[nb].phys_loc] = vals.reshape(
                    (len(m.dirs[nb].phys_loc),) + fshape)
            out.append(jnp.asarray(full, dt))
        return out

    def cell_centers(self, lvl: int) -> np.ndarray:
        """Cell-center coordinates incl. ghost layer:
        [n_boxes, (nc+2)^D, ndim] (host-side; for problem setup)."""
        t = self.tree
        nc = t.box_size_lvl[lvl]
        dr = t.dr[lvl]
        ids = t.lvls[lvl].ids
        rmin = np.stack([box_r_min(t, int(b)) for b in ids])  # [n, D]
        shape = (nc + 2,) * self.ndim
        out = np.empty((len(ids),) + shape + (self.ndim,))
        for d in range(self.ndim):
            ax = self.ndim - 1 - d  # spatial axis among the shape dims
            idx = (np.arange(0, nc + 2) - 0.5) * dr[d]
            bshape = [1] * self.ndim
            bshape[ax] = nc + 2
            out[..., d] = rmin[:, d].reshape(-1, *[1] * self.ndim) \
                + idx.reshape(bshape)
        return out

    # ------------------------------------------------------------------
    # building blocks (pure functions of (state, dmaps); level loops are
    # unrolled at trace time)
    # ------------------------------------------------------------------
    def _fill_ghost_lvl(self, state, dmaps, lvl: int, iv: int):
        cc = state["cc"]
        coarse = cc.get(lvl - 1)
        bc_vals = state["bc"][lvl] if iv == IPHI else None
        ext = None
        if "halo" in dmaps[lvl]:
            from ..parallel import halo as halo_mod
            ext = halo_mod.gather_faces_ppermute(
                cc[lvl][iv], dmaps[lvl]["halo"], self._halo_plans[lvl],
                self.mesh, self.ndim, self.static[lvl]["nc"])
        new = ghost_ops.fill_ghost_lvl(
            cc[lvl], coarse, dmaps[lvl], self.static[lvl],
            self._bc_static(iv, lvl), bc_vals, iv, ext_gathered=ext)
        state = dict(state)
        state["cc"] = dict(cc)
        state["cc"][lvl] = new
        return state

    def fill_ghost_all(self, state, dmaps, iv: int):
        """mg_fill_ghost_cells (m_ghost_cells.f90:120-128)."""
        for lvl in self.levels:
            state = self._fill_ghost_lvl(state, dmaps, lvl, iv)
        return state

    def _smooth_boxes(self, state, dmaps, lvl: int, n_cycle: int, lam):
        """smooth_boxes (m_multigrid.f90:404-424): ghost fill after every
        substep (or fused into the sweep, experimental.gathered_smoother)."""
        ctx = self._op_ctx(lvl, dmaps)
        parity = dmaps[lvl]["parity"]
        st = self.static[lvl]
        gathered = (self.cfg.experimental.gathered_smoother
                    and self.cfg.smoother == "gsrb"
                    and self.cfg.operator in ("laplacian", "helmholtz")
                    and self.cfg.geometry == "cartesian"
                    and not any(st["mr"]))
        # laplacian only for now: lam is a traced scalar for helmholtz
        # and the kernel bakes the denominator statically
        use_pallas = (self.cfg.experimental.pallas_smoother
                      and self.cfg.smoother == "gsrb"
                      and self.cfg.operator == "laplacian"
                      and self.cfg.geometry == "cartesian"
                      and self.ndim >= 2)
        for n in range(1, n_cycle * self.substeps + 1):
            cc = state["cc"][lvl]
            if self.cfg.smoother == "jacobi":
                phi = kernels.jacobi_sweep(cc[IPHI], cc[IRHS], self.ndim,
                                           ctx.nc, ctx.idr2, lam)
            elif use_pallas:
                from ..ops import pallas_smoother as ps
                op_lam = 0.0 if self.cfg.operator == "laplacian" else lam
                phi = ps.half_sweep_boxes(
                    cc[IPHI], cc[IRHS], self.ndim, ctx.nc, ctx.idr2,
                    op_lam, parity_val=(n % 2),
                    interpret=(jax.default_backend() == "cpu"))
            elif gathered:
                op_lam = 0.0 if self.cfg.operator == "laplacian" else lam
                phi = kernels.helmholtz_smooth_half_gathered(
                    cc[IPHI], cc[IRHS], self.ndim, ctx.nc, ctx.idr2,
                    op_lam, parity == (n % 2), dmaps[lvl], st,
                    self._bc_static(IPHI, lvl), state["bc"][lvl])
            else:
                mask = parity == (n % 2)
                phi = kernels.op_smooth_half(self.cfg.operator, ctx, cc, lam,
                                             mask)
            state = self._set_plane(state, lvl, IPHI, phi)
            if not gathered:
                state = self._fill_ghost_lvl(state, dmaps, lvl, IPHI)
        if gathered:
            # materialize ghosts once so downstream consumers (residual,
            # restriction, correction) see the reference-contract state
            state = self._fill_ghost_lvl(state, dmaps, lvl, IPHI)
        return state

    def _set_plane(self, state, lvl, iv, plane):
        state = dict(state)
        state["cc"] = dict(state["cc"])
        state["cc"][lvl] = state["cc"][lvl].at[iv].set(plane)
        return state

    def _residual_lvl(self, state, dmaps, lvl: int, lam):
        """residual_box over a level (m_multigrid.f90:426-436); writes IRES."""
        ctx = self._op_ctx(lvl, dmaps)
        cc = state["cc"][lvl]
        out = kernels.op_apply(self.cfg.operator, ctx, cc, lam)
        ires = cc[IRES].at[(slice(None),) + (slice(1, -1),) * self.ndim].set(
            cc[IRHS][(slice(None),) + (slice(1, -1),) * self.ndim] - out)
        return self._set_plane(state, lvl, IRES, ires)

    def _max_residual_lvl(self, state, dmaps, lvl: int, lam):
        """max_residual_lvl (m_multigrid.f90:296-311)."""
        state = self._residual_lvl(state, dmaps, lvl, lam)
        ires = state["cc"][lvl][IRES]
        interior = ires[(slice(None),) + (slice(1, -1),) * self.ndim]
        return state, jnp.max(jnp.abs(interior))

    def _update_coarse(self, state, dmaps, lvl: int, lam):
        """update_coarse (m_multigrid.f90:347-384): FAS tau correction."""
        D = self.ndim
        isl = (slice(None),) + (slice(1, -1),) * D
        state = self._residual_lvl(state, dmaps, lvl, lam)
        state = self._restrict_lvl(state, dmaps, lvl, IPHI)
        state = self._restrict_lvl(state, dmaps, lvl, IRES)
        state = self._fill_ghost_lvl(state, dmaps, lvl - 1, IPHI)

        cc_c = state["cc"][lvl - 1]
        ctx_c = self._op_ctx(lvl - 1, dmaps)
        a_phi = kernels.op_apply(self.cfg.operator, ctx_c, cc_c, lam)
        if self.static[lvl]["parents_identity"]:
            rhs_new = cc_c[IRHS].at[isl].set(a_phi + cc_c[IRES][isl])
            iold_new = cc_c[IPHI]
        else:
            ploc = dmaps[lvl]["parent_locs"]
            rhs_new = cc_c[IRHS].at[(ploc,) + isl[1:]].set(
                a_phi[ploc] + cc_c[IRES][(ploc,) + isl[1:]])
            iold_new = cc_c[IOLD].at[ploc].set(cc_c[IPHI][ploc])
        cc_c = cc_c.at[IRHS].set(rhs_new).at[IOLD].set(iold_new)
        state = dict(state)
        state["cc"] = dict(state["cc"])
        state["cc"][lvl - 1] = cc_c
        return state

    def _restrict_lvl(self, state, dmaps, lvl: int, iv: int):
        """mg_restrict_lvl from lvl into lvl-1 (m_restrict.f90:83-114)."""
        fine = state["cc"][lvl][iv]
        coarse = state["cc"][lvl - 1][iv]
        new_coarse = transfer.restrict_to_coarse(fine, coarse, dmaps[lvl],
                                                 self.static[lvl])
        return self._set_plane(state, lvl - 1, iv, new_coarse)

    def restrict_all(self, state, dmaps, iv: int):
        """mg_restrict (m_restrict.f90:72-80)."""
        for lvl in reversed(self.levels[1:]):
            state = self._restrict_lvl(state, dmaps, lvl, iv)
        return state

    def _correct_children(self, state, dmaps, lvl: int):
        """correct_children (m_multigrid.f90:387-402):
        phi_fine += prolong(phi_c - phi_old_c); the correction's ghost
        layer participates in the interpolation, as in the reference."""
        cc_c = state["cc"][lvl]
        corr = cc_c[IPHI] - cc_c[IOLD]
        vals = self.box_prolong(corr, dmaps[lvl + 1], self.static[lvl + 1])
        nr = self.static[lvl + 1]["n_real"]
        isl = (slice(0, nr),) + (slice(1, -1),) * self.ndim
        phi_f = state["cc"][lvl + 1][IPHI]
        phi_f = phi_f.at[isl].add(vals)
        return self._set_plane(state, lvl + 1, IPHI, phi_f)

    def prolong_lvl(self, state, dmaps, lvl: int, iv: int, iv_to: int,
                    add: bool, method=None):
        """mg_prolong from lvl onto lvl+1 (m_prolong.f90:51-85)."""
        method = method or self.box_prolong
        vals = method(state["cc"][lvl][iv], dmaps[lvl + 1],
                      self.static[lvl + 1])
        nr = self.static[lvl + 1]["n_real"]
        isl = (slice(0, nr),) + (slice(1, -1),) * self.ndim
        plane = state["cc"][lvl + 1][iv_to]
        plane = plane.at[isl].add(vals) if add else plane.at[isl].set(vals)
        return self._set_plane(state, lvl + 1, iv_to, plane)

    def _subtract_mean(self, state, dmaps, iv: int, include_ghostcells: bool):
        """subtract_mean (m_multigrid.f90:245-294): leaf-weighted global
        mean over levels >= 1, removed from all levels."""
        t = self.tree
        total = 0.0
        for lvl in [l for l in self.levels if l >= 1]:
            st = self.static[lvl]
            w = float(np.prod(t.dr[lvl]))
            if st["leaves_all"]:
                interior = state["cc"][lvl][iv][
                    (slice(None),) + (slice(1, -1),) * self.ndim]
            else:
                leaf = dmaps[lvl]["leaf_locs"]
                interior = state["cc"][lvl][iv][
                    (leaf,) + (slice(1, -1),) * self.ndim]
            total = total + w * jnp.sum(interior)
        nc1 = t.box_size_lvl[1]
        volume = nc1 ** self.ndim * float(np.prod(t.dr[1])) \
            * len(t.lvls[1].ids)
        mean = total / volume
        for lvl in self.levels:
            plane = state["cc"][lvl][iv]
            if include_ghostcells:
                plane = plane - mean
            else:
                isl = (slice(None),) + (slice(1, -1),) * self.ndim
                plane = plane.at[isl].add(-mean)
            state = self._set_plane(state, lvl, iv, plane)
        return state

    # ------------------------------------------------------------------
    # cycle drivers
    # ------------------------------------------------------------------
    def _coarse_solve(self, state, dmaps, lam):
        """Coarse-grid smoothing loop (m_multigrid.f90:196-209)."""
        min_lvl = self.levels[0]
        n_cyc = self.cfg.n_cycle_up + self.cfg.n_cycle_down
        state, init_res = self._max_residual_lvl(state, dmaps, min_lvl, lam)

        def cond(carry):
            st, it, res = carry
            return ((it < self.cfg.max_coarse_cycles)
                    & (res >= self.cfg.residual_coarse_rel * init_res)
                    & (res >= self.cfg.residual_coarse_abs))

        def body(carry):
            st, it, res = carry
            st = self._smooth_boxes(st, dmaps, min_lvl, n_cyc, lam)
            st, r = self._max_residual_lvl(st, dmaps, min_lvl, lam)
            return (st, it + 1, r)

        state, _, _ = jax.lax.while_loop(
            cond, body, (state, jnp.array(0), jnp.asarray(jnp.inf,
                                                          self.cfg.dtype)))
        return state

    def _vcycle(self, state, dmaps, lam, max_lvl: Optional[int],
                standalone: bool, need_res: bool):
        """mg_fas_vcycle (m_multigrid.f90:150-243)."""
        cfg = self.cfg
        min_lvl = self.levels[0]
        top = self.levels[-1] if max_lvl is None else max_lvl

        if self.subtract_mean and max_lvl is None:
            state = self._subtract_mean(state, dmaps, IRHS, False)
        if standalone:
            state = self._fill_ghost_lvl(state, dmaps, top, IPHI)

        for lvl in range(top, min_lvl, -1):
            state = self._smooth_boxes(state, dmaps, lvl, cfg.n_cycle_down, lam)
            state = self._update_coarse(state, dmaps, lvl, lam)

        state = self._coarse_solve(state, dmaps, lam)

        for lvl in range(min_lvl + 1, top + 1):
            state = self._correct_children(state, dmaps, lvl - 1)
            state = self._fill_ghost_lvl(state, dmaps, lvl, IPHI)
            state = self._smooth_boxes(state, dmaps, lvl, cfg.n_cycle_up, lam)

        res = jnp.asarray(0.0, cfg.dtype)
        if need_res:
            for lvl in range(min_lvl, top + 1):
                state, r = self._max_residual_lvl(state, dmaps, lvl, lam)
                res = jnp.maximum(res, r)

        if self.subtract_mean:
            state = self._subtract_mean(state, dmaps, IPHI, True)
        return state, res

    def _fmg(self, state, dmaps, lam, have_guess: bool, need_res: bool):
        """mg_fas_fmg (m_multigrid.f90:84-147)."""
        min_lvl, top = self.levels[0], self.levels[-1]
        if not have_guess:
            for lvl in self.levels:
                state = self._set_plane(
                    state, lvl, IPHI,
                    jnp.zeros_like(state["cc"][lvl][IPHI]))

        state = self._fill_ghost_lvl(state, dmaps, top, IPHI)
        for lvl in range(top, min_lvl, -1):
            state = self._update_coarse(state, dmaps, lvl, lam)
        if self.subtract_mean:
            state = self._subtract_mean(state, dmaps, IRHS, False)

        res = jnp.asarray(0.0, self.cfg.dtype)
        for lvl in range(min_lvl, top + 1):
            state = self._set_plane(state, lvl, IOLD,
                                    state["cc"][lvl][IPHI])
            if lvl > min_lvl:
                state = self._correct_children(state, dmaps, lvl - 1)
                state = self._fill_ghost_lvl(state, dmaps, lvl, IPHI)
            last = lvl == top
            state, r = self._vcycle(state, dmaps, lam, max_lvl=lvl,
                                    standalone=False,
                                    need_res=(need_res and last))
            if last:
                res = r
        return state, res

    def apply_op(self, state, dmaps, lam, i_out: int):
        """mg_apply_op (m_multigrid.f90:439-456)."""
        isl = (slice(None),) + (slice(1, -1),) * self.ndim
        for lvl in self.levels:
            ctx = self._op_ctx(lvl, dmaps)
            cc = state["cc"][lvl]
            out = kernels.op_apply(self.cfg.operator, ctx, cc, lam)
            state = self._set_plane(state, lvl, i_out,
                                    cc[i_out].at[isl].set(out))
        return state

    def _fmg_prepare(self, state, dmaps, lam, have_guess: bool):
        """FMG preamble: optional zero guess, top ghost fill, full
        restriction of the problem, periodic mean removal
        (m_multigrid.f90:95-117)."""
        min_lvl, top = self.levels[0], self.levels[-1]
        if not have_guess:
            for lvl in self.levels:
                state = self._set_plane(
                    state, lvl, IPHI,
                    jnp.zeros_like(state["cc"][lvl][IPHI]))
        state = self._fill_ghost_lvl(state, dmaps, top, IPHI)
        for lvl in range(top, min_lvl, -1):
            state = self._update_coarse(state, dmaps, lvl, lam)
        if self.subtract_mean:
            state = self._subtract_mean(state, dmaps, IRHS, False)
        return state

    def _fmg_level_step(self, state, dmaps, lvl: int):
        """Per-level FMG step before the V-cycle: store iold, correct from
        below, refill ghosts (m_multigrid.f90:119-136)."""
        state = self._set_plane(state, lvl, IOLD, state["cc"][lvl][IPHI])
        if lvl > self.levels[0]:
            state = self._correct_children(state, dmaps, lvl - 1)
            state = self._fill_ghost_lvl(state, dmaps, lvl, IPHI)
        return state

    # ------------------------------------------------------------------
    # public jitted entry points.  FMG is assembled from per-level jitted
    # programs rather than one fully inlined graph: the inlined form is
    # O(levels^2) HLO and compiles pathologically at 512^3, while the
    # split form reuses the V-cycle executables across calls.
    # ------------------------------------------------------------------
    def _donate(self):
        return (0,) if self.cfg.donate else ()

    @functools.cached_property
    def _jit_vcycle(self):
        @functools.partial(jax.jit, static_argnames=("max_lvl", "standalone",
                                                     "need_res"),
                           donate_argnums=self._donate())
        def f(state, dmaps, lam, max_lvl, standalone, need_res):
            return self._vcycle(state, dmaps, lam, max_lvl, standalone,
                                need_res)
        return f

    @functools.cached_property
    def _jit_fmg_prepare(self):
        @functools.partial(jax.jit, static_argnames=("have_guess",),
                           donate_argnums=self._donate())
        def f(state, dmaps, lam, have_guess):
            return self._fmg_prepare(state, dmaps, lam, have_guess)
        return f

    @functools.cached_property
    def _jit_fmg_level_combo(self):
        """level_step + V-cycle in one program: halves the per-FMG
        dispatch count, which dominates wall time on high-latency
        runtimes (remote TPU tunnels)."""
        @functools.partial(jax.jit, static_argnames=("lvl", "need_res"),
                           donate_argnums=self._donate())
        def f(state, dmaps, lam, lvl, need_res):
            state = self._fmg_level_step(state, dmaps, lvl)
            return self._vcycle(state, dmaps, lam, max_lvl=lvl,
                                standalone=False, need_res=need_res)
        return f

    def _lam_arr(self, lam):
        """Traced Helmholtz scalar shaped (1,)*(ndim+1) — a 0-d traced
        scalar multiplied into a fused whole-array chain makes XLA emit
        a ~50x-slower TPU kernel (measured, see ops/dense2d._lam_2d);
        the broadcastable rank-matched array costs nothing."""
        return jnp.asarray(lam, self.cfg.dtype).reshape(
            (1,) * (self.ndim + 1))

    def fas_vcycle(self, state, lam=0.0, max_lvl=None, need_res=True):
        dmaps = self._to_device()
        lam = self._lam_arr(lam)
        with self.timers.section("total V-cycle"):
            out = self._jit_vcycle(state, dmaps, lam, max_lvl=max_lvl,
                                   standalone=True, need_res=need_res)
        return out

    @functools.cached_property
    def _jit_fmg_fused(self):
        @functools.partial(jax.jit, static_argnames=("have_guess",
                                                     "need_res"),
                           donate_argnums=self._donate())
        def f(state, dmaps, lam, have_guess, need_res):
            return self._fmg(state, dmaps, lam, have_guess, need_res)
        return f

    def fas_fmg(self, state, lam=0.0, have_guess=False, need_res=True):
        """mg_fas_fmg, assembled from jitted per-level programs (or one
        fused program, cfg.fmg_mode)."""
        dmaps = self._to_device()
        lam = self._lam_arr(lam)
        if self.cfg.fmg_mode == "fused":
            with self.timers.section("total FMG cycle"):
                return self._jit_fmg_fused(state, dmaps, lam,
                                           have_guess=have_guess,
                                           need_res=need_res)
        top = self.levels[-1]
        with self.timers.section("total FMG cycle"):
            with self.timers.section("fmg update coarse"):
                state = self._jit_fmg_prepare(state, dmaps, lam,
                                              have_guess=have_guess)
            res = jnp.asarray(0.0, self.cfg.dtype)
            for lvl in self.levels:
                last = lvl == top
                with self.timers.section(f"fmg v-cycle lvl {lvl}"):
                    state, r = self._jit_fmg_level_combo(
                        state, dmaps, lam, lvl=lvl,
                        need_res=(need_res and last))
                if last:
                    res = r
        return state, res

    # -- public state-access API (for drivers layered on the solver:
    # free-space, coupling; keeps their code off private internals) ----
    def set_plane(self, state, lvl: int, iv: int, plane):
        """Replace one variable plane at a level."""
        return self._set_plane(state, lvl, iv, plane)

    def restrict_level(self, state, lvl: int, iv: int):
        """Restrict one variable from lvl into lvl-1 (mg_restrict_lvl)."""
        return self._restrict_lvl(state, self._to_device(), lvl, iv)

    def prolong_level(self, state, lvl: int, iv: int, iv_to: int,
                      add: bool = False, method=None):
        """Prolong one variable from lvl onto lvl+1 (mg_prolong)."""
        return self.prolong_lvl(state, self._to_device(), lvl, iv, iv_to,
                                add, method)

    def fill_ghost(self, state, iv: int = IPHI, lvl: Optional[int] = None):
        dmaps = self._to_device()
        if lvl is not None:
            return self._fill_ghost_lvl(state, dmaps, lvl, iv)
        return self.fill_ghost_all(state, dmaps, iv)

    def restrict(self, state, iv: int):
        return self.restrict_all(state, self._to_device(), iv)

    def prepare_coefficient(self, state, iv: int = IVEPS):
        """Make a coefficient field usable on every level: restrict it
        down the hierarchy and fill its ghost cells (the reference
        expects eps present on all levels, m_vhelmholtz.f90:7-10)."""
        state = self.restrict(state, iv)
        return self.fill_ghost(state, iv)

    def apply_operator(self, state, lam=0.0, i_out: int = IRES):
        lam = self._lam_arr(lam)
        return self.apply_op(state, self._to_device(), lam, i_out)
