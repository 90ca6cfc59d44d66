"""Dense-forest FAS multigrid: ARBITRARY quadtree/octree forests on the
dense fast path.

The reference runs any 2:1-balanced octree at one speed — its ghost
machinery handles same-level, refinement-boundary and physical faces per
box (m_ghost_cells.f90:131-285, 769-861).  The rectangular dense-AMR
solver here (solve/dense_amr.py) covers only levels whose boxes tile a
rectangle; everything else used to fall back to the boxed solver at
~2.3e7 leaf-unknowns/s.  This solver removes that cliff:

* Each refinement level is stored as ONE dense padded array over the
  *bounding box* of its leaf footprint (the "canvas").  Cells outside
  the footprint are garbage by contract: they start at zero, evolve
  under the homogeneous smoother, and are fenced off from real cells by
  a one-cell ghost ring that is rewritten before every half-sweep.
* The footprint is decomposed host-side into a few axis-aligned
  rectangles (greedy box-merge); every transfer/reduction touches only
  those rectangles.
* All ghost values — refinement-boundary (sides_rb: 0.5*interp +
  0.75*x1 - 0.25*x2, m_ghost_cells.f90:769-861), physical (bc_to_gc:
  c0*b + c1*x1 + c2*x2, :665-766) and periodic wraps — are computed in
  plain XLA as 2D rectangle writes: ghosts *inside* the canvas go into
  the ring cells, ghosts on the canvas boundary are assembled into the
  six face planes which the stencil kernels consume with the identity
  coefficients (1, 0, 0).
* Smoothing runs at HALF-SWEEP granularity (dense_kernels.
  half_sweep_dense): the ring/planes are refreshed between half-sweeps,
  which is exactly the reference's per-substep refill cadence
  (smooth_boxes, m_multigrid.f90:404-424), so every phase is
  bit-identical to the boxed solver (tests/test_dense_forest.py).

Periodic exteriors are supported (including refinement levels that end
inside a periodic domain: their exterior ghosts interpolate from the
wrapped coarse cells).  Gating (``dense_forest_supported``): 3D
cartesian operators (laplacian/helmholtz and the variable-coefficient
vlaplacian/vhelmholtz/ahelmholtz families — the eps fields ride the
same ring/face ghost synthesis), GSRB, 2:1-balanced forest, footprint
filling >= min_fill of each canvas.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import NO_BOX
from ..core.tree import Tree
from ..ops import dense_kernels as dk
from ..ops.ghost import interp_rb_strip
from .dense import DenseMGSolver, _ISL
from .dense_amr import RB_COEFFS
from .multigrid import MGConfig


# ---------------------------------------------------------------------------
# host-side geometry
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class _Seg:
    """One rectangular ghost segment of a level canvas.

    lo/hi: half-open cell rectangle in canvas-local coords (x, y, z);
    along the face-normal dim d=nb//2 it is one cell thick (the ghost
    layer).  sink "ring" = inside the canvas, "face" = one of the six
    face planes.  kind "phys" (bc_to_gc), "rb" (sides_rb w/ coarse
    interp), "wrap" (periodic same-level copy).  For "wrap", src is the
    normal cell index of the source layer; for "rb", cg is the GLOBAL
    coarse normal cell index of the interp strip layer."""

    nb: int
    kind: str
    sink: str
    lo: np.ndarray
    hi: np.ndarray
    src: int = 0
    cg: int = 0


def _mask_rects_2d(mask: np.ndarray) -> List[Tuple[int, int, int, int]]:
    """Greedy decomposition of a 2D boolean mask into rectangles
    (a0, a1, b0, b1), half-open."""
    m = mask.copy()
    out = []
    A, B = m.shape
    for a in range(A):
        b = 0
        while b < B:
            if not m[a, b]:
                b += 1
                continue
            b1 = b
            while b1 + 1 < B and m[a, b1 + 1]:
                b1 += 1
            a1 = a
            while a1 + 1 < A and m[a1 + 1, b:b1 + 1].all():
                a1 += 1
            out.append((a, a1 + 1, b, b1 + 1))
            m[a:a1 + 1, b:b1 + 1] = False
            b = b1 + 1
    return out


def _greedy_rects_3d(occ: np.ndarray) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Greedy decomposition of a 3D boolean occupancy [BX, BY, BZ] into
    boxes ((x0,y0,z0), (x1,y1,z1)), half-open."""
    m = occ.copy()
    out = []
    while m.any():
        x, y, z = np.argwhere(m)[0]
        x1 = x
        while x1 + 1 < m.shape[0] and m[x1 + 1, y, z]:
            x1 += 1
        y1 = y
        while y1 + 1 < m.shape[1] and m[x:x1 + 1, y1 + 1, z].all():
            y1 += 1
        z1 = z
        while z1 + 1 < m.shape[2] and m[x:x1 + 1, y:y1 + 1, z1 + 1].all():
            z1 += 1
        out.append((np.array([x, y, z]), np.array([x1 + 1, y1 + 1, z1 + 1])))
        m[x:x1 + 1, y:y1 + 1, z:z1 + 1] = False
    return out



def _dep_memo(obj, name, lvlkey, deps, build):
    """Identity-keyed memo for per-phase traced builds (rb strips, seg
    planes).  The build is a pure function of the dependency arrays
    (coarser-level canvases + bc planes) and static geometry; keying on
    OBJECT IDENTITY of the deps is exact both under tracing (tracer
    objects persist within one trace, never across traces) and eagerly
    (a changed array is a new object).  Saves the repeated coarse-ext
    materializations between consumers inside one level visit
    (down-smooth -> residual -> transfers read the same coarse phi —
    measured 6.1 ms/build at a 256^3-class canvas, docs/PERF.md)."""
    memo = obj.__dict__.setdefault(name, {})
    lst = memo.setdefault(lvlkey, [])
    for d, r in lst:
        if len(d) == len(deps) and all(a is b for a, b in zip(d, deps)):
            return r
    r = build()
    lst.append((deps, r))
    if len(lst) > 4:
        lst.pop(0)
    return r


class _LevelGeom:
    """Canvas geometry of one refinement level."""

    def __init__(self, tree: Tree, lvl: int, ids=None):
        self.lvl = lvl
        self.nc = nc = tree.box_size_lvl[lvl]
        ids = tree.lvls[lvl].ids if ids is None else np.asarray(ids)
        self.ids = ids
        ix = tree.ix[ids] - 1                     # [n, 3] 0-based box coords
        self.box_lo = ix.min(axis=0)              # canvas origin, box units
        box_hi = ix.max(axis=0) + 1
        self.B = box_hi - self.box_lo             # canvas extent, box units
        self.off = self.box_lo * nc               # cell offset (x, y, z)
        self.dims = tuple(int(v) for v in self.B * nc)
        self.dom_box = tree.domain_size_lvl[lvl] // nc
        self.dom_cells = np.asarray(tree.domain_size_lvl[lvl])
        occ = np.zeros(tuple(self.B), dtype=bool)
        loc = ix - self.box_lo
        occ[loc[:, 0], loc[:, 1], loc[:, 2]] = True
        self.occ = occ
        self.full = bool(occ.all() and np.all(self.B == self.dom_box))
        # footprint rectangles in canvas-local cells
        self.rects = [(lo * nc, hi * nc) for lo, hi in _greedy_rects_3d(occ)]
        self.n_cells = int(occ.sum()) * nc ** 3

    def build_segments(self, periodic) -> List[_Seg]:
        """Classify and merge the footprint's ghost faces."""
        segs: List[_Seg] = []
        nc = self.nc
        occ = self.occ
        B = self.B
        dom = self.dom_box
        for nb in range(6):
            d = nb // 2
            sgn = -1 if nb % 2 == 0 else +1
            # grouped masks keyed by (kind, normal box layer, src/cg)
            groups: Dict[Tuple, np.ndarray] = {}
            tdims = [dd for dd in range(3) if dd != d]
            for p in np.argwhere(occ):
                q = p.copy()
                q[d] += sgn
                qg = q + self.box_lo              # global box coords
                inside_canvas = 0 <= q[d] < B[d]
                if inside_canvas and occ[tuple(q)]:
                    continue                      # direct same-level neighbor
                if 0 <= qg[d] < dom[d]:
                    kind, aux = "rb", 0
                elif periodic[d]:
                    qw = qg.copy()
                    qw[d] %= dom[d]
                    ql = qw - self.box_lo
                    if (0 <= ql[d] < B[d]) and occ[tuple(ql)]:
                        kind, aux = "wrap", 0
                    else:
                        kind, aux = "rb", 0
                else:
                    kind, aux = "phys", 0
                key = (kind, int(q[d]), aux)
                tshape = tuple(int(B[dd]) for dd in tdims)
                groups.setdefault(key, np.zeros(tshape, dtype=bool))[
                    tuple(int(p[dd]) for dd in tdims)] = True
            for (kind, qd, aux), mask in groups.items():
                inside = 0 <= qd < B[d]
                if inside:
                    sink = "ring"
                    # ghost layer: the q-box cell adjacent to p's face
                    g = qd * nc + (nc - 1 if sgn < 0 else 0)
                else:
                    sink = "face"
                    g = -1 if sgn < 0 else self.dims[d]
                g_glob = self.off[d] + g
                src = cg = 0
                if kind == "wrap":
                    src = int((g_glob % self.dom_cells[d]) - self.off[d])
                if kind == "rb":
                    cg = int((g_glob % self.dom_cells[d]) // 2) \
                        if periodic[d] else g_glob // 2
                for a0, a1, b0, b1 in _mask_rects_2d(mask):
                    lo = np.zeros(3, np.int64)
                    hi = np.zeros(3, np.int64)
                    lo[d], hi[d] = g, g + 1
                    lo[tdims[0]], hi[tdims[0]] = a0 * nc, a1 * nc
                    lo[tdims[1]], hi[tdims[1]] = b0 * nc, b1 * nc
                    segs.append(_Seg(nb=nb, kind=kind, sink=sink,
                                     lo=lo, hi=hi, src=src, cg=cg))
        return segs


@dataclasses.dataclass
class _Fix:
    """One fix-up rectangle of footprint cells whose bulk-pass result
    used a clobbered (conflicted) ring ghost: the smoother/operator is
    recomputed on these cells with direction-correct ghost values —
    the same per-cell expression as the bulk pass, so results are
    bitwise what the bulk would produce with per-box ghost storage
    (the reference's layout, m_ghost_cells.f90:232-285)."""

    lo: np.ndarray
    hi: np.ndarray
    upd0: np.ndarray          # parity-0 update mask [z, y, x]
    dirs: List[Dict]          # per dd 0..5: neighbor source plan


def _build_conflict_plan(segs: List[_Seg], dims) -> Optional[List[_Fix]]:
    """Host-side plan of concave-corner ghost conflicts for one level.

    Ring segments of different axes can claim the same garbage cell;
    the canvas keeps only the last write.  For every pairwise overlap,
    both segments' served footprint cells (the overlap shifted one cell
    toward the footprint) are re-listed for fix-up with all six
    neighbor values assembled from the correct sources."""
    ring = [(i, s) for i, s in enumerate(segs) if s.sink == "ring"]
    rects = set()
    for a in range(len(ring)):
        for b in range(a + 1, len(ring)):
            si, sj = ring[a][1], ring[b][1]
            lo = np.maximum(si.lo, sj.lo)
            hi = np.minimum(si.hi, sj.hi)
            if not np.all(lo < hi):
                continue
            for s in (si, sj):
                d = s.nb // 2
                sgn = -1 if s.nb % 2 == 0 else 1
                rlo, rhi = lo.copy(), hi.copy()
                rlo[d] -= sgn
                rhi[d] -= sgn
                rects.add((tuple(rlo), tuple(rhi)))
    if not rects:
        return None
    plan = []
    for rlo_t, rhi_t in sorted(rects):
        rlo = np.array(rlo_t, np.int64)
        rhi = np.array(rhi_t, np.int64)
        gz = np.arange(rlo[2], rhi[2]).reshape(-1, 1, 1)
        gy = np.arange(rlo[1], rhi[1]).reshape(1, -1, 1)
        gx = np.arange(rlo[0], rhi[0]).reshape(1, 1, -1)
        upd0 = ((gy + gx) % 2 == gz % 2)  # red parity 0 (3D dense path)
        dirs = []
        for dd in range(6):
            d = dd // 2
            step = -1 if dd % 2 == 0 else 1
            nlo, nhi = rlo.copy(), rhi.copy()
            nlo[d] += step
            nhi[d] += step
            # clip the (at most one) out-of-canvas layer to face planes
            out_side = None
            ilo, ihi = nlo.copy(), nhi.copy()
            if nlo[d] < 0:
                out_side = "lo"
                ilo[d] = 0
            if nhi[d] > dims[d]:
                out_side = "hi"
                ihi[d] = dims[d]
            overlays = []
            for i, s in ring:
                if s.nb != dd:
                    continue
                olo = np.maximum(ilo, s.lo)
                ohi = np.minimum(ihi, s.hi)
                if np.all(olo < ohi):
                    overlays.append((i, olo, ohi))
            dirs.append({"nlo": nlo, "nhi": nhi, "ilo": ilo, "ihi": ihi,
                         "out_side": out_side, "overlays": overlays})
        plan.append(_Fix(lo=rlo, hi=rhi, upd0=upd0, dirs=dirs))
    return plan


def _forest_balanced(tree: Tree) -> bool:
    """2:1 balance: every missing same-level neighbor must have a coarse
    one (the reference ghost scheme handles one-level jumps only)."""
    for lvl in range(tree.lowest_lvl + 1, tree.highest_lvl + 1):
        for b in tree.lvls[lvl].ids:
            for nb in range(2 * tree.ndim):
                if tree.neighbors[int(b), nb] == NO_BOX:
                    p = int(tree.parent[int(b)])
                    if tree.neighbors[p, nb] <= NO_BOX:
                        return False
    return True


def dense_forest_supported(tree: Tree, cfg: MGConfig,
                           min_fill: float = 0.2) -> bool:
    """Whether the dense-forest path covers this configuration."""
    if not (tree.ndim == 3
            and tree.highest_lvl > 1
            and cfg.operator in ("laplacian", "helmholtz", "vlaplacian",
                                 "vhelmholtz", "ahelmholtz")
            and cfg.geometry == "cartesian"
            and cfg.smoother in ("gsrb", "gs")):
        return False
    if not _forest_balanced(tree):
        return False
    for lvl in range(tree.lowest_lvl, tree.highest_lvl + 1):
        if len(tree.lvls[lvl].ids) == 0:
            return False
        g = _LevelGeom(tree, lvl)
        if g.n_cells < min_fill * int(np.prod(g.dims)):
            return False
    return True


# ---------------------------------------------------------------------------
# solver
# ---------------------------------------------------------------------------

class DenseForestMGSolver(DenseMGSolver):
    """FAS multigrid on dense level canvases over arbitrary forests."""

    _supported = staticmethod(dense_forest_supported)

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------
    def _build_levels(self):
        t = self.tree
        all_lvls = list(range(t.lowest_lvl, t.highest_lvl + 1))
        self.geom: Dict[int, _LevelGeom] = {
            lvl: _LevelGeom(t, lvl) for lvl in all_lvls}
        self.dims = {lvl: self.geom[lvl].dims for lvl in all_lvls}
        self.offsets = {lvl: self.geom[lvl].off for lvl in all_lvls}
        if self.coarse_solver == "direct":
            direct = None
            for lvl in all_lvls:
                if (self.geom[lvl].full
                        and int(np.prod(self.dims[lvl]))
                        <= self.DIRECT_MAX_CELLS):
                    direct = lvl
            if direct is None:
                direct = all_lvls[0]
            self.levels = [l for l in all_lvls if l >= direct]
        else:
            self.levels = all_lvls
        per = tuple(bool(p) for p in t.periodic)
        self.segs: Dict[int, List[_Seg]] = {
            lvl: self.geom[lvl].build_segments(per)
            for lvl in self.levels}
        #: concave-corner ghost-conflict fix-up plans (None = conflict
        #: free: rectangular footprints, isolated patches, full levels)
        self.conflicts: Dict[int, Optional[List[_Fix]]] = {
            lvl: _build_conflict_plan(self.segs[lvl], self.dims[lvl])
            for lvl in self.levels}

    # ------------------------------------------------------------------
    # multi-chip: GSPMD z-slab sharding (the 3D rendering of the 2D
    # forest's overlay pattern, solve/dense_forest2d.py)
    # ------------------------------------------------------------------
    def shard_state(self, state, mesh, min_local: int = 8):
        """Place the forest state on a 1D device mesh as z-slabs (GSPMD).

        Sharded levels run a pure-XLA formulation of the smoother /
        operator in which every neighbor read is a roll of the RAW
        state canvas with ring-ghost values OVERLAID onto the rolled
        arrays at the cells they serve (_dir_neighbors_gspmd) — never a
        roll of a ghost-written canvas (GSPMD miscompiles rolls of
        thin-strip scatter outputs at shard boundaries, measured jax
        0.9.0 CPU; the 2D forest pattern).  The overlay formulation
        also resolves concave-corner ghost conflicts by construction
        (direction d's reads see d-axis ghosts), so the fix-up passes
        are not needed; footprint-cell arithmetic is the same
        expression tree as the single-device path
        (tests/test_dense_forest.py::test_forest_gspmd_*).

        The reference runs any octree under mpirun at any rank count
        (m_load_balance.f90:71-136); this is that capability on a TPU
        mesh, with coarse canvases replicated (agglomeration)."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        ax = mesh.axis_names[0]
        K = int(np.prod(mesh.devices.shape))
        repl = NamedSharding(mesh, PartitionSpec())
        zsh = NamedSharding(mesh, PartitionSpec(ax, None, None))
        self._gspmd_mesh = mesh
        for cached in ("_jit_vcycle", "_jit_fmg"):
            self.__dict__.pop(cached, None)
        #: per-level decision, inspectable (mirrors dense2d.y_sharded)
        self.z_sharded = {}
        for lvl in self.levels:
            Z = self.dims[lvl][2]
            self.z_sharded[lvl] = (lvl != self.levels[0] and K > 1
                                   and Z % K == 0
                                   and (Z // K) % 2 == 0
                                   and Z // K >= min_local)
        out = {}
        for key, per_lvl in state.items():
            if key == "bc":
                out[key] = {lvl: [jax.device_put(v, repl) for v in ps]
                            for lvl, ps in per_lvl.items()}
            else:
                out[key] = {lvl: jax.device_put(
                    arr, zsh if self.z_sharded[lvl] else repl)
                    for lvl, arr in per_lvl.items()}
        return out

    def _pin_repl(self, x):
        """Pin a small traced intermediate to replicated under GSPMD
        (no-op single-device) — see Dense2DMGSolver._pin_repl for the
        measured strip-chain miscompile this guards against."""
        mesh = getattr(self, "_gspmd_mesh", None)
        if mesh is None:
            return x
        import jax
        from jax.sharding import NamedSharding, PartitionSpec
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, PartitionSpec()))

    @property
    def _gspmd(self) -> bool:
        return getattr(self, "_gspmd_mesh", None) is not None

    def _a0_zero(self) -> bool:
        """Forest rendering of DenseMGSolver._a0_zero: the kernels see
        identity-coefficient planes (b_const None), but ghost(0) is 0
        whenever the PHYSICAL boundary values are 0 — rb ghosts of the
        zero field interpolate the zero coarse strip, wraps copy 0."""
        for spec in self.bc_spec:
            if spec["fn"] is not None or float(spec["value"]) != 0.0:
                return False
        return True


    def _kcfg(self, lvl: int) -> dk.DenseStencilConfig:
        """Every face is a precomputed ghost plane with identity
        coefficients: the plane carries the already-synthesized ghost
        values (phys/rb/wrap per 2D segment), refreshed between
        half-sweeps by the driver."""
        t = self.tree
        idr2 = tuple(float(x) for x in 1.0 / t.dr[self._lvl_of(lvl)] ** 2)
        return dk.DenseStencilConfig(
            dims=self.dims[lvl], idr2=idr2,
            bc=[(1.0, 0.0, 0.0)] * 6,
            periodic=(False, False, False), dtype=self.cfg.dtype,
            b_const=[None] * 6, interpret=self.interpret,
            n_eps=self.n_eps,
            # coefficient-field ghosts are pre-synthesized like phi's:
            # identity face coefficients consume the assembled eps
            # planes (variable-coefficient forests ride the jnp path)
            eps_bc=([(1.0, 0.0, 0.0)] * 6 if self.n_eps else None))

    def _sync_pads(self, arr, lvl):
        # periodic wraps ride the face planes / wrap segments; the pads
        # stay garbage-by-contract
        return arr

    def cell_centers(self, lvl: int) -> np.ndarray:
        """Canvas cell centers [Z, Y, X, 3] in global coordinates
        (non-footprint cells get coordinates too — harmless)."""
        t = self.tree
        X, Y, Z = self.dims[lvl]
        dr = t.dr[self._lvl_of(lvl)]
        off = self.offsets[lvl]
        out = np.zeros((Z, Y, X, 3))
        for d, sl in ((0, (None, None, slice(None))),
                      (1, (None, slice(None), None)),
                      (2, (slice(None), None, None))):
            c = t.r_min[d] + (off[d] + np.arange(self.dims[lvl][d]) + 0.5) \
                * dr[d]
            out[..., d] = c[sl]
        return out

    def footprint_mask(self, lvl: int) -> np.ndarray:
        """Boolean [Z, Y, X] mask of real (leaf-footprint) cells."""
        X, Y, Z = self.dims[lvl]
        m = np.zeros((Z, Y, X), dtype=bool)
        for lo, hi in self.geom[lvl].rects:
            m[lo[2]:hi[2], lo[1]:hi[1], lo[0]:hi[0]] = True
        return m

    def set_interior(self, state, lvl, key, values):
        """Coefficient fields get their garbage (non-footprint) cells
        pinned to 1.0: zero eps there would make the garbage harmonic
        means 0/0 = NaN, and NaN garbage survives footprint masking
        (NaN*0 = NaN) in downstream reductions.  Footprint values pass
        through untouched — phase parity is unaffected (the kernels'
        eps reads at footprint cells see footprint or ring values
        only)."""
        if key.startswith("eps"):
            values = jnp.where(jnp.asarray(self.footprint_mask(lvl)),
                               values, jnp.ones((), self.cfg.dtype))
        return super().set_interior(state, lvl, key, values)

    def _eval_bc_planes(self, lvl: int) -> List[jnp.ndarray]:
        """RAW boundary values b per face, unpadded [face shape] (zeros
        off the physical segments); the ghost synthesis happens in the
        traced plane assembly."""
        t = self.tree
        X, Y, Z = self.dims[lvl]
        dr = t.dr[self._lvl_of(lvl)]
        r0g = t.r_min
        off = self.offsets[lvl]
        dt = self.cfg.dtype
        cx = r0g[0] + (off[0] + np.arange(X) + 0.5) * dr[0]
        cy = r0g[1] + (off[1] + np.arange(Y) + 0.5) * dr[1]
        cz = r0g[2] + (off[2] + np.arange(Z) + 0.5) * dr[2]
        lo_face = [r0g[d] + off[d] * dr[d] for d in range(3)]
        hi_face = [r0g[d] + (off[d] + self.dims[lvl][d]) * dr[d]
                   for d in range(3)]
        out = []
        for nbd in range(6):
            d = nbd // 2
            shape = {(0): (Z, Y), 1: (Z, X), 2: (Y, X)}[d]
            spec = self.bc_spec[nbd]
            if spec["fn"] is None:
                vals = np.full(shape, spec["value"], dtype=np.float64)
            else:
                coords = np.zeros(shape + (3,))
                if d == 0:
                    coords[..., 0] = lo_face[0] if nbd % 2 == 0 else hi_face[0]
                    coords[..., 1] = cy[None, :]
                    coords[..., 2] = cz[:, None]
                elif d == 1:
                    coords[..., 1] = lo_face[1] if nbd % 2 == 0 else hi_face[1]
                    coords[..., 0] = cx[None, :]
                    coords[..., 2] = cz[:, None]
                else:
                    coords[..., 2] = lo_face[2] if nbd % 2 == 0 else hi_face[2]
                    coords[..., 0] = cx[None, :]
                    coords[..., 1] = cy[:, None]
                vals = np.asarray(spec["fn"](coords))
            out.append(jnp.asarray(vals, dt))
        return out

    # ------------------------------------------------------------------
    # ghost machinery (traced)
    # ------------------------------------------------------------------
    def _cansl(self, lo, hi):
        """Padded-canvas slice of a canvas-local cell rectangle."""
        return (slice(dk.PZ + int(lo[2]), dk.PZ + int(hi[2])),
                slice(dk.PY + int(lo[1]), dk.PY + int(hi[1])),
                slice(int(lo[0]), int(hi[0])))

    def _seg_x12(self, canvas, seg):
        """(x1, x2) interior planes adjacent to a ghost segment (2D,
        squeezed along the normal)."""
        d = seg.nb // 2
        step = 1 if seg.nb % 2 == 0 else -1  # towards the footprint
        lo1 = seg.lo.copy()
        hi1 = seg.hi.copy()
        lo1[d] += step
        hi1[d] += step
        lo2 = lo1.copy()
        hi2 = hi1.copy()
        lo2[d] += step
        hi2[d] += step
        ax = 2 - d
        x1 = jnp.squeeze(canvas[self._cansl(lo1, hi1)], axis=ax)
        x2 = jnp.squeeze(canvas[self._cansl(lo2, hi2)], axis=ax)
        return x1, x2

    def _rb_cache(self, state, lvl, key) -> Dict[int, jnp.ndarray]:
        """Memoized coarse-side interpolation planes (see
        :func:`_dep_memo`; deps: every coarser canvas of this variable
        plus the raw bc planes)."""
        if not any(se.kind == "rb" for se in self.segs[lvl]):
            return {}
        deps = tuple(v for u, v in state[key].items()
                     if self._lvl_of(u) < self._lvl_of(lvl)) \
            + tuple(pp for ps in state["bc"].values() for pp in ps)
        return _dep_memo(self, "_rbc_memo", (lvl, key), deps,
                         lambda: self._rb_cache_build(state, lvl, key))

    def _rb_cache_build(self, state, lvl, key) -> Dict[int, jnp.ndarray]:
        """Coarse-side interpolation planes b per rb segment
        (box_gc_for_fine_neighbor: strip + ±0.125 transverse gradients,
        m_ghost_cells.f90:500-577).  Constant while the coarse level is
        frozen — computed once per phase."""
        segs = [s for s in self.segs[lvl] if s.kind == "rb"]
        if not segs:
            return {}
        uc = self._coarse_of(lvl)
        bc_c = self._rb_cache(state, uc, key)
        # ±1 transverse strip reads are per-axis ghost reads of the
        # coarse neighbor box (m_ghost_cells.f90:557-576); at conflicted
        # ring cells only the axis-preferenced ext carries the right
        # value for that read direction.
        # The strips are extracted WITHOUT materializing the [N+2]^3
        # ext (its unaligned layout measured 5.8 ms at a 128^3 coarse
        # canvas — the dominant per-phase cost of the whole forest
        # path): _ext_strip slices the ring-written ALIGNED canvas and
        # fills out-of-canvas border lines from the face planes,
        # value-identical by construction (same _assemble products).
        need = self.conflicts.get(uc) is not None
        if need:
            asm_ax = {a: self._assemble(state, uc, key, bcache=bc_c,
                                        prefer=a)[:2] for a in range(3)}
            asm = asm_ax[0]
        else:
            asm_ax = None
            asm = self._assemble(state, uc, key, bcache=bc_c)[:2]
        off_c = self.offsets[uc]
        off_f = self.offsets[lvl]
        out = {}
        for i, seg in enumerate(self.segs[lvl]):
            if seg.kind != "rb":
                continue
            d = seg.nb // 2
            sl: List = [0, 0, 0]
            # normal: global coarse layer -> ext index (+1 ghost ring)
            sl[2 - d] = seg.cg - int(off_c[d]) + 1
            for dd in range(3):
                if dd == d:
                    continue
                c0 = (int(off_f[dd]) + int(seg.lo[dd])) // 2 - int(off_c[dd])
                c1 = (int(off_f[dd]) + int(seg.hi[dd])) // 2 - int(off_c[dd])
                sl[2 - dd] = slice(c0, c1 + 2)  # ext coords: ±1 ring
            tmp = self._ext_strip(asm, uc, tuple(sl))  # [t_hi+2, t_lo+2]
            if need:
                t_lo, t_hi = [dd for dd in range(3) if dd != d]
                e_hi = self._ext_strip(asm_ax[t_hi], uc, tuple(sl))
                e_lo = self._ext_strip(asm_ax[t_lo], uc, tuple(sl))
                tmp = tmp.at[0, :].set(e_hi[0, :]).at[-1, :].set(
                    e_hi[-1, :])
                tmp = tmp.at[:, 0].set(e_lo[:, 0]).at[:, -1].set(
                    e_lo[:, -1])
            # pinned replicated under GSPMD: the strip interleave
            # miscompiles when a consumer's sharding back-propagates
            # into it (Dense2DMGSolver._pin_repl, measured)
            out[i] = self._pin_repl(
                interp_rb_strip(self._pin_repl(tmp)[None], 3)[0])
        return out

    def _ext_strip(self, asm, lvl, sl):
        """ext[sl] (one int index + two slices, array z,y,x order)
        WITHOUT materializing the [N+2]^3 ext — value-identical to
        ``self._ext(...)[sl]``: interior positions slice the
        ring-written ALIGNED padded canvas; out-of-canvas border lines
        come from the assembled face planes with _ext's exact index
        arithmetic; corner positions (two border coords) stay zero,
        as in the ext (never written there)."""
        canvas, planes = asm
        N = [int(self.dims[lvl][2]), int(self.dims[lvl][1]),
             int(self.dims[lvl][0])]              # array-axis extents
        pads = (dk.PZ, dk.PY, 0)
        axes = [a for a in range(3) if isinstance(sl[a], slice)]
        a1, a2 = axes
        A0 = [a for a in range(3) if a not in axes][0]
        n = int(sl[A0])                           # interior ext layer
        s1, s2 = sl[a1], sl[a2]
        T1 = s1.stop - s1.start
        T2 = s2.stop - s2.start
        tmp = jnp.zeros((T1, T2), self.cfg.dtype)
        r0, r1 = max(s1.start, 1), min(s1.stop, N[a1] + 1)
        c0, c1 = max(s2.start, 1), min(s2.stop, N[a2] + 1)
        if r0 < r1 and c0 < c1:
            isl: List = [0, 0, 0]
            isl[A0] = pads[A0] + (n - 1)
            isl[a1] = slice(pads[a1] + r0 - 1, pads[a1] + r1 - 1)
            isl[a2] = slice(pads[a2] + c0 - 1, pads[a2] + c1 - 1)
            tmp = tmp.at[r0 - s1.start:r1 - s1.start,
                         c0 - s2.start:c1 - s2.start].set(
                canvas[tuple(isl)])

        def border(axis_b, e_coord):
            side = 0 if e_coord == 0 else 1
            p = planes[2 * (2 - axis_b) + side]
            idx = []
            for a in range(3):
                if a == axis_b:
                    continue
                padp = pads[a]
                if a == A0:
                    idx.append(padp + (n - 1))
                elif a == a1:
                    idx.append(slice(padp + r0 - 1, padp + r1 - 1))
                else:
                    idx.append(slice(padp + c0 - 1, padp + c1 - 1))
            return p[tuple(idx)]

        if s1.start == 0:
            tmp = tmp.at[0, c0 - s2.start:c1 - s2.start].set(
                border(a1, 0))
        if s1.stop == N[a1] + 2:
            tmp = tmp.at[-1, c0 - s2.start:c1 - s2.start].set(
                border(a1, N[a1] + 1))
        if s2.start == 0:
            tmp = tmp.at[r0 - s1.start:r1 - s1.start, 0].set(
                border(a2, 0))
        if s2.stop == N[a2] + 2:
            tmp = tmp.at[r0 - s1.start:r1 - s1.start, -1].set(
                border(a2, N[a2] + 1))
        return tmp

    def _ext_window(self, asm, lvl, sl3):
        """ext[sl3] (three slices) without materializing the ext —
        value-identical to ``self._ext(...)[sl3]`` (the 3D-window form
        of :meth:`_ext_strip`): the interior block is ONE aligned slice
        of the ring-written padded canvas; window faces at ext borders
        come from the assembled face planes; edge/corner positions
        (two+ border coords) stay zero, as in the ext."""
        canvas, planes = asm
        N = [int(self.dims[lvl][2]), int(self.dims[lvl][1]),
             int(self.dims[lvl][0])]
        pads = (dk.PZ, dk.PY, 0)
        T = [s.stop - s.start for s in sl3]
        lo = [max(s.start, 1) for s in sl3]
        hi = [min(s.stop, N[a] + 1) for a, s in enumerate(sl3)]
        tmp = jnp.zeros(tuple(T), self.cfg.dtype)
        core = canvas[tuple(
            slice(pads[a] + lo[a] - 1, pads[a] + hi[a] - 1)
            for a in range(3))]
        tmp = tmp.at[tuple(
            slice(lo[a] - sl3[a].start, hi[a] - sl3[a].start)
            for a in range(3))].set(core)
        for axis_b in range(3):
            others = [a for a in range(3) if a != axis_b]
            for side, e_coord in ((0, 0), (1, N[axis_b] + 1)):
                if side == 0 and sl3[axis_b].start != 0:
                    continue
                if side == 1 and sl3[axis_b].stop != N[axis_b] + 2:
                    continue
                p = planes[2 * (2 - axis_b) + side]
                psl = tuple(slice(pads[a] + lo[a] - 1,
                                  pads[a] + hi[a] - 1) for a in others)
                osl: List = [0, 0, 0]
                osl[axis_b] = 0 if side == 0 else T[axis_b] - 1
                for a in others:
                    osl[a] = slice(lo[a] - sl3[a].start,
                                   hi[a] - sl3[a].start)
                tmp = tmp.at[tuple(osl)].set(p[psl])
        return tmp

    def _ring_values(self, canvas, bplanes_raw, bcache, lvl, key="phi"
                     ) -> Dict[int, jnp.ndarray]:
        """Synthesized ghost values per ring segment (3D, seg-rect
        shaped), computed from the pre-sweep canvas.  Kept separate from
        the canvas write so concave-corner conflicts (two axes claiming
        one garbage cell — impossible in the reference's per-box ghost
        storage) can be resolved exactly by the fix-up passes.

        key: coefficient fields (eps*) take Neumann-zero physical
        ghosts (= own value, m_vlaplacian.f90:25-28) but the same
        sides_rb refinement faces and periodic wraps as phi."""
        bc_phys = self._ring_bc(lvl, key)
        is_eps = key.startswith("eps")
        out = {}
        for i, seg in enumerate(self.segs[lvl]):
            if seg.sink != "ring":
                continue
            d = seg.nb // 2
            ax = 2 - d
            if seg.kind == "wrap":
                lo = seg.lo.copy()
                hi = seg.hi.copy()
                lo[d] = seg.src
                hi[d] = seg.src + 1
                vals = canvas[self._cansl(lo, hi)]
            else:
                x1, x2 = self._seg_x12(canvas, seg)
                if seg.kind == "rb":
                    c0, c1, c2 = RB_COEFFS
                    b = bcache[i]
                elif is_eps:
                    # ghost = own value: 1.0*x1, bitwise the boxed copy
                    out[i] = jnp.expand_dims(1.0 * x1, ax)
                    continue
                else:
                    c0, c1, c2 = bc_phys[seg.nb]
                    b = self._seg_bwin(bplanes_raw, seg)
                vals = c0 * b + c1 * x1
                if c2 != 0.0:
                    vals = vals + c2 * x2
                vals = jnp.expand_dims(vals, ax)
            out[i] = vals
        return out

    def _write_ring(self, canvas, vals, lvl, prefer: Optional[int] = None):
        """Write the ring ghost values into the canvas (refreshed before
        every half-sweep — the reference refills ghosts after every
        substep, m_multigrid.f90:412-423).

        prefer: optional axis whose segments are written LAST, so at
        conflicted cells the canvas carries that axis's ghost (used by
        consumers that read ghosts along one known axis)."""
        items = [(i, s) for i, s in enumerate(self.segs[lvl])
                 if s.sink == "ring"]
        if prefer is not None:
            items.sort(key=lambda t: t[1].nb // 2 == prefer)
        for i, seg in items:
            canvas = canvas.at[self._cansl(seg.lo, seg.hi)].set(vals[i])
        return canvas

    def _seg_bwin(self, bplanes_raw, seg):
        """Window of the raw physical boundary-value plane for a seg."""
        d = seg.nb // 2
        tdims = [dd for dd in range(3) if dd != d]
        sl = []
        for dd in reversed(tdims):  # slow -> fast plane axes
            sl.append(slice(int(seg.lo[dd]), int(seg.hi[dd])))
        return bplanes_raw[seg.nb][tuple(sl)]

    # ------------------------------------------------------------------
    # concave-corner conflict fix-ups
    # ------------------------------------------------------------------
    def _plane_win(self, planes, dd, lo, hi):
        """Window of an assembled (padded) face plane over a rect's
        transverse extent, expanded to 3D [z, y, x] with normal size 1.
        The bulk pass reads these cells as ghost = 1.0*plane + 0.0*x1,
        which is bitwise the plane value."""
        d = dd // 2
        if d == 0:
            w = planes[dd][dk.PZ + int(lo[2]):dk.PZ + int(hi[2]),
                           dk.PY + int(lo[1]):dk.PY + int(hi[1])]
            return w[:, :, None]
        if d == 1:
            w = planes[dd][dk.PZ + int(lo[2]):dk.PZ + int(hi[2]),
                           int(lo[0]):int(hi[0])]
            return w[:, None, :]
        w = planes[dd][dk.PY + int(lo[1]):dk.PY + int(hi[1]),
                       int(lo[0]):int(hi[0])]
        return w[None, :, :]

    def _nb_vals(self, lvl, canvas, vals, planes, dd, ent):
        """Direction-dd neighbor values of a fix rect: canvas cells,
        with ring segments serving THIS direction overlaid (correct
        regardless of which axis won the canvas write), and face-plane
        values for the out-of-canvas layer."""
        d = dd // 2
        ax = 2 - d
        vin = None
        ilo, ihi = ent["ilo"], ent["ihi"]
        if np.all(ilo < ihi):
            vin = canvas[self._cansl(ilo, ihi)]
            for i, olo, ohi in ent["overlays"]:
                seg = self.segs[lvl][i]
                src = vals[i][
                    slice(int(olo[2] - seg.lo[2]), int(ohi[2] - seg.lo[2])),
                    slice(int(olo[1] - seg.lo[1]), int(ohi[1] - seg.lo[1])),
                    slice(int(olo[0] - seg.lo[0]), int(ohi[0] - seg.lo[0]))]
                dst = (slice(int(olo[2] - ilo[2]), int(ohi[2] - ilo[2])),
                       slice(int(olo[1] - ilo[1]), int(ohi[1] - ilo[1])),
                       slice(int(olo[0] - ilo[0]), int(ohi[0] - ilo[0])))
                vin = vin.at[dst].set(src)
        if ent["out_side"] is None:
            return vin
        vout = self._plane_win(planes, dd, ent["nlo"], ent["nhi"])
        if vin is None:
            return vout
        if ent["out_side"] == "lo":
            return jnp.concatenate([vout, vin], axis=ax)
        return jnp.concatenate([vin, vout], axis=ax)

    def _fix_nbrs(self, lvl, canvas, vals, planes, easm, d, fix):
        """Direction-d (lo, hi) neighbor value pairs of a fix rect for
        phi and, when coefficient fields are present, for the relevant
        eps field — same read order as dense_kernels._halfsweep (eps
        neighbors first, m_vlaplacian.f90:84-100)."""
        cfg = self._kcfgs[lvl]
        e_pair = None
        if cfg.n_eps:
            ec, epl, ev = easm[0 if cfg.n_eps == 1 else d]
            e_pair = (self._nb_vals(lvl, ec, ev, epl, 2 * d,
                                    fix.dirs[2 * d]),
                      self._nb_vals(lvl, ec, ev, epl, 2 * d + 1,
                                    fix.dirs[2 * d + 1]))
        p_pair = (self._nb_vals(lvl, canvas, vals, planes, 2 * d,
                                fix.dirs[2 * d]),
                  self._nb_vals(lvl, canvas, vals, planes, 2 * d + 1,
                                fix.dirs[2 * d + 1]))
        return p_pair, e_pair

    def _fix_sweep(self, lvl, swept, canvas, vals, planes, rhs, lam,
                   parity, easm=()):
        """Recompute the GSRB update on the conflict rects with correct
        ghosts — same expression tree as dense_kernels._halfsweep, so
        the result is bitwise the conflict-free value."""
        cfg = self._kcfgs[lvl]
        for fix in self.conflicts[lvl]:
            rsl = self._cansl(fix.lo, fix.hi)
            if cfg.n_eps:
                num = -rhs[rsl]
                den = lam
                for d in range(3):
                    e0 = easm[0 if cfg.n_eps == 1 else d][0][rsl]
                    (plo, phi_), (elo, ehi) = self._fix_nbrs(
                        lvl, canvas, vals, planes, easm, d, fix)
                    c = 2.0 * e0 * elo / (e0 + elo) * cfg.idr2[d]
                    num = num + c * plo
                    den = den + c
                    c = 2.0 * e0 * ehi / (e0 + ehi) * cfg.idr2[d]
                    num = num + c * phi_
                    den = den + c
                new = num / den
            else:
                acc = -rhs[rsl]
                for d in range(3):
                    (lo_v, hi_v), _ = self._fix_nbrs(
                        lvl, canvas, vals, planes, easm, d, fix)
                    acc = acc + cfg.idr2[d] * (lo_v + hi_v)
                new = acc * (1.0 / (cfg.den0 + lam))
            upd = fix.upd0 if parity == 0 else ~fix.upd0
            swept = swept.at[rsl].set(
                jnp.where(jnp.asarray(upd), new, swept[rsl]))
        return swept

    def _fix_apply(self, lvl, out, canvas, vals, planes, rhs, lam,
                   residual, easm=()):
        """Recompute A(phi) (or rhs - A(phi)) on the conflict rects —
        same expression tree as dense_kernels._apply_expr."""
        cfg = self._kcfgs[lvl]
        for fix in self.conflicts[lvl]:
            rsl = self._cansl(fix.lo, fix.hi)
            p = canvas[rsl]
            o = -lam * p
            for d in range(3):
                (lo_v, hi_v), e_pair = self._fix_nbrs(
                    lvl, canvas, vals, planes, easm, d, fix)
                if cfg.n_eps:
                    e0 = easm[0 if cfg.n_eps == 1 else d][0][rsl]
                    elo, ehi = e_pair
                    c = 2.0 * e0 * elo / (e0 + elo) * cfg.idr2[d]
                    o = o + c * (lo_v - p)
                    c = 2.0 * e0 * ehi / (e0 + ehi) * cfg.idr2[d]
                    o = o + c * (hi_v - p)
                else:
                    o = o + cfg.idr2[d] * (lo_v + hi_v - 2.0 * p)
            if residual:
                o = rhs[rsl] - o
            out = out.at[rsl].set(o)
        return out

    # ------------------------------------------------------------------
    # GSPMD overlay formulation (sharded execution; see shard_state)
    # ------------------------------------------------------------------
    def _dir_neighbors_gspmd(self, lvl, canvas, vals, masks, bpw,
                             eps_field=False):
        """Per-dim (lo, hi) neighbor arrays: rolls of the RAW padded
        canvas with inline face-plane synthesis (identity coefficients
        via dk._neighbor_ops masks) and each direction's ring-ghost
        values OVERLAID at the cells they serve — the 3D rendering of
        DenseForest2DMGSolver._dir_neighbors.  Direction d's reads see
        d-axis ghosts by construction (per-box ghost storage semantics,
        m_ghost_cells.f90:232-285), so no conflict fix-ups are needed."""
        cfg = self._kcfgs[lvl]
        out = []
        for d, axis in ((0, 2), (1, 1), (2, 0)):
            if eps_field:
                lo, hi = dk._eps_neighbor_ops(cfg, canvas, d, axis,
                                              masks, True, bpw)
            else:
                lo, hi = dk._neighbor_ops(cfg, canvas, d, axis, masks,
                                          bpw, True)
            for i, seg in enumerate(self.segs[lvl]):
                if seg.sink != "ring" or seg.nb // 2 != d:
                    continue
                step = 1 if seg.nb % 2 == 0 else -1
                lo_r, hi_r = seg.lo.copy(), seg.hi.copy()
                lo_r[d] += step
                hi_r[d] += step
                sl = self._cansl(lo_r, hi_r)
                if seg.nb % 2 == 0:
                    lo = lo.at[sl].set(vals[i])
                else:
                    hi = hi.at[sl].set(vals[i])
            out.append((lo, hi))
        return out

    def _phi_nbrs_gspmd(self, state, lvl, canvas, bcache, masks):
        """(nbrs, vals) for phi from the raw canvas (one half-sweep's
        worth — recomputed per half-sweep, the reference's refill
        cadence)."""
        raw = state["bc"][lvl]
        vals = {i: self._pin_repl(v) for i, v in
                self._ring_values(canvas, raw, bcache, lvl).items()}
        planes = [self._pin_repl(p) for p in
                  self._face_planes(canvas, raw, bcache, lvl)]
        bpw = dk._bpw_full(self._kcfgs[lvl], planes)
        return self._dir_neighbors_gspmd(lvl, canvas, vals, masks, bpw)

    def _eps_nbrs_gspmd(self, state, lvl, masks):
        """Per coefficient field: (raw canvas, per-dim neighbor pairs)
        — frozen across a phase, computed once (the eps ghosts ride the
        same ring/face synthesis as phi with Neumann-zero physical
        faces)."""
        cfg = self._kcfgs[lvl]
        raw = state["bc"][lvl]
        out = []
        for i in range(self.n_eps):
            key = f"eps{i}"
            bcache = self._rb_cache(state, lvl, key)
            ec = state[key][lvl]
            evals = {j: self._pin_repl(v) for j, v in
                     self._ring_values(ec, raw, bcache, lvl, key).items()}
            epl = [self._pin_repl(p) for p in
                   self._face_planes(ec, raw, bcache, lvl, key)]
            ebpw = dk._bpw_eps_full([epl])[0]
            out.append((ec, self._dir_neighbors_gspmd(
                lvl, ec, evals, masks, ebpw, eps_field=True)))
        return out

    def _smooth_gspmd(self, state, lvl, n_cycle, lam):
        """GSRB half-sweeps in the overlay formulation — same per-cell
        expression tree as dense_kernels._halfsweep (+ the conflict
        fix-ups the overlays subsume), so footprint cells match the
        single-device path."""
        cfg = self._kcfgs[lvl]
        g = dk._full_iotas(cfg)
        masks = dk._face_masks(cfg, g)
        bcache = self._rb_cache(state, lvl, "phi")
        canvas = state["phi"][lvl]
        rhs = state["rhs"][lvl]
        easm = self._eps_nbrs_gspmd(state, lvl, masks)
        for n in range(2 * n_cycle):
            nbrs = self._phi_nbrs_gspmd(state, lvl, canvas, bcache,
                                        masks)
            upd = dk._parity_mask(g, n % 2)
            if cfg.n_eps:
                num = -rhs
                den = lam
                for d in range(3):
                    e0, enb = easm[0 if cfg.n_eps == 1 else d]
                    elo, ehi = enb[d]
                    plo, phi_ = nbrs[d]
                    c = 2.0 * e0 * elo / (e0 + elo) * cfg.idr2[d]
                    num = num + c * plo
                    den = den + c
                    c = 2.0 * e0 * ehi / (e0 + ehi) * cfg.idr2[d]
                    num = num + c * phi_
                    den = den + c
                new = num / den
            else:
                acc = -rhs
                for d in range(3):
                    lo, hi = nbrs[d]
                    acc = acc + cfg.idr2[d] * (lo + hi)
                new = acc * (1.0 / (cfg.den0 + lam))
            canvas = jnp.where(upd, new, canvas)
        return self._set(state, "phi", lvl, canvas)

    def _apply_gspmd(self, state, lvl, lam, residual):
        """A(phi) / rhs - A(phi) in the overlay formulation (same
        expression tree as dense_kernels._apply_expr)."""
        cfg = self._kcfgs[lvl]
        g = dk._full_iotas(cfg)
        masks = dk._face_masks(cfg, g)
        bcache = self._rb_cache(state, lvl, "phi")
        canvas = state["phi"][lvl]
        nbrs = self._phi_nbrs_gspmd(state, lvl, canvas, bcache, masks)
        out = -lam * canvas
        if cfg.n_eps:
            easm = self._eps_nbrs_gspmd(state, lvl, masks)
            for d in range(3):
                e0, enb = easm[0 if cfg.n_eps == 1 else d]
                elo, ehi = enb[d]
                plo, phi_ = nbrs[d]
                c = 2.0 * e0 * elo / (e0 + elo) * cfg.idr2[d]
                out = out + c * (plo - canvas)
                c = 2.0 * e0 * ehi / (e0 + ehi) * cfg.idr2[d]
                out = out + c * (phi_ - canvas)
        else:
            for d in range(3):
                lo, hi = nbrs[d]
                out = out + cfg.idr2[d] * (lo + hi - 2.0 * canvas)
        return state["rhs"][lvl] - out if residual else out

    def _face_planes(self, canvas, bplanes_raw, bcache, lvl, key="phi"):
        """Assemble the six ghost planes consumed by the kernels with
        (1,0,0) coefficients.  Uncovered positions stay zero (they abut
        garbage cells only)."""
        X, Y, Z = self.dims[lvl]
        dt = self.cfg.dtype
        shapes = [(Z, Y), (Z, Y), (Z, X), (Z, X), (Y, X), (Y, X)]
        planes = [jnp.zeros(s, dt) for s in shapes]
        bc_phys = self._ring_bc(lvl, key)
        is_eps = key.startswith("eps")
        for i, seg in enumerate(self.segs[lvl]):
            if seg.sink != "face":
                continue
            d = seg.nb // 2
            if seg.kind == "wrap":
                lo = seg.lo.copy()
                hi = seg.hi.copy()
                lo[d] = seg.src
                hi[d] = seg.src + 1
                vals = jnp.squeeze(canvas[self._cansl(lo, hi)], axis=2 - d)
            else:
                x1, x2 = self._seg_x12(canvas, seg)
                if seg.kind == "rb":
                    c0, c1, c2 = RB_COEFFS
                    b = bcache[i]
                elif is_eps:
                    c0, c1, c2, b = 0.0, 1.0, 0.0, None
                else:
                    c0, c1, c2 = bc_phys[seg.nb]
                    b = self._seg_bwin(bplanes_raw, seg)
                vals = 1.0 * x1 if b is None else c0 * b + c1 * x1
                if c2 != 0.0:
                    vals = vals + c2 * x2
            tdims = [dd for dd in range(3) if dd != d]
            sl = tuple(slice(int(seg.lo[dd]), int(seg.hi[dd]))
                       for dd in reversed(tdims))
            planes[seg.nb] = planes[seg.nb].at[sl].set(vals)
        # pad to the kernel plane layouts
        pads = [((dk.PZ, dk.PZ), (dk.PY, dk.PY)),
                ((dk.PZ, dk.PZ), (dk.PY, dk.PY)),
                ((dk.PZ, dk.PZ), (0, 0)), ((dk.PZ, dk.PZ), (0, 0)),
                ((dk.PY, dk.PY), (0, 0)), ((dk.PY, dk.PY), (0, 0))]
        return [jnp.pad(p, pd) for p, pd in zip(planes, pads)]

    def _assemble(self, state, lvl, key, bcache=None, prefer=None):
        """(canvas_with_fresh_ring, face_planes, ring_vals) for one
        variable.

        All variables synthesize with phi's BC data: the reference saves
        iold = phi INCLUDING ghosts (update_coarse, m_multigrid.f90:
        369-383), so the corr-ring ghosts of iold are phi-BC ghosts of
        the saved field — recomputing them from the frozen coarse chain
        yields the same values (the dense_amr solver relies on the same
        identity)."""
        if bcache is None:
            bcache = self._rb_cache(state, lvl, key)
        canvas = state[key][lvl]
        raw = state["bc"][lvl]
        vals = self._ring_values(canvas, raw, bcache, lvl, key)
        canvas = self._write_ring(canvas, vals, lvl, prefer)
        planes = self._face_planes(canvas, raw, bcache, lvl, key)
        return canvas, planes, vals

    def _eps_assemble(self, state, lvl):
        """Per coefficient field (eps0..): (ringed canvas, face planes,
        ring values) — frozen across a phase, so computed once.  The
        ringed canvases feed the kernels' eps rolls; the planes feed the
        identity-coefficient eps_bc synthesis; the ring values serve the
        concave-corner fix-ups."""
        return [self._assemble(state, lvl, f"eps{i}")
                for i in range(self.n_eps)]

    def _ext(self, state, lvl, key, bcache=None, prefer=None):
        """[Z+2, Y+2, X+2] canvas with ALL ghosts materialized: interior
        + in-canvas ring values + the one-cell outer ring from the face
        planes.  The generalization of _var_with_ring to forests."""
        canvas, planes, _ = self._assemble(state, lvl, key, bcache,
                                           prefer)
        X, Y, Z = self.dims[lvl]
        out = jnp.zeros((Z + 2, Y + 2, X + 2), self.cfg.dtype)
        out = out.at[(slice(1, -1),) * 3].set(canvas[_ISL])
        # outer ring faces from the assembled planes (strip kernel pads)
        PZ, PY = dk.PZ, dk.PY
        xs = [p[PZ:PZ + Z, PY:PY + Y] for p in planes[0:2]]
        ys = [p[PZ:PZ + Z, :] for p in planes[2:4]]
        zs = [p[PY:PY + Y, :] for p in planes[4:6]]
        out = out.at[1:-1, 1:-1, 0].set(xs[0])
        out = out.at[1:-1, 1:-1, -1].set(xs[1])
        out = out.at[1:-1, 0, 1:-1].set(ys[0])
        out = out.at[1:-1, -1, 1:-1].set(ys[1])
        out = out.at[0, 1:-1, 1:-1].set(zs[0])
        out = out.at[-1, 1:-1, 1:-1].set(zs[1])
        return out

    def _var_with_ring(self, state, lvl, key):
        return self._ext(state, lvl, key)

    def _var_with_ring_axes(self, state, lvl, key):
        """Per-axis ringed exports for the coupling layer: the face-d
        ghosts of an exported leaf must carry axis-d values at
        conflicted concave-corner cells (per-box ghost storage
        semantics).  Conflict-free levels return one array thrice."""
        if self.conflicts.get(lvl) is None:
            e = self._ext(state, lvl, key)
            return (e, e, e)
        return tuple(self._ext(state, lvl, key, prefer=a)
                     for a in range(3))

    # ------------------------------------------------------------------
    # cycle building blocks
    # ------------------------------------------------------------------
    # ------------------------------------------------------------------
    # fused-canvas smoother: in-kernel ring/face ghost synthesis
    # (round-5: breaks the per-half-sweep ghost-cadence wall)
    # ------------------------------------------------------------------
    def _seg_kcfg(self, lvl):
        """Kernel config for the segment-synthesis (fused-canvas) path:
        all uniform boundary machinery off (periodic=True makes every
        _face_masks entry None), ghosts come exclusively from the
        reader-indexed segment planes.  None when the canvas cannot
        ride the Mosaic path (alignment) or tz % 8 fails (y/x-axis
        plane windows need 8-aligned sublane loads)."""
        memo = self.__dict__.setdefault("_seg_kcfg_memo", {})
        if lvl in memo:
            return memo[lvl]
        t = self.tree
        idr2 = tuple(float(x) for x in
                     1.0 / t.dr[self._lvl_of(lvl)] ** 2)
        c2 = dk.DenseStencilConfig(
            dims=self.dims[lvl], idr2=idr2, bc=[(1.0, 0.0, 0.0)] * 6,
            periodic=(True, True, True), dtype=self.cfg.dtype,
            b_const=[0.0] * 6, tile=(16, 32), interpret=self.interpret,
            n_eps=0)
        memo[lvl] = c2 if (c2.use_kernel and c2.tz % 8 == 0) else None
        return memo[lvl]

    def _seg_desc(self, lvl):
        """(descriptors, groups) for the fused-canvas kernels, or None
        outside the gate: constant coefficients, Mosaic-eligible canvas,
        no periodic wrap segments (their sources are not in-window), and
        a bounded VMEM-resident plane budget.

        descriptors: sorted (d, c, side) ghost layers — d the normal
        dim, c the canvas coordinate of the 1-thick ghost layer (-1/N
        for canvas faces), side 0 = ghost below its footprint run
        (seg.nb even).  groups maps each descriptor to the contributing
        segment indices (disjoint transverse rects)."""
        memo = self.__dict__.setdefault("_seg_desc_memo", {})
        if lvl in memo:
            return memo[lvl]
        out = None
        if (getattr(self, "seg_fused", True) and self.n_eps == 0
                and self._seg_kcfg(lvl) is not None):
            groups: Optional[Dict] = {}
            for i, seg in enumerate(self.segs[lvl]):
                if seg.kind == "wrap":
                    groups = None
                    break
                d = seg.nb // 2
                c = int(seg.lo[d])
                side = 0 if seg.nb % 2 == 0 else 1
                groups.setdefault((d, c, side), []).append(i)
            if groups is not None:
                X, Y, Z = (int(v) for v in self.dims[lvl])
                sizes = {2: (Y + 2 * dk.PY) * X,
                         1: (Z + 2 * dk.PZ) * X,
                         0: (Z + 2 * dk.PZ) * (Y + 2 * dk.PY)}
                nbytes = sum(4 * sizes[d] * 4 for (d, c, s) in groups)
                if nbytes <= 24 * 1024 * 1024:
                    out = (tuple(sorted(groups)),
                           {k: tuple(v) for k, v in groups.items()})
        memo[lvl] = out
        return out

    def _seg_planes(self, state, lvl, bcache):
        """[4, T1, T2] coefficient planes per descriptor: A0 = c0*b
        (rb: 0.5 * coarse-interp; phys: c0 * raw boundary values), A1 =
        c1, A2 = c2, M = 1 at covered transverse positions — the same
        products/operand order as _ring_values/_face_planes, so the
        in-kernel synthesis (a0 + a1*x1) + a2*x2 is value-identical."""
        descs, groups = self._seg_desc(lvl)
        X, Y, Z = (int(v) for v in self.dims[lvl])
        dt = self.cfg.dtype
        shapes = {2: (Y + 2 * dk.PY, X), 1: (Z + 2 * dk.PZ, X),
                  0: (Z + 2 * dk.PZ, Y + 2 * dk.PY)}
        bc_phys = self._ring_bc(lvl, "phi")
        raw = state["bc"][lvl]
        out = []
        for key in descs:
            d, c, side = key
            a = jnp.zeros((4,) + shapes[d], dt)
            for i in groups[key]:
                seg = self.segs[lvl][i]
                if seg.kind == "rb":
                    c0, c1, c2 = RB_COEFFS
                    b = bcache[i]
                else:
                    c0, c1, c2 = bc_phys[seg.nb]
                    b = self._seg_bwin(raw, seg)
                if d == 2:
                    sl = (slice(dk.PY + int(seg.lo[1]),
                                dk.PY + int(seg.hi[1])),
                          slice(int(seg.lo[0]), int(seg.hi[0])))
                elif d == 1:
                    sl = (slice(dk.PZ + int(seg.lo[2]),
                                dk.PZ + int(seg.hi[2])),
                          slice(int(seg.lo[0]), int(seg.hi[0])))
                else:
                    sl = (slice(dk.PZ + int(seg.lo[2]),
                                dk.PZ + int(seg.hi[2])),
                          slice(dk.PY + int(seg.lo[1]),
                                dk.PY + int(seg.hi[1])))
                a = a.at[(0,) + sl].set(c0 * b)
                a = a.at[(1,) + sl].set(c1)
                a = a.at[(2,) + sl].set(c2)
                a = a.at[(3,) + sl].set(1.0)
            out.append(a)
        return out

    def _seg_data(self, state, lvl):
        """Memoized (descs, seg planes) — same deps as _rb_cache plus
        this level's raw bc planes (the A0 channel carries c0*b)."""
        descs, _ = self._seg_desc(lvl)
        deps = tuple(v for u, v in state["phi"].items()
                     if self._lvl_of(u) < self._lvl_of(lvl)) \
            + tuple(pp for ps in state["bc"].values() for pp in ps)
        planes = _dep_memo(
            self, "_segp_memo", lvl, deps,
            lambda: self._seg_planes(state, lvl,
                                     self._rb_cache(state, lvl, "phi")))
        return descs, planes

    def _smooth_seg(self, state, lvl, n_cycle, lam):
        """Fused-canvas GSRB: red+black pairs (up to two per HBM pass)
        with rb/phys ghosts synthesized INSIDE the kernel from in-window
        data — the mid-pair refresh is therefore EXACT (the b parts are
        constant during a level visit; x1/x2 are red-updated in-window,
        the ops/pair_sweep recipe), unlike the measured-negative stale
        "pair" cadence.  Value-identical to the sequential
        half-sweep+refresh path (tests/test_dense_forest.py)."""
        cfg = self._seg_kcfg(lvl)
        descs, planes = self._seg_data(state, lvl)
        canvas = state["phi"][lvl]
        rhs = state["rhs"][lvl]
        done = 0
        while done < n_cycle:
            k = min(n_cycle - done, dk.PZ // 2)
            canvas = dk.pair_sweep_dense(cfg, canvas, rhs, lam,
                                         [None] * 6, red_parity=0,
                                         n_pairs=k, segs=descs,
                                         seg_planes=planes)
            done += k
        return self._set(state, "phi", lvl, canvas)

    def _smooth(self, state, lvl, n_cycle, lam):
        """n_cycle GSRB iterations at half-sweep granularity with ring
        and face-plane refreshes between half-sweeps (smooth_boxes,
        m_multigrid.f90:404-424; red parity 0 first, as the dense
        path)."""
        if self._gspmd:
            return self._smooth_gspmd(state, lvl, n_cycle, lam)
        if self._seg_desc(lvl) is not None:
            return self._smooth_seg(state, lvl, n_cycle, lam)
        if getattr(self, "ghost_refresh", "half") == "pair":
            return self._smooth_pairs(state, lvl, n_cycle, lam)
        cfg = self._kcfgs[lvl]
        bcache = self._rb_cache(state, lvl, "phi")
        raw = state["bc"][lvl]
        canvas = state["phi"][lvl]
        rhs = state["rhs"][lvl]
        plan = self.conflicts.get(lvl)
        easm = self._eps_assemble(state, lvl)
        eps = tuple(a[0] for a in easm)
        epl = [a[1] for a in easm] if easm else None
        for n in range(2 * n_cycle):
            vals = self._ring_values(canvas, raw, bcache, lvl)
            ringed = self._write_ring(canvas, vals, lvl)
            planes = self._face_planes(ringed, raw, bcache, lvl)
            canvas = dk.half_sweep_dense(cfg, ringed, rhs, lam, planes,
                                         parity=n % 2, eps=eps,
                                         eps_planes=epl)
            if plan:
                canvas = self._fix_sweep(lvl, canvas, ringed, vals,
                                         planes, rhs, lam, n % 2, easm)
        return self._set(state, "phi", lvl, canvas)

    def _smooth_pairs(self, state, lvl, n_cycle, lam):
        """Relaxed-cadence smoother: ring/face ghosts refresh once per
        red+black PAIR instead of per half-sweep, so each pair runs as
        ONE fused Mosaic kernel pass (pair_sweep_dense) on eligible
        canvases.  NOT bitwise vs the boxed path — the black half sees
        ghosts one half-sweep stale at patch boundaries — but a valid
        smoother (MG contraction degrades marginally; measured in
        probe_refine_forest_perf).  Enabled via ``ghost_refresh =
        "pair"``; the refined driver uses it for the INNER solve, where
        the outer double-float residual defines correctness and the
        inner FMG is a preconditioner."""
        cfg = self._kcfgs[lvl]
        bcache = self._rb_cache(state, lvl, "phi")
        raw = state["bc"][lvl]
        canvas = state["phi"][lvl]
        rhs = state["rhs"][lvl]
        easm = self._eps_assemble(state, lvl)
        eps = tuple(a[0] for a in easm)
        epl = [a[1] for a in easm] if easm else None
        for n in range(n_cycle):
            vals = self._ring_values(canvas, raw, bcache, lvl)
            ringed = self._write_ring(canvas, vals, lvl)
            planes = self._face_planes(ringed, raw, bcache, lvl)
            canvas = dk.pair_sweep_dense(cfg, ringed, rhs, lam, planes,
                                         red_parity=0, n_pairs=1,
                                         eps=eps, eps_planes=epl)
        return self._set(state, "phi", lvl, canvas)

    def _residual(self, state, lvl, lam):
        if self._gspmd:
            return self._set(state, "ires", lvl,
                             self._apply_gspmd(state, lvl, lam, True))
        if self._seg_desc(lvl) is not None:
            cfg = self._seg_kcfg(lvl)
            descs, planes = self._seg_data(state, lvl)
            ires = dk.stencil_apply_dense(
                cfg, state["phi"][lvl], state["rhs"][lvl], lam,
                [None] * 6, residual=True, segs=descs,
                seg_planes=planes)
            return self._set(state, "ires", lvl, ires)
        cfg = self._kcfgs[lvl]
        canvas, planes, vals = self._assemble(state, lvl, "phi")
        easm = self._eps_assemble(state, lvl)
        ires = dk.stencil_apply_dense(
            cfg, canvas, state["rhs"][lvl], lam, planes, residual=True,
            eps=tuple(a[0] for a in easm),
            eps_planes=[a[1] for a in easm] if easm else None)
        if self.conflicts.get(lvl):
            ires = self._fix_apply(lvl, ires, canvas, vals, planes,
                                   state["rhs"][lvl], lam, True, easm)
        return self._set(state, "ires", lvl, ires)

    def _apply_op(self, state, lvl, lam):
        if self._gspmd:
            return self._apply_gspmd(state, lvl, lam, False)
        if self._seg_desc(lvl) is not None:
            cfg = self._seg_kcfg(lvl)
            descs, planes = self._seg_data(state, lvl)
            return dk.stencil_apply_dense(
                cfg, state["phi"][lvl], state["rhs"][lvl], lam,
                [None] * 6, residual=False, segs=descs,
                seg_planes=planes)
        cfg = self._kcfgs[lvl]
        canvas, planes, vals = self._assemble(state, lvl, "phi")
        easm = self._eps_assemble(state, lvl)
        out = dk.stencil_apply_dense(
            cfg, canvas, state["rhs"][lvl], lam, planes, residual=False,
            eps=tuple(a[0] for a in easm),
            eps_planes=[a[1] for a in easm] if easm else None)
        if self.conflicts.get(lvl):
            out = self._fix_apply(lvl, out, canvas, vals, planes,
                                  state["rhs"][lvl], lam, False, easm)
        return out

    def _max_residual(self, state, lvl, lam):
        """Max |res| over the FOOTPRINT cells only (garbage cells carry
        meaningless residuals)."""
        state = self._residual(state, lvl, lam)
        r = state["ires"][lvl]
        m = jnp.asarray(0.0, self.cfg.dtype)
        for lo, hi in self.geom[lvl].rects:
            m = jnp.maximum(m, jnp.max(jnp.abs(r[self._cansl(lo, hi)])))
        return state, m

    def _transfer_ok(self, lvl: int) -> bool:
        return False

    def _fused_transfer_ok(self, lvl: int) -> bool:
        return False

    def _image_rects(self, lvl):
        """Fine footprint rectangles mapped into the coarse canvas
        (canvas-local coarse cells)."""
        off_f = self.offsets[lvl]
        off_c = self.offsets[self._coarse_of(lvl)]
        out = []
        for lo, hi in self.geom[lvl].rects:
            clo = (off_f + lo) // 2 - off_c
            chi = (off_f + hi) // 2 - off_c
            out.append((clo, chi))
        return out

    def _restrict_into(self, state, lvl, key):
        """Full-weighting restriction of the footprint into its coarse
        image rectangles (restrict_onto on parents,
        m_restrict.f90:165-214)."""
        fine = state[key][lvl]
        cfg = self._kcfgs[lvl]
        half = tuple(v // 2 for v in cfg.dims)
        if (cfg.use_kernel and not self._gspmd
                and dk.transfer_tiles(half) is not None):
            avg = dk.restrict_dense(cfg, fine)[_ISL]
        else:
            win = (2, 2, 2)
            avg = jax.lax.reduce_window(
                fine[_ISL], jnp.zeros((), fine.dtype), jax.lax.add,
                win, win, "VALID") / 8.0
        uc = self._coarse_of(lvl)
        coarse = state[key][uc]
        for (lo, hi), (clo, chi) in zip(self.geom[lvl].rects,
                                        self._image_rects(lvl)):
            win = (slice(int(lo[2]) // 2, int(hi[2]) // 2),
                   slice(int(lo[1]) // 2, int(hi[1]) // 2),
                   slice(int(lo[0]) // 2, int(hi[0]) // 2))
            coarse = coarse.at[self._cansl(clo, chi)].set(avg[win])
        return self._set(state, key, uc, coarse)

    def _finish_coarse_rhs(self, state, lvl, lam):
        """rhs_c = A(phi_c) + restrict(res) on the image rectangles only
        (parents, m_multigrid.f90:369-383); iold_c = phi_c."""
        a_phi = self._apply_op(state, lvl - 1, lam)
        rhs_c = state["rhs"][lvl - 1]
        for clo, chi in self._image_rects(lvl):
            sl = self._cansl(clo, chi)
            rhs_c = rhs_c.at[sl].set(a_phi[sl]
                                     + state["ires"][lvl - 1][sl])
        state = self._set(state, "rhs", lvl - 1, rhs_c)
        state = self._set(state, "iold", lvl - 1, state["phi"][lvl - 1])
        return state

    def _correct_children(self, state, lvl_c, lam):
        """phi_fine += prolong(phi_c - iold_c) over the fine canvas's
        coarse image + one ghost ring (correct_children,
        m_multigrid.f90:387-402; ring = ghost(phi) - ghost(iold), both
        from the full ghost machinery)."""
        return self._correct_unit(state, lvl_c, lvl_c + 1, lam)

    def _correct_unit(self, state, lvl_c, lvl, lam):
        """One (coarse unit, fine unit) correction pair."""
        off_f = self.offsets[lvl]
        off_c = self.offsets[lvl_c]
        lo = (off_f // 2) - off_c           # image lo, coarse local
        ext_dims = np.asarray(self.dims[lvl])[::-1] // 2  # (z, y, x)
        sl = tuple(slice(int(lo[d]), int(lo[d]) + int(ext_dims[2 - d]) + 2)
                   for d in (2, 1, 0))
        # window extraction without materializing full exts (the
        # unaligned [N+2]^3 layout is the measured forest wall — see
        # _ext_strip); values identical per construction
        if self.conflicts.get(lvl_c) is None:
            ap = self._assemble(state, lvl_c, "phi")[:2]
            ai = self._assemble(state, lvl_c, "iold")[:2]
            sub = (self._ext_window(ap, lvl_c, sl)
                   - self._ext_window(ai, lvl_c, sl))
        else:
            # the prolongation's border-plane reads are per-axis ghost
            # reads of the parent boxes (mg_prolong_sparse uses face
            # neighbors only, m_prolong.f90:159-240); take each border
            # plane from the axis-preferenced ext pair
            bc_p = self._rb_cache(state, lvl_c, "phi")
            bc_i = self._rb_cache(state, lvl_c, "iold")
            corr_ax = {a: (self._ext_window(
                self._assemble(state, lvl_c, "phi", bcache=bc_p,
                               prefer=a)[:2], lvl_c, sl)
                - self._ext_window(
                    self._assemble(state, lvl_c, "iold", bcache=bc_i,
                                   prefer=a)[:2], lvl_c, sl))
                for a in range(3)}
            sub = corr_ax[0]
            for axis, a in ((0, 2), (1, 1), (2, 0)):
                s2 = corr_ax[a]
                idx0 = (slice(None),) * axis + (0,)
                idx1 = (slice(None),) * axis + (-1,)
                sub = sub.at[idx0].set(s2[idx0]).at[idx1].set(s2[idx1])
        phi = self._prolong_add(sub, state["phi"][lvl])
        return self._set(state, "phi", lvl, phi)

    def _prolong_add(self, sub, phi_f):
        """phi_f += prolong(sub) — through the fused Mosaic kernel's
        corr_ready mode on eligible canvases (sub's ±1 ring rides the
        kernel's identity face planes: the window ring IS the window's
        six faces), the XLA interleave otherwise.  Bitwise: the kernel
        carries the same mg_prolong_sparse accumulation order
        (transfer-kernel parity, tests/test_ops.py)."""
        Zs, Ys, Xs = (int(v) - 2 for v in sub.shape)
        dims_w = (Xs, Ys, Zs)
        tiles = dk.transfer_tiles(dims_w)
        ok = (not self._gspmd
              and tiles is not None and tiles[0] % 8 == 0
              and (2 * Xs) % 128 == 0 and Ys % dk.PY == 0
              and (self.interpret
                   or np.dtype(self.cfg.dtype).itemsize <= 4))
        if not ok:
            return phi_f.at[_ISL].add(self._prolong_rect(sub))
        cfg_w = dk.DenseStencilConfig(
            dims=dims_w, idr2=(1.0, 1.0, 1.0),
            bc=[(1.0, 0.0, 0.0)] * 6, periodic=(False,) * 3,
            dtype=self.cfg.dtype, b_const=[None] * 6,
            interpret=self.interpret)
        dt = self.cfg.dtype
        cp = jnp.zeros(dk.padded_shape(dims_w), dt).at[_ISL].set(
            sub[1:-1, 1:-1, 1:-1])
        PZ, PY = dk.PZ, dk.PY
        planes = []
        for nb, face in enumerate((
                sub[1:-1, 1:-1, 0], sub[1:-1, 1:-1, -1],   # x faces
                sub[1:-1, 0, 1:-1], sub[1:-1, -1, 1:-1],   # y faces
                sub[0, 1:-1, 1:-1], sub[-1, 1:-1, 1:-1])):  # z faces
            if nb < 2:
                p = jnp.zeros((Zs + 2 * PZ, Ys + 2 * PY), dt)
                p = p.at[PZ:PZ + Zs, PY:PY + Ys].set(face)
            elif nb < 4:
                p = jnp.zeros((Zs + 2 * PZ, Xs), dt)
                p = p.at[PZ:PZ + Zs, :].set(face)
            else:
                p = jnp.zeros((Ys + 2 * PY, Xs), dt)
                p = p.at[PY:PY + Ys, :].set(face)
            planes.append(p)
        return dk.prolong_correct_dense(cfg_w, cp, cp, phi_f, planes,
                                        corr_ready=True)

    def _prolong_rect(self, sub):
        """D-linear prolongation; under GSPMD the z interleave uses a
        strided scatter like y/x (the parent's stack+reshape on the
        leading axis is the measured GSPMD interleave-miscompile
        family; strided scatters partition correctly — the dense2d
        prolongation ships them sharded at 1e-12)."""
        if not self._gspmd:
            return super()._prolong_rect(sub)
        w0 = 0.25
        ctr = sub[1:-1, 1:-1, 1:-1]

        def shifted(d, s):
            sl = [slice(1, -1)] * 3
            ax = 2 - d
            sl[ax] = slice(1 + s, sub.shape[ax] - 1 + s)
            return sub[tuple(sl)]

        f0 = w0 * ctr
        lo = [0.25 * shifted(d, -1) for d in range(3)]
        hi = [0.25 * shifted(d, +1) for d in range(3)]
        vals = {0: f0}
        for d in range(3):
            new = {}
            for key, a in vals.items():
                new[key] = a + lo[d]
                new[key | (1 << d)] = a + hi[d]
            vals = new

        def interleave(a, b, d):
            ax = 2 - d
            shape = list(a.shape)
            shape[ax] *= 2
            out = jnp.zeros(shape, a.dtype)
            losl = [slice(None)] * 3
            hisl = [slice(None)] * 3
            losl[ax] = slice(0, None, 2)
            hisl[ax] = slice(1, None, 2)
            return out.at[tuple(losl)].set(a).at[tuple(hisl)].set(b)

        def build(d_hi, bits):
            if d_hi < 0:
                return vals[bits]
            return interleave(build(d_hi - 1, bits),
                              build(d_hi - 1, bits | (1 << d_hi)), d_hi)

        return build(2, 0)

    # -- subtract mean (fully periodic forests) -------------------------
    def _subtract_mean(self, state, key):
        """Leaf-weighted global mean over levels >= 1, removed from all
        levels (subtract_mean, m_multigrid.f90:245-294).  Leaf cells at
        lvl = footprint minus the finer level's image."""
        t = self.tree
        total = jnp.asarray(0.0, self.cfg.dtype)
        for lvl in [l for l in self.levels if l >= 1]:
            w = float(np.prod(t.dr[lvl]))
            arr = state[key][lvl]
            s = jnp.asarray(0.0, self.cfg.dtype)
            for lo, hi in self.geom[lvl].rects:
                s = s + jnp.sum(arr[self._cansl(lo, hi)])
            if lvl + 1 in self.levels:
                for clo, chi in self._image_rects(lvl + 1):
                    s = s - jnp.sum(arr[self._cansl(clo, chi)])
            total = total + w * s
        volume = float(np.prod(t.domain_size_lvl[1])
                       * np.prod(t.dr[1]))
        mean = total / volume
        for lvl in self.levels:
            state = self._set(state, key, lvl, state[key][lvl] - mean)
        return state

    # ------------------------------------------------------------------
    # direct coarse solve plumbing
    # ------------------------------------------------------------------
    def _build_direct(self, state=None):
        """The coarsest cycled level is gated to be a full-domain
        uniform canvas; probe its operator through the forest apply so
        BC synthesis (incl. periodic wraps via planes) is captured.
        Variable-coefficient operators pass ``state`` so the probe sees
        the restricted coarse-level eps values (the matrix depends on
        them — the base class's _build_direct_probe contract)."""
        lvl = self._unit0(self.levels[0])
        ishape = self._ishape(lvl)
        m = int(np.prod(ishape))
        dt = self.cfg.dtype
        zeros = jnp.zeros(self._pshape(self.dims[lvl]), dt)
        lam0 = jnp.asarray(0.0, dt)
        isl = self._isl
        bcraw = self._eval_bc_planes(lvl)
        state0 = {"phi": {lvl: zeros}, "rhs": {lvl: zeros},
                  "bc": {lvl: bcraw}}
        for i in range(self.n_eps):
            e = (state[f"eps{i}"][lvl] if state is not None
                 else jnp.ones_like(zeros))
            state0[f"eps{i}"] = {lvl: e}

        def apply_flat(v):
            st = dict(state0)
            st["phi"] = {lvl: zeros.at[isl].set(v.reshape(ishape))}
            out = self._apply_op(st, lvl, lam0)
            return out[isl].reshape(-1)

        cols = jax.jit(jax.vmap(apply_flat))(jnp.eye(m, dtype=dt))
        a0 = apply_flat(jnp.zeros(m, dt))
        A = (np.asarray(cols, np.float64).T
             - np.asarray(a0, np.float64)[:, None])
        return self._eigen_package(A)

    def _build_direct_probe(self, state):
        return self._build_direct(state)
