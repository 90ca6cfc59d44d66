"""Dense-forest FAS multigrid in 2D: ARBITRARY quadtree forests on the
dense 2D fast path.

2D counterpart of :class:`DenseForestMGSolver` (solve/dense_forest.py)
on the pure-XLA [Y, X] machinery (ops/dense2d.py): each refinement
level is ONE dense canvas over the bounding box of its leaf footprint;
cells outside the footprint are garbage by contract, fenced off by a
one-cell ghost ring rewritten before every half-sweep.  Ghost values —
refinement-boundary (sides_rb: 0.5*interp + 0.75*x1 - 0.25*x2,
m_ghost_cells.f90:769-861), physical (bc_to_gc: c0*b + c1*x1 + c2*x2,
:665-766) and periodic wraps — are rectangle writes into the canvas;
ghosts on the canvas boundary assemble into the four face vectors the
2D kernels consume with identity coefficients (1, 0, 0).

The sweep/apply neighbor reads are rolls of the RAW state canvas with
each direction's ring ghost values OVERLAID onto the neighbor arrays at
the cells they serve (_dir_neighbors) — never rolls of a ghost-written
canvas.  This resolves concave-corner conflicts (ring segments of both
axes claiming one garbage cell — impossible in the reference's per-box
ghost storage) exactly, since direction d's reads see d-axis ghosts by
construction, and it keeps the rolls on cleanly-sharded inputs: under
GSPMD y-slab placement, rolling a scatter output miscompiles at shard
boundaries (measured, jax 0.9.0 CPU — the dense_amr2d strip bug's
family), while this formulation distributes correctly
(tests/test_dense_forest2d.py::test_forest2d_gspmd_sharded_matches_single).
Ring ghosts are still written into the canvas for the one-ring exports
(_ext: coarse strips, coupling).

Smoothing runs at HALF-SWEEP granularity with ring/face refreshes
between half-sweeps — the reference's per-substep refill cadence
(smooth_boxes, m_multigrid.f90:404-424) — so every phase is
bit-identical to the boxed solver (tests/test_dense_forest2d.py).
Periodic exteriors are supported.  Gating
(``dense_forest2d_supported``): 2D cartesian operators (all five
families) or the cylindrical (r, z) laplacian (box_clpl radial face
weights at the canvas column offset, m_laplacian.f90:197-271), GSRB,
2:1-balanced forest, footprint filling >= min_fill of each canvas.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.tree import Tree
from ..ops import dense2d as d2
from ..ops.ghost import interp_rb_strip
from .dense_amr import RB_COEFFS
from .dense_forest import _Seg, _forest_balanced
from .dense2d import Dense2DMGSolver
from .multigrid import MGConfig


# ---------------------------------------------------------------------------
# host-side geometry
# ---------------------------------------------------------------------------

def _runs_1d(mask: np.ndarray) -> List[Tuple[int, int]]:
    """Maximal True runs of a 1D boolean mask, half-open."""
    out = []
    i = 0
    n = len(mask)
    while i < n:
        if not mask[i]:
            i += 1
            continue
        j = i
        while j + 1 < n and mask[j + 1]:
            j += 1
        out.append((i, j + 1))
        i = j + 1
    return out


def _greedy_rects_2d(occ: np.ndarray) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Greedy decomposition of a 2D boolean occupancy [BX, BY] into
    rectangles ((x0, y0), (x1, y1)), half-open."""
    m = occ.copy()
    out = []
    while m.any():
        x, y = np.argwhere(m)[0]
        x1 = x
        while x1 + 1 < m.shape[0] and m[x1 + 1, y]:
            x1 += 1
        y1 = y
        while y1 + 1 < m.shape[1] and m[x:x1 + 1, y1 + 1].all():
            y1 += 1
        out.append((np.array([x, y]), np.array([x1 + 1, y1 + 1])))
        m[x:x1 + 1, y:y1 + 1] = False
    return out


class _LevelGeom2D:
    """Canvas geometry of one refinement level (2D)."""

    def __init__(self, tree: Tree, lvl: int, ids=None):
        self.lvl = lvl
        self.nc = nc = tree.box_size_lvl[lvl]
        ids = tree.lvls[lvl].ids if ids is None else np.asarray(ids)
        self.ids = ids
        ix = tree.ix[ids][:, :2] - 1             # [n, 2] 0-based box coords
        self.box_lo = ix.min(axis=0)
        box_hi = ix.max(axis=0) + 1
        self.B = box_hi - self.box_lo            # canvas extent, box units
        self.off = self.box_lo * nc              # cell offset (x, y)
        self.dims = tuple(int(v) for v in self.B * nc)
        self.dom_box = tree.domain_size_lvl[lvl][:2] // nc
        self.dom_cells = np.asarray(tree.domain_size_lvl[lvl][:2])
        occ = np.zeros(tuple(self.B), dtype=bool)
        loc = ix - self.box_lo
        occ[loc[:, 0], loc[:, 1]] = True
        self.occ = occ
        self.full = bool(occ.all() and np.all(self.B == self.dom_box))
        self.rects = [(lo * nc, hi * nc) for lo, hi in _greedy_rects_2d(occ)]
        self.n_cells = int(occ.sum()) * nc ** 2

    def build_segments(self, periodic) -> List[_Seg]:
        """Classify and merge the footprint's ghost faces (the 2D form
        of DenseForestMGSolver's segment builder: same kinds, 1D
        transverse runs instead of 2D mask rectangles)."""
        segs: List[_Seg] = []
        nc = self.nc
        occ = self.occ
        B = self.B
        dom = self.dom_box
        for nb in range(4):
            d = nb // 2
            sgn = -1 if nb % 2 == 0 else +1
            td = 1 - d
            groups: Dict[Tuple, np.ndarray] = {}
            for p in np.argwhere(occ):
                q = p.copy()
                q[d] += sgn
                qg = q + self.box_lo
                inside_canvas = 0 <= q[d] < B[d]
                if inside_canvas and occ[tuple(q)]:
                    continue
                if 0 <= qg[d] < dom[d]:
                    kind = "rb"
                elif periodic[d]:
                    qw = qg.copy()
                    qw[d] %= dom[d]
                    ql = qw - self.box_lo
                    if (0 <= ql[d] < B[d]) and occ[tuple(ql)]:
                        kind = "wrap"
                    else:
                        kind = "rb"
                else:
                    kind = "phys"
                key = (kind, int(q[d]))
                groups.setdefault(key, np.zeros(int(B[td]), dtype=bool))[
                    int(p[td])] = True
            for (kind, qd), mask in groups.items():
                inside = 0 <= qd < B[d]
                if inside:
                    sink = "ring"
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
                for t0, t1 in _runs_1d(mask):
                    lo = np.zeros(2, np.int64)
                    hi = np.zeros(2, np.int64)
                    lo[d], hi[d] = g, g + 1
                    lo[td], hi[td] = t0 * nc, t1 * nc
                    segs.append(_Seg(nb=nb, kind=kind, sink=sink,
                                     lo=lo, hi=hi, src=src, cg=cg))
        return segs


def _has_ring_conflicts(segs: List[_Seg]) -> bool:
    """Whether any two ring segments claim a common canvas cell (the
    concave-corner case that needs per-axis canvases)."""
    ring = [s for s in segs if s.sink == "ring"]
    for a in range(len(ring)):
        for b in range(a + 1, len(ring)):
            lo = np.maximum(ring[a].lo, ring[b].lo)
            hi = np.minimum(ring[a].hi, ring[b].hi)
            if np.all(lo < hi):
                return True
    return False


def dense_forest2d_supported(tree: Tree, cfg: MGConfig,
                             min_fill: float = 0.2) -> bool:
    """Whether the 2D dense-forest path covers this configuration."""
    ok_op = (cfg.operator in ("laplacian", "helmholtz", "vlaplacian",
                              "vhelmholtz", "ahelmholtz")
             and cfg.geometry == "cartesian") \
        or (cfg.operator == "laplacian"
            and cfg.geometry == "cylindrical")
    if not (tree.ndim == 2
            and tree.highest_lvl > 1
            and ok_op
            and cfg.smoother in ("gsrb", "gs")):
        return False
    if not _forest_balanced(tree):
        return False
    for lvl in range(tree.lowest_lvl, tree.highest_lvl + 1):
        if len(tree.lvls[lvl].ids) == 0:
            return False
        g = _LevelGeom2D(tree, lvl)
        if g.n_cells < min_fill * int(np.prod(g.dims)):
            return False
    return True


# ---------------------------------------------------------------------------
# solver
# ---------------------------------------------------------------------------

class DenseForest2DMGSolver(Dense2DMGSolver):
    """FAS multigrid on dense 2D level canvases over arbitrary forests."""

    _supported = staticmethod(dense_forest2d_supported)

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------
    def _build_levels(self):
        t = self.tree
        all_lvls = list(range(t.lowest_lvl, t.highest_lvl + 1))
        self.geom: Dict[int, _LevelGeom2D] = {
            lvl: _LevelGeom2D(t, lvl) for lvl in all_lvls}
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
        self.conflicted: Dict[int, bool] = {
            lvl: _has_ring_conflicts(self.segs[lvl])
            for lvl in self.levels}

    def _kcfg(self, lvl: int) -> d2.Dense2DConfig:
        """Every face is a precomputed ghost vector with identity
        coefficients — the vector carries the already-synthesized ghost
        values (phys/rb/wrap per segment), refreshed per half-sweep."""
        t = self.tree
        idr2 = tuple(float(x)
                     for x in 1.0 / t.dr[self._lvl_of(lvl)] ** 2)
        cyl_w = None
        if self.cfg.geometry == "cylindrical":
            cyl_w = self._cyl_weights(lvl)
        return d2.Dense2DConfig(
            dims=self.dims[lvl], idr2=idr2, bc=[(1.0, 0.0, 0.0)] * 4,
            periodic=(False, False), dtype=self.cfg.dtype,
            b_const=[None] * 4, n_eps=self.n_eps, cyl_w=cyl_w)

    def _a0_zero(self) -> bool:
        """Forest rendering of DenseMGSolver._a0_zero (the kernels see
        identity planes, b_const None): ghost(0) is 0 whenever the
        PHYSICAL boundary values are 0 (see DenseForestMGSolver)."""
        for spec in self.bc_spec:
            if spec["fn"] is not None or float(spec["value"]) != 0.0:
                return False
        return True

    def _cyl_weights(self, lvl: int):
        """Radial face weights on the CANVAS columns: global radii at
        canvas offset off_x (box_clpl, m_laplacian.f90:209-212; the
        dense2d uniform weights shifted by the canvas origin)."""
        t = self.tree
        X = self.dims[lvl][0]
        off = int(self.offsets[lvl][0])
        dr0 = float(t.dr[self._lvl_of(lvl)][0])
        rmin = float(t.r_min[0])
        i = np.arange(1 + off, X + off + 1)
        r_face = rmin + dr0 * (i - 1)
        r_face_hi = rmin + dr0 * i
        r_inv = 1.0 / (rmin + dr0 * (i - 0.5))
        dt = np.dtype(self.cfg.dtype)
        return ((r_face * r_inv)[None, :].astype(dt),
                (r_face_hi * r_inv)[None, :].astype(dt))

    def cell_centers(self, lvl: int) -> np.ndarray:
        """Canvas cell centers [Y, X, 2] in global coordinates."""
        t = self.tree
        X, Y = self.dims[lvl]
        dr = t.dr[self._lvl_of(lvl)]
        off = self.offsets[lvl]
        out = np.zeros((Y, X, 2))
        out[..., 0] = (t.r_min[0] + (off[0] + np.arange(X) + 0.5)
                       * dr[0])[None, :]
        out[..., 1] = (t.r_min[1] + (off[1] + np.arange(Y) + 0.5)
                       * dr[1])[:, None]
        return out

    def footprint_mask(self, lvl: int) -> np.ndarray:
        """Boolean [Y, X] mask of real (leaf-footprint) cells."""
        X, Y = self.dims[lvl]
        m = np.zeros((Y, X), dtype=bool)
        for lo, hi in self.geom[lvl].rects:
            m[lo[1]:hi[1], lo[0]:hi[0]] = True
        return m

    def set_interior(self, state, lvl, key, values):
        """Coefficient fields get their garbage (non-footprint) cells
        pinned to 1.0 — zero eps there makes the garbage harmonic means
        0/0 = NaN, and NaN garbage survives footprint masking (NaN*0 =
        NaN).  Footprint values pass through untouched (see
        DenseForestMGSolver.set_interior)."""
        if key.startswith("eps"):
            values = jnp.where(jnp.asarray(self.footprint_mask(lvl)),
                               values, jnp.ones((), self.cfg.dtype))
        return super().set_interior(state, lvl, key, values)

    def _eval_bc_planes(self, lvl: int) -> List[jnp.ndarray]:
        """RAW boundary values b per face, full face extent (zeros off
        the physical segments); ghost synthesis happens traced."""
        t = self.tree
        X, Y = self.dims[lvl]
        dr = t.dr[self._lvl_of(lvl)]
        r0g = t.r_min
        off = self.offsets[lvl]
        dt = self.cfg.dtype
        cx = r0g[0] + (off[0] + np.arange(X) + 0.5) * dr[0]
        cy = r0g[1] + (off[1] + np.arange(Y) + 0.5) * dr[1]
        lo_face = [r0g[d] + off[d] * dr[d] for d in range(2)]
        hi_face = [r0g[d] + (off[d] + self.dims[lvl][d]) * dr[d]
                   for d in range(2)]
        out = []
        for nbd in range(4):
            d = nbd // 2
            n_t = Y if d == 0 else X
            spec = self.bc_spec[nbd]
            if spec["fn"] is None:
                vals = np.full(n_t, spec["value"], dtype=np.float64)
            else:
                coords = np.zeros((n_t, 2))
                if d == 0:
                    coords[:, 0] = (lo_face[0] if nbd % 2 == 0
                                    else hi_face[0])
                    coords[:, 1] = cy
                else:
                    coords[:, 1] = (lo_face[1] if nbd % 2 == 0
                                    else hi_face[1])
                    coords[:, 0] = cx
                vals = np.asarray(spec["fn"](coords))
            out.append(jnp.asarray(vals, dt))
        return out

    # ------------------------------------------------------------------
    # ghost machinery (traced)
    # ------------------------------------------------------------------
    def _cansl(self, lo, hi):
        return (slice(int(lo[1]), int(hi[1])), slice(int(lo[0]), int(hi[0])))

    def _seg_x12(self, canvas, seg):
        """(x1, x2) interior lines adjacent to a ghost segment (1D,
        squeezed along the normal)."""
        d = seg.nb // 2
        step = 1 if seg.nb % 2 == 0 else -1  # towards the footprint
        lo1, hi1 = seg.lo.copy(), seg.hi.copy()
        lo1[d] += step
        hi1[d] += step
        lo2, hi2 = lo1.copy(), hi1.copy()
        lo2[d] += step
        hi2[d] += step
        ax = 1 - d
        x1 = jnp.squeeze(canvas[self._cansl(lo1, hi1)], axis=ax)
        x2 = jnp.squeeze(canvas[self._cansl(lo2, hi2)], axis=ax)
        return x1, x2

    def _rb_cache(self, state, lvl, key) -> Dict[int, jnp.ndarray]:
        """Memoized (see dense_forest._dep_memo) coarse-side
        interpolation vectors."""
        from .dense_forest import _dep_memo
        if not any(se.kind == "rb" for se in self.segs[lvl]):
            return {}
        deps = tuple(v for u, v in state[key].items()
                     if self._lvl_of(u) < self._lvl_of(lvl)) \
            + tuple(pp for ps in state["bc"].values() for pp in ps)
        return _dep_memo(self, "_rbc_memo", (lvl, key), deps,
                         lambda: self._rb_cache_build(state, lvl, key))

    def _rb_cache_build(self, state, lvl, key) -> Dict[int, jnp.ndarray]:
        """Coarse-side interpolation vectors b per rb segment
        (box_gc_for_fine_neighbor: strip + ±0.125 transverse gradient,
        m_ghost_cells.f90:500-576, 2D form :545-555)."""
        segs_rb = [s for s in self.segs[lvl] if s.kind == "rb"]
        if not segs_rb:
            return {}
        uc = self._coarse_of(lvl)
        bc_c = self._rb_cache(state, uc, key)
        if self.conflicted.get(uc):
            # the strip's ±1 endpoint reads are transverse-axis ghost
            # reads of the coarse neighbor (m_ghost_cells.f90:545-555)
            ext_ax = {a: self._ext(state, uc, key, bcache=bc_c,
                                   prefer=a) for a in range(2)}
            ext = ext_ax[0]
        else:
            ext_ax = None
            ext = self._ext(state, uc, key, bcache=bc_c)
        off_c = self.offsets[uc]
        off_f = self.offsets[lvl]
        out = {}
        for i, seg in enumerate(self.segs[lvl]):
            if seg.kind != "rb":
                continue
            d = seg.nb // 2
            td = 1 - d
            sl: List = [0, 0]
            sl[1 - d] = seg.cg - int(off_c[d]) + 1
            c0 = (int(off_f[td]) + int(seg.lo[td])) // 2 - int(off_c[td])
            c1 = (int(off_f[td]) + int(seg.hi[td])) // 2 - int(off_c[td])
            sl[1 - td] = slice(c0, c1 + 2)
            tmp = ext[tuple(sl)]             # [tc + 2] coarse strip
            if ext_ax is not None:
                e = ext_ax[td][tuple(sl)]
                tmp = tmp.at[0].set(e[0]).at[-1].set(e[-1])
            # _pin_repl: keep the strip chain replicated under GSPMD
            # (the partitioner miscompiles the interleave when a
            # consumer's y-sharding back-propagates into it — see
            # Dense2DMGSolver._pin_repl)
            out[i] = self._pin_repl(
                interp_rb_strip(self._pin_repl(tmp)[None], 2)[0])
        return out

    def _ring_values(self, canvas, bplanes_raw, bcache, lvl, key="phi"
                     ) -> Dict[int, jnp.ndarray]:
        """Synthesized ghost values per ring segment, from the pre-sweep
        canvas.  Coefficient fields (eps*) take Neumann-zero physical
        ghosts (= own value, m_vlaplacian.f90:25-28) but the same
        sides_rb refinement faces and periodic wraps as phi."""
        bc_phys = self._ring_bc(lvl, key)
        is_eps = key.startswith("eps")
        out = {}
        for i, seg in enumerate(self.segs[lvl]):
            if seg.sink != "ring":
                continue
            d = seg.nb // 2
            ax = 1 - d
            if seg.kind == "wrap":
                lo, hi = seg.lo.copy(), seg.hi.copy()
                lo[d] = seg.src
                hi[d] = seg.src + 1
                vals = canvas[self._cansl(lo, hi)]
            else:
                x1, x2 = self._seg_x12(canvas, seg)
                if seg.kind == "rb":
                    c0, c1, c2 = RB_COEFFS
                    b = bcache[i]
                elif is_eps:
                    out[i] = self._pin_repl(
                        jnp.expand_dims(1.0 * x1, ax))
                    continue
                else:
                    c0, c1, c2 = bc_phys[seg.nb]
                    b = self._seg_bwin(bplanes_raw, seg)
                vals = c0 * b + c1 * x1
                if c2 != 0.0:
                    vals = vals + c2 * x2
                vals = jnp.expand_dims(vals, ax)
            # pinned replicated: thin ghost strips miscompile when the
            # partitioner back-propagates a y-sharding into them (see
            # Dense2DMGSolver._pin_repl)
            out[i] = self._pin_repl(vals)
        return out

    def _write_ring(self, canvas, vals, lvl, prefer: Optional[int] = None):
        """Write the ring ghosts into the canvas; ``prefer``: axis whose
        segments write LAST (wins conflicted cells)."""
        items = [(i, s) for i, s in enumerate(self.segs[lvl])
                 if s.sink == "ring"]
        if prefer is not None:
            items.sort(key=lambda t: t[1].nb // 2 == prefer)
        for i, seg in items:
            canvas = canvas.at[self._cansl(seg.lo, seg.hi)].set(vals[i])
        return canvas

    def _seg_bwin(self, bplanes_raw, seg):
        td = 1 - seg.nb // 2
        return bplanes_raw[seg.nb][int(seg.lo[td]):int(seg.hi[td])]

    def _face_vecs(self, canvas, bplanes_raw, bcache, lvl, key="phi"):
        """Assemble the four ghost vectors consumed with (1,0,0)
        coefficients; uncovered positions stay zero (they abut garbage
        cells only)."""
        X, Y = self.dims[lvl]
        dt = self.cfg.dtype
        vecs = [jnp.zeros((Y,), dt), jnp.zeros((Y,), dt),
                jnp.zeros((X,), dt), jnp.zeros((X,), dt)]
        bc_phys = self._ring_bc(lvl, key)
        is_eps = key.startswith("eps")
        for i, seg in enumerate(self.segs[lvl]):
            if seg.sink != "face":
                continue
            d = seg.nb // 2
            td = 1 - d
            if seg.kind == "wrap":
                lo, hi = seg.lo.copy(), seg.hi.copy()
                lo[d] = seg.src
                hi[d] = seg.src + 1
                vals = jnp.squeeze(canvas[self._cansl(lo, hi)], axis=1 - d)
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
            sl = slice(int(seg.lo[td]), int(seg.hi[td]))
            vecs[seg.nb] = vecs[seg.nb].at[sl].set(vals)
        return [self._pin_repl(v) for v in vecs]

    def _assemble(self, state, lvl, key, bcache=None, prefer=None):
        """(ringed canvas, face vectors, ring vals) for one variable
        (all variables synthesize with phi's BC data — the saved-iold
        identity, see DenseForestMGSolver._assemble)."""
        if bcache is None:
            bcache = self._rb_cache(state, lvl, key)
        canvas = state[key][lvl]
        raw = state["bc"][lvl]
        vals = self._ring_values(canvas, raw, bcache, lvl, key)
        ringed = self._write_ring(canvas, vals, lvl, prefer)
        vecs = self._face_vecs(ringed, raw, bcache, lvl, key)
        return ringed, vecs, vals

    def _eps_nbrs(self, state, lvl, masks):
        """Per coefficient field: direction-correct (lo, hi) neighbor
        pairs per dim + the raw canvas (the e0 centers).  Frozen across
        a phase — computed once.  Each field's ghosts ride the same
        ring/face synthesis as phi (Neumann-zero physical, sides_rb
        refinement, wraps), consumed via the identity face
        coefficients."""
        cfg = self._kcfgs[lvl]
        raw = state["bc"][lvl]
        nbrs, canvs = [], []
        for i in range(self.n_eps):
            key = f"eps{i}"
            bcache = self._rb_cache(state, lvl, key)
            ec = state[key][lvl]
            evals = self._ring_values(ec, raw, bcache, lvl, key)
            evecs = self._face_vecs(ec, raw, bcache, lvl, key)
            ebpw = d2._bvals(cfg, evecs)
            nbrs.append(self._dir_neighbors(cfg, ec, evals, lvl, masks,
                                            ebpw))
            canvs.append(ec)
        return nbrs, canvs

    def _dir_neighbors(self, cfg, canvas, vals, lvl, masks, bpw):
        """Per-dim (lo, hi) neighbor arrays: rolls of the RAW state
        canvas (the clean-sharding pattern GSPMD partitions correctly —
        rolling a ring-write scatter output miscompiles at shard
        boundaries, measured jax 0.9.0 CPU) with each direction's ring
        ghost values OVERLAID at the cells they serve.  This also
        resolves concave-corner conflicts exactly: direction d's reads
        see d-axis ghosts by construction (per-box ghost storage
        semantics), with no per-axis canvases needed."""
        out = []
        for d in range(2):
            lo, hi = d2._neighbor_ops(cfg, canvas, d, masks, bpw)
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

    def _ext(self, state, lvl, key, bcache=None, prefer=None):
        """[Y+2, X+2] canvas with ALL ghosts materialized."""
        ringed, vecs, _ = self._assemble(state, lvl, key, bcache, prefer)
        X, Y = self.dims[lvl]
        out = jnp.zeros((Y + 2, X + 2), self.cfg.dtype)
        out = out.at[1:-1, 1:-1].set(ringed)
        out = out.at[1:-1, 0].set(vecs[0])
        out = out.at[1:-1, -1].set(vecs[1])
        out = out.at[0, 1:-1].set(vecs[2])
        out = out.at[-1, 1:-1].set(vecs[3])
        return out

    def _var_with_ring(self, state, lvl, key):
        return self._ext(state, lvl, key)

    # ------------------------------------------------------------------
    # cycle building blocks
    # ------------------------------------------------------------------
    def _smooth(self, state, lvl, n_cycle, lam):
        """n_cycle GSRB iterations at half-sweep granularity with
        ring/face refreshes between half-sweeps (smooth_boxes,
        m_multigrid.f90:404-424; 2D red parity 1, as the dense 2D
        path)."""
        cfg = self._kcfgs[lvl]
        lam2 = d2._lam_2d(lam, cfg.dtype)
        masks = d2._face_masks(cfg)
        upd = d2._parity_mask(cfg, 1)
        bcache = self._rb_cache(state, lvl, "phi")
        raw = state["bc"][lvl]
        canvas = state["phi"][lvl]
        rhs = state["rhs"][lvl]
        enbrs, ecanv = self._eps_nbrs(state, lvl, masks)
        for n in range(2 * n_cycle):
            vals = self._ring_values(canvas, raw, bcache, lvl)
            vecs = self._face_vecs(canvas, raw, bcache, lvl)
            bpw = d2._bvals(cfg, vecs)
            nbrs = self._dir_neighbors(cfg, canvas, vals, lvl, masks,
                                       bpw)
            if cfg.cyl_w is not None:
                # 2D cylindrical laplacian (dense2d._halfsweep's
                # cyl_laplacian_smooth_half order, box_gs_clpl)
                w_lo, w_hi = cfg.cyl_w
                xlo, xhi = nbrs[0]
                ylo, yhi = nbrs[1]
                fac = 0.5 / (cfg.idr2[0] + cfg.idr2[1])
                new = fac * (cfg.idr2[0] * (w_hi * xhi + w_lo * xlo)
                             + cfg.idr2[1] * (yhi + ylo) - rhs)
            elif cfg.n_eps:
                # harmonic-mean face coefficients, dense2d._halfsweep's
                # eps accumulation order (m_vlaplacian.f90:84-100)
                num = -rhs
                den = lam2
                for dd in range(2):
                    i = 0 if cfg.n_eps == 1 else dd
                    e0 = ecanv[i]
                    elo, ehi = enbrs[i][dd]
                    plo, phi_ = nbrs[dd]
                    c = 2.0 * e0 * elo / (e0 + elo) * cfg.idr2[dd]
                    num = num + c * plo
                    den = den + c
                    c = 2.0 * e0 * ehi / (e0 + ehi) * cfg.idr2[dd]
                    num = num + c * phi_
                    den = den + c
                new = num / den
            else:
                acc = -rhs
                for dd in range(2):
                    lo, hi = nbrs[dd]
                    acc = acc + cfg.idr2[dd] * (lo + hi)
                new = acc * (1.0 / (cfg.den0 + lam2))
            canvas = (jnp.where(upd, new, canvas) if n % 2 == 0
                      else jnp.where(upd, canvas, new))
        return self._set(state, "phi", lvl, canvas)

    def _apply_expr_forest(self, state, lvl, lam, residual):
        cfg = self._kcfgs[lvl]
        lam2 = d2._lam_2d(lam, cfg.dtype)
        masks = d2._face_masks(cfg)
        bcache = self._rb_cache(state, lvl, "phi")
        raw = state["bc"][lvl]
        canvas = state["phi"][lvl]
        vals = self._ring_values(canvas, raw, bcache, lvl)
        vecs = self._face_vecs(canvas, raw, bcache, lvl)
        bpw = d2._bvals(cfg, vecs)
        nbrs = self._dir_neighbors(cfg, canvas, vals, lvl, masks, bpw)
        if cfg.cyl_w is not None:
            w_lo, w_hi = cfg.cyl_w
            xlo, xhi = nbrs[0]
            ylo, yhi = nbrs[1]
            out = (cfg.idr2[0] * (w_lo * xlo + w_hi * xhi
                                  - 2.0 * canvas)
                   + cfg.idr2[1] * (ylo + yhi - 2.0 * canvas))
            return state["rhs"][lvl] - out if residual else out
        out = -lam2 * canvas
        if cfg.n_eps:
            enbrs, ecanv = self._eps_nbrs(state, lvl, masks)
            for dd in range(2):
                i = 0 if cfg.n_eps == 1 else dd
                e0 = ecanv[i]
                elo, ehi = enbrs[i][dd]
                plo, phi_ = nbrs[dd]
                c = 2.0 * e0 * elo / (e0 + elo) * cfg.idr2[dd]
                out = out + c * (plo - canvas)
                c = 2.0 * e0 * ehi / (e0 + ehi) * cfg.idr2[dd]
                out = out + c * (phi_ - canvas)
        else:
            for dd in range(2):
                lo, hi = nbrs[dd]
                out = out + cfg.idr2[dd] * (lo + hi - 2.0 * canvas)
        return state["rhs"][lvl] - out if residual else out

    def _residual(self, state, lvl, lam):
        return self._set(state, "ires", lvl,
                         self._apply_expr_forest(state, lvl, lam, True))

    def _apply_op(self, state, lvl, lam):
        return self._apply_expr_forest(state, lvl, lam, False)

    def _max_residual(self, state, lvl, lam):
        """Max |res| over FOOTPRINT cells only."""
        state = self._residual(state, lvl, lam)
        r = state["ires"][lvl]
        m = jnp.asarray(0.0, self.cfg.dtype)
        for lo, hi in self.geom[lvl].rects:
            m = jnp.maximum(m, jnp.max(jnp.abs(r[self._cansl(lo, hi)])))
        return state, m

    # ------------------------------------------------------------------
    # FAS transfer on footprint/image rectangles
    # ------------------------------------------------------------------
    def _image_rects(self, lvl):
        off_f = self.offsets[lvl]
        off_c = self.offsets[self._coarse_of(lvl)]
        out = []
        for lo, hi in self.geom[lvl].rects:
            out.append(((off_f + lo) // 2 - off_c,
                        (off_f + hi) // 2 - off_c))
        return out

    def _restrict_into(self, state, lvl, key):
        """Full-weighting restriction of the footprint into its coarse
        image rectangles (restrict_onto on parents,
        m_restrict.f90:165-214) via the 2D pair-sum matmuls."""
        Ry, Rx = self._restrict_mats(lvl)
        fine = state[key][lvl]
        avg = jnp.dot(jnp.dot(Ry, fine, precision="highest"), Rx.T,
                      precision="highest") * 0.25
        uc = self._coarse_of(lvl)
        coarse = state[key][uc]
        for (lo, hi), (clo, chi) in zip(self.geom[lvl].rects,
                                        self._image_rects(lvl)):
            win = (slice(int(lo[1]) // 2, int(hi[1]) // 2),
                   slice(int(lo[0]) // 2, int(hi[0]) // 2))
            coarse = coarse.at[self._cansl(clo, chi)].set(avg[win])
        return self._set(state, key, uc, coarse)

    def _finish_coarse_rhs(self, state, lvl, lam):
        """rhs_c = A(phi_c) + restrict(res) on the image rectangles only
        (parents, m_multigrid.f90:369-383); iold_c = phi_c."""
        uc = self._coarse_of(lvl)
        a_phi = self._apply_op(state, uc, lam)
        rhs_c = state["rhs"][uc]
        for clo, chi in self._image_rects(lvl):
            sl = self._cansl(clo, chi)
            rhs_c = rhs_c.at[sl].set(a_phi[sl]
                                     + state["ires"][uc][sl])
        state = self._set(state, "rhs", uc, rhs_c)
        state = self._set(state, "iold", uc, state["phi"][uc])
        return state

    def _correct_children(self, state, lvl_c, lam):
        """phi_fine += prolong(phi_c - iold_c) over the fine canvas's
        coarse image + one ghost ring (correct_children,
        m_multigrid.f90:387-402)."""
        return self._correct_unit(state, lvl_c, lvl_c + 1, lam)

    def _correct_unit(self, state, lvl_c, lvl, lam):
        """One (coarse unit, fine unit) correction pair."""
        off_f = self.offsets[lvl]
        off_c = self.offsets[lvl_c]
        lo = (off_f // 2) - off_c
        ex, ey = (int(v) // 2 for v in self.dims[lvl])
        sl = (slice(int(lo[1]), int(lo[1]) + ey + 2),
              slice(int(lo[0]), int(lo[0]) + ex + 2))
        if not self.conflicted.get(lvl_c):
            corr = (self._ext(state, lvl_c, "phi")
                    - self._ext(state, lvl_c, "iold"))
            sub = corr[sl]
        else:
            # border reads of the prolongation are per-axis ghost reads
            # of the parent boxes (mg_prolong_sparse, m_prolong.f90)
            bc_p = self._rb_cache(state, lvl_c, "phi")
            bc_i = self._rb_cache(state, lvl_c, "iold")
            corr_ax = {a: (self._ext(state, lvl_c, "phi", bcache=bc_p,
                                     prefer=a)
                           - self._ext(state, lvl_c, "iold", bcache=bc_i,
                                       prefer=a))[sl]
                       for a in range(2)}
            sub = corr_ax[0]  # x-axis ghosts on the col borders already
            sub = sub.at[0, :].set(corr_ax[1][0, :])
            sub = sub.at[-1, :].set(corr_ax[1][-1, :])
        vals = self._prolong_rect(sub)
        phi = state["phi"][lvl] + vals
        return self._set(state, "phi", lvl, phi)

    # -- subtract mean (fully periodic forests) -------------------------
    def _subtract_mean(self, state, key):
        """Leaf-weighted global mean over levels >= 1, removed from all
        levels (subtract_mean, m_multigrid.f90:245-294)."""
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
        volume = float(np.prod(t.domain_size_lvl[1][:2])
                       * np.prod(t.dr[1]))
        mean = total / volume
        for lvl in self.levels:
            state = self._set(state, key, lvl, state[key][lvl] - mean)
        return state

    # ------------------------------------------------------------------
    # direct coarse solve (probe through the forest apply)
    # ------------------------------------------------------------------
    def _ensure_direct(self, state=None):
        if self.coarse_solver != "direct" or self._direct is not None:
            return
        if self.n_eps and state is None:
            return  # matrix depends on eps; public entries pass state
        self._direct = self._forest_direct(state) or "unavailable"

    def _forest_direct(self, state=None):
        lvl = self._unit0(self.levels[0])
        X, Y = self.dims[lvl]
        m = X * Y
        dt = self.cfg.dtype
        zeros = jnp.zeros((Y, X), dt)
        bcraw = self._eval_bc_planes(lvl)
        lam0 = jnp.asarray(0.0, dt)
        eps0 = {f"eps{i}": {lvl: (state[f"eps{i}"][lvl]
                                  if state is not None
                                  else jnp.ones((Y, X), dt))}
                for i in range(self.n_eps)}

        def apply_flat(v):
            st = {"phi": {lvl: v.reshape(Y, X)}, "rhs": {lvl: zeros},
                  "bc": {lvl: bcraw}, **eps0}
            return self._apply_op(st, lvl, lam0).reshape(-1)

        cols = jax.jit(jax.vmap(apply_flat))(jnp.eye(m, dtype=dt))
        a0 = apply_flat(jnp.zeros(m, dt))
        A = (np.asarray(cols, np.float64).T
             - np.asarray(a0, np.float64)[:, None])
        return self._eigen_package(A)

    def _var_with_ring_axes(self, state, lvl, key):
        """Per-axis ringed exports for the coupling layer: the face-d
        ghosts of an exported leaf must carry axis-d values at
        conflicted concave-corner cells (per-box ghost storage
        semantics).  Conflict-free levels return one array twice."""
        if not self.conflicted.get(lvl):
            e = self._ext(state, lvl, key)
            return (e, e)
        return tuple(self._ext(state, lvl, key, prefer=a)
                     for a in range(2))
