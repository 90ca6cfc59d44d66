"""Dense-patch AMR FAS multigrid in 2D: one dense array per level.

2D counterpart of :class:`DenseAMRMGSolver` (solve/dense_amr.py) on
quadtree AMR trees: each rectangular refinement level becomes ONE dense
``[Y, X]`` array driven by the pure-XLA 2D dense machinery
(ops/dense2d.py — whole-array masked GSRB with inline ghost synthesis,
MXU-matmul restriction).  The reference's refinement-boundary ghost
(sides_rb, m_ghost_cells.f90:769-861)

    ghost = 0.5*interp + 0.75*x1 - 0.25*x2

is the physical-BC formula with (c0,c1,c2) = (0.5, 0.75, -0.25) and
b = the coarse-side interpolated strip (box_gc_for_fine_neighbor,
±0.125 transverse gradients, m_ghost_cells.f90:500-577) — so a patch
face bordering coarser cells is a BC face whose b vector is recomputed
from the coarse patch before each smoothing call, exactly the 3D
dense-patch identity.  FAS transfer acts on the fine patch's footprint
region of the coarse patch (update_coarse touches parents only,
m_multigrid.f90:347-384).

Gating (``dense_amr2d_supported``): 2D cartesian laplacian/helmholtz,
GSRB, non-periodic, every level's boxes forming a full rectangle with
the refinement strips inside the coarse patch.  Anything else falls
back to the boxed solver.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..core.tree import Tree
from ..ops.ghost import interp_rb_strip
from .dense_amr import RB_COEFFS, _patch_geometry, _rb_strips_inside
from .dense2d import Dense2DMGSolver
from .multigrid import MGConfig


def dense_amr2d_supported(tree: Tree, cfg: MGConfig) -> bool:
    """Whether the 2D dense-patch AMR path covers this configuration.

    Variable-coefficient operators and the 2D cylindrical laplacian
    (m_laplacian.f90:197-271; the boxed dispatch's geometry gating)
    ride too — eps refinement-face ghosts follow the same two-stage
    scheme as any variable, and the radial face weights are
    patch-offset-aware."""
    geom_ok = (cfg.geometry == "cartesian"
               or (cfg.geometry == "cylindrical"
                   and cfg.operator == "laplacian"))
    if not (tree.ndim == 2
            and tree.highest_lvl > 1
            and cfg.operator in ("laplacian", "helmholtz", "vlaplacian",
                                 "vhelmholtz", "ahelmholtz")
            and geom_ok
            and cfg.smoother in ("gsrb", "gs")
            and not any(tree.periodic)):
        return False
    geom = _patch_geometry(tree)
    if geom is None:
        return False
    return _rb_strips_inside(tree, geom)


class Dense2DAMRMGSolver(Dense2DMGSolver):
    """FAS multigrid on dense rectangular 2D AMR patches."""

    _supported = staticmethod(dense_amr2d_supported)

    # ------------------------------------------------------------------
    # setup (mirrors DenseAMRMGSolver._build_levels, 4 faces, no pads)
    # ------------------------------------------------------------------
    def _build_levels(self):
        t = self.tree
        geom = _patch_geometry(t)
        assert geom is not None
        all_lvls = list(range(t.lowest_lvl, t.highest_lvl + 1))
        self.dims = {lvl: tuple(int(v) for v in geom["dims"][lvl])
                     for lvl in all_lvls}
        self.offsets = {lvl: geom["offsets"][lvl] for lvl in all_lvls}
        self.regions = geom["regions"]
        if self.coarse_solver == "direct":
            # the direct level must be a whole-domain uniform level
            direct = None
            for lvl in all_lvls:
                if (lvl <= 1
                        and int(np.prod(self.dims[lvl])) <= self.DIRECT_MAX_CELLS):
                    direct = lvl
            if direct is None:
                direct = all_lvls[0]
            self.levels = [l for l in all_lvls if l >= direct]
        else:
            self.levels = all_lvls
        # face kinds: "phys" on the physical domain boundary, else "rb"
        self.face_kind: Dict[int, List[str]] = {}
        for lvl in self.levels:
            kinds = []
            for nb in range(4):
                d = nb // 2
                if nb % 2 == 0:
                    flush = self.offsets[lvl][d] == 0
                else:
                    flush = (self.offsets[lvl][d] + self.dims[lvl][d]
                             == t.domain_size_lvl[lvl][d])
                kinds.append("phys" if flush else "rb")
            self.face_kind[lvl] = kinds

    def _whole_region(self, lvl: int) -> bool:
        if lvl not in self.regions:
            return True
        r0, r1 = self.regions[lvl]
        return bool(np.all(r0 == 0)
                    and np.all(r1 == np.asarray(self.dims[lvl - 1])))

    def _region(self, lvl: int):
        """Region slices of lvl's footprint into lvl-1's [Y, X] array."""
        r0, r1 = self.regions[lvl]
        return (slice(int(r0[1]), int(r1[1])), slice(int(r0[0]), int(r1[0])))

    def _kcfg(self, lvl: int):
        import octree_mg_tpu.ops.dense2d as d2
        t = self.tree
        idr2 = tuple(float(x) for x in 1.0 / t.dr[lvl] ** 2)
        bc_phys = super()._bc_static(lvl)
        bc_full = []
        b_const = []
        for nb in range(4):
            if self.face_kind[lvl][nb] == "rb":
                bc_full.append(RB_COEFFS)
                b_const.append(None)   # vector-valued: coarse interp
            else:
                c = bc_phys[nb]
                bc_full.append(c if c is not None else (0.0, 0.0, 0.0))
                spec = self.bc_spec[nb]
                b_const.append(float(spec["value"])
                               if spec["fn"] is None else None)
        eps_bc = None
        if self.n_eps and "rb" in self.face_kind[lvl]:
            # coefficient-field ghosts: Neumann-zero at physical faces,
            # sides_rb with the coarse-interp vector at refinement faces
            # (m_ghost_cells.f90:131-175, 769-861)
            eps_bc = [RB_COEFFS if self.face_kind[lvl][nb] == "rb"
                      else (0.0, 1.0, 0.0) for nb in range(4)]
        cyl_w = None
        if self.cfg.geometry == "cylindrical":
            cyl_w = self._cyl_weights(lvl)
        return d2.Dense2DConfig(
            dims=self.dims[lvl], idr2=idr2, bc=bc_full,
            periodic=self.periodic, dtype=self.cfg.dtype,
            b_const=b_const, n_eps=self.n_eps, eps_bc=eps_bc,
            cyl_w=cyl_w)

    def _cyl_weights(self, lvl: int):
        """Patch-offset-aware radial face weights (box_clpl,
        m_laplacian.f90:209-212): the patch's first column sits at
        global radial index ``offsets[lvl][0]``."""
        t = self.tree
        X = self.dims[lvl][0]
        dr0 = float(t.dr[lvl][0])
        rmin = float(t.r_min[0])
        off = float(self.offsets[lvl][0])
        i = np.arange(1, X + 1) + off
        r_face = rmin + dr0 * (i - 1)
        r_face_hi = rmin + dr0 * i
        r_inv = 1.0 / (rmin + dr0 * (i - 0.5))
        dt = np.dtype(self.cfg.dtype)
        return ((r_face * r_inv)[None, :].astype(dt),
                (r_face_hi * r_inv)[None, :].astype(dt))

    def cell_centers(self, lvl: int) -> np.ndarray:
        """Patch interior cell centers [Y, X, 2] in global coords."""
        t = self.tree
        X, Y = self.dims[lvl]
        dr = t.dr[lvl]
        off = self.offsets[lvl]
        out = np.zeros((Y, X, 2))
        out[..., 0] = (t.r_min[0] + (off[0] + np.arange(X) + 0.5)
                       * dr[0])[None, :]
        out[..., 1] = (t.r_min[1] + (off[1] + np.arange(Y) + 0.5)
                       * dr[1])[:, None]
        return out

    def _eval_bc_planes(self, lvl: int) -> List[jnp.ndarray]:
        """Physical boundary vectors at patch faces (offset-aware);
        refinement faces get zero placeholders — replaced by traced
        coarse interpolation in _planes (mg_phi_bc_store analogue)."""
        t = self.tree
        X, Y = self.dims[lvl]
        dr = t.dr[lvl]
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
            if self.face_kind[lvl][nbd] == "rb":
                out.append(jnp.zeros((n_t,), dt))
                continue
            coords = np.zeros((n_t, 2))
            if d == 0:
                coords[:, 0] = lo_face[0] if nbd % 2 == 0 else hi_face[0]
                coords[:, 1] = cy
            else:
                coords[:, 1] = lo_face[1] if nbd % 2 == 0 else hi_face[1]
                coords[:, 0] = cx
            spec = self.bc_spec[nbd]
            if spec["fn"] is not None:
                vals = np.asarray(spec["fn"](coords))
            else:
                vals = np.full(n_t, spec["value"])
            out.append(jnp.asarray(vals, dt))
        return out

    def _ring_bc(self, lvl, key="phi"):
        """Ghost-ring coefficients: refinement faces take the sides_rb
        combination, physical faces the bc_to_gc formula (coefficient
        fields: Neumann-zero, ghost = own value)."""
        phys = super()._ring_bc(lvl, key)
        return [RB_COEFFS if self.face_kind[lvl][nb] == "rb" else phys[nb]
                for nb in range(4)]

    def _eps_planes(self, state, lvl):
        """Coefficient-field boundary vectors: the coarse-interp vector
        at refinement faces, None (Neumann-zero synthesis, never read)
        at physical faces."""
        kinds = self.face_kind[lvl]
        if not self.n_eps or "rb" not in kinds:
            return None
        out = []
        for i in range(self.n_eps):
            planes = self._planes(state, lvl, key=f"eps{i}")
            out.append([planes[nb] if kinds[nb] == "rb" else None
                        for nb in range(len(kinds))])
        return out

    # ------------------------------------------------------------------
    # refinement-boundary ghost vectors (traced)
    # ------------------------------------------------------------------
    def _planes(self, state, lvl, key="phi"):
        """BC vectors with refinement faces replaced by the coarse-side
        strip interpolation of ``key``'s coarse field
        (box_gc_for_fine_neighbor, m_ghost_cells.f90:500-577; the 2D
        form keeps mid ± 0.125*grad, :545-555)."""
        kinds = self.face_kind[lvl]
        if "rb" not in kinds:
            return state["bc"][lvl]
        planes = list(state["bc"][lvl])
        # coarse patch with its one-cell ring (ring values consumed only
        # where the strip pokes past the coarse interior, i.e. at
        # domain-flush transverse edges — physical synthesis there).
        # _pin_repl: keep the strip chain replicated under GSPMD (the
        # partitioner miscompiles the interleave when it back-propagates
        # a consumer's y-sharding into it — see Dense2DMGSolver._pin_repl)
        cw = self._pin_repl(self._var_with_ring(state, lvl - 1, key))
        r0, r1 = self.regions[lvl]
        for nb in range(4):
            if kinds[nb] != "rb":
                continue
            d = nb // 2
            ax = 1 - d
            td = 1 - d  # the transverse dim
            nidx = int(r0[d]) if nb % 2 == 0 else int(r1[d]) + 1
            sl: List = [slice(None)] * 2
            sl[ax] = nidx
            sl[1 - td] = slice(int(r0[td]), int(r1[td]) + 2)
            tmp = cw[tuple(sl)]           # [t+2] coarse strip
            planes[nb] = self._pin_repl(interp_rb_strip(tmp[None], 2)[0])
        return planes

    # ------------------------------------------------------------------
    # region-aware FAS transfer
    # ------------------------------------------------------------------
    def _restrict_into(self, state, lvl, key):
        """Full-weighting restriction of the fine patch into its
        footprint region of the coarse patch (restrict_onto on parents,
        m_restrict.f90:165-214) via the 2D pair-sum matmuls."""
        if self._whole_region(lvl):
            return super()._restrict_into(state, lvl, key)
        Ry, Rx = self._restrict_mats(lvl)
        fine = state[key][lvl]
        avg = jnp.dot(jnp.dot(Ry, fine, precision="highest"), Rx.T,
                      precision="highest") * 0.25
        coarse = state[key][lvl - 1].at[self._region(lvl)].set(avg)
        return self._set(state, key, lvl - 1, coarse)

    def _finish_coarse_rhs(self, state, lvl, lam):
        """rhs_c = A(phi_c) + restrict(res) on the footprint region only
        (parents, m_multigrid.f90:369-383); iold_c = phi_c."""
        if self._whole_region(lvl):
            return super()._finish_coarse_rhs(state, lvl, lam)
        a_phi = self._apply_op(state, lvl - 1, lam)
        reg = self._region(lvl)
        rhs_c = state["rhs"][lvl - 1].at[reg].set(
            a_phi[reg] + state["ires"][lvl - 1][reg])
        state = self._set(state, "rhs", lvl - 1, rhs_c)
        state = self._set(state, "iold", lvl - 1, state["phi"][lvl - 1])
        return state

    def _correct_children(self, state, lvl_c, lam):
        """phi_fine += prolong(phi_c - iold_c) from the footprint region
        plus its one-cell ring (correct_children, m_multigrid.f90:
        387-402; ring = coarse (phi - iold) neighbors, or the physical
        synthesis difference at domain-flush faces)."""
        lvl = lvl_c + 1
        if self._whole_region(lvl):
            return super()._correct_children(state, lvl_c, lam)
        r0, r1 = self.regions[lvl]
        ext = r1 - r0
        phi_c = state["phi"][lvl_c]
        iold_c = state["iold"][lvl_c]
        corr_full = phi_c - iold_c
        sub = jnp.zeros((int(ext[1]) + 2, int(ext[0]) + 2),
                        self.cfg.dtype)
        sub = sub.at[1:-1, 1:-1].set(corr_full[self._region(lvl)])
        bc = self._bc_static(lvl_c)
        bp = state["bc"][lvl_c]
        dims_c = self.dims[lvl_c]

        def pick(a, d, idx):
            """Row/column of dim d at coarse-patch cell idx, windowed
            to the region's transverse range."""
            td = 1 - d
            sl: List = [slice(None)] * 2
            sl[1 - d] = idx
            sl[1 - td] = slice(int(r0[td]), int(r1[td]))
            return a[tuple(sl)]

        for nb in range(4):
            d = nb // 2
            lowside = nb % 2 == 0
            if lowside:
                inside = int(r0[d]) > 0
                layer = int(r0[d]) - 1
            else:
                inside = int(r1[d]) < dims_c[d]
                layer = int(r1[d])
            if inside:
                ring = pick(corr_full, d, layer)
            else:
                # region flush with the coarse patch face — physical by
                # the support gating: ghost(phi) - ghost(iold)
                edge = 0 if lowside else dims_c[d] - 1
                edge2 = 1 if lowside else dims_c[d] - 2
                td = 1 - d
                bpl = bp[nb][int(r0[td]):int(r1[td])]
                c0, c1, c2 = bc[nb]
                gp = c0 * bpl + c1 * pick(phi_c, d, edge)
                gi = c0 * bpl + c1 * pick(iold_c, d, edge)
                if c2 != 0.0:
                    gp = gp + c2 * pick(phi_c, d, edge2)
                    gi = gi + c2 * pick(iold_c, d, edge2)
                ring = gp - gi
            sl: List = [slice(1, -1)] * 2
            sl[1 - d] = 0 if lowside else -1
            sub = sub.at[tuple(sl)].set(ring)
        vals = self._prolong_rect(sub)
        phi = state["phi"][lvl] + vals
        return self._set(state, "phi", lvl, phi)
