"""Dense-patch AMR FAS multigrid: one dense array per refinement level.

TPU-native AMR.  The reference distributes each refinement level's
boxes over MPI ranks (m_load_balance.f90); the boxed solver here
mirrors that as [n_boxes, (nc+2)^3] arrays — a layout whose trailing
(18, 18) dims tile-pad ~9.5x on TPU and whose ghost fills are separate
memory passes.  In practice (and in the reference's own AMR test,
tests/test_refinement.f90:191-247) each refinement level is a
RECTANGULAR patch: this solver stores it as one dense padded array and
reuses the uniform dense machinery (ops/dense_kernels — fused Mosaic
GSRB pairs, one-pass apply/residual, kernel restriction) wholesale.

The key identity making this exact: the reference's refinement-boundary
ghost (sides_rb, m_ghost_cells.f90:769-861)

    ghost = 0.5*interp + 0.75*x1 - 0.25*x2

is the physical-BC formula ghost = c0*b + c1*x1 + c2*x2 with
(c0,c1,c2) = (0.5, 0.75, -0.25) and b = the coarse-side interpolated
plane (box_gc_for_fine_neighbor, ±0.125 transverse gradients).  The
dense kernels already synthesize BC ghosts inline from exactly that
formula with plane-valued b — so a patch face that borders coarser
cells is just a BC face whose b plane is (re)computed from the coarse
patch before each smoothing call.  The b plane is constant across the
half-sweeps of a smoothing call because the coarse level does not
change during fine smoothing — the same reason the reference's
per-substep refills produce identical interp values
(m_multigrid.f90:404-424).

FAS transfer happens on the overlap region (the fine patch's footprint
in the coarse patch): restriction and the tau-corrected coarse rhs
write only that region (update_coarse touches parents only,
m_multigrid.f90:347-384), and the up-leg prolongs (phi_c - iold_c)
from the region plus a one-cell ring — ring values are coarse
(phi - iold) neighbors, exactly the boxed corr ghost semantics
(ghost copies are fresh at both save and read time).

Gating (``dense_amr_supported``): 3D cartesian laplacian/helmholtz,
GSRB, non-periodic, every level's boxes forming a full rectangle, each
fine patch strictly inside its coarse patch except where flush with
the physical domain.  Anything else falls back to the boxed solver.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.tree import Tree
from ..ops import dense_kernels as dk
from ..ops.ghost import interp_rb_strip
from .dense import DenseMGSolver, _ISL
from .multigrid import MGConfig

#: refinement-boundary ghost combination (sides_rb,
#: m_ghost_cells.f90:769-861)
RB_COEFFS = (0.5, 0.75, -0.25)


def _patch_geometry(tree: Tree) -> Optional[Dict]:
    """Per-level rectangular patch geometry, or None if any level's
    boxes do not tile a rectangle (then the boxed solver applies).
    Rank-generic (the 2D dense-patch AMR solver reuses it)."""
    lvls = list(range(tree.lowest_lvl, tree.highest_lvl + 1))
    offsets: Dict[int, np.ndarray] = {}
    dims: Dict[int, np.ndarray] = {}
    for lvl in lvls:
        ids = tree.lvls[lvl].ids
        if len(ids) == 0:
            return None
        nc = tree.box_size_lvl[lvl]
        ix = tree.ix[ids] - 1  # [n, ndim] 0-based (x, y(, z))
        lo = ix.min(axis=0)
        hi = ix.max(axis=0) + 1
        if len(ids) != int(np.prod(hi - lo)):
            return None
        if len(np.unique(ix, axis=0)) != len(ids):
            return None
        offsets[lvl] = lo * nc
        dims[lvl] = (hi - lo) * nc
    regions: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
    for lvl in lvls[1:]:
        r0 = offsets[lvl] // 2 - offsets[lvl - 1]
        r1 = (offsets[lvl] + dims[lvl]) // 2 - offsets[lvl - 1]
        if np.any(r0 < 0) or np.any(r1 > dims[lvl - 1]):
            return None
        regions[lvl] = (r0, r1)
    return {"offsets": offsets, "dims": dims, "regions": regions}


def _rb_strips_inside(tree: Tree, geom: Dict) -> bool:
    """Each refinement face needs its coarse strip (region±1 ring)
    inside the coarse patch; a region face may touch the coarse patch
    edge only where both are flush with the physical domain.
    Rank-generic (shared with the 2D dense-patch AMR gate)."""
    for lvl in range(tree.lowest_lvl + 1, tree.highest_lvl + 1):
        r0, r1 = geom["regions"][lvl]
        dims_c = geom["dims"][lvl - 1]
        off_c = geom["offsets"][lvl - 1]
        dom_c = tree.domain_size_lvl[lvl - 1]
        for d in range(tree.ndim):
            lo_flush_dom = off_c[d] + r0[d] == 0
            hi_flush_dom = off_c[d] + r1[d] == dom_c[d]
            if r0[d] == 0 and not lo_flush_dom:
                return False
            if r1[d] == dims_c[d] and not hi_flush_dom:
                return False
    return True


def dense_amr_supported(tree: Tree, cfg: MGConfig) -> bool:
    """Whether the dense-patch AMR path covers this configuration.

    Variable-coefficient operators ride too: eps ghosts at refinement
    faces follow the same two-stage scheme as any variable (coarse
    interp + sides_rb combine), expressed as per-face eps BC synthesis
    with plane-valued b (DenseStencilConfig.eps_bc); those levels run
    the identical-jnp path (Mosaic plane windows for eps not plumbed)."""
    if not (tree.ndim == 3
            and tree.highest_lvl > 1
            and cfg.operator in ("laplacian", "helmholtz", "vlaplacian",
                                 "vhelmholtz", "ahelmholtz")
            and cfg.geometry == "cartesian"
            and cfg.smoother in ("gsrb", "gs")
            and not any(tree.periodic)):
        return False
    geom = _patch_geometry(tree)
    if geom is None:
        return False
    return _rb_strips_inside(tree, geom)


class DenseAMRMGSolver(DenseMGSolver):
    """FAS multigrid on dense rectangular AMR patches."""

    _supported = staticmethod(dense_amr_supported)

    # ------------------------------------------------------------------
    # setup
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
        # face kinds: "phys" where the patch face lies on the physical
        # domain boundary, else "rb" (borders coarser cells)
        self.face_kind: Dict[int, List[str]] = {}
        for lvl in self.levels:
            kinds = []
            for nb in range(6):
                d = nb // 2
                if nb % 2 == 0:
                    flush = self.offsets[lvl][d] == 0
                else:
                    flush = (self.offsets[lvl][d] + self.dims[lvl][d]
                             == t.domain_size_lvl[lvl][d])
                kinds.append("phys" if flush else "rb")
            self.face_kind[lvl] = kinds

    def _whole_region(self, lvl: int) -> bool:
        """Whether lvl's footprint covers all of lvl-1 (the uniform
        chain) — then the base whole-patch transfer machinery applies."""
        if lvl not in self.regions:
            return True
        r0, r1 = self.regions[lvl]
        return bool(np.all(r0 == 0)
                    and np.all(r1 == np.asarray(self.dims[lvl - 1])))

    def _region_pad(self, lvl: int):
        """Region slices of lvl's footprint into lvl-1's PADDED array."""
        r0, r1 = self.regions[lvl]
        return (slice(dk.PZ + int(r0[2]), dk.PZ + int(r1[2])),
                slice(dk.PY + int(r0[1]), dk.PY + int(r1[1])),
                slice(int(r0[0]), int(r1[0])))

    def _kcfg(self, lvl: int) -> dk.DenseStencilConfig:
        t = self.tree
        idr2 = tuple(float(x) for x in 1.0 / t.dr[lvl] ** 2)
        bc_phys = super()._bc_static(lvl)
        bc_full = []
        b_const = []
        for nb in range(6):
            if self.face_kind[lvl][nb] == "rb":
                bc_full.append(RB_COEFFS)
                b_const.append(None)   # plane-valued: coarse interp
            else:
                c = bc_phys[nb]
                bc_full.append(c if c is not None else (0.0, 0.0, 0.0))
                spec = self.bc_spec[nb]
                b_const.append(float(spec["value"])
                               if spec["fn"] is None else None)
        eps_bc = None
        if self.n_eps and "rb" in self.face_kind[lvl]:
            # coefficient-field ghosts: Neumann-zero at physical faces
            # (ghost = own value, m_vlaplacian.f90:25-28), sides_rb with
            # the coarse-interp plane at refinement faces — the same
            # two-stage scheme any variable gets (m_ghost_cells.f90:
            # 131-175, 769-861)
            eps_bc = [RB_COEFFS if self.face_kind[lvl][nb] == "rb"
                      else (0.0, 1.0, 0.0) for nb in range(6)]
        return dk.DenseStencilConfig(
            dims=self.dims[lvl], idr2=idr2, bc=bc_full,
            periodic=self.periodic, dtype=self.cfg.dtype,
            b_const=b_const, interpret=self.interpret,
            n_eps=self.n_eps, eps_bc=eps_bc)

    def cell_centers(self, lvl: int) -> np.ndarray:
        """Patch interior cell centers [Z, Y, X, 3] in global coords."""
        t = self.tree
        X, Y, Z = self.dims[lvl]
        dr = t.dr[lvl]
        off = self.offsets[lvl]
        out = np.zeros((Z, Y, X, 3))
        for d, sl in ((0, (None, None, slice(None))),
                      (1, (None, slice(None), None)),
                      (2, (slice(None), None, None))):
            c = t.r_min[d] + (off[d] + np.arange(self.dims[lvl][d]) + 0.5) * dr[d]
            out[..., d] = c[sl]
        return out

    def _eval_bc_planes(self, lvl: int) -> List[jnp.ndarray]:
        """Physical boundary planes at patch faces (offset-aware);
        refinement faces get zero placeholders of the kernel's plane
        shape — replaced by traced coarse interpolation in _planes."""
        t = self.tree
        X, Y, Z = self.dims[lvl]
        dr = t.dr[lvl]
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
            if d == 0:
                shape = (Z, Y)
                pad = ((dk.PZ, dk.PZ), (dk.PY, dk.PY))
            elif d == 1:
                shape = (Z, X)
                pad = ((dk.PZ, dk.PZ), (0, 0))
            else:
                shape = (Y, X)
                pad = ((dk.PY, dk.PY), (0, 0))
            if self.face_kind[lvl][nbd] == "rb":
                pshape = tuple(s + p[0] + p[1] for s, p in zip(shape, pad))
                out.append(jnp.zeros(pshape, dt))
                continue
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
            spec = self.bc_spec[nbd]
            if spec["fn"] is not None:
                vals = np.asarray(spec["fn"](coords))
            else:
                vals = np.full(shape, spec["value"])
            vals = np.pad(vals, pad)
            out.append(jnp.asarray(vals, dt))
        return out

    def _ring_bc(self, lvl, key="phi"):
        """Ghost-ring coefficients: refinement faces take the sides_rb
        combination, physical faces the bc_to_gc formula (coefficient
        fields: Neumann-zero, ghost = own value)."""
        phys = super()._ring_bc(lvl, key)
        return [RB_COEFFS if self.face_kind[lvl][nb] == "rb" else phys[nb]
                for nb in range(6)]

    def _eps_planes(self, state, lvl):
        """Coefficient-field boundary planes: the coarse-interp plane at
        refinement faces (same interpolation as phi's), None (never
        read — Neumann-zero synthesis) at physical faces."""
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
    # refinement-boundary ghost planes (traced)
    # ------------------------------------------------------------------
    def _planes(self, state, lvl, key="phi"):
        """BC planes with refinement faces replaced by the coarse-side
        interpolation of ``key``'s coarse field
        (box_gc_for_fine_neighbor: strip + ±0.125 transverse gradients,
        m_ghost_cells.f90:500-577)."""
        kinds = self.face_kind[lvl]
        if "rb" not in kinds:
            return state["bc"][lvl]
        planes = list(state["bc"][lvl])
        # coarse patch with its one-cell ring (ring values are only
        # consumed where the strip pokes past the coarse interior, i.e.
        # at domain-flush transverse edges — physical synthesis, exactly
        # the boxed coarse ghost fill)
        cw = self._var_with_ring(state, lvl - 1, key)
        r0, r1 = self.regions[lvl]
        for nb in range(6):
            if kinds[nb] != "rb":
                continue
            d = nb // 2
            ax = 2 - d
            nidx = int(r0[d]) if nb % 2 == 0 else int(r1[d]) + 1
            sl: List = [slice(None)] * 3
            sl[ax] = nidx
            for dd in range(3):
                if dd != d:
                    sl[2 - dd] = slice(int(r0[dd]), int(r1[dd]) + 2)
            tmp = cw[tuple(sl)]          # [t_hi, t_lo] coarse strip
            gc = interp_rb_strip(tmp[None], 3)[0]
            if d == 0:
                pad = ((dk.PZ, dk.PZ), (dk.PY, dk.PY))
            elif d == 1:
                pad = ((dk.PZ, dk.PZ), (0, 0))
            else:
                pad = ((dk.PY, dk.PY), (0, 0))
            planes[nb] = jnp.pad(gc, pad)
        return planes

    # ------------------------------------------------------------------
    # region-aware FAS transfer
    # ------------------------------------------------------------------
    def _transfer_ok(self, lvl: int) -> bool:
        return self._whole_region(lvl) and super()._transfer_ok(lvl)

    def _fused_transfer_ok(self, lvl: int) -> bool:
        return self._whole_region(lvl) and super()._fused_transfer_ok(lvl)

    def _restrict_into(self, state, lvl, key):
        """Full-weighting restriction of the fine patch into its
        footprint region of the coarse patch (restrict_onto on parents,
        m_restrict.f90:165-214)."""
        if self._whole_region(lvl):
            return super()._restrict_into(state, lvl, key)
        fine = state[key][lvl]
        cfg = self._kcfgs[lvl]
        half = tuple(v // 2 for v in cfg.dims)
        if cfg.use_kernel and dk.transfer_tiles(half) is not None:
            avg = dk.restrict_dense(cfg, fine)[_ISL]
        else:
            win = (2, 2, 2)
            avg = jax.lax.reduce_window(
                fine[_ISL], jnp.zeros((), fine.dtype), jax.lax.add,
                win, win, "VALID") / 8.0
        coarse = state[key][lvl - 1].at[self._region_pad(lvl)].set(avg)
        return self._set(state, key, lvl - 1, coarse)

    def _finish_coarse_rhs(self, state, lvl, lam):
        """rhs_c = A(phi_c) + restrict(res) on the footprint region only
        (parents, m_multigrid.f90:369-383); iold_c = phi_c."""
        if self._whole_region(lvl):
            return super()._finish_coarse_rhs(state, lvl, lam)
        a_phi = self._apply_op(state, lvl - 1, lam)
        reg = self._region_pad(lvl)
        rhs_c = state["rhs"][lvl - 1].at[reg].set(
            a_phi[reg] + state["ires"][lvl - 1][reg])
        state = self._set(state, "rhs", lvl - 1, rhs_c)
        state = self._set(state, "iold", lvl - 1, state["phi"][lvl - 1])
        return state

    def _correct_children(self, state, lvl_c, lam):
        """phi_fine += prolong(phi_c - iold_c) from the footprint region
        plus its one-cell ring (correct_children, m_multigrid.f90:
        387-402; the ring reproduces the boxed corr ghosts: plain
        coarse (phi - iold) neighbors, or the physical-BC synthesis
        difference at domain-flush faces)."""
        lvl = lvl_c + 1
        if self._whole_region(lvl):
            return super()._correct_children(state, lvl_c, lam)
        r0, r1 = self.regions[lvl]
        ext = r1 - r0
        phi_c = state["phi"][lvl_c]
        iold_c = state["iold"][lvl_c]
        corr_full = phi_c - iold_c          # pads garbage, interior exact
        sub = jnp.zeros((int(ext[2]) + 2, int(ext[1]) + 2,
                         int(ext[0]) + 2), self.cfg.dtype)
        sub = sub.at[(slice(1, -1),) * 3].set(corr_full[self._region_pad(lvl)])
        bc = self._bc_static(lvl_c)
        bp = state["bc"][lvl_c]
        dims_c = self.dims[lvl_c]
        pads = (0, dk.PY, dk.PZ)  # pad per dim d (x, y, z)

        def pick(a, d, idx, lo_t, hi_t):
            """Plane of dim d at patch-local cell idx, windowed to the
            region's transverse ranges."""
            sl: List = [slice(None)] * 3
            sl[2 - d] = idx + pads[d]
            for dd in range(3):
                if dd != d:
                    sl[2 - dd] = slice(int(lo_t[dd]) + pads[dd],
                                       int(hi_t[dd]) + pads[dd])
            return a[tuple(sl)]

        for nb in range(6):
            d = nb // 2
            lowside = nb % 2 == 0
            if lowside:
                inside = int(r0[d]) > 0
                layer = int(r0[d]) - 1
            else:
                inside = int(r1[d]) < dims_c[d]
                layer = int(r1[d])
            if inside:
                ring = pick(corr_full, d, layer, r0, r1)
            else:
                # region flush with the coarse patch face — physical by
                # the support gating: ghost(phi) - ghost(iold)
                edge = 0 if lowside else dims_c[d] - 1
                edge2 = 1 if lowside else dims_c[d] - 2
                x1p = pick(phi_c, d, edge, r0, r1)
                x2p = pick(phi_c, d, edge2, r0, r1)
                x1i = pick(iold_c, d, edge, r0, r1)
                x2i = pick(iold_c, d, edge2, r0, r1)
                c0, c1, c2 = bc[nb]
                # transverse window of the static boundary plane
                # (plane layouts: x faces [ZP, YPW]; y faces [ZP, X];
                # z faces [YPW, X] — the x axis is unpadded on planes)
                tdims = [dd for dd in range(3) if dd != d]
                psl: List = [slice(None)] * 2
                for i, dd in enumerate(reversed(tdims)):
                    p = {0: 0, 1: dk.PY, 2: dk.PZ}[dd]
                    psl[i] = slice(int(r0[dd]) + p, int(r1[dd]) + p)
                bpl = bp[nb][tuple(psl)]
                gp = c0 * bpl + c1 * x1p
                gi = c0 * bpl + c1 * x1i
                if c2 != 0.0:
                    gp = gp + c2 * x2p
                    gi = gi + c2 * x2i
                ring = gp - gi
            sl: List = [slice(1, -1)] * 3
            sl[2 - d] = 0 if lowside else -1
            sub = sub.at[tuple(sl)].set(ring)
        vals = self._prolong_rect(sub)
        phi = state["phi"][lvl].at[_ISL].add(vals)
        return self._set(state, "phi", lvl, phi)
