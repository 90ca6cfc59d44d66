"""Ghost-cell (halo) filling as batched gathers + masked linear updates.

TPU-native equivalent of ``/root/reference/src/m_ghost_cells.f90``:

* same-level neighbor copy (``copy_from_nb`` :330-346 and the whole MPI
  buffer path :348-454) -> one row-gather per direction;
* physical BCs (``bc_to_gc`` :665-766): ghost = c0*b + c1*x1 + c2*x2 with
  (Dirichlet: 2,-1,0), (Neumann: +-dr,1,0), (continuous: 0,2,-1);
* refinement boundaries: coarse-side transverse-gradient interpolation
  (``box_gc_for_fine_neighbor`` :500-577, +-0.125 weights) followed by the
  flux-preserving fine-side combination (``sides_rb`` :769-861):
  ghost = 0.5*interp + 0.75*inner1 - 0.25*inner2  (1D: (2*gc+inner)/3).

All faces are written independently (the reference's per-box loop is
order-independent because ghost filling never reads ghost values of the
same level being filled), so the whole level fill is a single fused XLA
computation.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp

from ..core import topology as topo
from ..core.constants import BCType
from ..core.indexmaps import face_slicer


def bc_coeffs(bc_type: BCType, dr_d: float, nb: int):
    """(c0, c1, c2) of ghost = c0*b + c1*x1 + c2*x2 (m_ghost_cells.f90:682-698)."""
    if bc_type == BCType.DIRICHLET:
        return 2.0, -1.0, 0.0
    if bc_type == BCType.NEUMANN:
        return dr_d * topo.neighb_high_pm(nb), 1.0, 0.0
    if bc_type == BCType.CONTINUOUS:
        return 0.0, 2.0, -1.0
    raise ValueError(f"unknown bc type {bc_type}")


def interp_rb_strip(tmp: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Coarse strip -> values straight next to fine points
    (box_gc_for_fine_neighbor, m_ghost_cells.f90:557-576)."""
    if ndim == 1:
        return tmp  # [m, 1]
    if ndim == 2:
        mid = tmp[:, 1:-1]
        g = 0.125 * (tmp[:, 2:] - tmp[:, :-2])
        return jnp.stack([mid - g, mid + g], axis=-1).reshape(tmp.shape[0], -1)
    # 3D: tmp [m, t_hi, t_lo]; fast transverse axis carries grad(1)
    mid = tmp[:, 1:-1, 1:-1]
    g_lo = 0.125 * (tmp[:, 1:-1, 2:] - tmp[:, 1:-1, :-2])
    g_hi = 0.125 * (tmp[:, 2:, 1:-1] - tmp[:, :-2, 1:-1])
    m = tmp.shape[0]

    def ilv_last(a, b):  # interleave along last axis
        return jnp.stack([a, b], axis=-1).reshape(*a.shape[:-1], 2 * a.shape[-1])

    row_lo = ilv_last(mid - g_lo - g_hi, mid + g_lo - g_hi)  # hi even
    row_hi = ilv_last(mid - g_lo + g_hi, mid + g_lo + g_hi)  # hi odd
    out = jnp.stack([row_lo, row_hi], axis=2).reshape(
        m, 2 * mid.shape[1], 2 * mid.shape[2])
    return out


def fill_ghost_lvl(cc_lvl: jnp.ndarray, cc_coarse: Optional[jnp.ndarray],
                   dmaps: Dict, static: Dict, bc_static: List[Dict],
                   bc_vals: Optional[List[jnp.ndarray]], iv: int,
                   ext_gathered: Optional[List[jnp.ndarray]] = None
                   ) -> jnp.ndarray:
    """Fill all ghost faces of variable ``iv`` at one level.

    Args:
      cc_lvl: [n_vars, n, (nc+2)^D] level array.
      cc_coarse: coarse-level array (for refinement boundaries) or None.
      dmaps: device maps {"dirs": [{nb_loc, has_nb, phys_loc, rb_loc,
        rb_cidx}...]}.
      static: {"nc": int, "ndim": int, "mp": [..], "mr": [..]}.
      bc_static: per direction {"c0","c1","c2"} floats for this variable.
      bc_vals: per direction full-face [n, face] raw boundary values b
        (zeros away from physical faces; for IPHI the solver passes
        state-held arrays so e.g. the free-space driver can update them);
        None -> scalar value via bc_static["value"].
      ext_gathered: per direction a precomputed [n, face] neighbor-face
        array (row i = face of box i's neighbor) replacing the global
        row gather — supplied by the explicit ppermute exchange
        (parallel.halo.gather_faces_ppermute); rows without a neighbor
        are garbage and blended away by ``has_nb`` exactly like the
        gather path, so results are bitwise identical.

    Scatter-free on uniform grids: physical faces are blended with a
    dense ``where`` over precomputed masks (XLA scatters would dominate
    compile time at scale); only AMR refinement-boundary faces use a
    row scatter.
    """
    D = static["ndim"]
    nc = static["nc"]
    v = cc_lvl[iv]

    for nb in range(topo.num_neighbors(D)):
        dm = dmaps["dirs"][nb]
        gh_sl = face_slicer(D, nb, nc, 0)
        in1_sl = face_slicer(D, nb, nc, 1)
        in2_sl = face_slicer(D, nb, nc, 2)
        src_sl = face_slicer(D, topo.neighb_rev(nb), nc, 1)

        # same-level neighbors (incl. periodic): gather rows of the source
        # interior face plane (or consume the explicit exchange's output)
        if ext_gathered is not None:
            gathered = ext_gathered[nb]
        else:
            faces = v[src_sl]
            gathered = faces[dm["nb_loc"]]
        mshape = (-1,) + (1,) * (D - 1)
        newface = jnp.where(dm["has_nb"].reshape(mshape), gathered,
                            v[gh_sl])

        # physical boundaries: dense masked blend
        mp = static["mp"][nb]
        if mp > 0:
            bs = bc_static[nb]
            x1 = v[in1_sl]
            x2 = v[in2_sl] if bs["c2"] != 0.0 else 0.0
            if bc_vals is not None:
                const = bs["c0"] * bc_vals[nb]
            else:
                const = bs["c0"] * bs["value"]
            ghost_p = const + bs["c1"] * x1 + bs["c2"] * x2
            newface = jnp.where(dm["is_phys"].reshape(mshape), ghost_p,
                                newface)

        v = v.at[gh_sl].set(newface)

        # refinement boundaries (AMR only): row scatter
        mr = static["mr"][nb]
        if mr > 0:
            cflat = cc_coarse[iv].reshape(-1)
            tmp = cflat[dm["rb_cidx"]]
            gc = interp_rb_strip(tmp, D)
            x1 = v[in1_sl][dm["rb_loc"]]
            if D == 1:
                ghost_rb = (2.0 * gc[:, 0] + x1) / 3.0
            else:
                x2 = v[in2_sl][dm["rb_loc"]]
                ghost_rb = 0.5 * gc + 0.75 * x1 - 0.25 * x2
            v = v.at[(dm["rb_loc"],) + gh_sl[1:]].set(ghost_rb)

    return cc_lvl.at[iv].set(v)
