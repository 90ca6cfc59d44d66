"""Fused red+black smoother pair: the validated one-pass recipe.

The reference smoother alternates half-sweeps with full ghost refreshes
(smooth_boxes, m_multigrid.f90:404-424).  A fused kernel that performs
[red sweep -> ghost refresh -> black sweep] in one memory pass must
reproduce the refreshed ghosts *without* materializing them: after the
red half-sweep, my ghost value equals my neighbor's face cell, which was
itself red-updated from pre-sweep data that is entirely contained in a
2-cell-deep neighbor strip (including the strip's own transverse ghost
entries, which are pre-pair values — exactly what the reference's red
sweep read).  No corner data is needed: corner-adjacent information only
propagates into the *next* pair through the materialized fill that
follows.

This module implements that recipe in plain jnp at box granularity and
proves bit-exactness against the sequential path
(tests/test_pair_sweep.py).  The round-2 Mosaic kernel ports this
computation with the strips DMA'd per block; per red+black pair it
replaces two full-plane sweeps and two ghost fills with one fused pass
plus one fill.

Scope: constant-coefficient cartesian Laplacian/Helmholtz, levels
without refinement boundaries (same guard as the other fused modes).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp

from ..core import topology as topo
from ..core.indexmaps import face_slicer
from .kernels import _iv, _set_interior, helmholtz_smooth_half


def _face_parity_matches(ndim: int, nc: int, nb: int, cntr: int):
    """Boolean [..(nc,)*(ndim-1)] mask: does the *neighbor's* face cell
    at each transverse position have the parity updated at substep cntr?

    Update condition: (sum of 1-based local indices + cntr) even.  The
    neighbor's normal index is nc (low side of me) or 1 (high side);
    transverse indices match mine.
    """
    import numpy as np

    norm_idx = nc if topo.neighb_low(nb) else 1
    if ndim == 1:
        s = norm_idx
        return np.array((s + cntr) % 2 == 0)
    grids = np.meshgrid(*[np.arange(1, nc + 1)] * (ndim - 1), indexing="ij")
    s = sum(grids) + norm_idx
    return (s + cntr) % 2 == 0


def pair_sweep(phi: jnp.ndarray, rhs: jnp.ndarray, ndim: int, nc: int,
               idr2: Sequence[float], lam, cntr: int, parity,
               dmaps_lvl: Dict, static: Dict, bc_static: List[Dict],
               bc_vals: Optional[List[jnp.ndarray]]) -> jnp.ndarray:
    """Two consecutive half-sweeps (cntr and cntr+1) with the intermediate
    ghost refresh computed inline from 2-deep neighbor strips.

    Returns phi after the black sweep, with the ghost ring in the state
    the sequential path leaves it *before* its final fill (the caller
    performs the trailing materialized fill, as smooth_boxes does).
    """
    mshape = (-1,) + (1,) * (ndim - 1)
    # accumulate the denominator exactly like helmholtz_smooth_half so
    # the reciprocal is bit-identical
    s = 0.0
    for dd in range(ndim):
        s = s + 2.0 * idr2[dd]
    fac = 1.0 / (s + lam)

    # ---- red half-sweep on the interior (reads pre-pair ghosts) ----
    phi1 = helmholtz_smooth_half(phi, rhs, ndim, nc, idr2, lam,
                                 parity == (cntr % 2))

    # ---- inline ghost refresh: neighbor faces post-red ----
    for nb in range(topo.num_neighbors(ndim)):
        dm = dmaps_lvl["dirs"][nb]
        d = topo.neighb_dim(nb)
        gh_sl = face_slicer(ndim, nb, nc, 0)
        # neighbor-side slices (from the *pre-red* phi):
        rev = topo.neighb_rev(nb)
        # depth-1/2 full-transverse planes of every box, then row-gather
        strip1_full = _full_transverse_plane(phi, ndim, nb, nc, depth=1)
        strip2_full = _full_transverse_plane(phi, ndim, nb, nc, depth=2)
        rhs1_full = _full_transverse_plane(rhs, ndim, nb, nc, depth=1)
        s1 = strip1_full[dm["nb_loc"]]   # [n, (nc+2)^(D-1)] incl ghosts
        s2 = strip2_full[dm["nb_loc"]]
        r1 = rhs1_full[dm["nb_loc"]]
        # red update of the neighbor's face cells (its stencil):
        #   normal dir: depth-2 cell (s2) and MY face cell pre-red
        my_face = phi[face_slicer(ndim, nb, nc, 1)]
        # accumulate dimension terms in ascending order, exactly like
        # helmholtz_smooth_half, so the fused result is bit-identical
        acc = -_interior_t(r1, ndim, nc)
        td = 0
        for dd in range(ndim):
            if dd == d:
                acc = acc + idr2[d] * (_interior_t(s2, ndim, nc) + my_face)
            else:
                # plane transverse axes are ordered slow->fast (descending
                # dim number); transverse dim #td (ascending) sits at axis
                # (ndim-2)-td
                ax = (ndim - 2) - td
                acc = acc + idr2[dd] * (_shift_t(s1, ndim, nc, ax, -1)
                                        + _shift_t(s1, ndim, nc, ax, +1))
                td += 1
        red_val = acc * fac
        upd = jnp.asarray(_face_parity_matches(ndim, nc, nb, cntr))
        ghost = jnp.where(upd, red_val, _interior_t(s1, ndim, nc))
        ghost = jnp.where(dm["has_nb"].reshape(mshape), ghost,
                          phi1[gh_sl])
        # physical faces: bc formula on the post-red interior
        if static["mp"][nb] > 0:
            bs = bc_static[nb]
            x1 = phi1[face_slicer(ndim, nb, nc, 1)]
            gp = bs["c0"] * (bc_vals[nb] if bc_vals is not None
                             else bs["value"]) + bs["c1"] * x1
            if bs["c2"] != 0.0:
                gp = gp + bs["c2"] * phi1[face_slicer(ndim, nb, nc, 2)]
            ghost = jnp.where(dm["is_phys"].reshape(mshape), gp, ghost)
        phi1 = phi1.at[gh_sl].set(ghost)

    # ---- black half-sweep ----
    return helmholtz_smooth_half(phi1, rhs, ndim, nc, idr2, lam,
                                 parity == ((cntr + 1) % 2))


def _full_transverse_plane(a: jnp.ndarray, ndim: int, nb: int, nc: int,
                           depth: int) -> jnp.ndarray:
    """Plane at normal depth on the *reverse* side (the neighbor's side
    facing me), with FULL transverse extent 0..nc+1 (its own ghosts)."""
    rev = topo.neighb_rev(nb)
    d = topo.neighb_dim(nb)
    idx = depth if topo.neighb_low(rev) else nc + 1 - depth
    sl: list = [slice(None)]
    for dd in reversed(range(ndim)):
        sl.append(idx if dd == d else slice(None))
    return a[tuple(sl)]


def _interior_t(face: jnp.ndarray, ndim: int, nc: int) -> jnp.ndarray:
    """Transverse interior (1..nc) of a full face plane."""
    return face[(slice(None),) + (slice(1, nc + 1),) * (ndim - 1)]


def _shift_t(face: jnp.ndarray, ndim: int, nc: int, t_axis: int,
             s: int) -> jnp.ndarray:
    """Interior view of a full face plane shifted along transverse axis
    t_axis (0 = slower); t axes are ordered slow->fast like the plane."""
    sl: list = [slice(None)]
    for ax in range(ndim - 1):
        off = s if ax == t_axis else 0
        sl.append(slice(1 + off, nc + 1 + off))
    return face[tuple(sl)]
