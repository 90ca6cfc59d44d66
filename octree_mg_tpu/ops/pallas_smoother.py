"""Experimental Pallas (Mosaic) smoother kernels.

Round-2 groundwork for kernel-level pass-count reduction (the XLA path
already runs each pass near the chip's practical bandwidth; the
remaining win is doing red+black+ghost-refresh in fewer HBM passes).

Key trick: on the flat per-box layout ``[n_boxes, (nc+2)^D]`` every
stencil neighbor is a constant lane shift of the flat vector
(x: +-1, y: +-(nc+2), z: +-(nc+2)^2).  Values that wrap across row
boundaries land only in ghost positions, which the red-black interior
mask excludes, so a circular roll is exact.  Flat blocks also tile
(8,128) VMEM with ~1% padding, unlike ``[.., nc+2, nc+2]`` blocks which
pad the lane dimension heavily.

Currently implemented: one masked half-sweep (constant-coefficient
Laplacian/Helmholtz) equivalent to kernels.helmholtz_smooth_half minus
the ghost refresh.  Not wired into the solver; validated against the
jnp path in tests (interpret mode on CPU).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flat_shift(a: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Circular shift along the last (flat spatial) axis; exact for
    masked interior stencils (wrapped values land in masked ghosts)."""
    return jnp.roll(a, shift, axis=-1)


def _mask_flat(ndim: int, nc: int, parity_val: int) -> np.ndarray:
    """Flattened interior+checkerboard mask: cell is updated when it is
    interior and (i+j+k) parity matches (cf. indexmaps.checkerboard_parity)."""
    shape = (nc + 2,) * ndim
    idx = np.indices(shape)  # python index == the reference's 0:nc+1 index
    interior = np.ones(shape, bool)
    for d in range(ndim):
        interior &= (idx[d] >= 1) & (idx[d] <= nc)
    par = idx.sum(axis=0) % 2  # 1-based interior index sum parity
    return (interior & (par == parity_val)).reshape(-1)


def half_sweep_flat(phi_flat: jnp.ndarray, rhs_flat: jnp.ndarray,
                    ndim: int, nc: int, idr2: Sequence[float], lam: float,
                    parity_val: int, block_boxes: int = 8,
                    interpret: bool = False) -> jnp.ndarray:
    """One masked GSRB half-sweep on flat [n, (nc+2)^D] planes."""
    n, S = phi_flat.shape
    shifts = [1]
    if ndim >= 2:
        shifts.append(nc + 2)
    if ndim == 3:
        shifts.append((nc + 2) ** 2)
    s = 0.0
    for d in range(ndim):
        s = s + 2.0 * idr2[d]
    fac = 1.0 / (s + lam)
    mask = jnp.asarray(_mask_flat(ndim, nc, parity_val))

    def kernel(phi_ref, rhs_ref, mask_ref, out_ref):
        phi = phi_ref[:]
        acc = -rhs_ref[:]
        for d, sh in enumerate(shifts):
            # pltpu.roll requires non-negative shifts; -sh == S - sh
            acc = acc + idr2[d] * (pltpu.roll(phi, sh, axis=1)
                                   + pltpu.roll(phi, S - sh, axis=1))
        new = acc * fac
        out_ref[:] = jnp.where(mask_ref[:], new, phi)

    grid = (pl.cdiv(n, block_boxes),)
    bs = pl.BlockSpec((block_boxes, S), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, S), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, S), phi_flat.dtype),
        grid=grid,
        in_specs=[bs, bs, mask_spec],
        out_specs=bs,
        interpret=interpret,
    )(phi_flat, rhs_flat, mask.reshape(1, S))


def half_sweep_boxes(phi: jnp.ndarray, rhs: jnp.ndarray, ndim: int, nc: int,
                     idr2: Sequence[float], lam: float, parity_val: int,
                     interpret: bool = False) -> jnp.ndarray:
    """Wrapper taking/returning [n, (nc+2)^D]-shaped planes."""
    n = phi.shape[0]
    S = int(np.prod(phi.shape[1:]))
    out = half_sweep_flat(phi.reshape(n, S), rhs.reshape(n, S), ndim, nc,
                          idr2, lam, parity_val, interpret=interpret)
    return out.reshape(phi.shape)
