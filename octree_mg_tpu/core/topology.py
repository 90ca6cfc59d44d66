"""Quadtree/octree topology tables, rank-generic over ndim in {1,2,3}.

Replaces the per-NDIM compile-time parameter tables of the reference
(``/root/reference/src/m_data_structures.f90:89-191``) with closed-form
bit arithmetic.  Conventions:

* child index ``c`` is 0-based, bit ``d`` of ``c`` is the offset of the
  child along dimension ``d`` (0 = low half, 1 = high half).  This matches
  the reference's ``mg_child_dix`` ordering exactly (child 1..2^D there).
* neighbor index ``nb = 2*d + (0 if low side else 1)``, 0-based, matching
  the reference's (lowx, highx, lowy, highy, lowz, highz) order.
* spatial indices ``ix`` are 1-based as in the reference.

Array data layout used throughout the framework: ``[box, (z,) (y,) x]``
with x fastest — identical memory order to Fortran's ``cc(i,j,k)``.
The spatial axis of dimension ``d`` in such an array is ``-(d+1)``.
"""
from __future__ import annotations

import numpy as np


def num_children(ndim: int) -> int:
    return 1 << ndim


def num_neighbors(ndim: int) -> int:
    return 2 * ndim


def child_dix(ndim: int) -> np.ndarray:
    """[2^D, D] offset (0/1 per dim) of each child; m_data_structures.f90:94,123,155."""
    n = num_children(ndim)
    return np.array([[(c >> d) & 1 for d in range(ndim)] for c in range(n)],
                    dtype=np.int64)


def child_rev(c: int, d: int) -> int:
    """Mirror child index across dimension d; m_data_structures.f90:96,125,159."""
    return c ^ (1 << d)


def child_adj_nb(ndim: int, nb: int) -> np.ndarray:
    """Children adjacent to neighbor direction nb; m_data_structures.f90:98,127,162."""
    d, high = nb // 2, nb % 2
    return np.array([c for c in range(num_children(ndim))
                     if ((c >> d) & 1) == high], dtype=np.int64)


def child_low(ndim: int, c: int, d: int) -> bool:
    """Whether child c is in the low half along dim d; m_data_structures.f90:100,129,165."""
    return ((c >> d) & 1) == 0


def neighb_dim(nb: int) -> int:
    """Dimension of a neighbor direction; m_data_structures.f90:117,149,190."""
    return nb // 2


def neighb_low(nb: int) -> bool:
    """Whether the neighbor is on the low side; m_data_structures.f90:110,142,183."""
    return nb % 2 == 0


def neighb_rev(nb: int) -> int:
    """Opposite direction; m_data_structures.f90:115,147,188."""
    return nb ^ 1


def neighb_high_pm(nb: int) -> int:
    """-1 for low side, +1 for high side; m_data_structures.f90:112,144,186."""
    return -1 if neighb_low(nb) else 1


def ix_to_ichild(ix: np.ndarray) -> int:
    """Child index (0-based) of a box from its 1-based spatial index.

    Odd ix -> low child.  Mirrors m_data_structures.f90:440-451.
    """
    c = 0
    for d in range(len(ix)):
        c |= (int(ix[d] - 1) & 1) << d
    return c


def spatial_axis(ndim: int, d: int) -> int:
    """Axis of dimension d in a [..., (z,) (y,) x] array (negative index)."""
    assert 0 <= d < ndim
    return -(d + 1)
