"""Solver-wide constants and enums.

TPU-native re-design of the reference's constant block
(``/root/reference/src/m_data_structures.f90:13-87``).  Values are kept
semantically identical but re-expressed as Python enums / 0-based indices.
"""
from __future__ import annotations

import enum


class Operator(enum.Enum):
    """Operator families (m_data_structures.f90:13-26)."""

    LAPLACIAN = "laplacian"
    VLAPLACIAN = "vlaplacian"
    HELMHOLTZ = "helmholtz"
    VHELMHOLTZ = "vhelmholtz"
    AHELMHOLTZ = "ahelmholtz"


class Geometry(enum.Enum):
    """Coordinate systems (m_data_structures.f90:28-33)."""

    CARTESIAN = "cartesian"
    CYLINDRICAL = "cylindrical"


class Smoother(enum.Enum):
    """Smoother types (m_data_structures.f90:35-37).

    The reference's lexicographic ``gs`` sweep is inherently sequential per
    box and does not map to the VPU; on TPU it is aliased to ``gsrb``
    (the reference itself supports both with identical kernels,
    m_laplacian.f90:68-73).  ``jacobi`` is the damped w=2/3 Jacobi the
    reference keeps in commented form (m_laplacian.f90:116-152).
    """

    GSRB = "gsrb"
    GS = "gs"  # aliased to GSRB on TPU
    JACOBI = "jacobi"


class BCType(enum.IntEnum):
    """Physical boundary condition types (m_data_structures.f90:72-79)."""

    DIRICHLET = 0
    NEUMANN = 1
    CONTINUOUS = 2


# Cell-centered variable indices (0-based; m_data_structures.f90:43-65)
IPHI = 0   # solution
IRHS = 1   # right-hand side
IOLD = 2   # previous solution (FAS correction)
IRES = 3   # residual
IVEPS = 4  # variable coefficient (vlaplacian / vhelmholtz)
# anisotropic coefficients occupy IVEPS .. IVEPS+ndim-1
IVEPS1 = 4
IVEPS2 = 5
IVEPS3 = 6

NUM_VARS = 4  # number of predefined variables (mg_num_vars)

# Tree sentinels.  The reference uses mg_no_box=0 / mg_physical_boundary=-1
# and stores bc types as other negative values in the neighbors array
# (m_data_structures.f90:81-84); here ids are 0-based so sentinels are
# negative and bc types live in a separate table.
NO_BOX = -1            # refinement boundary (no same-level neighbor)
PHYS_BOUNDARY = -2     # physical domain boundary

# Level bounds (m_data_structures.f90:67-70)
LVL_LO = -20
LVL_HI = 20
