"""octree_mg_tpu: a TPU-native geometric multigrid framework.

A from-scratch JAX/XLA implementation with the capabilities of the
octree-mg Fortran/MPI library (Teunissen & Keppens, CPC 2019): FAS
multigrid on quadtree/octree block-structured AMR grids, 1D/2D/3D,
Laplacian/Helmholtz/variable-coefficient/anisotropic operators, implicit
diffusion, and a 3D free-space Poisson solver.

Design: SoA per-level arrays in HBM, batched stencil kernels, halo
exchange as static gather maps (sharded across a device mesh), FAS cycle
drivers as single jitted computations.
"""

from .core.constants import (BCType, Geometry, Operator, Smoother, IPHI,
                             IRHS, IOLD, IRES, IVEPS, IVEPS1, IVEPS2, IVEPS3,
                             NUM_VARS)
from .core import tree as tree_mod
from .core.tree import (Tree, build_rectangle, build_amr_centered,
                        add_children, set_leaves_parents, set_next_level_ids,
                        set_neighbors_lvl, set_refinement_boundaries,
                        finalize_amr, box_r_min)
from .solve.multigrid import MGConfig, MGExperimental, MGSolver
from .solve.dense import DenseMGSolver, dense_supported, make_solver
from .solve.dense2d import Dense2DMGSolver, dense2d_supported
from .solve.dense_amr import DenseAMRMGSolver, dense_amr_supported
from .solve.dense_amr2d import Dense2DAMRMGSolver, dense_amr2d_supported
from .solve.dense_forest import DenseForestMGSolver, dense_forest_supported
from .solve.dense_forest2d import (DenseForest2DMGSolver,
                                   dense_forest2d_supported)
from .solve.dense_multiforest import (DenseMultiForest2DMGSolver,
                                      DenseMultiForestMGSolver,
                                      dense_multiforest2d_supported,
                                      dense_multiforest_supported)
from .solve.refine import (RefinedPoisson, RefinedPoisson2D,
                           ShardedRefinedPoisson, solve_refined)
from .solve.refine_forest import RefinedForestPoisson
from .ops.df32 import df32_ok, df32_ok_2d, split_f64

__all__ = [
    "BCType", "Geometry", "Operator", "Smoother",
    "IPHI", "IRHS", "IOLD", "IRES", "IVEPS", "IVEPS1", "IVEPS2", "IVEPS3",
    "NUM_VARS", "Tree", "build_rectangle", "build_amr_centered",
    "add_children", "set_leaves_parents", "set_next_level_ids",
    "set_neighbors_lvl", "set_refinement_boundaries", "finalize_amr",
    "box_r_min", "MGConfig", "MGExperimental", "MGSolver", "DenseMGSolver",
    "dense_supported", "make_solver",
    "Dense2DMGSolver", "dense2d_supported",
    "DenseAMRMGSolver", "dense_amr_supported",
    "Dense2DAMRMGSolver", "dense_amr2d_supported",
    "DenseForestMGSolver", "dense_forest_supported",
    "DenseForest2DMGSolver", "dense_forest2d_supported",
    "DenseMultiForestMGSolver", "dense_multiforest_supported",
    "DenseMultiForest2DMGSolver", "dense_multiforest2d_supported",
    "RefinedPoisson", "RefinedPoisson2D", "ShardedRefinedPoisson",
    "RefinedForestPoisson",
    "solve_refined", "df32_ok", "df32_ok_2d", "split_f64",
]

__version__ = "0.1.0"
