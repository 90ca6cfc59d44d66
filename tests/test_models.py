"""High-level model API tests.

PoissonSolver routes uniform trees to the dense fast paths via
make_solver; solve()/phi() then return the assembled global interior
array.  AMR trees (or non-GSRB configs) keep the boxed solver and its
ghost-padded per-box planes.
"""
import numpy as np

from octree_mg_tpu import Dense2DMGSolver, MGSolver
from octree_mg_tpu.models import PoissonSolver


def test_poisson_model_dirichlet_2d():
    ps = PoissonSolver(2, (64, 64), 16)
    assert isinstance(ps.solver, Dense2DMGSolver)

    def sol_fn(x):
        return np.sin(2 * np.pi * x[..., 0]) * np.sin(2 * np.pi * x[..., 1])

    ps.set_dirichlet(fn=sol_fn)
    ps.set_rhs(rhs_fn=lambda x: -2 * (2 * np.pi) ** 2 * sol_fn(x))
    phi, info = ps.solve(rtol=1e-9)
    assert info["residuals"][-1] < 1e-9 * info["residuals"][0] \
        or info["cycles"] < 50
    x = ps.solver.cell_centers(ps.solver.levels[-1])
    err = np.max(np.abs(np.asarray(phi) - sol_fn(x)))
    assert err < 5e-3  # discretization error at 64^2


def test_poisson_model_periodic():
    ps = PoissonSolver(2, (64, 64), 16, periodic=True)
    ps.set_rhs(rhs_fn=lambda x: np.cos(2 * np.pi * x[..., 0])
               * np.cos(2 * np.pi * x[..., 1]))
    phi, info = ps.solve(rtol=1e-9)
    assert info["residuals"][-1] <= 1e-8 * max(info["residuals"][0], 1.0)
    # zero-mean solution
    assert abs(np.asarray(phi).mean()) < 1e-10


def test_poisson_model_boxed_fallback():
    """Non-GSRB smoother keeps the boxed solver and its per-box plane
    return contract."""
    ps = PoissonSolver(2, (32, 32), 8, smoother="jacobi")
    assert isinstance(ps.solver, MGSolver)
    ps.set_dirichlet(0.0)
    ps.set_rhs(rhs_fn=lambda x: np.ones(x.shape[:-1]))
    phi, info = ps.solve(rtol=1e-6, max_cycles=30)
    assert info["residuals"][-1] < 1e-5 * info["residuals"][0]
    assert np.asarray(phi).ndim == 3  # [n_boxes, nc+2, nc+2]


def test_poisson_model_3d_dense():
    from octree_mg_tpu import DenseMGSolver
    ps = PoissonSolver(3, (16, 16, 16), 8)
    assert isinstance(ps.solver, DenseMGSolver)

    def sol_fn(x):
        out = 1.0
        for d in range(3):
            out = out * np.sin(2 * np.pi * x[..., d])
        return out

    ps.set_dirichlet(fn=sol_fn)
    ps.set_rhs(rhs_fn=lambda x: -3 * (2 * np.pi) ** 2 * sol_fn(x))
    phi, info = ps.solve(rtol=1e-8)
    x = ps.solver.cell_centers(ps.solver.levels[-1])
    err = np.max(np.abs(np.asarray(phi) - sol_fn(x)))
    assert err < 0.1  # discretization error at 16^3
    assert info["residuals"][-1] < 1e-7 * info["residuals"][0]


def test_poisson_model_solve_refined():
    """solve_refined reaches the f64 accuracy class through the model
    API (f32 inner solver + df32 outer refinement)."""
    import jax.numpy as jnp
    from octree_mg_tpu import DenseMGSolver
    ps = PoissonSolver(3, (32, 32, 32), 8, dtype=jnp.float32)
    assert isinstance(ps.solver, DenseMGSolver)
    ps.set_dirichlet(0.0)
    rng = np.random.default_rng(3)
    rhs64 = rng.normal(size=(32, 32, 32))
    phi, info = ps.solve_refined(rhs64, n_outer=8)
    assert phi.dtype == np.float64
    r = info["residuals"]
    assert r[-1] <= 1e-10 * r[0], r


def test_poisson_model_solve_refined_2d():
    """2D solve_refined routes to RefinedPoisson2D through the model."""
    import jax.numpy as jnp
    from octree_mg_tpu import Dense2DMGSolver
    ps = PoissonSolver(2, (64, 64), 16, dtype=jnp.float32)
    assert isinstance(ps.solver, Dense2DMGSolver)
    ps.set_dirichlet(0.0)
    rng = np.random.default_rng(4)
    phi, info = ps.solve_refined(rng.normal(size=(64, 64)), n_outer=8,
                                 bc_values=[0.1, -0.2, 0.3, 0.0])
    r = info["residuals"]
    assert phi.dtype == np.float64 and r[-1] <= 1e-10 * r[0], r
