"""High-level model API tests."""
import numpy as np

from octree_mg_tpu.models import PoissonSolver


def test_poisson_model_dirichlet_2d():
    ps = PoissonSolver(2, (64, 64), 16)

    def sol_fn(x):
        return np.sin(2 * np.pi * x[..., 0]) * np.sin(2 * np.pi * x[..., 1])

    ps.set_dirichlet(fn=sol_fn)
    ps.set_rhs(rhs_fn=lambda x: -2 * (2 * np.pi) ** 2 * sol_fn(x))
    phi, info = ps.solve(rtol=1e-9)
    assert info["residuals"][-1] < 1e-9 * info["residuals"][0] \
        or info["cycles"] < 50
    x = ps.solver.cell_centers(ps.solver.levels[-1])
    isl = (slice(None),) + (slice(1, -1),) * 2
    err = np.max(np.abs(np.asarray(phi)[isl] - sol_fn(x)[isl]))
    assert err < 5e-3  # discretization error at 64^2


def test_poisson_model_periodic():
    ps = PoissonSolver(2, (64, 64), 16, periodic=True)
    ps.set_rhs(rhs_fn=lambda x: np.cos(2 * np.pi * x[..., 0])
               * np.cos(2 * np.pi * x[..., 1]))
    phi, info = ps.solve(rtol=1e-9)
    assert info["residuals"][-1] <= 1e-8 * max(info["residuals"][0], 1.0)
    # zero-mean solution
    assert abs(np.asarray(phi)[:, 1:-1, 1:-1].mean()) < 1e-10
