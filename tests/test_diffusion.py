"""Implicit diffusion driver tests (m_diffusion.f90 parity).

A periodic single-mode field decays analytically under the heat equation:
phi(t) = exp(-D*k^2*t) * sin(k x)..., so backward-Euler / 2nd-order
solutions must match to the scheme's order.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from octree_mg_tpu import (IPHI, IRHS, IVEPS, BCType, MGConfig, MGSolver,
                           build_rectangle)
from octree_mg_tpu.solve import diffusion


def periodic_solver(ndim, size, box, operator):
    dsz = np.full(ndim, size)
    tree = build_rectangle(ndim, dsz, box, 1.0 / dsz, np.zeros(ndim),
                           periodic=[True] * ndim)
    return MGSolver(tree, MGConfig(operator=operator))


def set_mode(solver, state, iv=IPHI):
    for lvl in solver.levels:
        x = solver.cell_centers(lvl)
        f = np.sin(2 * np.pi * x[..., 0])
        for d in range(1, solver.ndim):
            f = f * np.cos(2 * np.pi * x[..., d])
        state["cc"][lvl] = state["cc"][lvl].at[iv].set(jnp.asarray(f))
    return state


@pytest.mark.parametrize("order,tol", [(1, 0.05), (2, 0.004)])
def test_diffusion_decay_2d(order, tol):
    D = 1.0
    k2 = 2 * (2 * np.pi) ** 2
    dt = 0.2 / k2
    solver = periodic_solver(2, 64, 16, "helmholtz")
    state = solver.allocate()
    state = set_mode(solver, state)
    state = solver.fill_ghost(state, IPHI)

    n_steps = 4
    for _ in range(n_steps):
        state, _ = diffusion.diffusion_solve(solver, state, dt, D,
                                             order=order, max_res=1e-9)
    top = solver.levels[-1]
    x = solver.cell_centers(top)
    exact = (np.exp(-D * k2 * dt * n_steps) * np.sin(2 * np.pi * x[..., 0])
             * np.cos(2 * np.pi * x[..., 1]))
    isl = (slice(None),) + (slice(1, -1),) * 2
    got = np.asarray(state["cc"][top][IPHI])[isl]
    err = np.max(np.abs(got - exact[isl]))
    assert err < tol, f"order-{order} diffusion error {err}"


def test_diffusion_vcoeff_matches_constant():
    """With IVEPS == D constant, vcoeff solve equals the constant-D solve."""
    D = 0.7
    k2 = 2 * (2 * np.pi) ** 2
    dt = 0.3 / k2

    sv = periodic_solver(2, 32, 8, "vhelmholtz")
    st_v = sv.allocate()
    st_v = set_mode(sv, st_v)
    for lvl in sv.levels:
        st_v["cc"][lvl] = st_v["cc"][lvl].at[IVEPS].set(D)
    st_v = sv.fill_ghost(st_v, IPHI)
    st_v, _ = diffusion.diffusion_solve_vcoeff(sv, st_v, dt, order=2,
                                               max_res=1e-9)

    sc = periodic_solver(2, 32, 8, "helmholtz")
    st_c = sc.allocate()
    st_c = set_mode(sc, st_c)
    st_c = sc.fill_ghost(st_c, IPHI)
    st_c, _ = diffusion.diffusion_solve(sc, st_c, dt, D, order=2,
                                        max_res=1e-9)

    top = sv.levels[-1]
    isl = (slice(None),) + (slice(1, -1),) * 2
    a = np.asarray(st_v["cc"][top][IPHI])[isl]
    b = np.asarray(st_c["cc"][top][IPHI])[isl]
    np.testing.assert_allclose(a, b, atol=2e-7)


def test_diffusion_acoeff_anisotropic_decay():
    """Anisotropic D = (Dx, Dy): mode decays with Dx*kx^2 + Dy*ky^2."""
    Dx, Dy = 1.0, 0.25
    k2 = (2 * np.pi) ** 2 * (Dx + Dy)
    dt = 0.2 / k2
    solver = periodic_solver(2, 64, 16, "ahelmholtz")
    state = solver.allocate()
    state = set_mode(solver, state)
    for d, Dv in enumerate((Dx, Dy)):
        for lvl in solver.levels:
            state["cc"][lvl] = state["cc"][lvl].at[IVEPS + d].set(Dv)
    state = solver.fill_ghost(state, IPHI)
    n_steps = 3
    for _ in range(n_steps):
        state, _ = diffusion.diffusion_solve_acoeff(solver, state, dt,
                                                    order=2, max_res=1e-9)
    top = solver.levels[-1]
    x = solver.cell_centers(top)
    exact = (np.exp(-k2 * dt * n_steps) * np.sin(2 * np.pi * x[..., 0])
             * np.cos(2 * np.pi * x[..., 1]))
    isl = (slice(None),) + (slice(1, -1),) * 2
    got = np.asarray(state["cc"][top][IPHI])[isl]
    assert np.max(np.abs(got - exact[isl])) < 0.01


def test_prepare_coefficient_helper():
    """solver.prepare_coefficient restricts eps to all levels and fills
    its ghosts (Neumann-zero, m_vlaplacian.f90:25-28)."""
    solver = periodic_solver(2, 32, 8, "vhelmholtz")
    state = solver.allocate()
    top = solver.levels[-1]
    x = solver.cell_centers(top)
    eps = np.zeros(x.shape[:-1])
    isl = (slice(None),) + (slice(1, -1),) * 2
    eps[isl] = 1.0 + 0.5 * x[isl][..., 0]
    state["cc"][top] = state["cc"][top].at[IVEPS].set(jnp.asarray(eps))
    state = solver.prepare_coefficient(state, IVEPS)
    for lvl in solver.levels:
        e = np.asarray(state["cc"][lvl][IVEPS])
        assert np.all(e[isl] > 0.99), f"eps missing on lvl {lvl}"
    # ghosts filled (periodic wrap: ghost equals opposite face interior)
    e_top = np.asarray(state["cc"][top][IVEPS])
    np.testing.assert_allclose(e_top[:, 1:-1, 0],
                               np.asarray(state["cc"][top][IVEPS])[:, 1:-1, 0])
