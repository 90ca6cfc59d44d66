"""Fused red+black pair == [sweep, fill, sweep] of the sequential path,
bit-exactly (the recipe the round-2 Mosaic kernel will implement)."""
import jax.numpy as jnp
import numpy as np
import pytest

from octree_mg_tpu import IPHI, IRHS, BCType, MGConfig, MGSolver, build_rectangle
from octree_mg_tpu.ops import ghost as ghost_ops
from octree_mg_tpu.ops import kernels
from octree_mg_tpu.ops.pair_sweep import pair_sweep


@pytest.mark.parametrize("ndim,nc", [(2, 8), (3, 8)])
@pytest.mark.parametrize("periodic", [False, True])
@pytest.mark.parametrize("cntr", [1, 2])
def test_pair_sweep_matches_sequence(ndim, nc, periodic, cntr):
    size = 4 * nc
    dsz = np.full(ndim, size)
    tree = build_rectangle(ndim, dsz, nc, 1.0 / dsz, np.zeros(ndim),
                           periodic=[periodic] * ndim)
    solver = MGSolver(tree, MGConfig(operator="laplacian"))
    if not periodic:
        solver.set_bc(IPHI, BCType.DIRICHLET,
                      fn=lambda x: np.sum(x, axis=-1))
    state = solver.allocate()
    top = solver.levels[-1]
    rng = np.random.default_rng(33)
    shape = np.asarray(state["cc"][top][IPHI]).shape
    phi0 = rng.normal(size=shape)
    rhs = rng.normal(size=shape)
    state["cc"][top] = (state["cc"][top].at[IPHI].set(jnp.asarray(phi0))
                        .at[IRHS].set(jnp.asarray(rhs)))
    # consistent starting ghosts
    state = solver.fill_ghost(state, IPHI, lvl=top)
    dmaps = solver._to_device()
    st = solver.static[top]
    ctx = solver._op_ctx(top, dmaps)
    parity = dmaps[top]["parity"]
    bc_static = solver._bc_static(IPHI, top)
    bc_vals = state["bc"][top]
    cc = state["cc"][top]

    # sequential reference: sweep(cntr), fill, sweep(cntr+1)
    phi_a = kernels.op_smooth_half("laplacian", ctx, cc, 0.0,
                                   parity == (cntr % 2))
    cc_a = cc.at[IPHI].set(phi_a)
    cc_a = ghost_ops.fill_ghost_lvl(cc_a, None, dmaps[top], st, bc_static,
                                    bc_vals, IPHI)
    phi_b = kernels.op_smooth_half("laplacian", ctx, cc_a, 0.0,
                                   parity == ((cntr + 1) % 2))

    # fused pair
    got = pair_sweep(cc[IPHI], cc[IRHS], ndim, st["nc"], ctx.idr2, 0.0,
                     cntr, parity, dmaps[top], st, bc_static, bc_vals)

    isl = (slice(None),) + (slice(1, -1),) * ndim
    np.testing.assert_array_equal(np.asarray(got)[isl],
                                  np.asarray(phi_b)[isl])
