"""Explicit ppermute halo exchange vs the GSPMD gather path.

The reference's comm layer ships neighbor faces through per-rank-pair
buffers with receiver-sorted packing (m_communication.f90:37-66,
m_ghost_cells.f90:348-378); the explicit TPU path renders that as
per-shard-offset lax.ppermute exchanges with static send/recv slot maps
(parallel/halo.py).  These tests pin bitwise equality between the two
modes on the 8-virtual-device CPU mesh, at a size where the comm
pattern is non-trivial (128^3, box 16 -> 512 boxes over 8 shards, plus
all coarser levels down to the 2^3 coarse grid).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octree_mg_tpu import (IPHI, IRHS, BCType, MGConfig, MGSolver,
                           build_rectangle)
from octree_mg_tpu.core import topology as topo
from octree_mg_tpu.parallel import halo as halo_mod
from octree_mg_tpu.parallel import sharding as sh

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def make_problem(size=128, box=16, periodic=False, halo="gspmd"):
    ndim = 3
    dsz = np.full(ndim, size)
    tree = build_rectangle(ndim, dsz, box, 1.0 / dsz, np.zeros(ndim),
                           periodic=np.full(ndim, periodic))
    solver = MGSolver(tree, MGConfig(operator="laplacian", halo=halo))
    state = solver.allocate()
    rng = np.random.default_rng(11)
    for lvl in solver.levels:
        shp = np.asarray(state["cc"][lvl][IPHI]).shape
        vals = rng.normal(size=shp)
        state["cc"][lvl] = state["cc"][lvl].at[IPHI].set(jnp.asarray(vals))
    top = solver.levels[-1]
    rhs = rng.normal(size=np.asarray(state["cc"][top][IRHS]).shape)
    isl = (slice(None),) + (slice(1, -1),) * ndim
    z = np.zeros_like(rhs)
    z[isl] = rhs[isl]
    state["cc"][top] = state["cc"][top].at[IRHS].set(jnp.asarray(z))
    return solver, state


def test_exchange_plan_covers_all_cross_shard_faces():
    """Every neighbor relation is either local or in exactly one
    delta-group slot, with receiver-sorted packing."""
    solver, _ = make_problem(size=64, box=8)
    top = solver.levels[-1]
    m = solver.maps[top]
    k = 8
    plan = halo_mod.build_exchange_plan(m, k)
    assert plan is not None
    mloc = m.n_boxes // k
    for nb, d in enumerate(plan["dirs"]):
        dm = m.dirs[nb]
        covered = np.array(d["is_local"], dtype=bool).copy()
        for e in d["exchanges"]:
            assert e["delta"] != 0
            # reconstruct: receiver r consumes slot j from sender (r+delta)%k
            for r in range(k):
                s = (r + e["delta"]) % k
                rows = np.nonzero(e["recv_mask"]
                                  & (np.arange(m.n_boxes) // mloc == r))[0]
                # receiver order ascending, sender buffer in that order
                slots = e["recv_slot"][rows]
                assert np.array_equal(slots, np.arange(len(rows)))
                src_local = e["send_idx"][s, :len(rows)]
                np.testing.assert_array_equal(
                    src_local, dm.nb_loc[rows] % mloc)
                assert not covered[rows].any()
                covered[rows] = True
        np.testing.assert_array_equal(covered, dm.has_nb)


@needs8
@pytest.mark.parametrize("periodic", [False, True])
def test_ppermute_fill_matches_gather_fill(periodic):
    """Ghost fill, both modes, every level: bitwise equal at 128^3."""
    solver_g, state = make_problem(periodic=periodic)
    solver_p, _ = make_problem(periodic=periodic, halo="ppermute")
    mesh = sh.make_mesh(8)
    solver_p.attach_mesh(mesh)

    sstate = sh.shard_state(solver_g, state, mesh)
    out_g = solver_g.fill_ghost(state, IPHI)
    out_p = solver_p.fill_ghost(sstate, IPHI)
    for lvl in solver_g.levels:
        a = np.asarray(out_g["cc"][lvl][IPHI])
        b = np.asarray(out_p["cc"][lvl][IPHI])
        np.testing.assert_array_equal(a, b, err_msg=f"lvl {lvl}")


@needs8
def test_ppermute_vcycle_matches_gspmd():
    """Full V-cycle under the explicit halo == GSPMD mode, bitwise, and
    == single-device, at 128^3 box 16 over 8 shards."""
    solver_g, state = make_problem()
    solver_p, _ = make_problem(halo="ppermute")
    mesh = sh.make_mesh(8)
    solver_p.attach_mesh(mesh)
    sstate = sh.shard_state(solver_g, state, mesh)

    out_g, res_g = solver_g.fas_vcycle(state)
    out_p, res_p = solver_p.fas_vcycle(sstate)
    top = solver_g.levels[-1]
    a = np.asarray(out_g["cc"][top][IPHI])
    b = np.asarray(out_p["cc"][top][IPHI])
    np.testing.assert_array_equal(a, b)
    assert float(res_g) == float(res_p)


@needs8
def test_ppermute_fmg_converges():
    solver, state = make_problem(size=64, box=8, halo="ppermute")
    mesh = sh.make_mesh(8)
    solver.attach_mesh(mesh)
    state = sh.shard_state(solver, state, mesh)
    state, res0 = solver.fas_fmg(state)
    for _ in range(3):
        state, res = solver.fas_fmg(state, have_guess=True)
    assert float(res) < float(res0) * 1e-3
