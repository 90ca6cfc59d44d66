"""Sharded dense-AMR solver: z-slab base levels + replicated patches
on the 8-device CPU mesh vs the single-device dense-AMR solver."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from octree_mg_tpu import (BCType, DenseAMRMGSolver, MGConfig,
                           build_amr_centered)
from octree_mg_tpu.solve.dense_amr_shard import ShardedDenseAMRMGSolver

N_MODES = 2


def solution(x):
    out = 1.0
    for d in range(x.shape[-1]):
        out = out * np.sin(2 * np.pi * N_MODES * x[..., d])
    return out


def setup(n_levels=3, size=32, box=8, coarse="direct"):
    tree = build_amr_centered(3, n_levels, np.full(3, size), box,
                              np.full(3, 1.0 / size))
    sd = DenseAMRMGSolver(tree, MGConfig(operator="laplacian",
                                         coarse_solver=coarse))
    mesh = Mesh(np.array(jax.devices()[:8]), ("z",))
    ss = ShardedDenseAMRMGSolver(tree, MGConfig(operator="laplacian",
                                                coarse_solver=coarse),
                                 mesh=mesh)
    for s in (sd, ss):
        s.set_bc(0, BCType.DIRICHLET, fn=solution)
    st_d = sd.allocate()
    st_s = ss.allocate()
    rng = np.random.default_rng(7)
    for lvl in sd.levels:
        for key in ("phi", "rhs"):
            vals = rng.normal(size=tuple(np.asarray(sd.dims[lvl])[::-1]))
            st_d = sd.set_interior(st_d, lvl, key, jnp.asarray(vals))
            st_s = ss.set_interior(st_s, lvl, key, jnp.asarray(vals))
    return sd, st_d, ss, st_s


def test_sharding_decisions():
    sd, st_d, ss, st_s = setup(n_levels=3, size=32, box=8)
    # 32^3 base full levels shard (Zl=4); patch levels replicate
    full = [lvl for lvl in ss.levels
            if tuple(ss.dims[lvl]) == tuple(
                int(v) for v in ss.tree.domain_size_lvl[lvl])]
    assert any(ss.sharded[lvl] for lvl in full)
    for lvl in ss.levels:
        if not ss._full_level(lvl):
            assert not ss.sharded[lvl]
    # at least one sharded->replicated-patch transition exists
    assert any(ss.sharded[lvl - 1] and not ss.sharded[lvl]
               and not ss._whole_region(lvl)
               for lvl in ss.levels if lvl - 1 in ss.levels)


@pytest.mark.parametrize("n_levels", [2, 3])
def test_sharded_amr_fmg_matches_single(n_levels):
    sd, st_d, ss, st_s = setup(n_levels=n_levels)
    st_d, res_d = sd.fas_fmg(st_d)
    st_s, res_s = ss.fas_fmg(st_s)
    for lvl in sd.levels:
        a = np.asarray(sd.interior(st_d, lvl, "phi"))
        b = np.asarray(ss.interior(st_s, lvl, "phi"))
        scale = max(np.max(np.abs(a)), 1e-30)
        assert np.max(np.abs(a - b)) <= 1e-12 * scale, (
            f"lvl {lvl}: sharded AMR vs single diff {np.max(np.abs(a - b))}")
    assert abs(float(res_d) - float(res_s)) <= 1e-10 * max(
        1.0, float(res_d))


def test_sharded_amr_vcycle_matches_single():
    sd, st_d, ss, st_s = setup(n_levels=3, coarse="smooth")
    st_d, res_d = sd.fas_vcycle(st_d)
    st_s, res_s = ss.fas_vcycle(st_s)
    top = sd.levels[-1]
    a = np.asarray(sd.interior(st_d, top, "phi"))
    b = np.asarray(ss.interior(st_s, top, "phi"))
    scale = max(np.max(np.abs(a)), 1e-30)
    assert np.max(np.abs(a - b)) <= 1e-12 * scale
    assert abs(float(res_d) - float(res_s)) <= 1e-10 * max(
        1.0, float(res_d))


def test_sharded_amr_convergence():
    """Manufactured solution: the sharded AMR solver drives the leaf
    error to the discretization level (test_refinement.f90 semantics on
    the distributed fast path)."""
    tree = build_amr_centered(3, 3, np.full(3, 32), 8,
                              np.full(3, 1.0 / 32))
    mesh = Mesh(np.array(jax.devices()[:8]), ("z",))
    ss = ShardedDenseAMRMGSolver(tree, MGConfig(operator="laplacian"),
                                 mesh=mesh)
    ss.set_bc(0, BCType.DIRICHLET, fn=solution)
    st = ss.allocate()
    # discretely-generated rhs via the single-device solver (the public
    # apply entry runs outside shard_map and the sharded layout)
    sd = DenseAMRMGSolver(tree, MGConfig(operator="laplacian"))
    sd.set_bc(0, BCType.DIRICHLET, fn=solution)
    st_d = sd.allocate()
    for lvl in sd.levels:
        x = sd.cell_centers(lvl)
        st_d = sd.set_interior(st_d, lvl, "phi", jnp.asarray(solution(x)))
    st_d = sd.apply_operator(st_d, lam=0.0, out_key="rhs")
    for lvl in ss.levels:
        st = ss.set_interior(st, lvl, "rhs",
                             jnp.asarray(sd.interior(st_d, lvl, "rhs")))
    for i in range(6):
        st, res = ss.fas_fmg(st, have_guess=(i > 0))
    top = ss.levels[-1]
    x = ss.cell_centers(top)
    err = np.max(np.abs(np.asarray(ss.interior(st, top, "phi"))
                        - solution(x)))
    assert err < 5e-2, err
