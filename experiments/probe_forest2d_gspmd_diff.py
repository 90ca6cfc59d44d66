"""Bisect the 2D-forest GSPMD sharded-vs-single diff by cycle phase.

The dryrun's forest2d case shows ~1e-10 while every other case is
bitwise.  Run each phase (smooth / update_coarse / coarse / correct /
full FMG) single vs GSPMD-sharded and report the first divergence.

Usage: python experiments/probe_forest2d_gspmd_diff.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from octree_mg_tpu import MGConfig, build_rectangle, make_solver  # noqa: E402
from octree_mg_tpu.core import tree as _tm  # noqa: E402
from octree_mg_tpu.solve.dense_forest2d import DenseForest2DMGSolver  # noqa: E402


def build_forest():
    tf2 = build_rectangle(2, [64] * 2, 4, [1 / 64.] * 2, [0] * 2)
    idsf = tf2.lvls[1].ids
    pick = [int(b) for b in idsf
            if tf2.ix[int(b)][0] <= 8 or tf2.ix[int(b)][1] <= 8]
    _tm.add_children_bulk(tf2, np.array(pick, np.int64))
    _tm.set_leaves_parents(tf2, 1)
    _tm.set_next_level_ids(tf2, 1)
    _tm.set_neighbors_lvl(tf2, 2)
    _tm.finalize_amr(tf2, 2)
    return tf2


def make(shard, mesh):
    sf = make_solver(build_forest(), MGConfig(operator="laplacian",
                                              dtype=jnp.float32))
    assert isinstance(sf, DenseForest2DMGSolver)
    stf = sf.allocate()
    rngf = np.random.default_rng(2)
    for lvl in sf.levels:
        Xf, Yf = sf.dims[lvl]
        stf = sf.set_interior(stf, lvl, "rhs", jnp.asarray(
            rngf.normal(size=(Yf, Xf)), jnp.float32))
    if shard:
        stf = sf.shard_state(stf, mesh, min_local=8)
    return sf, stf


def cmp(tag, sa, a, sb, b):
    worst = 0.0
    for key in ("phi", "rhs", "iold", "ires"):
        for lvl in sa.levels:
            if lvl not in a.get(key, {}):
                continue
            va = np.asarray(a[key][lvl])
            vb = np.asarray(b[key][lvl])
            m = sa.footprint_mask(lvl)
            d = float(np.max(np.abs((va - vb) * m)))
            if d > worst:
                worst = d
            if d > 0:
                print(f"  {tag}: {key}@{lvl} diff {d:.3e}")
    print(f"{tag}: worst {worst:.3e}")
    return worst


def main():
    mesh = Mesh(np.array(jax.devices()[:8]), ("y",))
    sa, a = make(False, mesh)
    sb, b = make(True, mesh)
    print("y_sharded:", sb.y_sharded)
    lam = jnp.asarray(0.0, jnp.float32)

    # phase 1: smooth on each level
    for lvl in sa.levels:
        a1 = jax.jit(lambda st: sa._smooth(st, lvl, 2, lam))(a)
        b1 = jax.jit(lambda st: sb._smooth(st, lvl, 2, lam))(b)
        cmp(f"smooth@{lvl}", sa, a1, sb, b1)

    # phase 2: update_coarse from top down
    a2, b2 = a, b
    for lvl in sorted(sa.levels, reverse=True)[:-1]:
        a2 = jax.jit(lambda st: sa._update_coarse(st, lvl, lam))(a2)
        b2 = jax.jit(lambda st: sb._update_coarse(st, lvl, lam))(b2)
        cmp(f"update_coarse@{lvl}", sa, a2, sb, b2)

    # phase 3: coarse solve
    sa._ensure_direct(a2)
    sb._ensure_direct(b2)
    a3 = jax.jit(lambda st: sa._coarse_solve(st, lam))(a2)
    b3 = jax.jit(lambda st: sb._coarse_solve(st, lam))(b2)
    cmp("coarse_solve", sa, a3, sb, b3)

    # phase 4: correct + smooth upward
    a4, b4 = a3, b3
    for lvl in sa.levels[1:]:
        a4 = jax.jit(lambda st: sa._correct_children(st, lvl - 1, lam))(a4)
        b4 = jax.jit(lambda st: sb._correct_children(st, lvl - 1, lam))(b4)
        cmp(f"correct@{lvl}", sa, a4, sb, b4)
        a4 = jax.jit(lambda st: sa._smooth(st, lvl, 2, lam))(a4)
        b4 = jax.jit(lambda st: sb._smooth(st, lvl, 2, lam))(b4)
        cmp(f"up-smooth@{lvl}", sa, a4, sb, b4)

    # full FMG for reference
    sa2, a0 = make(False, mesh)
    sb2, b0 = make(True, mesh)
    a5, _ = sa2.fas_fmg(a0)
    b5, _ = sb2.fas_fmg(b0)
    cmp("full FMG", sa2, a5, sb2, b5)


if __name__ == "__main__":
    main()
