"""Count the sharded dense FMG's communication volume per level.

Traces the real ShardedDenseMGSolver FMG program (jax.eval_shape — no
execution, so 512^3 works on CPU) with ``lax.ppermute``/``all_gather``
monkeypatched to record (kind, level-shape, bytes).  Output feeds the
weak-scaling budget in docs/PERF.md: bytes moved per FMG per device vs
the measured kernel times, for K = 2, 4, 8.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
         python experiments/comm_budget.py [size] [K ...]
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from octree_mg_tpu import MGConfig, build_rectangle  # noqa: E402
from octree_mg_tpu.solve.dense_shard import ShardedDenseMGSolver  # noqa: E402


def count(size, K):
    dsz = np.full(3, size)
    tree = build_rectangle(3, dsz, 16, 1.0 / dsz, np.zeros(3))
    mesh = Mesh(np.array(jax.devices()[:K]), ("z",))
    ss = ShardedDenseMGSolver(
        tree, MGConfig(operator="laplacian", dtype=jnp.float32),
        mesh=mesh)
    ss._direct = ()  # skip the direct-solve setup (needs execution)

    events = []
    orig_pp, orig_ag = lax.ppermute, lax.all_gather

    def rec_pp(x, axis_name, perm):
        events.append(("ppermute", x.shape,
                       int(np.prod(x.shape)) * x.dtype.itemsize))
        return orig_pp(x, axis_name, perm)

    def rec_ag(x, axis_name, **kw):
        events.append(("all_gather", x.shape,
                       int(np.prod(x.shape)) * x.dtype.itemsize))
        return orig_ag(x, axis_name, **kw)

    lax.ppermute, lax.all_gather = rec_pp, rec_ag
    try:
        st = ss.allocate()
        jax.eval_shape(
            lambda s, lam: ss._jit_fmg_sharded(s, lam, have_guess=False,
                                               need_res=True),
            st, jnp.zeros((1, 1, 1), jnp.float32))
    finally:
        lax.ppermute, lax.all_gather = orig_pp, orig_ag

    sharded_lvls = [l for l in ss.levels if ss.sharded[l]]
    total = sum(e[2] for e in events)
    by_kind = {}
    for k, shp, b in events:
        by_kind.setdefault(k, [0, 0])
        by_kind[k][0] += 1
        by_kind[k][1] += b
    print(f"size={size}^3 K={K}: sharded levels "
          f"{[ss.dims[l][2] for l in sharded_lvls]} (z extents)")
    for k, (n, b) in sorted(by_kind.items()):
        print(f"  {k:<11} calls={n:3d}  bytes/device={b/1e6:9.3f} MB")
    print(f"  TOTAL bytes moved per device per FMG: {total/1e6:.3f} MB")
    return total


if __name__ == "__main__":
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    ks = [int(a) for a in sys.argv[2:]] or [2, 4, 8]
    for K in ks:
        count(size, K)
