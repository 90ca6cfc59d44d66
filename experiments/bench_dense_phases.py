"""Time the non-kernel dense phases (restriction, prolongation,
correction ring build) at 512^3 on the TPU — pure XLA, no Pallas."""
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from octree_mg_tpu import DenseMGSolver, MGConfig, build_rectangle
from octree_mg_tpu.solve.dense import _ISL

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 512


def timed(label, fn, *args):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf[3, 3]) if leaf.ndim > 1 else jnp.sum(leaf))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf[3, 3]) if leaf.ndim > 1 else jnp.sum(leaf))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:32s} {best*1e3:9.2f} ms", flush=True)


def main():
    dsz = np.full(3, SIZE)
    tree = build_rectangle(3, dsz, 16, 1.0 / dsz, np.zeros(3))
    sd = DenseMGSolver(tree, MGConfig(operator="laplacian",
                                      dtype=jnp.float32))
    st = sd.allocate()
    top = sd.levels[-1]
    key = jax.random.PRNGKey(0)
    st = sd.set_interior(st, top, "phi",
                         jax.random.normal(key, (SIZE,) * 3, jnp.float32))
    st = sd.set_interior(st, top, "iold",
                         jax.random.normal(key, (SIZE,) * 3, jnp.float32))
    lam = jnp.asarray(0.0, jnp.float32)

    restrict = jax.jit(lambda s: sd._restrict_into(s, top, "phi")["phi"][top - 1])
    corr = jax.jit(lambda s: sd._corr_with_ring(s, top - 1))
    prolong = jax.jit(lambda s: sd._prolong_rect(sd._corr_with_ring(s, top - 1)))
    correct = jax.jit(lambda s: sd._correct_children(s, top - 1, lam)["phi"][top])
    sync = jax.jit(lambda s: sd._sync_pads(s["phi"][top], top))
    setisl = jax.jit(lambda s: s["phi"][top].at[_ISL].add(1.0))

    timed("restrict 512->256", restrict, st)
    timed("corr_with_ring 256", corr, st)
    timed("prolong(corr) 256->512", prolong, st)
    timed("correct_children 256->512", correct, st)
    timed("sync_pads top (no-op)", sync, st)
    timed("at[ISL].add top", setisl, st)


if __name__ == "__main__":
    main()
