"""Dissect the small-problem FMG floor: FMG(64) measures ~13 ms on the
chip although its arrays are tiny.  Time the individual jitted pieces of
the dense solver at 64^3 to find where the floor lives (XLA op-count
overhead at tiny levels, the direct solve, reductions, ...)."""
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

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 64


def timed(label, fn, *args, reps=4):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:34s} {best/reps*1e3:9.3f} ms", flush=True)


def main():
    dsz = np.full(3, SIZE)
    tree = build_rectangle(3, dsz, 16, 1.0 / dsz, np.zeros(3))
    sd = DenseMGSolver(tree, MGConfig(operator="laplacian",
                                      dtype=jnp.float32))
    st = sd.allocate()
    top = sd.levels[-1]
    key = jax.random.PRNGKey(0)
    st = sd.set_interior(st, top, "rhs",
                         jax.random.normal(key, (SIZE,) * 3, jnp.float32))
    lam = jnp.asarray(0.0, jnp.float32)
    sd._ensure_direct()
    print("levels:", sd.levels, "direct:",
          isinstance(sd._direct, dict), flush=True)

    def loop4(f):
        @jax.jit
        def g(st):
            for _ in range(4):
                st = f(st)
            return st
        return g

    timed("4x smooth(top, 1 pair)", loop4(
        lambda s: sd._smooth(s, top, 2, lam)), st, reps=8)
    lo = sd.levels[0]
    timed("4x smooth(coarsest, 1 pair)", loop4(
        lambda s: sd._smooth(s, lo, 2, lam)), st, reps=8)
    timed("4x coarse_direct", loop4(
        lambda s: sd._coarse_direct(s, lam)), st, reps=4)
    timed("4x down_leg(top)", loop4(
        lambda s: sd._down_leg(s, top, lam)), st, reps=4)
    timed("4x correct_children(top-1)", loop4(
        lambda s: sd._correct_children(s, top - 1, lam)), st, reps=4)
    timed("4x update_coarse(top)", loop4(
        lambda s: sd._update_coarse(s, top, lam)), st, reps=4)

    @jax.jit
    def vc(s):
        s, r = sd._vcycle(s, lam, None, True, False)
        return s
    timed("1x vcycle(full, no res)", vc, st, reps=1)

    @jax.jit
    def vc_res(s):
        s, r = sd._vcycle(s, lam, None, True, True)
        return s
    timed("1x vcycle(full, res)", vc_res, st, reps=1)

    @jax.jit
    def fmg(s):
        s, r = sd._fmg(s, lam, True, False)
        return s
    timed("1x fmg(no res)", fmg, st, reps=1)


if __name__ == "__main__":
    main()
