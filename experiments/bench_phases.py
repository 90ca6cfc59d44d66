"""Per-phase timing of the 512^3 FMG: split-mode per-level sections plus
isolated probes (single fill, single sweep-pass smooth_boxes, coarse solve,
update_coarse, correct+prolong) to build the bandwidth budget.
"""
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

from octree_mg_tpu import IPHI, IRHS, MGConfig, MGSolver, build_rectangle

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 256
BOX = 16


def timed(label, fn, *args, reps=2, **kw):
    out = fn(*args, **kw)   # compile
    out = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(out)) if hasattr(out, 'dtype') else None
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.sum(leaf))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:40s} {best*1e3:9.2f} ms", flush=True)
    return best


def main():
    dsz = np.full(3, SIZE)
    tree = build_rectangle(3, dsz, BOX, 1.0 / dsz, np.zeros(3))
    solver = MGSolver(tree, MGConfig(operator="laplacian",
                                     dtype=jnp.float32, fmg_mode="split"))
    state = solver.allocate()
    top = solver.levels[-1]
    st = solver.static[top]
    key = jax.random.PRNGKey(0)
    rhs = jax.random.normal(key, (st["n_boxes"],) + (st["nc"] + 2,) * 3,
                            jnp.float32)
    state["cc"][top] = state["cc"][top].at[IRHS].set(rhs)
    dmaps = solver._to_device()
    lam = jnp.asarray(0.0, jnp.float32)

    # isolated phases at the top level
    fill = jax.jit(lambda s: solver._fill_ghost_lvl(s, dmaps, top, IPHI))
    smooth = jax.jit(lambda s: solver._smooth_boxes(s, dmaps, top, 1, lam))
    upd = jax.jit(lambda s: solver._update_coarse(s, dmaps, top, lam))
    corr = jax.jit(lambda s: solver._correct_children(s, dmaps, top - 1))
    coarse = jax.jit(lambda s: solver._coarse_solve(s, dmaps, lam))
    resid = jax.jit(lambda s: solver._residual_lvl(s, dmaps, top, lam))

    timed("fill_ghost top", fill, state)
    timed("smooth_boxes(1)=2 sweeps+2 fills top", smooth, state)
    timed("residual top", resid, state)
    timed("update_coarse top", upd, state)
    timed("correct_children top-1", corr, state)
    timed("coarse_solve (while_loop)", coarse, state)

    # per-level combo programs (the split FMG path)
    solver.timers.reset() if hasattr(solver.timers, 'reset') else None
    state2, res = solver.fas_fmg(state, have_guess=True)  # compile all
    float(res)
    t0 = time.perf_counter()
    state2, res = solver.fas_fmg(state, have_guess=True)
    float(res)
    print(f"total split FMG: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
    for lvl in solver.levels:
        pass
    try:
        solver.timers.show()
    except Exception as e:
        print("timers.show failed:", e)


if __name__ == "__main__":
    main()
