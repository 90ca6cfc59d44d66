"""Microbench: same-level ghost fill cost vs box size, plus raw HBM probes.

Uses the production fill (ops.ghost.fill_ghost_lvl) via a real solver's
maps at 512^3 so the gather pattern is the real one.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE = int(os.environ.get("MG_SIZE", "512"))


def probe_raw():
    """Raw chip ceilings: elementwise saxpy (8x inside one program to
    amortize dispatch) and reduction on 512MB."""
    n = 128 * 1024 * 1024  # 512 MB f32
    x = jnp.ones((n,), jnp.float32)
    y = jnp.ones((n,), jnp.float32)

    @jax.jit
    def saxpy8(x, y):
        for _ in range(8):
            x = x * 1.0001 + y
        return x[0]

    @jax.jit
    def red(x):
        return jnp.sum(x)

    float(saxpy8(x, y))
    t0 = time.perf_counter(); float(saxpy8(x, y))
    dt = time.perf_counter() - t0
    print(f"saxpy x8 512MB: {dt*1e3:.1f} ms -> {8*3*n*4/dt/1e9:.0f} GB/s",
          flush=True)
    float(red(x))
    t0 = time.perf_counter(); s = float(red(x)); dt = time.perf_counter() - t0
    print(f"reduce 512MB: {dt*1e3:.1f} ms -> {n*4/dt/1e9:.0f} GB/s", flush=True)


def bench_fill(box):
    from octree_mg_tpu import IPHI, MGConfig, MGSolver, build_rectangle
    dsz = np.full(3, SIZE)
    tree = build_rectangle(3, dsz, box, 1.0 / dsz, np.zeros(3))
    solver = MGSolver(tree, MGConfig(operator="laplacian", dtype=jnp.float32))
    state = solver.allocate()
    dmaps = solver._to_device()
    top = solver.levels[-1]
    key = jax.random.PRNGKey(0)
    st = solver.static[top]
    shape = (st["n_boxes"],) + (st["nc"] + 2,) * 3
    state["cc"][top] = state["cc"][top].at[IPHI].set(
        jax.random.normal(key, shape, jnp.float32))

    @jax.jit
    def run(state, dmaps):
        for _ in range(8):
            state = solver._fill_ghost_lvl(state, dmaps, top, IPHI)
            # prevent trivial CSE: perturb
            state = solver._set_plane(state, top, IPHI,
                                      state["cc"][top][IPHI] * 1.0000001)
        return jnp.sum(state["cc"][top][IPHI][:, 1, 1, 1])

    t0 = time.perf_counter()
    float(run(state, dmaps))
    print(f"box={box}: fill compile {time.perf_counter()-t0:.1f}s", flush=True)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(state, dmaps))
        best = min(best, time.perf_counter() - t0)
    # per iteration = fill + 1 elementwise pass (2 mem passes); report fill
    per_it = best / 8 * 1e3
    vol = np.prod(shape) * 4
    ew = vol * 2 / 134e9 * 1e3  # elementwise pass estimate at 134 GB/s
    print(f"box={box}: fill+scale {per_it:.2f} ms/it (elementwise part ~{ew:.2f} ms)",
          flush=True)

    # smooth_boxes(1) = 2 half-sweeps + 2 fills, repeated in one program
    lam = jnp.asarray(0.0, jnp.float32)

    @jax.jit
    def run_sm(state, dmaps):
        for _ in range(4):
            state = solver._smooth_boxes(state, dmaps, top, 1, lam)
        return jnp.sum(state["cc"][top][IPHI][:, 1, 1, 1])

    t0 = time.perf_counter()
    float(run_sm(state, dmaps))
    print(f"box={box}: smooth compile {time.perf_counter()-t0:.1f}s", flush=True)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_sm(state, dmaps))
        best = min(best, time.perf_counter() - t0)
    print(f"box={box}: smooth_boxes(1) [2 sweeps+2 fills] "
          f"{best/4*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    if "raw" in sys.argv:
        probe_raw()
    for a in sys.argv[1:]:
        if a != "raw":
            bench_fill(int(a))
