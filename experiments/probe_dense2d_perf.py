"""2D perf probe on the real chip: boxed vs dense2d FMG.

Timing per CLAUDE.md rules: each measurement loops >=4 cycles inside
host loop of jitted FMGs and ends with a device->host scalar read
(float(res)); first call warms the compile.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from octree_mg_tpu import (BCType, Dense2DMGSolver, IPHI, MGConfig,
                           MGSolver, build_rectangle)

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
BOX = int(sys.argv[2]) if len(sys.argv) > 2 else 16
REPS = 8


def run(kind):
    dsz = np.full(2, SIZE)
    tree = build_rectangle(2, dsz, BOX, 1.0 / dsz, np.zeros(2))
    cfg = MGConfig(operator="laplacian", dtype=jnp.float32)
    if kind == "dense2d":
        sv = Dense2DMGSolver(tree, cfg)
        sv.set_bc(0, BCType.DIRICHLET, 0.0)
        st = sv.allocate()
        st = sv.set_interior(st, sv.levels[-1], "rhs",
                             jnp.ones((SIZE, SIZE), jnp.float32))
    else:
        sv = MGSolver(tree, cfg)
        sv.set_bc(IPHI, BCType.DIRICHLET, 0.0)
        st = sv.allocate()
        top = sv.levels[-1]
        nb = sv.static[top]["n_boxes"]
        nc = sv.static[top]["nc"]
        isl = (slice(None),) + (slice(1, -1),) * 2
        plane = st["cc"][top][1].at[isl].set(
            jnp.ones((nb, nc, nc), jnp.float32))
        st["cc"][top] = st["cc"][top].at[1].set(plane)
    st, res = sv.fas_fmg(st)          # warm compile (have_guess=False)
    res0 = float(res)
    st, res = sv.fas_fmg(st, have_guess=True)   # warm the timed variant
    _ = float(res)
    t0 = time.perf_counter()
    for _ in range(REPS):
        st, res = sv.fas_fmg(st, have_guess=True)
    r = float(res)                    # device->host sync
    dt = (time.perf_counter() - t0) / REPS
    ups = SIZE * SIZE / dt
    print(f"{kind:8s} {SIZE}^2 box {BOX}: {dt*1e3:8.2f} ms/FMG "
          f"{ups:.3e} unknowns/s res {res0:.2e}->{r:.2e}", flush=True)
    return dt


def main():
    td = run("dense2d")
    tb = run("boxed")
    print(f"speedup dense2d vs boxed: {tb/td:.2f}x", flush=True)


if __name__ == "__main__":
    main()
