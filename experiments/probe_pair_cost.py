"""Decompose the fused pair kernel's cost on the real chip.

Variants (argv[2]): 'dma' = identity body (pure windowed-DMA pipeline
cost), 'pair' = the real fused red+black body.  The gap between the two
is the non-overlapped compute.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from octree_mg_tpu.ops import dense_kernels as dk

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 512
WHAT = sys.argv[2] if len(sys.argv) > 2 else "dma"
TILE = ((int(sys.argv[3]), int(sys.argv[4])) if len(sys.argv) > 4
        else (16, 48))


def main():
    dims = (SIZE, SIZE, SIZE)
    bc = [(2.0, -1.0, 0.0)] * 6
    cfg = dk.DenseStencilConfig(dims, (1.0, 1.0, 1.0), bc,
                                (False, False, False), jnp.float32,
                                b_const=[0.0] * 6, tile=TILE)
    assert cfg.use_kernel
    print(f"tile tz={cfg.tz} ty={cfg.ty}", flush=True)
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    phi = jax.random.normal(k1, cfg.pshape, jnp.float32)
    rhs = jax.random.normal(k2, cfg.pshape, jnp.float32)
    lam = jnp.asarray(0.0, jnp.float32)
    planes = [None] * 6

    if WHAT == "dma":
        body = lambda p, r, lam_s, masks, par, bpw: p

        def step(p, r):
            return dk._call_kernel(cfg, body, p, r, lam, planes, None,
                                   hz=2)
    elif WHAT == "pair2":
        def step(p, r):
            return dk.pair_sweep_dense(cfg, p, r, lam, planes, 0,
                                       n_pairs=2)
    elif WHAT == "down":
        def step(p, r):
            return dk.downsweep_dense(cfg, p, r, lam, planes, 0)[0]
    elif WHAT == "ucfused":
        def step(p, r):
            pc, rc = dk.residual_restrict_dense(cfg, p, r, lam, planes)
            return p + pc[5, 8, 0] + rc[5, 8, 0]
    elif WHAT == "apply":
        def step(p, r):
            return dk.stencil_apply_dense(cfg, p, r, lam, planes, True)
    else:
        def step(p, r):
            return dk.pair_sweep_dense(cfg, p, r, lam, planes, 0)

    @jax.jit
    def loop(p, r):
        for _ in range(8):
            p = step(p, r)
        return jnp.sum(p[3, 16])

    t0 = time.perf_counter()
    float(loop(phi, rhs))
    print(f"compile {time.perf_counter()-t0:.1f}s", flush=True)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(phi, rhs))
        best = min(best, time.perf_counter() - t0)
    hz = 4 if WHAT == "pair2" else 2
    npair = 2 if WHAT == "pair2" else 1
    ampp = ((cfg.tz + 2 * hz) * (cfg.ty + 2 * dk.PY)) / (cfg.tz * cfg.ty)
    ampr = ((cfg.tz + 2 * hz - 2) * (cfg.ty + 2 * dk.PY)) / (cfg.tz * cfg.ty)
    passes = ampp + ampr + 1
    gb = SIZE ** 3 * 4 * passes / 1e9
    per = best / 8 / npair
    print(f"{WHAT}: {per*1e3:.2f} ms/pair ({gb/(best/8):.0f} GB/s "
          f"at {passes:.2f}-pass model, {passes/npair:.2f} passes/pair)",
          flush=True)


if __name__ == "__main__":
    main()
