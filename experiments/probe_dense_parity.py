"""On-chip parity probe: Mosaic pair/apply kernels vs the jnp fallback.

Run on the real TPU after any dense-kernel pipeline change — interpret
mode does not model DMA overlap, so a double-buffering bug shows up
only here.
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from octree_mg_tpu.ops import dense_kernels as dk

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 128


def main():
    dims = (SIZE, SIZE, SIZE)
    bc = [(2.0, -1.0, 0.0)] * 6          # Dirichlet
    cfg = dk.DenseStencilConfig(dims, (1.0, 1.0, 1.0), bc,
                                (False, False, False), jnp.float32,
                                b_const=[0.0] * 6)
    assert cfg.use_kernel, "kernel path must be eligible for this probe"
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    phi = jax.random.normal(k1, cfg.pshape, jnp.float32)
    rhs = jax.random.normal(k2, cfg.pshape, jnp.float32)
    lam = jnp.asarray(0.3, jnp.float32)
    planes = [None] * 6
    core = (slice(dk.PZ, dk.PZ + SIZE), slice(dk.PY, dk.PY + SIZE),
            slice(None))

    pk = jax.jit(lambda p, r: dk.pair_sweep_dense(cfg, p, r, lam,
                                                  planes, 0)[core])
    pj = jax.jit(lambda p, r: dk._pair_jnp(cfg, p, r, lam, planes,
                                           0)[core])
    a = np.asarray(pk(phi, rhs))
    b = np.asarray(pj(phi, rhs))
    d = np.max(np.abs(a - b))
    print(f"pair   max|kernel-jnp| = {d:.3e}", flush=True)
    assert d == 0.0, "pair kernel mismatch"

    ak = jax.jit(lambda p, r: dk.stencil_apply_dense(cfg, p, r, lam,
                                                     planes, True)[core])
    aj = jax.jit(lambda p, r: dk._apply_jnp(cfg, p, r, lam, planes,
                                            True)[core])
    a = np.asarray(ak(phi, rhs))
    b = np.asarray(aj(phi, rhs))
    d = np.max(np.abs(a - b))
    print(f"apply  max|kernel-jnp| = {d:.3e}", flush=True)
    assert d == 0.0, "apply kernel mismatch"
    print("PARITY OK", flush=True)


if __name__ == "__main__":
    main()
