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


def sync_pads(arr, dims, periodic):
    X, Y, Z = dims
    PZ, PY = dk.PZ, dk.PY
    if periodic[2]:
        d = min(PZ, Z)
        arr = arr.at[PZ - d:PZ].set(arr[Z + PZ - d:Z + PZ])
        arr = arr.at[Z + PZ:Z + PZ + d].set(arr[PZ:PZ + d])
    if periodic[1]:
        d = min(PZ, Y)
        arr = arr.at[:, PY - d:PY].set(arr[:, Y + PY - d:Y + PY])
        arr = arr.at[:, Y + PY:Y + PY + d].set(arr[:, PY:PY + d])
    return arr


def check(periodic):
    dims = (SIZE, SIZE, SIZE)
    bc = [(2.0, -1.0, 0.0)] * 6          # Dirichlet
    cfg = dk.DenseStencilConfig(dims, (1.0, 1.0, 1.0), bc, periodic,
                                jnp.float32, b_const=[0.0] * 6)
    assert cfg.use_kernel, "kernel path must be eligible for this probe"
    tag = "per" if periodic[0] else "dir"
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    phi = jax.random.normal(k1, cfg.pshape, jnp.float32)
    rhs = jax.random.normal(k2, cfg.pshape, jnp.float32)
    lam = jnp.asarray(0.3, jnp.float32) if not periodic[0] else \
        jnp.asarray(0.0, jnp.float32)
    planes = [None] * 6
    core = (slice(dk.PZ, dk.PZ + SIZE), slice(dk.PY, dk.PY + SIZE),
            slice(None))
    sync = lambda a: sync_pads(a, dims, periodic)

    pk = jax.jit(lambda p, r: dk.pair_sweep_dense(
        cfg, sync(p), sync(r), lam, planes, 0)[core])
    pj = jax.jit(lambda p, r: dk._pair_jnp(
        cfg, sync(p), sync(r), lam, planes, 0)[core])
    a = np.asarray(pk(phi, rhs))
    b = np.asarray(pj(phi, rhs))
    d = np.max(np.abs(a - b))
    print(f"{tag} pair   max|kernel-jnp| = {d:.3e}", flush=True)
    assert d == 0.0, "pair kernel mismatch"

    def two_jnp(p, r):
        r = sync(r)
        p = dk._pair_jnp(cfg, sync(p), r, lam, planes, 0)
        return dk._pair_jnp(cfg, sync(p), r, lam, planes, 0)[core]

    p2k = jax.jit(lambda p, r: dk.pair_sweep_dense(
        cfg, sync(p), sync(r), lam, planes, 0, n_pairs=2)[core])
    p2j = jax.jit(two_jnp)
    a = np.asarray(p2k(phi, rhs))
    b = np.asarray(p2j(phi, rhs))
    d = np.max(np.abs(a - b))
    print(f"{tag} pair2  max|kernel-jnp| = {d:.3e}", flush=True)
    assert d == 0.0, "pair2 kernel mismatch"

    ak = jax.jit(lambda p, r: dk.stencil_apply_dense(
        cfg, sync(p), sync(r), lam, planes, True)[core])
    aj = jax.jit(lambda p, r: dk._apply_jnp(
        cfg, sync(p), sync(r), lam, planes, True)[core])
    a = np.asarray(ak(phi, rhs))
    b = np.asarray(aj(phi, rhs))
    d = np.max(np.abs(a - b))
    print(f"{tag} apply  max|kernel-jnp| = {d:.3e}", flush=True)
    assert d == 0.0, "apply kernel mismatch"

    # fused downsweep vs the separate kernel chain (needs X >= 256)
    if not cfg.fused_down_ok:
        print(f"{tag} downsweep skipped (fused_down_ok false at "
              f"{SIZE}^3)", flush=True)
        return
    S2 = SIZE // 2
    corec = (slice(dk.PZ, dk.PZ + S2), slice(dk.PY, dk.PY + S2),
             slice(None))

    def fused(p, r):
        ph, pc, rc = dk.downsweep_dense(cfg, sync(p), sync(r), lam,
                                        planes, 0)
        return ph[core], pc[corec], rc[corec]

    def sep(p, r):
        r = sync(r)
        p = dk.pair_sweep_dense(cfg, sync(p), r, lam, planes, 0,
                                n_pairs=2)
        p = sync(p)
        ires = dk.stencil_apply_dense(cfg, p, r, lam, planes, True)
        return (p[core], dk.restrict_dense(cfg, p)[corec],
                dk.restrict_dense(cfg, ires)[corec])

    fa = jax.jit(fused)(phi, rhs)
    fb = jax.jit(sep)(phi, rhs)
    for name, x, y in zip(("phi", "phi_c", "ires_c"), fa, fb):
        d = np.max(np.abs(np.asarray(x) - np.asarray(y)))
        print(f"{tag} down/{name}  max|fused-sep| = {d:.3e}", flush=True)
        assert d == 0.0, f"downsweep {name} mismatch"


def check_eps(n_eps):
    """Variable-coefficient kernels (eps DMA windows) vs jnp fallback."""
    dims = (SIZE, SIZE, SIZE)
    periodic = (False, False, False)
    bc = [(2.0, -1.0, 0.0)] * 6
    cfg = dk.DenseStencilConfig(dims, (1.0, 1.0, 1.0), bc, periodic,
                                jnp.float32, b_const=[0.0] * 6,
                                n_eps=n_eps)
    assert cfg.use_kernel
    tag = f"eps{n_eps}"
    keys = jax.random.split(jax.random.PRNGKey(3), 2 + n_eps)
    phi = jax.random.normal(keys[0], cfg.pshape, jnp.float32)
    rhs = jax.random.normal(keys[1], cfg.pshape, jnp.float32)
    eps = tuple(0.5 + jax.random.uniform(k, cfg.pshape, jnp.float32)
                for k in keys[2:])
    lam = jnp.asarray(0.3, jnp.float32)
    planes = [None] * 6
    core = (slice(dk.PZ, dk.PZ + SIZE), slice(dk.PY, dk.PY + SIZE),
            slice(None))

    for name, n_pairs in (("pair", 1), ("pair2", 2)):
        a = np.asarray(jax.jit(lambda p, r: dk.pair_sweep_dense(
            cfg, p, r, lam, planes, 0, n_pairs=n_pairs,
            eps=eps))(phi, rhs)[core])
        b = phi
        for _ in range(n_pairs):
            b = dk._pair_jnp(cfg, b, rhs, lam, planes, 0, eps=eps)
        d = np.max(np.abs(a - np.asarray(b[core])))
        print(f"{tag} {name}  max|kernel-jnp| = {d:.3e}", flush=True)
        assert d == 0.0, f"{tag} {name} kernel mismatch"

    a = np.asarray(jax.jit(lambda p, r: dk.stencil_apply_dense(
        cfg, p, r, lam, planes, True, eps=eps))(phi, rhs)[core])
    b = np.asarray(dk._apply_jnp(cfg, phi, rhs, lam, planes, True,
                                 eps=eps)[core])
    d = np.max(np.abs(a - b))
    print(f"{tag} apply  max|kernel-jnp| = {d:.3e}", flush=True)
    assert d == 0.0, f"{tag} apply kernel mismatch"

    if not cfg.fused_down_ok:
        print(f"{tag} downsweep skipped (fused_down_ok false)", flush=True)
        return
    S2 = SIZE // 2
    corec = (slice(dk.PZ, dk.PZ + S2), slice(dk.PY, dk.PY + S2),
             slice(None))

    def fused(p, r):
        ph, pc, rc = dk.downsweep_dense(cfg, p, r, lam, planes, 0,
                                        eps=eps)
        return ph[core], pc[corec], rc[corec]

    def sep(p, r):
        p = dk.pair_sweep_dense(cfg, p, r, lam, planes, 0, n_pairs=2,
                                eps=eps)
        ires = dk.stencil_apply_dense(cfg, p, r, lam, planes, True,
                                      eps=eps)
        return (p[core], dk.restrict_dense(cfg, p)[corec],
                dk.restrict_dense(cfg, ires)[corec])

    fa = jax.jit(fused)(phi, rhs)
    fb = jax.jit(sep)(phi, rhs)
    for name, x, y in zip(("phi", "phi_c", "ires_c"), fa, fb):
        d = np.max(np.abs(np.asarray(x) - np.asarray(y)))
        print(f"{tag} down/{name}  max|fused-sep| = {d:.3e}", flush=True)
        assert d == 0.0, f"{tag} downsweep {name} mismatch"


def main():
    check((False, False, False))
    check((True, True, True))
    check_eps(1)
    check_eps(3)
    print("PARITY OK", flush=True)


if __name__ == "__main__":
    main()
