"""Round 2: correctness-checked probes for the restriction/prolongation
kernel building blocks on 3D tiles."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Z, Y, X = 16, 32, 512
x = jax.random.normal(jax.random.PRNGKey(0), (Z, Y, X), jnp.float32)
xn = np.asarray(x)


def run(name, kernel, out_shape, ref):
    try:
        f = jax.jit(lambda a: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a))
        y = np.asarray(f(x))
        err = np.max(np.abs(y - ref))
        print(f"{name:36s} OK   maxerr {err:.2e}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"{name:36s} FAIL {type(e).__name__}: {msg}", flush=True)


def butterfly_compact(w, axis, n):
    """w[j] = w_in[2j] along axis (pull formulation)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, w.shape, axis)
    nbits = int(np.log2(n // 2))
    for k in range(nbits):
        sh = 1 << k
        rolled = pltpu.roll(w, (n - sh) % n, axis=axis)
        w = jnp.where((idx >> k) & 1 == 1, rolled, w)
    sl = [slice(None)] * w.ndim
    sl[axis] = slice(0, n // 2)
    return w[tuple(sl)]


# 1. z-pair reduction via major-dim reshape
def k_zpairs(a_ref, o_ref):
    h = a_ref[:].reshape(Z // 2, 2, Y, X)
    o_ref[:] = h[:, 0] + h[:, 1]

run("z-pairs via major reshape", k_zpairs, (Z // 2, Y, X),
    xn[0::2] + xn[1::2])

# 2. y-pair reduce + sublane butterfly compact
def k_ypairs(a_ref, o_ref):
    a = a_ref[:]
    u = a + pltpu.roll(a, Y - 1, axis=1)
    o_ref[:] = butterfly_compact(u, 1, Y)

run("y-pairs + sublane butterfly", k_ypairs, (Z, Y // 2, X),
    xn[:, 0::2] + xn[:, 1::2])

# 3. x-pair reduce + lane butterfly compact
def k_xpairs(a_ref, o_ref):
    a = a_ref[:]
    u = a + pltpu.roll(a, X - 1, axis=2)
    o_ref[:] = butterfly_compact(u, 2, X)

run("x-pairs + lane butterfly", k_xpairs, (Z, Y // 2 * 2, X // 2)[:2] + (X // 2,),
    xn[:, :, 0::2] + xn[:, :, 1::2])

# 4. x interleave via repeat+where
def k_xilv(a_ref, o_ref):
    a = a_ref[:]
    ra = pltpu.repeat(a, 2, axis=2)
    rb = pltpu.repeat(a * 2.0, 2, axis=2)
    lane = jax.lax.broadcasted_iota(jnp.int32, ra.shape, 2)
    o_ref[:] = jnp.where(lane % 2 == 0, ra, rb)

ref = np.zeros((Z, Y, 2 * X), np.float32)
ref[:, :, 0::2] = xn
ref[:, :, 1::2] = 2 * xn
run("x interleave via repeat", k_xilv, (Z, Y, 2 * X), ref)

# 5. y interleave via sublane repeat
def k_yilv(a_ref, o_ref):
    a = a_ref[:]
    ra = pltpu.repeat(a, 2, axis=1)
    rb = pltpu.repeat(a * 2.0, 2, axis=1)
    sub = jax.lax.broadcasted_iota(jnp.int32, ra.shape, 1)
    o_ref[:] = jnp.where(sub % 2 == 0, ra, rb)

ref = np.zeros((Z, 2 * Y, X), np.float32)
ref[:, 0::2] = xn
ref[:, 1::2] = 2 * xn
run("y interleave via repeat", k_yilv, (Z, 2 * Y, X), ref)

# 6. z interleave via major reshape
def k_zilv(a_ref, o_ref):
    a = a_ref[:]
    st = jnp.stack([a, 2.0 * a], axis=1)  # [Z, 2, Y, X]
    o_ref[:] = st.reshape(2 * Z, Y, X)

ref = np.zeros((2 * Z, Y, X), np.float32)
ref[0::2] = xn
ref[1::2] = 2 * xn
run("z interleave via stack+reshape", k_zilv, (2 * Z, Y, X), ref)
