"""Probe which lane-manipulation primitives Mosaic compiles:
strided lane slice, minor-dim value reshape, pltpu.repeat.
Each probe is its own tiny kernel; prints OK/FAIL + timing."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

X = 512
ROWS = 256


def run(name, kernel, out_shape, x):
    try:
        f = jax.jit(lambda a: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a))
        y = f(x)
        float(jnp.ravel(y)[0])
        t0 = time.perf_counter()
        for _ in range(3):
            y = f(x)
        float(jnp.ravel(y)[0])
        dt = (time.perf_counter() - t0) / 3
        print(f"{name:28s} OK   {dt*1e3:.2f} ms", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name:28s} FAIL {type(e).__name__}: {msg}", flush=True)


x = jax.random.normal(jax.random.PRNGKey(0), (ROWS, X), jnp.float32)

def k_strided(a_ref, o_ref):
    o_ref[:] = a_ref[:][:, 0::2]

run("lane slice [:, 0::2]", k_strided, (ROWS, X // 2), x)

def k_reshape(a_ref, o_ref):
    u = a_ref[:].reshape(ROWS, X // 2, 2)
    o_ref[:] = u[:, :, 0]

run("reshape split + [,,0]", k_reshape, (ROWS, X // 2), x)

def k_repeat(a_ref, o_ref):
    o_ref[:] = pltpu.repeat(a_ref[:], 2, axis=1)

run("pltpu.repeat axis=1", k_repeat, (ROWS, 2 * X), x)

def k_interleave(a_ref, o_ref):
    a = a_ref[:]
    ra = pltpu.repeat(a, 2, axis=1)
    rb = pltpu.repeat(a * 2.0, 2, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 2 * X), 1)
    o_ref[:] = jnp.where(lane % 2 == 0, ra, rb)

run("interleave via repeat", k_interleave, (ROWS, 2 * X), x)

def k_compact_roll(a_ref, o_ref):
    # compact even lanes via log-shift butterfly
    a = a_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, X), 1)
    w = a
    # move element at lane 2j to lane j: shift by -j = sum over bits
    for k in range(8):  # X/2 = 256 -> 8 bits
        sh = 1 << k
        rolled = pltpu.roll(w, X - sh, axis=1)
        # after previous steps element for target j sits at lane j + r,
        # r = remaining displacement; select per target bit
        w = jnp.where((lane >> k) & 1 == 1, rolled, w)
    o_ref[:] = w[:, 0:X // 2]

run("compact via butterfly", k_compact_roll, (ROWS, X // 2), x)
