"""Hardware probe: does Mosaic lower a bitwise-OR reduce (vector -> scalar)?

The group-walk kernel needs ONE reduce per 16-child group test: per-ray
fired-child bitmasks OR-reduced to a scalar mask. Probes, in order:
  a) jnp.bitwise_or.reduce on [SUB,128] i32
  b) explicit log-tree: lane rolls + sublane slice-ORs, then jnp.max
Prints which variants compile and whether results match.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8


def make_kernel(variant):
    def kernel(x_ref, o_ref):
        x = x_ref[:, :]
        if variant == "ufunc":
            m = jnp.bitwise_or.reduce(jnp.bitwise_or.reduce(x, axis=1), axis=0)
        elif variant == "logtree":
            acc = x
            s = SUB
            while s > 1:
                s //= 2
                acc = acc[:s, :] | acc[s:2 * s, :]
            for k in (64, 32, 16, 8, 4, 2, 1):
                acc = acc | pltpu.roll(acc, k, axis=1)
            m = jnp.max(acc)
        o_ref[0] = m
    return kernel


def run(variant, interpret):
    x = np.zeros((SUB, 128), np.int32)
    rng = np.random.default_rng(0)
    # sparse random bits over 16 positions
    for _ in range(20):
        x[rng.integers(SUB), rng.integers(128)] |= 1 << int(rng.integers(16))
    want = int(np.bitwise_or.reduce(x.reshape(-1)))
    out = pl.pallas_call(
        make_kernel(variant),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(jnp.asarray(x))
    got = int(out[0])
    return got == want, got, want


for variant in ("ufunc", "logtree"):
    for interpret in (True, False):
        try:
            ok, got, want = run(variant, interpret)
            print(f"{variant} interpret={interpret}: ok={ok} got={got:#x} want={want:#x}")
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            print(f"{variant} interpret={interpret}: FAIL {type(e).__name__}: {msg}")
        sys.stdout.flush()
