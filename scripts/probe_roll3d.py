"""Probe: is pltpu.roll cost per-invocation or per-byte?

The faithful COLORED flagship does ~12 per-coordinate 2D rolls per family
iteration; stacking the 3 coordinate planes into one 3D roll (exact same
permutation, bitwise-identical results) cuts invocations 3x at equal
bytes.  Times N 2D rolls vs N/3 3D rolls at the res-40 streamed-kernel
plane shape; also times the faithful solve-pass guard chain to see what
dominates.  Run on the real TPU; prints JSON lines.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

RES, LANES = 40, 1664


def emit(**kw):
    print(json.dumps(kw), flush=True)


def kernel_2d(x_ref, o_ref, *, iters):
    def body(_, c):
        acc = c
        for k in range(3):
            r = pltpu.roll(x_ref[k] + acc, 41, axis=1)
            acc = acc + r[0:1, 0:1].mean() * 1e-9
        return acc

    o_ref[0, 0] = lax.fori_loop(0, iters, body, jnp.float32(0.0))


def kernel_3d(x_ref, o_ref, *, iters):
    def body(_, c):
        r = pltpu.roll(x_ref[:] + c, 41, axis=2)
        return c + r[0:1, 0:1, 0:1].mean() * 1e-9

    o_ref[0, 0] = lax.fori_loop(0, iters, body, jnp.float32(0.0))


def time_kernel(kern, iters, shape):
    call = pl.pallas_call(
        functools.partial(kern, iters=iters),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    x = jnp.asarray(np.random.default_rng(0).standard_normal(shape),
                    jnp.float32)
    fn = jax.jit(lambda a: call(a))
    out = fn(x)
    np.asarray(out)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(fn(x))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    sh = (3, RES, LANES)
    for iters in (300, 1200):
        t2 = time_kernel(kernel_2d, iters, sh)
        t3 = time_kernel(kernel_3d, iters, sh)
        emit(probe="roll_granularity", iters=iters,
             t_2d_ms=round(t2 * 1e3, 2), t_3d_ms=round(t3 * 1e3, 2),
             note="2d does 3 rolls/iter of one plane; 3d does 1 roll/iter "
                  "of the 3-plane stack (same bytes)")
    # marginal per-sweep delta: subtract the two iters counts
    # (done by the reader)


if __name__ == "__main__":
    main()
