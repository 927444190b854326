"""Probe: dynamic (traced) leading-axis indexing of a VMEM scratch ref
inside fori_loop — the mechanism the fused mesh BACKWARD kernel needs for
its per-iteration stash buffers (stash[it] = plane; plane = stash[it]).

Writes K planes forward, reads them back in reverse, checks round-trip.
Run on hardware (Mosaic) — interpret mode proves nothing about lowering.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 4
NP_ = 256


def kernel(x_ref, o_ref):
    def scoped(stash):
        def wr(it, c):
            # traced leading-axis STORE
            stash[it] = x_ref[:] * (it + 1).astype(jnp.float32)
            return c

        lax.fori_loop(0, K, wr, 0)
        o_ref[:] = jnp.zeros_like(o_ref)

        def rd(j, c):
            it = K - 1 - j
            # traced leading-axis LOAD
            o_ref[:] += stash[it] * (it + 1).astype(jnp.float32)
            return c

        lax.fori_loop(0, K, rd, 0)

    pl.run_scoped(scoped, stash=pltpu.VMEM((K, 3, NP_), jnp.float32))


def main():
    x = jnp.asarray(np.random.RandomState(0).randn(3, NP_), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, NP_), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    want = sum((i + 1) ** 2 for i in range(K)) * np.asarray(x)
    got = np.asarray(out)
    err = np.abs(got - want).max()
    print("backend:", jax.default_backend(), "max_err:", err)
    assert err < 1e-5, err
    print("OK: traced leading-axis VMEM stash indexing works")


if __name__ == "__main__":
    main()
