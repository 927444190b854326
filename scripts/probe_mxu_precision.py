"""Measure TPU MXU precision for the one-hot gather dots, and verify the
3-term bf16-split fix (ops/mxu_exact.py) inside a Pallas kernel.

Motivating bug (round 3): the fused mesh kernel's faithful-COLORED bunny
drifted 0.17 vs the XLA engine on HARDWARE while matching to 1e-7 in
interpret mode.  Root cause measured here: the MXU truncates the f32
operand to bf16 in BOTH the mixed bf16 x f32 product and the
DEFAULT-precision f32 x f32 product — the gather ``win @ onehot``
returns bf16-truncated positions (~7e-3 on O(1) data).  Only
``precision=HIGHEST`` is near-exact, and Mosaic rejects a bf16 operand
under an f32 precision contract, so the portable fix is the 3-term
bf16 split of the f32 operand (3 native MXU passes, ~2e-7).

Run on the real TPU:  python scripts/probe_mxu_precision.py
Expected (measured 2026-08, v5p single chip):
    xla mixed bf16xf32 default : ~7e-3   (bf16 truncation of the data)
    xla f32xf32 default        : ~7e-3   (same truncation)
    xla f32xf32 HIGHEST        : ~6e-8
    pallas single-pass         : ~7e-3
    pallas split3              : ~2e-7
"""
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from softbodysimulation_tpu.ops.mxu_exact import dot_oh  # noqa: E402

W, S = 256, 256
rng = np.random.default_rng(0)
win = rng.uniform(-1.5, 1.5, (3, W)).astype(np.float32)
idx_a = rng.integers(0, W, S).astype(np.int32)
idx_b = rng.integers(0, W, S).astype(np.int32)
exact = win[:, idx_b] - win[:, idx_a]
didx = np.stack([idx_a, idx_b])

onehot = np.zeros((W, S), np.float32)
onehot[idx_b, np.arange(S)] += 1.0
onehot[idx_a, np.arange(S)] -= 1.0


def err(r):
    return float(np.abs(np.asarray(r) - exact).max())


# --- plain XLA dots on the device
d_mixed = jnp.dot(jnp.asarray(win), jnp.asarray(onehot, jnp.bfloat16),
                  preferred_element_type=jnp.float32)
d_def = jnp.dot(jnp.asarray(win), jnp.asarray(onehot))
d_hi = jnp.dot(jnp.asarray(win), jnp.asarray(onehot),
               precision=lax.Precision.HIGHEST)
print(f"xla mixed bf16xf32 default : {err(d_mixed):.3e}", flush=True)
print(f"xla f32xf32 default        : {err(d_def):.3e}", flush=True)
print(f"xla f32xf32 HIGHEST        : {err(d_hi):.3e}", flush=True)


# --- the same contraction inside a Pallas kernel (synthesized one-hot,
#     the mesh kernel's spelling), single-pass vs split3
def make(split):
    def kernel(w_ref, d_ref, o_ref):
        iota = lax.broadcasted_iota(jnp.int32, (W, S), 0)
        dloc = d_ref[:]
        gdk = ((iota == dloc[1:2]).astype(jnp.bfloat16)
               - (iota == dloc[0:1]).astype(jnp.bfloat16))
        o_ref[:] = dot_oh(w_ref[:], gdk, (((1,), (0,)), ((), ())),
                          exact=split)

    v = pl.BlockSpec(memory_space=pltpu.VMEM)
    return jax.jit(pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((3, S), jnp.float32),
        in_specs=[v, v], out_specs=v))


for split in (False, True):
    r = make(split)(win, didx)
    name = "split3     " if split else "single-pass"
    print(f"pallas {name}        : {err(r):.3e}", flush=True)
