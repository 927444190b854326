"""Hardware probes for the fused mesh-substep Pallas kernel design.

Answers three questions before committing to a formulation (ROADMAP #1 /
round-2 verdict item 1):

  P1. Is an in-kernel mixed dot (f32 data x bf16 {0,+-1} one-hot) EXACT on
      the MXU (i.e. does Mosaic upcast the one-hot rather than downcast the
      f32 side)?
  P2. Does the NT orientation (contract the LAST dim of both operands)
      compile, and what does it cost relative to NN?
  P3. What does a per-block-unrolled gather+scatter matmul sweep actually
      cost per sweep at bunny scale (K=30 blocks, S=256 edges, W=256
      window) — the measured floor for the fused kernel.

Run on the real TPU.  Prints one JSON line per probe.
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

K, S, W, NPAD = 30, 256, 256, 2560

rng = np.random.default_rng(0)

# signed gather one-hots: column s has +1 at row b(s), -1 at row a(s)
a_idx = rng.integers(0, W, size=(K, S))
b_idx = (a_idx + 1 + rng.integers(0, W - 1, size=(K, S))) % W
Gd = np.zeros((K, W, S), np.float32)
kk, ss = np.meshgrid(np.arange(K), np.arange(S), indexing="ij")
Gd[kk, a_idx, ss] = -1.0
Gd[kk, b_idx, ss] += 1.0
Gs = np.transpose(Gd, (0, 2, 1)).copy()      # (K, S, W)
bases = [int(x) for x in rng.integers(0, NPAD - W, size=K)]

x_host = rng.standard_normal((8, NPAD)).astype(np.float32)
Gd_bf = jnp.asarray(Gd, jnp.bfloat16)
Gs_bf = jnp.asarray(Gs, jnp.bfloat16)
x_dev = jnp.asarray(x_host)


def ref_sweep(x):
    """XLA f32 reference of one gather+scatter sweep (exact)."""
    outs = []
    delta = jnp.zeros_like(x)
    for k in range(K):
        win = lax.dynamic_slice(x, (0, bases[k]), (8, W))
        d = win @ Gd[k]                                     # (8, S) exact
        dp = d * 0.25
        wd = dp @ Gs[k]                                     # (8, W)
        delta = lax.dynamic_update_slice(
            delta, lax.dynamic_slice(delta, (0, bases[k]), (8, W)) + wd,
            (0, bases[k]))
        outs.append(d)
    return delta, jnp.stack(outs)


def kernel_probe(x_ref, gd_ref, gs_ref, delta_ref, d_ref, *, nt: bool):
    delta_ref[:] = jnp.zeros_like(delta_ref)
    for k in range(K):
        win = x_ref[:, bases[k]:bases[k] + W]               # (8, W) static
        if nt:
            # NT: contract the last dims of both operands
            d = lax.dot_general(
                win, gs_ref[k], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            d = lax.dot_general(
                win, gd_ref[k], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        d_ref[k] = d
        dp = d * 0.25
        wd = lax.dot_general(
            dp, gs_ref[k], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        delta_ref[:, bases[k]:bases[k] + W] += wd


def make_probe(nt):
    return pl.pallas_call(
        functools.partial(kernel_probe, nt=nt),
        out_shape=(jax.ShapeDtypeStruct((8, NPAD), jnp.float32),
                   jax.ShapeDtypeStruct((K, 8, S), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
    )


def emit(**kw):
    print(json.dumps(kw), flush=True)


# ---- P1/P2: exactness + NT support
ref_delta, ref_d = jax.jit(ref_sweep)(x_dev)
ref_delta = np.asarray(ref_delta)
ref_d = np.asarray(ref_d)
for name, nt in (("nn", False), ("nt", True)):
    try:
        t0 = time.perf_counter()
        delta, d = make_probe(nt)(x_dev, Gd_bf, Gs_bf)
        delta = np.asarray(delta)
        d = np.asarray(d)
        compile_s = time.perf_counter() - t0
        emit(probe=f"P1_{name}", ok=True,
             gather_maxerr=float(np.abs(d - ref_d).max()),
             delta_maxerr=float(np.abs(delta - ref_delta).max()),
             compile_s=round(compile_s, 1))
    except Exception as e:  # noqa: BLE001
        emit(probe=f"P1_{name}", ok=False,
             err=f"{type(e).__name__}: {str(e)[:300]}")


# ---- P3: per-sweep cost of the unrolled matmul pipeline, with a
# realistic per-edge VPU phase (length, dl, lam update) and ref-based
# delta accumulation (functional .at[].add does not lower in Mosaic)
def kernel_sweeps(x_ref, gd_ref, gs_ref, o_ref, pred, delta, dbuf, lam_ref,
                  *, n_sweeps, batched, fuse_vpu):
    pred[:] = x_ref[:]
    lam_ref[:] = jnp.zeros_like(lam_ref)

    def sweep(_, carry):
        delta[:] = jnp.zeros_like(delta)
        if batched:
            for k in range(K):
                dbuf[k] = lax.dot_general(
                    pred[:, bases[k]:bases[k] + W], gd_ref[k],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            # batched per-edge VPU math on (K, S) shapes in one shot
            d0 = dbuf[:, 0, :]
            d1 = dbuf[:, 1, :]
            d2 = dbuf[:, 2, :]
            len_sq = d0 * d0 + d1 * d1 + d2 * d2        # (K, S)
            length = jnp.sqrt(jnp.maximum(len_sq, 1e-24))
            dl = (0.9 - length - 0.1 * lam_ref[:]) * 0.25
            lam_ref[:] = lam_ref[:] + dl
            scale = dl / length
            for c in range(3):
                dbuf[:, c, :] = dbuf[:, c, :] * scale
            for k in range(K):
                wd = lax.dot_general(
                    dbuf[k], gs_ref[k], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                delta[:3, bases[k]:bases[k] + W] += wd
        else:
            for k in range(K):
                win = pred[:, bases[k]:bases[k] + W]
                d = lax.dot_general(
                    win, gd_ref[k], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if fuse_vpu:
                    d0, d1, d2 = d[0:1], d[1:2], d[2:3]
                    len_sq = d0 * d0 + d1 * d1 + d2 * d2
                    length = jnp.sqrt(jnp.maximum(len_sq, 1e-24))
                    dl = (0.9 - length - 0.1 * lam_ref[k]) * 0.25
                    lam_ref[k] = lam_ref[k] + dl
                    dp = d[:3] * (dl / length)
                else:
                    dp = d[:3] * 0.25
                wd = lax.dot_general(
                    dp, gs_ref[k], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                delta[:3, bases[k]:bases[k] + W] += wd
        pred[:] = pred[:] + 1e-6 * delta[:]
        return carry

    lax.fori_loop(0, n_sweeps, sweep, 0)
    o_ref[:] = pred[:]


def time_sweeps(n_sweeps, batched, fuse_vpu=True):
    call = pl.pallas_call(
        functools.partial(kernel_sweeps, n_sweeps=n_sweeps, batched=batched,
                          fuse_vpu=fuse_vpu),
        out_shape=jax.ShapeDtypeStruct((8, NPAD), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, NPAD), jnp.float32),
                        pltpu.VMEM((8, NPAD), jnp.float32),
                        pltpu.VMEM((K, 8, S), jnp.float32),
                        pltpu.VMEM((K, S) if batched else (K, 1, S),
                                   jnp.float32)],
    )
    fn = jax.jit(lambda x: call(x, Gd_bf, Gs_bf))
    t0 = time.perf_counter()
    out = fn(x_dev)
    np.asarray(out[0, 0])
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(x_dev)
        np.asarray(out[0, 0])
        best = min(best, time.perf_counter() - t0)
    return best, compile_s


for batched in (False, True):
    tag = "batched" if batched else "unrolled"
    try:
        t100, c100 = time_sweeps(100, batched)
        t400, c400 = time_sweeps(400, batched)
        per_sweep = (t400 - t100) / 300.0
        emit(probe=f"P3_{tag}", ok=True,
             per_sweep_us=round(per_sweep * 1e6, 2),
             t100_ms=round(t100 * 1e3, 2), t400_ms=round(t400 * 1e3, 2),
             compile_s=round(c100 + c400, 1))
    except Exception as e:  # noqa: BLE001
        emit(probe=f"P3_{tag}", ok=False,
             err=f"{type(e).__name__}: {str(e)[:300]}")
