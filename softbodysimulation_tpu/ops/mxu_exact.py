"""Exact f32 MXU contractions against one-hot matrices via 3-term
bfloat16 splitting.

The TPU MXU is a bfloat16 multiplier with float32 accumulation.  Measured
on hardware (scripts/probe_mxu_precision.py): a DEFAULT-precision f32xf32
``dot_general`` and the mixed bf16 x f32 product BOTH truncate the f32
operand to bf16 before multiplying — max error ~7e-3 on O(1) data,
exactly the bf16-truncation of the f32 side.  ``precision=HIGHEST``
(6-pass bf16x6) is near-exact in plain XLA but unusable in Pallas: Mosaic
rejects a bf16 operand under an f32 precision contract ("Bad rhs type").

The portable exact spelling — identical in XLA and Mosaic — splits the
f32 data operand into three bf16 terms (top/middle/bottom 8-bit mantissa
slices; each residual is exactly representable in f32, Dekker-style) and
accumulates three native MXU passes:

    x = hi + mid + lo  (to ~1 ulp of f32),  x @ G = hi@G + mid@G + lo@G.

Against {0, +-1} one-hot matrices (exact in bf16) the result is exact to
f32 rounding of the accumulation (measured max err 2.4e-7 vs 7e-3
single-pass at window 256).  Cost: 3x the MXU passes of the single dot —
the price of gather/scatter exactness on the windowed/mesh paths.

Used by ``solvers/general`` (windowed XLA backends, always exact) and
``kernels/mesh_pallas`` (exact unless ``approx_math``).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def split3(x):
    """Split f32 ``x`` into three bf16 terms whose (f32) sum reconstructs
    ``x`` to ~1 ulp.  Each subtraction is exact in f32 (the residual after
    removing the top bf16 slice fits f32's mantissa)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def dot_oh(lhs, rhs, dimension_numbers, *, split="lhs", exact=True,
           parts=None, stack_axis=None):
    """``lax.dot_general`` of f32 data against a one-hot matrix, exact on
    the TPU MXU.

    ``split`` names the f32 DATA operand ("lhs"/"rhs"); the other operand
    is the one-hot (bf16 or f32 {0, +-1} — exact either way, the MXU's
    truncation of a {0, +-1} f32 one-hot is lossless).  ``exact=False``
    emits the plain single-pass dot (bf16-truncated data on hardware —
    the ``approx_math`` regime).  ``parts`` optionally supplies a
    precomputed split of the data operand so one ``split3`` can be shared
    across several dots (the 4-endpoint bending gathers): either the
    3-tuple, or — with ``stack_axis`` — the already-concatenated array.

    ``stack_axis`` names a FREE (non-contracted, non-batch) axis of the
    data operand along which the three bf16 parts are concatenated so the
    whole compensation rides ONE MXU dot; the matching output axis is
    slice-summed afterwards.  When that axis has slack in its register
    tile (the (3, ...) coordinate axis of the kernel operands pads to a
    full 16-sublane bf16 tile anyway, and 3->9 lanes stays inside one
    128-lane tile), the exact dot costs the SAME MXU passes as the
    truncated one — the split becomes a handful of VPU ops.  Without
    ``stack_axis`` the fallback is three accumulated dots (3x passes).
    Both spellings sum hi+mid+lo in the same order — bitwise identical
    results."""
    if not exact:
        return lax.dot_general(lhs, rhs, dimension_numbers,
                               preferred_element_type=jnp.float32)
    data = lhs if split == "lhs" else rhs
    if stack_axis is not None:
        if parts is None:
            parts = split3(data)
        stacked = (parts if not isinstance(parts, tuple)
                   else jnp.concatenate(parts, axis=stack_axis))
        (c_l, c_r), (b_l, b_r) = dimension_numbers
        if split == "lhs":
            free = [a for a in range(lhs.ndim)
                    if a not in c_l and a not in b_l]
            out_axis = len(b_l) + free.index(stack_axis)
            out = lax.dot_general(stacked, rhs, dimension_numbers,
                                  preferred_element_type=jnp.float32)
        else:
            lfree = [a for a in range(lhs.ndim)
                     if a not in c_l and a not in b_l]
            rfree = [a for a in range(rhs.ndim)
                     if a not in c_r and a not in b_r]
            out_axis = len(b_l) + len(lfree) + rfree.index(stack_axis)
            out = lax.dot_general(lhs, stacked, dimension_numbers,
                                  preferred_element_type=jnp.float32)
        size = data.shape[stack_axis]
        acc = None
        for i in range(3):
            t = lax.slice_in_dim(out, i * size, (i + 1) * size,
                                 axis=out_axis)
            acc = t if acc is None else acc + t
        return acc
    if parts is None:
        parts = split3(data)
    acc = None
    for p in parts:
        a, b = (p, rhs) if split == "lhs" else (lhs, p)
        t = lax.dot_general(a, b, dimension_numbers,
                            preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    return acc
