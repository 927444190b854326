"""Fused Pallas kernel for the blocked EXACT self-collision pass.

The XLA 'blocked' backend (``ops/spatial_hash.self_collision_project_
blocked``) is the exact-at-scale contact path, but its scan over row
blocks is gather- and small-op-bound (~1.9e6 particle-substeps/s at 64k).
This kernel runs the whole pass as one Mosaic program with the sorted
particle planes VMEM-resident — the per-pair math hits VPU speed and the
Gram/correction contractions hit the MXU:

* the pair distance table comes from ONE augmented K=5 contraction per row
  block:  d2 = [x,y,z,|x|^2,1]_i . [-2x,-2y,-2z,1,|x|^2]_j  — the Gram
  trick with both squared-norm terms folded into the matmul, so no
  cross-orientation broadcasts are needed;
* the pair inverse-mass sum uses the same trick (K=2:
  [w,1]_i . [1,w]_j), and every id/validity mask is built from
  ``broadcasted_iota`` — the kernel contains no transposes at all;
* candidate blocks are fetched by dynamic lane slices indexed from the
  SMEM-resident top-M neighbor table (the AABB cull + top-k stays in XLA,
  once per substep, next to the Morton sort);
* the correction needs only NT/TN-oriented dots:  mx = cx @ m^T lands
  directly as (3, B), and the row-sum of m is a (1,MB) @ m^T contraction,
  so the output planes write back without reshaping.

Arithmetic per surviving pair is identical to the XLA blocked backend
(same guards, same omega application) — equivalence-tested in interpret
mode (tests/test_contact_pallas.py).  Selected via
``SolverConfig.self_collision_backend = 'blocked_pallas'``.

Reference capability seed: the unused ``SphereCollision`` helper
(``XPBDSimulatorCS.compute:213-217``); BASELINE config 4 at scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import SolverConfig
from ..ops import spatial_hash as _sh


def _contact_kernel(nbr_ref, ok_ref, x_ref, sq_ref, w_ref, corr_ref, *,
                    nb: int, block: int, m_nbr: int, n_real: int,
                    radius: float):
    """Grid dimension 0 = row block i.  x/sq/w are the FULL sorted planes
    (VMEM-resident); corr is blocked per grid step."""
    i = pl.program_id(0)
    b = block
    mb = m_nbr * b

    xi = x_ref[:, pl.dslice(i * b, b)]                    # (3, B)
    sqi = sq_ref[:, pl.dslice(i * b, b)]                  # (1, B)
    wi = w_ref[:, pl.dslice(i * b, b)]                    # (1, B)

    cx_parts, csq_parts, cw_parts, cid_parts, cok_parts = [], [], [], [], []
    lane_b = lax.broadcasted_iota(jnp.int32, (1, b), 1)
    for mth in range(m_nbr):
        j = nbr_ref[i, mth]                               # SMEM scalar
        cx_parts.append(x_ref[:, pl.dslice(j * b, b)])
        csq_parts.append(sq_ref[:, pl.dslice(j * b, b)])
        cw_parts.append(w_ref[:, pl.dslice(j * b, b)])
        cid_parts.append(lane_b + j * b)
        okf = jnp.where(ok_ref[i, mth] > 0, 1.0, 0.0)
        cok_parts.append(jnp.full((1, b), 1.0) * okf)
    cx = jnp.concatenate(cx_parts, axis=1)                # (3, MB)
    csq = jnp.concatenate(csq_parts, axis=1)              # (1, MB)
    cw = jnp.concatenate(cw_parts, axis=1)                # (1, MB)
    cid = jnp.concatenate(cid_parts, axis=1)              # (1, MB) i32
    cok = jnp.concatenate(cok_parts, axis=1)              # (1, MB) f32

    one_i = jnp.full((1, b), 1.0)
    one_c = jnp.full((1, mb), 1.0)
    # d2 = |xi|^2 + |xj|^2 - 2 xi.xj via one K=5 contraction (Gram trick,
    # norms folded in)
    lhs5 = jnp.concatenate([xi, sqi, one_i], axis=0)      # (5, B)
    rhs5 = jnp.concatenate([-2.0 * cx, one_c, csq], axis=0)   # (5, MB)
    d2 = lax.dot_general(lhs5, rhs5, (((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)     # (B, MB)
    # wsum = wi + wj via K=2 contraction
    lhs2 = jnp.concatenate([wi, one_i], axis=0)           # (2, B)
    rhs2 = jnp.concatenate([one_c, cw], axis=0)           # (2, MB)
    wsum = lax.dot_general(lhs2, rhs2, (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)
    wi_bc = wsum - jnp.broadcast_to(cw, (b, mb))          # wi along lanes

    dist = jnp.sqrt(jnp.maximum(d2, 1e-18))
    overlap = 2.0 * radius - dist
    row_id = i * b + lax.broadcasted_iota(jnp.int32, (b, mb), 0)
    cid_bc = jnp.broadcast_to(cid, (b, mb))
    touch = ((row_id != cid_bc) & (overlap > 0)
             & (dist > 1e-9) & (wsum > 1e-12)
             & (jnp.broadcast_to(cok, (b, mb)) > 0.5)
             & (row_id < n_real) & (cid_bc < n_real))
    mcoef = jnp.where(touch,
                      overlap / (jnp.maximum(dist, 1e-12)
                                 * jnp.maximum(wsum, 1e-12)), 0.0)
    # corr_i = wi * (xi * sum_j m - (m @ cx))   — both contractions in the
    # (3, B) output orientation directly
    mx = lax.dot_general(cx, mcoef, (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)     # (3, B)
    msum = lax.dot_general(one_c, mcoef, (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)   # (1, B)
    for c in range(3):
        corr_ref[c:c + 1, :] = wi * (xi[c:c + 1] * msum - mx[c:c + 1])


def _make_call(nb: int, block: int, m_nbr: int, n_real: int, npad: int,
               radius: float):
    grid = (nb,)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_contact_kernel, nb=nb, block=block,
                          m_nbr=m_nbr, n_real=n_real, radius=radius),
        grid=grid,
        in_specs=[smem, smem, full, full, full],
        out_specs=pl.BlockSpec((3, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, npad), jnp.float32),
    )


def self_collision_project_blocked_pallas(pred, inv_mass, order,
                                          cfg: SolverConfig):
    """Drop-in twin of ``ops.spatial_hash.self_collision_project_blocked``
    with the per-pair pass executed by the fused kernel.  The Morton sort
    (``order``), block layout, AABB cull and top-M selection stay in XLA —
    identical to the XLA backend, exact under the same
    ``self_collision_blocked_overflow`` precondition."""
    (x, w, ids, xb, wb, idb, touch, d2ab, n, block, nb) = \
        _sh._blocked_layout(pred, inv_mass, order, cfg)
    if block % 128 != 0:
        if pred.shape[0] < cfg.collision_block_size:
            # tiny bodies don't need the kernel: identical XLA semantics
            return _sh.self_collision_project_blocked(pred, inv_mass,
                                                      order, cfg)
        raise NotImplementedError(
            "blocked_pallas needs collision_block_size % 128 == 0")
    m_nbr = min(cfg.block_neighbors, nb)
    npad = nb * block
    # Scoped-VMEM guard: the kernel keeps ~4 (B, M*B) f32 temporaries live
    # (d2 / wsum / mask / coefficient chain — measured 19.34M scoped at
    # B=256, M=18, i.e. ~4.1 planes) plus the 5 resident (.., npad)
    # planes.  Past the 16M limit Mosaic fails with a stack OOM at
    # compile time; raise the actionable error instead.
    scoped = 4.5 * block * m_nbr * block * 4 + 5 * npad * 4
    if scoped > 15_500_000:
        raise NotImplementedError(
            "blocked_pallas contact kernel exceeds the scoped-VMEM budget "
            f"at collision_block_size={block} x block_neighbors={m_nbr} "
            f"(~{scoped / 1e6:.1f}M of 16M) — use collision_block_size="
            "128, fewer block_neighbors, or the XLA 'blocked' backend")

    key = jnp.where(touch, -d2ab, -jnp.inf)
    _, nbr_idx = jax.lax.top_k(key, m_nbr)                  # (nb, M)
    nbr_ok = jnp.take_along_axis(touch, nbr_idx, axis=1)

    xs3 = x.T.reshape(3, npad)
    sq = jnp.sum(x * x, axis=-1).reshape(1, npad)
    ws = w.reshape(1, npad)
    call = _make_call(nb, block, m_nbr, n, npad, cfg.particle_radius)
    corr3 = call(nbr_idx.astype(jnp.int32), nbr_ok.astype(jnp.int32),
                 xs3, sq, ws)
    corr = corr3.T[:n]
    inv_order = jnp.argsort(order)
    return pred + cfg.self_collision_omega * corr[inv_order]
