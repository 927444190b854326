"""Fused Pallas TPU kernel: the entire lattice substep loop in one kernel.

The XLA stencil engine (``solvers/lattice.py``) already fuses well, but its
scan carry still round-trips HBM between substeps.  This kernel pins ALL
simulation state in VMEM for the whole call — positions, velocities,
inverse masses, per-family multipliers (~5 MB at 64k particles, well under
the ~16 MB budget) — and runs S substeps x K iterations x (families x
parities) passes with zero HBM traffic in the hot loop.

Layout: component-major ``(3, res, res*res)`` — sublane = x-plane index,
lane = y*res+z.  Offset-family shifts become ``pltpu.roll``:
  x-shift dx -> roll axis 1 (sublanes); y/z-shift (dy,dz) -> roll axis 2 by
  dy*res+dz (lanes).  Wrapped entries land outside the family's validity
mask (computed in-kernel from broadcasted iotas) and are zeroed, exactly as
in the XLA engine — the two implementations are semantically identical and
cross-checked in tests.

Supported config subset (asserted): COLORED or JACOBI solve,
RESET/DECAY/WARM_START lambda modes, XPBD-inequality or no floor.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import FloorMode, LambdaMode, SolveMode, SolverConfig
from ..core.state import SimState
from ..topology.lattice import LatticeSpec


def _check_supported(cfg: SolverConfig, spec: LatticeSpec):
    if cfg.floor_mode not in (FloorMode.XPBD_INEQUALITY, FloorMode.NONE):
        raise NotImplementedError("pallas engine: floor mode "
                                  f"{cfg.floor_mode} not supported")
    if cfg.sphere_colliders:
        raise NotImplementedError("pallas engine: sphere colliders TBD")
    if cfg.box_colliders:
        raise NotImplementedError("pallas engine: box colliders TBD")
    if cfg.enable_self_collision:
        raise NotImplementedError("pallas engine: self-collision TBD")
    if cfg.world_bounds > 0:
        raise NotImplementedError("pallas engine: world_bounds clamp TBD")
    if cfg.max_velocity > 0 or cfg.max_force > 0:
        raise NotImplementedError("pallas engine: velocity/force clamps TBD")


def _coords(res: int):
    r2 = res * res
    xx = lax.broadcasted_iota(jnp.int32, (res, r2), 0)
    cc = lax.broadcasted_iota(jnp.int32, (res, r2), 1)
    yy = cc // res
    zz = cc - yy * res
    return xx, yy, zz


def _family_mask(xx, yy, zz, res, fam, reference_bounds):
    dx, dy, dz, kind = fam
    if reference_bounds and kind != 0:
        valid = (xx < res - 1) & (yy < res - 1) & (zz < res - 1)
    else:
        valid = jnp.full(xx.shape, True)
        for coord, d in ((xx, dx), (yy, dy), (zz, dz)):
            if d > 0:
                valid = valid & (coord < res - d)
            elif d < 0:
                valid = valid & (coord >= -d)
    lead = xx if dx else (yy if dy else zz)
    parity0 = (lead % 2) == 0
    return valid, parity0


def _roll(a, shift, axis):
    """pltpu.roll with any-sign shift (it requires non-negative)."""
    size = a.shape[axis]
    shift = shift % size
    if shift == 0:
        return a
    return pltpu.roll(a, shift, axis=axis)


def _roll_fwd(a, fam, res):
    """partner view: a[x+dx, y+dy, z+dz] in (…, res, res*res) layout."""
    dx, dy, dz, _ = fam
    if dx:
        a = _roll(a, -dx, axis=a.ndim - 2)
    k = dy * res + dz
    if k:
        a = _roll(a, -k, axis=a.ndim - 1)
    return a


def _roll_bwd(a, fam, res):
    dx, dy, dz, _ = fam
    k = dy * res + dz
    if k:
        a = _roll(a, k, axis=a.ndim - 1)
    if dx:
        a = _roll(a, dx, axis=a.ndim - 2)
    return a


def make_pallas_substep_runner(spec: LatticeSpec, cfg: SolverConfig,
                               dt_sub: float, n_substeps: int,
                               loop_inside: bool = True):
    """Compile a jitted ``SimState -> SimState`` advancing ``n_substeps``
    raw substeps (external forces are not applied — bench/rollout semantics,
    matching ``solvers.lattice.make_substep_runner``).

    loop_inside=True: the whole substep loop runs inside ONE kernel with
    state VMEM-resident (fastest; biggest Mosaic compile).  False: the
    kernel advances one substep and a lax.scan outside loops it — state
    round-trips HBM once per substep (~10 MB) but the kernel is ~S x smaller
    to compile."""
    _check_supported(cfg, spec)
    res = spec.res
    r2 = res * res
    nfam = spec.n_families
    dt = dt_sub
    inv_dt2 = 1.0 / (dt * dt)
    gx, gy, gz = cfg.gravity

    def solve_family_pass(pred, w, wb_all, lam_f, fam, fi, mask,
                          relax=None):
        """One masked constraint pass on (3,res,r2) pred values.
        relax=None => exact GS semantics; float => Jacobi scaling
        (the same shape as solvers/lattice._family_pass)."""
        rest = spec.rest_lengths[fi]
        alpha = spec.compliances[fi] * inv_dt2
        if cfg.min_alpha_tilde > 0:
            alpha = max(alpha, cfg.min_alpha_tilde)
        pb = _roll_fwd(pred, fam, res)
        wb = wb_all
        d = pb - pred
        len_sq = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        length = jnp.sqrt(jnp.maximum(len_sq, 1e-24))
        c = length - rest
        denom = w + wb + alpha
        dl = (-c - alpha * lam_f) / jnp.maximum(denom, 1e-30)
        if cfg.max_dlambda > 0:
            dl = jnp.clip(dl, -cfg.max_dlambda, cfg.max_dlambda)
        if cfg.max_dlambda_rel > 0:
            m = cfg.max_dlambda_rel * rest
            dl = jnp.clip(dl, -m, m)
        if cfg.fast_math:
            scale_m = mask if relax is None else mask * relax
            dl = dl * scale_m  # float multiplier; see SolverConfig.fast_math
        else:
            active = (
                mask
                & (length >= cfg.eps_length)
                & (jnp.abs(denom) >= cfg.eps_denominator)
                & ((w >= cfg.static_inv_mass_eps)
                   | (wb >= cfg.static_inv_mass_eps))
            )
            dl = jnp.where(active, dl if relax is None else dl * relax, 0.0)
        lam_f = lam_f + dl
        if cfg.lambda_clamp > 0:
            lam_f = jnp.clip(lam_f, -cfg.lambda_clamp, cfg.lambda_clamp)
        scale = dl / length
        dp = d * scale[None]
        pred = pred - w[None] * dp
        pred = pred + _roll_bwd(wb[None] * dp, fam, res)
        return pred, lam_f

    def warm_apply(pred, w, wb_all, lam_f, fam, valid, rest):
        if cfg.warm_start_clamp > 0:
            wmax = jnp.maximum(jnp.maximum(w, wb_all), 1e-12)
            lim = cfg.warm_start_clamp * rest / wmax
            lam_f = jnp.clip(lam_f, -lim, lim)
        pb = _roll_fwd(pred, fam, res)
        d = pb - pred
        len_sq = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        length = jnp.sqrt(jnp.maximum(len_sq, 1e-24))
        if cfg.fast_math:
            dl = lam_f * valid           # float mask multiplier
        else:
            dl = jnp.where(valid, lam_f, 0.0)
        dp = d * (dl / length)[None]
        pred = pred - w[None] * dp
        pred = pred + _roll_bwd(wb_all[None] * dp, fam, res)
        return pred, lam_f

    def kernel(x_ref, v_ref, w_ref, lam_ref, xo_ref, vo_ref, lamo_ref):
        xx, yy, zz = _coords(res)
        masks = [
            _family_mask(xx, yy, zz, res, fam, spec.reference_bounds)
            for fam in spec.families
        ]
        if cfg.fast_math:
            masks = [
                ((v & p0).astype(jnp.float32),
                 (v & ~p0).astype(jnp.float32),
                 v.astype(jnp.float32))
                for (v, p0) in masks
            ]
        else:
            masks = [(v & p0, v & ~p0, v) for (v, p0) in masks]
        w = w_ref[:]
        pinned = w == 0.0
        wb_per_fam = [
            _roll_fwd(w, fam, res) for fam in spec.families
        ]

        def substep(_, carry):
            x, v, lam = carry
            g = jnp.stack([
                jnp.full((res, r2), gx, jnp.float32),
                jnp.full((res, r2), gy, jnp.float32),
                jnp.full((res, r2), gz, jnp.float32),
            ])
            if cfg.gravity_is_acceleration:
                v = v + dt * jnp.where((w > 0)[None], g, 0.0)
            else:
                v = v + dt * w[None] * g
            if cfg.damping_mode.value == "per_step":
                v = v * (1.0 - min(max(cfg.damping, 0.0), 1.0))
            else:
                v = v * (1.0 - cfg.damping * dt)
            if cfg.max_velocity > 0:
                v = jnp.clip(v, -cfg.max_velocity, cfg.max_velocity)
            pred = x + dt * v

            if cfg.lambda_mode == LambdaMode.RESET:
                lam = jnp.zeros_like(lam)
            else:
                lam = lam * cfg.lambda_decay
            if cfg.lambda_mode == LambdaMode.WARM_START:
                lam_parts = []
                for fi, fam in enumerate(spec.families):
                    pred, lam_f = warm_apply(
                        pred, w, wb_per_fam[fi], lam[fi], fam,
                        masks[fi][2], spec.rest_lengths[fi])
                    lam_parts.append(lam_f)
                lam = jnp.stack(lam_parts)

            def iteration(_, carry):
                pred, lam = carry
                lam_parts = []
                for fi, fam in enumerate(spec.families):
                    m_even, m_odd, valid = masks[fi]
                    lam_f = lam[fi]
                    if cfg.solve_mode == SolveMode.COLORED:
                        pred, lam_f = solve_family_pass(
                            pred, w, wb_per_fam[fi], lam_f, fam, fi,
                            m_even)
                        pred, lam_f = solve_family_pass(
                            pred, w, wb_per_fam[fi], lam_f, fam, fi,
                            m_odd)
                    else:
                        pred, lam_f = solve_family_pass(
                            pred, w, wb_per_fam[fi], lam_f, fam, fi, valid,
                            relax=cfg.omega if cfg.omega > 0 else 0.5)
                    lam_parts.append(lam_f)
                lam = jnp.stack(lam_parts)

                if cfg.floor_mode == FloorMode.XPBD_INEQUALITY:
                    gh = cfg.ground_height
                    pen = gh - pred[1]
                    alpha_c = cfg.collision_compliance * inv_dt2
                    denom = w + alpha_c
                    dl = pen / jnp.maximum(denom, 1e-30)
                    hit = ((pen > 0)
                           & (w >= cfg.static_inv_mass_eps)
                           & (jnp.abs(denom) >= cfg.eps_denominator))
                    dy_corr = jnp.where(hit, w * dl, 0.0)
                    p1 = pred[1] + dy_corr
                    # positional friction on tangential motion (x,z comps)
                    fr = min(max(cfg.friction, 0.0), 1.0)
                    p0 = pred[0] - jnp.where(
                        hit, (pred[0] - x[0]) * fr, 0.0)
                    p2 = pred[2] - jnp.where(
                        hit, (pred[2] - x[2]) * fr, 0.0)
                    pred = jnp.stack([p0, p1, p2])
                return pred, lam

            pred, lam = lax.fori_loop(0, cfg.iterations, iteration,
                                      (pred, lam))

            # finalize
            v = jnp.where(pinned[None], 0.0, (pred - x) / dt)
            x = jnp.where(pinned[None], x, pred)
            return x, v, lam

        inner = n_substeps if loop_inside else 1
        x, v, lam = lax.fori_loop(
            0, inner, substep, (x_ref[:], v_ref[:], lam_ref[:]))
        xo_ref[:] = x
        vo_ref[:] = v
        lamo_ref[:] = lam

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((3, res, r2), jnp.float32),
            jax.ShapeDtypeStruct((3, res, r2), jnp.float32),
            jax.ShapeDtypeStruct((nfam, res, r2), jnp.float32),
        ),
        in_specs=[vspec, vspec, vspec, vspec],
        out_specs=(vspec, vspec, vspec),
    )

    @jax.jit
    def fn(state: SimState) -> SimState:
        # (N,3) x-major -> (3, res, res^2)
        x = state.positions.T.reshape(3, res, r2)
        v = state.velocities.T.reshape(3, res, r2)
        w = state.inv_mass.reshape(res, r2)
        lam = state.lambda_dist.reshape(nfam, res, r2)
        if loop_inside:
            xo, vo, lamo = call(x, v, w, lam)
        else:
            def body(carry, _):
                xc, vc, lamc = carry
                return call(xc, vc, w, lamc), None

            (xo, vo, lamo), _ = lax.scan(
                body, (x, v, lam), None, length=n_substeps)
        return state.replace(
            positions=xo.reshape(3, -1).T,
            velocities=vo.reshape(3, -1).T,
            lambda_dist=lamo.reshape(-1),
        )

    return fn
