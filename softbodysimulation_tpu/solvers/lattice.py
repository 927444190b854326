"""Stencil XPBD engine for res^3 lattices — the flagship TPU path.

The reference's flagship engine (``SoftBodySimulator`` + ``XPBDSoftBody``)
spends its life marshalling an explicit constraint list through per-color GPU
dispatches (``SoftBodySimulator.cs:590-611``).  On a regular lattice that
machinery is unnecessary: the constraint graph is exactly the 7 offset
families of ``topology/lattice.py``, so constraint projection becomes dense
shifted-array arithmetic on a ``(res, res, res, 3)`` grid —

  * gather  -> ``jnp.roll`` by the family offset (wraparound killed by a
    precomputed boundary mask),
  * scatter -> the inverse roll of the correction field,
  * graph coloring -> a parity split along the family's leading axis: within
    one parity class no two constraints share a particle, so 7 families x 2
    parities = 14 dense passes give EXACT Gauss-Seidel.

No edge list, no indices, no segment-sum — pure VPU-shaped elementwise work
that XLA fuses aggressively and Pallas can hold entirely in VMEM (64k
particles of state ~ 4 MB << 16 MB).  This is where the 1e9
particle-steps/sec target is won.

State interop: uses the standard ``SimState`` with x-major flattened
positions (index = (x*res + y)*res + z, matching
``SoftBodySimulator.cs:121-144``); ``lambda_dist`` holds the 7 family fields
flattened to ``(7*res^3,)``.  Checkpointing, interaction and diagnostics all
work unchanged.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.config import FloorMode, LambdaMode, SolveMode, SolverConfig
from ..core.state import SimState
from ..ops import collision as _collision
from ..ops import integrate as _integrate
from ..topology.lattice import LatticeSpec, lattice_points


def n_lambda(spec: LatticeSpec) -> int:
    return spec.n_families * spec.res ** 3


def make_lattice_state(spec: LatticeSpec, center=(0.0, 0.0, 0.0),
                       mass: float = 1.0, dtype=jnp.float32) -> SimState:
    pos = lattice_points(spec.res, spec.size, center)
    n = pos.shape[0]
    inv = 0.0 if mass <= 1e-4 else 1.0 / mass
    return SimState(
        positions=jnp.asarray(pos, dtype),
        velocities=jnp.zeros((n, 3), dtype),
        inv_mass=jnp.full((n,), inv, dtype),
        ext_force=jnp.zeros((n, 3), dtype),
        lambda_dist=jnp.zeros((n_lambda(spec),), dtype),
        lambda_bend=jnp.zeros((0,), dtype),
        lambda_volume=jnp.zeros((), dtype),
    )


@functools.lru_cache(maxsize=64)
def _family_masks(spec: LatticeSpec) -> Tuple[np.ndarray, ...]:
    """Per-family (valid, parity0) boolean masks over anchor coordinates.

    valid: anchor a has a partner a+d in bounds (with the reference's
    shear/bend anchor quirk when spec.reference_bounds — see
    topology/lattice.py).  parity0: anchor's leading-offset-axis coordinate
    is even.  Within one (family, parity) class no two constraints share a
    particle.
    """
    res = spec.res
    xx, yy, zz = np.meshgrid(np.arange(res), np.arange(res), np.arange(res),
                             indexing="ij")
    out = []
    for fam in spec.families:
        dx, dy, dz, kind = fam
        if spec.reference_bounds and kind != 0:
            valid = (xx < res - 1) & (yy < res - 1) & (zz < res - 1)
        else:
            valid = np.ones((res, res, res), bool)
            for coord, d in ((xx, dx), (yy, dy), (zz, dz)):
                if d > 0:
                    valid &= coord < res - d
                elif d < 0:
                    valid &= coord >= -d
        lead = xx if dx else (yy if dy else zz)
        parity0 = (lead % 2) == 0
        out.append((valid, parity0))
    return tuple(out)


def _family_pass(pred, w, lam_f, family, parity_mask, valid, rest, comp,
                 dt, cfg: SolverConfig):
    """One conflict-free half-family Gauss-Seidel pass (dense stencil)."""
    dx, dy, dz, _ = family
    shift_fwd = (-dx, -dy, -dz)
    shift_bwd = (dx, dy, dz)
    axes = (0, 1, 2)

    pb = jnp.roll(pred, shift_fwd, axis=axes)
    wb = jnp.roll(w, shift_fwd, axis=axes)

    d = pb - pred
    len_sq = jnp.sum(d * d, axis=-1)
    length = jnp.sqrt(jnp.maximum(len_sq, 1e-24))
    nrm = d / length[..., None]

    c = length - rest
    alpha = comp / (dt * dt)
    if cfg.min_alpha_tilde > 0:
        alpha = max(alpha, cfg.min_alpha_tilde)
    denom = w + wb + alpha
    dl = (-c - alpha * lam_f) / jnp.maximum(denom, 1e-30)
    if cfg.max_dlambda > 0:
        dl = jnp.clip(dl, -cfg.max_dlambda, cfg.max_dlambda)
    if cfg.max_dlambda_rel > 0:
        m = cfg.max_dlambda_rel * rest
        dl = jnp.clip(dl, -m, m)

    active = (
        parity_mask & valid
        & (length >= cfg.eps_length)
        & (jnp.abs(denom) >= cfg.eps_denominator)
        & ((w >= cfg.static_inv_mass_eps) | (wb >= cfg.static_inv_mass_eps))
    )
    dl = jnp.where(active, dl, 0.0)

    lam_f = lam_f + dl
    if cfg.lambda_clamp > 0:
        lam_f = jnp.clip(lam_f, -cfg.lambda_clamp, cfg.lambda_clamp)

    dp = dl[..., None] * nrm
    pred = pred - w[..., None] * dp
    pred = pred + jnp.roll(wb[..., None] * dp, shift_bwd, axis=axes)
    return pred, lam_f


def _family_pass_jacobi(pred, w, lam_f, family, valid, rest, comp, dt,
                        cfg: SolverConfig, relax):
    """Whole-family Jacobi pass: both parities at once, under-relaxed.

    Within a family a particle joins at most 2 constraints (one as anchor,
    one as partner), so ``relax`` ~ 0.5 is the consistent per-edge scale."""
    dx, dy, dz, _ = family
    axes = (0, 1, 2)
    pb = jnp.roll(pred, (-dx, -dy, -dz), axis=axes)
    wb = jnp.roll(w, (-dx, -dy, -dz), axis=axes)
    d = pb - pred
    length = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-24))
    nrm = d / length[..., None]
    c = length - rest
    alpha = comp / (dt * dt)
    if cfg.min_alpha_tilde > 0:
        alpha = max(alpha, cfg.min_alpha_tilde)
    denom = w + wb + alpha
    dl = (-c - alpha * lam_f) / jnp.maximum(denom, 1e-30)
    if cfg.max_dlambda > 0:
        dl = jnp.clip(dl, -cfg.max_dlambda, cfg.max_dlambda)
    if cfg.max_dlambda_rel > 0:
        m = cfg.max_dlambda_rel * rest
        dl = jnp.clip(dl, -m, m)
    active = (
        valid
        & (length >= cfg.eps_length)
        & (jnp.abs(denom) >= cfg.eps_denominator)
        & ((w >= cfg.static_inv_mass_eps) | (wb >= cfg.static_inv_mass_eps))
    )
    dl = jnp.where(active, dl * relax, 0.0)
    lam_f = lam_f + dl
    if cfg.lambda_clamp > 0:
        lam_f = jnp.clip(lam_f, -cfg.lambda_clamp, cfg.lambda_clamp)
    dp = dl[..., None] * nrm
    pred = pred - w[..., None] * dp
    pred = pred + jnp.roll(wb[..., None] * dp, (dx, dy, dz), axis=axes)
    return pred, lam_f


def _warm_apply_family(pred, w, lam_f, family, valid):
    """Pre-apply a family's carried impulses along current edge directions."""
    dx, dy, dz, _ = family
    axes = (0, 1, 2)
    pb = jnp.roll(pred, (-dx, -dy, -dz), axis=axes)
    wb = jnp.roll(w, (-dx, -dy, -dz), axis=axes)
    d = pb - pred
    length = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-24))
    nrm = d / length[..., None]
    dl = jnp.where(valid, lam_f, 0.0)
    dp = dl[..., None] * nrm
    pred = pred - w[..., None] * dp
    pred = pred + jnp.roll(wb[..., None] * dp, (dx, dy, dz), axis=axes)
    return pred


def _substep(state: SimState, spec: LatticeSpec, cfg: SolverConfig, dt,
             apply_ext: bool):
    res = spec.res
    nfam = spec.n_families

    if cfg.lambda_mode == LambdaMode.RESET:
        lam = jnp.zeros_like(state.lambda_dist)
    else:
        lam = state.lambda_dist * cfg.lambda_decay
    lam = lam.reshape(nfam, res, res, res)

    pred_flat, vel = _integrate.predict(
        state.positions, state.velocities, state.inv_mass, state.ext_force,
        dt, cfg, apply_ext=apply_ext)
    pred = pred_flat.reshape(res, res, res, 3)
    w = state.inv_mass.reshape(res, res, res)

    masks = _family_masks(spec)
    masks_dev = tuple(
        (jnp.asarray(v), jnp.asarray(p)) for (v, p) in masks)

    if cfg.lambda_mode == LambdaMode.WARM_START:
        for fi, fam in enumerate(spec.families):
            pred = _warm_apply_family(pred, w, lam[fi], fam,
                                      masks_dev[fi][0])

    def iteration(_, carry):
        pred, lam = carry
        lam_parts = []
        for fi, fam in enumerate(spec.families):
            valid, parity0 = masks_dev[fi]
            lam_f = lam[fi]
            if cfg.solve_mode == SolveMode.COLORED:
                pred, lam_f = _family_pass(
                    pred, w, lam_f, fam, parity0, valid,
                    spec.rest_lengths[fi], spec.compliances[fi], dt, cfg)
                pred, lam_f = _family_pass(
                    pred, w, lam_f, fam, ~parity0, valid,
                    spec.rest_lengths[fi], spec.compliances[fi], dt, cfg)
            else:
                pred, lam_f = _family_pass_jacobi(
                    pred, w, lam_f, fam, valid,
                    spec.rest_lengths[fi], spec.compliances[fi], dt, cfg,
                    relax=cfg.omega if cfg.omega > 0 else 0.5)
            lam_parts.append(lam_f)
        lam = jnp.stack(lam_parts)

        if cfg.floor_mode == FloorMode.XPBD_INEQUALITY:
            pf = _collision.floor_project_xpbd(
                pred.reshape(-1, 3), state.positions, state.inv_mass, dt, cfg)
            pred = pf.reshape(res, res, res, 3)
        if cfg.sphere_colliders:
            pf = _collision.sphere_sdf_project(
                pred.reshape(-1, 3), state.positions, state.inv_mass, dt, cfg)
            pred = pf.reshape(res, res, res, 3)
        return pred, lam

    pred, lam = lax.fori_loop(0, cfg.iterations, iteration, (pred, lam))

    x, v = _integrate.finalize(
        state.positions, pred.reshape(-1, 3), state.inv_mass, dt)
    if cfg.floor_mode == FloorMode.VELOCITY_REFLECT:
        x, v = _collision.floor_velocity_reflect(x, v, state.inv_mass, dt, cfg)

    return state.replace(
        positions=x, velocities=v, lambda_dist=lam.reshape(-1))


def step_fn(state: SimState, spec: LatticeSpec, cfg: SolverConfig,
            dt: float) -> SimState:
    dt_sub = dt / cfg.substeps
    state = _substep(state, spec, cfg, dt_sub, apply_ext=True)
    if cfg.substeps > 1:
        def body(carry, _):
            return _substep(carry, spec, cfg, dt_sub, apply_ext=False), None

        state, _ = lax.scan(body, state, None, length=cfg.substeps - 1)
    return state.replace(ext_force=jnp.zeros_like(state.ext_force))


def multi_step_fn(state, spec, cfg, dt, n_steps: int) -> SimState:
    def body(carry, _):
        return step_fn(carry, spec, cfg, dt), None

    state, _ = lax.scan(body, state, None, length=n_steps)
    return state


def make_step(spec: LatticeSpec, cfg: SolverConfig, dt: float,
              n_steps: int = 1):
    @jax.jit
    def fn(state: SimState) -> SimState:
        return multi_step_fn(state, spec, cfg, dt, n_steps)

    return fn


def make_substep_runner(spec: LatticeSpec, cfg: SolverConfig, dt_sub: float,
                        n_substeps: int):
    """Flat scan over raw substeps (no per-step structure): one scan level,
    which keeps compile time flat — used by the benchmark."""
    @jax.jit
    def fn(state: SimState) -> SimState:
        def body(carry, _):
            return _substep(carry, spec, cfg, dt_sub, apply_ext=False), None

        out, _ = lax.scan(body, state, None, length=n_substeps)
        return out

    return fn
