"""Integration: predict and finalize phases (jnp).

predict  — semi-implicit Euler + damping + position prediction
           (``SoftBodyCPU.cs:294-301``; flagship ``XPBDSoftBody.compute:76-104``;
           optional velocity/force/world clamps from
           ``XPBDSimulatorCS.compute:55-92``).
finalize — v = (pred - x)/dt, x = pred, pinned particles frozen
           (``SoftBodyCPU.cs:314-324``; the spec of the missing
           ``FinalizeSubstep`` kernel, ``SoftBodyGPU.cs:248``).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.config import DampingMode, SolverConfig


def predict(positions, velocities, inv_mass, ext_force, dt,
            cfg: SolverConfig, apply_ext: bool = True):
    """Returns (pred_positions, new_velocities)."""
    g = jnp.asarray(cfg.gravity, dtype=positions.dtype)
    ext = ext_force if apply_ext else jnp.zeros_like(ext_force)
    if cfg.gravity_is_acceleration:
        if cfg.max_force > 0:
            ext = jnp.clip(ext, -cfg.max_force, cfg.max_force)
        active = (inv_mass > 0)[:, None]
        dv = dt * (jnp.where(active, g[None, :], 0.0)
                   + inv_mass[:, None] * ext)
    else:
        force = g[None, :] + ext
        if cfg.max_force > 0:
            force = jnp.clip(force, -cfg.max_force, cfg.max_force)
        dv = dt * inv_mass[:, None] * force
    v = velocities + dv
    if cfg.damping_mode == DampingMode.PER_STEP:
        v = v * (1.0 - jnp.clip(cfg.damping, 0.0, 1.0))
    else:
        v = v * (1.0 - cfg.damping * dt)
    if cfg.max_velocity > 0:
        v = jnp.clip(v, -cfg.max_velocity, cfg.max_velocity)
    pred = positions + dt * v
    if cfg.world_bounds > 0:
        pred = jnp.clip(pred, -cfg.world_bounds, cfg.world_bounds)
    return pred, v


def finalize(positions, pred, inv_mass, dt):
    """Returns (new_positions, new_velocities)."""
    pinned = (inv_mass == 0.0)[:, None]
    v = jnp.where(pinned, 0.0, (pred - positions) / dt)
    x = jnp.where(pinned, positions, pred)
    return x, v
