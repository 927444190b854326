"""Collision projections: ground plane (two semantics) + sphere/box SDFs.

Two rigid-world sources, one set of formulas:

* **Config constants** (round-3 behavior): ``cfg.ground_height`` /
  ``cfg.sphere_colliders`` / ``cfg.box_colliders`` are Python constants
  baked into the compiled program — the static replacement for the
  reference's PhysX-raycast floor discovery (``SoftBodySimulator.cs:777-788``).
* **Traced poses** (kinematic rigid world, ``core/colliders.ColliderSet``):
  every function below takes optional explicit operands — a traced scalar
  ``ground_height``, an ``(S, 4)`` ``spheres`` array, a ``(B, 6)`` ``boxes``
  array, and per-collider velocities for the friction frame.  Same formulas,
  traced instead of folded, so collider poses animate per step without
  recompiles (the reference's moving PhysX colliders,
  ``SoftBodyController.cs:110-118``).  With zero collider velocities the
  arithmetic matches the constant path exactly.

The loops over colliders unroll at trace time (collider COUNT is static);
only the poses are data.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.config import SolverConfig


def floor_project_xpbd(pred, prev_pos, inv_mass, dt, cfg: SolverConfig,
                       ground_height=None):
    """Position-level inequality ground constraint + positional friction
    (``SoftBodyCPU.cs:352-400``).  Applied to predicted positions during
    solver iterations.  ``ground_height`` (traced scalar) overrides the
    config constant when given."""
    gh = cfg.ground_height if ground_height is None else ground_height
    pen = gh - pred[:, 1]                       # >0 when below ground
    alpha = cfg.collision_compliance / (dt * dt)
    denom = inv_mass + alpha
    active = (pen > 0) & (inv_mass >= cfg.static_inv_mass_eps) \
        & (jnp.abs(denom) >= cfg.eps_denominator)
    # safe-where divisor: finite VJP on pinned particles with zero
    # collision compliance (forward-bitwise-equal on active lanes)
    dl = pen / jnp.where(active, denom, 1.0)
    dy = jnp.where(active, inv_mass * dl, 0.0)
    pred = pred.at[:, 1].add(dy)

    # positional friction on the tangential motion since step start
    vel = (pred - prev_pos) / dt
    vt = vel.at[:, 1].set(0.0)
    fr = jnp.clip(cfg.friction, 0.0, 1.0)
    pred = pred - jnp.where(active[:, None], vt * (dt * fr), 0.0)
    return pred


def floor_velocity_reflect(pos, vel, inv_mass, dt, cfg: SolverConfig,
                           ground_height=None):
    """Velocity-level floor response of the flagship kernel
    ``ApplyFloorConstraint`` (``XPBDSoftBody.compute:272-316``): project to
    floor + offset, restitution plus penetration-proportional kick, and
    velocity-level friction scaled by a pseudo normal force."""
    gh = cfg.ground_height if ground_height is None else ground_height
    pen = gh - pos[:, 1]
    hit = (pen > 0) & (inv_mass > 0)

    new_y = jnp.where(hit, gh + cfg.floor_offset, pos[:, 1])
    pos = pos.at[:, 1].set(new_y)

    falling = hit & (vel[:, 1] < 0)
    vy = jnp.abs(vel[:, 1]) * cfg.restitution + pen * cfg.penetration_kick
    vel_y = jnp.where(falling, vy, vel[:, 1])

    normal_force = jnp.abs(vel_y) + pen * cfg.normal_force_scale
    h_vel = jnp.stack([vel[:, 0], vel[:, 2]], axis=-1)
    h_speed = jnp.linalg.norm(h_vel, axis=-1)
    moving = h_speed > 1e-3
    fdir = h_vel / jnp.maximum(h_speed, 1e-12)[:, None]
    fmag = jnp.minimum(h_speed, normal_force * cfg.floor_friction_coeff * dt)
    dv = jnp.where((falling & moving)[:, None], fdir * fmag[:, None], 0.0)

    vel = jnp.stack([vel[:, 0] - dv[:, 0], vel_y, vel[:, 2] - dv[:, 1]], axis=-1)
    return pos, vel


def _box_rows(cfg: SolverConfig, boxes):
    """Static unroll list of (center(3,), half(3,)) operand pairs."""
    if boxes is None:
        return [(jnp.array([cx, cy, cz], jnp.float32),
                 jnp.array([hx, hy, hz], jnp.float32))
                for cx, cy, cz, hx, hy, hz in cfg.box_colliders]
    return [(boxes[i, :3], boxes[i, 3:]) for i in range(boxes.shape[0])]


def box_sdf_project(pred, prev_pos, inv_mass, dt, cfg: SolverConfig,
                    boxes=None, box_velocities=None):
    """Project predicted positions out of axis-aligned boxes with
    positional friction.  A point inside the box is pushed out through its
    nearest face (the standard box-SDF interior gradient).  ``boxes``
    ((B, 6) traced) overrides ``cfg.box_colliders``; ``box_velocities``
    ((B, 3)) puts the friction in each moving collider's frame."""
    for k, (center, half) in enumerate(_box_rows(cfg, boxes)):
        center = center.astype(pred.dtype)
        half = half.astype(pred.dtype)
        local = pred - center
        # per-axis distance to the nearest face (positive when inside)
        face_dist = half - jnp.abs(local)           # (N, 3)
        inside = (face_dist > 0).all(axis=-1)
        active = inside & (inv_mass >= cfg.static_inv_mass_eps)
        # push along the single axis with the smallest penetration
        axis = jnp.argmin(face_dist, axis=-1)       # (N,)
        push_mag = jnp.take_along_axis(
            face_dist, axis[:, None], axis=1)[:, 0]
        sign = jnp.sign(jnp.take_along_axis(
            local, axis[:, None], axis=1)[:, 0])
        sign = jnp.where(sign == 0, 1.0, sign)
        delta = (jnp.eye(3, dtype=pred.dtype)[axis]
                 * (sign * push_mag)[:, None])
        pred = pred + jnp.where(active[:, None], delta, 0.0)
        # positional friction in the face's tangent plane, relative to the
        # (possibly moving) collider
        n = jnp.eye(3, dtype=pred.dtype)[axis] * sign[:, None]
        vel = (pred - prev_pos) / dt
        if box_velocities is not None:
            vel = vel - box_velocities[k]
        vn = jnp.sum(vel * n, axis=-1, keepdims=True) * n
        vt = vel - vn
        fr = jnp.clip(cfg.friction, 0.0, 1.0)
        pred = pred - jnp.where(active[:, None], vt * (dt * fr), 0.0)
    return pred


def _sphere_rows(cfg: SolverConfig, spheres):
    if spheres is None:
        return [(jnp.array([cx, cy, cz], jnp.float32), radius)
                for cx, cy, cz, radius in cfg.sphere_colliders]
    return [(spheres[i, :3], spheres[i, 3]) for i in range(spheres.shape[0])]


def sphere_sdf_project(pred, prev_pos, inv_mass, dt, cfg: SolverConfig,
                       spheres=None, sphere_velocities=None):
    """Project predicted positions out of sphere colliders with positional
    friction (BASELINE config 3; the reference only sketched this via the
    unused ``SphereCollision`` helper, ``XPBDSimulatorCS.compute:213-217``).
    ``spheres`` ((S, 4) traced) overrides ``cfg.sphere_colliders`` — the
    kinematic path: a per-step-updated row sweeps the collider through the
    scene with no recompile; ``sphere_velocities`` ((S, 3)) puts friction
    in the moving collider's frame so a sweeping sphere drags contacting
    particles along."""
    for k, (center, radius) in enumerate(_sphere_rows(cfg, spheres)):
        center = center.astype(pred.dtype)
        d = pred - center
        dist = jnp.linalg.norm(d, axis=-1)
        n = d / jnp.maximum(dist, 1e-12)[:, None]
        pen = radius - dist
        active = (pen > 0) & (inv_mass >= cfg.static_inv_mass_eps)
        pred = pred + jnp.where(active[:, None], n * pen[:, None], 0.0)
        # positional friction in the contact tangent plane, relative to
        # the (possibly moving) collider
        vel = (pred - prev_pos) / dt
        if sphere_velocities is not None:
            vel = vel - sphere_velocities[k]
        vn = jnp.sum(vel * n, axis=-1, keepdims=True) * n
        vt = vel - vn
        fr = jnp.clip(cfg.friction, 0.0, 1.0)
        pred = pred - jnp.where(active[:, None], vt * (dt * fr), 0.0)
    return pred
