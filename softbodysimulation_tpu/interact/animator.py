"""Scripted force schedules — pure functions of time (device-composable).

Functional port of the coroutine animations in ``SoftBodyAnimator.cs:36-96``:
instead of mutating a component every frame, a schedule maps simulation time
to an interaction impulse, which the driver threads into the step.  An
``AnimationCurve`` becomes a sampled keyframe table evaluated with
``jnp.interp``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from ..core.state import SimState
from .forces import add_force, squeeze_impulse


@dataclasses.dataclass(frozen=True)
class Curve:
    """Piecewise-linear keyframe curve (AnimationCurve analog)."""

    times: Tuple[float, ...] = (0.0, 1.0)
    values: Tuple[float, ...] = (0.0, 1.0)

    def __call__(self, t):
        return jnp.interp(
            t, jnp.asarray(self.times), jnp.asarray(self.values)
        )

    @staticmethod
    def ease_in_out() -> "Curve":
        ts = tuple(i / 16 for i in range(17))
        vs = tuple(float(3 * t * t - 2 * t * t * t) for t in
                   (i / 16 for i in range(17)))
        return Curve(ts, vs)


@dataclasses.dataclass(frozen=True)
class ForceAnimation:
    """Curve-shaped directional force over a duration
    (``SoftBodyAnimator.AnimateForce``, ``SoftBodyAnimator.cs:42-57``)."""

    direction: Tuple[float, float, float] = (0.0, 1.0, 0.0)
    max_force: float = 100.0
    duration: float = 2.0
    radius: float = 2.0
    curve: Curve = dataclasses.field(default_factory=Curve.ease_in_out)

    def apply(self, state: SimState, t, center) -> SimState:
        frac = jnp.clip(t / self.duration, 0.0, 1.0)
        mag = self.curve(frac) * self.max_force
        active = (t >= 0.0) & (t <= self.duration)
        d = jnp.asarray(self.direction, dtype=state.positions.dtype)
        d = d / jnp.maximum(jnp.linalg.norm(d), 1e-9)
        return add_force(state, d * mag * active, center, self.radius)


@dataclasses.dataclass(frozen=True)
class Pulse:
    """Sinusoidal pulsing force (``SoftBodyAnimator.PulsingEffect``,
    ``SoftBodyAnimator.cs:59-69``)."""

    frequency: float = 1.0
    strength: float = 20.0
    radius: float = 1.0

    def apply(self, state: SimState, t, center) -> SimState:
        mag = (jnp.sin(t * self.frequency * 2.0 * jnp.pi) * self.strength
               * (t >= 0.0))
        up = jnp.asarray([0.0, 1.0, 0.0], dtype=state.positions.dtype)
        return add_force(state, up * mag, center, self.radius)


@dataclasses.dataclass(frozen=True)
class Squeeze:
    """sin-enveloped inward squeeze (``SoftBodyAnimator.SqueezeEffect``,
    ``SoftBodyAnimator.cs:76-94``)."""

    intensity: float = 1.0
    duration: float = 1.0
    radius: float = 3.0

    def apply(self, state: SimState, t, center) -> SimState:
        frac = jnp.clip(t / self.duration, 0.0, 1.0)
        envelope = jnp.sin(frac * jnp.pi)
        active = (t >= 0.0) & (t <= self.duration)
        return squeeze_impulse(
            state, center, self.intensity * envelope * active, self.radius
        )


def scheduled_rollout(state: SimState, step_fn, animations, dt: float,
                      n_steps: int, t0: float = 0.0) -> SimState:
    """Run ``n_steps`` steps with the scripted animations applied ON DEVICE
    inside one ``lax.scan`` — zero host involvement per step.

    The host-loop equivalent (``Session.step``) re-dispatches per frame;
    this is the consistent zero-round-trip design for long scripted
    animations: the time-indexed curves (``jnp.interp`` keyframe tables)
    are traced into the compiled program.

    animations — sequence of ``(animation, start_time, center)`` where
    animation is a ForceAnimation / Pulse / Squeeze (each gates itself to
    ``t >= start_time`` arithmetically, so expired/not-yet-started entries
    contribute zero force).
    """
    from jax import lax

    anims = tuple((a, float(st), jnp.asarray(c, jnp.float32))
                  for (a, st, c) in animations)

    def body(carry, i):
        t = t0 + i * dt
        s = carry
        for anim, start, center in anims:
            s = anim.apply(s, t - start, center)
        return step_fn(s), None

    out, _ = lax.scan(body, state, jnp.arange(n_steps))
    return out


def kinematic_rollout(state: SimState, step_fn, n_steps: int, dt: float,
                      sphere_traj=None, box_traj=None,
                      ground_traj=None) -> SimState:
    """Run ``n_steps`` steps with the RIGID WORLD scripted on device: the
    kinematic-collider analog of ``scheduled_rollout`` (and of the
    reference's moving PhysX colliders, ``SoftBodyController.cs:110-118``).

    The state must carry a ``ColliderSet`` (``core/colliders.py``); each
    scan step installs that step's poses from the trajectory arrays before
    stepping, so a scripted sphere sweep / paddle stroke runs as ONE
    compiled program.  Differentiable: gradients flow from any loss on the
    final state back to the pose trajectories (contact-rich control).

    sphere_traj — (T, S, 4) per-step sphere poses; collider velocities for
                  the friction frame are derived by forward difference of
                  the centers (the velocity DURING step i).
    box_traj    — (T, B, 6) per-step box poses, same treatment.
    ground_traj — (T,) per-step ground heights.
    """
    from jax import lax

    if state.colliders is None:
        raise ValueError("kinematic_rollout needs state.colliders "
                         "(make one with core.colliders.make_colliders)")

    def fwd_vel(traj):
        # velocity during step i = (pose[i+1] - pose[i]) / dt; last step
        # holds (zero velocity), matching a trajectory that stops there
        d = jnp.diff(traj[..., :3], axis=0) / dt
        return jnp.concatenate([d, jnp.zeros_like(d[:1])], axis=0)

    sph_v = None if sphere_traj is None else fwd_vel(sphere_traj)
    box_v = None if box_traj is None else fwd_vel(box_traj)

    def body(carry, i):
        c = carry.colliders
        if sphere_traj is not None:
            c = c.replace(spheres=sphere_traj[i],
                          sphere_velocities=sph_v[i])
        if box_traj is not None:
            c = c.replace(boxes=box_traj[i], box_velocities=box_v[i])
        if ground_traj is not None:
            c = c.replace(ground_height=ground_traj[i])
        return step_fn(carry.replace(colliders=c)), None

    out, _ = lax.scan(body, state, jnp.arange(n_steps))
    return out
