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
