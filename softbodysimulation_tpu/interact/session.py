"""Interactive simulation session — the orchestration layer (L6 parity).

A thin, explicitly-mutable convenience wrapper bundling state + stepper +
scene info, exposing the reference's user-facing component APIs in one
place so a migrating user finds every verb they had:

  SoftBodyInteractor  -> poke(), drag_toward(), pin()/unpin()
                         (SoftBodyInteractor.cs:39-67)
  SoftBodyAnimator    -> play(animation), pulse(), squeeze()
                         (SoftBodyAnimator.cs:36-96)
  SoftBodyController  -> apply_preset(), reset(), on_deformation(...)
                         (SoftBodyController.cs:50-108)
  RestartSimulation   -> restart() from the initial snapshot
                         (SoftBodyGPU.cs:188-212)

Everything under the hood stays functional: the session only re-binds its
``state`` field; all physics remains jitted device code.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

import numpy as np

from ..core.config import SolverConfig
from ..core.state import SimState, restore, snapshot
from . import forces as _forces


@dataclasses.dataclass
class ScheduledAnimation:
    animation: object          # ForceAnimation / Pulse / Squeeze
    start_time: float
    center: Tuple[float, float, float]


class Session:
    def __init__(self, state: SimState, step_fn: Callable[[SimState], SimState],
                 dt: float, rebuild: Optional[Callable[[SolverConfig],
                                                       Callable]] = None,
                 config: Optional[SolverConfig] = None):
        """``rebuild(cfg) -> step_fn`` enables preset hot-swapping (the
        analog of ApplyPreset recompiling the pipeline); ``config`` is the
        currently-active SolverConfig (kept in sync by ``apply_preset`` so
        live preset keys can merge feel fields onto the scene's config)."""
        self.state = state
        self._step = step_fn
        self.dt = dt
        self.time = 0.0
        self.step_count = 0
        self._rebuild = rebuild
        self.config = config
        self._initial = snapshot(state)
        self._initial_com = np.asarray(state.positions).mean(axis=0)
        self._animations: List[ScheduledAnimation] = []
        self._deformation_threshold: Optional[float] = None
        self._deformation_cb: Optional[Callable[[float], None]] = None

    # ------------------------------------------------------------- stepping
    def step(self, n: int = 1):
        for _ in range(n):
            for sched in self._animations:
                t_local = self.time - sched.start_time
                self.state = sched.animation.apply(
                    self.state, t_local, np.asarray(sched.center))
            self._animations = [
                s for s in self._animations
                if self.time - s.start_time
                <= getattr(s.animation, "duration", np.inf)
            ]
            self.state = self._step(self.state)
            self.time += self.dt
            self.step_count += 1
        self._check_deformation()
        return self.state

    # ---------------------------------------------------------- interaction
    def poke(self, force, position, radius: float = 1.0):
        self.state = _forces.add_force(self.state, force, position, radius)

    def drag_toward(self, target, strength: float = 5.0,
                    radius: float = 2.0):
        self.state = _forces.drag_force(self.state, target, strength, radius)

    def pin(self, position, radius: float = 0.5):
        self.state = _forces.set_pinned(self.state, position, radius, True)

    def unpin(self, position, radius: float = 0.5, mass: float = 1.0):
        self.state = _forces.set_pinned(self.state, position, radius, False,
                                        mass)

    # ------------------------------------------------------------ animation
    def play(self, animation, center=None):
        if center is None:
            center = tuple(np.asarray(self.state.positions).mean(axis=0))
        self._animations.append(
            ScheduledAnimation(animation, self.time, tuple(center)))

    def squeeze(self, intensity: float = 1.0):
        from .animator import Squeeze

        self.play(Squeeze(intensity=intensity))

    def step_fused(self, n: int):
        """Advance n steps with scheduled animations applied ON DEVICE in
        one compiled scan (zero host round-trips per step) — use instead of
        ``step`` for long scripted rollouts.  Semantically equivalent to n
        calls of ``step`` (each animation gates itself by time
        arithmetically); deformation callbacks fire once at the end."""
        from ..diag.health import FailsafeStepper
        from .animator import scheduled_rollout

        if isinstance(self._step, FailsafeStepper):
            # the failsafe wrapper is a host-side callable (it must observe
            # health between steps); keep the host loop there
            return self.step(n)
        anims = [(s.animation, s.start_time, s.center)
                 for s in self._animations]
        self.state = scheduled_rollout(
            self.state, self._step, anims, self.dt, n, t0=self.time)
        self.time += n * self.dt
        self.step_count += n
        self._animations = [
            s for s in self._animations
            if self.time - s.start_time
            <= getattr(s.animation, "duration", np.inf)
        ]
        self._check_deformation()
        return self.state

    # ------------------------------------------------------------- lifecycle
    def enable_failsafe(self, check_every: int = 10,
                        snapshot_every: int = 50,
                        on_failure=None) -> None:
        """Wrap the stepper in automatic NaN detection + snapshot restore
        (the reference's GPU-failure -> CPU-fallback analog; see
        diag/health.FailsafeStepper)."""
        from ..diag.health import FailsafeStepper

        self._step = FailsafeStepper(
            self._step, check_every=check_every,
            snapshot_every=snapshot_every, on_failure=on_failure)

    def restart(self):
        """Restore the initial snapshot with zeroed multipliers."""
        self.state = restore(self._initial)
        self.time = 0.0
        self.step_count = 0
        self._animations.clear()

    def apply_preset(self, cfg: SolverConfig):
        if self._rebuild is None:
            raise RuntimeError("session built without a rebuild hook; "
                               "cannot hot-swap presets")
        self._step = self._rebuild(cfg)
        self.config = cfg

    # ------------------------------------------------------------ callbacks
    def on_deformation(self, threshold: float,
                       callback: Callable[[float], None]):
        """Fire callback(displacement) when the COM has moved further than
        ``threshold`` from its initial position
        (SoftBodyController.CheckDeformation, SoftBodyController.cs:73-80)."""
        self._deformation_threshold = threshold
        self._deformation_cb = callback

    def _check_deformation(self):
        if self._deformation_cb is None:
            return
        com = np.asarray(self.state.positions).mean(axis=0)
        d = float(np.linalg.norm(com - self._initial_com))
        if d > self._deformation_threshold:
            self._deformation_cb(d)
