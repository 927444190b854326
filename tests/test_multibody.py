"""Multi-body contact: two soft bodies interacting through the
self-collision backends over a merged topology (core/scenes.ball_on_cloth).

Beyond the reference — each Unity ``SoftBodySimulator`` owns one mesh and
bodies never interact (``SoftBodySimulator.cs``; the unused
``SphereCollision`` helper ``XPBDSimulatorCS.compute:213-217`` is the
closest gesture).  The design claim under test: inter-body contact is a
COMPOSITION property of the contact backends (no body IDs, no pair
tables), so the ball must come to rest ON the cloth, and removing the
contact pass must let it fall straight through.
"""

import dataclasses

import jax
import numpy as np
import pytest

from softbodysimulation_tpu.core.scenes import SCENES
from softbodysimulation_tpu.solvers import general as G


@pytest.fixture(scope="module")
def scene():
    state, step, info = SCENES["ball_on_cloth"]()
    return state, step, info


def _run(state, step, n):
    jstep = jax.jit(step)
    for _ in range(n):
        state = jstep(state)
    return np.asarray(state.positions)


def test_ball_rests_on_cloth(scene):
    state, step, info = scene
    nc = info["n_cloth"]
    p = _run(state, step, 160)
    assert np.isfinite(p).all()
    ball_min = p[nc:, 1].min()
    # resting ON the sagging cloth: far above the floor (y=0) and no lower
    # than a plausible trampoline sag below the cloth's rest plane (y=1)
    assert ball_min > 0.55, ball_min
    # the cloth actually deflected under the ball (contact is two-sided)
    cloth_center = p[:nc, 1].min()
    assert cloth_center < 0.99, cloth_center
    # rim pins held
    rim_y = p[:nc, 1].max()
    assert abs(rim_y - 1.0) < 1e-4, rim_y


def test_without_contact_ball_falls_through(scene):
    state, _, info = scene
    nc = info["n_cloth"]
    cfg_off = dataclasses.replace(info["config"], enable_self_collision=False)
    step_off = G.make_step(info["topology"], cfg_off, info["dt"])
    p = _run(state, step_off, 160)
    assert np.isfinite(p).all()
    # no contact: the ball passes through the cloth and rests on the floor
    assert p[nc:, 1].min() < 0.25, p[nc:, 1].min()


def test_backends_agree_on_inter_body_contact(scene):
    """The sorted/hash approximate backends must see the same inter-body
    contact the exact dense backend resolves (loose tolerance: different
    pair discovery order, same physics)."""
    state, _, info = scene
    nc = info["n_cloth"]
    finals = {}
    for backend in ("dense", "sorted", "hash"):
        cfg = dataclasses.replace(info["config"],
                                  self_collision_backend=backend)
        step = G.make_step(info["topology"], cfg, info["dt"])
        finals[backend] = _run(state, step, 90)
    for backend in ("sorted", "hash"):
        a, b = finals["dense"], finals[backend]
        # all backends keep the ball on the cloth
        assert b[nc:, 1].min() > 0.55, (backend, b[nc:, 1].min())
        # and land it in the same place (cm-scale agreement)
        da = np.abs(a[nc:].mean(0) - b[nc:].mean(0)).max()
        assert da < 0.05, (backend, da)
