"""Session orchestration API (the Interactor/Animator/Controller surface)."""

import numpy as np

from softbodysimulation_tpu import FloorMode, SolveMode, SolverConfig
from softbodysimulation_tpu.core.presets import PRESETS, get_preset
from softbodysimulation_tpu.interact.animator import ForceAnimation, Pulse
from softbodysimulation_tpu.interact.session import Session
from softbodysimulation_tpu.solvers import lattice as lat_engine
from softbodysimulation_tpu.topology import lattice

DT = 0.02


def make_session(**cfg_kw):
    spec = lattice.lattice_spec(3, braced=True)
    base = dict(substeps=2, iterations=4, damping=0.05,
                solve_mode=SolveMode.JACOBI, ground_height=0.0, friction=0.3)
    base.update(cfg_kw)
    cfg = SolverConfig(**base)
    state = lat_engine.make_lattice_state(spec, center=(0, 1.0, 0))

    def rebuild(new_cfg):
        return lat_engine.make_step(spec, new_cfg, DT)

    return Session(state, rebuild(cfg), DT, rebuild=rebuild)


def test_step_and_time_advance():
    s = make_session()
    s.step(10)
    assert s.step_count == 10
    assert np.isclose(s.time, 10 * DT)
    assert np.isfinite(np.asarray(s.state.positions)).all()


def test_poke_moves_body():
    s = make_session(gravity=(0.0, 0.0, 0.0), floor_mode=FloorMode.NONE)
    com0 = np.asarray(s.state.positions).mean(axis=0)
    s.poke((0, 30, 0), com0, radius=2.0)
    s.step(5)
    com1 = np.asarray(s.state.positions).mean(axis=0)
    assert com1[1] > com0[1]


def test_pin_unpin_roundtrip():
    s = make_session()
    top = np.asarray(s.state.positions)[:, 1].max()
    s.pin((0, top, 0), radius=0.6)
    assert (np.asarray(s.state.inv_mass) == 0).sum() > 0
    s.unpin((0, top, 0), radius=0.6)
    assert (np.asarray(s.state.inv_mass) == 0).sum() == 0


def test_restart_restores_initial():
    s = make_session()
    p0 = np.asarray(s.state.positions).copy()
    s.step(50)
    assert not np.allclose(np.asarray(s.state.positions), p0)
    s.restart()
    assert np.allclose(np.asarray(s.state.positions), p0)
    assert s.step_count == 0


def test_animation_schedule_expires():
    s = make_session(gravity=(0.0, 0.0, 0.0), floor_mode=FloorMode.NONE)
    s.play(ForceAnimation(direction=(0, 1, 0), max_force=20.0, duration=0.1))
    assert len(s._animations) == 1
    s.step(10)  # 0.2s > duration
    assert len(s._animations) == 0
    assert np.asarray(s.state.positions).mean(axis=0)[1] > 0.0


def test_pulse_runs_indefinitely():
    s = make_session(gravity=(0.0, 0.0, 0.0), floor_mode=FloorMode.NONE)
    s.play(Pulse(frequency=2.0, strength=5.0))
    s.step(20)
    assert len(s._animations) == 1  # no duration => persists


def test_deformation_callback_fires():
    events = []
    s = make_session()
    s.on_deformation(0.2, events.append)
    s.step(60)  # falls ~1m
    assert events and events[-1] > 0.2


def test_apply_preset_swaps_stepper():
    s = make_session()
    s.apply_preset(get_preset("firm"))
    s.step(5)
    assert np.isfinite(np.asarray(s.state.positions)).all()


def test_presets_catalogue():
    assert set(PRESETS) >= {"jelly", "firm", "bouncy", "flagship",
                            "reference_cpu"}
    for name, cfg in PRESETS.items():
        assert isinstance(cfg, SolverConfig)


def test_session_failsafe():
    s = make_session()
    events = []
    s.enable_failsafe(check_every=2, snapshot_every=4,
                      on_failure=events.append)
    s.step(10)
    # sabotage the state directly, then keep stepping: failsafe recovers
    s.state = s.state.replace(
        positions=s.state.positions.at[0, 0].set(np.nan))
    s.step(4)
    assert events, "failsafe should have fired"
    assert np.isfinite(np.asarray(s.state.positions)).all()


# ------------------------------------- live keyboard interaction (round 3)
def test_keyboard_apply_keys_drives_session():
    from softbodysimulation_tpu.interact import keyboard

    sess = make_session(gravity=(0.0, 0.0, 0.0))
    com0 = np.asarray(sess.state.positions).mean(axis=0)

    rep = keyboard.apply_keys(sess, ["d"])          # poke +x
    assert rep["acted"] == ["poke +x"]
    sess.step(2)
    com1 = np.asarray(sess.state.positions).mean(axis=0)
    assert com1[0] > com0[0] + 1e-5

    rep = keyboard.apply_keys(sess, ["p"])          # pin near COM
    assert rep["acted"] == ["pin"]
    assert (np.asarray(sess.state.inv_mass) == 0).any()
    rep = keyboard.apply_keys(sess, ["u"])
    assert (np.asarray(sess.state.inv_mass) > 0).all()

    rep = keyboard.apply_keys(sess, ["r", "q"])     # restart + quit
    assert rep["restarted"] and rep["quit"]
    np.testing.assert_allclose(np.asarray(sess.state.positions).mean(axis=0),
                               com0, atol=1e-6)


def test_keyboard_raw_stdin_degrades_without_tty():
    from softbodysimulation_tpu.interact import keyboard

    with keyboard.raw_stdin() as poll:
        assert poll() == []          # pytest stdin is a pseudofile: no-op
