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

    return Session(state, rebuild(cfg), DT, rebuild=rebuild, config=cfg)


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


# ------------------------------- cursor-targeted interaction (round 4)
def test_keyboard_tokenize_arrows():
    from softbodysimulation_tpu.interact import keyboard

    toks = keyboard.tokenize(list("\x1b[A") + ["h"] + list("\x1b[D"))
    assert toks == ["up", "h", "left"]
    # lone ESC / incomplete sequences pass through unharmed
    assert keyboard.tokenize(["\x1b", "["]) == ["\x1b", "["]


def test_cursor_moves_and_aims_pokes():
    """The 3D cursor replaces the reference's mouse-ray world-position
    picking (SoftBodyInteractor.cs:69-80): steering keys move it, and the
    poke lands AT it — the particle nearest the cursor receives the
    largest force, not the COM."""
    from softbodysimulation_tpu.interact import keyboard

    s = make_session(gravity=(0.0, 0.0, 0.0), floor_mode=FloorMode.NONE)
    pos = np.asarray(s.state.positions)
    cur = keyboard.Cursor(pos)
    assert np.allclose(cur.pos, pos.mean(axis=0), atol=1e-6)
    step0 = cur.step
    assert step0 > 0

    # steer: two right (+x), one up (+y) via arrow escape, one deeper (-z)
    rep = keyboard.apply_keys(
        s, ["l", "l"] + list("\x1b[A") + [","], cursor=cur)
    assert any(a.startswith("cursor") for a in rep["acted"])
    expect = pos.mean(axis=0) + np.array([2 * step0, step0, -step0])
    assert np.allclose(cur.pos, expect, atol=1e-6)

    # aimed poke: force falloff centers on the cursor
    rep = keyboard.apply_keys(s, [" "], cursor=cur, radius=1.0)
    assert "impulse" in rep["acted"]
    f = np.asarray(s.state.ext_force)
    hit = np.linalg.norm(f, axis=1).argmax()
    d_cur = np.linalg.norm(pos - cur.pos, axis=1)
    assert d_cur[hit] <= d_cur.min() + 1e-6

    # recenter snaps back to the COM
    keyboard.apply_keys(s, ["c"], cursor=cur)
    assert np.allclose(cur.pos,
                       np.asarray(s.state.positions).mean(axis=0),
                       atol=1e-6)


# ----------------------- live controller/animator verbs (round 5)
def test_keyboard_preset_hotkeys_swap_feel():
    """Keys 1/2/3 hot-swap the jelly/firm/bouncy presets live
    (SoftBodyController.cs:56-62): the session's active config picks up the
    preset's feel fields while the scene's structural fields survive."""
    from softbodysimulation_tpu.interact import keyboard

    s = make_session(ground_height=-3.0)   # structural field to preserve
    rep = keyboard.apply_keys(s, ["2"])
    assert rep["acted"] == ["preset:firm"]
    firm = get_preset("firm")
    assert s.config.iterations == firm.iterations
    assert s.config.damping == firm.damping
    assert s.config.ground_height == -3.0          # scene's floor kept
    s.step(3)
    assert np.isfinite(np.asarray(s.state.positions)).all()

    rep = keyboard.apply_keys(s, ["3"])
    assert rep["acted"] == ["preset:bouncy"]
    assert s.config.floor_mode == get_preset("bouncy").floor_mode
    s.step(3)
    assert np.isfinite(np.asarray(s.state.positions)).all()


def test_keyboard_preset_without_rebuild_hook_reports():
    from softbodysimulation_tpu.interact import keyboard

    spec = lattice.lattice_spec(3, braced=True)
    cfg = SolverConfig(substeps=2, iterations=4,
                       solve_mode=SolveMode.JACOBI, ground_height=0.0)
    state = lat_engine.make_lattice_state(spec, center=(0, 1.0, 0))
    s = Session(state, lat_engine.make_step(spec, cfg, DT), DT, config=cfg)
    rep = keyboard.apply_keys(s, ["1"])
    assert rep["acted"] and "no-rebuild-hook" in rep["acted"][0]
    assert not rep["quit"]


def test_keyboard_enter_plays_force_animation():
    """Enter fires the curve-shaped ForceAnimation at the aim point
    (SoftBodyController.cs:64-66)."""
    from softbodysimulation_tpu.interact import keyboard

    s = make_session(gravity=(0.0, 0.0, 0.0), floor_mode=FloorMode.NONE)
    com0 = np.asarray(s.state.positions).mean(axis=0)
    rep = keyboard.apply_keys(s, ["\r"])
    assert rep["acted"] == ["play"]
    assert len(s._animations) == 1
    s.step(15)
    assert np.asarray(s.state.positions).mean(axis=0)[1] > com0[1] + 1e-4


def test_keyboard_capital_q_squeezes_lowercase_quits():
    """Q = squeeze (SoftBodyController.cs:67-68); q stays quit."""
    from softbodysimulation_tpu.interact import keyboard

    s = make_session(gravity=(0.0, 0.0, 0.0), floor_mode=FloorMode.NONE)
    pos0 = np.asarray(s.state.positions)
    spread0 = np.linalg.norm(pos0 - pos0.mean(axis=0), axis=1).mean()
    rep = keyboard.apply_keys(s, ["Q"])
    assert rep["acted"] == ["squeeze"] and not rep["quit"]
    s.step(10)
    pos1 = np.asarray(s.state.positions)
    spread1 = np.linalg.norm(pos1 - pos1.mean(axis=0), axis=1).mean()
    assert spread1 < spread0 - 1e-5

    rep = keyboard.apply_keys(s, ["q"])
    assert rep["quit"] and not rep["acted"]


def test_keyboard_hold_g_drags_toward_cursor():
    """Held g pulls the body toward the cursor — the LMB-hold drag
    (SoftBodyInteractor.cs:61-66); autorepeat delivers repeated g chars."""
    from softbodysimulation_tpu.interact import keyboard

    s = make_session(gravity=(0.0, 0.0, 0.0), floor_mode=FloorMode.NONE)
    cur = keyboard.Cursor(np.asarray(s.state.positions))
    for _ in range(6):
        cur.move(0, +1.0)           # cursor well off to +x
    com0 = np.asarray(s.state.positions).mean(axis=0)
    for _ in range(5):              # hold: one g per frame
        rep = keyboard.apply_keys(s, ["g"], cursor=cur)
        assert rep["acted"] == ["drag"]
        s.step(1)
    com1 = np.asarray(s.state.positions).mean(axis=0)
    assert com1[0] > com0[0] + 1e-5


def test_cursor_marker_rendered():
    """The cursor crosshair is stamped into the raster at its projected
    position, on top of geometry."""
    from softbodysimulation_tpu.io import raster
    from softbodysimulation_tpu.topology import mesh

    m = mesh.grid_plane(1.0, 4)
    img0 = raster.rasterize(m.vertices, m.triangles, size=64, plane="xz")
    img1 = raster.rasterize(m.vertices, m.triangles, size=64, plane="xz",
                            markers=[(0.0, 0.0, 0.0)])
    assert (img0 != img1).any()
    # the changed pixels form the crosshair: centered row+column band
    changed = np.argwhere((img0 != img1).any(axis=2))
    cy, cx = changed.mean(axis=0)
    assert abs(cy - 31.5) < 6 and abs(cx - 31.5) < 6
