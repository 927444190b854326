"""Round-2 UX surface: terminal live preview, async export pipeline,
COM-recentered export, spot scene, on-device scheduled animations, and
CLI --watch/--poke plumbing."""

import os

import numpy as np
import pytest

from softbodysimulation_tpu import cli
from softbodysimulation_tpu.core.scenes import SCENES, SPOT_PATHS
from softbodysimulation_tpu.interact.animator import (ForceAnimation, Pulse,
                                                      scheduled_rollout)
from softbodysimulation_tpu.interact.session import Session
from softbodysimulation_tpu.io import export, terminal


def small_scene():
    return SCENES["cpu_cube"]()


def test_ansi_frame_shape_and_colors():
    img = np.zeros((8, 6, 3), np.uint8)
    img[0] = (255, 0, 0)
    txt = terminal.ansi_frame(img)
    lines = txt.split("\n")
    assert len(lines) == 4                      # 8 px rows -> 4 text rows
    assert "38;2;255;0;0" in lines[0]           # red upper pixels
    assert "48;2;0;0;0" in lines[0]             # black lower pixels
    assert lines[0].count("▀") == 6


def test_terminal_frame_from_state():
    state, step, info = small_scene()
    txt = terminal.frame(state, info["topology"], cols=24,
                         ground_height=0.0, status="hello")
    assert txt.endswith("hello")
    assert "▀" in txt


def test_async_exporter_matches_sync(tmp_path):
    state, step, info = small_scene()
    topo = info["topology"]
    paths = []
    with export.AsyncExporter(max_pending=2) as ex:
        for i in range(3):
            state = step(state)
            p = str(tmp_path / f"f{i}.obj")
            ex.submit(p, state, topo)
            paths.append(p)
    sync = str(tmp_path / "sync.obj")
    export.export_obj(sync, state, topo)
    assert ex.written == 3
    assert open(paths[-1]).read() == open(sync).read()


def test_export_recenter_com(tmp_path):
    state, step, info = small_scene()
    p = str(tmp_path / "com.obj")
    export.export_obj(p, state, info["topology"], recenter_com=True)
    vs = np.array([[float(x) for x in line.split()[1:]]
                   for line in open(p) if line.startswith("v ")])
    assert np.abs(vs.mean(axis=0)).max() < 1e-5


def test_spot_scene_runs():
    state, step, info = SCENES["spot"]()
    if not any(os.path.exists(p) for p in SPOT_PATHS):
        pytest.skip("spot asset absent (icosphere fallback untested here)")
    assert info["topology"].n_particles == 2930   # spot.obj vertex count
    assert info["topology"].windows is not None
    for _ in range(5):
        state = step(state)
    assert np.isfinite(np.asarray(state.positions)).all()


def test_scheduled_rollout_matches_session_host_loop():
    state, step, info = small_scene()
    dt = info["dt"]
    anim = ForceAnimation(direction=(0, 1, 0), max_force=40.0, duration=0.3,
                          radius=2.0)
    pulse = Pulse(frequency=2.0, strength=5.0, radius=2.0)

    sess = Session(state, step, dt=dt)
    sess.play(anim, center=(0, 2, 0))
    sess.play(pulse, center=(0, 2, 0))
    host = sess.step(25)

    fused = scheduled_rollout(
        state, step, [(anim, 0.0, (0, 2, 0)), (pulse, 0.0, (0, 2, 0))],
        dt, 25)
    d = np.abs(np.asarray(host.positions) - np.asarray(fused.positions)).max()
    assert d < 1e-5, f"fused rollout diverged from host loop: {d}"


def test_session_step_fused_advances_clock():
    state, step, info = small_scene()
    sess = Session(state, step, dt=info["dt"])
    sess.play(ForceAnimation(duration=0.1), center=(0, 2, 0))
    sess.step_fused(10)
    assert sess.step_count == 10
    assert abs(sess.time - 10 * info["dt"]) < 1e-9
    assert np.isfinite(np.asarray(sess.state.positions)).all()


def test_cli_watch_and_poke(tmp_path, capsys):
    rc = cli.main(["run", "cpu_cube", "--steps", "8", "--watch", "4",
                   "--watch-cols", "16", "--log-every", "0",
                   "--poke", "2:0,30,0@0,2,0:1.5"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "▀" in out
    assert "poked=1" in out


def test_cli_bad_poke_spec(capsys):
    rc = cli.main(["run", "cpu_cube", "--steps", "2",
                   "--poke", "nonsense"])
    assert rc == 2


def test_cli_export_every_async(tmp_path):
    out = str(tmp_path / "seq.obj")
    rc = cli.main(["run", "cpu_cube", "--steps", "6", "--log-every", "0",
                   "--export", out, "--export-every", "3"])
    assert rc == 0
    assert (tmp_path / "seq.0003.obj").exists()
    assert (tmp_path / "seq.0006.obj").exists()
    assert (tmp_path / "seq.obj").exists()
