"""Orbax-backed checkpointing and the profiler helpers."""

import os

import numpy as np
import pytest

from softbodysimulation_tpu import SolverConfig, SolveMode
from softbodysimulation_tpu.diag.profiling import (
    StepTimer,
    measure_throughput,
    trace,
)
from softbodysimulation_tpu.io import checkpoint
from softbodysimulation_tpu.solvers import lattice as lat_engine
from softbodysimulation_tpu.topology import lattice


def small_sim():
    spec = lattice.lattice_spec(3, braced=True)
    cfg = SolverConfig(substeps=1, iterations=4, solve_mode=SolveMode.JACOBI,
                       ground_height=0.0)
    state = lat_engine.make_lattice_state(spec, center=(0, 1, 0))
    return spec, cfg, state


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    spec, cfg, state = small_sim()
    step = lat_engine.make_step(spec, cfg, 0.02, n_steps=10)
    state = step(state)
    path = os.path.join(tmp_path, "orbax_ckpt")
    checkpoint.save_orbax(path, state)
    loaded = checkpoint.load_orbax(path, state)
    assert np.array_equal(np.asarray(state.positions),
                          np.asarray(loaded.positions))
    assert np.array_equal(np.asarray(state.lambda_dist),
                          np.asarray(loaded.lambda_dist))


def test_measure_throughput_reports():
    spec, cfg, state = small_sim()
    step = lat_engine.make_step(spec, cfg, 0.02)
    out = measure_throughput(step, state, spec.n_particles,
                             target_seconds=0.3, max_calls=500)
    assert out["calls"] > 0
    assert out["particle_steps_per_sec"] > 0
    assert np.isfinite(np.asarray(out["final_state"].positions)).all()


def test_step_timer_smooths():
    import time

    t = StepTimer(smoothing=0.5)
    t.tick()
    time.sleep(0.01)
    r = t.tick()
    assert r > 0


def test_profiler_trace_writes(tmp_path):
    spec, cfg, state = small_sim()
    step = lat_engine.make_step(spec, cfg, 0.02)
    logdir = os.path.join(tmp_path, "trace")
    with trace(logdir):
        state = step(state)
        np.asarray(state.positions)
    # a plugins/profile directory with at least one artifact appears
    found = []
    for root, _, files in os.walk(logdir):
        found += files
    assert found, "profiler trace produced no files"
