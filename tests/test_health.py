"""Failure detection / graceful recovery (diag/health.py) and topology
validation — the reference's NaN-fallback + ValidateConstraintData parity."""

import numpy as np
import pytest

import jax.numpy as jnp

from softbodysimulation_tpu import SolveMode, SolverConfig, is_finite
from softbodysimulation_tpu.diag.health import FailsafeStepper, scrub
from softbodysimulation_tpu.solvers import lattice as lat_engine
from softbodysimulation_tpu.topology import build, lattice, mesh


def small():
    spec = lattice.lattice_spec(3, braced=True)
    cfg = SolverConfig(substeps=1, iterations=4, solve_mode=SolveMode.JACOBI,
                       ground_height=0.0)
    state = lat_engine.make_lattice_state(spec, center=(0, 1, 0))
    return spec, cfg, state


def test_scrub_replaces_nonfinite():
    _, _, state = small()
    bad = state.replace(
        positions=state.positions.at[0, 1].set(np.nan),
        velocities=state.velocities.at[3, 0].set(np.inf))
    assert not bool(is_finite(bad))
    fixed = scrub(bad)
    assert bool(is_finite(fixed))
    p = np.asarray(fixed.positions)
    assert p[0, 1] == 1.0                      # NaN component -> safe default
    assert p[0, 0] == np.asarray(state.positions)[0, 0]  # finite kept
    assert np.asarray(fixed.velocities)[3, 0] == 0.0


def test_failsafe_recovers_from_injected_nan():
    spec, cfg, state = small()
    inner = lat_engine.make_step(spec, cfg, 0.02)
    calls = {"n": 0}

    def sabotaged(s):
        calls["n"] += 1
        out = inner(s)
        if calls["n"] == 25:  # inject a failure mid-run
            out = out.replace(positions=out.positions.at[0, 0].set(np.nan))
        return out

    events = []
    stepper = FailsafeStepper(sabotaged, check_every=5, snapshot_every=10,
                              on_failure=events.append)
    for _ in range(60):
        state = stepper(state)
    assert stepper.recoveries == 1
    assert events and events[0] == 25
    assert bool(is_finite(state))
    # simulation continued meaningfully after recovery
    assert np.asarray(state.positions)[:, 1].min() > -1e-3


def test_failsafe_no_false_positives():
    spec, cfg, state = small()
    stepper = FailsafeStepper(lat_engine.make_step(spec, cfg, 0.02),
                              check_every=5)
    for _ in range(40):
        state = stepper(state)
    assert stepper.recoveries == 0


class TestValidateTopology:
    def test_valid_reports_ok(self):
        m = mesh.icosphere(1)
        _, topo = build.topology_from_mesh(m, compliance=1e-4, bending=True)
        report = build.validate_topology(topo)
        assert report["ok"]
        assert report["n_edges"] == topo.n_edges

    def test_catches_out_of_bounds(self):
        pos = np.zeros((3, 3), np.float32)
        pos[1, 0] = 1.0
        pos[2, 0] = 2.0
        topo = build.build_topology(pos, [[0, 1], [1, 2]], 0.01)
        bad = topo.replace(edges=topo.edges.at[0, 1].set(99))
        with pytest.raises(ValueError, match="out of bounds"):
            build.validate_topology(bad)

    def test_catches_bad_rest_length(self):
        pos = np.array([[0, 0, 0], [1, 0, 0]], np.float32)
        topo = build.build_topology(pos, [[0, 1]], 0.01)
        bad = topo.replace(rest_lengths=jnp.asarray([-1.0], jnp.float32))
        with pytest.raises(ValueError, match="rest length"):
            build.validate_topology(bad)

    def test_catches_coloring_conflict(self):
        pos = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]], np.float32)
        topo = build.build_topology(pos, [[0, 1], [1, 2]], 0.01)
        bad = topo.replace(colors=jnp.zeros_like(topo.colors))
        with pytest.raises(ValueError, match="coloring"):
            build.validate_topology(bad)
