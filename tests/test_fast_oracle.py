"""FastReferenceSolver must be BITWISE identical to the frozen scalar oracle.

The frozen oracle (``solvers/reference_cpu.py``) is the root of trust for the
drift metric; the vectorized oracle exists only to make long-horizon /
full-scale sweeps tractable (ROADMAP round-2 #5).  These tests pin the
equality that licenses its use: same x/v/lambda/blam arrays, bit for bit,
across every scene family — clamps, bending, contact+friction, DECAY sweeps,
mid-run interaction (poke + pin), acceleration-gravity.
"""

import numpy as np
import pytest
from test_oracle_drift import DT, make_oracle, make_scene

from softbodysimulation_tpu import (
    LambdaMode,
    SolveMode,
    SolverConfig,
    state_from_topology,
)
from softbodysimulation_tpu.solvers import fast_oracle, general
from softbodysimulation_tpu.topology import build, lattice, mesh


def make_fast(pos, topo, cfg, inv_mass):
    hinges = np.asarray(topo.hinges)
    return fast_oracle.FastReferenceSolver(
        pos, np.asarray(topo.edges), np.asarray(topo.rest_lengths),
        np.asarray(topo.compliance), inv_mass, cfg,
        hinges=hinges if len(hinges) and cfg.enable_bending else None,
        rest_angles=np.asarray(topo.rest_angles),
        bend_compliance=np.asarray(topo.bend_compliance),
        colors=np.asarray(topo.colors),
        bend_colors=np.asarray(topo.bend_colors),
    )


def assert_identical(frozen, fast, ctx=""):
    assert np.array_equal(frozen.x, fast.x), f"x diverged {ctx}"
    assert np.array_equal(frozen.v, fast.v), f"v diverged {ctx}"
    assert np.array_equal(frozen.lam, fast.lam), f"lambda diverged {ctx}"
    assert np.array_equal(frozen.blam, fast.blam), f"blam diverged {ctx}"


@pytest.mark.parametrize("kind",
                         ["cube8", "lattice3", "bending_plane", "clamped"])
def test_bitwise_equal_with_interaction(kind):
    pos, topo, cfg = make_scene(kind)
    inv_mass = np.asarray(state_from_topology(topo, pos).inv_mass)
    frozen = make_oracle(pos, topo, cfg, inv_mass)
    fast = make_fast(pos, topo, cfg, inv_mass)
    for i in range(150):
        if i == 40:  # mid-run poke + pin, through both APIs
            for o in (frozen, fast):
                o.add_force((5.0, 30.0, -2.0), (0.2, 0.8, 0.1), radius=1.5)
                o.set_pinned((0, 2.0, 0), radius=0.4, pinned=True)
        frozen.step(DT)
        fast.step(DT)
        assert_identical(frozen, fast, f"[{kind} step {i}]")


def test_bitwise_equal_decay_mode():
    pos, topo, cfg0 = make_scene("cube8")
    cfg = SolverConfig(substeps=cfg0.substeps, iterations=cfg0.iterations,
                       damping=cfg0.damping, solve_mode=cfg0.solve_mode,
                       ground_height=0.0, lambda_mode=LambdaMode.DECAY,
                       lambda_decay=0.97)
    inv_mass = np.asarray(state_from_topology(topo, pos).inv_mass)
    frozen = make_oracle(pos, topo, cfg, inv_mass)
    fast = make_fast(pos, topo, cfg, inv_mass)
    for i in range(120):
        frozen.step(DT)
        fast.step(DT)
        assert_identical(frozen, fast, f"[decay step {i}]")


def test_invalid_coloring_rejected():
    pos = mesh.cube_corners(1.0)
    edges = lattice.cube8_edges()
    topo = build.build_topology(pos, edges, compliance=0.01)
    cfg = SolverConfig(substeps=1, iterations=2)
    with pytest.raises(ValueError, match="coloring invalid"):
        fast_oracle.FastReferenceSolver(
            pos, np.asarray(topo.edges), np.asarray(topo.rest_lengths),
            np.asarray(topo.compliance), np.ones(len(pos), np.float32), cfg,
            colors=np.zeros(len(topo.edges), np.int32))  # all one color


def test_colors_default_to_greedy():
    pos = mesh.cube_corners(1.0) + np.array([0, 1.0, 0], np.float32)
    edges = lattice.cube8_edges()
    topo = build.build_topology(pos, edges, compliance=0.01)
    cfg = SolverConfig(substeps=1, iterations=4, ground_height=0.0)
    fast = fast_oracle.FastReferenceSolver(
        pos, np.asarray(topo.edges), np.asarray(topo.rest_lengths),
        np.asarray(topo.compliance), np.ones(len(pos), np.float32), cfg)
    for _ in range(30):
        fast.step(DT)
    assert np.isfinite(fast.x).all()
    assert fast.x[:, 1].min() > -1e-4


@pytest.mark.slow
def test_drift_10k_steps_fast_oracle_matches_frozen_metric():
    """The 10k-step cube8 headline run, re-validated end-to-end through the
    fast oracle: frozen and fast oracles stay bitwise equal the whole way,
    and the device engine's drift vs either is the same number."""
    pos, topo, cfg = make_scene("cube8")
    state = state_from_topology(topo, pos)
    inv_mass = np.asarray(state.inv_mass)
    frozen = make_oracle(pos, topo, cfg, inv_mass)
    fast = make_fast(pos, topo, cfg, inv_mass)
    step = general.make_step(topo, cfg, DT, n_steps=100)
    for _ in range(100):
        state = step(state)
    for i in range(10000):
        frozen.step(DT)
        fast.step(DT)
        if i % 500 == 0:
            assert_identical(frozen, fast, f"[10k step {i}]")
    assert_identical(frozen, fast, "[10k final]")
    drift = np.abs(np.asarray(state.positions) - fast.x).max()
    assert drift <= 1e-3, f"10k-step drift vs fast oracle {drift}"


def test_bitwise_equal_warm_start_mode():
    """The WARM_START extension (opt-in on both oracles) must stay bitwise
    identical: the vectorized pre-application accumulates staged
    corrections via one unbuffered np.add.at over interleaved [a0, b0, a1,
    b1, ...] indices — the scalar loop's exact per-particle add order."""
    from softbodysimulation_tpu import LambdaMode
    from softbodysimulation_tpu.solvers import reference_cpu

    pos, topo, base = make_scene("lattice3")
    import dataclasses
    cfg = dataclasses.replace(base, lambda_mode=LambdaMode.WARM_START,
                              lambda_decay=1.0)
    inv_mass = np.asarray(state_from_topology(topo, pos).inv_mass)
    kw = dict(colors=np.asarray(topo.colors), warm_start=True)
    frozen = reference_cpu.ReferenceSolver(
        pos, np.asarray(topo.edges), np.asarray(topo.rest_lengths),
        np.asarray(topo.compliance), inv_mass, cfg, **kw)
    fast = fast_oracle.FastReferenceSolver(
        pos, np.asarray(topo.edges), np.asarray(topo.rest_lengths),
        np.asarray(topo.compliance), inv_mass, cfg, **kw)
    for i in range(120):
        if i == 30:
            for o in (frozen, fast):
                o.add_force((4.0, 20.0, -1.0), (0.2, 0.8, 0.1), radius=1.5)
        frozen.step(DT)
        fast.step(DT)
        assert_identical(frozen, fast, f"[warm_start step {i}]")
