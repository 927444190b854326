"""Property/invariant tests — formalising the reference's diagnostics probes
(``ComputeDiagnostics``, ``XPBDSoftBody.compute:234-270``; NaN guards at
``SoftBodySimulator.cs:841-847``): solver output stays finite, constraint
error decreases, lambdas bounded, pinned particles immobile, energy bounded.
"""

import numpy as np
import pytest

from softbodysimulation_tpu import (
    FloorMode,
    LambdaMode,
    SolveMode,
    SolverConfig,
    is_finite,
    state_from_topology,
)
from softbodysimulation_tpu.diag.diagnostics import diagnostics
from softbodysimulation_tpu.solvers import general
from softbodysimulation_tpu.topology import build, lattice, mesh

DT = 0.02


def drop_scene(res=4, mode=SolveMode.JACOBI, **cfg_kw):
    pos = lattice.lattice_points(res, center=(0, 2.0, 0))
    edges, comp = lattice.lattice_edges(res)
    topo = build.build_topology(pos, edges, comp)
    base = dict(substeps=2, iterations=8, damping=0.01, solve_mode=mode,
                ground_height=0.0)
    base.update(cfg_kw)
    cfg = SolverConfig(**base)
    return state_from_topology(topo, pos), topo, cfg


@pytest.mark.parametrize("mode", [SolveMode.COLORED, SolveMode.JACOBI])
def test_long_run_stays_finite(mode):
    state, topo, cfg = drop_scene(mode=mode)
    step = general.make_step(topo, cfg, DT, n_steps=50)
    for _ in range(10):
        state = step(state)
    assert bool(is_finite(state))
    d = diagnostics(state, topo)
    assert bool(d["is_finite"])
    assert float(d["max_velocity"]) < 50.0


@pytest.mark.parametrize("mode", [SolveMode.COLORED, SolveMode.JACOBI])
def test_iterations_reduce_constraint_error(mode):
    """More solver iterations => smaller residual after the same wall time
    horizon (the premise of the solverIterations knob)."""
    errs = {}
    for iters in (1, 4, 16):
        state, topo, cfg = drop_scene(mode=mode, iterations=iters)
        step = general.make_step(topo, cfg, DT, n_steps=100)
        state = step(state)
        errs[iters] = float(diagnostics(state, topo)["max_constraint_error"])
    # monotone improvement; absolute level depends on compliance (soft
    # constraints hold residual C at equilibrium by design)
    assert errs[4] <= errs[1] + 1e-6
    assert errs[16] <= 0.7 * errs[1]


def test_floor_never_penetrated_at_rest():
    state, topo, cfg = drop_scene()
    step = general.make_step(topo, cfg, DT, n_steps=100)
    for _ in range(5):
        state = step(state)
    y = np.asarray(state.positions)[:, 1]
    assert y.min() > -1e-3  # at/above ground


def test_pinned_particles_never_move():
    state, topo, cfg = drop_scene(mode=SolveMode.JACOBI)
    pinned_idx = np.array([0, 5, 9])
    state = state.replace(inv_mass=state.inv_mass.at[pinned_idx].set(0.0))
    p0 = np.asarray(state.positions)[pinned_idx].copy()
    step = general.make_step(topo, cfg, DT, n_steps=100)
    state = step(state)
    assert np.allclose(np.asarray(state.positions)[pinned_idx], p0, atol=1e-6)
    assert np.allclose(np.asarray(state.velocities)[pinned_idx], 0.0)


def test_lambda_reset_mode_zeroes_each_step():
    state, topo, cfg = drop_scene(mode=SolveMode.COLORED)
    assert cfg.lambda_mode == LambdaMode.RESET
    step = general.make_step(topo, cfg, DT)
    state = step(state)
    # lambdas hold the *last* substep's accumulation; run a second step and
    # verify no unbounded growth vs single step (reset semantics)
    lam1 = np.abs(np.asarray(state.lambda_dist)).max()
    for _ in range(20):
        state = step(state)
    lam2 = np.abs(np.asarray(state.lambda_dist)).max()
    assert lam2 < 10 * max(lam1, 1e-3)


def test_lambda_decay_and_clamp():
    state, topo, cfg = drop_scene(
        mode=SolveMode.COLORED,
        lambda_mode=LambdaMode.DECAY, lambda_decay=0.9, lambda_clamp=0.5)
    step = general.make_step(topo, cfg, DT, n_steps=50)
    state = step(state)
    assert np.abs(np.asarray(state.lambda_dist)).max() <= 0.5 + 1e-6


def test_velocity_reflect_floor_bounces():
    state, topo, cfg = drop_scene(
        floor_mode=FloorMode.VELOCITY_REFLECT, restitution=0.8,
        penetration_kick=0.0, damping=0.0, iterations=2)
    step = general.make_step(topo, cfg, DT)
    min_vy = 0.0
    max_vy_after_impact = -np.inf
    for _ in range(200):
        state = step(state)
        vy = float(np.asarray(state.velocities)[:, 1].mean())
        if vy < min_vy:
            min_vy = vy
        elif min_vy < -0.5:
            max_vy_after_impact = max(max_vy_after_impact, vy)
    assert min_vy < -0.5, "body must fall first"
    assert max_vy_after_impact > 0.1, \
        "restitution floor must produce an upward bounce"


def test_stiff_system_stable_with_guards():
    """Flagship-style guards (rel dlambda clamp + lambda clamp + min alpha)
    keep a zero-compliance Jacobi system stable."""
    state, topo, cfg = drop_scene(
        mode=SolveMode.JACOBI, iterations=4,
        max_dlambda_rel=0.1, lambda_clamp=100.0, min_alpha_tilde=1e-10,
        lambda_mode=LambdaMode.DECAY, lambda_decay=0.99)
    step = general.make_step(topo, cfg, DT, n_steps=200)
    state = step(state)
    assert bool(is_finite(state))


def test_diagnostics_fields():
    state, topo, cfg = drop_scene()
    d = diagnostics(state, topo)
    for k in ("max_velocity", "max_constraint_error", "mean_abs_lambda",
              "ground_contacts", "kinetic_energy", "is_finite", "com"):
        assert k in d
    from softbodysimulation_tpu.diag.diagnostics import format_diagnostics
    s = format_diagnostics(d)
    assert "maxVel" in s and "finite" in s


def test_kinetic_energy_dissipates():
    state, topo, cfg = drop_scene(damping=0.02)
    step = general.make_step(topo, cfg, DT, n_steps=200)
    for _ in range(5):
        state = step(state)
    ke = float(diagnostics(state, topo)["kinetic_energy"])
    assert ke < 1e-3  # settled


def test_max_force_clamp_both_gravity_modes():
    """max_force guard (XPBDSimulatorCS.compute:91-92): a huge external
    force is clamped identically in force- and acceleration-gravity modes,
    and consistently between the general and lattice engines."""
    from softbodysimulation_tpu.interact import forces
    from softbodysimulation_tpu.solvers import lattice as lat_engine
    from softbodysimulation_tpu.topology import lattice as lattice_mod
    from softbodysimulation_tpu import FloorMode

    spec = lattice_mod.lattice_spec(3, braced=True)
    for accel in (False, True):
        cfg = SolverConfig(substeps=1, iterations=1,
                           gravity=(0.0, 0.0, 0.0),
                           gravity_is_acceleration=accel,
                           max_force=10.0, damping=0.0,
                           floor_mode=FloorMode.NONE,
                           solve_mode=SolveMode.JACOBI)
        st = lat_engine.make_lattice_state(spec, center=(0, 1, 0))
        st = st.replace(ext_force=st.ext_force.at[:, 1].set(1e6))
        out = lat_engine.make_step(spec, cfg, 0.01)(st)
        vy = np.asarray(out.velocities)[:, 1]
        # dv = dt * w * clip(1e6) = 0.01 * 1 * 10 = 0.1
        assert np.allclose(vy.max(), 0.1, atol=0.05), (accel, vy.max())

        # general engine agrees
        pos = lattice_mod.lattice_points(3, center=(0, 1, 0))
        e, c = lattice_mod.lattice_edges(3, braced=True)
        topo = build.build_topology(pos, e, c, color=False)
        from softbodysimulation_tpu import state_from_topology
        stg = state_from_topology(topo, pos)
        stg = stg.replace(ext_force=stg.ext_force.at[:, 1].set(1e6))
        outg = general.make_step(topo, cfg, 0.01)(stg)
        assert np.allclose(np.asarray(outg.velocities)[:, 1].max(), 0.1,
                           atol=0.05)
