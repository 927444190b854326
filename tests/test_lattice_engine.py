"""Stencil lattice engine vs the general engine and the oracle.

The stencil engine replaces the edge list with 7 roll/mask offset families;
with family-parity coloring the general COLORED engine replays the identical
constraint ordering, so the two must agree to floating-point noise.
"""

import numpy as np
import pytest

from softbodysimulation_tpu import (
    FloorMode,
    SolveMode,
    SolverConfig,
    state_from_topology,
)
from softbodysimulation_tpu.solvers import general, lattice as lat_engine
from softbodysimulation_tpu.topology import build, lattice

DT = 0.02


def stencil_and_general(res, cfg, center=(0, 1.5, 0)):
    spec = lattice.lattice_spec(res)
    state_s = lat_engine.make_lattice_state(spec, center=center)
    pos = lattice.lattice_points(res, center=center)
    edges, comp = lattice.lattice_edges(res)
    colors = lattice.lattice_family_colors(res)
    topo = build.build_topology(pos, edges, comp, colors=colors)
    state_g = state_from_topology(topo, pos)
    return spec, state_s, topo, state_g


@pytest.mark.parametrize("res", [2, 3, 4])
def test_stencil_matches_general_colored(res):
    cfg = SolverConfig(substeps=2, iterations=6, damping=0.02,
                       solve_mode=SolveMode.COLORED, ground_height=0.0,
                       friction=0.2)
    spec, state_s, topo, state_g = stencil_and_general(res, cfg)
    step_s = lat_engine.make_step(spec, cfg, DT)
    step_g = general.make_step(topo, cfg, DT)
    for _ in range(20):
        state_s = step_s(state_s)
        state_g = step_g(state_g)
    early = np.abs(np.asarray(state_s.positions)
                   - np.asarray(state_g.positions)).max()
    # identical semantics: pre-contact trajectories agree to fp noise
    assert early < 1e-6, f"stencil vs general early drift {early}"


@pytest.mark.parametrize("res", [3, 4])
def test_stencil_matches_general_settled_unique_equilibrium(res):
    """Long-horizon agreement needs a UNIQUE equilibrium (the bouncing
    floor scenario has several rest states for the under-braced reference
    lattice, and fp noise can pick different ones).  A pinned-top hanging
    lattice with damping has one: both engines must settle onto it."""
    cfg = SolverConfig(substeps=2, iterations=6, damping=0.05,
                       solve_mode=SolveMode.COLORED,
                       floor_mode=FloorMode.NONE)
    spec, state_s, topo, state_g = stencil_and_general(
        res, cfg, center=(0, 0, 0))
    pos = np.asarray(state_s.positions)
    top = np.flatnonzero(pos[:, 1] > pos[:, 1].max() - 1e-5)
    state_s = state_s.replace(inv_mass=state_s.inv_mass.at[top].set(0.0))
    state_g = state_g.replace(inv_mass=state_g.inv_mass.at[top].set(0.0))
    step_s = lat_engine.make_step(spec, cfg, DT, n_steps=300)
    step_g = general.make_step(topo, cfg, DT, n_steps=300)
    out_s = step_s(state_s)
    out_g = step_g(state_g)
    late = np.abs(np.asarray(out_s.positions)
                  - np.asarray(out_g.positions)).max()
    assert late < 1e-4, f"settled drift {late}"
    assert np.abs(np.asarray(out_s.velocities)).max() < 0.01


def test_stencil_matches_oracle():
    """Stencil engine against the frozen NumPy oracle directly (oracle
    processes constraints in the stencil's family-parity order)."""
    from softbodysimulation_tpu.solvers import reference_cpu

    res = 3
    cfg = SolverConfig(substeps=1, iterations=8, damping=0.01,
                       solve_mode=SolveMode.COLORED, ground_height=0.0)
    spec, state_s, topo, _ = stencil_and_general(res, cfg)
    oracle = reference_cpu.ReferenceSolver(
        np.asarray(state_s.positions), np.asarray(topo.edges),
        np.asarray(topo.rest_lengths), np.asarray(topo.compliance),
        np.asarray(state_s.inv_mass), cfg, colors=np.asarray(topo.colors))
    step_s = lat_engine.make_step(spec, cfg, DT)
    for _ in range(100):
        state_s = step_s(state_s)
        oracle.step(DT)
    drift = np.abs(np.asarray(state_s.positions) - oracle.x).max()
    assert drift < 1e-3, f"stencil vs oracle drift {drift}"


def test_braced_lattice_rests_at_full_height():
    """The braced 13-family lattice (both face diagonals + 4 cube diagonals)
    is hinge-free: a dropped cube rests at ~full height under gravity, in
    both Jacobi and warm-started small-steps regimes."""
    from softbodysimulation_tpu import LambdaMode

    spec = lattice.lattice_spec(5, braced=True)
    for kw in (
        dict(solve_mode=SolveMode.JACOBI, substeps=4, iterations=2),
        dict(solve_mode=SolveMode.COLORED, substeps=8, iterations=1,
             lambda_mode=LambdaMode.WARM_START, lambda_decay=1.0),
    ):
        cfg = SolverConfig(damping=0.02, ground_height=0.0, friction=0.3,
                           **kw)
        state = lat_engine.make_lattice_state(spec, center=(0, 1.5, 0))
        step = lat_engine.make_step(spec, cfg, DT, n_steps=400)
        state = step(state)
        p = np.asarray(state.positions)
        assert np.isfinite(p).all()
        assert p[:, 1].min() > -5e-3
        height = p[:, 1].max() - p[:, 1].min()
        assert height > 0.95, f"braced lattice must not sag: {height} ({kw})"


def test_reference_lattice_has_fold_hinges():
    """Documented reference-parity behavior: the 7-family single-diagonal
    bracing (SoftBodySimulator.cs:235-290) leaves fold hinge DOFs, so under
    sustained gravity + many iterations the cube crumples.  This is a
    property of the reference topology, not of the solver — the braced
    variant above holds its shape."""
    spec = lattice.lattice_spec(5, braced=False)
    cfg = SolverConfig(damping=0.02, ground_height=0.0, friction=0.3,
                       solve_mode=SolveMode.COLORED, substeps=4, iterations=16)
    state = lat_engine.make_lattice_state(spec, center=(0, 1.5, 0))
    step = lat_engine.make_step(spec, cfg, DT, n_steps=600)
    state = step(state)
    p = np.asarray(state.positions)
    assert np.isfinite(p).all()  # crumpled but stable
    height = p[:, 1].max() - p[:, 1].min()
    assert height < 0.95  # visibly sagged/crumpled — hinge DOFs are real


def test_stencil_pinned_corners_hang():
    spec = lattice.lattice_spec(4)
    state = lat_engine.make_lattice_state(spec, center=(0, 0, 0))
    pos = np.asarray(state.positions)
    top = np.flatnonzero(pos[:, 1] > pos[:, 1].max() - 1e-5)
    state = state.replace(inv_mass=state.inv_mass.at[top].set(0.0))
    cfg = SolverConfig(substeps=2, iterations=8, damping=0.05,
                       solve_mode=SolveMode.COLORED,
                       floor_mode=FloorMode.NONE)
    step = lat_engine.make_step(spec, cfg, DT, n_steps=300)
    state = step(state)
    p = np.asarray(state.positions)
    assert np.allclose(p[top], pos[top], atol=1e-6)
    assert p[:, 1].min() > -2.0  # hangs instead of free-falling


def test_stencil_velocity_reflect_floor():
    spec = lattice.lattice_spec(3)
    state = lat_engine.make_lattice_state(spec, center=(0, 1.0, 0))
    cfg = SolverConfig(substeps=2, iterations=4, damping=0.01,
                       solve_mode=SolveMode.COLORED,
                       floor_mode=FloorMode.VELOCITY_REFLECT,
                       restitution=0.5)
    step = lat_engine.make_step(spec, cfg, DT, n_steps=500)
    state = step(state)
    p = np.asarray(state.positions)
    assert np.isfinite(p).all()
    assert p[:, 1].min() > -0.01


def test_warm_start_stable_in_near_rigid_regime():
    """ROADMAP #4 (resolved): WARM_START at mass=0.001 (alpha~ << sum w)
    used to oscillate violently at rest (maxvel ~110 measured with
    full-strength pre-application); the SOR warm_start_fraction default
    keeps it quiet and resting at full height."""
    from softbodysimulation_tpu import LambdaMode

    spec = lattice.lattice_spec(8, braced=True)
    cfg = SolverConfig(substeps=8, iterations=1, damping=0.02,
                       solve_mode=SolveMode.JACOBI,
                       lambda_mode=LambdaMode.WARM_START, lambda_decay=1.0,
                       gravity_is_acceleration=True,
                       ground_height=0.0, friction=0.3)
    st = lat_engine.make_lattice_state(spec, center=(0, 0.6, 0), mass=0.001)
    out = lat_engine.make_step(spec, cfg, 1 / 60, n_steps=600)(st)
    p = np.asarray(out.positions)
    v = np.asarray(out.velocities)
    assert np.isfinite(p).all()
    assert np.abs(v).max() < 0.01, "near-rigid warm start oscillates"
    height = p[:, 1].max() - p[:, 1].min()
    assert 0.95 < height < 1.05
    assert p[:, 1].min() > -1e-3
