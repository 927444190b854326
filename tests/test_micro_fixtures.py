"""Analytic micro-fixtures — formalised from the reference's interactive test
scenarios (``InitializationMode.cs:3-10`` -> ``SoftBodyCPU.CreateTest_*``,
``SoftBodyCPU.cs:467-595``; ``SimpleTwoParticleTest``,
``SoftBodySimulator.cs:1060-1098``)."""

import numpy as np
import pytest

from softbodysimulation_tpu import (
    SolveMode,
    SolverConfig,
    FloorMode,
    state_from_topology,
)
from softbodysimulation_tpu.topology import build
from softbodysimulation_tpu.solvers import general

DT = 0.02
NOGRAV = SolverConfig(
    substeps=1,
    iterations=20,
    gravity=(0.0, 0.0, 0.0),
    damping=0.05,
    floor_mode=FloorMode.NONE,
)


def run(state, topo, cfg, steps, dt=DT):
    step = general.make_step(topo, cfg, dt)
    for _ in range(steps):
        state = step(state)
    return state


@pytest.mark.parametrize("mode", [SolveMode.COLORED, SolveMode.JACOBI])
class TestTwoParticles:
    """CreateTest_Distance_2Particles / SimpleTwoParticleTest: one pinned
    particle, one stretched particle, one stiff constraint — the free
    particle must converge to rest length."""

    def test_stretched_converges_to_rest(self, mode):
        pos = np.array([[0, 0, 0], [2, 0, 0]], np.float32)
        topo = build.build_topology(pos, [[0, 1]], compliance=0.0,
                                    rest_lengths=np.array([1.0], np.float32))
        state = state_from_topology(topo, pos, inv_mass=[0.0, 1.0])
        cfg = NOGRAV.replace(solve_mode=mode)
        state = run(state, topo, cfg, 200)
        p = np.asarray(state.positions)
        assert np.allclose(p[0], [0, 0, 0], atol=1e-6)  # pinned never moves
        assert abs(np.linalg.norm(p[1] - p[0]) - 1.0) < 1e-3

    def test_compliant_spring_stretches_under_gravity(self, mode):
        # soft constraint hanging under gravity: equilibrium stretch
        # C = -m*g*compliance... XPBD: at equilibrium lambda = -C/alpha~*...
        # just assert it stretches beyond rest and stays finite
        pos = np.array([[0, 0, 0], [0, -1, 0]], np.float32)
        topo = build.build_topology(pos, [[0, 1]], compliance=0.01)
        state = state_from_topology(topo, pos, inv_mass=[0.0, 1.0])
        cfg = SolverConfig(substeps=1, iterations=30, damping=0.1,
                           solve_mode=mode, floor_mode=FloorMode.NONE)
        state = run(state, topo, cfg, 400)
        p = np.asarray(state.positions)
        length = np.linalg.norm(p[1] - p[0])
        # analytic equilibrium: alpha~ = c/dt^2; lambda = -mg... for XPBD with
        # reset-lambda each step, steady state satisfies C = compliance * f
        expected = 1.0 + 0.01 * 9.81  # C = alpha * force at equilibrium
        assert abs(length - expected) < 2e-2
        assert np.isfinite(p).all()


@pytest.mark.parametrize("mode", [SolveMode.COLORED, SolveMode.JACOBI])
class TestThreeParticles:
    def test_line_converges(self, mode):
        # CreateTest_Distance_3Particles_Line stretched variant
        pos = np.array([[0, 0, 0], [1.5, 0, 0], [3.2, 0, 0]], np.float32)
        topo = build.build_topology(
            pos, [[0, 1], [1, 2]], compliance=0.0,
            rest_lengths=np.array([1.0, 1.0], np.float32))
        state = state_from_topology(topo, pos)
        cfg = NOGRAV.replace(solve_mode=mode, damping=0.1)
        state = run(state, topo, cfg, 300)
        p = np.asarray(state.positions)
        assert abs(np.linalg.norm(p[1] - p[0]) - 1.0) < 1e-3
        assert abs(np.linalg.norm(p[2] - p[1]) - 1.0) < 1e-3

    def test_triangle_holds_shape(self, mode):
        # CreateTest_Distance_3Particles_Triangle: equilateral stays rigid
        pos = np.array(
            [[0, 0, 0], [1, 0, 0], [0.5, np.sqrt(0.75), 0]], np.float32)
        e = [[0, 1], [1, 2], [2, 0]]
        topo = build.build_topology(pos, e, compliance=0.0)
        state = state_from_topology(topo, pos)
        # perturb one vertex
        state = state.replace(
            positions=state.positions.at[2].add(
                np.array([0.3, 0.2, 0.0], np.float32)))
        cfg = NOGRAV.replace(solve_mode=mode, damping=0.1)
        state = run(state, topo, cfg, 300)
        p = np.asarray(state.positions)
        for (a, b) in e:
            assert abs(np.linalg.norm(p[b] - p[a]) - 1.0) < 2e-3


@pytest.mark.parametrize("mode", [SolveMode.COLORED, SolveMode.JACOBI])
class TestButterfly:
    """CreateTest_Bending_4Particles_FlatButterfly
    (``SoftBodyCPU.cs:542-595``): stiff distance scaffolding + one bending
    hinge; a folded butterfly must restore its rest dihedral angle."""

    def _measure_angle(self, p):
        e0 = p[1] - p[0]
        n1 = np.cross(e0, p[2] - p[0])
        n2 = np.cross(p[3] - p[0], e0)
        c = np.dot(n1, n2) / (np.linalg.norm(n1) * np.linalg.norm(n2))
        return np.arccos(np.clip(c, -1, 1))

    def test_folded_butterfly_unfolds(self, mode):
        flat = np.array(
            [[0, 0, 0], [1, 0, 0], [0.5, 0.5, 0], [0.5, -0.5, 0]], np.float32)
        e = [[0, 1], [0, 2], [1, 2], [0, 3], [1, 3]]
        h = [[0, 1, 2, 3]]
        topo = build.build_topology(
            flat, e, compliance=1e-5, hinges=h, bend_compliance=1e-4)
        # fold tip 3 out of plane ~60 degrees
        folded = flat.copy()
        folded[3] = [0.5, -0.25, 0.43]
        state = state_from_topology(topo, folded)
        cfg = NOGRAV.replace(solve_mode=mode, damping=0.2, iterations=30,
                             enable_bending=True)
        rest = self._measure_angle(flat)
        start = self._measure_angle(folded)
        state = run(state, topo, cfg, 500)
        p = np.asarray(state.positions)
        final = self._measure_angle(p)
        assert np.isfinite(p).all()
        # must move clearly toward the rest angle
        assert abs(final - rest) < 0.25 * abs(start - rest)
        # distances preserved by scaffolding
        for (a, b), r in zip(e, np.asarray(topo.rest_lengths)):
            assert abs(np.linalg.norm(p[b] - p[a]) - r) < 5e-3
