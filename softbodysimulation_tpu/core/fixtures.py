"""Micro test-scenario builders — the ``InitializationMode`` catalogue
(``InitializationMode.cs:3-10`` -> ``SoftBodyCPU.CreateTest_*``,
``SoftBodyCPU.cs:467-595``) as library functions.

Each returns ``(positions, Topology, suggested_config)`` ready for any
engine; the test-suite uses them as analytic fixtures, and they are handy
interactive sanity scenes exactly as in the reference.
"""

from __future__ import annotations

import numpy as np

from ..topology import build as _build
from .config import FloorMode, SolveMode, SolverConfig

_BASE = SolverConfig(substeps=1, iterations=20, gravity=(0.0, 0.0, 0.0),
                     damping=0.05, floor_mode=FloorMode.NONE,
                     solve_mode=SolveMode.COLORED)


def two_particles(compliance: float = 0.01, stretched: bool = True):
    """One pinned + one free particle, one constraint
    (TestDistance_2Particles / SimpleTwoParticleTest)."""
    x1 = 2.0 if stretched else 1.0
    pos = np.array([[0, 0, 0], [x1, 0, 0]], np.float32)
    topo = _build.build_topology(
        pos, [[0, 1]], compliance,
        rest_lengths=np.array([1.0], np.float32))
    return pos, topo, _BASE


def three_particles_line(compliance: float = 0.01):
    pos = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]], np.float32)
    topo = _build.build_topology(pos, [[0, 1], [1, 2]], compliance)
    return pos, topo, _BASE


def three_particles_triangle(compliance: float = 0.01):
    pos = np.array(
        [[0, 0, 0], [1, 0, 0], [0.5, np.sqrt(0.75), 0]], np.float32)
    topo = _build.build_topology(
        pos, [[0, 1], [1, 2], [2, 0]], compliance)
    return pos, topo, _BASE


def butterfly(bend_compliance: float = 1e-4,
              scaffold_compliance: float = 1e-5, folded: bool = False):
    """4-particle butterfly: stiff distance scaffolding + one dihedral hinge
    (TestBending_4Particles_FlatButterfly, SoftBodyCPU.cs:542-595)."""
    flat = np.array(
        [[0, 0, 0], [1, 0, 0], [0.5, 0.5, 0], [0.5, -0.5, 0]], np.float32)
    e = [[0, 1], [0, 2], [1, 2], [0, 3], [1, 3]]
    topo = _build.build_topology(
        flat, e, scaffold_compliance, hinges=[[0, 1, 2, 3]],
        bend_compliance=bend_compliance)
    pos = flat.copy()
    if folded:
        pos[3] = [0.5, -0.25, 0.43]
    cfg = _BASE.replace(enable_bending=True, damping=0.2, iterations=30)
    return pos, topo, cfg


FIXTURES = {
    "two_particles": two_particles,
    "three_particles_line": three_particles_line,
    "three_particles_triangle": three_particles_triangle,
    "butterfly": butterfly,
}
