"""Example 3 — pressure/volume-preserving inflated ball dropped onto a sphere
SDF collider with friction (BASELINE config 3)."""

from __future__ import annotations

import numpy as np

from ..core.config import SolveMode, SolverConfig
from ..core.state import state_from_topology
from ..diag.diagnostics import diagnostics, format_diagnostics
from ..ops.volume import enclosed_volume
from ..solvers import general
from ..topology import build, mesh


def run(subdivisions: int = 2, steps: int = 400, dt: float = 1 / 60,
        pressure: float = 1.15, verbose: bool = True):
    m = mesh.icosphere(subdivisions, radius=0.4)
    pos, topo = build.topology_from_mesh(m, compliance=5e-4, bending=False)
    pos = pos + np.array([0.1, 2.0, 0.0], np.float32)
    state = state_from_topology(topo, pos)

    cfg = SolverConfig(
        substeps=4, iterations=4, damping=0.02,
        solve_mode=SolveMode.JACOBI,
        enable_volume=True, volume_compliance=0.0, pressure=pressure,
        sphere_colliders=((0.0, 0.0, 0.0, 0.8),),
        ground_height=-2.0, friction=0.4)
    step = general.make_step(topo, cfg, dt, n_steps=steps)
    state = step(state)

    if verbose:
        v0 = float(np.asarray(topo.rest_volume))
        v = float(enclosed_volume(state.positions, topo.triangles))
        print(format_diagnostics(diagnostics(state, topo,
                                             ground_height=-2.0)))
        print(f"volume: rest={v0:.4f} inflated target={pressure * v0:.4f} "
              f"actual={v:.4f}")
        r = np.linalg.norm(np.asarray(state.positions), axis=1)
        print(f"min distance to collider centre: {r.min():.3f} "
              f"(collider radius 0.8)")
    return state, topo


if __name__ == "__main__":
    run()
