"""Example 2 — icosphere with XPBD distance constraints, 8 Jacobi substeps,
pinned anchor vertices (BASELINE config 2)."""

from __future__ import annotations

import numpy as np

from ..core.config import LambdaMode, SolveMode, SolverConfig
from ..core.state import state_from_topology
from ..diag.diagnostics import diagnostics, format_diagnostics
from ..interact import forces
from ..solvers import general
from ..topology import build, mesh


def run(subdivisions: int = 2, steps: int = 300, dt: float = 1 / 60,
        verbose: bool = True):
    m = mesh.icosphere(subdivisions, radius=0.5)
    pos, topo = build.topology_from_mesh(
        m, compliance=1e-4, bending=True, bend_compliance=1e-2)
    pos = pos + np.array([0.0, 1.5, 0.0], np.float32)
    # rebuild with translated rest positions (rest lengths unchanged)
    state = state_from_topology(topo, pos)

    # pin the top cap as anchors — the sphere hangs from them
    top = np.flatnonzero(pos[:, 1] > pos[:, 1].max() - 0.05)
    state = forces.pin_indices(state, top, pinned=True)

    cfg = SolverConfig(
        substeps=8, iterations=1, damping=0.02,
        solve_mode=SolveMode.JACOBI,
        lambda_mode=LambdaMode.WARM_START, lambda_decay=1.0,
        enable_bending=True,
        ground_height=0.0, friction=0.3)
    step = general.make_step(topo, cfg, dt, n_steps=steps)
    state = step(state)

    if verbose:
        print(format_diagnostics(diagnostics(state, topo)))
        p = np.asarray(state.positions)
        print(f"anchors fixed: "
              f"{np.allclose(p[top], pos[top], atol=1e-5)}; "
              f"ymin={p[:, 1].min():.4f}")
    return state, topo


if __name__ == "__main__":
    run()
