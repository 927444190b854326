"""Example 1 — single soft-body cube: mass-spring + gravity + ground plane
(BASELINE config 1; the 'CpuCube'/'SoftBodySimulator' scene analog).

Runs the braced lattice on the stencil engine and, at small sizes, checks it
against the frozen CPU oracle.
"""

from __future__ import annotations

import numpy as np

from ..core.config import LambdaMode, SolveMode, SolverConfig
from ..diag.diagnostics import diagnostics, format_diagnostics
from ..solvers import lattice as lat_engine
from ..topology import build, lattice


def run(res: int = 8, steps: int = 300, dt: float = 1 / 60,
        verbose: bool = True):
    spec = lattice.lattice_spec(res, braced=True)
    cfg = SolverConfig(
        substeps=4, iterations=1, damping=0.02,
        solve_mode=SolveMode.JACOBI,
        lambda_mode=LambdaMode.WARM_START, lambda_decay=1.0,
        ground_height=0.0, friction=0.3)
    state = lat_engine.make_lattice_state(spec, center=(0.0, 1.5, 0.0))
    step = lat_engine.make_step(spec, cfg, dt, n_steps=steps)
    state = step(state)

    if verbose:
        # build a matching explicit topology for diagnostics
        pos = lattice.lattice_points(res, center=(0.0, 1.5, 0.0))
        edges, comp = lattice.lattice_edges(res, braced=True)
        topo = build.build_topology(pos, edges, comp, color=False)
        print(format_diagnostics(diagnostics(state, topo)))
        p = np.asarray(state.positions)
        print(f"rest height: {p[:, 1].max() - p[:, 1].min():.4f} "
              f"(ymin={p[:, 1].min():.4f})")
    return state


if __name__ == "__main__":
    run()
