"""Example 4 — interactive poke/drag impulses with self-collision via the
spatial-hash grid (BASELINE config 4).

Two soft cubes dropped into the same spot; scripted pokes stand in for the
mouse interactions of ``SoftBodyInteractor`` (the functional API accepts any
schedule, including a live UI loop feeding positions)."""

from __future__ import annotations

import numpy as np

from ..core.config import LambdaMode, SolveMode, SolverConfig
from ..core.state import SimState, make_state
from ..interact import forces
from ..solvers import general
from ..topology import build, lattice


def run(res: int = 4, steps: int = 400, dt: float = 1 / 60,
        verbose: bool = True):
    spacing = 1.0 / (res - 1)
    pos_a = lattice.lattice_points(res, center=(0.0, 0.8, 0.0))
    pos_b = lattice.lattice_points(res, center=(0.15, 2.1, 0.1))
    pos = np.concatenate([pos_a, pos_b])
    e, comp = lattice.lattice_edges(res, braced=True)
    edges = np.concatenate([e, e + res ** 3])
    comp = np.concatenate([comp, comp])
    topo = build.build_topology(pos, edges, comp, color=False)

    cfg = SolverConfig(
        substeps=4, iterations=2, damping=0.03,
        solve_mode=SolveMode.JACOBI,
        lambda_mode=LambdaMode.WARM_START, lambda_decay=1.0,
        enable_self_collision=True,
        particle_radius=0.45 * spacing, hash_grid_dim=32,
        ground_height=0.0, friction=0.3)

    state = make_state(pos, n_edges=topo.n_edges)
    step = general.make_step(topo, cfg, dt, n_steps=1)

    poke_at = {steps // 2: ((80.0, 60.0, 0.0), (0.0, 0.3, 0.0), 0.6),
               3 * steps // 4: ((-60.0, 40.0, 20.0), (0.3, 0.5, 0.0), 0.8)}
    for i in range(steps):
        if i in poke_at:
            f, p, r = poke_at[i]
            state = forces.add_force(state, f, p, radius=r)
        state = step(state)

    if verbose:
        p = np.asarray(state.positions)
        n = res ** 3
        d = np.linalg.norm(p[:n, None, :] - p[None, n:, :], axis=-1)
        print(f"finite={np.isfinite(p).all()} ymin={p[:, 1].min():.4f} "
              f"min inter-body distance={d.min():.4f} "
              f"(2r={2 * cfg.particle_radius:.4f})")
    return state, topo


if __name__ == "__main__":
    run()
