"""Dev smoke: general COLORED engine vs NumPy oracle on the 8-corner cube."""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from softbodysimulation_tpu import SolverConfig, SolveMode, state_from_topology
from softbodysimulation_tpu.topology import lattice, mesh, build
from softbodysimulation_tpu.solvers import general, reference_cpu

cfg = SolverConfig(
    substeps=1,
    iterations=10,
    gravity=(0.0, -9.81, 0.0),
    damping=0.01,
    solve_mode=SolveMode.COLORED,
    ground_height=0.0,
    friction=0.1,
)

pos = mesh.cube_corners(1.0) + np.array([0, 2.0, 0], np.float32)
edges = lattice.cube8_edges()
topo = build.build_topology(pos, edges, compliance=0.01)
print("edges:", topo.n_edges, "colors:", topo.num_colors)

state = state_from_topology(topo, pos)
oracle = reference_cpu.ReferenceSolver(
    pos, np.asarray(topo.edges), np.asarray(topo.rest_lengths),
    np.asarray(topo.compliance), np.asarray(state.inv_mass), cfg,
    colors=np.asarray(topo.colors))

dt = 0.02
step = general.make_step(topo, cfg, dt)
for i in range(500):
    state = step(state)
    oracle.step(dt)
    if i in (0, 9, 99, 499):
        drift = np.abs(np.asarray(state.positions) - oracle.x).max()
        print(f"step {i+1:4d}: drift={drift:.3e} "
              f"y_mean_jax={np.asarray(state.positions)[:,1].mean():.4f} "
              f"y_mean_oracle={oracle.x[:,1].mean():.4f}")
