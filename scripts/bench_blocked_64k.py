"""Blocked exact self-collision at 64k particles on real TPU, vs the
approximate sorted window (recorded: 1.89e6 exact vs 2.33e6 approx —
BENCHMARKS.md)."""
import sys, time, json
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from softbodysimulation_tpu import SolverConfig, SolveMode, state_from_topology
from softbodysimulation_tpu.topology import lattice, build
from softbodysimulation_tpu.solvers import general

res = 32; n1 = res ** 3
pa = lattice.lattice_points(res, center=(0, 0.8, 0))
pb = lattice.lattice_points(res, center=(0.1, 2.0, 0.05))
pos = np.concatenate([pa, pb])
e, c = lattice.lattice_edges(res, braced=True)
topo = build.build_topology(pos, np.concatenate([e, e + n1]),
                            np.concatenate([c, c]), color=False)
spacing = 1.0 / (res - 1)
base = dict(substeps=4, iterations=2, damping=0.03,
            solve_mode=SolveMode.JACOBI, gravity_is_acceleration=True,
            enable_self_collision=True, particle_radius=0.45 * spacing,
            ground_height=0.0, friction=0.3)
steps = 20

def run(name, cfg):
    st = state_from_topology(topo, pos)
    fn = general.make_step(topo, cfg, 1 / 60, n_steps=steps)
    out = fn(st); np.asarray(out.positions)
    out = fn(out); np.asarray(out.positions)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        out = fn(out)
        np.asarray(out.positions.reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    p = np.asarray(out.positions)
    ps = 2 * n1 * steps * cfg.substeps / best
    print(json.dumps({"workload": name, "ps": ps,
                      "finite": bool(np.isfinite(p).all())}), flush=True)

for M in (8, 12):
    run(f"blocked 64k B=256 M={M}",
        SolverConfig(self_collision_backend="blocked",
                     collision_block_size=256, block_neighbors=M, **base))
run("sorted 64k W=16",
    SolverConfig(self_collision_backend="sorted", sorted_window=16, **base))
