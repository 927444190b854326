"""WARM_START 64k same-run A/B: streamed Pallas vs XLA stencil on real
TPU (recorded: 1.34e9 vs 8.7e8 — BENCHMARKS.md)."""
import sys, time, json
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from softbodysimulation_tpu import SolverConfig, SolveMode, LambdaMode
from softbodysimulation_tpu.kernels import lattice_pallas
from softbodysimulation_tpu.solvers import lattice as lat
from softbodysimulation_tpu.topology import lattice

def measure(name, fn, state, particles, work, repeats=4):
    out = fn(state); np.asarray(out.positions)
    out = fn(out); np.asarray(out.positions)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(out)
        np.asarray(out.positions.reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    p = np.asarray(out.positions)
    print(json.dumps({"workload": name, "ps": particles * work / best,
                      "finite": bool(np.isfinite(p).all())}), flush=True)

spec = lattice.lattice_spec(40, braced=True)
cfg = SolverConfig(substeps=8, iterations=1, damping=0.02,
                   solve_mode=SolveMode.JACOBI,
                   lambda_mode=LambdaMode.WARM_START, lambda_decay=1.0,
                   gravity_is_acceleration=True, fast_math=True,
                   ground_height=0.0, friction=0.3)
st = lat.make_lattice_state(spec, center=(0, 0.6, 0), mass=0.001)
L = 2000
fnp = lattice_pallas.make_pallas_substep_runner_streamed(spec, cfg, 1/480, L)
measure("warm 64k streamed pallas", fnp, st, spec.n_particles, L)
fnx = lat.make_substep_runner(spec, cfg, 1 / 480, L)
measure("warm 64k xla", fnx, st, spec.n_particles, L)
