"""10k-substep streamed-vs-XLA drift on real TPU, quasi-static settle
(recorded: worst 7.9e-5, final 2.2e-5 and decreasing — BENCHMARKS.md
Accuracy).  Run: python scripts/drift_streamed_10k.py"""
import sys, json
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from softbodysimulation_tpu import SolverConfig, SolveMode, LambdaMode, FloorMode
from softbodysimulation_tpu.kernels import lattice_pallas
from softbodysimulation_tpu.solvers import lattice as lat
from softbodysimulation_tpu.topology import lattice

# quasi-static regime (the drift-validatable one, BENCHMARKS "Chaos
# caveat"): settle onto the floor, then hold — 10k substeps
cfg = SolverConfig(substeps=8, iterations=2, damping=0.02,
                   solve_mode=SolveMode.JACOBI,
                   lambda_mode=LambdaMode.DECAY, lambda_decay=0.98,
                   floor_mode=FloorMode.VELOCITY_REFLECT,
                   gravity_is_acceleration=True,
                   ground_height=0.0, friction=0.3)
spec = lattice.lattice_spec(10, braced=True)
state = lat.make_lattice_state(spec, center=(0.0, 0.6, 0.0), mass=0.001)
CHUNK = 500
xla = lat.make_substep_runner(spec, cfg, 1 / 480, CHUNK)
pal = lattice_pallas.make_pallas_substep_runner_streamed(
    spec, cfg, 1 / 480, CHUNK)
sx = sp = state
worst = 0.0
for k in range(20):  # 10,000 substeps
    sx = xla(sx)
    sp = pal(sp)
    px = np.asarray(sx.positions); pp = np.asarray(sp.positions)
    d = float(np.abs(px - pp).max())
    worst = max(worst, d)
    if k % 5 == 4:
        print(f"substep {(k+1)*CHUNK}: drift {d:.3e} (worst {worst:.3e})",
              flush=True)
assert np.isfinite(pp).all()
print(json.dumps({"metric": "streamed_vs_xla_drift_10k_substeps",
                  "final": d, "worst": worst}))
