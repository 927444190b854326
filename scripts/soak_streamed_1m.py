"""1M-substep stability + sustained-rate soak of the streamed Pallas
kernel on real TPU (recorded: 4.77e9 particle-substeps/s sustained,
BENCHMARKS.md).  Run: python scripts/soak_streamed_1m.py"""
import sys, time, json
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from softbodysimulation_tpu import SolverConfig, SolveMode, LambdaMode
from softbodysimulation_tpu.kernels import lattice_pallas
from softbodysimulation_tpu.solvers import lattice as lat
from softbodysimulation_tpu.topology import lattice

spec = lattice.lattice_spec(40, braced=True)
cfg = SolverConfig(substeps=8, iterations=1, damping=0.02,
                   solve_mode=SolveMode.JACOBI, lambda_mode=LambdaMode.RESET,
                   gravity_is_acceleration=True, fast_math=True,
                   ground_height=0.0, friction=0.3)
st = lat.make_lattice_state(spec, center=(0, 0.6, 0), mass=0.001)
L = 2000
fn = lattice_pallas.make_pallas_substep_runner_streamed(
    spec, cfg, 1 / 480, L, approx_math=True)
st = fn(st); np.asarray(st.positions)          # compile
t0 = time.perf_counter()
CALLS = 500                                     # 1,000,000 substeps
for k in range(CALLS):
    st = fn(st)
    if (k + 1) % 100 == 0:
        np.asarray(st.positions[0, 0])          # periodic sync
np.asarray(st.positions[0, 0])
el = time.perf_counter() - t0
p = np.asarray(st.positions)
h = p[:, 1].max() - p[:, 1].min()
ok = bool(np.isfinite(p).all()) and bool(p[:, 1].min() > -1e-2) and bool(h > 0.5)
print(json.dumps({"metric": "soak_1M_substeps_streamed_approx",
                  "sustained_ps": spec.n_particles * CALLS * L / el,
                  "finite": bool(np.isfinite(p).all()),
                  "rest_height": float(h), "healthy": bool(ok)}))
