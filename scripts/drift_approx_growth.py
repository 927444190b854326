"""Error-growth curve for approx_math (r3 verdict item 10): exact vs
approx streamed kernel on the HEADLINE scene (bench.py's res-40 braced
lattice, fast_math RESET x1 JACOBI), quasi-static settle, max-abs
position drift sampled at 1k / 10k / 100k substeps.  Quantifies the
accuracy cost behind the 4.1e9 approx headline.

Run on real TPU: python scripts/drift_approx_growth.py
(writes scripts/drift_approx_growth.out.json)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from softbodysimulation_tpu import LambdaMode, SolveMode, SolverConfig
from softbodysimulation_tpu.kernels import lattice_pallas
from softbodysimulation_tpu.solvers import lattice as lat
from softbodysimulation_tpu.topology import lattice

# bench.py's headline scene/config exactly (quasi-static: the cube
# settles onto the floor under damping and holds — the drift-validatable
# regime per BENCHMARKS.md "Chaos caveat")
cfg = SolverConfig(substeps=8, iterations=1, damping=0.02,
                   solve_mode=SolveMode.JACOBI,
                   lambda_mode=LambdaMode.RESET,
                   gravity_is_acceleration=True, fast_math=True,
                   ground_height=0.0, friction=0.3)
spec = lattice.lattice_spec(40, braced=True)
state = lat.make_lattice_state(spec, center=(0.0, 0.6, 0.0), mass=0.001)

CHUNK = 1000
exact = lattice_pallas.make_pallas_substep_runner_streamed(
    spec, cfg, 1 / 480, CHUNK)
approx = lattice_pallas.make_pallas_substep_runner_streamed(
    spec, cfg, 1 / 480, CHUNK, approx_math=True)

se = sa = state
checkpoints = {1_000, 10_000, 100_000}
rows = []
worst = 0.0
for k in range(100):  # 100,000 substeps
    se = exact(se)
    sa = approx(sa)
    done = (k + 1) * CHUNK
    pe = np.asarray(se.positions)
    pa = np.asarray(sa.positions)
    d = float(np.abs(pe - pa).max())
    worst = max(worst, d)
    if done in checkpoints:
        assert np.isfinite(pa).all() and np.isfinite(pe).all()
        rows.append({"substeps": done, "max_abs_drift": d,
                     "worst_so_far": worst})
        print(f"substeps {done}: exact-vs-approx drift {d:.3e} "
              f"(worst {worst:.3e})", flush=True)

out = {"metric": "approx_vs_exact_drift_growth",
       "scene": "bench.py res-40 quasi-static settle",
       "rows": rows, "worst": worst}
print(json.dumps(out))
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "drift_approx_growth.out.json"), "w") as f:
    json.dump(out, f, indent=1)
