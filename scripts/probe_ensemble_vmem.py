"""Probe which streamed-kernel cache ladder rungs compile for the
ensemble geometry (res-4 braced x 1024 bodies -> 4x16384 planes).

Round-3 regression hunt: the mask-cache default (c39e2a4) OOMs scoped
vmem at this geometry (18.86M vs the 16M limit) where the round-2 wb
cache compiled.  Tries (mask_cache, dc_cache) combos and reports
compile-ok + measured rate so the auto heuristic can be recalibrated.
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np

from softbodysimulation_tpu.core.config import SolverConfig, SolveMode, LambdaMode
from softbodysimulation_tpu.topology import lattice
from softbodysimulation_tpu.solvers import lattice as lat
from softbodysimulation_tpu.parallel import batch as pbatch
from softbodysimulation_tpu.kernels import lattice_pallas

spec4 = lattice.lattice_spec(4, braced=True)
cfg4 = SolverConfig(substeps=4, iterations=1, damping=0.02,
                    solve_mode=SolveMode.JACOBI,
                    lambda_mode=LambdaMode.RESET,
                    gravity_is_acceleration=True,
                    ground_height=0.0, friction=0.3)
base = lat.make_lattice_state(spec4, center=(0, 1.0, 0))
batched = pbatch.replicate_state(base, 1024)
rng = np.random.RandomState(0)
offs = np.stack([rng.uniform(-8, 8, 1024), rng.uniform(0, 2, 1024),
                 rng.uniform(-8, 8, 1024)], 1).astype(np.float32)
batched = batched.replace(positions=batched.positions + offs[:, None, :])

N_SUB = 120
combos = [
    {"mask_cache": False, "dc_cache": None},   # round-2 spelling (wb cache)
    {"mask_cache": False, "dc_cache": False},
    {"mask_cache": True, "dc_cache": False},
    {"mask_cache": True, "dc_cache": None},    # current default (OOMs?)
]
for kw in combos:
    tag = json.dumps(kw)
    try:
        fn = lattice_pallas.make_pallas_substep_runner_streamed(
            spec4, cfg4, (1 / 60) / 4, N_SUB, n_bodies=1024, **kw)
        out = fn(batched)
        np.asarray(out.positions[0, 0])          # host-fetch barrier
        t0 = time.perf_counter()
        out = fn(batched)
        np.asarray(out.positions[0, 0])
        dt = time.perf_counter() - t0
        rate = 1024 * 64 * N_SUB / dt
        fin = bool(np.isfinite(np.asarray(out.positions)).all())
        print(f"OK   {tag}  {rate:.4g} ps/s  finite={fin}", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {tag}  {type(e).__name__}: {msg}", flush=True)
