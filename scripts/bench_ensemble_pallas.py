"""Fused ensemble kernel same-run A/B: 1024 x 64p bodies folded into
lanes, Pallas (exact + approx) vs the XLA lane-folded engine on real
TPU (recorded: 1.13e9 / 9.77e8 vs 7.82e8 — BENCHMARKS.md)."""
import sys, time, json
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp
from softbodysimulation_tpu import SolverConfig, SolveMode, LambdaMode
from softbodysimulation_tpu.kernels import lattice_pallas
from softbodysimulation_tpu.solvers import lattice as lat
from softbodysimulation_tpu.topology import lattice
from softbodysimulation_tpu.parallel import batch as pbatch

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

spec = lattice.lattice_spec(4, braced=True)
cfg = SolverConfig(substeps=4, iterations=1, damping=0.02,
                   solve_mode=SolveMode.JACOBI, lambda_mode=LambdaMode.RESET,
                   gravity_is_acceleration=True, fast_math=True,
                   ground_height=0.0, friction=0.3)
nb = 1024
base = lat.make_lattice_state(spec, center=(0, 1.0, 0), mass=0.01)
batched = pbatch.replicate_state(base, nb)
rng = np.random.RandomState(0)
offs = np.stack([rng.uniform(-8, 8, nb), rng.uniform(0, 2, nb),
                 rng.uniform(-8, 8, nb)], 1).astype(np.float32)
batched = batched.replace(positions=batched.positions + offs[:, None, :])
n_p = nb * spec.n_particles

L = 2000  # substeps per call
try:
    fnp = lattice_pallas.make_pallas_substep_runner_streamed(
        spec, cfg, 1 / 240, L, n_bodies=nb)
    measure("ensemble 1024x64p pallas streamed", fnp, batched, n_p, L)
    fnpa = lattice_pallas.make_pallas_substep_runner_streamed(
        spec, cfg, 1 / 240, L, n_bodies=nb, approx_math=True)
    measure("ensemble 1024x64p pallas approx", fnpa, batched, n_p, L)
except Exception as e:
    print(f"pallas ensemble failed: {type(e).__name__}: {e}", flush=True)

steps = L // cfg.substeps
fnx = lat.make_batched_step(spec, cfg, 1 / 60, nb, n_steps=steps)
measure("ensemble 1024x64p xla lane-folded", fnx, batched, n_p, L)
