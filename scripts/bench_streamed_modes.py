"""Focused A/B: the streamed Pallas kernel's round-2 scope extensions.

1. Faithful flagship config (COLORED family-parity GS + DECAY 0.99 +
   VELOCITY_REFLECT + 9 iterations, full epsilon guards) at 64k:
   streamed kernel vs the XLA stencil engine, same run.
2. Headline RESET/JACOBI regime at res 40 with approx_math on the
   streamed kernel vs exact streamed.

Synchronised by host fetch (block_until_ready is not a barrier through
the axon relay).  Prints JSON lines per workload.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

from softbodysimulation_tpu import (  # noqa: E402
    FloorMode, LambdaMode, SolveMode, SolverConfig,
)
from softbodysimulation_tpu.kernels import lattice_pallas  # noqa: E402
from softbodysimulation_tpu.solvers import lattice as lat  # noqa: E402
from softbodysimulation_tpu.topology import lattice  # noqa: E402


def measure(name, fn, state, particles, work_per_call, repeats=4):
    out = fn(state)
    np.asarray(out.positions)
    out = fn(out)
    np.asarray(out.positions)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(out)
        np.asarray(out.positions.reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    p = np.asarray(out.positions)
    ps = particles * work_per_call / best
    finite = bool(np.isfinite(p).all())
    print(json.dumps({"workload": name,
                      "particle_substeps_per_sec": ps,
                      "finite": finite}), flush=True)
    return ps


def main():
    print(f"backend: {jax.default_backend()}", flush=True)

    # --- faithful flagship at 64k (scenes/bench_suite 1b semantics)
    spec_f = lattice.lattice_spec(40, braced=False)
    cfg_f = SolverConfig(substeps=4, iterations=9, damping=0.01,
                         solve_mode=SolveMode.COLORED,
                         lambda_mode=LambdaMode.DECAY, lambda_decay=0.99,
                         floor_mode=FloorMode.VELOCITY_REFLECT,
                         gravity_is_acceleration=True,
                         ground_height=0.0, fast_math=False)
    st_f = lat.make_lattice_state(spec_f, center=(0, 0.6, 0), mass=0.001)
    Lf = 200
    try:
        fn_fp = lattice_pallas.make_pallas_substep_runner_streamed(
            spec_f, cfg_f, 1 / 240, Lf)
        measure("faithful 64k streamed pallas", fn_fp, st_f,
                spec_f.n_particles, Lf)
    except Exception as e:  # noqa: BLE001
        print(f"faithful streamed unavailable: {type(e).__name__}: {e}",
              flush=True)
    fn_fx = lat.make_substep_runner(spec_f, cfg_f, 1 / 240, Lf)
    measure("faithful 64k xla stencil", fn_fx, st_f,
            spec_f.n_particles, Lf)

    # --- headline regime, streamed approx_math A/B
    spec = lattice.lattice_spec(40, braced=True)
    cfg = SolverConfig(substeps=8, iterations=1, damping=0.02,
                       solve_mode=SolveMode.JACOBI,
                       lambda_mode=LambdaMode.RESET,
                       gravity_is_acceleration=True, fast_math=True,
                       ground_height=0.0, friction=0.3)
    st = lat.make_lattice_state(spec, center=(0, 0.6, 0), mass=0.001)
    L = 2000
    fn_a = lattice_pallas.make_pallas_substep_runner_streamed(
        spec, cfg, 1 / 480, L, approx_math=True)
    measure("headline 64k streamed approx_math", fn_a, st,
            spec.n_particles, L)
    fn_e = lattice_pallas.make_pallas_substep_runner_streamed(
        spec, cfg, 1 / 480, L)
    measure("headline 64k streamed exact", fn_e, st, spec.n_particles, L)


if __name__ == "__main__":
    main()
