#!/usr/bin/env python
"""Headline benchmark: particle-substeps/sec at 64k particles, one chip.

Workload: braced res=40 lattice cube (40^3 = 64,000 particles, 13 offset
families ~ 800k distance constraints) resting/settling on a ground plane,
stencil engine, warm-started XPBD (1 iteration x 8 substeps per 1/60 s frame
— the 'small steps' regime, which at matched cost is MORE accurate than the
reference's 9-iteration loop).

Prints exactly one JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
vs_baseline is vs the 1e9 particle-steps/sec target (BASELINE.md) — the
reference itself publishes no numbers; its flagship scene's configured upper
bound is ~3.1e4 particle-steps/s (SURVEY §6).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from softbodysimulation_tpu import (  # noqa: E402
    LambdaMode,
    SolveMode,
    SolverConfig,
)
from softbodysimulation_tpu.solvers import lattice as lat_engine  # noqa: E402
from softbodysimulation_tpu.topology import lattice  # noqa: E402

BASELINE = 1.0e9  # particle-substeps/sec target on one v5e chip

RES = int(os.environ.get("BENCH_RES", "40"))
DT = 1.0 / 60.0
SUBSTEPS = int(os.environ.get("BENCH_SUBSTEPS", "8"))
SUBSTEPS_PER_CALL = int(os.environ.get("BENCH_SUBSTEPS_PER_CALL", "400"))
TARGET_SECONDS = float(os.environ.get("BENCH_SECONDS", "5.0"))


def main():
    spec = lattice.lattice_spec(RES, braced=True)
    cfg = SolverConfig(
        substeps=SUBSTEPS,
        iterations=1,
        damping=0.02,
        solve_mode=SolveMode.JACOBI,
        lambda_mode=LambdaMode.WARM_START,
        lambda_decay=1.0,
        ground_height=0.0,
        friction=0.3,
    )
    state = lat_engine.make_lattice_state(spec, center=(0.0, 0.6, 0.0))
    # flat substep scan: one scan level keeps (remote) compile time flat
    step = lat_engine.make_substep_runner(
        spec, cfg, DT / SUBSTEPS, SUBSTEPS_PER_CALL)

    # compile + warmup
    state = step(state)
    jax.block_until_ready(state.positions)

    calls = 0
    t0 = time.perf_counter()
    while True:
        state = step(state)
        calls += 1
        jax.block_until_ready(state.positions)
        elapsed = time.perf_counter() - t0
        if elapsed >= TARGET_SECONDS:
            break

    n = spec.n_particles
    substeps_done = calls * SUBSTEPS_PER_CALL
    particle_substeps_per_sec = n * substeps_done / elapsed

    # sanity: simulation must have stayed healthy or the number is void
    p = np.asarray(state.positions)
    assert np.isfinite(p).all(), "non-finite state after benchmark"
    assert p[:, 1].min() > -1e-2, "floor violated after benchmark"

    print(json.dumps({
        "metric": "particle_substeps_per_sec_64k_1chip",
        "value": float(f"{particle_substeps_per_sec:.4g}"),
        "unit": "particle-substeps/s",
        "vs_baseline": float(f"{particle_substeps_per_sec / BASELINE:.4g}"),
    }))


if __name__ == "__main__":
    main()
