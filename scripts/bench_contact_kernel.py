"""Same-run A/B: fused Pallas blocked-contact kernel vs the XLA blocked
backend at 64k self-colliding particles (two res-32 bodies, the r2
benchmark regime — BENCHMARKS.md), driven through the general engine.

Round-2 verdict item 2: exact 64k self-collision >= 1e7 particle-
substeps/s (5x the XLA blocked backend's 1.89e6).  Prints one JSON line
per row.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from softbodysimulation_tpu import (  # noqa: E402
    LambdaMode,
    SolveMode,
    SolverConfig,
    state_from_topology,
)
from softbodysimulation_tpu.solvers import general  # noqa: E402
from softbodysimulation_tpu.topology import build, lattice  # noqa: E402

STEPS_PER_CALL = int(os.environ.get("BENCH_STEPS_PER_CALL", "10"))
BLOCKS = os.environ.get("BENCH_CONTACT_BLOCKS", "256x8,128x8,128x6")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def build_scene():
    res = 32
    pos_a = lattice.lattice_points(res, center=(0.0, 0.55, 0.0))
    pos_b = lattice.lattice_points(res, center=(0.93, 0.55, 0.0))
    pos = np.vstack([pos_a, pos_b]).astype(np.float32)
    edges, comp = lattice.lattice_edges(res, braced=True)
    e2 = np.vstack([edges, edges + len(pos_a)])
    c2 = np.concatenate([comp, comp])
    topo = build.build_topology(pos, e2, c2, color=False)
    return pos, topo


def measure(fn, state, n, work, repeats=4):
    out = fn(state)
    np.asarray(out.positions)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(out)
        np.asarray(out.positions.reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best, n * work / best, out


def main():
    pos, topo = build_scene()
    n = topo.n_particles
    base = dict(substeps=4, iterations=2, damping=0.02,
                solve_mode=SolveMode.JACOBI, lambda_mode=LambdaMode.RESET,
                gravity_is_acceleration=True,
                enable_self_collision=True, particle_radius=1.0 / 31 / 2,
                ground_height=0.0, friction=0.3)
    st = state_from_topology(topo, pos, mass=0.001)
    work = STEPS_PER_CALL * base["substeps"]

    cfg_x = SolverConfig(self_collision_backend="blocked",
                         collision_block_size=256, block_neighbors=8,
                         **base)
    fn_x = general.make_step(topo, cfg_x, 1 / 60, n_steps=STEPS_PER_CALL)
    _, rate_x, warm_x = measure(fn_x, st, n, work)
    emit(row="contact64k_xla_blocked_B256_M8",
         particle_substeps_per_s=float(f"{rate_x:.4g}"), n=n)
    ref_pos = np.asarray(fn_x(st).positions)

    for spec in BLOCKS.split(","):
        bsz, m = (int(v) for v in spec.split("x"))
        cfg_p = SolverConfig(self_collision_backend="blocked_pallas",
                             collision_block_size=bsz, block_neighbors=m,
                             **base)
        tag = f"B{bsz}_M{m}"
        try:
            fn_p = general.make_step(topo, cfg_p, 1 / 60,
                                     n_steps=STEPS_PER_CALL)
            t0 = time.perf_counter()
            wp = np.asarray(fn_p(st).positions)
            compile_s = time.perf_counter() - t0
            drift = float(np.abs(wp - ref_pos).max())
            if not np.isfinite(wp).all():
                raise RuntimeError("non-finite output")
            # same B/M must track the XLA pass tightly; smaller blocks are
            # a different (still exact-when-no-overflow) tiling, so only
            # health-check those
            if (bsz, m) == (256, 8) and drift >= 1e-3:
                raise RuntimeError(f"diverges from XLA blocked: {drift}")
            _, rate_p, _ = measure(fn_p, st, n, work)
            emit(row=f"contact64k_pallas_{tag}",
                 particle_substeps_per_s=float(f"{rate_p:.4g}"),
                 drift_vs_xla=float(f"{drift:.3g}"),
                 compile_s=round(compile_s, 1),
                 speedup_vs_xla=float(f"{rate_p / rate_x:.3g}"))
        except Exception as e:  # noqa: BLE001
            emit(row=f"contact64k_pallas_{tag}", ok=False,
                 err=f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
