"""Same-run A/B: fused Pallas mesh kernel vs the XLA windowed backend on
the single-instance bunny (the reference's canonical mesh workload,
``SoftBodyCPU.cs:269-325`` / ``Scenes/CpuMesh.unity:1174``).

Round-2 verdict item 1: lift single-instance bunny from 1.24e7 toward 1e8
particle-substeps/s by fusing the whole windowed sweep into one Mosaic
program.  Validates the kernel against the XLA trajectory before accepting
its number.  Prints one JSON line per row.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from softbodysimulation_tpu import (  # noqa: E402
    SolveMode,
    SolverConfig,
    state_from_topology,
)
from softbodysimulation_tpu.core.scenes import BUNNY_PATHS  # noqa: E402
from softbodysimulation_tpu.kernels import mesh_pallas  # noqa: E402
from softbodysimulation_tpu.solvers import general  # noqa: E402
from softbodysimulation_tpu.topology import build, mesh  # noqa: E402
from softbodysimulation_tpu.topology.objloader import load_obj  # noqa: E402

DT = 1.0 / 60.0
SUBSTEPS_PER_CALL = int(os.environ.get("BENCH_SUBSTEPS_PER_CALL", "2000"))
BLOCK_EDGES = [int(x) for x in
               os.environ.get("BENCH_BLOCK_EDGES", "256,128").split(",")]


def emit(**kw):
    print(json.dumps(kw), flush=True)


def measure(fn, state, n, work, repeats=5):
    out = fn(state)
    np.asarray(out.positions)          # compile + sync
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(out)
        np.asarray(out.positions.reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return n * work / best, out


def main():
    p = next((q for q in BUNNY_PATHS if os.path.exists(q)), None)
    m = load_obj(p) if p else mesh.icosphere(4, radius=0.5)
    pos, topo = build.topology_from_mesh(
        m, compliance=1e-6, windowed=True, block_edges=256, seg_align=32,
        window_dtype="bf16")
    pos = pos + np.array([0, 1.0, 0], np.float32)
    cfg = SolverConfig(substeps=4, iterations=4, damping=0.02,
                       solve_mode=SolveMode.JACOBI,
                       gravity_is_acceleration=True,
                       distance_backend="windowed",
                       ground_height=0.0, friction=0.3)
    st = state_from_topology(topo, pos)
    n = topo.n_particles
    dt_sub = DT / cfg.substeps

    # XLA windowed engine (the r2 backend), raw-substep framing to match
    from softbodysimulation_tpu.core.state import SimState  # noqa: F401
    import jax  # noqa: E402

    # XLA side at 50 steps/call (200 substeps) — the r2 suite's framing;
    # 500-step calls nest lax.scan too deep and compile pathologically
    # (CLAUDE.md).  Rates are per-substep, so the framing is fair.
    xla_steps = 50
    fn_x = general.make_step(topo, cfg, DT, n_steps=xla_steps)
    rate_x, warm_x = measure(fn_x, st, n, xla_steps * cfg.substeps)
    emit(row="bunny_xla_windowed", particle_substeps_per_s=float(
        f"{rate_x:.4g}"), n=n, e=topo.n_edges)

    # Validation is SELF-CALIBRATING: this workload (compliance 1e-6,
    # Chebyshev rho=0.9) amplifies ulp-level rounding differences
    # explosively on hardware — measured: the two XLA backends (gather vs
    # windowed) already differ by ~1e-2 after FOUR substeps.  A fixed
    # small tolerance would reject every formulation including XLA's own,
    # so the gate is: kernel-vs-windowed drift must not exceed the XLA
    # backends' own mutual spread at the same horizon.
    fn_x_val = general.make_step(topo, cfg, DT, n_steps=15)
    VAL_SUBSTEPS = 15 * cfg.substeps
    ref_pos = np.asarray(fn_x_val(st).positions)

    cfg_g = dataclasses.replace(cfg, distance_backend="gather")
    fn_g_val = general.make_step(topo, cfg_g, DT, n_steps=15)
    spread = float(np.abs(np.asarray(fn_g_val(st).positions)
                          - ref_pos).max())
    emit(row="control_xla_gather_vs_windowed_60sub",
         drift=float(f"{spread:.3g}"))
    gate = max(3.0 * spread, 1e-4)

    for s_blk in BLOCK_EDGES:
        for approx in (False, True):
            tag = f"S{s_blk}{'_approx' if approx else ''}"
            try:
                fn_p_short = mesh_pallas.make_mesh_substep_runner(
                    topo, cfg, dt_sub, VAL_SUBSTEPS,
                    with_ext=True, approx_math=approx, block_edges=s_blk)

                wp = np.asarray(fn_p_short(st).positions)
                drift = float(np.abs(wp - ref_pos).max())
                if not np.isfinite(wp).all():
                    raise RuntimeError("non-finite kernel output")
                if drift >= gate:
                    raise RuntimeError(
                        f"kernel drift {drift} exceeds the XLA backends' "
                        f"own spread gate {gate}")
                fn_p = mesh_pallas.make_mesh_substep_runner(
                    topo, cfg, dt_sub, SUBSTEPS_PER_CALL,
                    with_ext=True, approx_math=approx, block_edges=s_blk)
                t0 = time.perf_counter()
                wl = np.asarray(fn_p(st).positions)
                compile_s = time.perf_counter() - t0
                if not np.isfinite(wl).all():
                    raise RuntimeError("non-finite long-rollout output")
                rate_p, _ = measure(fn_p, st, n, SUBSTEPS_PER_CALL)
                emit(row=f"bunny_mesh_kernel_{tag}",
                     particle_substeps_per_s=float(f"{rate_p:.4g}"),
                     drift_vs_xla_240=float(f"{drift:.3g}"),
                     compile_s=round(compile_s, 1),
                     speedup_vs_xla=float(f"{rate_p / rate_x:.3g}"))
            except Exception as e:  # noqa: BLE001
                emit(row=f"bunny_mesh_kernel_{tag}", ok=False,
                     err=f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
