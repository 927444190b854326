"""Same-run A/B: windowed MXU bending vs incidence-gather bending on the
welded bunny (bending + distance + floor, the r2 verdict item 4 workload:
'bunny WITH bending >= 5x its current throughput').  Prints JSON lines."""

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
from softbodysimulation_tpu.solvers import general  # noqa: E402
from softbodysimulation_tpu.topology import build, mesh  # noqa: E402
from softbodysimulation_tpu.topology.objloader import load_obj  # noqa: E402

STEPS = int(os.environ.get("BENCH_STEPS_PER_CALL", "50"))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def measure(fn, st, n, work, repeats=4):
    out = fn(st)
    np.asarray(out.positions)
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
        m, compliance=1e-6, bending=True, bend_compliance=1e-4,
        weld_eps=1e-6, windowed=True, block_edges=256, seg_align=32,
        window_dtype="bf16")
    pos = pos + np.array([0, 1.0, 0], np.float32)
    emit(row="scene", n=topo.n_particles, e=topo.n_edges,
         h=topo.n_hinges, hinge_windows=topo.bend_windows is not None)
    cfg_w = SolverConfig(substeps=4, iterations=4, damping=0.02,
                         solve_mode=SolveMode.JACOBI, enable_bending=True,
                         gravity_is_acceleration=True,
                         distance_backend="windowed",
                         bending_backend="windowed",
                         ground_height=0.0, friction=0.3)
    cfg_g = dataclasses.replace(cfg_w, bending_backend="gather")
    cfg_gg = dataclasses.replace(cfg_w, bending_backend="gather",
                                 distance_backend="gather")
    st = state_from_topology(topo, pos)
    n = topo.n_particles
    work = STEPS * cfg_w.substeps

    rate_gg, _ = measure(general.make_step(topo, cfg_gg, 1 / 60,
                                           n_steps=STEPS), st, n, work)
    emit(row="bunny_bending_all_gather",
         particle_substeps_per_s=float(f"{rate_gg:.4g}"))
    rate_g, out_g = measure(general.make_step(topo, cfg_g, 1 / 60,
                                              n_steps=STEPS), st, n, work)
    emit(row="bunny_bending_gather_dist_windowed",
         particle_substeps_per_s=float(f"{rate_g:.4g}"))
    fn_w = general.make_step(topo, cfg_w, 1 / 60, n_steps=STEPS)
    wv = np.asarray(fn_w(st).positions)
    gv = np.asarray(general.make_step(topo, cfg_g, 1 / 60,
                                      n_steps=2)(st).positions)
    wv2 = np.asarray(general.make_step(topo, cfg_w, 1 / 60,
                                       n_steps=2)(st).positions)
    drift = float(np.abs(wv2 - gv).max())
    rate_w, _ = measure(fn_w, st, n, work)
    emit(row="bunny_bending_windowed",
         particle_substeps_per_s=float(f"{rate_w:.4g}"),
         drift_vs_gather_8sub=float(f"{drift:.3g}"),
         speedup_vs_all_gather=float(f"{rate_w / rate_gg:.3g}"),
         speedup_vs_gather_bend=float(f"{rate_w / rate_g:.3g}"))

    # Fused mesh kernel with IN-KERNEL bending (round 3).  Validation is
    # self-calibrating as in bench_mesh_kernel.py: this stiff workload
    # amplifies ulp differences, so the kernel-vs-windowed drift gate is
    # the XLA backends' own mutual spread at the same horizon.
    from softbodysimulation_tpu.kernels import mesh_pallas  # noqa: E402
    val_steps = 15
    ref_pos = np.asarray(general.make_step(topo, cfg_w, 1 / 60,
                                           n_steps=val_steps)(st).positions)
    spread = float(np.abs(np.asarray(general.make_step(
        topo, cfg_g, 1 / 60, n_steps=val_steps)(st).positions)
        - ref_pos).max())
    emit(row="control_bend_gather_vs_windowed_60sub",
         drift=float(f"{spread:.3g}"))
    gate = max(3.0 * spread, 1e-4)
    sub_call = int(os.environ.get("BENCH_SUBSTEPS_PER_CALL", "2000"))
    dt_sub = (1 / 60) / cfg_w.substeps
    for approx in (False, True):
        tag = "approx" if approx else "exact"
        try:
            wp = np.asarray(mesh_pallas.make_mesh_substep_runner(
                topo, cfg_w, dt_sub, val_steps * cfg_w.substeps,
                with_ext=True, approx_math=approx)(st).positions)
            kdrift = float(np.abs(wp - ref_pos).max())
            if not np.isfinite(wp).all():
                raise RuntimeError("non-finite kernel output")
            if kdrift >= gate:
                raise RuntimeError(
                    f"kernel drift {kdrift} exceeds the XLA spread "
                    f"gate {gate}")
            fn_p = mesh_pallas.make_mesh_substep_runner(
                topo, cfg_w, dt_sub, sub_call, with_ext=True,
                approx_math=approx)
            rate_p, _ = measure(fn_p, st, n, sub_call)
            emit(row=f"bunny_bending_fused_kernel_{tag}",
                 particle_substeps_per_s=float(f"{rate_p:.4g}"),
                 drift_vs_windowed_60sub=float(f"{kdrift:.3g}"),
                 speedup_vs_all_gather=float(f"{rate_p / rate_gg:.3g}"),
                 speedup_vs_best_xla=float(f"{rate_p / rate_w:.3g}"))
        except Exception as e:  # noqa: BLE001
            emit(row=f"bunny_bending_fused_kernel_{tag}", ok=False,
                 err=f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
