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


if __name__ == "__main__":
    main()
