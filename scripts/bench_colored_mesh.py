"""Same-run A/B: in-kernel COLORED (exact parallel GS) vs the general
engine's color-major sweep on the FAITHFUL cpu_mesh workload — the
reference's canonical mesh scene (``Scenes/CpuMesh.unity:1174-1186``:
LowResBunny, 15 iterations, compliance 1e-10, lambda clamp 1e-3, gravity
(0,-1,0), bending off).

Round-3 extension: the fused mesh kernel was JACOBI-only; COLORED configs
forfeited fusion entirely.  Validates the kernel against the XLA COLORED
trajectory on a pre-contact horizon (quasi-rigid free fall — the
drift-friendly regime, BENCHMARKS.md "Chaos caveat") before accepting its
number.  Prints one JSON line per row.
"""

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

DT = 0.02                      # the reference's 50 Hz fixed step
SMOKE = os.environ.get("BENCH_PLATFORM", "") == "cpu"
if SMOKE:                      # hermetic smoke: CPU + interpret + tiny mesh
    import jax

    jax.config.update("jax_platforms", "cpu")
    from jax._src.pallas.mosaic.interpret.interpret_pallas_call import (
        set_tpu_interpret_mode)

    set_tpu_interpret_mode()   # global, survives the whole process
STEPS_PER_CALL = int(os.environ.get("BENCH_STEPS_PER_CALL",
                                    "4" if SMOKE else "2000"))
BLOCK_EDGES = [int(x) for x in
               os.environ.get("BENCH_BLOCK_EDGES",
                              "128" if SMOKE else "128,256").split(",")]
VAL_STEPS = 4 if SMOKE else 30  # pre-floor-contact horizon (contact ~70)
# the faithful workload is exact-math; approx rows are opt-in (each
# variant costs two Mosaic compiles through the relay)
APPROX = ((False, True) if os.environ.get("BENCH_APPROX", "") == "1"
          else (False,))


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
    if SMOKE:
        m = mesh.icosphere(2, radius=0.5)
    else:
        m = load_obj(p) if p else mesh.icosphere(4, radius=0.5)
    pos, topo = build.topology_from_mesh(
        m, compliance=1e-10, bending=False, windowed="colored")
    pos = pos + np.array([0, 1.0, 0], np.float32)
    # Scenes/CpuMesh.unity knobs (core/scenes.cpu_mesh)
    cfg = SolverConfig(substeps=1, iterations=15, damping=0.01,
                       gravity=(0.0, -1.0, 0.0),
                       solve_mode=SolveMode.COLORED, max_dlambda=1e-3,
                       ground_height=0.0, friction=0.1)
    st = state_from_topology(topo, pos)
    n = topo.n_particles
    emit(row="scene", n=n, e=topo.n_edges,
         colors=int(topo.num_colors))

    # XLA COLORED engine (the only color-major XLA spelling: gathers)
    xla_steps = 50   # 50-step calls: deeper scan nests compile pathologically
    fn_x = general.make_step(topo, cfg, DT, n_steps=xla_steps)
    rate_x, _ = measure(fn_x, st, n, xla_steps * cfg.substeps)
    emit(row="bunny_xla_colored", particle_substeps_per_s=float(
        f"{rate_x:.4g}"))

    fn_x_val = general.make_step(topo, cfg, DT, n_steps=VAL_STEPS)
    ref_pos = np.asarray(fn_x_val(st).positions)

    for s_blk in BLOCK_EDGES:
        for approx in APPROX:
            tag = f"S{s_blk}{'_approx' if approx else ''}"
            try:
                plan = mesh_pallas.build_mesh_plan(
                    topo, cfg, DT / cfg.substeps, block_edges=s_blk,
                    colored=True)
                fn_p_val = mesh_pallas.make_mesh_substep_runner(
                    topo, cfg, DT / cfg.substeps,
                    VAL_STEPS * cfg.substeps, with_ext=True,
                    approx_math=approx, plan=plan)
                wp = np.asarray(fn_p_val(st).positions)
                drift = float(np.abs(wp - ref_pos).max())
                if not np.isfinite(wp).all():
                    raise RuntimeError("non-finite kernel output")
                if drift >= 1e-4:
                    raise RuntimeError(
                        f"kernel drift {drift} vs XLA COLORED exceeds 1e-4 "
                        "on the quasi-rigid pre-contact horizon")
                fn_p = mesh_pallas.make_mesh_substep_runner(
                    topo, cfg, DT / cfg.substeps,
                    STEPS_PER_CALL * cfg.substeps, with_ext=True,
                    approx_math=approx, plan=plan)
                t0 = time.perf_counter()
                wl = np.asarray(fn_p(st).positions)
                compile_s = time.perf_counter() - t0
                if not np.isfinite(wl).all():
                    raise RuntimeError("non-finite long-rollout output")
                rate_p, _ = measure(fn_p, st, n,
                                    STEPS_PER_CALL * cfg.substeps)
                emit(row=f"bunny_colored_kernel_{tag}",
                     particle_substeps_per_s=float(f"{rate_p:.4g}"),
                     blocks=plan.n_blocks,
                     sum_w=int(sum(plan.widths)),
                     drift_vs_xla_30=float(f"{drift:.3g}"),
                     compile_s=round(compile_s, 1),
                     speedup_vs_xla=float(f"{rate_p / rate_x:.3g}"))
            except Exception as e:  # noqa: BLE001
                emit(row=f"bunny_colored_kernel_{tag}", ok=False,
                     err=f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
