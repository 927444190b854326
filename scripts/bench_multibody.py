"""Same-run A/B: multi-body contact scene (ball_on_cloth) FUSED in the
mesh Pallas kernel (in-kernel dense self-collision) vs the general XLA
engine's dense backend — round-3 verdict item 2's done-criterion row.

The reference never had inter-object soft contact (each Unity
``SoftBodySimulator`` owns one mesh; the unused ``SphereCollision`` helper
``XPBDSimulatorCS.compute:213-217`` is the closest gesture), so the
baseline here is our own XLA engine.  Validation is SELF-CALIBRATING (the
bench_mesh_kernel methodology): this workload — Chebyshev rho 0.9 over a
stiff cloth, contact-rich — amplifies ulp-level rounding explosively on
hardware (measured: the XLA engine's own dense-vs-sorted contact backends
diverge 2.2e-3 after TWO frames from a warm state, and its windowed-vs-
gather distance backends diverge mm-scale with no contact at all), so a
fixed small tolerance would reject every formulation including XLA's own.
The gate: kernel-vs-engine drift must not exceed 3x the engine backends'
own mutual spread at the same horizon.  Arithmetic equivalence is pinned
separately in interpret mode (tests/test_mesh_pallas.py dense-contact
rows, 6e-5 over 2 frames).  Prints one JSON line per row.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from softbodysimulation_tpu.core.scenes import ball_on_cloth  # noqa: E402
from softbodysimulation_tpu.kernels import mesh_pallas  # noqa: E402
from softbodysimulation_tpu.solvers import general  # noqa: E402

FRAMES_PER_CALL = int(os.environ.get("BENCH_FRAMES_PER_CALL", "50"))
VAL_FRAMES = 2
SIZES = [int(x) for x in
         os.environ.get("BENCH_CLOTH_RES", "24,48").split(",")]


def emit(**kw):
    print(json.dumps(kw), flush=True)


def measure(fn, state, work, repeats=5):
    out = fn(state)
    np.asarray(out.positions)          # compile + sync (host fetch)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(out)
        np.asarray(out.positions.reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return work / best


def main():
    import jax

    emit(row="env", backend=jax.default_backend(),
         frames_per_call=FRAMES_PER_CALL)
    for res in SIZES:
        state, _, info = ball_on_cloth(cloth_res=res)
        topo, cfg, dt = info["topology"], info["config"], info["dt"]
        n = topo.n_particles
        sub = cfg.substeps
        tag = f"ball_on_cloth_res{res}"
        emit(row=f"{tag}_scene", n=n, e=topo.n_edges,
             tets=int(topo.n_tets), radius=cfg.particle_radius)

        # start from a contact-rich settled-ish state so both engines
        # measure the same (touching) workload, not free fall
        warm = general.make_step(topo, cfg, dt, n_steps=30)(state)

        fn_x = general.make_step(topo, cfg, dt, n_steps=FRAMES_PER_CALL)
        rate_x = measure(fn_x, warm, n * FRAMES_PER_CALL * sub)
        emit(row=f"{tag}_xla_dense",
             particle_substeps_per_s=float(f"{rate_x:.4g}"))

        # validation: short-horizon trajectory agreement from the warm
        # state, gated by the XLA engine's OWN backend spread at the same
        # horizon (self-calibrating — see module docstring)
        import dataclasses

        ref = np.asarray(general.make_step(topo, cfg, dt,
                                           n_steps=VAL_FRAMES)(warm).positions)
        alt = np.asarray(general.make_step(
            topo, dataclasses.replace(cfg, self_collision_backend="sorted"),
            dt, n_steps=VAL_FRAMES)(warm).positions)
        spread = float(np.abs(alt - ref).max())
        emit(row=f"{tag}_control_dense_vs_sorted_{VAL_FRAMES}frames",
             spread=float(f"{spread:.3g}"))
        gate = max(3.0 * spread, 1e-4)
        fn_p_val = mesh_pallas.make_mesh_pallas_step(topo, cfg, dt,
                                                     n_steps=VAL_FRAMES)
        got = np.asarray(fn_p_val(warm).positions)
        drift = float(np.abs(got - ref).max())
        if not np.isfinite(got).all():
            raise RuntimeError(f"{tag}: non-finite fused output")
        if drift > gate:
            raise RuntimeError(
                f"{tag}: fused-vs-engine drift {drift} over "
                f"{VAL_FRAMES} contact frames exceeds the engine's own "
                f"backend-spread gate {gate}")
        emit(row=f"{tag}_validation_drift_{VAL_FRAMES}frames",
             drift=float(f"{drift:.3g}"), gate=float(f"{gate:.3g}"))

        fn_p = mesh_pallas.make_mesh_pallas_step(topo, cfg, dt,
                                                 n_steps=FRAMES_PER_CALL)
        rate_p = measure(fn_p, warm, n * FRAMES_PER_CALL * sub)
        emit(row=f"{tag}_fused_kernel",
             particle_substeps_per_s=float(f"{rate_p:.4g}"),
             speedup_vs_xla=float(f"{rate_p / rate_x:.3g}"))


if __name__ == "__main__":
    main()
