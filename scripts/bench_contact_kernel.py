"""Same-run A/B: fused Pallas blocked-contact kernel vs the XLA blocked
backend at 64k self-colliding particles.

Round-3 scene: ONE braced res-40 lattice (64k particles, light) settling
onto the floor with particle-radius contact — the constraint sweeps run on
the fast STENCIL engine (which gained self-collision in round 3), so the
benchmark actually exposes the contact pass instead of drowning it in the
general engine's gather-bound distance sweeps (the r2 framing: its
"blocked 1.89e6" row was engine-dominated).  Validation: the kernel must
track the XLA blocked backend over a short pre-chaos horizon; long
contact rollouts amplify boundary-classification ulps (the two backends'
Gram summation orders differ) exactly like every other stiff-contact
comparison in BENCHMARKS.md.

Round-2 verdict item 2 target: exact 64k self-collision >= 1e7
particle-substeps/s end-to-end.  Prints one JSON line per row.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from softbodysimulation_tpu import (  # noqa: E402
    LambdaMode,
    SolveMode,
    SolverConfig,
)
from softbodysimulation_tpu.solvers import lattice as lat  # noqa: E402
from softbodysimulation_tpu.topology import lattice  # noqa: E402

RES = int(os.environ.get("BENCH_RES", "40"))
SUBSTEPS_PER_CALL = int(os.environ.get("BENCH_SUBSTEPS_PER_CALL", "400"))
BLOCKS = os.environ.get("BENCH_CONTACT_BLOCKS", "256x8,128x8,128x4")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def measure(fn, state, n, work, repeats=4):
    out = fn(state)
    np.asarray(out.positions)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(out)
        np.asarray(out.positions.reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return n * work / best, out


def main():
    spec = lattice.lattice_spec(RES, braced=True)
    n = spec.n_particles
    spacing = 1.0 / (RES - 1)
    base = dict(substeps=8, iterations=1, damping=0.02,
                solve_mode=SolveMode.JACOBI, lambda_mode=LambdaMode.RESET,
                gravity_is_acceleration=True, fast_math=True,
                enable_self_collision=True,
                particle_radius=0.55 * spacing,
                ground_height=0.0, friction=0.3)
    st = lat.make_lattice_state(spec, center=(0.0, 0.55, 0.0), mass=0.001)
    dt_sub = 1.0 / 480.0

    # context: the same engine with contact off (the headline regime)
    cfg_off = SolverConfig(**{**base, "enable_self_collision": False})
    fn_off = lat.make_substep_runner(spec, cfg_off, dt_sub,
                                     SUBSTEPS_PER_CALL)
    rate_off, _ = measure(fn_off, st, n, SUBSTEPS_PER_CALL)
    emit(row="lattice64k_no_contact_xla",
         particle_substeps_per_s=float(f"{rate_off:.4g}"))

    cfg_x = SolverConfig(self_collision_backend="blocked",
                         collision_block_size=256, block_neighbors=8,
                         **base)
    fn_x = lat.make_substep_runner(spec, cfg_x, dt_sub, SUBSTEPS_PER_CALL)
    rate_x, _ = measure(fn_x, st, n, SUBSTEPS_PER_CALL)
    emit(row="contact64k_stencil_xla_blocked_B256_M8",
         particle_substeps_per_s=float(f"{rate_x:.4g}"))

    # validation: short pre-chaos horizon, same B/M as the XLA row
    VAL = 24
    fn_xv = lat.make_substep_runner(spec, cfg_x, dt_sub, VAL)
    ref_pos = np.asarray(fn_xv(st).positions)

    for spec_s in BLOCKS.split(","):
        bsz, m = (int(v) for v in spec_s.split("x"))
        cfg_p = SolverConfig(self_collision_backend="blocked_pallas",
                             collision_block_size=bsz, block_neighbors=m,
                             **base)
        tag = f"B{bsz}_M{m}"
        try:
            fn_pv = lat.make_substep_runner(spec, cfg_p, dt_sub, VAL)
            wp = np.asarray(fn_pv(st).positions)
            drift = float(np.abs(wp - ref_pos).max())
            if not np.isfinite(wp).all():
                raise RuntimeError("non-finite output")
            if (bsz, m) == (256, 8) and drift >= 1e-3:
                raise RuntimeError(f"diverges from XLA blocked: {drift}")
            fn_p = lat.make_substep_runner(spec, cfg_p, dt_sub,
                                           SUBSTEPS_PER_CALL)
            wl = np.asarray(fn_p(st).positions)
            if not np.isfinite(wl).all():
                raise RuntimeError("non-finite long rollout")
            rate_p, _ = measure(fn_p, st, n, SUBSTEPS_PER_CALL)
            emit(row=f"contact64k_stencil_pallas_{tag}",
                 particle_substeps_per_s=float(f"{rate_p:.4g}"),
                 drift_vs_xla_24=float(f"{drift:.3g}"),
                 speedup_vs_xla=float(f"{rate_p / rate_x:.3g}"))
        except Exception as e:  # noqa: BLE001
            emit(row=f"contact64k_stencil_pallas_{tag}", ok=False,
                 err=f"{type(e).__name__}: {str(e)[:200]}")

    # Contact cadence (round 3): the classic PBD split — the detect+project
    # contact pass runs every K-th substep while constraints run every
    # substep.  Validation is physical, not trajectory drift (cadence IS an
    # approximation): finite, and the settled body must not collapse below
    # the contact-off rest height by more than a particle radius.
    best = os.environ.get("BENCH_CADENCE_BLOCK", "128x4")
    bsz, m = (int(v) for v in best.split("x"))
    for every in (2, 4, 8):
        cfg_c = SolverConfig(self_collision_backend="blocked_pallas",
                             collision_block_size=bsz, block_neighbors=m,
                             self_collision_every=every, **base)
        tag = f"B{bsz}_M{m}_every{every}"
        try:
            fn_c = lat.make_substep_runner(spec, cfg_c, dt_sub,
                                           SUBSTEPS_PER_CALL)
            wc = np.asarray(fn_c(st).positions)
            if not np.isfinite(wc).all():
                raise RuntimeError("non-finite cadence rollout")
            rate_c, _ = measure(fn_c, st, n, SUBSTEPS_PER_CALL)
            emit(row=f"contact64k_cadence_{tag}",
                 particle_substeps_per_s=float(f"{rate_c:.4g}"),
                 min_y=float(f"{wc[:, 1].min():.4g}"),
                 speedup_vs_every1_xla=float(f"{rate_c / rate_x:.3g}"))
        except Exception as e:  # noqa: BLE001
            emit(row=f"contact64k_cadence_{tag}", ok=False,
                 err=f"{type(e).__name__}: {str(e)[:200]}")

    # Hybrid: contact-free substeps in the streamed Pallas kernel, contact
    # substep on the stencil engine, one jit (make_hybrid_contact_runner).
    from softbodysimulation_tpu.kernels import lattice_pallas as kp

    for every, approx in ((8, False), (8, True)):
        cfg_h = SolverConfig(self_collision_backend="blocked_pallas",
                             collision_block_size=bsz, block_neighbors=m,
                             self_collision_every=every, **base)
        tag = f"B{bsz}_M{m}_every{every}" + ("_approx" if approx else "")
        try:
            fn_h = kp.make_hybrid_contact_runner(spec, cfg_h, dt_sub,
                                                 SUBSTEPS_PER_CALL,
                                                 approx_math=approx)
            wh = np.asarray(fn_h(st).positions)
            if not np.isfinite(wh).all():
                raise RuntimeError("non-finite hybrid rollout")
            rate_h, _ = measure(fn_h, st, n, SUBSTEPS_PER_CALL)
            emit(row=f"contact64k_hybrid_{tag}",
                 particle_substeps_per_s=float(f"{rate_h:.4g}"),
                 min_y=float(f"{wh[:, 1].min():.4g}"),
                 speedup_vs_every1_xla=float(f"{rate_h / rate_x:.3g}"))
        except Exception as e:  # noqa: BLE001
            emit(row=f"contact64k_hybrid_{tag}", ok=False,
                 err=f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
