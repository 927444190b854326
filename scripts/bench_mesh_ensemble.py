"""Same-run A/B: fused ENSEMBLE mesh kernel (bodies stacked on sublanes)
vs the vmapped XLA windowed backend and the single-body fused kernel, on
bunny farms (the reference's mesh workload, ``SoftBodyCPU.cs:269-325``,
replicated — the cloth/character-farm serving shape).

Round-3 extension: the single-body mesh kernel's MXU dots have a 3-row
LHS (3/8 of a sublane tile at best); stacking B bodies coordinate-major on
the sublane axis makes them 3B rows, sharing the one-hot matrices and
per-edge slabs across bodies.  Validation: each ensemble row must be
BITWISE equal to the single-body kernel on the same body — every MXU/VPU
op is row-independent, so stacking must not change any body's arithmetic.

Prints one JSON line per row.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

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
BODIES = [int(x) for x in os.environ.get("BENCH_BODIES", "8,16,32").split(",")]


def emit(**kw):
    print(json.dumps(kw), flush=True)


def measure(fn, state, work, repeats=5):
    out = fn(state)
    np.asarray(out.positions)          # compile + sync
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(out)
        np.asarray(out.positions.reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return work / best, out


def batch_states(st, nb, seed=1):
    """nb copies of st with scattered positions; inv_mass stays shared."""
    rng = np.random.RandomState(seed)
    offs = np.stack([rng.uniform(-4, 4, nb), rng.uniform(0, 2, nb),
                     rng.uniform(-4, 4, nb)], 1).astype(np.float32)
    pos = np.asarray(st.positions)[None] + offs[:, None, :]
    z = np.zeros((nb,) + st.positions.shape, np.float32)
    return st.replace(
        positions=pos, velocities=z, ext_force=z,
        lambda_dist=np.zeros((nb,) + st.lambda_dist.shape, np.float32),
        lambda_bend=np.zeros((nb,) + st.lambda_bend.shape, np.float32))


def main():
    bending = os.environ.get("BENCH_BENDING", "0") == "1"
    if bending:
        # cloth farm: pinned-edge cloth sheets with distance + hinge
        # bending constraints — the canonical cloth-serving workload
        m = mesh.grid_plane(1.0, 50)
        pos, topo = build.topology_from_mesh(
            m, compliance=1e-5, bending=True, bend_compliance=1e-4,
            windowed=True, block_edges=256, seg_align=32,
            window_dtype="bf16")
    else:
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
                       enable_bending=bending,
                       bending_backend="windowed" if bending else "gather",
                       ground_height=0.0, friction=0.3)
    st = state_from_topology(topo, pos)
    n = topo.n_particles
    dt_sub = DT / cfg.substeps
    emit(row="scene", n=n, e=topo.n_edges, h=topo.n_hinges,
         bending=bending, bodies=BODIES)

    # single-body fused kernel — the per-body baseline the ensemble must beat
    fn_1 = mesh_pallas.make_mesh_substep_runner(
        topo, cfg, dt_sub, SUBSTEPS_PER_CALL, with_ext=True)
    rate_1, _ = measure(fn_1, st, n * SUBSTEPS_PER_CALL)
    wk = "cloth" if bending else "bunny"
    emit(row=f"{wk}_kernel_x1", particle_substeps_per_s=float(f"{rate_1:.4g}"))

    for nb in BODIES:
        batched = batch_states(st, nb)

        # vmapped XLA windowed engine (r2's ensemble answer), same framing
        # as bench_suite 2c: 20 steps/call
        stepsb = 20
        full = jax.tree.map(
            lambda x: np.broadcast_to(np.asarray(x), (nb,) + x.shape),
            st).replace(positions=batched.positions)
        fn_x = jax.jit(jax.vmap(
            lambda s: general.multi_step_fn(s, topo, cfg, DT, stepsb)))
        try:
            rate_x, _ = measure(fn_x, full, nb * n * stepsb * cfg.substeps)
            emit(row=f"{wk}_xla_windowed_vmap_x{nb}",
                 particle_substeps_per_s=float(f"{rate_x:.4g}"))
        except Exception as e:  # noqa: BLE001
            rate_x = None
            emit(row=f"{wk}_xla_windowed_vmap_x{nb}", ok=False,
                 err=f"{type(e).__name__}: {str(e)[:200]}")

        for approx in (False, True):
            tag = f"x{nb}{'_approx' if approx else ''}"
            try:
                # validation: each ensemble row bitwise-equal to the
                # single-body kernel on the same body (row-independent ops)
                VAL = 60
                fn_e_val = mesh_pallas.make_mesh_substep_runner(
                    topo, cfg, dt_sub, VAL, with_ext=True,
                    approx_math=approx, n_bodies=nb)
                fn_1_val = mesh_pallas.make_mesh_substep_runner(
                    topo, cfg, dt_sub, VAL, with_ext=True,
                    approx_math=approx)
                out_e = fn_e_val(batched)
                pe = np.asarray(out_e.positions)
                if not np.isfinite(pe).all():
                    raise RuntimeError("non-finite ensemble output")
                def body_state(b):
                    return st.replace(
                        positions=batched.positions[b],
                        velocities=batched.velocities[b],
                        ext_force=batched.ext_force[b],
                        lambda_dist=batched.lambda_dist[b],
                        lambda_bend=batched.lambda_bend[b])

                drift = max(
                    float(np.abs(pe[b] - np.asarray(
                        fn_1_val(body_state(b)).positions)).max())
                    for b in (0, nb - 1))
                if drift > 1e-5:
                    raise RuntimeError(
                        f"ensemble row drift vs single-body kernel {drift}")
                fn_e = mesh_pallas.make_mesh_substep_runner(
                    topo, cfg, dt_sub, SUBSTEPS_PER_CALL, with_ext=True,
                    approx_math=approx, n_bodies=nb)
                t0 = time.perf_counter()
                wl = np.asarray(fn_e(batched).positions)
                compile_s = time.perf_counter() - t0
                if not np.isfinite(wl).all():
                    raise RuntimeError("non-finite long-rollout output")
                rate_e, _ = measure(fn_e, batched,
                                    nb * n * SUBSTEPS_PER_CALL)
                emit(row=f"{wk}_ensemble_kernel_{tag}",
                     particle_substeps_per_s=float(f"{rate_e:.4g}"),
                     drift_vs_single_kernel=float(f"{drift:.3g}"),
                     compile_s=round(compile_s, 1),
                     speedup_vs_x1=float(f"{rate_e / rate_1:.3g}"),
                     **({} if rate_x is None else
                        {"speedup_vs_vmap": float(f"{rate_e / rate_x:.3g}")}))
            except Exception as e:  # noqa: BLE001
                emit(row=f"{wk}_ensemble_kernel_{tag}", ok=False,
                     err=f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
