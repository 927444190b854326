"""Same-run A/B for the DIFFERENTIABLE surface (kernels/diff.py) on the
bunny mesh: what a rollout primal and a gradient step actually cost.

Rows (all particle-substeps/s at the stated substep count per call):
  primal_kernel   — fused mesh kernel forward (the paired runner's primal)
  primal_xla      — XLA windowed engine forward (the backward's engine)
  grad_paired     — value_and_grad through the paired custom-VJP runner
                    (kernel fwd + XLA fwd replay + XLA bwd)
  grad_xla        — value_and_grad through the XLA engine directly
  grad_fused      — value_and_grad through the FUSED MOSAIC BACKWARD
                    (kernels/mesh_diff_pallas: in-kernel replay +
                    hand-written cotangent sweeps, round-4 verdict item 4)
  grad_{fused,xla}_long — the same pair at LONG_GRAD_SUBSTEPS: the axon
                    relay charges ~20 ms per HOST call regardless of the
                    program, so short-rollout wall clock under-reports the
                    device-side ratio; the long pair amortizes it
  fitloop{N}_{fused,xla} — FITLOOP_STEPS gradient-descent steps per host call (one
                    jitted lax.scan — the actual fitting workload), the
                    fully relay-amortized same-run comparison

The paired construction's design point: optimisation loops evaluate many
primals per gradient (line searches, population candidates, rollout
serving), so the primal rides the kernel while the gradient costs the
same as differentiating the XLA engine — grad_paired should sit just
below grad_xla (one extra kernel fwd), never above the engine's cost.
The FUSED backward then beats the engine's own gradient wherever its
envelope applies (and its cotangent contractions are EXACT where the
engine VJP rounds gather cotangents to bf16 inside split3 — measured
2.4e-3 rel on dot_oh's VJP vs 4e-8 fused).

Prints one JSON line per row.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from softbodysimulation_tpu import (  # noqa: E402
    SolveMode,
    SolverConfig,
    state_from_topology,
)
from softbodysimulation_tpu.core.scenes import BUNNY_PATHS  # noqa: E402
from softbodysimulation_tpu.kernels import diff as kdiff  # noqa: E402
from softbodysimulation_tpu.kernels import mesh_pallas  # noqa: E402
from softbodysimulation_tpu.solvers import general  # noqa: E402
from softbodysimulation_tpu.topology import build, mesh  # noqa: E402
from softbodysimulation_tpu.topology.objloader import load_obj  # noqa: E402

DT_SUB = 1.0 / 240.0
PRIMAL_SUBSTEPS = int(os.environ.get("BENCH_PRIMAL_SUBSTEPS", "2000"))
GRAD_SUBSTEPS = int(os.environ.get("BENCH_GRAD_SUBSTEPS", "40"))
LONG_GRAD_SUBSTEPS = int(os.environ.get("BENCH_LONG_GRAD_SUBSTEPS", "240"))
FITLOOP_STEPS = int(os.environ.get("BENCH_FITLOOP_STEPS", "30"))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def measure_scalar(fn, arg, work, repeats=5):
    """Time fn(arg) with a host-fetch sync on a scalar-ish leaf."""
    out = fn(arg)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[:1]
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(arg)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[:1]
        best = min(best, time.perf_counter() - t0)
    return work / best


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
    emit(row="scene", n=n, e=topo.n_edges,
         primal_substeps=PRIMAL_SUBSTEPS, grad_substeps=GRAD_SUBSTEPS,
         backend=jax.default_backend())

    # --- primals ---
    fn_k = mesh_pallas.make_mesh_substep_runner(
        topo, cfg, DT_SUB, PRIMAL_SUBSTEPS)
    rate = measure_scalar(lambda s: fn_k(s).positions, st,
                          n * PRIMAL_SUBSTEPS)
    emit(row="primal_kernel", particle_substeps_per_s=float(f"{rate:.4g}"))

    from jax import lax

    def make_xla_roll(nsub):
        @jax.jit
        def roll(s):
            def body(c, _):
                return general._substep(c, topo, cfg, DT_SUB,
                                        apply_ext=False), None
            out, _ = lax.scan(body, s, None, length=nsub)
            return out
        return roll

    roll_x = make_xla_roll(PRIMAL_SUBSTEPS)
    rate = measure_scalar(lambda s: roll_x(s).positions, st,
                          n * PRIMAL_SUBSTEPS)
    emit(row="primal_xla", particle_substeps_per_s=float(f"{rate:.4g}"))

    # --- gradient steps (shorter rollout: reverse-mode stores the chain) ---
    paired = kdiff.make_differentiable_mesh_runner(
        topo, cfg, DT_SUB, GRAD_SUBSTEPS)
    vg_p = jax.jit(jax.value_and_grad(
        lambda v0: jnp.sum(paired(st.replace(
            velocities=jnp.broadcast_to(v0, st.velocities.shape))
        ).positions ** 2)))
    rate = measure_scalar(vg_p, jnp.asarray([0.1, 0.0, 0.0]),
                          n * GRAD_SUBSTEPS)
    emit(row="grad_paired", particle_substeps_per_s=float(f"{rate:.4g}"))

    roll_g = make_xla_roll(GRAD_SUBSTEPS)
    vg_x = jax.jit(jax.value_and_grad(
        lambda v0: jnp.sum(roll_g(st.replace(
            velocities=jnp.broadcast_to(v0, st.velocities.shape))
        ).positions ** 2)))
    rate = measure_scalar(vg_x, jnp.asarray([0.1, 0.0, 0.0]),
                          n * GRAD_SUBSTEPS)
    emit(row="grad_xla", particle_substeps_per_s=float(f"{rate:.4g}"))

    # --- fused Mosaic backward (round-4 verdict item 4) ---
    def make_vg(runner_fn):
        return jax.jit(jax.value_and_grad(
            lambda v0: jnp.sum(runner_fn(st.replace(
                velocities=jnp.broadcast_to(v0, st.velocities.shape))
            ).positions ** 2)))

    v0 = jnp.asarray([0.1, 0.0, 0.0])
    fused = kdiff.make_differentiable_mesh_runner(
        topo, cfg, DT_SUB, GRAD_SUBSTEPS, backward="fused")
    rate = measure_scalar(make_vg(fused), v0, n * GRAD_SUBSTEPS)
    emit(row="grad_fused", particle_substeps_per_s=float(f"{rate:.4g}"))

    fused_l = kdiff.make_differentiable_mesh_runner(
        topo, cfg, DT_SUB, LONG_GRAD_SUBSTEPS, backward="fused")
    rate = measure_scalar(make_vg(fused_l), v0, n * LONG_GRAD_SUBSTEPS)
    emit(row="grad_fused_long", substeps=LONG_GRAD_SUBSTEPS,
         particle_substeps_per_s=float(f"{rate:.4g}"))
    roll_l = make_xla_roll(LONG_GRAD_SUBSTEPS)
    rate = measure_scalar(make_vg(roll_l), v0, n * LONG_GRAD_SUBSTEPS)
    emit(row="grad_xla_long", substeps=LONG_GRAD_SUBSTEPS,
         particle_substeps_per_s=float(f"{rate:.4g}"))

    # --- fit loop: 10 gradient steps per host call (relay-amortized) ---
    def make_fit(runner_fn):
        def loss(v):
            return jnp.sum(runner_fn(st.replace(
                velocities=jnp.broadcast_to(v, st.velocities.shape))
            ).positions ** 2)

        @jax.jit
        def fit(v):
            def gstep(c, _):
                _, g = jax.value_and_grad(loss)(c)
                return c - 1e-6 * g, None
            out, _ = lax.scan(gstep, v, None, length=FITLOOP_STEPS)
            return out
        return fit

    rate = measure_scalar(make_fit(fused), v0,
                          n * GRAD_SUBSTEPS * FITLOOP_STEPS)
    emit(row=f"fitloop{FITLOOP_STEPS}_fused",
         particle_substeps_per_s=float(f"{rate:.4g}"))
    rate = measure_scalar(make_fit(roll_g), v0,
                          n * GRAD_SUBSTEPS * FITLOOP_STEPS)
    emit(row=f"fitloop{FITLOOP_STEPS}_xla",
         particle_substeps_per_s=float(f"{rate:.4g}"))

    # --- material gradients: fused (in-kernel rest/compliance cotangents,
    # round 5) vs the XLA-engine VJP, same run (config10's workload) ---
    mats0 = {"rest_lengths": topo.rest_lengths,
             "compliance": topo.compliance}
    for bkw in ("fused", "xla"):
        mat_runner = kdiff.make_differentiable_material_runner(
            topo, cfg, DT_SUB, GRAD_SUBSTEPS, backward=bkw)
        vg_m = jax.jit(jax.value_and_grad(
            lambda mats: jnp.sum(mat_runner(st, mats).positions ** 2)))
        rate = measure_scalar(vg_m, mats0, n * GRAD_SUBSTEPS)
        emit(row=f"grad_materials_{bkw}",
             particle_substeps_per_s=float(f"{rate:.4g}"))

    # --- collider-pose gradients: the contact-control workload (config11)
    # — fused in-kernel pose cotangents vs the engine VJP, same run ---
    from softbodysimulation_tpu import make_colliders

    coll0 = make_colliders(spheres=[(0.0, 0.8, 0.0, 0.3)],
                           ground_height=0.0)
    stc = st.replace(colliders=coll0)
    for bkw in ("fused", "xla"):
        kin_run = kdiff.make_differentiable_mesh_runner(
            topo, cfg, DT_SUB, GRAD_SUBSTEPS, backward=bkw,
            kin_colliders=(1, 0))
        vg_c = jax.jit(jax.value_and_grad(
            lambda c: jnp.sum(kin_run(stc.replace(colliders=c)
                                      ).positions ** 2)))
        rate = measure_scalar(vg_c, coll0, n * GRAD_SUBSTEPS)
        emit(row=f"grad_collider_{bkw}",
             particle_substeps_per_s=float(f"{rate:.4g}"))

    # --- population material farm: B candidates/gradients per call ---
    nb = int(os.environ.get("BENCH_FARM_BODIES", "16"))
    zb = jnp.broadcast_to
    batched = st.replace(
        positions=zb(st.positions[None], (nb,) + st.positions.shape),
        velocities=zb(st.velocities[None], (nb,) + st.velocities.shape),
        ext_force=zb(st.ext_force[None], (nb,) + st.ext_force.shape),
        lambda_dist=zb(st.lambda_dist[None], (nb,) + st.lambda_dist.shape),
        lambda_bend=zb(st.lambda_bend[None], (nb,) + st.lambda_bend.shape))
    scales = 1.0 + 0.02 * jnp.arange(nb, dtype=jnp.float32)[:, None]
    mats_b = {"rest_lengths": topo.rest_lengths[None] * scales,
              "compliance": zb(topo.compliance[None],
                               (nb,) + topo.compliance.shape)}

    # fused ensemble primal: B candidate materials advance per call
    farm_p = mesh_pallas.make_mesh_substep_runner(
        topo, cfg, DT_SUB, PRIMAL_SUBSTEPS, n_bodies=nb, batched=True)
    rate = measure_scalar(lambda s: farm_p(s, mats_b).positions, batched,
                          nb * n * PRIMAL_SUBSTEPS)
    emit(row=f"primal_material_farm_x{nb}",
         particle_substeps_per_s=float(f"{rate:.4g}"))

    farm_g = kdiff.make_differentiable_material_ensemble_runner(
        topo, cfg, DT_SUB, GRAD_SUBSTEPS, n_bodies=nb)
    vg_f = jax.jit(jax.value_and_grad(
        lambda mats: jnp.sum(farm_g(batched, mats).positions ** 2)))
    rate = measure_scalar(vg_f, mats_b, nb * n * GRAD_SUBSTEPS)
    emit(row=f"grad_material_farm_x{nb}",
         particle_substeps_per_s=float(f"{rate:.4g}"))


if __name__ == "__main__":
    main()
