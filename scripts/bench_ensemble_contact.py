"""Same-run A/B: CONTACT-enabled multi-body farm — ball_on_cloth x B in
the fused ensemble mesh kernel (round-5 body-local in-kernel dense
contact) vs the vmapped XLA general engine — the round-4 verdict's
item-3 done-criterion row.

Each farm instance is the catalogued two-body contact scene (pressurized
solid ball on a rim-pinned cloth, merged topology, dense self-collision
resolving the INTER-body contact); the ensemble kernel stacks B
instances on the sublane axis and runs one Gram contact sweep per body
row, so the whole contact-rich farm advances in ONE Mosaic call.
Validation: each ensemble row must be bitwise-equal to the single-body
kernel (row-independent ops; pinned in
tests/test_mesh_pallas.py::test_mesh_ensemble_dense_contact_body_local
against the engine).

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

from softbodysimulation_tpu.core.scenes import ball_on_cloth  # noqa: E402
from softbodysimulation_tpu.kernels import mesh_pallas  # noqa: E402
from softbodysimulation_tpu.solvers import general  # noqa: E402

SUBSTEPS_PER_CALL = int(os.environ.get("BENCH_SUBSTEPS_PER_CALL", "600"))
BODIES = [int(x) for x in os.environ.get("BENCH_BODIES", "8").split(",")]
CLOTH_RES = int(os.environ.get("BENCH_CLOTH_RES", "24"))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def measure(fn, state, work, repeats=5):
    out = fn(state)
    np.asarray(out.positions.reshape(-1)[0])   # compile + host-fetch sync
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(out)
        np.asarray(out.positions.reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return work / best, out


def batch_states(st, topo, nb, seed=1):
    rng = np.random.RandomState(seed)
    offs = np.zeros((nb, 3), np.float32)
    offs[:, 0] = rng.uniform(-0.02, 0.02, nb)   # keep every rim pin valid
    z = np.zeros((nb,) + tuple(st.velocities.shape), np.float32)
    return st.replace(
        positions=np.asarray(st.positions)[None] + offs[:, None, :],
        velocities=z, ext_force=z,
        lambda_dist=np.zeros((nb, topo.n_edges), np.float32),
        lambda_bend=np.zeros((nb, topo.n_hinges), np.float32),
        lambda_tet=np.zeros((nb, topo.n_tets), np.float32))


def main():
    emit(row="env", backend=jax.default_backend(),
         substeps_per_call=SUBSTEPS_PER_CALL, cloth_res=CLOTH_RES)
    state, _, info = ball_on_cloth(cloth_res=CLOTH_RES)
    topo, cfg, dt = info["topology"], info["config"], info["dt"]
    n = topo.n_particles
    dt_sub = dt / cfg.substeps
    emit(row="scene", n=n, e=topo.n_edges, tets=int(topo.n_tets))

    # warm to a contact-rich state (ball resting in the cloth)
    warm1 = general.make_step(topo, cfg, dt, n_steps=40)(state)

    for nb in BODIES:
        batched = batch_states(warm1, topo, nb)
        work = nb * n * SUBSTEPS_PER_CALL

        def one(s):
            from jax import lax

            def body(c, _):
                return general._substep(c, topo, cfg, dt_sub,
                                        apply_ext=False), None

            out, _ = lax.scan(body, s, None, length=SUBSTEPS_PER_CALL)
            return out

        vm = jax.jit(jax.vmap(lambda s: one(s.replace(
            inv_mass=warm1.inv_mass,
            lambda_volume=jnp.zeros((), jnp.float32)))))
        bat_x = batched.replace(
            inv_mass=np.broadcast_to(np.asarray(warm1.inv_mass),
                                     (nb,) + warm1.inv_mass.shape),
            lambda_volume=np.zeros((nb,), np.float32))
        rate_x, out_x = measure(vm, bat_x, work)
        emit(row=f"farm_x{nb}_vmap_xla",
             particle_substeps_per_s=float(f"{rate_x:.4g}"))

        fn_k = mesh_pallas.make_mesh_substep_runner(
            topo, cfg, dt_sub, SUBSTEPS_PER_CALL, with_ext=True,
            n_bodies=nb, batched=True)
        rate_k, out_k = measure(fn_k, batched, work)
        emit(row=f"farm_x{nb}_ensemble_kernel",
             particle_substeps_per_s=float(f"{rate_k:.4g}"),
             speedup_vs_vmap=float(f"{rate_k / rate_x:.3f}"))
        p = np.asarray(out_k.positions)
        emit(row=f"farm_x{nb}_health",
             finite=bool(np.isfinite(p).all()),
             ymin=float(p[..., 1].min()), ymax=float(p[..., 1].max()))


if __name__ == "__main__":
    main()
