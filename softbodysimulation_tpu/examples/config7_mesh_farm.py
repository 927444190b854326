"""Example 7 — a mesh farm on the MXU: an ensemble of OBJ soft bodies on
the windowed one-hot distance backend, vmapped over the body axis (and
shardable over chips via ``parallel.batch.make_sharded_general_step``),
with the Morton sorted-window self-collision path shown on the side.

The windowed backend reformulates the Jacobi sweep as exact {0,±1} one-hot
block matmuls (RCM reorder + min-endpoint-sorted edge blocks), so the MXU
does the gather/scatter work and the one-hot matrices are shared across
the whole ensemble — measured 1.76e8 particle-substeps/s for 64 bunnies on
one chip (BENCHMARKS.md).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import SolveMode, SolverConfig
from ..core.state import state_from_topology
from ..solvers import general
from ..topology import build, mesh


def run(n_bodies: int = 8, steps: int = 120, dt: float = 1 / 60,
        verbose: bool = True):
    m = mesh.icosphere(2)
    pos, topo = build.topology_from_mesh(
        m, compliance=1e-5, windowed=True, block_edges=256, seg_align=32,
        window_dtype="bf16")
    cfg = SolverConfig(substeps=2, iterations=4, damping=0.02,
                       solve_mode=SolveMode.JACOBI,
                       ground_height=0.0, friction=0.3)

    rng = np.random.RandomState(0)
    offs = np.stack([rng.uniform(-3, 3, n_bodies),
                     rng.uniform(1.0, 2.5, n_bodies),
                     rng.uniform(-3, 3, n_bodies)], 1).astype(np.float32)
    base = state_from_topology(topo, pos)
    batched = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_bodies,) + x.shape), base)
    batched = batched.replace(positions=batched.positions + offs[:, None, :])

    fn = jax.jit(jax.vmap(
        lambda s: general.multi_step_fn(s, topo, cfg, dt, steps)))
    out = fn(batched)
    p = np.asarray(out.positions)
    assert np.isfinite(p).all()

    # round-3 upgrade: the same farm in ONE fused Mosaic kernel — bodies
    # stacked on the sublane axis so the one-hot gather/scatter dots run
    # with 3B rows instead of 3 (9.5-15x the single-body kernel, 12-19x
    # this vmap on hardware — BENCHMARKS.md).  inv_mass is the shared
    # (n,) leaf; on CPU the kernel runs in interpret mode (keep it short).
    import contextlib

    from jax.experimental.pallas import tpu as pltpu

    from ..kernels import mesh_pallas

    ctx = (contextlib.nullcontext() if jax.default_backend() == "tpu"
           else pltpu.force_tpu_interpret_mode())
    kernel_substeps = (steps * cfg.substeps
                       if jax.default_backend() == "tpu" else cfg.substeps)
    with ctx:
        fused = mesh_pallas.make_mesh_substep_runner(
            topo, cfg, dt / cfg.substeps, kernel_substeps,
            with_ext=True, n_bodies=n_bodies)
        out_k = fused(out.replace(inv_mass=base.inv_mass))
    pk = np.asarray(out_k.positions)
    assert np.isfinite(pk).all()

    # side dish: two of the bodies dropped into each other with the
    # sorted-window self-collision backend
    two = np.concatenate([pos + np.array([0, 1.0, 0], np.float32),
                          pos + np.array([0.05, 2.0, 0], np.float32)])
    e = np.asarray(topo.edges)
    edges2 = np.concatenate([e, e + topo.n_particles])
    topo2 = build.build_topology(two, edges2,
                                 np.concatenate([np.asarray(topo.compliance)]
                                                * 2), color=False)
    cfg2 = SolverConfig(substeps=2, iterations=4, damping=0.05,
                        solve_mode=SolveMode.JACOBI,
                        enable_self_collision=True,
                        self_collision_backend="sorted", sorted_window=16,
                        particle_radius=0.05,
                        ground_height=0.0, friction=0.3)
    st2 = state_from_topology(topo2, two)
    out2 = general.make_step(topo2, cfg2, dt, n_steps=steps)(st2)
    p2 = np.asarray(out2.positions)
    assert np.isfinite(p2).all()

    if verbose:
        ymin = p[..., 1].min()
        print(f"mesh farm: {n_bodies} bodies x {topo.n_particles} particles "
              f"settled, ymin={ymin:.4f}")
        n1 = topo.n_particles
        dmin = np.linalg.norm(
            p2[:n1, None, :] - p2[None, n1:, :], axis=-1).min()
        print(f"two-body sorted self-collision: min cross-distance "
              f"{dmin:.4f} (2r = {2 * cfg2.particle_radius})")
    return out, out2


if __name__ == "__main__":
    run()
