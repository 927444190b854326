"""Example 5 — vmap-batched ensemble of 1024 independent bodies with
on-device vertex-normal recompute and headless frame export (BASELINE
config 5).  With >1 device, bodies shard across chips via shard_map."""

from __future__ import annotations

import os

import jax
import numpy as np

from ..core.config import LambdaMode, SolveMode, SolverConfig
from ..core.state import SimState
from ..ops.normals import vertex_normals
from ..parallel import batch as pbatch
from ..solvers import lattice as lat_engine
from ..topology import lattice


def run(n_bodies: int = 1024, res: int = 4, steps: int = 120,
        dt: float = 1 / 60, export_dir: str | None = None,
        verbose: bool = True):
    spec = lattice.lattice_spec(res, braced=True)
    cfg = SolverConfig(
        substeps=4, iterations=1, damping=0.02,
        solve_mode=SolveMode.JACOBI,
        lambda_mode=LambdaMode.WARM_START, lambda_decay=1.0,
        ground_height=0.0, friction=0.3)

    rng = np.random.RandomState(42)
    base = lat_engine.make_lattice_state(spec)
    batched = pbatch.replicate_state(base, n_bodies)
    offsets = np.stack([
        rng.uniform(-8, 8, n_bodies),
        rng.uniform(1.0, 4.0, n_bodies),
        rng.uniform(-8, 8, n_bodies),
    ], axis=1).astype(np.float32)
    batched = batched.replace(
        positions=batched.positions + offsets[:, None, :])

    n_dev = jax.device_count()
    if n_dev > 1 and n_bodies % n_dev == 0:
        mesh = pbatch.make_mesh(n_dev)
        batched = pbatch.shard_batched_state(batched, mesh)
        step = pbatch.make_sharded_lattice_step(spec, cfg, dt, mesh,
                                                n_steps=steps)
    else:
        # lane-folded ensemble: bodies laid out along the vector lanes (a
        # vmapped res-4 body leaves 16-wide lanes; folding restores full
        # vector-unit utilisation)
        from ..solvers.lattice import make_batched_step

        step = make_batched_step(spec, cfg, dt, n_bodies, n_steps=steps)
    batched = step(batched)

    # on-device normals for the whole ensemble, export only at the boundary
    tris = lattice.lattice_surface_triangles(res)
    tris_d = jax.numpy.asarray(tris)
    normals = jax.jit(jax.vmap(lambda p: vertex_normals(p, tris_d)))(
        batched.positions)

    if export_dir:
        os.makedirs(export_dir, exist_ok=True)
        np.savez(os.path.join(export_dir, "ensemble_frame.npz"),
                 positions=np.asarray(batched.positions),
                 normals=np.asarray(normals), triangles=tris)

    if verbose:
        p = np.asarray(batched.positions)
        print(f"{n_bodies} bodies x {spec.n_particles} particles on "
              f"{n_dev} device(s): finite={np.isfinite(p).all()} "
              f"ymin={p[..., 1].min():.4f} "
              f"normals unit={np.allclose(np.linalg.norm(np.asarray(normals), axis=-1), 1.0, atol=1e-3)}")
    return batched, normals


if __name__ == "__main__":
    run()
