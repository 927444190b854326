"""Fused Pallas blocked-contact kernel vs the XLA blocked backend
(interpret mode on CPU; hardware A/B in scripts/bench_contact_kernel.py)."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from softbodysimulation_tpu import SolveMode, SolverConfig, \
    state_from_topology
from softbodysimulation_tpu.kernels.contact_pallas import (
    self_collision_project_blocked_pallas)
from softbodysimulation_tpu.ops import spatial_hash
from softbodysimulation_tpu.solvers import general
from softbodysimulation_tpu.topology import build, lattice


def _interpenetrating_cloud(n=1000, seed=0, radius=0.05):
    rng = np.random.default_rng(seed)
    # dense cloud with plenty of overlapping pairs at the given radius
    return rng.uniform(-0.5, 0.5, size=(n, 3)).astype(np.float32)


def _cfg(**kw):
    base = dict(enable_self_collision=True,
                self_collision_backend="blocked_pallas",
                particle_radius=0.05, collision_block_size=128,
                block_neighbors=4)
    base.update(kw)
    return SolverConfig(**base)


def test_contact_kernel_matches_xla_blocked_pass():
    pred = jnp.asarray(_interpenetrating_cloud())
    w = jnp.ones(pred.shape[0])
    cfg = _cfg()
    order = spatial_hash.morton_order(pred, cfg)
    ref = spatial_hash.self_collision_project_blocked(pred, w, order, cfg)
    with pltpu.force_tpu_interpret_mode():
        out = self_collision_project_blocked_pallas(pred, w, order, cfg)
    d = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert d < 1e-5, f"kernel/backend mismatch {d}"
    # the pass did real separation work
    assert np.abs(np.asarray(ref) - np.asarray(pred)).max() > 1e-4


def test_contact_kernel_mixed_masses_and_padding():
    # n not a multiple of the block size + pinned (w=0) particles
    pred = jnp.asarray(_interpenetrating_cloud(n=777, seed=3))
    w = jnp.asarray(
        np.where(np.arange(777) % 5 == 0, 0.0, 1.0).astype(np.float32))
    cfg = _cfg(collision_block_size=128, block_neighbors=3)
    order = spatial_hash.morton_order(pred, cfg)
    ref = spatial_hash.self_collision_project_blocked(pred, w, order, cfg)
    with pltpu.force_tpu_interpret_mode():
        out = self_collision_project_blocked_pallas(pred, w, order, cfg)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-5
    # pinned particles receive no correction
    pins = np.arange(777) % 5 == 0
    np.testing.assert_allclose(np.asarray(out)[pins],
                               np.asarray(pred)[pins], atol=1e-7)


def test_contact_kernel_in_engine_substep():
    """Two interpenetrating lattice bodies separate identically under the
    XLA blocked backend and the fused kernel, driven through the engine."""
    pos_a = lattice.lattice_points(4, center=(0.0, 0.5, 0.0))
    pos_b = lattice.lattice_points(4, center=(0.55, 0.5, 0.0))
    pos = np.vstack([pos_a, pos_b])
    edges, comp = lattice.lattice_edges(4)
    e2 = np.vstack([edges, edges + len(pos_a)])
    topo = build.build_topology(pos, e2, np.concatenate([comp, comp]))
    st = state_from_topology(topo, pos)
    base = dict(substeps=2, iterations=2, solve_mode=SolveMode.JACOBI,
                enable_self_collision=True, particle_radius=0.08,
                collision_block_size=128, block_neighbors=4,
                ground_height=-1.0)
    cfg_p = SolverConfig(self_collision_backend="blocked_pallas", **base)
    cfg_x = SolverConfig(self_collision_backend="blocked", **base)
    out_x = general.make_step(topo, cfg_x, 1 / 60, n_steps=5)(st)
    with pltpu.force_tpu_interpret_mode():
        out_p = general.make_step(topo, cfg_p, 1 / 60, n_steps=5)(st)
    d = np.abs(np.asarray(out_p.positions)
               - np.asarray(out_x.positions)).max()
    assert d < 1e-5, f"engine trajectories diverge: {d}"
    assert np.isfinite(np.asarray(out_p.positions)).all()


def test_contact_kernel_rejects_unaligned_block():
    pred = jnp.asarray(_interpenetrating_cloud(n=300))
    w = jnp.ones(300)
    cfg = _cfg(collision_block_size=96)
    order = spatial_hash.morton_order(pred, cfg)
    with pytest.raises(NotImplementedError):
        with pltpu.force_tpu_interpret_mode():
            self_collision_project_blocked_pallas(pred, w, order, cfg)


def test_lattice_engine_self_collision_backends_agree():
    """Round 3: the stencil lattice engine gains self-collision via the
    shared backend dispatch.  Within the engine, the exact blocked backend
    and its fused Pallas twin must produce the same trajectory, and the
    contact pass must visibly resist compression (full trajectories are
    NOT comparable across the stencil and general engines — their Jacobi
    relaxation structures differ by design)."""
    from softbodysimulation_tpu.solvers import lattice as lat_engine
    from softbodysimulation_tpu.topology import lattice as lat_topo

    res = 5
    spec = lat_topo.lattice_spec(res, braced=True)
    st = lat_engine.make_lattice_state(spec, center=(0.0, 0.6, 0.0))
    base = dict(substeps=2, iterations=2, solve_mode=SolveMode.JACOBI,
                enable_self_collision=True,
                particle_radius=0.55 / (res - 1),
                collision_block_size=128, block_neighbors=2,
                ground_height=0.0, friction=0.3)
    cfg_b = SolverConfig(self_collision_backend="blocked", **base)
    cfg_p = SolverConfig(self_collision_backend="blocked_pallas", **base)
    out_b = lat_engine.make_step(spec, cfg_b, 1 / 60, n_steps=8)(st)
    with pltpu.force_tpu_interpret_mode():
        out_p = lat_engine.make_step(spec, cfg_p, 1 / 60, n_steps=8)(st)
    d = np.abs(np.asarray(out_p.positions)
               - np.asarray(out_b.positions)).max()
    assert d < 1e-5, f"lattice-engine contact backends disagree: {d}"
    assert np.isfinite(np.asarray(out_p.positions)).all()

    # physics: with contact on, the settled body stays taller (particle
    # radius resists compression) than with contact off
    cfg_off = SolverConfig(substeps=2, iterations=2,
                           solve_mode=SolveMode.JACOBI,
                           ground_height=0.0, friction=0.3)
    out_off = lat_engine.make_step(spec, cfg_off, 1 / 60, n_steps=8)(st)
    y_on = np.asarray(out_b.positions)[:, 1]
    y_off = np.asarray(out_off.positions)[:, 1]
    assert np.abs(np.asarray(out_b.positions)
                  - np.asarray(out_off.positions)).max() > 1e-4
    assert (y_on.max() - y_on.min()) > (y_off.max() - y_off.min()) - 1e-3
