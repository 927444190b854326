"""Fused spatial-sharding Pallas kernel (in-kernel remote-DMA halo
exchange) vs the XLA ppermute spatial engine and the single-chip stencil
engine, on the 8-virtual-device CPU mesh (interpret mode)."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from softbodysimulation_tpu import (LambdaMode, SolveMode, SolverConfig)
from softbodysimulation_tpu.kernels import spatial_pallas
from softbodysimulation_tpu.parallel import spatial
from softbodysimulation_tpu.solvers import lattice as lat_engine
from softbodysimulation_tpu.topology import lattice

DT = 1.0 / 60.0

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")


def run_tri(cfg, steps=30, res=16):
    """Returns (kernel, xla_spatial, single_chip) outputs on one scene."""
    mesh = Mesh(np.array(jax.devices()), ("x",))
    spec = lattice.lattice_spec(res, braced=True)
    st = lat_engine.make_lattice_state(spec, center=(0, 1.2, 0))
    out_p = spatial_pallas.make_spatial_pallas_substep(
        spec, cfg, DT, mesh, n_steps=steps)(st)
    out_r = spatial.make_spatial_lattice_step(
        spec, cfg, DT, mesh, n_steps=steps)(st)
    out_1 = lat_engine.make_step(spec, cfg, DT, n_steps=steps)(st)
    return out_p, out_r, out_1


@needs_mesh
@pytest.mark.parametrize("mode", [SolveMode.COLORED, SolveMode.JACOBI])
def test_spatial_kernel_matches_ppermute_engine(mode):
    cfg = SolverConfig(substeps=2, iterations=2, damping=0.02,
                       solve_mode=mode, ground_height=0.0, friction=0.3)
    out_p, out_r, out_1 = run_tri(cfg)
    pp = np.asarray(out_p.positions)
    assert np.isfinite(pp).all()
    d_sp = np.abs(pp - np.asarray(out_r.positions)).max()
    d_1 = np.abs(pp - np.asarray(out_1.positions)).max()
    assert d_sp < 1e-4, f"kernel vs ppermute engine: {d_sp}"
    # the fused kernel must be at least as faithful to the single-chip
    # engine as the XLA spatial engine is (measured: it is closer)
    assert d_1 < 1e-4, f"kernel vs single-chip engine: {d_1}"
    dl = np.abs(np.asarray(out_p.lambda_dist)
                - np.asarray(out_r.lambda_dist)).max()
    assert dl < 1e-3


@needs_mesh
def test_spatial_kernel_warm_start_tracks_single_chip():
    cfg = SolverConfig(substeps=4, iterations=1, damping=0.02,
                       solve_mode=SolveMode.JACOBI,
                       lambda_mode=LambdaMode.WARM_START, lambda_decay=1.0,
                       ground_height=0.0, friction=0.3)
    out_p, out_r, out_1 = run_tri(cfg, steps=50)
    # 50 bounce steps amplify layout fp noise; the single-chip engine is
    # the truth anchor (the XLA spatial engine itself sits ~5e-2 from it
    # on this scene at res 16 / 8 shards)
    d_1 = np.abs(np.asarray(out_p.positions)
                 - np.asarray(out_1.positions)).max()
    assert d_1 < 2e-3, f"warm-start kernel vs single-chip: {d_1}"


@needs_mesh
def test_spatial_kernel_rejects_unsupported():
    mesh = Mesh(np.array(jax.devices()), ("x",))
    spec = lattice.lattice_spec(16, braced=True)
    with pytest.raises(NotImplementedError):
        spatial_pallas.make_spatial_pallas_substep(
            spec, SolverConfig(enable_self_collision=True), DT, mesh)
    with pytest.raises(NotImplementedError):
        spatial_pallas.make_spatial_pallas_substep(
            spec, SolverConfig(sphere_colliders=((0, 0, 0, 1.0),)), DT,
            mesh)
    # res 8 over 8 devices = 1 plane per device: refused
    with pytest.raises(NotImplementedError):
        spatial_pallas.make_spatial_pallas_substep(
            lattice.lattice_spec(8, braced=True), SolverConfig(), DT, mesh)
