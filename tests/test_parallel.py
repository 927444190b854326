"""Batching (vmap) and multi-chip sharding (shard_map over the 8-device CPU
mesh) — the capability axis the reference lacks entirely (SURVEY §2.4)."""

import numpy as np
import pytest

import jax

from softbodysimulation_tpu import LambdaMode, SolveMode, SolverConfig
from softbodysimulation_tpu.parallel import batch as pbatch
from softbodysimulation_tpu.solvers import lattice as lat_engine
from softbodysimulation_tpu.topology import lattice

DT = 0.02


def cfg_default(**kw):
    base = dict(substeps=2, iterations=2, damping=0.02,
                solve_mode=SolveMode.JACOBI, ground_height=0.0, friction=0.3,
                lambda_mode=LambdaMode.WARM_START, lambda_decay=1.0)
    base.update(kw)
    return SolverConfig(**base)


def make_ensemble(n_bodies, res=3, braced=True):
    spec = lattice.lattice_spec(res, braced=braced)
    states = []
    rng = np.random.RandomState(0)
    for i in range(n_bodies):
        center = (rng.uniform(-1, 1), 1.0 + 0.5 * i, rng.uniform(-1, 1))
        states.append(lat_engine.make_lattice_state(spec, center=center))
    return spec, pbatch.stack_states(states)


def test_vmap_matches_loop():
    spec, batched = make_ensemble(4)
    cfg = cfg_default()
    step1 = lat_engine.make_step(spec, cfg, DT, n_steps=20)
    stepB = pbatch.make_batched_lattice_step(spec, cfg, DT, n_steps=20)
    out_b = stepB(batched)
    for i in range(4):
        single = step1(pbatch.body_slice(batched, i))
        got = np.asarray(pbatch.body_slice(out_b, i).positions)
        want = np.asarray(single.positions)
        assert np.allclose(got, want, atol=1e-5), f"body {i}"


def test_replicate_state():
    spec, _ = make_ensemble(1)
    s = lat_engine.make_lattice_state(spec, center=(0, 1, 0))
    b = pbatch.replicate_state(s, 5)
    assert b.positions.shape == (5,) + s.positions.shape


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
class TestSharded:
    def test_sharded_matches_single_device(self):
        spec, batched = make_ensemble(16)
        cfg = cfg_default()
        mesh = pbatch.make_mesh(8)
        sharded = pbatch.shard_batched_state(batched, mesh)
        step_sharded = pbatch.make_sharded_lattice_step(
            spec, cfg, DT, mesh, n_steps=10)
        step_local = pbatch.make_batched_lattice_step(spec, cfg, DT,
                                                      n_steps=10)
        out_s = step_sharded(sharded)
        out_l = step_local(batched)
        assert np.allclose(np.asarray(out_s.positions),
                           np.asarray(out_l.positions), atol=1e-5)

    def test_sharded_pallas_rollout_matches_xla(self):
        """DP shard_map x the fused ensemble Pallas kernel per shard must
        match the (unsharded) lane-folded XLA engine on the virtual mesh
        (raw rollout: zero external forces)."""
        from jax.experimental.pallas import tpu as pltpu

        spec, batched = make_ensemble(16, res=4)
        cfg = cfg_default(lambda_mode=LambdaMode.RESET)
        mesh = pbatch.make_mesh(8)
        sharded = pbatch.shard_batched_state(batched, mesh)
        n_sub = 3 * cfg.substeps
        with pltpu.force_tpu_interpret_mode():
            # backend pinned: auto would (correctly) route this tiny
            # lane-folded geometry to XLA — here we are testing the KERNEL
            out_s = pbatch.make_sharded_pallas_rollout(
                spec, cfg, DT / cfg.substeps, n_sub, mesh, 16,
                backend="pallas")(sharded)
            got = np.asarray(out_s.positions)
        ref = lat_engine.make_batched_step(spec, cfg, DT, 16,
                                           n_steps=3)(batched)
        assert np.allclose(got, np.asarray(ref.positions), atol=1e-5)

    def test_ensemble_backend_auto_routing(self):
        """The sharded rollout runs each geometry's MEASURED winner
        (BENCH_SUITE_r04 ensemble64p: tiny lane-folded lattices -> vmap
        XLA; lane-filling lattices -> the fused ensemble kernel)."""
        assert pbatch.pick_lattice_ensemble_backend(
            lattice.lattice_spec(4)) == "xla"        # 1024x64p geometry
        assert pbatch.pick_lattice_ensemble_backend(
            lattice.lattice_spec(12)) == "pallas"    # fills the 128 lanes

        spec, batched = make_ensemble(16, res=4)
        cfg = cfg_default(lambda_mode=LambdaMode.RESET)
        mesh = pbatch.make_mesh(8)
        step = pbatch.make_sharded_pallas_rollout(
            spec, cfg, DT / cfg.substeps, 2 * cfg.substeps, mesh, 16)
        assert step.ensemble_backend == "xla"
        # the auto (XLA) route must still advance the sharded ensemble
        # identically to the unsharded batched engine
        sharded = pbatch.shard_batched_state(batched, mesh)
        out = step(sharded)
        ref = lat_engine.make_batched_step(spec, cfg, DT, 16,
                                           n_steps=2)(batched)
        assert np.allclose(np.asarray(out.positions),
                           np.asarray(ref.positions), atol=1e-5)

    def test_sharded_ensemble_diagnostics(self):
        spec, batched = make_ensemble(16)
        mesh = pbatch.make_mesh(8)
        sharded = pbatch.shard_batched_state(batched, mesh)
        diag = pbatch.make_sharded_ensemble_diagnostics(mesh)
        vmax, bad, height, ground = diag(sharded)
        assert float(vmax) == 0.0       # initial ensemble at rest
        assert int(bad) == 0
        assert np.isfinite(float(height))

    def test_sharded_detects_nan_on_any_chip(self):
        spec, batched = make_ensemble(16)
        mesh = pbatch.make_mesh(8)
        # poison one body that lives on the last chip
        batched = batched.replace(
            positions=batched.positions.at[15, 0, 0].set(np.nan))
        sharded = pbatch.shard_batched_state(batched, mesh)
        diag = pbatch.make_sharded_ensemble_diagnostics(mesh)
        _, bad, _, _ = diag(sharded)
        assert int(bad) == 1


def test_batched_general_engine_matches_loop():
    """vmap over the general (mesh) engine: an icosphere ensemble."""
    from softbodysimulation_tpu import state_from_topology
    from softbodysimulation_tpu.topology import build, mesh

    m = mesh.icosphere(1, radius=0.4)
    pos, topo = build.topology_from_mesh(m, compliance=1e-4, bending=True,
                                         bend_compliance=1e-2)
    cfg = cfg_default(substeps=2, iterations=3, enable_bending=True)
    states = []
    for i in range(3):
        p = pos + np.array([0.3 * i, 1.0 + 0.4 * i, 0.0], np.float32)
        states.append(state_from_topology(topo, p))
    batched = pbatch.stack_states(states)
    stepB = pbatch.make_batched_general_step(topo, cfg, DT, n_steps=15)
    out_b = stepB(batched)
    from softbodysimulation_tpu.solvers import general
    step1 = general.make_step(topo, cfg, DT, n_steps=15)
    for i in range(3):
        want = np.asarray(step1(states[i]).positions)
        got = np.asarray(pbatch.body_slice(out_b, i).positions)
        assert np.allclose(got, want, atol=1e-5), f"body {i}"


def test_batched_volume_constraint():
    """vmap with the global volume constraint (per-body lambda_volume)."""
    from softbodysimulation_tpu import SolverConfig, state_from_topology
    from softbodysimulation_tpu.ops.volume import enclosed_volume
    from softbodysimulation_tpu.topology import build, mesh

    m = mesh.icosphere(1, radius=0.4)
    pos, topo = build.topology_from_mesh(m, compliance=5e-4)
    cfg = SolverConfig(substeps=2, iterations=4, damping=0.05,
                       enable_volume=True, pressure=1.2,
                       ground_height=-10.0)
    states = [state_from_topology(topo, pos + np.array([0, 2 + i, 0],
                                                       np.float32))
              for i in range(2)]
    batched = pbatch.stack_states(states)
    stepB = pbatch.make_batched_general_step(topo, cfg, DT, n_steps=100)
    out = stepB(batched)
    v0 = float(np.asarray(topo.rest_volume))
    import jax
    vols = jax.vmap(lambda p: enclosed_volume(p, topo.triangles))(
        out.positions)
    for v in np.asarray(vols):
        assert v > 1.1 * v0  # both bodies inflated


def test_lane_batched_lattice_matches_vmap():
    """The lane-folded ensemble stepper must match the vmapped engine."""
    from softbodysimulation_tpu.interact import forces
    from softbodysimulation_tpu.solvers import lattice as lat_engine

    spec, batched = make_ensemble(5, res=4)
    # give one body a pending external force to exercise the ext path
    import jax
    batched = batched.replace(
        ext_force=batched.ext_force.at[2, :, 1].set(30.0))
    cfg = cfg_default(substeps=3, iterations=2)
    wide = lat_engine.make_batched_step(spec, cfg, DT, n_bodies=5,
                                        n_steps=25)
    ref = pbatch.make_batched_lattice_step(spec, cfg, DT, n_steps=25)
    out_w = wide(batched)
    out_r = ref(batched)
    d = np.abs(np.asarray(out_w.positions) - np.asarray(out_r.positions)).max()
    assert d < 1e-5, f"lane-batched vs vmap drift {d}"
    dl = np.abs(np.asarray(out_w.lambda_dist)
                - np.asarray(out_r.lambda_dist)).max()
    assert dl < 1e-4


def test_sharded_general_mesh_ensemble_matches_vmap():
    """DP over mesh bodies across chips (windowed MXU backend replicated
    per chip, body axis split over the 8-device virtual mesh)."""
    import jax.numpy as jnp

    from softbodysimulation_tpu import state_from_topology
    from softbodysimulation_tpu.solvers import general
    from softbodysimulation_tpu.topology import build, mesh

    m = mesh.icosphere(2)
    pos, topo = build.topology_from_mesh(m, compliance=1e-5, windowed=True)
    cfg = SolverConfig(substeps=2, iterations=3, damping=0.02,
                       solve_mode=SolveMode.JACOBI, ground_height=0.0,
                       friction=0.3)
    states = [state_from_topology(
        topo, pos + np.array([0, 1.0 + 0.1 * i, 0], np.float32))
        for i in range(16)]
    batched = pbatch.stack_states(states)

    mesh_dp = pbatch.make_mesh(8)
    sharded = pbatch.shard_batched_state(batched, mesh_dp)
    fn_sh = pbatch.make_sharded_general_step(topo, cfg, 1 / 60, mesh_dp,
                                             n_steps=4)
    out_sh = fn_sh(sharded)

    fn_v = pbatch.make_batched_general_step(topo, cfg, 1 / 60, n_steps=4)
    out_v = fn_v(batched)
    d = np.abs(np.asarray(out_sh.positions)
               - np.asarray(out_v.positions)).max()
    assert d < 1e-6, f"sharded mesh ensemble drifted from vmap: {d}"
    assert np.isfinite(np.asarray(out_sh.positions)).all()


def test_sharded_mesh_pallas_rollout_matches_single_kernel():
    """DP x fused ensemble MESH kernel: 8 bunnies over a 4-device mesh
    (2 bodies/chip) must match the single-device ensemble kernel —
    per-body arithmetic is row- and shard-independent."""
    from jax.experimental.pallas import tpu as pltpu

    from softbodysimulation_tpu import state_from_topology
    from softbodysimulation_tpu.kernels import mesh_pallas
    from softbodysimulation_tpu.topology import build, mesh

    m = mesh.icosphere(1, radius=0.4)
    pos, topo = build.topology_from_mesh(
        m, compliance=1e-4, windowed=True, block_edges=64)
    cfg = SolverConfig(substeps=2, iterations=2, damping=0.02,
                       solve_mode=SolveMode.JACOBI, jacobi_rho=0.9,
                       lambda_mode=LambdaMode.RESET,
                       distance_backend="windowed",
                       ground_height=0.0, friction=0.3)
    nb = 8
    st = state_from_topology(topo, pos + np.array([0, 1.0, 0], np.float32))
    rng = np.random.RandomState(2)
    offs = rng.uniform(-1, 1, (nb, 3)).astype(np.float32)
    z = np.zeros((nb,) + tuple(st.positions.shape), np.float32)
    batched = st.replace(
        positions=np.asarray(st.positions)[None] + offs[:, None, :],
        velocities=z, ext_force=z,
        lambda_dist=np.zeros((nb, topo.n_edges), np.float32),
        lambda_bend=np.zeros((nb, topo.n_hinges), np.float32))
    n_sub = 2 * cfg.substeps
    devmesh = pbatch.make_mesh(4)
    with pltpu.force_tpu_interpret_mode():
        out_s = pbatch.make_sharded_mesh_pallas_rollout(
            topo, cfg, DT / cfg.substeps, n_sub, devmesh, nb,
            block_edges=64)(batched)
        ref = mesh_pallas.make_mesh_substep_runner(
            topo, cfg, DT / cfg.substeps, n_sub, with_ext=True,
            n_bodies=nb, block_edges=64)(batched)
    got = np.asarray(out_s.positions)
    want = np.asarray(ref.positions)
    assert np.isfinite(got).all()
    assert np.abs(got - want).max() < 1e-6
    assert out_s.lambda_dist.shape == (nb, topo.n_edges)


def test_sharded_mesh_pallas_rollout_with_tets():
    """The per-tet volume family rides the sharded mesh rollout: a solid
    (centroid-fan) ball farm over a 4-device mesh, lambda_tet split on the
    body axis, must match the single-device ensemble kernel."""
    from jax.experimental.pallas import tpu as pltpu

    from softbodysimulation_tpu import state_from_topology
    from softbodysimulation_tpu.kernels import mesh_pallas
    from softbodysimulation_tpu.topology import build, mesh
    from softbodysimulation_tpu.topology import tets as T

    m = mesh.icosphere(1, radius=0.4)
    verts, tt = T.tets_from_surface_centroid(m.vertices, m.triangles)
    pos, topo = build.build_windowed_topology(
        verts, T.tet_edges(tt), 1e-4, tets=tt, tet_compliance=0.0,
        triangles=T.boundary_faces(tt), block_edges=64)
    cfg = SolverConfig(substeps=2, iterations=2, damping=0.02,
                       solve_mode=SolveMode.JACOBI, jacobi_rho=0.9,
                       lambda_mode=LambdaMode.RESET,
                       enable_tet_volume=True,
                       distance_backend="windowed",
                       ground_height=0.0, friction=0.3)
    nb = 8
    st = state_from_topology(topo, pos + np.array([0, 1.0, 0], np.float32))
    rng = np.random.RandomState(3)
    offs = rng.uniform(-1, 1, (nb, 3)).astype(np.float32)
    z = np.zeros((nb,) + tuple(st.positions.shape), np.float32)
    batched = st.replace(
        positions=np.asarray(st.positions)[None] + offs[:, None, :],
        velocities=z, ext_force=z,
        lambda_dist=np.zeros((nb, topo.n_edges), np.float32),
        lambda_bend=np.zeros((nb, topo.n_hinges), np.float32),
        lambda_tet=np.zeros((nb, topo.n_tets), np.float32))
    n_sub = 2 * cfg.substeps
    devmesh = pbatch.make_mesh(4)
    with pltpu.force_tpu_interpret_mode():
        out_s = pbatch.make_sharded_mesh_pallas_rollout(
            topo, cfg, DT / cfg.substeps, n_sub, devmesh, nb,
            block_edges=64)(batched)
        ref = mesh_pallas.make_mesh_substep_runner(
            topo, cfg, DT / cfg.substeps, n_sub, with_ext=True,
            n_bodies=nb, block_edges=64)(batched)
    assert np.isfinite(np.asarray(out_s.positions)).all()
    assert np.abs(np.asarray(out_s.positions)
                  - np.asarray(ref.positions)).max() < 1e-6
    np.testing.assert_allclose(np.asarray(out_s.lambda_tet),
                               np.asarray(ref.lambda_tet), atol=1e-6)
    assert out_s.lambda_tet.shape == (nb, topo.n_tets)


def test_differentiable_sharded_mesh_rollout_grads():
    """Distributed differentiable farm: gradients of a loss over the whole
    sharded multi-chip farm (fused kernel per chip forward, shard_map'd
    engine backward) must match differentiating the plain vmapped engine
    — including the psum'd cotangent for the REPLICATED inv_mass leaf."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from softbodysimulation_tpu import state_from_topology
    from softbodysimulation_tpu.solvers import general
    from softbodysimulation_tpu.topology import build, mesh
    from softbodysimulation_tpu.topology.edges import unique_edges

    m = mesh.icosphere(1)
    pos, topo = build.build_windowed_topology(
        m.vertices, unique_edges(m.triangles), 1e-4, triangles=m.triangles,
        block_edges=64)
    cfg = SolverConfig(substeps=2, iterations=2, damping=0.02,
                       solve_mode=SolveMode.JACOBI, jacobi_rho=0.0,
                       lambda_mode=LambdaMode.RESET,
                       distance_backend="windowed",
                       ground_height=-2.0)
    nb, n_sub = 4, 4
    st = state_from_topology(topo, pos + np.array([0, 0.6, 0], np.float32))
    rng = np.random.RandomState(5)
    offs = rng.uniform(-1, 1, (nb, 3)).astype(np.float32)
    z = np.zeros((nb,) + tuple(st.positions.shape), np.float32)
    batched = st.replace(
        positions=np.asarray(st.positions)[None] + offs[:, None, :],
        velocities=z, ext_force=z,
        lambda_dist=np.zeros((nb, topo.n_edges), np.float32),
        lambda_bend=np.zeros((nb, topo.n_hinges), np.float32))
    devmesh = pbatch.make_mesh(4)

    with pltpu.force_tpu_interpret_mode():
        run = pbatch.make_differentiable_sharded_mesh_rollout(
            topo, cfg, DT / cfg.substeps, n_sub, devmesh, nb,
            block_edges=64)

        def loss_pal(v0, im):
            s = batched.replace(
                velocities=jnp.broadcast_to(v0, batched.velocities.shape),
                inv_mass=im)
            return jnp.sum(run(s).positions ** 2)

        v0 = jnp.asarray([0.2, 0.0, -0.1])
        val_p, grads_p = jax.value_and_grad(loss_pal, argnums=(0, 1))(
            v0, st.inv_mass)

    # plain vmapped engine twin (no sharding)
    from jax import lax

    def one(state):
        s = general._substep(state, topo, cfg, DT / cfg.substeps,
                             apply_ext=True)

        def body(c, _):
            return general._substep(c, topo, cfg, DT / cfg.substeps,
                                    apply_ext=False), None

        s, _ = lax.scan(body, s, None, length=n_sub - 1)
        return s

    def loss_ref(v0, im):
        full = batched.replace(
            velocities=jnp.broadcast_to(v0, batched.velocities.shape),
            inv_mass=jnp.broadcast_to(im[None], (nb,) + im.shape),
            lambda_volume=jnp.zeros((nb,), np.float32))
        out = jax.vmap(one)(full)
        return jnp.sum(out.positions ** 2)

    val_r, grads_r = jax.value_and_grad(loss_ref, argnums=(0, 1))(
        jnp.asarray([0.2, 0.0, -0.1]), st.inv_mass)
    # ref broadcasts inv_mass per body, so its grad is already the body sum
    assert abs(float(val_p) - float(val_r)) / abs(float(val_r)) < 1e-4
    for gp, gr, name in ((grads_p[0], grads_r[0], "v0"),
                         (grads_p[1], grads_r[1], "inv_mass")):
        gp, gr = np.asarray(gp), np.asarray(gr)
        assert np.isfinite(gr).all(), name
        np.testing.assert_allclose(gp, gr, rtol=2e-4, atol=1e-6,
                                   err_msg=name)
    assert np.abs(np.asarray(grads_r[1])).max() > 1e-4


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_sharded_rollout_shared_kinematic_colliders():
    """Round-5 composition close (VERDICT r4 weak #4): DP-sharded farm
    rollouts thread ONE shared traced ColliderSet to every chip — both
    the vmapped-XLA route and the fused ensemble-kernel route — and the
    result matches the per-body single-chip runner with the same poses."""
    from jax.experimental.pallas import tpu as pltpu

    from softbodysimulation_tpu import make_colliders

    spec, batched = make_ensemble(8, res=4)
    cfg = cfg_default(lambda_mode=LambdaMode.RESET, ground_height=77.0)
    coll = make_colliders(spheres=[(0.0, 0.6, 0.0, 0.45)],
                          ground_height=0.0)
    mesh = pbatch.make_mesh(8)
    sharded = pbatch.shard_batched_state(batched, mesh)
    n_sub = 2 * cfg.substeps

    step = pbatch.make_sharded_pallas_rollout(
        spec, cfg, DT / cfg.substeps, n_sub, mesh, 8, kin_colliders=(1, 0))
    assert step.ensemble_backend == "xla"
    out = step(sharded, coll)

    runner = lat_engine.make_substep_runner(spec, cfg, DT / cfg.substeps,
                                            n_sub)
    for i in (0, 3, 7):
        want = runner(pbatch.body_slice(batched, i).replace(colliders=coll))
        got = np.asarray(pbatch.body_slice(out, i).positions)
        assert np.allclose(got, np.asarray(want.positions),
                           atol=1e-5), f"body {i}"

    # the fused ensemble-kernel route honors the same shared world
    with pltpu.force_tpu_interpret_mode():
        stepk = pbatch.make_sharded_pallas_rollout(
            spec, cfg, DT / cfg.substeps, n_sub, mesh, 8,
            backend="pallas", kin_colliders=(1, 0))
        outk = stepk(sharded, coll)
    dk = np.abs(np.asarray(outk.positions)
                - np.asarray(out.positions)).max()
    assert dk < 1e-5, f"kernel-route shared colliders diverge: {dk}"

    # the XLA sharded STEP factory takes the same (batched, colliders)
    stepx = pbatch.make_sharded_lattice_step(spec, cfg, DT, mesh,
                                             n_steps=2, kin_colliders=True)
    outx = stepx(sharded, coll)
    wantx = lat_engine.make_step(spec, cfg, DT, n_steps=2)(
        pbatch.body_slice(batched, 5).replace(colliders=coll))
    assert np.allclose(np.asarray(pbatch.body_slice(outx, 5).positions),
                       np.asarray(wantx.positions), atol=1e-5)
