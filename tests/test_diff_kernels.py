"""Differentiable fused kernels (kernels/diff.py): the custom-VJP pairing
must (a) run the Pallas kernel as the primal and (b) return gradients that
match differentiating the XLA engine directly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from softbodysimulation_tpu import (LambdaMode, SolveMode, SolverConfig,
                                    state_from_topology)
from softbodysimulation_tpu.kernels import diff as kdiff
from softbodysimulation_tpu.solvers import general
from softbodysimulation_tpu.solvers import lattice as lat_engine
from softbodysimulation_tpu.topology import build, lattice, mesh
from softbodysimulation_tpu.topology.edges import unique_edges

DT_SUB = 1.0 / 240.0


def test_lattice_diff_runner_grads_match_xla():
    spec = lattice.lattice_spec(4, braced=True)
    cfg = SolverConfig(substeps=2, iterations=2, damping=0.01,
                       solve_mode=SolveMode.JACOBI,
                       lambda_mode=LambdaMode.RESET,
                       gravity_is_acceleration=True,
                       ground_height=0.0, friction=0.3)
    st = lat_engine.make_lattice_state(spec, center=(0, 0.7, 0))
    n_sub = 6
    ref_fn = lat_engine.make_substep_runner(spec, cfg, DT_SUB, n_sub)

    def loss_ref(v0):
        s = st.replace(velocities=jnp.broadcast_to(v0,
                                                   st.velocities.shape))
        return jnp.sum(ref_fn(s).positions[:, 0])

    with pltpu.force_tpu_interpret_mode():
        fused = kdiff.make_differentiable_lattice_runner(
            spec, cfg, DT_SUB, n_sub)

        def loss_pal(v0):
            s = st.replace(velocities=jnp.broadcast_to(
                v0, st.velocities.shape))
            return jnp.sum(fused(s).positions[:, 0])

        v0 = jnp.asarray([0.3, 0.1, -0.2])
        val_p, grad_p = jax.value_and_grad(loss_pal)(v0)
    val_r, grad_r = jax.value_and_grad(loss_ref)(v0)
    # primal comes from the kernel, cotangent from the XLA engine
    assert abs(float(val_p) - float(val_r)) < 1e-3
    np.testing.assert_allclose(np.asarray(grad_p), np.asarray(grad_r),
                               rtol=1e-5, atol=1e-7)
    assert np.abs(np.asarray(grad_r)).max() > 1e-3  # non-trivial gradient


def test_lattice_diff_runner_with_tets_grads_match_xla():
    """Solid bodies stay differentiable: the paired runner's primal is the
    streamed kernel's in-kernel tet sweep and its cotangent differentiates
    the stencil engine's _tet_sweep (pure jnp) at the same point."""
    spec = lattice.lattice_spec(4, braced=True)
    cfg = SolverConfig(substeps=2, iterations=2, damping=0.01,
                       solve_mode=SolveMode.JACOBI,
                       lambda_mode=LambdaMode.RESET,
                       gravity_is_acceleration=True,
                       enable_tet_volume=True,
                       ground_height=0.0, friction=0.3)
    st = lat_engine.make_lattice_state(spec, center=(0, 0.7, 0),
                                       tet_volume=True)
    n_sub = 6
    ref_fn = lat_engine.make_substep_runner(spec, cfg, DT_SUB, n_sub)

    def loss_ref(v0):
        s = st.replace(velocities=jnp.broadcast_to(v0,
                                                   st.velocities.shape))
        return jnp.sum(ref_fn(s).positions[:, 0])

    with pltpu.force_tpu_interpret_mode():
        fused = kdiff.make_differentiable_lattice_runner(
            spec, cfg, DT_SUB, n_sub)

        def loss_pal(v0):
            s = st.replace(velocities=jnp.broadcast_to(
                v0, st.velocities.shape))
            return jnp.sum(fused(s).positions[:, 0])

        v0 = jnp.asarray([0.3, 0.1, -0.2])
        val_p, grad_p = jax.value_and_grad(loss_pal)(v0)
    val_r, grad_r = jax.value_and_grad(loss_ref)(v0)
    assert abs(float(val_p) - float(val_r)) < 1e-3
    np.testing.assert_allclose(np.asarray(grad_p), np.asarray(grad_r),
                               rtol=1e-5, atol=1e-7)
    assert np.abs(np.asarray(grad_r)).max() > 1e-3


def test_mesh_diff_runner_grads_match_engine():
    m = mesh.icosphere(1)
    pos, topo = build.build_windowed_topology(
        m.vertices, unique_edges(m.triangles), 1e-4, triangles=m.triangles)
    cfg = SolverConfig(substeps=2, iterations=2, damping=0.01,
                       solve_mode=SolveMode.JACOBI, jacobi_rho=0.0,
                       distance_backend="windowed",
                       ground_height=-2.0)
    st = state_from_topology(topo, pos + np.array([0, 0.5, 0], np.float32))
    n_sub = 4

    def loss_ref(scale):
        s = st.replace(positions=st.positions * scale)
        from jax import lax

        def body(carry, _):
            return general._substep(carry, topo, cfg, DT_SUB,
                                    apply_ext=False), None

        out, _ = lax.scan(body, s, None, length=n_sub)
        return jnp.sum(out.positions ** 2)

    with pltpu.force_tpu_interpret_mode():
        fused = kdiff.make_differentiable_mesh_runner(
            topo, cfg, DT_SUB, n_sub, block_edges=128)

        def loss_pal(scale):
            s = st.replace(positions=st.positions * scale)
            return jnp.sum(fused(s).positions ** 2)

        val_p, grad_p = jax.value_and_grad(loss_pal)(jnp.float32(1.02))
    val_r, grad_r = jax.value_and_grad(loss_ref)(jnp.float32(1.02))
    assert abs(float(val_p) - float(val_r)) / max(abs(float(val_r)),
                                                  1e-9) < 1e-4
    assert abs(float(grad_p) - float(grad_r)) / max(abs(float(grad_r)),
                                                    1e-9) < 1e-4
    assert abs(float(grad_r)) > 1e-3


def test_mesh_ensemble_diff_runner_mass_grads_match_engine():
    """System identification through the heterogeneous farm: gradients of
    a rollout loss w.r.t. PER-BODY masses (the (B, n) inv_mass leaf) must
    match differentiating the vmapped XLA engine directly; the primal runs
    the fused ensemble kernel."""
    from jax import lax

    m = mesh.icosphere(1)
    pos, topo = build.build_windowed_topology(
        m.vertices, unique_edges(m.triangles), 1e-4, triangles=m.triangles)
    cfg = SolverConfig(substeps=2, iterations=2, damping=0.01,
                       solve_mode=SolveMode.JACOBI, jacobi_rho=0.0,
                       distance_backend="windowed",
                       ground_height=-2.0)
    st = state_from_topology(topo, pos + np.array([0, 0.5, 0], np.float32))
    nb, n_sub = 2, 4
    batched = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (nb,) + x.shape), st)
    im0 = jnp.stack([st.inv_mass * s for s in (1.0, 1.5)])   # (B, n)

    def one(state):
        def body(carry, _):
            return general._substep(carry, topo, cfg, DT_SUB,
                                    apply_ext=False), None

        out, _ = lax.scan(body, state, None, length=n_sub)
        return out

    def loss_ref(im):
        out = jax.vmap(one)(batched.replace(inv_mass=im))
        return jnp.sum(out.positions ** 2)

    with pltpu.force_tpu_interpret_mode():
        fused = kdiff.make_differentiable_mesh_ensemble_runner(
            topo, cfg, DT_SUB, n_sub, n_bodies=nb, block_edges=128)

        def loss_pal(im):
            return jnp.sum(fused(batched.replace(inv_mass=im)
                                 ).positions ** 2)

        val_p, grad_p = jax.value_and_grad(loss_pal)(im0)
    val_r, grad_r = jax.value_and_grad(loss_ref)(im0)
    assert abs(float(val_p) - float(val_r)) / abs(float(val_r)) < 1e-4
    np.testing.assert_allclose(np.asarray(grad_p), np.asarray(grad_r),
                               rtol=1e-4, atol=1e-6)
    assert np.abs(np.asarray(grad_r)).max() > 1e-4  # non-trivial
    # the two bodies' mass gradients differ (heterogeneous dynamics)
    assert np.abs(np.asarray(grad_r)[0] - np.asarray(grad_r)[1]).max() > 1e-6


def _mat_setup():
    m = mesh.icosphere(1)
    pos, topo = build.build_windowed_topology(
        m.vertices, unique_edges(m.triangles), 1e-4, triangles=m.triangles)
    cfg = SolverConfig(substeps=2, iterations=2, damping=0.01,
                       solve_mode=SolveMode.JACOBI, jacobi_rho=0.0,
                       distance_backend="windowed",
                       ground_height=-2.0)
    st = state_from_topology(topo, pos + np.array([0, 0.5, 0], np.float32))
    return topo, cfg, st


def test_mesh_traced_materials_match_static_plan():
    """Passing the topology's own rest/compliance as traced materials must
    reproduce the static-plan kernel bitwise (same padding, same
    min_alpha_tilde floor, same max_dlambda_rel bound)."""
    from softbodysimulation_tpu.kernels import mesh_pallas
    topo, cfg, st = _mat_setup()
    with pltpu.force_tpu_interpret_mode():
        fn = mesh_pallas.make_mesh_substep_runner(topo, cfg, DT_SUB, 4,
                                                  block_edges=128)
        out_static = fn(st)
        out_traced = fn(st, {"rest_lengths": topo.rest_lengths,
                             "compliance": topo.compliance})
    np.testing.assert_array_equal(np.asarray(out_static.positions),
                                  np.asarray(out_traced.positions))
    np.testing.assert_array_equal(np.asarray(out_static.lambda_dist),
                                  np.asarray(out_traced.lambda_dist))


@pytest.mark.parametrize("backward", ["xla", "fused"])
def test_material_grads_match_engine(backward):
    """System identification over MATERIALS: gradients of a rollout loss
    w.r.t. rest_lengths and compliance through the fused-kernel runner must
    match differentiating the XLA engine at topo.replace(...).

    Tolerances: the ``xla`` backward IS the engine's VJP, so it matches to
    fp noise.  The ``fused`` Mosaic backward computes the same derivative
    with a different (hand-written) op order; measured against an x64
    replica of the sweep, the FUSED gradient sits within 1e-5 of the true
    derivative while the engine's own f32 VJP carries ~0.5% backward
    rounding noise (the windowed transpose's scatter-add cancellation) —
    so this comparison is bounded by the ENGINE's noise, not the
    kernel's."""
    from jax import lax
    topo, cfg, st = _mat_setup()
    n_sub = 4
    mats0 = {"rest_lengths": topo.rest_lengths * 1.05,
             "compliance": topo.compliance * 2.0}

    def loss_ref(mats):
        t2 = topo.replace(rest_lengths=mats["rest_lengths"],
                          compliance=mats["compliance"])

        def body(carry, _):
            return general._substep(carry, t2, cfg, DT_SUB,
                                    apply_ext=False), None

        out, _ = lax.scan(body, st, None, length=n_sub)
        return jnp.sum(out.positions ** 2)

    with pltpu.force_tpu_interpret_mode():
        fused = kdiff.make_differentiable_material_runner(
            topo, cfg, DT_SUB, n_sub, block_edges=128, backward=backward)

        def loss_pal(mats):
            return jnp.sum(fused(st, mats).positions ** 2)

        val_p, grad_p = jax.value_and_grad(loss_pal)(mats0)
    val_r, grad_r = jax.value_and_grad(loss_ref)(mats0)
    assert abs(float(val_p) - float(val_r)) / abs(float(val_r)) < 1e-4
    rtol = 1e-4 if backward == "xla" else 2e-2
    for k in ("rest_lengths", "compliance"):
        gp, gr = np.asarray(grad_p[k]), np.asarray(grad_r[k])
        assert np.isfinite(gr).all(), k
        np.testing.assert_allclose(gp, gr, rtol=rtol, atol=1e-6, err_msg=k)
        # direction must agree essentially exactly (fitting loops care
        # about the descent direction)
        cos = float((gp * gr).sum()
                    / max(np.linalg.norm(gp) * np.linalg.norm(gr), 1e-30))
        assert cos > 0.99999, (k, cos)
    assert np.abs(np.asarray(grad_r["rest_lengths"])).max() > 1e-3


def test_material_fit_descends():
    """Three gradient steps on perturbed rest lengths move the loss down —
    the material-fitting loop runs end-to-end on the paired runner."""
    topo, cfg, st = _mat_setup()
    target_rest = topo.rest_lengths
    with pltpu.force_tpu_interpret_mode():
        fused = kdiff.make_differentiable_material_runner(
            topo, cfg, DT_SUB, 4, block_edges=128)

        def rollout_pos(rest):
            mats = {"rest_lengths": rest, "compliance": topo.compliance}
            return fused(st, mats).positions

        target = rollout_pos(target_rest)

        def loss(rest):
            return jnp.sum((rollout_pos(rest) - target) ** 2)

        rest = target_rest * (1.0 + 0.1)
        l0 = float(loss(rest))
        vg = jax.value_and_grad(loss)
        cur = l0
        for _ in range(3):
            l, g = vg(rest)
            lr = 0.25 * l / float(jnp.sum(g * g))   # Cauchy-ish step
            for _ in range(8):                       # backtracking
                trial = rest - lr * g
                lt = float(loss(trial))
                if lt < l:
                    rest, cur = trial, lt
                    break
                lr *= 0.25
        l1 = cur
    assert l1 < l0 * 0.9, (l0, l1)


def _batch_shared_mass(st, nb):
    """Batched SimState for a shared-inv_mass ensemble (inv_mass stays
    (n,); the other leaves gain the body axis)."""
    z = lambda x: jnp.broadcast_to(x[None], (nb,) + x.shape)
    return st.replace(positions=z(st.positions),
                      velocities=z(st.velocities),
                      ext_force=z(st.ext_force),
                      lambda_dist=z(st.lambda_dist),
                      lambda_bend=z(st.lambda_bend))


def test_per_body_materials_rows_match_shared():
    """A (B, E) materials batch whose rows are identical must reproduce the
    shared-(E,) materials path bitwise (per-body slabs broadcast the same
    values into every body row)."""
    from softbodysimulation_tpu.kernels import mesh_pallas
    topo, cfg, st = _mat_setup()
    nb = 2
    batched = _batch_shared_mass(st, nb)
    shared = {"rest_lengths": topo.rest_lengths,
              "compliance": topo.compliance}
    per_body = {"rest_lengths": jnp.broadcast_to(
                    topo.rest_lengths[None], (nb,) + topo.rest_lengths.shape),
                "compliance": jnp.broadcast_to(
                    topo.compliance[None], (nb,) + topo.compliance.shape)}
    with pltpu.force_tpu_interpret_mode():
        fn = mesh_pallas.make_mesh_substep_runner(
            topo, cfg, DT_SUB, 4, n_bodies=nb, block_edges=128)
        out_s = fn(batched, shared)
        out_p = fn(batched, per_body)
    np.testing.assert_array_equal(np.asarray(out_s.positions),
                                  np.asarray(out_p.positions))
    np.testing.assert_array_equal(np.asarray(out_s.lambda_dist),
                                  np.asarray(out_p.lambda_dist))


def test_material_ensemble_grads_match_vmapped_engine():
    """Heterogeneous-material farm: per-body gradients through the fused
    ensemble kernel match vmapping the XLA engine over (state, materials),
    and bodies with different stiffness get different gradients."""
    topo, cfg, st = _mat_setup()
    nb, n_sub = 2, 4
    batched = _batch_shared_mass(st, nb)
    rest0 = jnp.stack([topo.rest_lengths * s for s in (1.0, 1.08)])
    comp0 = jnp.stack([topo.compliance * s for s in (1.0, 4.0)])

    # the paired runner's ref fn IS the vmapped engine; differentiate a
    # hand-rolled copy to keep the comparison independent
    from jax import lax

    def one(state, rest, comp):
        t2 = topo.replace(rest_lengths=rest, compliance=comp)

        def body(carry, _):
            return general._substep(carry, t2, cfg, DT_SUB,
                                    apply_ext=False), None

        out, _ = lax.scan(body, state, None, length=n_sub)
        return out

    # fully-broadcast twin for the hand-rolled vmap (every leaf batched)
    full = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (nb,) + x.shape), st)

    def loss_ref(mats):
        out = jax.vmap(one)(full, mats["rest_lengths"],
                            mats["compliance"])
        return jnp.sum(out.positions ** 2)

    mats0 = {"rest_lengths": rest0, "compliance": comp0}
    with pltpu.force_tpu_interpret_mode():
        fused_ref = kdiff.make_differentiable_material_ensemble_runner(
            topo, cfg, DT_SUB, n_sub, n_bodies=nb, block_edges=128)

        def loss_pal(mats):
            return jnp.sum(fused_ref(batched, mats).positions ** 2)

        val_p, grad_p = jax.value_and_grad(loss_pal)(mats0)
    val_r, grad_r = jax.value_and_grad(loss_ref)(mats0)
    assert abs(float(val_p) - float(val_r)) / abs(float(val_r)) < 1e-4
    for k in ("rest_lengths", "compliance"):
        gp, gr = np.asarray(grad_p[k]), np.asarray(grad_r[k])
        assert np.isfinite(gr).all(), k
        np.testing.assert_allclose(gp, gr, rtol=1e-4, atol=1e-7, err_msg=k)
    gr = np.asarray(grad_r["rest_lengths"])
    assert np.abs(gr).max() > 1e-3
    assert np.abs(gr[0] - gr[1]).max() > 1e-6   # heterogeneous dynamics


def test_remat_chunk_grads_match_flat():
    """Chunked-checkpoint backward (remat_chunk) replays identical
    arithmetic, so gradients must match the flat-scan backward to fp
    precision — while bounding reverse-mode memory to O(N/K + K) carries."""
    topo, cfg, st = _mat_setup()
    n_sub = 8
    mats0 = {"rest_lengths": topo.rest_lengths * 1.03,
             "compliance": topo.compliance}
    grads = {}
    with pltpu.force_tpu_interpret_mode():
        for chunk in (0, 4):
            fused = kdiff.make_differentiable_material_runner(
                topo, cfg, DT_SUB, n_sub, remat_chunk=chunk,
                block_edges=128)

            def loss(mats):
                return jnp.sum(fused(st, mats).positions ** 2)

            _, grads[chunk] = jax.value_and_grad(loss)(mats0)
    for k in ("rest_lengths", "compliance"):
        np.testing.assert_allclose(np.asarray(grads[0][k]),
                                   np.asarray(grads[4][k]),
                                   rtol=1e-6, atol=1e-9, err_msg=k)
    assert np.abs(np.asarray(grads[0]["rest_lengths"])).max() > 1e-3

    import pytest
    with pytest.raises(ValueError, match="divide"):
        kdiff.make_differentiable_material_runner(
            topo, cfg, DT_SUB, n_sub, remat_chunk=3, block_edges=128)


def test_remat_chunk_lattice_grads_match_flat():
    spec = lattice.lattice_spec(4, braced=True)
    cfg = SolverConfig(substeps=2, iterations=2, damping=0.01,
                       solve_mode=SolveMode.JACOBI,
                       lambda_mode=LambdaMode.RESET,
                       gravity_is_acceleration=True,
                       ground_height=0.0, friction=0.3)
    st = lat_engine.make_lattice_state(spec, center=(0, 0.7, 0))
    n_sub = 8
    grads = {}
    with pltpu.force_tpu_interpret_mode():
        for chunk in (0, 4):
            fused = kdiff.make_differentiable_lattice_runner(
                spec, cfg, DT_SUB, n_sub, remat_chunk=chunk)

            def loss(v0):
                s = st.replace(velocities=jnp.broadcast_to(
                    v0, st.velocities.shape))
                return jnp.sum(fused(s).positions[:, 0])

            _, grads[chunk] = jax.value_and_grad(loss)(
                jnp.asarray([0.3, 0.1, -0.2]))
    np.testing.assert_allclose(np.asarray(grads[0]), np.asarray(grads[4]),
                               rtol=1e-6, atol=1e-9)
    assert np.abs(np.asarray(grads[0])).max() > 1e-3


def test_lattice_step_ext_force_grads_match_engine():
    """Control workload: gradients w.r.t. ext_force through the FULL-STEP
    paired runner (force lifecycle fused in-kernel) must match the stencil
    engine's make_step — a policy's forces get exact gradients while the
    rollout primal runs fused."""
    spec = lattice.lattice_spec(4, braced=True)
    cfg = SolverConfig(substeps=2, iterations=2, damping=0.01,
                       solve_mode=SolveMode.JACOBI,
                       lambda_mode=LambdaMode.RESET,
                       gravity_is_acceleration=True,
                       ground_height=0.0, friction=0.3)
    st = lat_engine.make_lattice_state(spec, center=(0, 0.7, 0))
    n_steps = 3
    ref_fn = lat_engine.make_step(spec, cfg, 1 / 60, n_steps)

    def loss_ref(f):
        s = st.replace(ext_force=jnp.broadcast_to(f, st.ext_force.shape))
        return jnp.sum(ref_fn(s).positions[:, 1])

    with pltpu.force_tpu_interpret_mode():
        fused = kdiff.make_differentiable_lattice_step(
            spec, cfg, 1 / 60, n_steps=n_steps)

        def loss_pal(f):
            s = st.replace(ext_force=jnp.broadcast_to(
                f, st.ext_force.shape))
            return jnp.sum(fused(s).positions[:, 1])

        f0 = jnp.asarray([0.0, 2e-3, 0.0])
        val_p, grad_p = jax.value_and_grad(loss_pal)(f0)
    val_r, grad_r = jax.value_and_grad(loss_ref)(f0)
    assert abs(float(val_p) - float(val_r)) < 1e-3
    np.testing.assert_allclose(np.asarray(grad_p), np.asarray(grad_r),
                               rtol=1e-5, atol=1e-7)
    assert np.abs(np.asarray(grad_r)).max() > 1e-2


def test_mesh_step_grads_match_engine():
    """Full-step mesh runner (ext-force lifecycle) gradient parity."""
    topo, cfg, st = _mat_setup()
    n_steps = 2
    ref_fn = general.make_step(topo, cfg, 1 / 120, n_steps)

    def loss_ref(f):
        s = st.replace(ext_force=jnp.broadcast_to(f, st.ext_force.shape))
        return jnp.sum(ref_fn(s).positions[:, 1])

    with pltpu.force_tpu_interpret_mode():
        fused = kdiff.make_differentiable_mesh_step(
            topo, cfg, 1 / 120, n_steps=n_steps)

        def loss_pal(f):
            s = st.replace(ext_force=jnp.broadcast_to(
                f, st.ext_force.shape))
            return jnp.sum(fused(s).positions[:, 1])

        f0 = jnp.asarray([0.0, 1e-3, 0.0])
        val_p, grad_p = jax.value_and_grad(loss_pal)(f0)
    val_r, grad_r = jax.value_and_grad(loss_ref)(f0)
    assert abs(float(val_p) - float(val_r)) / max(abs(float(val_r)),
                                                  1e-9) < 1e-3
    np.testing.assert_allclose(np.asarray(grad_p), np.asarray(grad_r),
                               rtol=1e-4, atol=1e-7)
    assert np.abs(np.asarray(grad_r)).max() > 1e-3


def test_mesh_step_self_collision_cadence_grads():
    """Self-colliding scenes join the differentiable story: a contact-
    cadence config routes the fused forward through the hybrid runner and
    the backward through the general engine WITH the dense contact pass —
    gradients must match differentiating the engine directly."""
    m = mesh.icosphere(1)
    pos, topo = build.build_windowed_topology(
        m.vertices, unique_edges(m.triangles), 1e-4, triangles=m.triangles)
    cfg = SolverConfig(substeps=4, iterations=2, damping=0.01,
                       solve_mode=SolveMode.JACOBI, jacobi_rho=0.0,
                       distance_backend="windowed",
                       enable_self_collision=True,
                       self_collision_backend="dense",
                       self_collision_every=2,
                       particle_radius=0.08,
                       ground_height=-2.0)
    st = state_from_topology(topo, pos + np.array([0, 0.5, 0], np.float32))
    n_steps = 2
    ref_fn = general.make_step(topo, cfg, 1 / 120, n_steps)

    def loss_ref(scale):
        s = st.replace(positions=st.positions * scale)
        return jnp.sum(ref_fn(s).positions ** 2)

    with pltpu.force_tpu_interpret_mode():
        fused = kdiff.make_differentiable_mesh_step(
            topo, cfg, 1 / 120, n_steps=n_steps)

        def loss_pal(scale):
            s = st.replace(positions=st.positions * scale)
            return jnp.sum(fused(s).positions ** 2)

        val_p, grad_p = jax.value_and_grad(loss_pal)(jnp.float32(0.9))
    val_r, grad_r = jax.value_and_grad(loss_ref)(jnp.float32(0.9))
    assert abs(float(val_p) - float(val_r)) / max(abs(float(val_r)),
                                                  1e-9) < 1e-3
    assert abs(float(grad_p) - float(grad_r)) / max(abs(float(grad_r)),
                                                    1e-9) < 1e-3
    assert abs(float(grad_r)) > 1e-2


def test_volume_ensemble_lambda_contract():
    """Volume-enabled batched ensembles must carry an explicit (B,)
    lambda_volume (a shared scalar would silently mean body-0-only in
    carried-lambda modes — the kernel now refuses it), and with the
    explicit leaf the differentiable ensemble matches the vmapped engine."""
    import pytest
    from softbodysimulation_tpu.kernels import mesh_pallas

    m = mesh.icosphere(1)
    pos, topo = build.build_windowed_topology(
        m.vertices, unique_edges(m.triangles), 1e-4, triangles=m.triangles)
    cfg = SolverConfig(substeps=2, iterations=2, damping=0.01,
                       solve_mode=SolveMode.JACOBI, jacobi_rho=0.0,
                       distance_backend="windowed",
                       enable_volume=True, pressure=1.1,
                       ground_height=-2.0)
    st = state_from_topology(topo, pos + np.array([0, 0.5, 0], np.float32))
    nb, n_sub = 2, 4
    batched = _batch_shared_mass(st, nb)   # lambda_volume stays scalar

    with pltpu.force_tpu_interpret_mode():
        fn = mesh_pallas.make_mesh_substep_runner(
            topo, cfg, DT_SUB, n_sub, n_bodies=nb, block_edges=128)
        with pytest.raises(ValueError, match="lambda_volume"):
            fn(batched)

        ok = batched.replace(
            lambda_volume=jnp.zeros((nb,), jnp.float32))
        fused = kdiff.make_differentiable_mesh_ensemble_runner(
            topo, cfg, DT_SUB, n_sub, n_bodies=nb, block_edges=128)
        okm = ok.replace(inv_mass=jnp.broadcast_to(
            st.inv_mass[None], (nb,) + st.inv_mass.shape))

        def loss_pal(im):
            return jnp.sum(fused(okm.replace(inv_mass=im)).positions ** 2)

        im0 = jnp.stack([st.inv_mass * s for s in (1.0, 1.3)])
        val_p, grad_p = jax.value_and_grad(loss_pal)(im0)

    from jax import lax

    def one(state):
        def body(carry, _):
            return general._substep(carry, topo, cfg, DT_SUB,
                                    apply_ext=False), None

        out, _ = lax.scan(body, state, None, length=n_sub)
        return out

    full = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (nb,) + x.shape), st)

    def loss_ref(im):
        out = jax.vmap(one)(full.replace(
            inv_mass=im, lambda_volume=jnp.zeros((nb,), jnp.float32)))
        return jnp.sum(out.positions ** 2)

    val_r, grad_r = jax.value_and_grad(loss_ref)(im0)
    assert abs(float(val_p) - float(val_r)) / abs(float(val_r)) < 1e-4
    np.testing.assert_allclose(np.asarray(grad_p), np.asarray(grad_r),
                               rtol=1e-4, atol=1e-6)


def test_mesh_diff_runner_colored_bending_grads():
    """COLORED exact-GS mode with bending stays differentiable through the
    paired runner: the in-kernel color sweeps carry the primal and the
    engine's color-bucket scatters carry the backward."""
    from jax import lax

    m = mesh.icosphere(1)
    mt = build.topology_from_mesh(
        m, compliance=1e-4, bending=True, bend_compliance=1e-3,
        windowed="colored", block_edges=128)
    pos, topo = mt
    cfg = SolverConfig(substeps=2, iterations=2, damping=0.01,
                       solve_mode=SolveMode.COLORED,
                       enable_bending=True,
                       distance_backend="windowed",
                       ground_height=-2.0)
    st = state_from_topology(topo, pos + np.array([0, 0.5, 0], np.float32))
    n_sub = 4

    def loss_ref(scale):
        s = st.replace(positions=st.positions * scale)

        def body(carry, _):
            return general._substep(carry, topo, cfg, DT_SUB,
                                    apply_ext=False), None

        out, _ = lax.scan(body, s, None, length=n_sub)
        return jnp.sum(out.positions ** 2)

    with pltpu.force_tpu_interpret_mode():
        fused = kdiff.make_differentiable_mesh_runner(
            topo, cfg, DT_SUB, n_sub, block_edges=128)

        def loss_pal(scale):
            s = st.replace(positions=st.positions * scale)
            return jnp.sum(fused(s).positions ** 2)

        val_p, grad_p = jax.value_and_grad(loss_pal)(jnp.float32(1.02))
    val_r, grad_r = jax.value_and_grad(loss_ref)(jnp.float32(1.02))
    assert abs(float(val_p) - float(val_r)) / max(abs(float(val_r)),
                                                  1e-9) < 1e-4
    assert abs(float(grad_p) - float(grad_r)) / max(abs(float(grad_r)),
                                                    1e-9) < 1e-4
    assert abs(float(grad_r)) > 1e-3


def test_paired_runners_reject_approx_math():
    """The pairing contract is straight-through-at-EQUAL-semantics: an
    approx_math forward would be linearized by an exact-math backward at a
    drifted trajectory, so the factories must refuse it explicitly
    (round-3 verdict: guard, don't just document)."""
    import pytest

    m = mesh.icosphere(1)
    pos, topo = build.build_windowed_topology(
        m.vertices, unique_edges(m.triangles), 1e-4,
        triangles=m.triangles)
    cfg = SolverConfig(substeps=2, iterations=2,
                       solve_mode=SolveMode.JACOBI,
                       distance_backend="windowed")
    spec = lattice.lattice_spec(4, braced=True)
    with pytest.raises(NotImplementedError, match="approx_math"):
        kdiff.make_differentiable_mesh_runner(
            topo, cfg, DT_SUB, 4, approx_math=True)
    with pytest.raises(NotImplementedError, match="approx_math"):
        kdiff.make_differentiable_lattice_runner(
            spec, cfg, DT_SUB, 4, approx_math=True)
    with pytest.raises(NotImplementedError, match="approx_math"):
        kdiff.make_differentiable_material_runner(
            topo, cfg, DT_SUB, 4, approx_math=True)
