"""Fused Mosaic backward (kernels/mesh_diff_pallas.py): the hand-written
backward-chunk kernel must return gradients matching the XLA engine's VJP
(same function to fp noise — both differentiate the windowed XPBD substep)
across the envelope: Chebyshev on/off, RESET/DECAY, floor on/off,
single- and multi-chunk, and cotangents through positions, velocities
and multipliers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.pallas import tpu as pltpu

from softbodysimulation_tpu import (LambdaMode, SolveMode, SolverConfig,
                                    state_from_topology)
from softbodysimulation_tpu.core.config import FloorMode
from softbodysimulation_tpu.kernels import diff as kdiff
from softbodysimulation_tpu.kernels import mesh_diff_pallas as mdp
from softbodysimulation_tpu.solvers import general
from softbodysimulation_tpu.topology import build, mesh

DT = 1.0 / 240.0


def _scene():
    m = mesh.icosphere(2, radius=0.5)
    pos, topo = build.topology_from_mesh(m, compliance=1e-6, windowed=True,
                                         block_edges=256)
    pos = pos + np.array([0, 0.45, 0], np.float32)
    return pos, topo


def _cfg(**kw):
    base = dict(substeps=2, iterations=4, damping=0.02,
                solve_mode=SolveMode.JACOBI,
                lambda_mode=LambdaMode.RESET,
                gravity_is_acceleration=True,
                distance_backend="windowed",
                ground_height=0.0, friction=0.3)
    base.update(kw)
    return SolverConfig(**base)


def _xla_loss(topo, cfg, st, n_sub):
    def loss(v0):
        s = st.replace(velocities=jnp.broadcast_to(v0,
                                                   st.velocities.shape))

        def body(c, _):
            return general._substep(c, topo, cfg, DT,
                                    apply_ext=False), None

        out, _ = lax.scan(body, s, None, length=n_sub)
        return jnp.sum(out.positions[:, 0] * out.positions[:, 1])

    return loss


def _fused_loss(topo, cfg, st, n_sub, **kw):
    fused = mdp.make_fused_differentiable_mesh_runner(topo, cfg, DT, n_sub,
                                                      **kw)

    def loss(v0):
        out = fused(st.replace(velocities=jnp.broadcast_to(
            v0, st.velocities.shape)))
        return jnp.sum(out.positions[:, 0] * out.positions[:, 1])

    return loss


V0 = np.asarray([0.3, 0.1, -0.2], np.float32)


def _compare(topo, cfg, st, n_sub, rtol=1e-4, **kw):
    with pltpu.force_tpu_interpret_mode():
        loss_p = _fused_loss(topo, cfg, st, n_sub, **kw)
        val_p, grad_p = jax.value_and_grad(loss_p)(jnp.asarray(V0))
    val_r, grad_r = jax.value_and_grad(_xla_loss(topo, cfg, st, n_sub))(
        jnp.asarray(V0))
    assert abs(float(val_p) - float(val_r)) < 1e-3 * max(
        1.0, abs(float(val_r)))
    gp, gr = np.asarray(grad_p), np.asarray(grad_r)
    scale = max(np.abs(gr).max(), 1e-12)
    np.testing.assert_allclose(gp / scale, gr / scale, atol=rtol)
    assert np.abs(gr).max() > 1e-3    # non-trivial gradient


@pytest.mark.parametrize("iters,lam_mode,floor", [
    (2, LambdaMode.RESET, FloorMode.XPBD_INEQUALITY),   # plain Jacobi
    (4, LambdaMode.RESET, FloorMode.XPBD_INEQUALITY),   # Chebyshev active
    (4, LambdaMode.DECAY, FloorMode.XPBD_INEQUALITY),
    (3, LambdaMode.RESET, FloorMode.NONE),
    (4, LambdaMode.WARM_START, FloorMode.XPBD_INEQUALITY),  # r4: entry()
    (2, LambdaMode.WARM_START, FloorMode.NONE),
])
def test_fused_backward_grads_match_engine(iters, lam_mode, floor):
    pos, topo = _scene()
    cfg = _cfg(iterations=iters, lambda_mode=lam_mode, floor_mode=floor)
    st = state_from_topology(topo, pos)
    _compare(topo, cfg, st, n_sub=5)


def test_fused_backward_multi_chunk_matches_engine():
    """chunk_substeps < n_substeps: chunk boundaries recomputed with the
    fused kernel, backward chunks chained through the reverse scan."""
    pos, topo = _scene()
    cfg = _cfg(lambda_mode=LambdaMode.DECAY)
    st = state_from_topology(topo, pos)
    _compare(topo, cfg, st, n_sub=6, chunk_substeps=2)


def test_fused_backward_position_and_lambda_cotangents():
    """Gradients w.r.t. initial positions, with the loss also reading the
    OUTPUT multipliers (exercises the glam cotangent input path)."""
    pos, topo = _scene()
    cfg = _cfg(lambda_mode=LambdaMode.DECAY)
    st = state_from_topology(topo, pos)
    n_sub = 4

    def loss_ref(dx):
        s = st.replace(positions=st.positions + dx)

        def body(c, _):
            return general._substep(c, topo, cfg, DT,
                                    apply_ext=False), None

        out, _ = lax.scan(body, s, None, length=n_sub)
        return jnp.sum(out.positions ** 2) + jnp.sum(out.lambda_dist ** 2)

    with pltpu.force_tpu_interpret_mode():
        fused = mdp.make_fused_differentiable_mesh_runner(topo, cfg, DT,
                                                          n_sub)

        def loss_pal(dx):
            out = fused(st.replace(positions=st.positions + dx))
            return (jnp.sum(out.positions ** 2)
                    + jnp.sum(out.lambda_dist ** 2))

        dx0 = jnp.asarray([0.01, -0.02, 0.005])
        vp, gp = jax.value_and_grad(loss_pal)(dx0)
    vr, gr = jax.value_and_grad(loss_ref)(dx0)
    gp, gr = np.asarray(gp), np.asarray(gr)
    assert abs(float(vp) - float(vr)) < 1e-3 * abs(float(vr))
    scale = np.abs(gr).max()
    np.testing.assert_allclose(gp / scale, gr / scale, atol=2e-4)


def test_fused_backward_pinned_particles():
    """Pinned particles: finalize discards their own prediction, but their
    predicted position still steers neighbours through the gather, so both
    position AND velocity cotangents are nonzero and must match the
    engine's."""
    from softbodysimulation_tpu.interact import forces as F

    pos, topo = _scene()
    cfg = _cfg()
    st = state_from_topology(topo, pos)
    st = F.pin_indices(st, np.arange(5), pinned=True)
    n_sub = 3

    def loss_ref(s):
        def body(c, _):
            return general._substep(c, topo, cfg, DT,
                                    apply_ext=False), None

        out, _ = lax.scan(body, s, None, length=n_sub)
        return jnp.sum(out.positions ** 2)

    with pltpu.force_tpu_interpret_mode():
        fused = mdp.make_fused_differentiable_mesh_runner(topo, cfg, DT,
                                                          n_sub)
        gp = jax.grad(lambda s: jnp.sum(fused(s).positions ** 2))(st)
    gr = jax.grad(loss_ref)(st)
    # Per-ELEMENT tolerance is bf16-ulp scale: the ENGINE's autodiff VJP
    # rounds gather cotangents to bf16 inside split3 (cotangent dtype
    # follows the primal's — measured 2.4e-3 rel on dot_oh's VJP vs the
    # analytic cotangent), while the fused backward contracts cotangents
    # with the exact split (4e-8).  The reduced-vector tests above pass at
    # 1e-4 because the bf16 noise averages out over particles.
    sc = np.abs(np.asarray(gr.positions)).max()
    np.testing.assert_allclose(np.asarray(gp.positions) / sc,
                               np.asarray(gr.positions) / sc, atol=5e-3)
    sv = max(np.abs(np.asarray(gr.velocities)).max(), 1e-12)
    np.testing.assert_allclose(np.asarray(gp.velocities) / sv,
                               np.asarray(gr.velocities) / sv, atol=5e-3)


def test_fused_backward_envelope_guards():
    pos, topo = _scene()
    st_cfgs = [
        _cfg(solve_mode=SolveMode.COLORED),
        _cfg(enable_volume=True),
        _cfg(enable_self_collision=True, self_collision_backend="dense"),
        _cfg(floor_mode=FloorMode.VELOCITY_REFLECT),
        # round 5: sphere colliders JOINED the envelope (static + kin);
        # boxes remain outside it
        _cfg(box_colliders=((0.0, 0.2, 0.0, 0.1, 0.1, 0.1),)),
    ]
    for cfg in st_cfgs:
        with pytest.raises(NotImplementedError):
            mdp.make_fused_differentiable_mesh_runner(topo, cfg, DT, 4)
    with pytest.raises(ValueError):
        mdp.make_fused_differentiable_mesh_runner(topo, _cfg(), DT, 4,
                                                  chunk_substeps=3)


def test_diff_factory_routes_fused_backward():
    """kernels.diff.make_differentiable_mesh_runner(backward='fused')
    returns the fused construction; 'auto' falls back to the XLA pairing
    outside the envelope instead of raising."""
    pos, topo = _scene()
    st = state_from_topology(topo, pos)
    cfg = _cfg()
    with pltpu.force_tpu_interpret_mode():
        fused = kdiff.make_differentiable_mesh_runner(topo, cfg, DT, 4,
                                                      backward="fused")
        out = fused(st)
        assert np.isfinite(np.asarray(out.positions)).all()
        # outside the envelope, auto silently uses the XLA pairing
        # (WARM_START joined the envelope in round 4 — volume is outside)
        cfg_col = _cfg(enable_volume=True)
        paired = kdiff.make_differentiable_mesh_runner(topo, cfg_col, DT, 4,
                                                       backward="auto")
        out2 = paired(st)
        assert np.isfinite(np.asarray(out2.positions)).all()
        # and asking for fused explicitly outside the envelope raises
        with pytest.raises(NotImplementedError):
            kdiff.make_differentiable_mesh_runner(topo, cfg_col, DT, 4,
                                                  backward="fused")


@pytest.mark.parametrize("clamp,fraction", [(0.0, 1.0), (0.5, 0.5)])
def test_fused_backward_warm_start_lambda_chain(clamp, fraction):
    """WARM_START (round 4): the carried-multiplier cotangent must chain
    through the pre-apply (clip -> static scale -> decay) across substeps
    — loss reads the OUTPUT multipliers so glam enters nonzero, and the
    clamped variant exercises the clip VJP with the mass-derived limit."""
    pos, topo = _scene()
    cfg = _cfg(lambda_mode=LambdaMode.WARM_START, iterations=3,
               warm_start_clamp=clamp, warm_start_fraction=fraction)
    st = state_from_topology(topo, pos)
    n_sub = 4

    def mixed(out):
        return (jnp.sum(out.positions[:, 0] * out.positions[:, 1])
                + 0.1 * jnp.sum(out.lambda_dist ** 2))

    def loss_ref(dx):
        s = st.replace(positions=st.positions + dx)

        def body(c, _):
            return general._substep(c, topo, cfg, DT,
                                    apply_ext=False), None

        out, _ = lax.scan(body, s, None, length=n_sub)
        return mixed(out)

    with pltpu.force_tpu_interpret_mode():
        fused = mdp.make_fused_differentiable_mesh_runner(topo, cfg, DT,
                                                          n_sub)
        gp = jax.grad(lambda dx: mixed(fused(
            st.replace(positions=st.positions + dx))))(
                jnp.zeros_like(st.positions))
    gr = jax.grad(loss_ref)(jnp.zeros_like(st.positions))
    sc = max(np.abs(np.asarray(gr)).max(), 1e-12)
    # Per-element tolerance: the ENGINE's autodiff rounds gather
    # cotangents to bf16 (see the pinned-particles test), and WARM_START
    # runs one EXTRA gather/scatter VJP per substep (the pre-apply), so
    # its accumulated engine-side noise is larger still — measured 6.6e-3
    # worst here, with central finite differences of the FUSED primal
    # siding with the fused gradient at every worst coordinate.
    np.testing.assert_allclose(np.asarray(gp) / sc, np.asarray(gr) / sc,
                               atol=1.2e-2)
    assert np.abs(np.asarray(gr)).max() > 1e-6


def test_fused_backward_static_sphere_collider_grads():
    """Round-5 envelope widening: static config sphere colliders are
    covered in-kernel (projection + moving-frame-less friction VJP) —
    state gradients must still match the XLA engine."""
    pos, topo = _scene()
    # sphere poking into the ball's resting path so the contact fires
    cfg = _cfg(sphere_colliders=((0.0, 0.1, 0.0, 0.3),))
    st = state_from_topology(topo, pos)
    _compare(topo, cfg, st, n_sub=5)


@pytest.mark.parametrize("n_sub,iters,rho,atol", [
    # single-sweep regime: the hand VJP is essentially exact vs the
    # engine's AD (measured 1e-7 with the contact active)
    (1, 1, 0.0, 1e-4),
    # multi-substep contact-rich, bitwise-equal forwards: the two
    # DIFFERENT backward arithmetics (engine autodiff vs hand chain)
    # accumulate fp noise through the contact cancellations (measured
    # 4e-4; same scale the engine's own VJP shows against an x64 replica
    # on materials)
    (3, 2, 0.0, 5e-3),
    # deep Chebyshev + contact-rich regime: kernel and engine FORWARDS
    # diverge at ulp level (different op associations), and the contact
    # gates are discontinuous — a boundary particle flipping between the
    # two linearization points moves the gradients apart by its finite
    # contribution (~2% here).  Both are exact gradients of their own
    # trajectory; the loose band pins that they stay the same gradient
    # up to that documented forward divergence.
    (5, 4, 0.9, 5e-2),
])
def test_fused_backward_kinematic_collider_pose_grads(n_sub, iters, rho,
                                                      atol):
    """Traced ColliderSet poses in the fused backward: gradients w.r.t.
    the sphere center/radius/velocity AND the ground height must match
    differentiating the XLA engine through the state's collider leaf —
    the contact-control workload (config11) fully fused."""
    from softbodysimulation_tpu import make_colliders

    pos, topo = _scene()
    cfg = _cfg(ground_height=123.0,     # bogus on purpose: traced wins
               iterations=iters, jacobi_rho=rho)
    st = state_from_topology(topo, pos)
    # sphere overlapping the ball's +x shell so the contact fires from
    # the FIRST substep (an interior sphere never touches the surface
    # particles at short horizons — zero gradients prove nothing)
    coll = make_colliders(spheres=[(0.6, 0.45, 0.0, 0.2)],
                          sphere_velocities=[(0.4, 0.0, 0.1)],
                          ground_height=0.0)
    st = st.replace(colliders=coll)
    # RANDOM-weighted loss: the scene is near-symmetric, so a symmetric
    # loss makes several pose cotangents cancel to ~0 and a per-leaf
    # normalized comparison would amplify that noise into fake mismatches
    wts = jnp.asarray(np.random.RandomState(3).randn(*pos.shape),
                      jnp.float32)

    def xla_loss(c):
        s = st.replace(colliders=c)

        def body(cst, _):
            return general._substep(cst, topo, cfg, DT,
                                    apply_ext=False), None

        out, _ = lax.scan(body, s, None, length=n_sub)
        return jnp.sum(wts * out.positions)

    with pltpu.force_tpu_interpret_mode():
        fused = mdp.make_fused_differentiable_mesh_runner(
            topo, cfg, DT, n_sub, kin_colliders=(1, 0))

        def pal_loss(c):
            out = fused(st.replace(colliders=c))
            return jnp.sum(wts * out.positions)

        val_p, g_p = jax.value_and_grad(pal_loss)(coll)
    val_r, g_r = jax.value_and_grad(xla_loss)(coll)
    assert abs(float(val_p) - float(val_r)) < 1e-3 * max(
        1.0, abs(float(val_r)))
    # one GLOBAL scale across all pose leaves: a leaf whose true gradient
    # is tiny relative to the others must not have its fp noise promoted
    # to O(1) by per-leaf normalization
    scale = max(max(np.abs(np.asarray(getattr(g_r, nm))).max()
                    for nm in ("spheres", "sphere_velocities",
                               "ground_height")), 1e-12)
    for name in ("spheres", "sphere_velocities", "ground_height"):
        gp = np.asarray(getattr(g_p, name))
        gr = np.asarray(getattr(g_r, name))
        np.testing.assert_allclose(gp / scale, gr / scale, atol=atol,
                                   err_msg=name)
    # the contact actually fired: pose gradients are non-trivial
    assert np.abs(np.asarray(g_r.spheres)).max() > 1e-3


def test_fused_backward_kin_multi_chunk_pose_grads_sum():
    """Chunked backward: pose cotangents must SUM across chunks (the pose
    is constant over the rollout) — chunked == flat."""
    from softbodysimulation_tpu import make_colliders

    pos, topo = _scene()
    cfg = _cfg(lambda_mode=LambdaMode.DECAY, ground_height=55.0)
    st = state_from_topology(topo, pos)
    coll = make_colliders(spheres=[(0.6, 0.45, 0.0, 0.2)],  # touching
                          ground_height=0.0)
    st = st.replace(colliders=coll)
    grads = {}
    with pltpu.force_tpu_interpret_mode():
        for chunk in (None, 2):
            fused = mdp.make_fused_differentiable_mesh_runner(
                topo, cfg, DT, 6, chunk_substeps=chunk,
                kin_colliders=(1, 0))

            def loss(c):
                out = fused(st.replace(colliders=c))
                return jnp.sum(out.positions ** 2)

            grads[chunk] = jax.grad(loss)(coll)
    for name in ("spheres", "sphere_velocities", "ground_height"):
        np.testing.assert_allclose(np.asarray(getattr(grads[None], name)),
                                   np.asarray(getattr(grads[2], name)),
                                   rtol=1e-5, atol=1e-8, err_msg=name)


def test_fused_backward_kin_box_rejected():
    from softbodysimulation_tpu import make_colliders  # noqa: F401

    pos, topo = _scene()
    cfg = _cfg()
    with pytest.raises(NotImplementedError, match="box"):
        mdp.make_fused_differentiable_mesh_runner(
            topo, cfg, DT, 4, kin_colliders=(1, 1))
