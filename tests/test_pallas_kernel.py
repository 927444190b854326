"""Fused Pallas lattice kernel vs the XLA stencil engine (interpret mode on
CPU; the same comparison runs on real TPU hardware via bench tooling)."""

import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

import jax.numpy as jnp

from softbodysimulation_tpu import (FloorMode, LambdaMode, SolveMode,
                                    SolverConfig)
from softbodysimulation_tpu.kernels import lattice_pallas as lp
from softbodysimulation_tpu.solvers import lattice as lat_engine
from softbodysimulation_tpu.topology import lattice


def run_pair(cfg, res=6, n_substeps=12, mass=0.01):
    spec = lattice.lattice_spec(res, braced=True)
    state = lat_engine.make_lattice_state(spec, center=(0, 0.8, 0),
                                          mass=mass)
    ref_fn = lat_engine.make_substep_runner(spec, cfg, 1 / 480, n_substeps)
    with pltpu.force_tpu_interpret_mode():
        pal_fn = lp.make_pallas_substep_runner(spec, cfg, 1 / 480,
                                               n_substeps)
        out_p = pal_fn(state)
    out_r = ref_fn(state)
    return out_p, out_r


@pytest.mark.parametrize(
    "mode,lmode,decay",
    [
        (SolveMode.COLORED, LambdaMode.RESET, 0.99),
        (SolveMode.COLORED, LambdaMode.DECAY, 0.99),
        (SolveMode.JACOBI, LambdaMode.WARM_START, 1.0),
    ],
)
def test_pallas_matches_xla_engine(mode, lmode, decay):
    cfg = SolverConfig(substeps=8, iterations=2, damping=0.02,
                       solve_mode=mode, lambda_mode=lmode,
                       lambda_decay=decay, ground_height=0.0, friction=0.3)
    out_p, out_r = run_pair(cfg)
    dpos = np.abs(np.asarray(out_p.positions)
                  - np.asarray(out_r.positions)).max()
    dlam = np.abs(np.asarray(out_p.lambda_dist)
                  - np.asarray(out_r.lambda_dist)).max()
    assert dpos < 1e-5, f"pallas/xla position mismatch {dpos}"
    assert dlam < 1e-6


def test_pallas_pinned_particles():
    cfg = SolverConfig(substeps=4, iterations=2, damping=0.02,
                       solve_mode=SolveMode.COLORED, ground_height=0.0)
    spec = lattice.lattice_spec(4, braced=True)
    state = lat_engine.make_lattice_state(spec, center=(0, 0.5, 0))
    pins = np.array([0, 63])
    state = state.replace(inv_mass=state.inv_mass.at[pins].set(0.0))
    p0 = np.asarray(state.positions)[pins].copy()
    with pltpu.force_tpu_interpret_mode():
        fn = lp.make_pallas_substep_runner(spec, cfg, 1 / 240, 10)
        out = fn(state)
    p = np.asarray(out.positions)
    assert np.allclose(p[pins], p0, atol=1e-6)
    assert np.isfinite(p).all()


def test_pallas_rejects_unsupported_config():
    spec = lattice.lattice_spec(4, braced=True)
    cfg = SolverConfig(enable_self_collision=True)
    with pytest.raises(NotImplementedError):
        lp.make_pallas_substep_runner(spec, cfg, 1 / 240, 4)


# ---- round-2 feature parity: every knob must match the XLA stencil engine
# (repo invariant: engines agree on config semantics)

FLOOR_KW = dict(ground_height=0.0, friction=0.3)


@pytest.mark.parametrize(
    "name,cfg_kw",
    [
        ("velocity_reflect", dict(floor_mode=FloorMode.VELOCITY_REFLECT,
                                  restitution=0.3, penetration_kick=2.0,
                                  floor_offset=0.001)),
        ("sphere_collider", dict(sphere_colliders=((0.0, 0.35, 0.0, 0.45),),
                                 **FLOOR_KW)),
        ("box_collider", dict(box_colliders=((0.1, 0.3, 0.0,
                                              0.5, 0.3, 0.5),),
                              **FLOOR_KW)),
        ("world_bounds", dict(world_bounds=0.9, **FLOOR_KW)),
        ("velocity_clamp", dict(max_velocity=0.5, **FLOOR_KW)),
    ],
)
def test_pallas_parity_knobs(name, cfg_kw):
    cfg = SolverConfig(substeps=6, iterations=2, damping=0.02,
                       solve_mode=SolveMode.COLORED,
                       lambda_mode=LambdaMode.DECAY, lambda_decay=0.99,
                       **cfg_kw)
    out_p, out_r = run_pair(cfg, res=5, n_substeps=18)
    dpos = np.abs(np.asarray(out_p.positions)
                  - np.asarray(out_r.positions)).max()
    assert np.isfinite(np.asarray(out_p.positions)).all()
    assert dpos < 1e-5, f"{name}: pallas/xla mismatch {dpos}"


def test_pallas_step_ext_force_matches_xla_step():
    """make_pallas_step = full force lifecycle: ext consumed on the first
    substep, zeroed after; max_force clamp applied (both gravity modes)."""
    for gacc in (False, True):
        cfg = SolverConfig(substeps=4, iterations=2, damping=0.02,
                           solve_mode=SolveMode.COLORED,
                           gravity_is_acceleration=gacc, max_force=60.0,
                           ground_height=0.0, friction=0.3)
        spec = lattice.lattice_spec(5, braced=True)
        state = lat_engine.make_lattice_state(spec, center=(0, 0.8, 0),
                                              mass=0.01)
        f = np.zeros((spec.n_particles, 3), np.float32)
        f[:10] = (90.0, 120.0, -70.0)   # exceeds max_force -> clamped
        state = state.replace(ext_force=jnp.asarray(f))
        ref = lat_engine.make_step(spec, cfg, 1 / 60, n_steps=3)(state)
        with pltpu.force_tpu_interpret_mode():
            out = lp.make_pallas_step(spec, cfg, 1 / 60, n_steps=3)(state)
        dpos = np.abs(np.asarray(out.positions)
                      - np.asarray(ref.positions)).max()
        assert dpos < 1e-5, f"gacc={gacc}: mismatch {dpos}"
        assert np.abs(np.asarray(out.ext_force)).max() == 0.0


@pytest.mark.parametrize("v_resident", [None, False])
def test_streamed_kernel_matches_xla_engine(v_resident):
    """The HBM-streaming variant (res > VMEM: lambdas/velocities streamed
    via explicit DMA, masks recomputed in-pass) must match the XLA engine
    exactly like the resident kernel does.  Small res here; res 64 runs on
    hardware (BENCHMARKS.md).  v_resident=False forces the per-substep
    velocity-plane DMA path that big res uses (auto keeps v in VMEM)."""
    cfg = SolverConfig(substeps=8, iterations=2, damping=0.02,
                       solve_mode=SolveMode.JACOBI,
                       lambda_mode=LambdaMode.DECAY, lambda_decay=0.97,
                       ground_height=0.0, friction=0.3)
    spec = lattice.lattice_spec(6, braced=True)
    state = lat_engine.make_lattice_state(spec, center=(0, 0.8, 0),
                                          mass=0.01)
    ref = lat_engine.make_substep_runner(spec, cfg, 1 / 480, 12)(state)
    with pltpu.force_tpu_interpret_mode():
        out = lp.make_pallas_substep_runner_streamed(
            spec, cfg, 1 / 480, 12, v_resident=v_resident)(state)
    dpos = np.abs(np.asarray(out.positions)
                  - np.asarray(ref.positions)).max()
    dlam = np.abs(np.asarray(out.lambda_dist)
                  - np.asarray(ref.lambda_dist)).max()
    assert dpos < 1e-5, f"streamed/xla mismatch {dpos}"
    assert dlam < 1e-6


@pytest.mark.parametrize(
    "name,cfg_kw",
    [
        ("colored_reset", dict(solve_mode=SolveMode.COLORED,
                               lambda_mode=LambdaMode.RESET)),
        ("colored_decay", dict(solve_mode=SolveMode.COLORED,
                               lambda_mode=LambdaMode.DECAY,
                               lambda_decay=0.99)),
        ("jacobi_warm", dict(solve_mode=SolveMode.JACOBI,
                             lambda_mode=LambdaMode.WARM_START,
                             lambda_decay=0.98,
                             warm_start_fraction=0.5)),
        ("colored_warm", dict(solve_mode=SolveMode.COLORED,
                              lambda_mode=LambdaMode.WARM_START,
                              lambda_decay=0.98,
                              warm_start_fraction=0.5)),
    ],
)
def test_streamed_kernel_solve_mode_parity(name, cfg_kw):
    """Round-2 scope extension: the streamed kernel now covers COLORED
    (family-parity GS, slab resident across both parity passes) and
    WARM_START (streamed pre-application loop) — must match the XLA
    engine like the resident kernel does."""
    cfg = SolverConfig(substeps=6, iterations=3, damping=0.02,
                       ground_height=0.0, friction=0.3, **cfg_kw)
    spec = lattice.lattice_spec(5, braced=True)
    state = lat_engine.make_lattice_state(spec, center=(0, 0.8, 0),
                                          mass=0.01)
    ref = lat_engine.make_substep_runner(spec, cfg, 1 / 480, 18)(state)
    with pltpu.force_tpu_interpret_mode():
        out = lp.make_pallas_substep_runner_streamed(
            spec, cfg, 1 / 480, 18)(state)
    dpos = np.abs(np.asarray(out.positions)
                  - np.asarray(ref.positions)).max()
    dlam = np.abs(np.asarray(out.lambda_dist)
                  - np.asarray(ref.lambda_dist)).max()
    assert dpos < 1e-5, f"streamed {name} mismatch {dpos}"
    assert dlam < 1e-5, f"streamed {name} lambda mismatch {dlam}"


@pytest.mark.parametrize("resident_kw", [
    {},                                          # auto: all-lambda VMEM
    dict(lam_resident=False),                    # no-lambda-io path
    dict(lam_resident=False, v_resident=False),  # full streaming path
])
def test_streamed_kernel_reset_single_iteration_specialization(resident_kw):
    """RESET x iterations=1 (the headline bench regime): with resident
    lambda the slabs never touch HBM mid-call; without, the loads are
    skipped and the store deferred to the last substep.  Positions AND
    the final lambda output must match the XLA engine in every variant."""
    cfg = SolverConfig(substeps=8, iterations=1, damping=0.02,
                       solve_mode=SolveMode.JACOBI,
                       lambda_mode=LambdaMode.RESET, fast_math=True,
                       gravity_is_acceleration=True,
                       ground_height=0.0, friction=0.3)
    spec = lattice.lattice_spec(6, braced=True)
    state = lat_engine.make_lattice_state(spec, center=(0, 0.6, 0),
                                          mass=0.001)
    ref = lat_engine.make_substep_runner(spec, cfg, 1 / 480, 11)(state)
    with pltpu.force_tpu_interpret_mode():
        out = lp.make_pallas_substep_runner_streamed(
            spec, cfg, 1 / 480, 11, **resident_kw)(state)
    dpos = np.abs(np.asarray(out.positions)
                  - np.asarray(ref.positions)).max()
    dlam = np.abs(np.asarray(out.lambda_dist)
                  - np.asarray(ref.lambda_dist)).max()
    assert dpos < 1e-5, f"reset-x1 specialization mismatch {dpos}"
    assert dlam < 1e-6, f"reset-x1 lambda mismatch {dlam}"


def test_streamed_kernel_approx_math_tracks_exact():
    """approx_math (rsqrt + approximate reciprocal) is an opt-in solver
    perturbation; over a short healthy rollout it must track the exact
    kernel to ~1e-4 (bench.py enforces <1e-3 against the XLA engine over
    2000 substeps on hardware before accepting its number)."""
    cfg = SolverConfig(substeps=4, iterations=2, damping=0.02,
                       solve_mode=SolveMode.JACOBI,
                       lambda_mode=LambdaMode.RESET, fast_math=True,
                       gravity_is_acceleration=True,
                       ground_height=0.0, friction=0.3)
    spec = lattice.lattice_spec(5, braced=True)
    state = lat_engine.make_lattice_state(spec, center=(0, 0.6, 0),
                                          mass=0.001)
    with pltpu.force_tpu_interpret_mode():
        exact = lp.make_pallas_substep_runner_streamed(
            spec, cfg, 1 / 480, 16)(state)
        approx = lp.make_pallas_substep_runner_streamed(
            spec, cfg, 1 / 480, 16, approx_math=True)(state)
    d = np.abs(np.asarray(exact.positions)
               - np.asarray(approx.positions)).max()
    assert np.isfinite(np.asarray(approx.positions)).all()
    assert d < 1e-4, f"approx_math drift {d}"


def test_streamed_kernel_ensemble_matches_batched_engine():
    """n_bodies > 1 folds bodies into lanes exactly like the XLA
    lane-folded ensemble engine (solvers.lattice.make_batched_step);
    with zero external forces the two must agree — including across the
    body-boundary roll masking and the lane padding (5 bodies x res 4:
    320 lanes -> padded 384)."""
    from softbodysimulation_tpu.parallel import batch as pbatch

    cfg = SolverConfig(substeps=4, iterations=2, damping=0.02,
                       solve_mode=SolveMode.JACOBI,
                       lambda_mode=LambdaMode.RESET,
                       ground_height=0.0, friction=0.3)
    spec = lattice.lattice_spec(4, braced=True)
    base = lat_engine.make_lattice_state(spec, center=(0, 0.8, 0),
                                         mass=0.01)
    nb = 5
    batched = pbatch.replicate_state(base, nb)
    rng = np.random.default_rng(2)
    offs = jnp.asarray(rng.uniform(-1, 1, (nb, 1, 3)) * 0.3
                       + np.array([0, 0.5, 0]), jnp.float32)
    batched = batched.replace(positions=batched.positions + offs)
    n_steps = 3
    ref = lat_engine.make_batched_step(spec, cfg, 1 / 120, nb,
                                       n_steps=n_steps)(batched)
    with pltpu.force_tpu_interpret_mode():
        out = lp.make_pallas_substep_runner_streamed(
            spec, cfg, (1 / 120) / cfg.substeps,
            n_steps * cfg.substeps, n_bodies=nb)(batched)
    dpos = np.abs(np.asarray(out.positions)
                  - np.asarray(ref.positions)).max()
    dlam = np.abs(np.asarray(out.lambda_dist)
                  - np.asarray(ref.lambda_dist)).max()
    assert dpos < 1e-5, f"ensemble streamed/xla mismatch {dpos}"
    assert dlam < 1e-5, f"ensemble lambda mismatch {dlam}"


@pytest.mark.parametrize(
    "name,cfg_kw",
    [
        ("sphere", dict(sphere_colliders=((0.0, 0.35, 0.0, 0.45),))),
        ("box", dict(box_colliders=((0.1, 0.3, 0.0, 0.5, 0.3, 0.5),))),
    ],
)
def test_streamed_kernel_collider_parity(name, cfg_kw):
    cfg = SolverConfig(substeps=6, iterations=2, damping=0.02,
                       solve_mode=SolveMode.JACOBI,
                       lambda_mode=LambdaMode.RESET,
                       ground_height=0.0, friction=0.3, **cfg_kw)
    spec = lattice.lattice_spec(5, braced=True)
    state = lat_engine.make_lattice_state(spec, center=(0, 0.8, 0),
                                          mass=0.01)
    ref = lat_engine.make_substep_runner(spec, cfg, 1 / 480, 18)(state)
    with pltpu.force_tpu_interpret_mode():
        out = lp.make_pallas_substep_runner_streamed(
            spec, cfg, 1 / 480, 18)(state)
    dpos = np.abs(np.asarray(out.positions)
                  - np.asarray(ref.positions)).max()
    assert dpos < 1e-5, f"streamed {name} collider mismatch {dpos}"


def test_streamed_mask_cache_bitwise_neutral():
    """Round 3: the per-family mask cache (static guards folded into one
    plane) is an execution-only change — results must be BITWISE equal
    with it on and off, in the faithful COLORED mode and WARM_START."""
    spec = lattice.lattice_spec(6, braced=True)
    state = lat_engine.make_lattice_state(spec, center=(0, 0.8, 0),
                                          mass=0.01)
    for cfg in (
        SolverConfig(substeps=4, iterations=3, damping=0.02,
                     solve_mode=SolveMode.COLORED,
                     lambda_mode=LambdaMode.DECAY, lambda_decay=0.99,
                     floor_mode=FloorMode.VELOCITY_REFLECT,
                     ground_height=0.0, fast_math=False),
        SolverConfig(substeps=4, iterations=2, damping=0.02,
                     solve_mode=SolveMode.JACOBI,
                     lambda_mode=LambdaMode.WARM_START,
                     ground_height=0.0, friction=0.3),
    ):
        with pltpu.force_tpu_interpret_mode():
            on = lp.make_pallas_substep_runner_streamed(
                spec, cfg, 1 / 480, 10, mask_cache=True)(state)
            off = lp.make_pallas_substep_runner_streamed(
                spec, cfg, 1 / 480, 10, mask_cache=False)(state)
        assert (np.asarray(on.positions)
                == np.asarray(off.positions)).all()
        assert (np.asarray(on.lambda_dist)
                == np.asarray(off.lambda_dist)).all()
