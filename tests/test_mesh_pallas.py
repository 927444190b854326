"""Fused Pallas mesh-substep kernel vs the general XLA engine (windowed
backend), interpret mode on CPU.  The same comparison runs on hardware via
scripts/bench_mesh_kernel.py."""

import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from softbodysimulation_tpu import (FloorMode, LambdaMode, SolveMode,
                                    SolverConfig, state_from_topology)
from softbodysimulation_tpu.kernels import mesh_pallas
from softbodysimulation_tpu.solvers import general
from softbodysimulation_tpu.topology import build, mesh
from softbodysimulation_tpu.topology.edges import unique_edges

DT = 1.0 / 60.0


def sphere_topo(sub=2, compliance=1e-3):
    m = mesh.icosphere(sub)
    pos2, topo = build.build_windowed_topology(
        m.vertices, unique_edges(m.triangles), compliance,
        triangles=m.triangles)
    return pos2 + np.array([0, 0.8, 0], np.float32), topo


def run_pair(cfg, n_steps=5, pin=None, poke=False, **runner_kw):
    pos, topo = sphere_topo()
    st = state_from_topology(topo, pos)
    if pin is not None:
        st = st.replace(
            inv_mass=st.inv_mass.at[np.asarray(pin)].set(0.0))
    if poke:
        f = np.zeros_like(pos)
        f[:10] = (4.0, 8.0, 2.0)
        st = st.replace(ext_force=np.asarray(f))
    ref_fn = general.make_step(topo, cfg, DT, n_steps=n_steps)
    out_r = ref_fn(st)
    with pltpu.force_tpu_interpret_mode():
        pal_fn = mesh_pallas.make_mesh_substep_runner(
            topo, cfg, DT / cfg.substeps, n_steps * cfg.substeps,
            block_edges=128, with_ext=True, **runner_kw)
        out_p = pal_fn(st)
    return out_p, out_r


def assert_close(out_p, out_r, tol_pos=2e-5, tol_lam=1e-6):
    dpos = np.abs(np.asarray(out_p.positions)
                  - np.asarray(out_r.positions)).max()
    dlam = np.abs(np.asarray(out_p.lambda_dist)
                  - np.asarray(out_r.lambda_dist)).max()
    assert np.isfinite(np.asarray(out_p.positions)).all()
    assert dpos < tol_pos, f"kernel/engine position mismatch {dpos}"
    assert dlam < tol_lam, f"kernel/engine lambda mismatch {dlam}"


@pytest.mark.parametrize(
    "lmode,rho,floor",
    [
        (LambdaMode.RESET, 0.9, FloorMode.XPBD_INEQUALITY),
        (LambdaMode.RESET, 0.0, FloorMode.XPBD_INEQUALITY),
        (LambdaMode.DECAY, 0.9, FloorMode.VELOCITY_REFLECT),
        (LambdaMode.WARM_START, 0.0, FloorMode.XPBD_INEQUALITY),
    ],
)
def test_mesh_kernel_matches_engine(lmode, rho, floor):
    cfg = SolverConfig(substeps=4, iterations=4, damping=0.02,
                       solve_mode=SolveMode.JACOBI, lambda_mode=lmode,
                       lambda_decay=0.98, jacobi_rho=rho,
                       distance_backend="windowed",
                       ground_height=0.0, friction=0.3, floor_mode=floor)
    assert_close(*run_pair(cfg))


def test_mesh_kernel_ext_force_and_pins():
    cfg = SolverConfig(substeps=4, iterations=3, damping=0.02,
                       solve_mode=SolveMode.JACOBI,
                       lambda_mode=LambdaMode.RESET, jacobi_rho=0.9,
                       distance_backend="windowed",
                       ground_height=0.0, friction=0.3)
    out_p, out_r = run_pair(cfg, pin=[0, 5], poke=True)
    assert_close(out_p, out_r)
    # pinned particles must not move and ext_force must be consumed
    assert np.abs(np.asarray(out_p.ext_force)).max() == 0.0


def test_mesh_kernel_sdf_colliders_and_clamps():
    cfg = SolverConfig(substeps=2, iterations=3,
                       solve_mode=SolveMode.JACOBI, jacobi_rho=0.9,
                       lambda_mode=LambdaMode.RESET,
                       distance_backend="windowed",
                       ground_height=-0.2, friction=0.2,
                       sphere_colliders=((0.0, 0.35, 0.0, 0.3),),
                       box_colliders=((0.5, 0.4, 0.0, 0.2, 0.2, 0.2),),
                       max_dlambda_rel=0.1, lambda_clamp=100.0,
                       max_velocity=20.0, world_bounds=1000.0)
    assert_close(*run_pair(cfg))


def test_mesh_kernel_force_mode_gravity():
    cfg = SolverConfig(substeps=2, iterations=2,
                       solve_mode=SolveMode.JACOBI, jacobi_rho=0.0,
                       lambda_mode=LambdaMode.RESET,
                       distance_backend="windowed",
                       gravity_is_acceleration=False, max_force=100.0,
                       ground_height=0.0)
    assert_close(*run_pair(cfg, poke=True))


def test_mesh_kernel_approx_math_tracks_engine():
    cfg = SolverConfig(substeps=4, iterations=2,
                       solve_mode=SolveMode.JACOBI, jacobi_rho=0.0,
                       lambda_mode=LambdaMode.RESET,
                       distance_backend="windowed",
                       ground_height=0.0, friction=0.3)
    out_p, out_r = run_pair(cfg, approx_math=True)
    # approx reciprocal/rsqrt: looser budget, same trajectory
    assert_close(out_p, out_r, tol_pos=5e-3, tol_lam=5e-4)


def test_mesh_kernel_step_wrapper_matches_engine_step():
    pos, topo = sphere_topo()
    cfg = SolverConfig(substeps=3, iterations=3,
                       solve_mode=SolveMode.JACOBI, jacobi_rho=0.9,
                       lambda_mode=LambdaMode.DECAY,
                       distance_backend="windowed",
                       ground_height=0.0, friction=0.3)
    st = state_from_topology(topo, pos)
    out_r = general.make_step(topo, cfg, DT, n_steps=4)(st)
    with pltpu.force_tpu_interpret_mode():
        out_p = mesh_pallas.make_mesh_pallas_step(topo, cfg, DT,
                                                  n_steps=4)(st)
    assert_close(out_p, out_r)


def bend_topo(compliance=1e-3, bend_compliance=1e-3, lift=5.0):
    """Hinged icosphere.  Default lift keeps it clear of the floor: at
    pen ~ 0 an ulp-level difference flips the contact `hit` mask and
    applies/skips a ~1e-3 friction correction, which bending then amplifies
    (measured — the same contact-switching chaos class documented in
    BENCHMARKS.md).  Contact-free configs compare tight; the floor test
    below uses a short horizon."""
    m = mesh.icosphere(2)
    pos2, topo = build.topology_from_mesh(
        m, compliance=compliance, bending=True,
        bend_compliance=bend_compliance, windowed=True, block_edges=128)
    return pos2 + np.array([0, lift, 0], np.float32), topo


def run_bend_pair(cfg, n_steps, lift=5.0, **runner_kw):
    pos, topo = bend_topo(lift=lift)
    st = state_from_topology(topo, pos)
    out_r = general.make_step(topo, cfg, DT, n_steps=n_steps)(st)
    with pltpu.force_tpu_interpret_mode():
        fn = mesh_pallas.make_mesh_substep_runner(
            topo, cfg, DT / cfg.substeps, n_steps * cfg.substeps,
            block_edges=128, with_ext=True, **runner_kw)
        out_p = fn(st)
    return out_p, out_r, topo, st


def _bend_cfg(**kw):
    base = dict(substeps=1, iterations=1, damping=0.02,
                solve_mode=SolveMode.JACOBI, jacobi_rho=0.0,
                lambda_mode=LambdaMode.RESET, enable_bending=True,
                distance_backend="windowed", bending_backend="windowed",
                ground_height=0.0, friction=0.3)
    base.update(kw)
    return SolverConfig(**base)


def test_mesh_kernel_bending_single_sweep_tight():
    """One substep x one iteration: the in-kernel bending sweep must match
    the XLA windowed bending backend to acos-polynomial accuracy (~1e-8 —
    before the stiff system's Lyapunov amplification has anywhere to act)."""
    out_p, out_r, _, _ = run_bend_pair(_bend_cfg(), n_steps=1)
    dpos = np.abs(np.asarray(out_p.positions)
                  - np.asarray(out_r.positions)).max()
    dlam = np.abs(np.asarray(out_p.lambda_bend)
                  - np.asarray(out_r.lambda_bend)).max()
    assert dpos < 1e-6, dpos
    assert dlam < 1e-6, dlam


@pytest.mark.parametrize("lmode,rho", [
    (LambdaMode.RESET, 0.9),
    (LambdaMode.DECAY, 0.0),
    (LambdaMode.WARM_START, 0.9),
])
def test_mesh_kernel_bending_tracks_engine(lmode, rho):
    """Contact-free multi-step bending rollouts (incl. Chebyshev): the
    in-kernel sweep must track the XLA windowed bending backend to
    acos-polynomial accuracy."""
    cfg = _bend_cfg(substeps=4, iterations=4, lambda_mode=lmode,
                    jacobi_rho=rho, lambda_decay=0.98)
    out_p, out_r, topo, _ = run_bend_pair(cfg, n_steps=2)
    dpos = np.abs(np.asarray(out_p.positions)
                  - np.asarray(out_r.positions)).max()
    dlam = np.abs(np.asarray(out_p.lambda_bend)
                  - np.asarray(out_r.lambda_bend)).max()
    assert np.isfinite(np.asarray(out_p.positions)).all()
    assert dpos < 5e-6, dpos
    assert dlam < 5e-6, dlam
    assert out_p.lambda_bend.shape == (topo.n_hinges,)


def test_mesh_kernel_bending_pinned_and_floor():
    cfg = _bend_cfg(substeps=2, iterations=3, jacobi_rho=0.9,
                    floor_mode=FloorMode.VELOCITY_REFLECT)
    pos, topo = bend_topo(lift=0.8)   # resting ON the floor (short horizon)
    st = state_from_topology(topo, pos)
    st = st.replace(inv_mass=st.inv_mass.at[np.asarray([0, 3])].set(0.0))
    out_r = general.make_step(topo, cfg, DT, n_steps=1)(st)
    with pltpu.force_tpu_interpret_mode():
        out_p = mesh_pallas.make_mesh_substep_runner(
            topo, cfg, DT / cfg.substeps, cfg.substeps,
            block_edges=128, with_ext=True)(st)
    dpos = np.abs(np.asarray(out_p.positions)
                  - np.asarray(out_r.positions)).max()
    assert dpos < 1e-5, dpos
    assert np.abs(np.asarray(out_p.positions)[[0, 3]]
                  - np.asarray(pos)[[0, 3]]).max() == 0.0


def test_mesh_kernel_synth_matches_resident_bitwise():
    """The synthesized one-hot spelling (in-register iota-compare, the
    large-mesh variant) must reproduce the resident-matrix kernel exactly:
    same {0,±1} bf16 values through the same MXU contractions."""
    cfg = SolverConfig(substeps=4, iterations=3, damping=0.02,
                       solve_mode=SolveMode.JACOBI,
                       lambda_mode=LambdaMode.DECAY, lambda_decay=0.98,
                       jacobi_rho=0.9, distance_backend="windowed",
                       ground_height=0.0, friction=0.3)
    out_s, out_r1 = run_pair(cfg, pin=[0, 5], poke=True, synth_gd=True)
    out_d, out_r2 = run_pair(cfg, pin=[0, 5], poke=True, synth_gd=False)
    ds = np.abs(np.asarray(out_s.positions)
                - np.asarray(out_d.positions)).max()
    dl = np.abs(np.asarray(out_s.lambda_dist)
                - np.asarray(out_d.lambda_dist)).max()
    assert ds == 0.0, f"synth vs resident positions differ: {ds}"
    assert dl == 0.0, f"synth vs resident lambdas differ: {dl}"
    assert_close(out_s, out_r1)   # and both track the XLA engine


def test_mesh_kernel_synth_with_bending():
    cfg = _bend_cfg(substeps=2, iterations=2, jacobi_rho=0.9)
    out_p, out_r, _, _ = run_bend_pair(cfg, n_steps=1, synth_gd=True)
    dpos = np.abs(np.asarray(out_p.positions)
                  - np.asarray(out_r.positions)).max()
    assert np.isfinite(np.asarray(out_p.positions)).all()
    assert dpos < 5e-6, dpos


def test_mesh_plan_auto_selects_synth_beyond_resident_budget():
    """A mesh whose resident matrices exceed the VMEM budget must
    auto-fall back to the synthesized plan instead of refusing; small
    meshes must keep the resident spelling."""
    from softbodysimulation_tpu.topology import mesh as meshmod

    pos, topo = sphere_topo()
    small = mesh_pallas.build_mesh_plan(
        topo, SolverConfig(solve_mode=SolveMode.JACOBI), DT / 4,
        block_edges=128)
    assert not small.synth and small.gd is not None

    big = meshmod.grid_plane(1.0, 130)        # 17.2k verts, ~50k edges
    pos2, topo2 = build.build_windowed_topology(
        big.vertices, unique_edges(big.triangles), 1e-3,
        triangles=big.triangles)
    plan = mesh_pallas.build_mesh_plan(
        topo2, SolverConfig(solve_mode=SolveMode.JACOBI), DT / 4)
    assert plan.synth and plan.gd is None and plan.didx is not None
    assert plan.vmem_bytes <= mesh_pallas.VMEM_BUDGET
    assert topo2.n_edges > 20_000
    # didx padded slots cancel: both endpoints equal
    k, _, s = plan.didx.shape
    pad = np.arange(k * s) >= topo2.n_edges
    la, lb = plan.didx[:, 0].reshape(-1), plan.didx[:, 1].reshape(-1)
    assert (la[pad] == lb[pad]).all()
    assert (la[~pad] != lb[~pad]).all()


def test_mesh_hybrid_contact_step_matches_engine_cadence():
    """Self-colliding mesh config with cadence: make_mesh_pallas_step
    routes to the hybrid (general-engine contact substeps + fused
    contact-free substeps) and tracks general.step_fn's cadence."""
    m = mesh.icosphere(1)
    n1 = m.vertices.shape[0]
    verts = np.concatenate([m.vertices,
                            m.vertices + np.array([0.15, 2.2, 0.05],
                                                  np.float32)])
    tris = np.concatenate([m.triangles, m.triangles + n1])
    pos, topo = build.build_windowed_topology(
        verts, unique_edges(tris), 1e-4, triangles=tris)
    pos = pos + np.array([0, 1.3, 0], np.float32)
    st = state_from_topology(topo, pos)
    f = np.zeros_like(pos)
    f[7] = (0.5, 2.0, -0.3)
    st = st.replace(ext_force=np.asarray(f))
    cfg = SolverConfig(substeps=6, iterations=1, damping=0.02,
                       solve_mode=SolveMode.JACOBI, jacobi_rho=0.0,
                       lambda_mode=LambdaMode.RESET,
                       distance_backend="windowed",
                       enable_self_collision=True, particle_radius=0.3,
                       self_collision_backend="dense",
                       self_collision_every=3,
                       ground_height=0.0, friction=0.3)
    ref = general.make_step(topo, cfg, DT, n_steps=2)(st)
    with pltpu.force_tpu_interpret_mode():
        out = mesh_pallas.make_mesh_pallas_step(topo, cfg, DT,
                                                n_steps=2)(st)
    d = np.abs(np.asarray(out.positions) - np.asarray(ref.positions)).max()
    assert np.isfinite(np.asarray(out.positions)).all()
    assert d < 1e-4, f"mesh hybrid diverges from engine cadence: {d}"
    assert np.abs(np.asarray(out.ext_force)).max() == 0.0
    # the contact pass must actually fire: disabling self-collision has
    # to change the trajectory, or this equivalence proves nothing
    ref_off = general.make_step(
        topo, cfg.replace(enable_self_collision=False), DT, n_steps=2)(st)
    d_off = np.abs(np.asarray(ref.positions)
                   - np.asarray(ref_off.positions)).max()
    assert d_off > 1e-4, f"scene never makes contact (d={d_off})"

    with pytest.raises(NotImplementedError):
        mesh_pallas.make_mesh_hybrid_contact_step(
            topo, cfg.replace(self_collision_every=4), DT)
    with pytest.raises(ValueError):
        mesh_pallas.make_mesh_hybrid_contact_step(
            topo, cfg.replace(enable_self_collision=False), DT)


def test_mesh_kernel_rejects_unsupported():
    pos, topo = sphere_topo()
    with pytest.raises(NotImplementedError):
        mesh_pallas.make_mesh_substep_runner(
            topo, SolverConfig(solve_mode=SolveMode.COLORED), DT, 4)
    with pytest.raises(NotImplementedError):
        mesh_pallas.make_mesh_substep_runner(
            topo, SolverConfig(solve_mode=SolveMode.JACOBI,
                               enable_self_collision=True), DT, 4)
    # a topology whose bandwidth genuinely exceeds the window bound is
    # refused (the un-renumbered path a user would hit by skipping
    # build_windowed_topology)
    n = 4096
    rng = np.random.default_rng(0)
    far = np.stack([np.arange(n // 2),
                    n // 2 + rng.permutation(n // 2)], axis=1)
    pos = rng.standard_normal((n, 3)).astype(np.float32)
    topo3 = build.build_topology(pos, far.astype(np.int32), 1e-3,
                                 color=False)
    with pytest.raises(NotImplementedError):
        mesh_pallas.make_mesh_substep_runner(
            topo3, SolverConfig(solve_mode=SolveMode.JACOBI), DT, 4,
            block_edges=128)


# ------------------------------------------------- COLORED (exact GS) mode

def colored_topo(sub=2, compliance=1e-3):
    m = mesh.icosphere(sub)
    pos2, topo = build.topology_from_mesh(m, compliance=compliance,
                                          windowed="colored")
    return pos2 + np.array([0, 0.8, 0], np.float32), topo


def test_colored_windowed_topology_is_color_contiguous():
    pos, topo = colored_topo()
    c = np.asarray(topo.colors)
    assert (np.diff(c) >= 0).all()
    from softbodysimulation_tpu.topology.coloring import validate_coloring
    assert validate_coloring(np.asarray(topo.edges), c)
    # every real edge appears exactly once as a valid slot in the plan
    cfg = SolverConfig(solve_mode=SolveMode.COLORED)
    plan = mesh_pallas.build_mesh_plan(topo, cfg, DT, block_edges=128,
                                       colored=True)
    assert plan.color_ranges is not None and plan.synth
    v = np.asarray(plan.valid).reshape(-1) > 0
    slots = np.asarray(plan.slot_ids)[v]
    assert sorted(slots.tolist()) == list(range(topo.n_edges))
    assert (np.asarray(plan.edge_slot)[slots]
            == np.flatnonzero(v)).all()
    # blocks never straddle colors
    scolor = np.asarray(topo.colors)[np.asarray(plan.slot_ids)].reshape(
        plan.n_blocks, plan.block_edges)
    for b_lo, b_hi in plan.color_ranges:
        assert len(np.unique(scolor[b_lo:b_hi])) == 1


def test_colored_windowed_topology_matches_frozen_oracle():
    """The color-major edge reordering must preserve the oracle-equal
    COLORED sweep: general engine on a windowed='colored' topology vs the
    frozen sequential oracle (reference_cpu)."""
    from softbodysimulation_tpu.solvers import reference_cpu

    pos, topo = colored_topo(compliance=1e-4)
    cfg = SolverConfig(substeps=1, iterations=8, damping=0.02,
                       solve_mode=SolveMode.COLORED, ground_height=0.0,
                       friction=0.3)
    state = state_from_topology(topo, pos)
    oracle = reference_cpu.ReferenceSolver(
        pos, np.asarray(topo.edges), np.asarray(topo.rest_lengths),
        np.asarray(topo.compliance), np.asarray(state.inv_mass), cfg,
        colors=np.asarray(topo.colors))
    step = general.make_step(topo, cfg, DT)
    for _ in range(60):
        state = step(state)
        oracle.step(DT)
    drift = np.abs(np.asarray(state.positions) - oracle.x).max()
    assert drift < 5e-5, f"colored-windowed topology broke oracle parity: {drift}"


def run_colored_pair(cfg, n_steps=4, max_window=1024, grid=False,
                     pin_poke=False):
    if grid:
        m = mesh.grid_plane(1.0, 20)
        v = m.vertices[:, [0, 2, 1]].copy()
        v[:, 2] *= 0.0
        pos, topo = build.topology_from_mesh(
            mesh.TriMesh(v, m.triangles), compliance=1e-5,
            windowed="colored")
        pos = pos + np.array([0, 0.6, 0], np.float32)
    else:
        pos, topo = colored_topo()
    st = state_from_topology(topo, pos)
    if pin_poke:
        top = np.flatnonzero(pos[:, 1] > pos[:, 1].max() - 1e-4)
        st = st.replace(inv_mass=st.inv_mass.at[top].set(0.0))
        f = np.zeros_like(pos)
        f[: len(pos) // 4] = (3.0, 6.0, 1.0)
        st = st.replace(ext_force=np.asarray(f))
    ref_fn = general.make_step(topo, cfg, DT, n_steps=n_steps)
    out_r = ref_fn(st)
    with pltpu.force_tpu_interpret_mode():
        plan = mesh_pallas.build_mesh_plan(
            topo, cfg, DT / cfg.substeps, block_edges=128,
            max_window=max_window, colored=True)
        pal_fn = mesh_pallas.make_mesh_substep_runner(
            topo, cfg, DT / cfg.substeps, n_steps * cfg.substeps,
            with_ext=True, plan=plan)
        out_p = pal_fn(st)
    return out_p, out_r, plan


@pytest.mark.parametrize(
    "lmode,floor",
    [
        (LambdaMode.RESET, FloorMode.XPBD_INEQUALITY),
        (LambdaMode.DECAY, FloorMode.VELOCITY_REFLECT),
        (LambdaMode.WARM_START, FloorMode.XPBD_INEQUALITY),
    ],
)
def test_mesh_kernel_colored_matches_engine(lmode, floor):
    """In-kernel COLORED (exact parallel GS, corrections applied per color)
    vs general._solve_distance_colored."""
    cfg = SolverConfig(substeps=2, iterations=5, damping=0.02,
                       solve_mode=SolveMode.COLORED, lambda_mode=lmode,
                       lambda_decay=0.97, ground_height=0.0, friction=0.3,
                       floor_mode=floor)
    out_p, out_r, _ = run_colored_pair(cfg)
    assert_close(out_p, out_r)


def test_mesh_kernel_colored_span_split_and_pins():
    """Span-bounded packing (blocks close early when a color's scattered
    edges would blow the window) with pinned particles + ext forces."""
    cfg = SolverConfig(substeps=2, iterations=4, damping=0.02,
                       solve_mode=SolveMode.COLORED,
                       lambda_mode=LambdaMode.RESET,
                       ground_height=-0.5, friction=0.2)
    out_p, out_r, plan = run_colored_pair(cfg, max_window=256, grid=True,
                                          pin_poke=True)
    assert_close(out_p, out_r)
    assert max(plan.widths) <= 256
    # at least one color needed more than one block (the split actually
    # exercised) and partial blocks exist
    assert any(hi - lo > 1 for lo, hi in plan.color_ranges)
    assert (np.asarray(plan.valid).reshape(-1) == 0).any()


def test_mesh_kernel_colored_clamps():
    """lambda_clamp + max_dlambda interact with the per-color lambda
    accumulation exactly as in the engine."""
    cfg = SolverConfig(substeps=1, iterations=6, damping=0.01,
                       solve_mode=SolveMode.COLORED,
                       lambda_mode=LambdaMode.RESET,
                       max_dlambda=1e-3, lambda_clamp=0.05,
                       ground_height=0.0)
    out_p, out_r, _ = run_colored_pair(cfg)
    assert_close(out_p, out_r)


def test_mesh_kernel_colored_rejects_plain_topology():
    # COLORED on a topology without color-contiguous edges is refused
    pos2, topo2 = sphere_topo()
    with pytest.raises(NotImplementedError, match="color-contiguous"):
        mesh_pallas.build_mesh_plan(
            topo2, SolverConfig(solve_mode=SolveMode.COLORED), DT,
            colored=True)


@pytest.mark.parametrize("lmode", [LambdaMode.RESET, LambdaMode.DECAY])
def test_mesh_kernel_colored_bending_matches_engine(lmode):
    """In-kernel COLORED bending (blocks packed color-major, corrections
    applied after each color at full strength) vs
    general._solve_bending_colored.  Tolerance covers the kernel's
    e-vector/_acos formulation vs the engine's absolute-position
    ``bending_delta_lambda`` (same class as the Jacobi bend tests)."""
    m = mesh.icosphere(2)
    pos2, topo = build.topology_from_mesh(
        m, compliance=1e-3, bending=True, bend_compliance=1e-3,
        windowed="colored", block_edges=128)
    pos = pos2 + np.array([0, 5.0, 0], np.float32)   # contact-free
    cfg = SolverConfig(substeps=2, iterations=2, damping=0.02,
                       solve_mode=SolveMode.COLORED, lambda_mode=lmode,
                       lambda_decay=0.98, enable_bending=True,
                       ground_height=0.0, friction=0.3)
    st = state_from_topology(topo, pos)
    out_r = general.make_step(topo, cfg, DT, n_steps=2)(st)
    with pltpu.force_tpu_interpret_mode():
        fn = mesh_pallas.make_mesh_substep_runner(
            topo, cfg, DT / cfg.substeps, 2 * cfg.substeps,
            block_edges=128, with_ext=True)
        out_p = fn(st)
    dpos = np.abs(np.asarray(out_p.positions)
                  - np.asarray(out_r.positions)).max()
    dlam = np.abs(np.asarray(out_p.lambda_bend)
                  - np.asarray(out_r.lambda_bend)).max()
    assert np.isfinite(np.asarray(out_p.positions)).all()
    assert dpos < 1e-5, dpos
    assert dlam < 1e-5, dlam
    assert out_p.lambda_bend.shape == (topo.n_hinges,)


def test_mesh_kernel_colored_bending_pinned():
    m = mesh.icosphere(2)
    pos2, topo = build.topology_from_mesh(
        m, compliance=1e-3, bending=True, bend_compliance=1e-3,
        windowed="colored", block_edges=128)
    pos = pos2 + np.array([0, 5.0, 0], np.float32)
    cfg = SolverConfig(substeps=2, iterations=2, damping=0.02,
                       solve_mode=SolveMode.COLORED,
                       lambda_mode=LambdaMode.RESET, enable_bending=True,
                       ground_height=0.0, friction=0.3)
    st = state_from_topology(topo, pos)
    pins = np.asarray([1, 7])
    st = st.replace(inv_mass=st.inv_mass.at[pins].set(0.0))
    out_r = general.make_step(topo, cfg, DT, n_steps=2)(st)
    with pltpu.force_tpu_interpret_mode():
        out_p = mesh_pallas.make_mesh_substep_runner(
            topo, cfg, DT / cfg.substeps, 2 * cfg.substeps,
            block_edges=128, with_ext=True)(st)
    np.testing.assert_array_equal(
        np.asarray(out_p.positions)[pins], np.asarray(pos)[pins])
    dpos = np.abs(np.asarray(out_p.positions)
                  - np.asarray(out_r.positions)).max()
    assert dpos < 1e-5, dpos


# ---------------------------------------------------------------------------
# Ensemble kernel: bodies stacked on the sublane axis (n_bodies > 1)
# ---------------------------------------------------------------------------

def _make_body_states(pos, topo, n_bodies, pins=(0, 5), poke=True, seed=0):
    """Per-body states with distinct positions/velocities/forces but the
    SHARED inv_mass the ensemble kernel requires."""
    rng = np.random.default_rng(seed)
    states = []
    for b in range(n_bodies):
        p = pos + np.array([0.11 * b, 0.05 * b, -0.07 * b], np.float32)
        st = state_from_topology(topo, p)
        st = st.replace(velocities=np.asarray(
            rng.normal(0.0, 0.1, st.velocities.shape), np.float32))
        if pins:
            st = st.replace(
                inv_mass=st.inv_mass.at[np.asarray(pins)].set(0.0))
        if poke:
            f = np.zeros_like(p)
            f[:6] = rng.normal(0.0, 3.0, (6, 3)).astype(np.float32)
            st = st.replace(ext_force=np.asarray(f))
        states.append(st)
    return states


def _batch(states):
    """Stack per-body states into the ensemble kernel's batched SimState
    (inv_mass stays the shared (n,) leaf)."""
    s0 = states[0]
    return s0.replace(
        positions=np.stack([np.asarray(s.positions) for s in states]),
        velocities=np.stack([np.asarray(s.velocities) for s in states]),
        ext_force=np.stack([np.asarray(s.ext_force) for s in states]),
        lambda_dist=np.stack([np.asarray(s.lambda_dist) for s in states]),
        lambda_bend=np.stack([np.asarray(s.lambda_bend) for s in states]),
    )


def _assert_bodies_close(out, refs, tol_pos=2e-5, tol_lam=1e-6,
                         check_bend=False):
    for b, ref in enumerate(refs):
        pb = np.asarray(out.positions[b])
        assert np.isfinite(pb).all()
        dpos = np.abs(pb - np.asarray(ref.positions)).max()
        dlam = np.abs(np.asarray(out.lambda_dist[b])
                      - np.asarray(ref.lambda_dist)).max()
        assert dpos < tol_pos, f"body {b} position mismatch {dpos}"
        assert dlam < tol_lam, f"body {b} lambda mismatch {dlam}"
        if check_bend:
            dbl = np.abs(np.asarray(out.lambda_bend[b])
                         - np.asarray(ref.lambda_bend)).max()
            assert dbl < 5e-6, f"body {b} bend lambda mismatch {dbl}"


def test_mesh_ensemble_matches_per_body_engine():
    """B=3 (pads to the 8-row tile): every body of the ensemble kernel
    must track its own single-body general-engine rollout — pins, pokes,
    Chebyshev, DECAY multipliers, floor contact."""
    cfg = SolverConfig(substeps=2, iterations=3, damping=0.02,
                       solve_mode=SolveMode.JACOBI,
                       lambda_mode=LambdaMode.DECAY, lambda_decay=0.98,
                       jacobi_rho=0.9, distance_backend="windowed",
                       ground_height=0.0, friction=0.3)
    pos, topo = sphere_topo()
    states = _make_body_states(pos, topo, 3)
    n_steps = 2
    ref_fn = general.make_step(topo, cfg, DT, n_steps=n_steps)
    refs = [ref_fn(s) for s in states]
    with pltpu.force_tpu_interpret_mode():
        fn = mesh_pallas.make_mesh_substep_runner(
            topo, cfg, DT / cfg.substeps, n_steps * cfg.substeps,
            block_edges=128, with_ext=True, n_bodies=3)
        out = fn(_batch(states))
    _assert_bodies_close(out, refs)
    assert np.abs(np.asarray(out.ext_force)).max() == 0.0
    assert out.positions.shape == (3,) + tuple(refs[0].positions.shape)


def test_mesh_ensemble_per_body_mass():
    """``per_body_mass=True``: heterogeneous farms — each body carries its
    OWN inverse masses and pins as a (B, n) leaf.  Every ensemble row must
    match its own single-body kernel run BITWISE (the mass-derived slabs
    gain a body axis but stay row-independent) and its own general-engine
    rollout to the usual tolerance."""
    cfg = SolverConfig(substeps=2, iterations=3, damping=0.02,
                       solve_mode=SolveMode.JACOBI,
                       lambda_mode=LambdaMode.DECAY, lambda_decay=0.98,
                       jacobi_rho=0.9, distance_backend="windowed",
                       ground_height=0.0, friction=0.3)
    pos, topo = sphere_topo()
    states = _make_body_states(pos, topo, 3, pins=())
    for b in range(3):
        im = np.asarray(states[b].inv_mass) * np.float32(0.5 + 0.5 * b)
        im[b] = 0.0   # a different pinned particle per body
        states[b] = states[b].replace(inv_mass=im)
    batched = _batch(states).replace(
        inv_mass=np.stack([np.asarray(s.inv_mass) for s in states]))
    n_steps = 2
    ref_fn = general.make_step(topo, cfg, DT, n_steps=n_steps)
    refs = [ref_fn(s) for s in states]
    with pltpu.force_tpu_interpret_mode():
        fb = mesh_pallas.make_mesh_substep_runner(
            topo, cfg, DT / cfg.substeps, n_steps * cfg.substeps,
            block_edges=128, with_ext=True, n_bodies=3,
            per_body_mass=True)
        outb = fb(batched)
        f1 = mesh_pallas.make_mesh_substep_runner(
            topo, cfg, DT / cfg.substeps, n_steps * cfg.substeps,
            block_edges=128, with_ext=True)
        singles = [f1(s) for s in states]
    _assert_bodies_close(outb, refs)
    for b in range(3):
        # the body's own pin held
        np.testing.assert_array_equal(
            np.asarray(outb.positions[b])[b],
            np.asarray(states[b].positions)[b])
        np.testing.assert_array_equal(
            np.asarray(outb.positions[b]),
            np.asarray(singles[b].positions))
        np.testing.assert_array_equal(
            np.asarray(outb.lambda_dist[b]),
            np.asarray(singles[b].lambda_dist))


def test_mesh_ensemble_per_body_mass_requires_batched():
    pos, topo = sphere_topo()
    with pytest.raises(ValueError, match="per_body_mass"):
        mesh_pallas.make_mesh_substep_runner(
            topo, SolverConfig(distance_backend="windowed"), DT, 2,
            per_body_mass=True)


def test_mesh_ensemble_matches_single_body_kernel_bitwise():
    """Each ensemble row must be the SAME arithmetic as the single-body
    kernel: identical MXU contractions on stacked rows (padded bodies
    change nothing)."""
    cfg = SolverConfig(substeps=2, iterations=2,
                       solve_mode=SolveMode.JACOBI, jacobi_rho=0.0,
                       lambda_mode=LambdaMode.RESET,
                       distance_backend="windowed",
                       ground_height=0.0, friction=0.3)
    pos, topo = sphere_topo()
    states = _make_body_states(pos, topo, 2, pins=(), poke=False)
    with pltpu.force_tpu_interpret_mode():
        single = mesh_pallas.make_mesh_substep_runner(
            topo, cfg, DT / cfg.substeps, cfg.substeps,
            block_edges=128, with_ext=True)
        singles = [single(s) for s in states]
        ens = mesh_pallas.make_mesh_substep_runner(
            topo, cfg, DT / cfg.substeps, cfg.substeps,
            block_edges=128, with_ext=True, n_bodies=2)
        out = ens(_batch(states))
    for b, ref in enumerate(singles):
        d = np.abs(np.asarray(out.positions[b])
                   - np.asarray(ref.positions)).max()
        assert d == 0.0, f"ensemble row {b} != single-body kernel: {d}"


def test_mesh_ensemble_bending():
    cfg = _bend_cfg(substeps=2, iterations=2, jacobi_rho=0.9,
                    lambda_mode=LambdaMode.DECAY, lambda_decay=0.98)
    pos, topo = bend_topo()
    states = _make_body_states(pos, topo, 2, pins=(0, 3), poke=False)
    ref_fn = general.make_step(topo, cfg, DT, n_steps=1)
    refs = [ref_fn(s) for s in states]
    with pltpu.force_tpu_interpret_mode():
        fn = mesh_pallas.make_mesh_substep_runner(
            topo, cfg, DT / cfg.substeps, cfg.substeps,
            block_edges=128, with_ext=True, n_bodies=2)
        out = fn(_batch(states))
    _assert_bodies_close(out, refs, tol_pos=5e-6, check_bend=True)


def test_mesh_ensemble_colored():
    """COLORED ensembles: the exact parallel-GS color sweep per body."""
    m = mesh.icosphere(2)
    pos2, topo = build.topology_from_mesh(m, compliance=1e-3,
                                          windowed="colored",
                                          block_edges=128)
    pos = pos2 + np.array([0, 0.8, 0], np.float32)
    cfg = SolverConfig(substeps=2, iterations=2,
                       solve_mode=SolveMode.COLORED,
                       lambda_mode=LambdaMode.RESET,
                       distance_backend="windowed",
                       ground_height=0.0, friction=0.3)
    states = _make_body_states(pos, topo, 2, pins=(1,), poke=True, seed=3)
    ref_fn = general.make_step(topo, cfg, DT, n_steps=1)
    refs = [ref_fn(s) for s in states]
    with pltpu.force_tpu_interpret_mode():
        fn = mesh_pallas.make_mesh_substep_runner(
            topo, cfg, DT / cfg.substeps, cfg.substeps,
            block_edges=128, with_ext=True, n_bodies=2)
        out = fn(_batch(states))
    _assert_bodies_close(out, refs)


# ---------------------------------------------------------------------------
# In-kernel global volume constraint
# ---------------------------------------------------------------------------

def _vol_cfg(**kw):
    base = dict(substeps=2, iterations=3, damping=0.02,
                solve_mode=SolveMode.JACOBI, jacobi_rho=0.9,
                lambda_mode=LambdaMode.RESET,
                distance_backend="windowed",
                enable_volume=True, pressure=1.5,
                volume_compliance=1e-4,
                ground_height=0.0, friction=0.3)
    base.update(kw)
    return SolverConfig(**base)


@pytest.mark.parametrize("lmode", [LambdaMode.RESET, LambdaMode.DECAY])
def test_mesh_kernel_volume_matches_engine(lmode):
    """Inflated-ball config: the in-kernel volume sweep (synthesized
    triangle one-hots + per-body scalar reduction) must track
    general._substep's volume_project (ops/volume.py) — same placement
    (after bending, before contacts), same lifecycle."""
    cfg = _vol_cfg(lambda_mode=lmode, lambda_decay=0.97)
    out_p, out_r = run_pair(cfg, n_steps=3)
    assert_close(out_p, out_r, tol_pos=5e-5)
    dlv = abs(float(out_p.lambda_volume) - float(out_r.lambda_volume))
    assert dlv < 1e-4, f"volume lambda mismatch {dlv}"
    assert float(out_p.lambda_volume) != 0.0  # the constraint actually fired


def test_mesh_kernel_volume_inflates():
    """Physics: pressure > 1 must grow the enclosed volume toward the
    target, in the kernel as in the engine."""
    from softbodysimulation_tpu.ops.volume import enclosed_volume

    cfg = _vol_cfg(pressure=2.0, substeps=4, iterations=4)
    pos, topo = sphere_topo()
    st = state_from_topology(topo, pos)
    v0 = float(enclosed_volume(st.positions, topo.triangles))
    with pltpu.force_tpu_interpret_mode():
        fn = mesh_pallas.make_mesh_substep_runner(
            topo, cfg, DT / cfg.substeps, 4 * cfg.substeps,
            block_edges=128, with_ext=True)
        out = fn(st)
    v1 = float(enclosed_volume(out.positions, topo.triangles))
    assert np.isfinite(np.asarray(out.positions)).all()
    assert v1 > 1.05 * v0, f"volume did not inflate: {v0} -> {v1}"


def test_mesh_ensemble_volume():
    """Per-body volume multipliers: each ensemble row tracks its own
    engine rollout, including the carried (B,) lambda_volume."""
    cfg = _vol_cfg(lambda_mode=LambdaMode.DECAY, lambda_decay=0.97,
                   substeps=2, iterations=2)
    pos, topo = sphere_topo()
    states = _make_body_states(pos, topo, 2, pins=(), poke=False)
    ref_fn = general.make_step(topo, cfg, DT, n_steps=2)
    refs = [ref_fn(s) for s in states]
    batched = _batch(states).replace(
        lambda_volume=np.zeros(2, np.float32))
    with pltpu.force_tpu_interpret_mode():
        fn = mesh_pallas.make_mesh_substep_runner(
            topo, cfg, DT / cfg.substeps, 2 * cfg.substeps,
            block_edges=128, with_ext=True, n_bodies=2)
        out = fn(batched)
    _assert_bodies_close(out, refs, tol_pos=5e-5)
    for b, ref in enumerate(refs):
        dlv = abs(float(out.lambda_volume[b]) - float(ref.lambda_volume))
        assert dlv < 1e-4, f"body {b} volume lambda mismatch {dlv}"
    assert float(np.abs(np.asarray(out.lambda_volume)).min()) > 0.0


# ---- in-kernel dense self-collision (multi-body contact, fused) --------

def _contact_scene(cloth_res=14, drop=1.17, **cfg_kw):
    """Small ball_on_cloth-shaped two-body merged WINDOWED topology with
    the ball placed already in contact (lower pole at the cloth plane), so
    the dense pass fires from substep 0 — 2 frames of free fall would not
    reach contact and would only exercise the solver."""
    from softbodysimulation_tpu.interact import forces as F
    from softbodysimulation_tpu.topology import edges as TE
    from softbodysimulation_tpu.topology import tets as TT

    cm = mesh.grid_plane(1.2, cloth_res)
    cverts = cm.vertices + np.array([0.0, 1.0, 0.0], np.float32)
    bm = mesh.icosphere(1, radius=0.18)
    bverts, btets = TT.tets_from_surface_centroid(bm.vertices, bm.triangles)
    bverts = (bverts + np.array([0.0, drop, 0.0])).astype(np.float32)
    pos, topo, sl = build.merge_topologies([
        build.BodySpec(cverts, TE.unique_edges(cm.triangles), 1e-5,
                       hinges=TE.hinges(cm.triangles),
                       bend_compliance=1e-3, triangles=cm.triangles),
        build.BodySpec(bverts, TT.tet_edges(btets), 1e-4,
                       triangles=TT.boundary_faces(btets), tets=btets,
                       tet_compliance=0.0),
    ], windowed=True)
    spacing = 1.2 / (cloth_res - 1)
    cfg = SolverConfig(substeps=4, iterations=3, damping=0.02,
                       solve_mode=SolveMode.JACOBI,
                       enable_bending=True,
                       enable_tet_volume=True, tet_pressure=1.05,
                       enable_self_collision=True,
                       self_collision_backend="dense",
                       particle_radius=round(0.45 * spacing, 4),
                       ground_height=0.0, friction=0.3, **cfg_kw)
    st = state_from_topology(topo, pos)
    nc = cverts.shape[0]
    ii, jj = np.divmod(np.arange(nc), cloth_res)
    rim = np.flatnonzero((ii % (cloth_res - 1) == 0)
                         | (jj % (cloth_res - 1) == 0))
    st = F.pin_indices(st, rim, pinned=True)
    return st, topo, cfg, nc


def test_mesh_kernel_dense_contact_matches_engine():
    """The fused in-kernel dense separation pass must track the general
    engine's dense backend through contact-rich frames — and provably
    FIRE: the same rollout without contact must land elsewhere."""
    import dataclasses

    st, topo, cfg, nc = _contact_scene()
    n_steps = 3
    ref = general.make_step(topo, cfg, DT, n_steps=n_steps)(st)
    off = general.make_step(
        topo, dataclasses.replace(cfg, enable_self_collision=False),
        DT, n_steps=n_steps)(st)
    with pltpu.force_tpu_interpret_mode():
        fn = mesh_pallas.make_mesh_pallas_step(topo, cfg, DT,
                                               n_steps=n_steps)
        out = fn(st)
    p, r = np.asarray(out.positions), np.asarray(ref.positions)
    assert np.isfinite(p).all()
    dpos = np.abs(p - r).max()
    # contact-rich Jacobi frames amplify the dense backend's documented
    # ~1e-7 Gram-boundary noise; 2e-4 is well under any physical scale here
    assert dpos < 2e-4, f"fused dense contact diverged from engine: {dpos}"
    # the contact pass did real work (no-contact rollout differs 10x more)
    dcontact = np.abs(r - np.asarray(off.positions)).max()
    assert dcontact > 10 * max(dpos, 1e-6), (dpos, dcontact)


def test_mesh_kernel_dense_contact_cadence():
    """self_collision_every=K gates the in-kernel pass on the raw substep
    index; with substeps % K == 0 that reproduces the engine's per-frame
    cadence pattern exactly."""
    st, topo, cfg, nc = _contact_scene(self_collision_every=2)
    n_steps = 2
    ref = general.make_step(topo, cfg, DT, n_steps=n_steps)(st)
    with pltpu.force_tpu_interpret_mode():
        fn = mesh_pallas.make_mesh_pallas_step(topo, cfg, DT,
                                               n_steps=n_steps)
        out = fn(st)
    dpos = np.abs(np.asarray(out.positions)
                  - np.asarray(ref.positions)).max()
    assert np.isfinite(np.asarray(out.positions)).all()
    assert dpos < 2e-4, f"cadence mismatch vs engine: {dpos}"


def test_mesh_kernel_dense_contact_guards():
    """Non-dense backends stay routed to the general engine with
    actionable errors (single-body AND ensembles — the round-5 body-local
    pass lifted the dense-ensemble guard, so n_bodies>1 now only rejects
    non-dense backends); misaligned cadence is rejected."""
    import dataclasses

    st, topo, cfg, nc = _contact_scene()
    with pytest.raises(NotImplementedError, match="dense"):
        mesh_pallas.make_mesh_substep_runner(
            topo, dataclasses.replace(cfg, self_collision_backend="hash"),
            DT / cfg.substeps, cfg.substeps)
    with pytest.raises(NotImplementedError, match="dense"):
        mesh_pallas.make_mesh_substep_runner(
            topo, dataclasses.replace(cfg, self_collision_backend="hash"),
            DT / cfg.substeps, cfg.substeps, n_bodies=2)
    # ensembles with the dense backend CONSTRUCT (behavior pinned in
    # test_mesh_ensemble_dense_contact_body_local)
    mesh_pallas.make_mesh_substep_runner(
        topo, cfg, DT / cfg.substeps, cfg.substeps, n_bodies=2)
    with pytest.raises(NotImplementedError, match="cadence"):
        mesh_pallas.make_mesh_pallas_step(
            topo, dataclasses.replace(cfg, self_collision_every=3),
            DT, n_steps=1)


def test_mesh_ensemble_dense_contact_body_local():
    """Round-5 ensemble contact: n_bodies > 1 with the in-kernel dense
    pass running BODY-LOCAL — every body of a contact-enabled farm must
    track its own single-body general-engine rollout (contact fires
    within each body, never across stacked bodies)."""
    m = mesh.icosphere(1)
    n1 = m.vertices.shape[0]
    verts = np.concatenate([m.vertices,
                            m.vertices + np.array([0.1, 2.1, 0.0],
                                                  np.float32)])
    tris = np.concatenate([m.triangles, m.triangles + n1])
    pos, topo = build.build_windowed_topology(
        verts, unique_edges(tris), 1e-4, triangles=tris)
    pos = pos + np.array([0, 1.3, 0], np.float32)
    cfg = SolverConfig(substeps=2, iterations=2, damping=0.02,
                       solve_mode=SolveMode.JACOBI, jacobi_rho=0.0,
                       lambda_mode=LambdaMode.RESET,
                       distance_backend="windowed",
                       enable_self_collision=True, particle_radius=0.3,
                       self_collision_backend="dense",
                       ground_height=0.0, friction=0.3)
    states = _make_body_states(pos, topo, 2, pins=(), poke=False)
    n_steps = 2
    ref_fn = general.make_step(topo, cfg, DT, n_steps=n_steps)
    refs = [ref_fn(s) for s in states]
    with pltpu.force_tpu_interpret_mode():
        fn = mesh_pallas.make_mesh_substep_runner(
            topo, cfg, DT / cfg.substeps, n_steps * cfg.substeps,
            block_edges=128, with_ext=True, n_bodies=2)
        out = fn(_batch(states))
    _assert_bodies_close(out, refs, tol_pos=5e-5)
    # the contact pass must actually fire per body
    ref_off = general.make_step(
        topo, cfg.replace(enable_self_collision=False), DT,
        n_steps=n_steps)(states[0])
    d_off = np.abs(np.asarray(refs[0].positions)
                   - np.asarray(ref_off.positions)).max()
    assert d_off > 1e-4, f"scene never makes contact (d={d_off})"
