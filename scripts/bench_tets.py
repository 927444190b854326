"""Same-run A/B: the per-tet volume family (round-3 capability) on the
solid jelly-cube workload — general engine (windowed distance + gather
tets) vs the fused mesh kernel's in-kernel tet sweep, single instance and
a small ensemble farm.

Workload: res^3 tet lattice (Kuhn 6-tet cells, ``topology/tets.py``),
distance constraints on the tet edges, incompressible per-tet volume
(compliance 0), floor contact, 4 substeps x 4 Chebyshev iterations — the
wired-up version of the reference's commented AddVolumeConstraints
(``SoftBodySimulator.cs:187-212``).  Prints one JSON line per row.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from softbodysimulation_tpu import (  # noqa: E402
    SolveMode,
    SolverConfig,
    state_from_topology,
)
from softbodysimulation_tpu.kernels import mesh_pallas  # noqa: E402
from softbodysimulation_tpu.ops.tet_volume import tet_volumes6  # noqa: E402
from softbodysimulation_tpu.solvers import general  # noqa: E402
from softbodysimulation_tpu.topology import build, lattice  # noqa: E402
from softbodysimulation_tpu.topology import tets as T  # noqa: E402

DT = 1.0 / 60.0
RES = int(os.environ.get("BENCH_TET_RES", "12"))
SUBSTEPS_PER_CALL = int(os.environ.get("BENCH_SUBSTEPS_PER_CALL", "2000"))
FARM = int(os.environ.get("BENCH_TET_FARM", "16"))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def measure(fn, state, n, work, repeats=5):
    out = fn(state)
    np.asarray(out.positions)          # compile + sync
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(out)
        np.asarray(out.positions.reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return n * work / best, out


def main():
    import jax.numpy as jnp  # noqa: E402

    pos0 = lattice.lattice_points(RES) + np.array([0, 1.0, 0])
    tt = T.fix_orientation(pos0, T.cube_lattice_tets(RES))
    pos, topo = build.build_windowed_topology(
        pos0, T.tet_edges(tt), 1e-4, tets=tt, tet_compliance=0.0,
        triangles=T.boundary_faces(tt))
    cfg = SolverConfig(substeps=4, iterations=4, damping=0.02,
                       solve_mode=SolveMode.JACOBI,
                       enable_tet_volume=True,
                       distance_backend="windowed",
                       ground_height=0.0, friction=0.3)
    st = state_from_topology(topo, pos)
    n = topo.n_particles
    dt_sub = DT / cfg.substeps
    emit(row="workload", n=n, e=topo.n_edges, tets=topo.n_tets, res=RES)

    # --- XLA general engine (windowed distance + gather tet sweeps)
    xla_steps = 50
    fn_x = general.make_step(topo, cfg, DT, n_steps=xla_steps)
    rate_x, _ = measure(fn_x, st, n, xla_steps * cfg.substeps)
    emit(row="tet_cube_xla", particle_substeps_per_s=float(f"{rate_x:.4g}"))

    # --- XLA general engine, WINDOWED tet sweeps (signed 4-endpoint
    # one-hot MXU matmuls over topo.tet_windows — general._solve_tets_
    # windowed): same-run vs the gather row above
    if topo.tet_windows is not None:
        try:
            fn_xw = general.make_step(
                topo, cfg.replace(tet_backend="windowed"), DT,
                n_steps=xla_steps)
            rate_xw, _ = measure(fn_xw, st, n, xla_steps * cfg.substeps)
            emit(row="tet_cube_xla_windowed_tets",
                 particle_substeps_per_s=float(f"{rate_xw:.4g}"),
                 speedup_vs_gather_tets=float(f"{rate_xw / rate_x:.3g}"))
        except Exception as e:  # noqa: BLE001
            emit(row="tet_cube_xla_windowed_tets", ok=False,
                 err=f"{type(e).__name__}: {str(e)[:200]}")

    # --- validation horizon: kernel must track the engine AND conserve
    # volume (an absolute physical gate, immune to fp-chaos arguments).
    # The trajectory gate is SELF-CALIBRATING like bench_mesh_kernel's:
    # stiff XPBD + Chebyshev amplifies ulp-level rounding explosively on
    # hardware, so the yardstick is the XLA engine's OWN spread between
    # its two distance formulations (gather vs windowed) at the same
    # horizon.
    import dataclasses  # noqa: E402

    fn_x_val = general.make_step(topo, cfg, DT, n_steps=15)
    ref = fn_x_val(st)
    ref_pos = np.asarray(ref.positions)
    v0 = float(np.asarray(topo.rest_tet_volumes).sum())
    cfg_g = dataclasses.replace(cfg, distance_backend="gather")
    spread = float(np.abs(np.asarray(
        general.make_step(topo, cfg_g, DT, n_steps=15)(st).positions)
        - ref_pos).max())
    gate = max(3.0 * spread, 1e-3)
    emit(row="control_xla_gather_vs_windowed_60sub",
         drift=float(f"{spread:.3g}"), gate=float(f"{gate:.3g}"))

    for approx in (False, True):
        tag = "approx" if approx else "exact"
        try:
            fn_p_val = mesh_pallas.make_mesh_substep_runner(
                topo, cfg, dt_sub, 15 * cfg.substeps,
                with_ext=True, approx_math=approx, block_edges=256)
            outv = fn_p_val(st)
            wp = np.asarray(outv.positions)
            drift = float(np.abs(wp - ref_pos).max())
            vol = float(np.asarray(
                tet_volumes6(jnp.asarray(wp), topo.tets)).sum())
            if not np.isfinite(wp).all():
                raise RuntimeError("non-finite kernel output")
            if drift >= gate:
                raise RuntimeError(
                    f"kernel drift {drift} exceeds the XLA backends' own "
                    f"spread gate {gate}")
            if abs(vol / v0 - 1.0) > 0.02:
                raise RuntimeError(f"volume ratio {vol / v0} off by > 2%")
            fn_p = mesh_pallas.make_mesh_substep_runner(
                topo, cfg, dt_sub, SUBSTEPS_PER_CALL,
                with_ext=True, approx_math=approx, block_edges=256)
            t0 = time.perf_counter()
            np.asarray(fn_p(st).positions)
            compile_s = time.perf_counter() - t0
            rate_p, _ = measure(fn_p, st, n, SUBSTEPS_PER_CALL)
            emit(row=f"tet_cube_kernel_{tag}",
                 particle_substeps_per_s=float(f"{rate_p:.4g}"),
                 drift_vs_xla_60sub=float(f"{drift:.3g}"),
                 vol_ratio=float(f"{vol / v0:.5g}"),
                 compile_s=round(compile_s, 1),
                 speedup_vs_xla=float(f"{rate_p / rate_x:.3g}"))
        except Exception as e:  # noqa: BLE001
            emit(row=f"tet_cube_kernel_{tag}", ok=False,
                 err=f"{type(e).__name__}: {str(e)[:200]}")

    # --- solid 64k STENCIL lattice: per-cell tets as 6 offset families
    # (rolls, no gathers) on the res-40 braced lattice — tets-on vs
    # tets-off same-run (the marginal cost of solid-body physics at the
    # flagship scale), plus volume conservation as the physical gate
    from softbodysimulation_tpu.solvers import lattice as lat_engine  # noqa: E402
    from softbodysimulation_tpu.topology import lattice as lattice_mod  # noqa: E402

    res_l = int(os.environ.get("BENCH_TET_LATTICE_RES", "40"))
    spec_l = lattice_mod.lattice_spec(res_l, braced=True)
    cfg_l = SolverConfig(substeps=8, iterations=1, damping=0.02,
                         solve_mode=SolveMode.JACOBI,
                         gravity_is_acceleration=True, fast_math=True,
                         enable_tet_volume=True,
                         ground_height=0.0, friction=0.3)
    st_l = lat_engine.make_lattice_state(spec_l, center=(0, 0.55, 0),
                                         mass=0.001, tet_volume=True)
    n_l = spec_l.n_particles
    Ls = 400
    fn_off = lat_engine.make_substep_runner(
        spec_l, cfg_l.replace(enable_tet_volume=False), 1 / 480., Ls)
    st_off = lat_engine.make_lattice_state(spec_l, center=(0, 0.55, 0),
                                           mass=0.001)
    rate_off, _ = measure(fn_off, st_off, n_l, Ls, repeats=3)
    emit(row=f"lattice{res_l}_stencil_tets_off",
         particle_substeps_per_s=float(f"{rate_off:.4g}"))
    try:
        fn_on = lat_engine.make_substep_runner(spec_l, cfg_l, 1 / 480., Ls)
        rate_on, out_on = measure(fn_on, st_l, n_l, Ls, repeats=3)
        tt_l = T.cube_lattice_tets(res_l)
        v0_l = float(T.tet_volumes6(
            np.asarray(st_l.positions, np.float64), tt_l).sum())
        v_l = float(T.tet_volumes6(
            np.asarray(out_on.positions, np.float64), tt_l).sum())
        emit(row=f"lattice{res_l}_stencil_tets_on",
             particle_substeps_per_s=float(f"{rate_on:.4g}"),
             n_tets=6 * (res_l - 1) ** 3,
             vol_ratio=float(f"{v_l / v0_l:.5g}"),
             cost_vs_tets_off=float(f"{rate_off / rate_on:.3g}"))
    except Exception as e:  # noqa: BLE001
        emit(row=f"lattice{res_l}_stencil_tets_on", ok=False,
             err=f"{type(e).__name__}: {str(e)[:200]}")

    # --- streamed Pallas kernel with the in-kernel tet sweep (round-3
    # late addition): same workload, same-run vs the stencil rows above.
    # Gates: short-horizon drift vs the stencil engine + absolute volume
    # conservation (float64 rest volume yardstick).
    from softbodysimulation_tpu.kernels import lattice_pallas  # noqa: E402

    try:
        ref_l = np.asarray(lat_engine.make_substep_runner(
            spec_l, cfg_l, 1 / 480., 60)(st_l).positions)
        tt_l = T.cube_lattice_tets(res_l)
        v0_l = float(T.tet_volumes6(
            np.asarray(st_l.positions, np.float64), tt_l).sum())
    except Exception as e:  # noqa: BLE001
        ref_l = None
        emit(row="streamed_tets_ref", ok=False,
             err=f"{type(e).__name__}: {str(e)[:200]}")
    for approx in (False, True):
        tag = "approx" if approx else "exact"
        try:
            fn_sv = lattice_pallas.make_pallas_substep_runner_streamed(
                spec_l, cfg_l, 1 / 480., 60, approx_math=approx)
            sp = np.asarray(fn_sv(st_l).positions)
            if not np.isfinite(sp).all():
                raise RuntimeError("non-finite kernel output")
            drift = (float(np.abs(sp - ref_l).max())
                     if ref_l is not None else -1.0)
            if ref_l is not None and drift >= 1e-3:
                raise RuntimeError(
                    f"streamed-tet drift {drift} vs stencil >= 1e-3")
            v_s = float(T.tet_volumes6(np.asarray(sp, np.float64),
                                       tt_l).sum())
            if abs(v_s / v0_l - 1.0) > 0.02:
                raise RuntimeError(f"volume ratio {v_s / v0_l} off by > 2%")
            fn_s = lattice_pallas.make_pallas_substep_runner_streamed(
                spec_l, cfg_l, 1 / 480., Ls, approx_math=approx)
            rate_s, _ = measure(fn_s, st_l, n_l, Ls, repeats=3)
            emit(row=f"lattice{res_l}_streamed_tets_{tag}",
                 particle_substeps_per_s=float(f"{rate_s:.4g}"),
                 drift_vs_stencil_60sub=float(f"{drift:.3g}"),
                 vol_ratio=float(f"{v_s / v0_l:.5g}"),
                 speedup_vs_stencil=float(f"{rate_s / rate_on:.3g}"))
        except Exception as e:  # noqa: BLE001
            emit(row=f"lattice{res_l}_streamed_tets_{tag}", ok=False,
                 err=f"{type(e).__name__}: {str(e)[:200]}")

    # --- ensemble farm: FARM bodies on the sublane axis vs vmapped XLA
    if FARM > 1:
        import jax  # noqa: E402

        def stack(a):
            return jnp.stack([jnp.asarray(a)] * FARM)

        batched = st.replace(
            positions=stack(st.positions), velocities=stack(st.velocities),
            ext_force=stack(st.ext_force),
            lambda_dist=stack(st.lambda_dist),
            lambda_bend=stack(st.lambda_bend),
            lambda_tet=stack(st.lambda_tet))
        xla_farm_steps = 20
        # vmapped XLA: every leaf broadcast to (FARM, ...) (scalar
        # lambda_volume and inv_mass included — vmap maps all leaves)
        full = jax.tree.map(
            lambda x: jnp.broadcast_to(jnp.asarray(x),
                                       (FARM,) + np.shape(x)), st)
        fn_xf = jax.jit(jax.vmap(
            lambda s: general.multi_step_fn(s, topo, cfg, DT,
                                            xla_farm_steps)))
        try:
            rate_xf, _ = measure(fn_xf, full, n * FARM,
                                 xla_farm_steps * cfg.substeps, repeats=3)
            emit(row=f"tet_farm_x{FARM}_xla_vmap",
                 particle_substeps_per_s=float(f"{rate_xf:.4g}"))
        except Exception as e:  # noqa: BLE001
            rate_xf = None
            emit(row=f"tet_farm_x{FARM}_xla_vmap", ok=False,
                 err=f"{type(e).__name__}: {str(e)[:200]}")
        for approx in (False, True):
            tag = "approx" if approx else "exact"
            try:
                fn_pf = mesh_pallas.make_mesh_substep_runner(
                    topo, cfg, dt_sub, SUBSTEPS_PER_CALL, with_ext=True,
                    approx_math=approx, block_edges=256, n_bodies=FARM)
                rate_pf, _ = measure(fn_pf, batched, n * FARM,
                                     SUBSTEPS_PER_CALL, repeats=3)
                row = dict(row=f"tet_farm_x{FARM}_kernel_{tag}",
                           particle_substeps_per_s=float(f"{rate_pf:.4g}"))
                if rate_xf:
                    row["speedup_vs_vmap"] = float(
                        f"{rate_pf / rate_xf:.3g}")
                emit(**row)
            except Exception as e:  # noqa: BLE001
                emit(row=f"tet_farm_x{FARM}_kernel_{tag}", ok=False,
                     err=f"{type(e).__name__}: {str(e)[:200]}")

    # --- round-5 CARRY tet spelling: res-48 DECAY x 2-iteration solid —
    # the carried lifecycle the round-4 lean spelling refused at res > 40
    # — streamed kernel (carry: per-path multiplier planes revolve
    # through HBM) vs the stencil engine same-run (verdict item 6's
    # done-criterion row)
    res_c = int(os.environ.get("BENCH_TET_CARRY_RES", "48"))
    spec_c = lattice_mod.lattice_spec(res_c, braced=True)
    from softbodysimulation_tpu.core.config import LambdaMode  # noqa: E402

    cfg_c = SolverConfig(substeps=8, iterations=2, damping=0.02,
                         solve_mode=SolveMode.JACOBI,
                         lambda_mode=LambdaMode.DECAY, lambda_decay=0.98,
                         gravity_is_acceleration=True, fast_math=True,
                         enable_tet_volume=True,
                         ground_height=0.0, friction=0.3)
    st_c = lat_engine.make_lattice_state(spec_c, center=(0, 0.55, 0),
                                         mass=0.001, tet_volume=True)
    n_c = spec_c.n_particles
    Lc = 200
    try:
        fn_cs = lat_engine.make_substep_runner(spec_c, cfg_c, 1 / 480., Lc)
        rate_cs, _ = measure(fn_cs, st_c, n_c, Lc, repeats=3)
        emit(row=f"lattice{res_c}_decay2_stencil",
             particle_substeps_per_s=float(f"{rate_cs:.4g}"))
        # validation: short-horizon drift + volume conservation
        ref_c = np.asarray(lat_engine.make_substep_runner(
            spec_c, cfg_c, 1 / 480., 40)(st_c).positions)
        tt_c = T.cube_lattice_tets(res_c)
        v0_c = float(T.tet_volumes6(
            np.asarray(st_c.positions, np.float64), tt_c).sum())
        fn_cv = lattice_pallas.make_pallas_substep_runner_streamed(
            spec_c, cfg_c, 1 / 480., 40)
        sp_c = np.asarray(fn_cv(st_c).positions)
        drift_c = float(np.abs(sp_c - ref_c).max())
        if not np.isfinite(sp_c).all() or drift_c >= 1e-3:
            raise RuntimeError(f"carry-tet drift {drift_c} vs stencil")
        v_c = float(T.tet_volumes6(np.asarray(sp_c, np.float64),
                                   tt_c).sum())
        if abs(v_c / v0_c - 1.0) > 0.02:
            raise RuntimeError(f"volume ratio {v_c / v0_c} off by > 2%")
        fn_ck = lattice_pallas.make_pallas_substep_runner_streamed(
            spec_c, cfg_c, 1 / 480., Lc)
        rate_ck, _ = measure(fn_ck, st_c, n_c, Lc, repeats=3)
        emit(row=f"lattice{res_c}_decay2_streamed_carry",
             particle_substeps_per_s=float(f"{rate_ck:.4g}"),
             drift_vs_stencil_40sub=float(f"{drift_c:.3g}"),
             vol_ratio=float(f"{v_c / v0_c:.5g}"),
             speedup_vs_stencil=float(f"{rate_ck / rate_cs:.3g}"))
    except Exception as e:  # noqa: BLE001
        emit(row=f"lattice{res_c}_decay2_streamed_carry", ok=False,
             err=f"{type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
