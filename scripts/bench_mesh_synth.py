"""Same-run A/B: resident vs synthesized one-hot mesh kernel (bunny),
plus the large-mesh scale only the synthesized spelling can reach
(cloth_xl-class 129x129 grid, ~50k edges, auto-synth).

Expectation: on the bunny the resident matrices should win or tie (no
per-sweep rebuild); synth's value is the meshes the resident kernel
cannot compile at all.  Emits one JSON line per row.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: E402

from softbodysimulation_tpu.core.config import SolveMode, SolverConfig  # noqa: E402
from softbodysimulation_tpu.core.scenes import BUNNY_PATHS  # noqa: E402
from softbodysimulation_tpu.core.state import state_from_topology  # noqa: E402
from softbodysimulation_tpu.kernels import mesh_pallas  # noqa: E402
from softbodysimulation_tpu.topology import build, mesh  # noqa: E402
from softbodysimulation_tpu.topology.edges import unique_edges  # noqa: E402
from softbodysimulation_tpu.topology.objloader import load_obj  # noqa: E402

DT = 1.0 / 60.0
SUBSTEPS_PER_CALL = int(os.environ.get("BENCH_SUBSTEPS_PER_CALL", "2000"))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def measure(fn, st, n, work):
    out = fn(st)
    np.asarray(out.positions[0, 0])
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        out = fn(out)
        np.asarray(out.positions[0, 0])
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(np.asarray(out.positions)).all()
    return n * work / best, out


def main():
    cfg = SolverConfig(substeps=4, iterations=4, damping=0.02,
                       solve_mode=SolveMode.JACOBI, jacobi_rho=0.9,
                       distance_backend="windowed",
                       ground_height=0.0, friction=0.3)
    dt_sub = DT / cfg.substeps

    p = next((q for q in BUNNY_PATHS if os.path.exists(q)), None)
    if p:
        m = load_obj(p)
        pos, topo = build.build_windowed_topology(
            m.vertices, unique_edges(m.triangles), 1e-4,
            triangles=m.triangles)
        pos = pos + np.array([0, 1.0, 0], np.float32)
        st = state_from_topology(topo, pos)
        n = topo.n_particles
        outs = {}
        for name, synth in (("resident", False), ("synth", True)):
            fn = mesh_pallas.make_mesh_substep_runner(
                topo, cfg, dt_sub, SUBSTEPS_PER_CALL, with_ext=True,
                synth_gd=synth)
            rate, out = measure(fn, st, n, SUBSTEPS_PER_CALL)
            outs[name] = np.asarray(out.positions)
            emit(row=f"bunny_kernel_{name}", n=n, e=topo.n_edges,
                 particle_substeps_per_s=float(f"{rate:.4g}"))
        # after 1 identical warm call from the same start the two
        # spellings must agree bitwise (pinned in interpret mode by test;
        # this checks the REAL MXU path)
        fn_r = mesh_pallas.make_mesh_substep_runner(
            topo, cfg, dt_sub, SUBSTEPS_PER_CALL, with_ext=True,
            synth_gd=False)
        fn_s = mesh_pallas.make_mesh_substep_runner(
            topo, cfg, dt_sub, SUBSTEPS_PER_CALL, with_ext=True,
            synth_gd=True)
        d = float(np.abs(np.asarray(fn_r(st).positions)
                         - np.asarray(fn_s(st).positions)).max())
        emit(row="bunny_synth_vs_resident_drift_1call", drift=d)

    big = mesh.grid_plane(1.0, 130)
    pos2, topo2 = build.build_windowed_topology(
        big.vertices, unique_edges(big.triangles), 1e-4,
        triangles=big.triangles)
    pos2 = pos2 + np.array([0, 1.0, 0], np.float32)
    st2 = state_from_topology(topo2, pos2)
    plan = mesh_pallas.build_mesh_plan(topo2, cfg, dt_sub)
    emit(row="grid50k_plan", synth=plan.synth,
         vmem_mb=round(plan.vmem_bytes / 1e6, 2))
    fn2 = mesh_pallas.make_mesh_substep_runner(
        topo2, cfg, dt_sub, SUBSTEPS_PER_CALL, with_ext=True, plan=plan)
    rate2, _ = measure(fn2, st2, topo2.n_particles, SUBSTEPS_PER_CALL)
    emit(row="grid50k_kernel_synth", n=topo2.n_particles, e=topo2.n_edges,
         particle_substeps_per_s=float(f"{rate2:.4g}"))


if __name__ == "__main__":
    main()
