"""Long-horizon stability + drift artifact for the STREAMED kernel's
in-kernel per-cell tet sweep (the round-3 solid-body fused path).

Two legs on the res-40 braced solid lattice (356k tet constraints,
``solid_lattice`` scene config):

1. SOAK — 1M substeps (500 x 2000-substep fused calls) from the drop
   state; health gates: finite, floor rest (ymin ~ 0, height in a sane
   band), total tet volume within 5% of rest.
2. DRIFT — 10k substeps streamed vs the stencil engine from a SETTLED
   (quasi-static) state: chaotic regimes amplify fp noise identically in
   both engines and cannot be drift-validated (BENCHMARKS.md "Chaos
   caveat"), so the comparison starts after 480 settle substeps.

Emits one JSON line per leg; artifact: scripts/soak_solid_streamed.out.json.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

from softbodysimulation_tpu.core.config import (SolverConfig,  # noqa: E402
                                                SolveMode)
from softbodysimulation_tpu.solvers import lattice as lat  # noqa: E402
from softbodysimulation_tpu.topology import lattice  # noqa: E402
from softbodysimulation_tpu.topology import tets as T  # noqa: E402
from softbodysimulation_tpu.kernels import lattice_pallas  # noqa: E402


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    res = 40
    spec = lattice.lattice_spec(res, braced=True)
    cfg = SolverConfig(substeps=8, iterations=1, damping=0.02,
                       solve_mode=SolveMode.JACOBI,
                       gravity_is_acceleration=True, fast_math=True,
                       enable_tet_volume=True,
                       ground_height=0.0, friction=0.3)
    st0 = lat.make_lattice_state(spec, center=(0, 0.55, 0),
                                 mass=0.001, tet_volume=True)
    tt = T.cube_lattice_tets(res)
    v0 = float(T.tet_volumes6(
        np.asarray(st0.positions, np.float64), tt).sum())

    # ---- leg 1: 1M-substep soak
    L = 2000
    calls = 500
    fn = lattice_pallas.make_pallas_substep_runner_streamed(
        spec, cfg, 1 / 480., L)
    st = fn(st0)
    np.asarray(st.positions[0, 0])          # compile + sync
    t0 = time.time()
    for i in range(calls - 1):
        st = fn(st)
        if (i + 1) % 100 == 0:
            np.asarray(st.positions[0, 0])  # periodic host sync
    p = np.asarray(st.positions)
    wall = time.time() - t0
    ys = p[:, 1]
    vol = float(T.tet_volumes6(np.asarray(p, np.float64), tt).sum())
    ok = (bool(np.isfinite(p).all())
          and -1e-3 <= float(ys.min()) < 0.05
          and 0.7 < float(ys.max() - ys.min()) < 1.2
          and abs(vol / v0 - 1.0) < 0.05)
    emit(leg="soak_1m", substeps=calls * L, ok=ok,
         rate_ps=float(f"{spec.n_particles * calls * L / wall:.4g}"),
         ymin=float(f"{ys.min():.4g}"),
         height=float(f"{ys.max() - ys.min():.4g}"),
         vol_ratio=float(f"{vol / v0:.5g}"))

    # ---- leg 2: quasi-static 10k-substep drift vs the stencil engine
    settle = lat.make_substep_runner(spec, cfg, 1 / 480., 480)
    stq = settle(st0)
    drift_n = 10_000
    fn_k = lattice_pallas.make_pallas_substep_runner_streamed(
        spec, cfg, 1 / 480., drift_n)
    fn_x = lat.make_substep_runner(spec, cfg, 1 / 480., drift_n)
    pk = np.asarray(fn_k(stq).positions)
    px = np.asarray(fn_x(stq).positions)
    drift = float(np.abs(pk - px).max())
    vk = float(T.tet_volumes6(np.asarray(pk, np.float64), tt).sum())
    emit(leg="drift_10k_quasistatic", drift=float(f"{drift:.3g}"),
         ok=bool(np.isfinite(pk).all() and drift < 1e-3),
         vol_ratio_kernel=float(f"{vk / v0:.5g}"))


if __name__ == "__main__":
    main()
