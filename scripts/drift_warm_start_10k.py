"""10k-step WARM_START drift vs the frozen CPU truth (verdict r3 item 5).

Same quasi-static hanging-bunny fixed point as ``drift_bunny_10k.py``
(the regime where drift measures engine fidelity rather than chaos), but
with the shipped ``entry()`` lambda mode: WARM_START, lambda_decay=1.0
(``__graft_entry__.py``).  The oracle side is the opted-in WARM_START
extension of the frozen solver (``reference_cpu.ReferenceSolver(...,
warm_start=True)``; scalar-vs-vectorized bitwise equality pinned by
``tests/test_fast_oracle.py::test_bitwise_equal_warm_start_mode``), the
engine side is general COLORED — the oracle-comparable mode.  Unlike
RESET/DECAY the warm pre-application's per-particle accumulation order is
not bitwise-replayable (incidence-slot vs edge order), so the expected
drift floor is ulp-noise-in-a-contracting-regime rather than exact replay.

Writes one JSON line per checkpoint to drift_warm_start_10k.out.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from softbodysimulation_tpu import (
    LambdaMode,
    SolveMode,
    SolverConfig,
    state_from_topology,
)
from softbodysimulation_tpu.core.scenes import BUNNY_PATHS
from softbodysimulation_tpu.solvers import fast_oracle, general
from softbodysimulation_tpu.topology import build
from softbodysimulation_tpu.topology import edges as tedges
from softbodysimulation_tpu.topology.objloader import load_obj

OUT = os.path.join(os.path.dirname(__file__), "drift_warm_start_10k.out.json")
DT = 0.02
STEPS = 10_000


def main():
    path = next((p for p in BUNNY_PATHS if os.path.exists(p)), None)
    assert path, "bunny asset absent"
    m = load_obj(path)
    e = tedges.unique_edges(m.triangles)
    pos = (m.vertices * 5.0).astype(np.float32)
    pos[:, 1] -= pos[:, 1].min()
    topo = build.build_topology(pos, e, 1e-10)
    ytop = pos[:, 1].max()
    inv_mass = np.where(pos[:, 1] > ytop - 0.6, 0.0, 1.0).astype(np.float32)
    cfg = SolverConfig(substeps=1, iterations=15, damping=0.2,
                      solve_mode=SolveMode.COLORED, max_dlambda=1e-3,
                      lambda_mode=LambdaMode.WARM_START, lambda_decay=1.0,
                      enable_bending=False,
                      gravity=(0, -1.0, 0),
                      ground_height=-100.0, friction=0.5)
    st = state_from_topology(topo, pos, inv_mass=inv_mass)
    orc = fast_oracle.FastReferenceSolver(
        pos, np.asarray(topo.edges), np.asarray(topo.rest_lengths),
        np.asarray(topo.compliance), inv_mass, cfg,
        colors=np.asarray(topo.colors), warm_start=True)
    step = jax.jit(general.make_step(topo, cfg, DT, n_steps=1))

    t0 = time.time()
    worst = 0.0
    with open(OUT, "w") as f:
        for i in range(1, STEPS + 1):
            st = step(st)
            orc.step(DT)
            if i % 250 == 0 or i == STEPS:
                d = float(np.abs(np.asarray(st.positions) - orc.x).max())
                worst = max(worst, d)
                rec = {"step": i, "drift": d, "worst": worst,
                       "elapsed_s": round(time.time() - t0, 1)}
                f.write(json.dumps(rec) + "\n")
                f.flush()
                print(rec, flush=True)
    final = float(np.abs(np.asarray(st.positions) - orc.x).max())
    ok = final <= 1e-3 and np.isfinite(orc.x).all()
    with open(OUT, "a") as f:
        f.write(json.dumps({"final_drift": final, "transient_worst": worst,
                            "pass": bool(ok),
                            "particles": int(len(pos)),
                            "edges": int(len(np.asarray(topo.edges))),
                            "lambda_mode": "warm_start",
                            "steps": STEPS}) + "\n")
    print("PASS" if ok else "FAIL", "final drift", final,
          "transient worst", worst)


if __name__ == "__main__":
    main()
