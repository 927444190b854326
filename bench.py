#!/usr/bin/env python
"""Headline benchmark: particle-substeps/sec at 64k particles, one chip.

Workload: braced res-40 lattice cube (40^3 = 64,000 particles, 13 offset
families ~ 790k distance constraints, particle mass 1 g so column loads are
physical) settling on a ground plane; RESET-mode XPBD, 1 iteration x 8
substeps per 1/60 s frame (the 'small steps' regime — light particles make
the constraints effectively rigid, so one pass/family converges).

Engine: the fused Pallas kernel — streamed (lane-padded, double-buffered
lambda slabs; the fastest 64k engine, BENCHMARKS.md) with the VMEM-resident
variant as fallback — when it compiles on this backend, else the XLA
stencil engine.  Timing is
synchronised by fetching data to host — ``block_until_ready`` alone is not a
reliable barrier on remote-execution backends.

Prints exactly one JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
vs_baseline is vs the 1e9 particle-steps/sec target (BASELINE.md) — the
reference itself publishes no numbers; its flagship scene's configured upper
bound is ~3.1e4 particle-steps/s (SURVEY §6).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _supervised_main() -> int:
    """Run the real benchmark in a child process with a watchdog.

    The axon remote-compile relay sporadically wedges: a compile RPC
    neither completes nor errors, hanging the process forever in a
    foreign socket read no in-process timeout can interrupt (observed
    repeatedly at round-3 close; a fresh process usually sails through).
    So the top-level invocation supervises: child attempts with a hard
    timeout, retried while wall budget remains, forwarding the child's
    single JSON line.  Opt out with BENCH_SUPERVISE=0 (the child runs
    with it set)."""
    budget = float(os.environ.get("BENCH_SUPERVISE_BUDGET", "2700"))
    attempt_timeout = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT", "1400"))
    env = dict(os.environ, BENCH_SUPERVISE="0")
    t0 = time.monotonic()
    attempt = 0
    while time.monotonic() - t0 < budget:
        attempt += 1
        left = budget - (time.monotonic() - t0)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, timeout=min(attempt_timeout, max(left, 60.0)),
                capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            print(f"# attempt {attempt}: wedged past the watchdog, "
                  f"retrying", file=sys.stderr)
            continue
        lines = [ln for ln in proc.stdout.splitlines()
                 if ln.startswith("{")]
        if proc.returncode == 0 and lines:
            print(lines[-1])
            return 0
        print(f"# attempt {attempt}: rc={proc.returncode}\n"
              + proc.stderr[-2000:], file=sys.stderr)
    print("# benchmark failed within the supervision budget",
          file=sys.stderr)
    return 1

import jax  # noqa: E402

# Hermetic smoke mode (also exercises the supervisor's success path in
# tests): the ambient axon site registration overrides JAX_PLATFORMS, so
# CPU must be forced in-process before any backend init.
if os.environ.get("BENCH_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from softbodysimulation_tpu import (  # noqa: E402
    LambdaMode,
    SolveMode,
    SolverConfig,
)
from softbodysimulation_tpu.kernels import lattice_pallas  # noqa: E402
from softbodysimulation_tpu.solvers import lattice as lat_engine  # noqa: E402
from softbodysimulation_tpu.topology import lattice  # noqa: E402

BASELINE = 1.0e9  # particle-substeps/sec target on one v5e chip

RES = int(os.environ.get("BENCH_RES", "40"))
DT = 1.0 / 60.0
SUBSTEPS = int(os.environ.get("BENCH_SUBSTEPS", "8"))
SUBSTEPS_PER_CALL = int(os.environ.get("BENCH_SUBSTEPS_PER_CALL", "2000"))
TARGET_SECONDS = float(os.environ.get("BENCH_SECONDS", "5.0"))
FORCE_ENGINE = os.environ.get("BENCH_ENGINE", "")  # "", "pallas", "xla"


def build():
    spec = lattice.lattice_spec(RES, braced=True)
    cfg = SolverConfig(
        substeps=SUBSTEPS,
        iterations=1,
        damping=0.02,
        solve_mode=SolveMode.JACOBI,
        # light particles make compliance negligible vs inverse masses, so a
        # single RESET Jacobi pass already closes ~50% of C per family —
        # warm-starting is unnecessary here (and dynamically unstable in the
        # near-rigid regime; see SolverConfig.warm_start_clamp)
        lambda_mode=LambdaMode.RESET,
        gravity_is_acceleration=True,
        fast_math=True,
        ground_height=0.0,
        friction=0.3,
    )
    state = lat_engine.make_lattice_state(spec, center=(0.0, 0.6, 0.0),
                                          mass=0.001)
    return spec, cfg, state


# total wall budget: a COLD Mosaic compile of the Pallas kernel can take
# ~10 min through the remote-compile relay; the XLA engine compiles in
# ~30 s (but the relay occasionally takes minutes for it too).  We measure
# XLA first (a guaranteed result), then spend remaining budget trying to
# beat it with the Pallas kernel — the budget must leave room for the
# pallas attempt even after a slow XLA phase, or the headline silently
# falls back to the slower engine.
BUDGET_SECONDS = float(os.environ.get("BENCH_BUDGET", "1500"))
PALLAS_COMPILE_ALLOWANCE = 700.0


def measure(step, state, n):
    calls = 0
    t0 = time.perf_counter()
    while True:
        state = step(state)
        calls += 1
        # sync by host fetch, but only every few calls: the relay adds
        # ~10-30 ms latency per fetch
        if calls % 10 == 0:
            np.asarray(state.positions[0, 0])
            if time.perf_counter() - t0 >= TARGET_SECONDS:
                break
    p = np.asarray(state.positions)  # full fetch + final sync
    elapsed = time.perf_counter() - t0
    # sanity: simulation must have stayed healthy or the number is void.
    # Explicit raises (not assert): the health gates must survive python -O.
    if not np.isfinite(p).all():
        raise RuntimeError("non-finite state after benchmark")
    if p[:, 1].min() <= -1e-2:
        raise RuntimeError("floor violated after benchmark")
    height = p[:, 1].max() - p[:, 1].min()
    if height <= 0.5:
        raise RuntimeError(f"cube degenerated during benchmark: {height}")
    return n * calls * SUBSTEPS_PER_CALL / elapsed


def main():
    t_start = time.perf_counter()
    spec, cfg, state = build()
    dt_sub = DT / SUBSTEPS
    n = spec.n_particles

    results = {}
    xla_warm_pos = None
    if FORCE_ENGINE != "pallas":
        fn = lat_engine.make_substep_runner(spec, cfg, dt_sub,
                                            SUBSTEPS_PER_CALL)
        warm = fn(state)
        xla_warm_pos = np.asarray(warm.positions)
        results["xla"] = measure(fn, warm, n)

    remaining = BUDGET_SECONDS - (time.perf_counter() - t_start)
    if FORCE_ENGINE != "xla" and (
            FORCE_ENGINE == "pallas"
            or remaining > PALLAS_COMPILE_ALLOWANCE):
        # streamed first: with lane padding it covers res 40 and beats both
        # the resident kernel and the XLA stencil there (same-run A/B on
        # hardware: 2.02e9 approx / 1.83e9 exact vs resident 1.30e9 vs XLA
        # 1.35e9 — BENCHMARKS.md).  The approx_math variant (rsqrt +
        # approximate reciprocal) is validated against the XLA trajectory
        # below before its number is accepted; resident is the fallback
        # for backends where the streamed kernel fails to compile.
        candidates = (
            ("pallas_streamed_approx",
             lambda *a: lattice_pallas.make_pallas_substep_runner_streamed(
                 *a, approx_math=True)),
            ("pallas_streamed",
             lattice_pallas.make_pallas_substep_runner_streamed),
            ("pallas", lattice_pallas.make_pallas_substep_runner),
        )
        for name, maker in candidates:
            try:
                fn = maker(spec, cfg, dt_sub, SUBSTEPS_PER_CALL)
                warm = fn(state)
                wp = np.asarray(warm.positions)  # compile + execute
                if xla_warm_pos is not None:
                    # same 2000-substep rollout from the same start: the
                    # kernel must track the XLA engine or its number is void
                    # (explicit raise so the gate survives python -O)
                    drift = float(np.abs(wp - xla_warm_pos).max())
                    if drift >= 1e-3:
                        raise RuntimeError(
                            f"{name} diverges from xla engine: {drift}")
                results[name] = measure(fn, warm, n)
                break
            except Exception as e:  # noqa: BLE001 — compile/runtime failure
                print(f"# {name} engine unavailable "
                      f"({type(e).__name__}: {e})", file=sys.stderr)
        else:
            if FORCE_ENGINE == "pallas":
                raise RuntimeError("no pallas engine compiled")

    engine, value = max(results.items(), key=lambda kv: kv[1])
    print(json.dumps({
        "metric": f"particle_substeps_per_sec_64k_1chip_{engine}",
        "value": float(f"{value:.4g}"),
        "unit": "particle-substeps/s",
        "vs_baseline": float(f"{value / BASELINE:.4g}"),
    }))


if __name__ == "__main__":
    if os.environ.get("BENCH_SUPERVISE", "1") != "0":
        sys.exit(_supervised_main())
    main()
