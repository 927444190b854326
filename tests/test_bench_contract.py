"""bench.py contract: exactly one JSON line on stdout, supervised.

The driver records bench.py's stdout as the round artifact, so the
contract (one JSON line with metric/value/unit/vs_baseline, health gates
enforced) is pinned here hermetically via the CPU smoke mode.  The
supervisor wrapper (watchdog + retry around the wedge-prone remote
compile relay) is exercised on its success path: the child runs the real
measurement and the parent forwards its line verbatim.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")

SMOKE_ENV = {
    "BENCH_PLATFORM": "cpu",
    "BENCH_RES": "8",
    "BENCH_SUBSTEPS_PER_CALL": "40",
    "BENCH_SECONDS": "0.3",
    "BENCH_ENGINE": "xla",
}


@pytest.mark.parametrize("supervised", [True, False])
def test_bench_prints_exactly_one_json_line(supervised):
    env = dict(os.environ, **SMOKE_ENV)
    if not supervised:
        env["BENCH_SUPERVISE"] = "0"
    out = subprocess.run([sys.executable, BENCH], env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, out.stdout
    row = json.loads(lines[0])
    assert set(row) == {"metric", "value", "unit", "vs_baseline"}
    assert row["value"] > 0 and row["unit"] == "particle-substeps/s"


def test_bench_supervisor_kills_wedged_child_and_fails_cleanly():
    # a child that cannot produce output within the watchdog window is
    # killed and retried until the budget runs out; rc=1, stdout empty
    env = dict(os.environ, **SMOKE_ENV)
    env.update(BENCH_SECONDS="600",          # child would run ~10 min
               BENCH_ATTEMPT_TIMEOUT="5", BENCH_SUPERVISE_BUDGET="12")
    out = subprocess.run([sys.executable, BENCH], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 1
    assert not [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert "wedged past the watchdog" in out.stderr
