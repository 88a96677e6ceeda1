"""The bench suite's timeout-proofing contract (VERDICT r04 next #1).

One driver timeout must never destroy the round's artifact again: the
full suite re-prints the cumulative JSON line after EVERY sub-bench and
skips sub-benches whose start would exceed --budget_s. These tests pin
that contract by running bench.py as a subprocess the way the driver
does and parsing stdout lines.
"""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow  # subprocess pays the full interpreter+jax import cost
def test_budget_zero_emits_cumulative_lines_and_skip_list():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py"), "--budget_s", "0"],
        capture_output=True, text=True, timeout=600, env=env, cwd=ROOT)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    # one cumulative emission per task, each a superset of the last
    assert len(lines) >= 10, out.stdout
    parsed = [json.loads(ln) for ln in lines]
    for prev, cur in zip(parsed, parsed[1:]):
        assert set(prev) <= set(cur)
        assert len(prev.get("skipped_over_budget", [])) \
            <= len(cur.get("skipped_over_budget", []))
    last = parsed[-1]
    # the driver parses the LAST line: it must carry the headline schema
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in last
    # every sub-bench was skipped (budget 0), in priority order with the
    # six must-record tasks first
    skipped = last["skipped_over_budget"]
    assert skipped[:6] == ["icka_bucketed", "gate_cl_bucketed",
                          "gate_cl_backbone", "gate_cl_packed", "train",
                          "e2e"]
