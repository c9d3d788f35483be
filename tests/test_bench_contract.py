"""The driver runs `python bench.py` per round and parses its stdout as
ONE JSON line with keys metric/value/unit/queries/sf — a broken print, a
stray stdout line, or a renamed key silently voids the round's perf
record. This smoke-runs the real CLI (subprocess, tiny SF, two queries,
one rep) and asserts the contract."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_cli_emits_single_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_REPS="1",
        SPARK_GRAFT_BENCH_ONLY="q1_pricing_summary,which_partition",
        SPARK_GRAFT_CPUS="4",
        # keep the committed full-run artifact intact — the test writes
        # its own 2-query detail to a scratch path
        SPARK_GRAFT_BENCH_DETAIL="/tmp/bench_detail_contract_test.json",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE stdout line, got: {lines}"
    d = json.loads(lines[0])
    assert {"metric", "value", "unit", "queries", "sf"} <= set(d)
    assert d["unit"] == "sec" and d["sf"] == 0.001
    assert set(d["queries"]) == {"q1_pricing_summary", "which_partition"}
    assert d["value"] > 0
    # round-6: spread/reps moved OFF the stdout line (the driver's
    # ~2000-char archive cut was eating the median map) into the
    # committed BENCH_DETAIL.json artifact
    assert "spread" not in d and "reps" not in d
    with open("/tmp/bench_detail_contract_test.json") as f:
        detail = json.load(f)
    assert detail["median"] == d["queries"]
    assert set(detail["spread"]) == set(d["queries"])
    assert detail["reps"] == 1


# --- canary-normalized performance gate (round-12 verdict item 5) ---
#
# The rig's wall clocks drift ~15% between boots, so the RAW common-63
# total can't gate regressions — the canary-normalized total
# (r06_common_total_norm = raw total * CANARY_REF_SEC / canary_sec)
# can, with a ±5% band for residual noise. Reference point: round 12's
# full sf0.1 run, 27.559 s (BENCH_r12.json / BENCH_DETAIL.json at
# commit 49315f0). PROTOCOL: when a committed full-run BENCH_DETAIL
# lands with a lower normalized total, move NORM_GATE_REF_SEC down to
# it (ratchet — never up without a verdict-visible justification in
# the commit message).
NORM_GATE_REF_SEC = 27.559
NORM_GATE_BAND = 1.05


def test_canary_normalized_common_total_within_band():
    """Gate the committed BENCH_DETAIL.json: a full sf0.1 artifact
    whose canary-normalized common-subset total exceeds the reference
    by more than the documented ±5% boot band is a real plan
    regression, not drift — fail the suite instead of spending a
    triage round (round-11/12 verdict ask)."""
    with open(os.path.join(REPO, "BENCH_DETAIL.json")) as f:
        d = json.load(f)
    if d.get("sf") != 0.1 or not d.get("r06_common_total_norm"):
        pytest.skip(
            "BENCH_DETAIL.json is not a full sf0.1 run — regenerate "
            "with `python bench.py` before committing it"
        )
    norm = d["r06_common_total_norm"]
    assert norm <= NORM_GATE_REF_SEC * NORM_GATE_BAND, (
        f"canary-normalized common-63 total {norm}s exceeds the "
        f"{NORM_GATE_REF_SEC}s reference by more than the ±5% boot "
        f"band — a real regression, not boot drift (canary_sec="
        f"{d.get('canary_sec')}, raw={d.get('r06_common_total')})"
    )
