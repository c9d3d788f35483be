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
