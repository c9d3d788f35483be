"""Chain the stateful streaming tier to the driver-visible registry:
tests/test_streaming_incremental.py pins streaming ≡ inline batch folds;
here the SAME streams are pinned against the REGISTERED batch-parity
queries (stateful_running_count / stateful_running_sum / stateful_topk /
stateful_ewma), which the driver oracle-checks against DuckDB. Together:
driver ⇄ batch qname ⇄ streaming operator — the stateful tier gets full
CORRECTNESS visibility (round-6 verdict task #4).

Reference analog: ordered per-rank fold semantics, src/mapreduce.jl:138-146.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from parallelutilities_jl_spark.streaming import stateful as ST
from parallelutilities_jl_spark.streaming import windows as SW

N_BATCHES = 3


@pytest.fixture(scope="module")
def ts_sorted_table(sf_dir):
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    return t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))


def _run_stream(spark, ts_sorted_table, make_stream_query, qname):
    """Feed the ts-sorted fixture in N_BATCHES micro-batches through the
    stateful operator; return the LAST update-mode emission per key."""
    t = ts_sorted_table
    stage = tempfile.mkdtemp(prefix=f"pu_{qname}_")
    try:
        stream = (
            spark.readStream.schema(SW.EVENTS_STREAM_SCHEMA)
            .format("parquet")
            .load(stage)
        )
        q = (
            make_stream_query(stream.groupBy("user_id"))
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(qname)
            .start()
        )
        try:
            step = t.num_rows // N_BATCHES
            for i in range(N_BATCHES):
                hi = t.num_rows if i == N_BATCHES - 1 else (i + 1) * step
                pq.write_table(
                    t.slice(i * step, hi - i * step),
                    os.path.join(stage, f"b{i}.parquet"),
                )
                q.processAllAvailable()
            return spark.sql(f"SELECT * FROM {qname}").collect()
        finally:
            q.stop()
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def test_running_count_matches_registered_query(
    spark, sf_dir, ts_sorted_table
):
    rows = _run_stream(
        spark, ts_sorted_table, ST.running_count_per_key, "sp_count"
    )
    got = {r["user_id"]: r["n"] for r in rows}  # last emission wins
    # final row per key of the registered per-event cumulative query
    batch = ST.q_stateful_running_count(spark, sf_dir).collect()
    want: dict[int, int] = {}
    for r in batch:
        want[r["user_id"]] = max(want.get(r["user_id"], 0), r["n"])
    assert got == want and got


def test_running_sum_matches_registered_query(
    spark, sf_dir, ts_sorted_table
):
    rows = _run_stream(
        spark, ts_sorted_table, ST.running_sum_per_key, "sp_sum"
    )
    got = {r["user_id"]: r["n"] for r in rows}
    batch = ST.q_stateful_running_sum(spark, sf_dir).collect()
    want_n: dict[int, int] = {}
    want_e2: dict[int, int] = {}
    for r in batch:
        if r["n"] >= want_n.get(r["user_id"], 0):
            want_n[r["user_id"]] = r["n"]
            want_e2[r["user_id"]] = r["total_e2"]
    assert got == want_n and got
    # the streaming op accumulates raw doubles; the registered query is
    # e2-fixed-point — compare at e2 resolution (absorbs float assoc)
    got_e2 = {
        r["user_id"]: round(r["total"] * 100) for r in rows
    }
    for u, e2 in want_e2.items():
        assert abs(got_e2[u] - e2) <= len(batch), (u, got_e2[u], e2)


def test_topk_matches_registered_query(spark, sf_dir, ts_sorted_table):
    rows = _run_stream(
        spark, ts_sorted_table, ST.running_topk_per_key, "sp_topk"
    )
    got = {
        (r["user_id"], r["rnk"]): (r["event_id"], r["value"])
        for r in rows
    }
    want = {
        (r["user_id"], r["rnk"]): (r["event_id"], r["value"])
        for r in ST.q_stateful_topk(spark, sf_dir).collect()
    }
    assert got == want and got


def test_sessions_match_registered_query(spark, sf_dir, ts_sorted_table):
    rows = _run_stream(
        spark, ts_sorted_table, ST.running_sessions_per_key, "sp_sess"
    )
    got = {r["user_id"]: (r["n_sessions"], r["last_n"]) for r in rows}
    want = {
        r["user_id"]: (r["n_sessions"], r["last_n"])
        for r in ST.q_stateful_sessions(spark, sf_dir).collect()
    }
    assert got == want and got


def test_ewma_matches_registered_query(spark, sf_dir, ts_sorted_table):
    rows = _run_stream(
        spark, ts_sorted_table, ST.running_ewma_per_key, "sp_ewma"
    )
    got = {r["user_id"]: (r["n"], r["ewma_e6"]) for r in rows}
    want = {
        r["user_id"]: (r["n"], r["ewma_e6"])
        for r in ST.q_stateful_ewma(spark, sf_dir).collect()
    }
    assert got == want and got
