"""Multi-batch Structured Streaming: state must evolve correctly ACROSS
micro-batches, not just within one. The single-batch stream≡batch tests
in test_streaming.py feed the whole fixture in one trigger, which never
exercises cross-trigger state merge (windows accumulating over batches,
session windows spanning a batch boundary) or watermark-based late-data
dropping — the semantics that matter on a real unbounded stream. Analog
of the reference's parallel-vs-serial equivalence re-run across worker
counts (reference test/paralleltests.jl:488-545 + test/singlehost.jl:7-15):
here the "worker count" axis is the micro-batch split of the same input.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from parallelutilities_jl_spark.sources.fixtures import load_table
from parallelutilities_jl_spark.streaming import windows as SW

N_BATCHES = 4


@pytest.fixture(scope="module")
def ts_sorted_table(sf_dir):
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    return t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))


def _feed(stage: str, table, lo: int, hi: int, seq: int) -> None:
    """Append rows [lo, hi) of the ts-sorted fixture as one new file in
    the watched directory — one file == one future micro-batch."""
    pq.write_table(table.slice(lo, hi - lo), os.path.join(stage, f"b{seq}.parquet"))


def _stream_from(spark, stage: str):
    return (
        spark.readStream.schema(SW.EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .load(stage)
    )


def _norm(rows):
    return sorted(tuple(r) for r in rows)


@pytest.mark.parametrize(
    "make_query,mode",
    [
        (SW.tumbling_counts, "complete"),
        (SW.session_agg, "complete"),
    ],
    ids=["tumbling", "session"],
)
def test_incremental_batches_equal_batch(
    spark, sf_dir, ts_sorted_table, make_query, mode
):
    """Feed the fixture in N_BATCHES in-order micro-batches (one file per
    trigger, processAllAvailable between feeds so batch boundaries are
    deterministic); the final result must equal the one-shot batch plan.
    Sessions and hour-windows straddle the slice points, so this fails if
    cross-trigger state merge is wrong."""
    t = ts_sorted_table
    stage = tempfile.mkdtemp(prefix="pu_events_incr_")
    try:
        name = f"t_incr_{make_query.__name__}"
        q = (
            make_query(_stream_from(spark, stage))
            .writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            step = t.num_rows // N_BATCHES
            for i in range(N_BATCHES):
                hi = t.num_rows if i == N_BATCHES - 1 else (i + 1) * step
                _feed(stage, t, i * step, hi, i)
                q.processAllAvailable()  # force a batch boundary here
            got = spark.sql(f"SELECT * FROM {name}").collect()
        finally:
            q.stop()
        want = make_query(
            load_table(spark, sf_dir, "events"), watermark=False
        ).collect()
        assert _norm(got) == _norm(want)
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def test_watermark_drops_late_batch(spark, sf_dir, ts_sorted_table):
    """Late-data semantics: feed the NEWEST half first (advancing the
    watermark to max_ts - 10 min), then the OLDEST quarter — every row of
    which is now days behind the watermark. Append-mode tumbling counts
    must (a) emit exactly the closed windows of the first feed and
    (b) emit nothing for the late batch's windows, even though a batch
    recompute over all data would include them."""
    t = ts_sorted_table
    n = t.num_rows
    stage = tempfile.mkdtemp(prefix="pu_events_late_")
    try:
        q = (
            SW.tumbling_counts(_stream_from(spark, stage))
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("t_late")
            .start()
        )
        try:
            _feed(stage, t, n // 2, n, 0)  # newest half
            q.processAllAvailable()
            _feed(stage, t, 0, n // 4, 1)  # oldest quarter: all late
            q.processAllAvailable()
            got = spark.sql("SELECT * FROM t_late").collect()
        finally:
            q.stop()

        ev = load_table(spark, sf_dir, "events").orderBy("ts")
        rows = ev.collect()
        fresh, late = rows[n // 2 :], rows[: n // 4]
        # watermark after the first feed (event time, UTC)
        wm = max(r["ts"] for r in fresh).timestamp() - 600
        # expected = batch tumbling over the fresh half, windows closed by wm
        want = [
            r
            for r in SW.tumbling_counts(
                spark.createDataFrame(fresh, ev.schema), watermark=False
            ).collect()
            if r["win_start"] + 3600 <= wm
        ]
        assert len(want) > 0
        assert _norm(got) == _norm(want)
        # non-vacuous: the late batch's windows are disjoint from the
        # emitted set (fixture spans ~30 days, quarter vs half split) and
        # none of them leaked into the append output
        emitted = {r["win_start"] for r in got}
        late_windows = {
            int(r["ts"].timestamp()) // 3600 * 3600 for r in late
        }
        assert late_windows  # the late feed really had data
        assert late_windows.isdisjoint(emitted)
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def test_stateful_topk_across_batches(spark, sf_dir, ts_sorted_table):
    """Custom stateful top-k: the per-key leaderboard must be identical
    whether the stream arrives in one trigger or four — the bounded
    O(k) state merge across batch boundaries is exactly what the
    operator exists for."""
    from pyspark.sql import functions as F

    from parallelutilities_jl_spark.streaming.stateful import (
        running_topk_per_key,
    )

    t = ts_sorted_table
    stage = tempfile.mkdtemp(prefix="pu_events_topk_")
    try:
        stream = _stream_from(spark, stage)
        q = (
            running_topk_per_key(stream.groupBy("user_id"))
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("t_topk")
            .start()
        )
        try:
            step = t.num_rows // N_BATCHES
            for i in range(N_BATCHES):
                hi = t.num_rows if i == N_BATCHES - 1 else (i + 1) * step
                _feed(stage, t, i * step, hi, i)
                q.processAllAvailable()
            # update mode re-emits per trigger; keep the LAST emission
            # per (user, rank)
            got = {
                (r["user_id"], r["rnk"]): (r["event_id"], r["value"])
                for r in spark.sql("SELECT * FROM t_topk").collect()
            }
        finally:
            q.stop()
        from pyspark.sql.window import Window as W

        ev = load_table(spark, sf_dir, "events")
        w = W.partitionBy("user_id").orderBy(
            F.col("value").desc(), F.col("event_id")
        )
        want = {
            (r["user_id"], r["rnk"]): (r["event_id"], r["value"])
            for r in ev.select(
                "user_id",
                "event_id",
                "value",
                F.row_number().over(w).cast("long").alias("rnk"),
            )
            .filter(F.col("rnk") <= 3)
            .collect()
        }
        assert got == want
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def test_stateful_ewma_across_batches(spark, sf_dir, ts_sorted_table):
    """Integer EWMA fold: the accumulator after the whole stream must be
    identical whether the in-order stream arrives in one trigger or
    four — trigger boundaries must not move the recursion's fold points.
    Reference result computed by a plain Python fold per user."""
    import math

    from parallelutilities_jl_spark.streaming.stateful import (
        EWMA_ALPHA_DEN,
        running_ewma_per_key,
    )

    t = ts_sorted_table
    stage = tempfile.mkdtemp(prefix="pu_events_ewma_")
    try:
        stream = _stream_from(spark, stage)
        q = (
            running_ewma_per_key(stream.groupBy("user_id"))
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("t_ewma")
            .start()
        )
        try:
            step = t.num_rows // N_BATCHES
            for i in range(N_BATCHES):
                hi = t.num_rows if i == N_BATCHES - 1 else (i + 1) * step
                _feed(stage, t, i * step, hi, i)
                q.processAllAvailable()
            got = {
                r["user_id"]: (r["n"], r["ewma_e6"])
                for r in spark.sql(
                    "SELECT * FROM t_ewma"
                ).collect()  # update mode: dict keeps the LAST emission
            }
        finally:
            q.stop()

        ev = load_table(spark, sf_dir, "events").orderBy(
            "ts", "event_id"
        )
        want: dict[int, tuple[int, int]] = {}
        folds: dict[int, int] = {}
        counts: dict[int, int] = {}
        for r in ev.collect():
            x = math.floor(r["value"] * 1_000_000)
            if r["user_id"] in folds:
                folds[r["user_id"]] = (
                    x + (EWMA_ALPHA_DEN - 1) * folds[r["user_id"]]
                ) // EWMA_ALPHA_DEN
            else:
                folds[r["user_id"]] = x
            counts[r["user_id"]] = counts.get(r["user_id"], 0) + 1
        want = {u: (counts[u], folds[u]) for u in folds}
        assert got == want and got
    finally:
        shutil.rmtree(stage, ignore_errors=True)
