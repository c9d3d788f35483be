"""Structured Streaming: the real readStream path must produce the same
results as the batch equivalents (Spark's unified model), driven to
completion with processAllAvailable + memory sinks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallelutilities_jl_spark.sources.fixtures import load_table
from parallelutilities_jl_spark.streaming import windows as SW


def _run_stream(spark, df, name: str, mode: str = "complete"):
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        return spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        q.stop()


def _norm(rows):
    return sorted(tuple(r) for r in rows)


def test_stream_schema_matches_fixture_physical_type(sf_dir):
    """Fixture-drift guard: the stream schema's `ts` declaration must
    agree with the parquet file's PHYSICAL type. Round-3/4 shipped a
    schema that read timestamp[us] as nanoseconds (every window landed in
    Jan 1970); this pins the conversion to the fixture so a regen that
    changes the unit turns this red at fixture time, not via four
    downstream stream≡batch failures."""
    import os

    import pyarrow.parquet as pq

    ts_field = pq.read_schema(
        os.path.join(sf_dir, "events.parquet")
    ).field("ts")
    # stream schema declares `ts timestamp` == parquet timestamp[us].
    # If the fixture ever regenerates as int64-nanos (or ns timestamps),
    # stream_events needs an explicit conversion again.
    assert str(ts_field.type) == "timestamp[us]", (
        f"events.ts physical type changed to {ts_field.type}; "
        "update EVENTS_STREAM_SCHEMA / stream_events conversion to match"
    )
    assert "ts timestamp," in SW.EVENTS_STREAM_SCHEMA


def test_stream_tumbling_equals_batch(spark, sf_dir):
    ev = SW.stream_events(spark, sf_dir)
    got = _run_stream(spark, SW.tumbling_counts(ev), "t_tumble")
    want = SW.tumbling_counts(
        load_table(spark, sf_dir, "events"), watermark=False
    ).collect()
    assert _norm(got) == _norm(want)


def test_stream_session_equals_batch(spark, sf_dir):
    ev = SW.stream_events(spark, sf_dir)
    got = _run_stream(spark, SW.session_agg(ev), "t_sess")
    want = SW.session_agg(
        load_table(spark, sf_dir, "events"), watermark=False
    ).collect()
    assert _norm(got) == _norm(want)


def test_stream_dedup_within_watermark(spark, sf_dir):
    ev = SW.stream_events(spark, sf_dir)
    got = _run_stream(
        spark,
        SW.dedup_within_watermark(ev).select("event_id"),
        "t_dedup",
        mode="append",
    )
    n_distinct = (
        load_table(spark, sf_dir, "events").select("event_id").distinct().count()
    )
    assert len(got) == n_distinct


def test_stream_dedup_coarse_key_equals_batch(spark, sf_dir):
    """Coarse-key streaming dedup must emit exactly the batch-distinct
    key set — and must actually drop rows (the fixture's event_ids are
    unique, so the id-level dedup above is vacuous; this one is not)."""
    ev = SW.stream_events(spark, sf_dir)
    got = _run_stream(
        spark, SW.dedup_coarse_key(ev), "t_dedup_coarse", mode="append"
    )
    batch = SW.dedup_coarse_key(
        load_table(spark, sf_dir, "events"), watermark=False
    ).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert len(batch) < n_events  # non-vacuous: duplicates exist
    assert _norm(got) == _norm(batch)


def test_stateful_running_count(spark, sf_dir):
    """Custom stateful operator: per-user running totals via
    applyInPandasWithState (the reference-lacks-it custom-operator path)."""
    from parallelutilities_jl_spark.streaming.stateful import (
        running_count_per_key,
    )

    ev = SW.stream_events(spark, sf_dir)
    out = running_count_per_key(ev.groupBy("user_id"))
    rows = _run_stream(spark, out, "t_state", mode="update")
    want = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    # final state per user must equal the batch count
    final = {}
    for r in rows:
        final[r["user_id"]] = r["n"]
    assert final == {r["user_id"]: r["n"] for r in want}


def test_stateful_running_sum(spark, sf_dir):
    from parallelutilities_jl_spark.streaming.stateful import (
        running_sum_per_key,
    )

    ev = SW.stream_events(spark, sf_dir)
    out = running_sum_per_key(ev.groupBy("user_id"))
    rows = _run_stream(spark, out, "t_state_sum", mode="update")
    want = {
        r["user_id"]: (round(r["total"], 6), r["n"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.sum("value").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    final = {}
    for r in rows:
        final[r["user_id"]] = (round(r["total"], 6), r["n"])
    assert final == want


def test_stream_stream_join_equals_batch(spark, sf_dir):
    """Stream-stream interval join (purchase attribution): two watermarked
    streams joined on user + time bound must equal the batch plan."""
    ev_c = SW.stream_events(spark, sf_dir).filter(
        F.col("event_type") == "click"
    )
    ev_p = SW.stream_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    got = _run_stream(
        spark,
        SW.purchase_attribution(ev_c, ev_p),
        "t_attr",
        mode="append",
    )
    ev = load_table(spark, sf_dir, "events")
    want = SW.purchase_attribution(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        watermark=False,
    ).collect()
    assert _norm(got) == _norm(want)
