"""foreachBatch idempotent-upsert sink: the three properties that make
it a correct latest-state maintainer (streaming/sinks.py).

1. STREAM ≡ BATCH: the state read back after the real foreachBatch
   stream equals the one-shot batch reduction over the same events —
   however the stream was chunked (the (ts, event_id) total order is
   batching-independent).
2. REPLAY IDEMPOTENCE: re-invoking the batch function with the same
   (rows, batch_id) — what a crash between sink write and checkpoint
   commit causes — leaves the state bit-identical.
3. UPSERT SEMANTICS: a later batch's row for an existing key WINS, and
   keys untouched by later batches keep their old state.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from parallelutilities_jl_spark.sources.fixtures import load_table
from parallelutilities_jl_spark.streaming.sinks import (
    latest_per_user,
    read_upsert_state,
    start_upsert_stream,
    upsert_batch_writer,
)


@pytest.fixture()
def dirs():
    base = tempfile.mkdtemp(prefix="pu_upsert_sink_")
    d = {
        "src": os.path.join(base, "src"),
        "out": os.path.join(base, "out"),
        "ckpt": os.path.join(base, "ckpt"),
    }
    os.makedirs(d["src"])
    yield d
    shutil.rmtree(base, ignore_errors=True)


def _state_rows(spark, out_dir):
    return sorted(
        tuple(r) for r in read_upsert_state(spark, out_dir).collect()
    )


def _stage_chunks(spark, sf_dir, src, n_chunks=3):
    """Split the fixture events into n_chunks files so the file source
    sees several micro-batches (maxFilesPerTrigger is not needed with
    availableNow: each listing becomes batches, but distinct files
    guarantee the data really arrives split)."""
    ev = load_table(spark, sf_dir, "events")
    chunks = ev.randomSplit([1.0] * n_chunks, seed=7)
    for i, c in enumerate(chunks):
        c.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, f"chunk={i}")
        )
    # the stream reads the directory tree recursively via glob
    return ev


def test_stream_state_equals_batch_reduction(spark, sf_dir, dirs):
    _stage_chunks(spark, sf_dir, dirs["src"])
    q = start_upsert_stream(
        spark, dirs["src"] + "/chunk=*", dirs["out"], dirs["ckpt"]
    )
    q.awaitTermination(120)
    got = _state_rows(spark, dirs["out"])
    want = sorted(
        tuple(r)
        for r in latest_per_user(
            load_table(spark, sf_dir, "events")
        ).collect()
    )
    assert got == want and len(got) > 0


def test_batch_replay_is_idempotent(spark, sf_dir, dirs):
    ev = load_table(spark, sf_dir, "events")
    writer = upsert_batch_writer(dirs["out"])
    writer(ev.filter("user_id % 2 = 0"), 0)
    writer(ev.filter("user_id % 2 = 1"), 1)
    before = _state_rows(spark, dirs["out"])
    # crash-replay of batch 1: same rows, same batch_id
    writer(ev.filter("user_id % 2 = 1"), 1)
    assert _state_rows(spark, dirs["out"]) == before


def test_later_batch_wins_only_for_its_keys(spark, dirs):
    writer = upsert_batch_writer(dirs["out"])
    rows0 = [
        (1, "2024-01-01 00:00:00", 10, "view", 1.0, None),
        (2, "2024-01-01 00:00:00", 20, "view", 2.0, None),
    ]
    rows1 = [(3, "2024-01-02 00:00:00", 10, "purchase", 9.0, None)]
    schema = (
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    )
    from pyspark.sql import functions as F

    def frame(rows):
        return spark.createDataFrame(rows, schema).withColumn(
            "ts", F.to_timestamp("ts")
        )

    writer(frame(rows0), 0)
    writer(frame(rows1), 1)
    state = {r["user_id"]: r for r in
             read_upsert_state(spark, dirs["out"]).collect()}
    assert state[10]["last_type"] == "purchase"  # upserted
    assert state[10]["last_event_id"] == 3
    assert state[20]["last_type"] == "view"  # untouched key kept


def test_compaction_preserves_state_and_drops_partitions(
    spark, sf_dir, dirs
):
    """Compaction must leave the queryable state bit-identical while
    folding every batch partition into one; a second compaction is a
    no-op."""
    from parallelutilities_jl_spark.streaming.sinks import (
        compact_upsert_state,
    )

    ev = load_table(spark, sf_dir, "events")
    writer = upsert_batch_writer(dirs["out"])
    for i in range(4):
        writer(ev.filter(f"user_id % 4 = {i}"), i)
    before = _state_rows(spark, dirs["out"])
    assert len(os.listdir(dirs["out"])) >= 4
    removed = compact_upsert_state(spark, dirs["out"])
    assert removed == 3
    assert _state_rows(spark, dirs["out"]) == before
    parts = [d for d in os.listdir(dirs["out"])
             if d.startswith("batch_id=")]
    assert parts == ["batch_id=3"]  # highest id keeps the snapshot
    assert compact_upsert_state(spark, dirs["out"]) == 0  # idempotent
    assert _state_rows(spark, dirs["out"]) == before


def test_later_batch_with_older_event_does_not_win(spark, dirs):
    """Batching-independence edge: micro-batch boundaries don't imply
    event-time order (late data!). If batch 1 delivers an OLDER event
    for a key than batch 0 did, the state must keep batch 0's row —
    the winner is decided by the (ts, event_id) total order, never by
    batch recency."""
    from pyspark.sql import functions as F

    schema = (
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    )

    def frame(rows):
        return spark.createDataFrame(rows, schema).withColumn(
            "ts", F.to_timestamp("ts")
        )

    writer = upsert_batch_writer(dirs["out"])
    writer(frame([(5, "2024-01-03 00:00:00", 10, "purchase", 9.0,
                   None)]), 0)
    # late-arriving older event for the same user in a LATER batch
    writer(frame([(1, "2024-01-01 00:00:00", 10, "view", 1.0,
                   None)]), 1)
    state = {r["user_id"]: r for r in
             read_upsert_state(spark, dirs["out"]).collect()}
    assert state[10]["last_event_id"] == 5
    assert state[10]["last_type"] == "purchase"
