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
    assert removed == 4
    assert _state_rows(spark, dirs["out"]) == before
    parts = [d for d in os.listdir(dirs["out"])
             if d.startswith("batch_id=")]
    # the snapshot lives in the RESERVED partition a stream batch id
    # (always >= 0) can never collide with
    assert parts == ["batch_id=-1"]
    assert compact_upsert_state(spark, dirs["out"]) == 0  # idempotent
    assert _state_rows(spark, dirs["out"]) == before


def _frame(spark, rows):
    schema = (
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    )
    from pyspark.sql import functions as F

    return spark.createDataFrame(rows, schema).withColumn(
        "ts", F.to_timestamp("ts")
    )


def test_same_second_cross_batch_uses_subsecond_order(spark, dirs):
    """Two same-user events INSIDE the same wall-clock second, where
    event_id order disagrees with sub-second ts order, split across
    batches. The winner must be decided by the FULL-precision ts —
    a state view that re-reduced on a second-truncated column would
    tie-break on event_id and elect the wrong row, breaking
    batching-independence (the fixture ts is sub-second precision, so
    this is realistic data)."""
    writer = upsert_batch_writer(dirs["out"])
    # later sub-second ts but SMALLER event_id
    writer(_frame(spark, [
        (1, "2024-01-01 00:00:00.900", 10, "purchase", 9.0, None)
    ]), 0)
    # earlier sub-second ts but LARGER event_id, in a later batch
    writer(_frame(spark, [
        (2, "2024-01-01 00:00:00.100", 10, "view", 1.0, None)
    ]), 1)
    state = {r["user_id"]: r for r in
             read_upsert_state(spark, dirs["out"]).collect()}
    assert state[10]["last_event_id"] == 1
    assert state[10]["last_type"] == "purchase"
    # and it equals the batch recompute over the union — the
    # batching-independence invariant itself
    union = _frame(spark, [
        (1, "2024-01-01 00:00:00.900", 10, "purchase", 9.0, None),
        (2, "2024-01-01 00:00:00.100", 10, "view", 1.0, None),
    ])
    want = sorted(tuple(r) for r in latest_per_user(union).collect())
    assert _state_rows(spark, dirs["out"]) == want


def test_replay_after_compaction_does_not_clobber_snapshot(spark, dirs):
    """A crash between the sink write and the checkpoint commit makes
    the stream REPLAY its last batch id after restart. The compaction
    snapshot lives in batch_id=-1, which no stream batch id (>= 0) can
    collide with — so the replay overwrites only its own directory and
    the compacted state survives intact."""
    from parallelutilities_jl_spark.streaming.sinks import (
        compact_upsert_state,
    )

    writer = upsert_batch_writer(dirs["out"])
    writer(_frame(spark, [
        (1, "2024-01-01 00:00:00", 10, "view", 1.0, None),
        (2, "2024-01-01 00:00:00", 20, "view", 2.0, None),
    ]), 0)
    b1_rows = [(3, "2024-01-02 00:00:00", 30, "purchase", 9.0, None)]
    writer(_frame(spark, b1_rows), 1)
    assert compact_upsert_state(spark, dirs["out"]) == 2
    before = _state_rows(spark, dirs["out"])
    # crash-replay of the LAST batch after the compaction
    writer(_frame(spark, b1_rows), 1)
    assert _state_rows(spark, dirs["out"]) == before
    # and a follow-up compaction folds the replayed partition back in
    assert compact_upsert_state(spark, dirs["out"]) == 1
    assert _state_rows(spark, dirs["out"]) == before


def test_compaction_crash_recovery_promotes_staging(spark, dirs):
    """Simulate a crash at the worst point of the commit protocol:
    the staged snapshot is complete (_SUCCESS) and the old snapshot
    has been moved aside, but the staging → batch_id=-1 rename never
    ran. Re-running compaction must PROMOTE the staging copy (not
    recompute from the remaining partitions, which would silently drop
    the aside snapshot's winners) and finish the cleanup."""
    from parallelutilities_jl_spark.streaming.sinks import (
        _read_winners,
        compact_upsert_state,
    )

    writer = upsert_batch_writer(dirs["out"])
    writer(_frame(spark, [
        (1, "2024-01-01 00:00:00", 10, "view", 1.0, None),
    ]), 0)
    assert compact_upsert_state(spark, dirs["out"]) == 1
    # key 20 arrives in a later batch; key 10 now lives ONLY in the
    # batch_id=-1 snapshot
    writer(_frame(spark, [
        (2, "2024-01-02 00:00:00", 20, "view", 2.0, None),
    ]), 1)
    want = _state_rows(spark, dirs["out"])
    # hand-build the crash state: complete staging, snapshot aside
    staged = os.path.join(dirs["out"], "_compact_staging")
    _read_winners(spark, dirs["out"]).write.mode("overwrite").parquet(
        staged
    )
    os.rename(
        os.path.join(dirs["out"], "batch_id=-1"),
        os.path.join(dirs["out"], "_compact_aside"),
    )
    # at this instant a naive recompute would only see batch_id=1
    assert compact_upsert_state(spark, dirs["out"]) == 1
    assert _state_rows(spark, dirs["out"]) == want
    assert not os.path.exists(os.path.join(dirs["out"],
                                           "_compact_aside"))
    assert not os.path.exists(staged)
    parts = [d for d in os.listdir(dirs["out"])
             if d.startswith("batch_id=")]
    assert parts == ["batch_id=-1"]


def test_compaction_crash_recovery_rolls_back_incomplete_staging(
    spark, dirs
):
    """If the crash left an INCOMPLETE staging (no _SUCCESS) with the
    snapshot moved aside, recovery must restore the aside snapshot and
    discard the staging — never promote a torn write."""
    from parallelutilities_jl_spark.streaming.sinks import (
        compact_upsert_state,
    )

    writer = upsert_batch_writer(dirs["out"])
    writer(_frame(spark, [
        (1, "2024-01-01 00:00:00", 10, "view", 1.0, None),
    ]), 0)
    assert compact_upsert_state(spark, dirs["out"]) == 1
    writer(_frame(spark, [
        (2, "2024-01-02 00:00:00", 20, "view", 2.0, None),
    ]), 1)
    want = _state_rows(spark, dirs["out"])
    staged = os.path.join(dirs["out"], "_compact_staging")
    os.makedirs(staged)  # torn write: directory exists, no _SUCCESS
    os.rename(
        os.path.join(dirs["out"], "batch_id=-1"),
        os.path.join(dirs["out"], "_compact_aside"),
    )
    assert compact_upsert_state(spark, dirs["out"]) == 1
    assert _state_rows(spark, dirs["out"]) == want


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


def test_compaction_works_on_scheme_qualified_uris(spark, dirs):
    """The compaction's directory surgery goes through the Hadoop
    FileSystem API resolved from the path's scheme — pin that it works
    on a scheme-qualified URI (file://...), not just bare POSIX paths,
    since on a cluster the state table lives behind an HCFS scheme."""
    from parallelutilities_jl_spark.streaming.sinks import (
        compact_upsert_state,
    )

    out = "file://" + dirs["out"]
    writer = upsert_batch_writer(out)
    writer(_frame(spark, [
        (1, "2024-01-01 00:00:00", 10, "view", 1.0, None),
    ]), 0)
    writer(_frame(spark, [
        (2, "2024-01-02 00:00:00", 20, "view", 2.0, None),
    ]), 1)
    before = _state_rows(spark, out)
    assert compact_upsert_state(spark, out) == 2
    assert _state_rows(spark, out) == before
    parts = [d for d in os.listdir(dirs["out"])
             if d.startswith("batch_id=")]
    assert parts == ["batch_id=-1"]


def test_read_fails_loudly_during_torn_compaction_window(spark, dirs):
    """Between the snapshot-aside rename and the staging promotion,
    batch_id=* is missing the old snapshot's winners — the read path
    must refuse to serve that silently-partial state and point at the
    compaction repair."""
    from parallelutilities_jl_spark.streaming.sinks import (
        compact_upsert_state,
    )

    writer = upsert_batch_writer(dirs["out"])
    writer(_frame(spark, [
        (1, "2024-01-01 00:00:00", 10, "view", 1.0, None),
    ]), 0)
    assert compact_upsert_state(spark, dirs["out"]) == 1
    writer(_frame(spark, [
        (2, "2024-01-02 00:00:00", 20, "view", 2.0, None),
    ]), 1)
    want = _state_rows(spark, dirs["out"])
    os.rename(
        os.path.join(dirs["out"], "batch_id=-1"),
        os.path.join(dirs["out"], "_compact_aside"),
    )
    with pytest.raises(RuntimeError, match="torn compaction"):
        read_upsert_state(spark, dirs["out"]).collect()
    # the repair restores readability (rolls the aside back)
    compact_upsert_state(spark, dirs["out"])
    assert _state_rows(spark, dirs["out"]) == want


def test_read_fails_loudly_on_pre_full_precision_schema(spark, dirs):
    """A state directory written by the pre-round-13 sink (second-
    granular last_ts_s, no last_ts) must be rejected, not silently
    mis-ranked (its rows would read as NULL last_ts and lose every
    window to any new-schema row)."""
    old = _frame(spark, [
        (1, "2024-01-01 00:00:00", 10, "view", 1.0, None),
    ]).selectExpr(
        "user_id",
        "event_id AS last_event_id",
        "unix_timestamp(ts) AS last_ts_s",
        "event_type AS last_type",
        "CAST(floor(value * 100 + 0.5) AS LONG) AS last_value_c",
    )
    old.write.mode("overwrite").parquet(
        os.path.join(dirs["out"], "batch_id=0")
    )
    with pytest.raises(RuntimeError, match="pre-full-precision"):
        read_upsert_state(spark, dirs["out"]).collect()


def test_read_serves_complete_state_post_commit_pre_cleanup(spark, dirs):
    """Aside present WITH batch_id=-1 present is the harmless
    post-commit cleanup window: the new snapshot already holds every
    winner under the glob, so reads must serve complete state, not
    over-fire the torn-compaction guard."""
    from parallelutilities_jl_spark.streaming.sinks import (
        compact_upsert_state,
    )
    import shutil

    writer = upsert_batch_writer(dirs["out"])
    writer(_frame(spark, [
        (1, "2024-01-01 00:00:00", 10, "view", 1.0, None),
    ]), 0)
    assert compact_upsert_state(spark, dirs["out"]) == 1
    want = _state_rows(spark, dirs["out"])
    # hand-build the post-commit crash state: snapshot committed, the
    # aside copy not yet deleted
    shutil.copytree(
        os.path.join(dirs["out"], "batch_id=-1"),
        os.path.join(dirs["out"], "_compact_aside"),
    )
    assert _state_rows(spark, dirs["out"]) == want  # no error, complete
    # and a re-run finishes the cleanup
    compact_upsert_state(spark, dirs["out"])
    assert not os.path.exists(
        os.path.join(dirs["out"], "_compact_aside")
    )
    assert _state_rows(spark, dirs["out"]) == want


def test_read_rejects_mixed_schema_directories_deterministically(
    spark, dirs
):
    """An old-schema partition MIXED with new-schema ones must be
    rejected regardless of which file Spark would sample for
    single-file inference — the mergeSchema read makes the persisted
    last_ts_s column visible deterministically."""
    old = _frame(spark, [
        (1, "2024-01-01 00:00:00", 10, "view", 1.0, None),
    ]).selectExpr(
        "user_id",
        "event_id AS last_event_id",
        "unix_timestamp(ts) AS last_ts_s",
        "event_type AS last_type",
        "CAST(floor(value * 100 + 0.5) AS LONG) AS last_value_c",
    )
    old.write.mode("overwrite").parquet(
        os.path.join(dirs["out"], "batch_id=0")
    )
    # a new-schema partition written by the current sink
    upsert_batch_writer(dirs["out"])(_frame(spark, [
        (2, "2024-01-02 00:00:00", 20, "view", 2.0, None),
    ]), 1)
    with pytest.raises(RuntimeError, match="pre-full-precision"):
        read_upsert_state(spark, dirs["out"]).collect()
