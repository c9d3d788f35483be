"""foreachBatch idempotent-upsert sink: maintain a LATEST-STATE table
from a stream (SURVEY §7 phase 6 extension — the reference has no
streaming; this is the standard Spark production sink pattern the file
sink cannot express, because a file sink can only append).

The pattern, and why each piece is shaped this way at 100 TB:

* **foreachBatch** is how Structured Streaming writes to anything that
  needs per-batch MERGE/upsert semantics. Spark guarantees the batch
  function sees each micro-batch exactly once per successful commit,
  but a batch CAN be replayed after a crash between the sink write and
  the checkpoint commit — so the write itself must be IDEMPOTENT on
  (batch contents, batch_id).
* **Idempotence by partition overwrite**: each batch's contribution
  lands in its own `batch_id=<id>` partition directory with
  mode("overwrite"). Replaying batch N rewrites exactly the same
  directory with exactly the same rows — a no-op. This is the
  poor-man's transactional MERGE that works on plain parquet; with a
  table format (Delta/Iceberg) the same function body becomes a real
  MERGE and nothing else changes.
* **Latest-state view**: the queryable state is `read_upsert_state` —
  latest row per key across all batch partitions. The per-user winner
  is determined by the TOTAL order (ts, event_id) at FULL timestamp
  precision: the batch partitions persist the winner's raw `last_ts`
  (sub-second intact) and the state view re-reduces on it, truncating
  to whole seconds only in the final output projection. Ordering the
  re-reduction on a second-truncated column would NOT be
  batching-independent — two same-user events inside the same second,
  split across batches, could elect a different winner than the batch
  recompute whenever event_id order disagrees with sub-second ts
  order. With the full-precision order the state is batching-
  independent, so stream state ≡ the batch recompute over the same
  rows no matter how the stream was chunked (pinned in
  tests/test_upsert_sink.py, along with replay idempotence and the
  same-second/cross-batch case).

Scale shape: the per-batch reduction is a row_number window keyed on
user_id — one hash exchange + per-partition local sort (never a global
sort), the same key the state view re-reduces on, and batch output is
≤ |distinct keys in batch| rows, so the state directory grows with
keys-touched-per-batch, not events. `compact_upsert_state` folds the
accumulated batch partitions into one snapshot (the same reduction, so
the state is unchanged by construction) to bound the view's listing
cost between compactions. The snapshot lives in the RESERVED partition
`batch_id=-1` — Structured Streaming batch ids start at 0 and only
grow, so a crash-replayed stream batch can overwrite its own directory
but never the snapshot.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from parallelutilities_jl_spark.sources.fixtures import load_table

# Reserved snapshot partition for compaction. Stream batch ids are
# non-negative, so a replayed micro-batch can never collide with it.
_SNAPSHOT_PART = "batch_id=-1"
_STAGING = "_compact_staging"
_ASIDE = "_compact_aside"


def _latest_winners(df: DataFrame) -> DataFrame:
    """The shared reduction: latest row per user under the
    deterministic total order (ts DESC, event_id DESC) at FULL
    timestamp precision — NULL ts sorts last (a user whose every ts is
    NULL still yields a row, with NULL last_ts). This is the frame the
    batch partitions persist: `last_ts` keeps the raw TIMESTAMP so the
    state view's re-reduction orders on exactly the same key the
    per-batch reduction did. Value is carried on the exact 2-dp
    integer grid (floor(v·100 + 0.5)) so the hash compare cannot hinge
    on a double print format."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc_nulls_last(), F.col("event_id").desc_nulls_last()
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("last_value_c"),
        )
    )


def _project_state(winners: DataFrame) -> DataFrame:
    """Final output projection: truncate the full-precision winner ts
    to whole seconds (unix_timestamp, not cast: the fixture loads ts
    as TIMESTAMP_NTZ, which ANSI mode refuses to cast to BIGINT). Only
    the OUTPUT is second-granular; every ordering decision upstream
    used the full-precision `last_ts`."""
    return winners.select(
        "user_id",
        "last_event_id",
        F.unix_timestamp(F.col("last_ts")).alias("last_ts_s"),
        "last_type",
        "last_value_c",
    )


def latest_per_user(df: DataFrame) -> DataFrame:
    """Latest event per user, second-granular output schema — the
    oracle-checked batch query, and by construction the same reduction
    the per-batch writer and the state view run (both call
    `_latest_winners`)."""
    return _project_state(_latest_winners(df))


def upsert_batch_writer(out_dir: str):
    """The foreachBatch function: reduce the micro-batch to its
    per-user latest rows (full-precision `last_ts` persisted) and
    overwrite that batch's OWN partition directory. Replay-idempotent
    by construction — same (rows, batch_id) in, byte-equivalent
    directory out. Stream batch ids are ≥ 0, so no batch can ever
    write the reserved `batch_id=-1` snapshot partition."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            _latest_winners(batch_df)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch_id={batch_id}"))
        )

    return write


def start_upsert_stream(
    spark: SparkSession, src_dir: str, out_dir: str, ckpt: str
):
    """File-source stream → foreachBatch idempotent upsert sink."""
    from parallelutilities_jl_spark.streaming.windows import (
        EVENTS_STREAM_SCHEMA,
    )

    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .load(src_dir)
    )
    return (
        src.writeStream.foreachBatch(upsert_batch_writer(out_dir))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def _read_winners(spark: SparkSession, out_dir: str) -> DataFrame:
    """Re-reduce the per-batch winner rows by the same full-precision
    (last_ts, last_event_id) total order the batches were reduced
    with. Because that order is global, the result equals
    `_latest_winners` over the union of all raw events, however they
    were batched. Reads the snapshot partition (batch_id=-1) and the
    live batch partitions uniformly — superseded rows lose the window
    either way.

    Fails LOUDLY instead of serving silently-wrong state in two
    detectable situations: (a) a compaction crashed BEFORE its commit
    point and left the old snapshot in `_compact_aside` with no
    `batch_id=-1` (those winners are not under the batch_id=* glob
    until `compact_upsert_state` repairs the directory — aside
    alongside a present snapshot is the harmless post-commit cleanup
    window and reads fine); (b) the directory holds any
    pre-full-precision partition (a persisted `last_ts_s` column, or
    no `last_ts` at all — the pre-round-13 schema), whose rows would
    otherwise read as NULL last_ts and lose every window to any
    new-schema row. The mergeSchema read is what makes (b) detection
    deterministic on MIXED directories — single-file inference would
    see whichever schema Spark samples."""
    fs, hpath = _fs_ops(spark, out_dir)
    if fs.exists(hpath(os.path.join(out_dir, _ASIDE))) and not fs.exists(
        hpath(os.path.join(out_dir, _SNAPSHOT_PART))
    ):
        raise RuntimeError(
            f"{out_dir} has a torn compaction ({_ASIDE} present, no "
            f"{_SNAPSHOT_PART}): the old snapshot's winners are "
            "outside the batch_id=* glob. Run compact_upsert_state "
            "first — its entry repair promotes or rolls back the "
            "staged snapshot."
        )
    winners = (
        spark.read.option("basePath", out_dir)
        .option("mergeSchema", "true")
        .parquet(os.path.join(out_dir, "batch_id=*"))
    )
    if "last_ts" not in winners.columns or "last_ts_s" in winners.columns:
        raise RuntimeError(
            f"{out_dir} holds pre-full-precision batch partitions "
            "(persisted last_ts_s / missing last_ts). Rebuild the "
            "state directory by replaying the stream (delete state + "
            "checkpoint), or backfill last_ts from last_ts_s offline "
            "— mixing the two schemas would silently mis-rank old "
            "winners."
        )
    w = Window.partitionBy("user_id").orderBy(
        F.col("last_ts").desc_nulls_last(),
        F.col("last_event_id").desc_nulls_last(),
    )
    return (
        winners.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "last_event_id", "last_ts", "last_type",
            "last_value_c",
        )
    )


def read_upsert_state(spark: SparkSession, out_dir: str) -> DataFrame:
    """The queryable latest-state table (second-granular output)."""
    return _project_state(_read_winners(spark, out_dir))


def _fs_ops(spark: SparkSession, base: str):
    """Hadoop FileSystem handle + Path class for `base`'s scheme, so
    the compaction's directory surgery works on whatever filesystem
    the state table lives on (local, HDFS, or an object store with an
    HCFS connector), not just local POSIX."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(base).getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def compact_upsert_state(spark: SparkSession, out_dir: str) -> int:
    """Offline compaction: fold every `batch_id=<id>` partition into
    the RESERVED snapshot partition `batch_id=-1` and remove the
    superseded partitions. Stream batch ids are ≥ 0 and only grow, so
    a crash-replayed micro-batch overwrites only its own directory —
    never the snapshot (replaying after compaction just re-adds rows
    the snapshot already supersedes, which the state view's
    re-reduction makes harmless). The fold is the same full-precision
    reduction the state view runs, so the state read back is unchanged
    by construction — only the file/listing count shrinks.

    Crash-safe commit protocol (every intermediate state is
    recoverable, and the union of live partitions + staging + aside
    always contains every winner):

      1. write the snapshot to `_compact_staging` (Spark emits
         `_SUCCESS` on completion — an incomplete staging is
         detectable and discarded);
      2. rename any existing `batch_id=-1` aside to `_compact_aside`
         (its rows are still part of the staged snapshot; nothing is
         deleted yet);
      3. rename staging → `batch_id=-1` (the commit point);
      4. delete the aside copy and the superseded `batch_id=<n≥0>`
         partitions last.

    On entry the function first REPAIRS any crash residue: a complete
    staging with the old snapshot aside is promoted (never recomputed
    — recomputing after the old snapshot left the `batch_id=*` glob
    would silently drop its winners); an incomplete staging is rolled
    back (aside restored, staging discarded). Directory operations go
    through the Hadoop FileSystem API, so this works wherever the
    state table lives; note that HDFS/POSIX rename is atomic while
    object-store rename is copy+delete — on an object store, prefer a
    table format (Delta/Iceberg) whose MERGE/compaction is
    transactional, as the module docstring notes.

    Returns the number of superseded batch partitions removed."""
    fs, hpath = _fs_ops(spark, out_dir)

    staged = os.path.join(out_dir, _STAGING)
    aside = os.path.join(out_dir, _ASIDE)
    final = os.path.join(out_dir, _SNAPSHOT_PART)
    staged_ok = fs.exists(hpath(os.path.join(staged, "_SUCCESS")))

    # --- crash repair (see protocol above) ---
    if fs.exists(hpath(aside)):
        if staged_ok and not fs.exists(hpath(final)):
            # died between steps 2 and 3: promote the complete staging
            if not fs.rename(hpath(staged), hpath(final)):
                raise IOError(f"rename {staged} -> {final} failed")
            staged_ok = False
        elif not fs.exists(hpath(final)):
            # staging incomplete and snapshot moved aside: roll back
            if not fs.rename(hpath(aside), hpath(final)):
                raise IOError(f"rename {aside} -> {final} failed")
        # died between steps 3 and 4 (final + aside both present):
        # the commit landed; just finish the cleanup below.
        fs.delete(hpath(aside), True)
    if fs.exists(hpath(staged)):
        # leftover staging with no aside: nothing was deleted or moved
        # yet, so recomputing from the live partitions is safe.
        fs.delete(hpath(staged), True)

    parts = sorted(
        st.getPath().getName()
        for st in fs.listStatus(hpath(out_dir))
        if st.getPath().getName().startswith("batch_id=")
    )
    superseded = [p for p in parts if p != _SNAPSHOT_PART]
    if not superseded:
        return 0

    # step 1: stage the folded snapshot (full-precision schema, same
    # as the batch partitions, so future re-reductions keep ordering
    # on the raw ts)
    _read_winners(spark, out_dir).write.mode("overwrite").parquet(staged)
    # step 2: move the old snapshot aside (delete nothing yet)
    if fs.exists(hpath(final)):
        if not fs.rename(hpath(final), hpath(aside)):
            raise IOError(f"rename {final} -> {aside} failed")
    # step 3: commit
    if not fs.rename(hpath(staged), hpath(final)):
        raise IOError(f"rename {staged} -> {final} failed")
    # step 4: cleanup, strictly last
    if fs.exists(hpath(aside)):
        fs.delete(hpath(aside), True)
    removed = 0
    for p in superseded:
        fs.delete(hpath(os.path.join(out_dir, p)), True)
        removed += 1
    return removed


def q_stream_upsert_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch equivalent of the upsert sink's state (the repo's standard
    stream≡batch≡oracle discipline: the REAL foreachBatch stream and
    the replay-idempotence property are pinned in
    tests/test_upsert_sink.py; this oracle-checked entry is the
    identical reduction over the batch frame)."""
    return latest_per_user(load_table(spark, sf_dir, "events"))


ORACLES = {
    "stream_upsert_state": """
SELECT user_id, event_id AS last_event_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS last_ts_s,
       event_type AS last_type,
       CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS last_value_c
FROM (SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id
        ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rn
      FROM events)
WHERE rn = 1
""",
}

QUERIES = {
    "stream_upsert_state": q_stream_upsert_state,
}
