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
  is determined by the TOTAL order (ts, event_id), which is
  batching-independent, so stream state ≡ the batch recompute over the
  same rows no matter how the stream was chunked (pinned in
  tests/test_upsert_sink.py, along with replay idempotence).

Scale shape: the per-batch reduction is a row_number window keyed on
user_id — one hash exchange + per-partition local sort (never a global
sort), the same key the state view re-reduces on, and batch output is
≤ |distinct keys in batch| rows, so the state directory grows with
keys-touched-per-batch, not events. `compact_upsert_state` folds the
accumulated batch partitions into one snapshot (the same reduction, so
the state is unchanged by construction) to bound the view's listing
cost between compactions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from parallelutilities_jl_spark.sources.fixtures import load_table


def latest_per_user(df: DataFrame) -> DataFrame:
    """Latest event per user under the deterministic total order
    (ts DESC, event_id DESC) — NULL ts sorts last (a user whose every
    ts is NULL still yields a row, with NULL last_ts_s). Shared by the
    per-batch reducer, the state view's re-reduction, and the
    oracle-checked batch query, so all three reductions are the same
    code path. Value is carried on the exact 2-dp integer grid
    (floor(v·100 + 0.5)) so the hash compare cannot hinge on a double
    print format."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc_nulls_last(), F.col("event_id").desc_nulls_last()
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            # unix_timestamp, not cast: the fixture loads ts as
            # TIMESTAMP_NTZ, which ANSI mode refuses to cast to BIGINT
            F.unix_timestamp(F.col("ts")).alias("last_ts_s"),
            F.col("event_type").alias("last_type"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("last_value_c"),
        )
    )


def upsert_batch_writer(out_dir: str):
    """The foreachBatch function: reduce the micro-batch to its
    per-user latest rows and overwrite that batch's OWN partition
    directory. Replay-idempotent by construction — same (rows,
    batch_id) in, byte-equivalent directory out."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            latest_per_user(batch_df)
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


def read_upsert_state(spark: SparkSession, out_dir: str) -> DataFrame:
    """The queryable latest-state table: re-reduce the per-batch winner
    rows by the same (ts, event_id) total order. Because that order is
    global, the result equals `latest_per_user` over the union of all
    raw events, however they were batched."""
    winners = spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "batch_id=*")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("last_ts_s").desc_nulls_last(),
        F.col("last_event_id").desc_nulls_last(),
    )
    return (
        winners.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "last_event_id", "last_ts_s", "last_type",
            "last_value_c",
        )
    )


def compact_upsert_state(spark: SparkSession, out_dir: str) -> int:
    """Offline compaction: fold every `batch_id=<id>` partition into
    the HIGHEST existing batch id's directory (so a restarted stream's
    next batch id never collides with the snapshot) and remove the
    older partitions. The fold is the same `read_upsert_state`
    reduction, so the state read back is unchanged by construction —
    only the file/listing count shrinks (the state view's glob cost
    grows with batches between compactions). Crash-safety matches the
    sink's own contract: the snapshot overwrite of `batch_id=<max>` is
    the commit point; a crash before the old-partition removals leaves
    extra SUPERSEDED winner rows that the state view's re-reduction
    makes harmless (every surviving key's global winner is already in
    the snapshot), and re-running compaction completes the removal.
    Returns the number of batch partitions removed."""
    import shutil

    parts = sorted(
        d for d in os.listdir(out_dir) if d.startswith("batch_id=")
    )
    if len(parts) <= 1:
        return 0
    max_part = max(parts, key=lambda d: int(d.split("=", 1)[1]))
    snapshot = read_upsert_state(spark, out_dir)
    staged = os.path.join(out_dir, "_compact_staging")
    snapshot.write.mode("overwrite").parquet(staged)
    # commit: the snapshot replaces the highest partition, then the
    # superseded partitions drop
    final = os.path.join(out_dir, max_part)
    shutil.rmtree(final, ignore_errors=True)
    os.rename(staged, final)
    removed = 0
    for d in parts:
        if d != max_part:
            shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)
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
