"""Checkpoint restart recovery: a streaming job killed mid-stream and
restarted from its checkpoint must produce EXACTLY-ONCE output — no
missing rows, no duplicates — because the file source's processed-file
log and the file sink's commit log both live in the checkpoint. This is
the property that makes a 100 TB streaming ingest restartable after an
executor/driver loss; nothing else in the suite exercises a second query
instance resuming a dead one's state."""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from parallelutilities_jl_spark.streaming import windows as SW


@pytest.fixture()
def dirs():
    base = tempfile.mkdtemp(prefix="pu_stream_recovery_")
    d = {
        "src": os.path.join(base, "src"),
        "out": os.path.join(base, "out"),
        "ckpt": os.path.join(base, "ckpt"),
    }
    os.makedirs(d["src"])
    yield d
    shutil.rmtree(base, ignore_errors=True)


def _start(spark, d):
    """One query instance: pass-through ETL of the events stream into a
    parquet sink, committing via the shared checkpoint."""
    src = (
        spark.readStream.schema(SW.EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .load(d["src"])
    )
    return (
        src.writeStream.format("parquet")
        .option("path", d["out"])
        .option("checkpointLocation", d["ckpt"])
        .outputMode("append")
        .start()
    )


def test_restart_from_checkpoint_is_exactly_once(spark, sf_dir, dirs):
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
    third = t.num_rows // 3

    # instance 1 processes two files, then dies (stop == crash here: the
    # parquet sink only exposes state via its checkpointed commit log)
    pq.write_table(t.slice(0, third), os.path.join(dirs["src"], "b0.parquet"))
    q1 = _start(spark, dirs)
    try:
        q1.processAllAvailable()
        pq.write_table(
            t.slice(third, third), os.path.join(dirs["src"], "b1.parquet")
        )
        q1.processAllAvailable()
    finally:
        q1.stop()

    # new data lands while no query is running
    pq.write_table(
        t.slice(2 * third), os.path.join(dirs["src"], "b2.parquet")
    )

    # instance 2 resumes from the same checkpoint: must pick up ONLY the
    # unprocessed file — replaying b0/b1 would duplicate two thirds of
    # the corpus, skipping b2 would lose one third
    q2 = _start(spark, dirs)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = spark.read.schema(SW.EVENTS_STREAM_SCHEMA).parquet(dirs["out"])
    want = spark.read.schema(SW.EVENTS_STREAM_SCHEMA).parquet(dirs["src"])
    assert got.count() == t.num_rows
    # exactly-once at row granularity, not just count
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
