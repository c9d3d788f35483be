"""Stream ≡ batch ≡ oracle chain for the streaming ingest near-dup
screen: `streaming.stateful.sig_dedup_stream` fed the documents fixture
in arrival (doc_id) order across micro-batches must reproduce the
registered batch-parity query `dedup.q_stream_sig_dedup` exactly (which
the driver oracle-checks against DuckDB) — regardless of where the
trigger boundaries fall."""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from parallelutilities_jl_spark.operators import dedup as DD
from parallelutilities_jl_spark.streaming import stateful as ST


def _stream_rows(spark, sf_dir, n_batches):
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    t = t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))
    stage = tempfile.mkdtemp(prefix="pu_sigdedup_")
    try:
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .format("parquet")
            .load(stage)
        )
        sig = DD.sig_frame(stream)
        banded = DD.lsh_bands(sig, keep_sig=True)
        q = (
            ST.sig_dedup_stream(banded.groupBy("band", "key"))
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("sig_dedup_sink")
            .start()
        )
        try:
            step = t.num_rows // n_batches
            for i in range(n_batches):
                hi = t.num_rows if i == n_batches - 1 else (i + 1) * step
                pq.write_table(
                    t.slice(i * step, hi - i * step),
                    os.path.join(stage, f"b{i}.parquet"),
                )
                q.processAllAvailable()
            return spark.sql("SELECT * FROM sig_dedup_sink").collect()
        finally:
            q.stop()
    finally:
        shutil.rmtree(stage, ignore_errors=True)


@pytest.mark.parametrize("n_batches", [1, 3])
def test_stream_matches_registered_batch_query(spark, sf_dir, n_batches):
    rows = _stream_rows(spark, sf_dir, n_batches)
    got: dict[int, tuple[int, int]] = {}
    for r in rows:
        prev = got.get(r["doc_id"])
        if prev is None:
            got[r["doc_id"]] = (r["dup_of"], r["matches"])
        else:
            got[r["doc_id"]] = (
                min(prev[0], r["dup_of"]),
                max(prev[1], r["matches"]),
            )
    want = {
        r["doc_id"]: (r["dup_of"], r["max_matches"])
        for r in DD.q_stream_sig_dedup(spark, sf_dir).collect()
    }
    assert got == want
    assert want, "fixture should contain at least one near-dup"


def test_state_is_bounded(spark, sf_dir):
    """No bucket's state may exceed STREAM_STATE_CAP signatures: the
    batch replay of the state contents (first cap arrivals per bucket)
    is the exact worst case the stream ever stores."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    sig = DD.sig_frame(docs.select("doc_id", "text"))
    counts = (
        DD.lsh_bands(sig)
        .groupBy("band", "key")
        .count()
        .agg(
            F.sum(
                F.least(F.col("count"), F.lit(DD.STREAM_STATE_CAP))
            ).alias("stored")
        )
        .collect()[0]
    )
    n_docs = sig.count()
    assert counts["stored"] <= n_docs * DD.BANDS
