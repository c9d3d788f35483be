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


def test_lsh_bands_keep_sig_carries_full_signature_any_geometry(spark):
    """keep_sig must carry the sig frame's ACTUAL h* columns: with
    non-default band geometry (bands*rows < N_HASHES) the old
    bands*rows derivation silently truncated the carried signature
    (round-10 advisor)."""
    n = DD.N_HASHES
    pdf = {"doc_id": 1, **{f"h{i}": i * 11 for i in range(n)}}
    sig = spark.createDataFrame(
        [pdf],
        "doc_id long, " + ", ".join(f"h{i} long" for i in range(n)),
    )
    out = DD.lsh_bands(sig, bands=2, rows=4, keep_sig=True)
    carried = [c for c in out.columns if c.startswith("h")]
    assert carried == [f"h{i}" for i in range(n)]  # all 16, not 8
    r = out.collect()[0]
    assert all(r[f"h{i}"] == i * 11 for i in range(n))


def test_state_is_bounded(spark):
    """Functional proof the per-bucket state is capped (round-10
    advisor: the old assertion held by definition for ANY cap). One
    bucket is overfilled: docs 1..16 (signature A) fill the state to
    STREAM_STATE_CAP; docs 17..20 (signature B, disjoint from A) arrive
    over-cap — they match nothing AND must not be stored. Doc 100 then
    arrives with signature B: with an unbounded state it would report
    dup_of=17; with the cap it matches nothing stored, so it emits NO
    row. Docs 2..16 meanwhile prove the screen itself works (dup_of=1,
    matches=16)."""
    cap = DD.STREAM_STATE_CAP
    assert cap == 16  # fixture below is built for this geometry
    n = DD.N_HASHES
    sig_a = [7] * n
    sig_b = [9] * n  # 0 components shared with A (< SIG_MATCH_MIN)

    def row(doc_id, sig):
        return {
            "band": 0,
            "key": "bucket",
            "doc_id": doc_id,
            **{f"h{i}": sig[i] for i in range(n)},
        }

    batch1 = [row(d, sig_a) for d in range(1, 17)] + [
        row(d, sig_b) for d in range(17, 21)
    ]
    batch2 = [row(100, sig_b)]

    import pyarrow as pa

    schema = "band long, key string, doc_id long, " + ", ".join(
        f"h{i} long" for i in range(n)
    )
    stage = tempfile.mkdtemp(prefix="pu_sigcap_")
    try:
        stream = (
            spark.readStream.schema(schema).format("parquet").load(stage)
        )
        q = (
            ST.sig_dedup_stream(stream.groupBy("band", "key"))
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("sig_cap_sink")
            .start()
        )
        try:
            for i, batch in enumerate((batch1, batch2)):
                pq.write_table(
                    pa.Table.from_pylist(batch),
                    os.path.join(stage, f"b{i}.parquet"),
                )
                q.processAllAvailable()
            rows = {
                r["doc_id"]: (r["dup_of"], r["matches"])
                for r in spark.sql("SELECT * FROM sig_cap_sink").collect()
            }
        finally:
            q.stop()
    finally:
        shutil.rmtree(stage, ignore_errors=True)

    for d in range(2, 17):
        assert rows[d] == (1, n)  # the screen works below the cap
    for d in range(17, 21):
        assert d not in rows  # B matches no stored A
    # the cap: docs 17..20 were NOT stored, so doc 100 (signature B)
    # finds no stored match — an unbounded state would emit dup_of=17
    assert 100 not in rows
