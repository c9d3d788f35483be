"""Decode-on-ingest: the REAL BMP synth -> strict parse -> census
function must produce identical results over a file-source STREAM
(complete output mode) and the batch frame — Spark's unified model
applied to the multimodal codec path, so a real deployment can run the
same decode census on its landing zone."""

from __future__ import annotations

from parallelutilities_jl_spark.operators.multimodal import (
    decode_census_from_docs,
)
from parallelutilities_jl_spark.sources.fixtures import load_table
from parallelutilities_jl_spark.streaming import windows as SW
from tests.test_streaming import _norm, _run_stream


def test_stream_decode_census_equals_batch(spark, sf_dir):
    docs_stream = SW.stream_documents(spark, sf_dir)
    got = _run_stream(
        spark, decode_census_from_docs(docs_stream), "t_decode_census"
    )
    want = decode_census_from_docs(
        load_table(spark, sf_dir, "documents")
    ).collect()
    assert _norm(got) == _norm(want)
    assert got, "census must be non-empty at sf0.001"


def test_stream_media_census_equals_batch(spark, sf_dir):
    """Round-15: the MIXED-modality census (real BMP/WAV/GIF synth →
    modality-dispatched decode → keyed agg) over a file-source stream
    must equal the batch frame — the full default pipeline, not just
    the BMP tier, composes with Structured Streaming unchanged."""
    from parallelutilities_jl_spark.operators.multimodal import (
        media_decode_census_from_docs,
    )

    docs_stream = SW.stream_documents(spark, sf_dir)
    got = _run_stream(
        spark, media_decode_census_from_docs(docs_stream), "t_media_census"
    )
    want = media_decode_census_from_docs(
        load_table(spark, sf_dir, "documents")
    ).collect()
    assert _norm(got) == _norm(want)
    mods = {r.modality for r in got}
    assert mods == {"image", "audio", "video"}
