"""Sketch-specific properties beyond the oracle parity gate."""

from __future__ import annotations

from parallelutilities_jl_spark.operators import sketches as SK


def test_cms_estimate_never_undercounts(spark, sf_dir):
    """Count-min's defining guarantee: every row of the sketch
    upper-bounds the true count, so est = min(rows) >= exact."""
    rows = SK.q_cms_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == SK.CMS_TOPK
    assert all(r["est"] >= r["exact_cnt"] > 0 for r in rows)
    # the list is a descending frequency ranking with a total tiebreak
    ests = [r["est"] for r in rows]
    assert ests == sorted(ests, reverse=True)


def test_cms_sketch_is_bounded(spark, sf_dir):
    """The sketch table itself never exceeds k*m rows no matter the
    corpus (that bound is the whole point at 100 TB)."""
    from pyspark.sql import functions as F

    from parallelutilities_jl_spark.functions import texthash as TH
    from parallelutilities_jl_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(TH.words(F.col("text"))).alias("tok"))
    tc = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    cms = (
        SK._cms_projections(tc)
        .groupBy("i", "bucket")
        .agg(F.sum("cnt").alias("row_total"))
    )
    assert cms.count() <= SK.CMS_ROWS * SK.CMS_BUCKETS
