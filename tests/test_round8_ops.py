"""Semantic (non-vacuity) checks for the round-8 operators — the oracle
parity gate (test_query_oracle_parity) already hash-checks each against
DuckDB; these pin that the answers actually discriminate, so a refactor
that degenerates one into a constant output still fails."""

from __future__ import annotations

from pyspark.sql import functions as F

from parallelutilities_jl_spark.operators.pipeline import (
    _RS_K,
    q_dsir_importance_weights,
    q_reservoir_sample_per_key,
)
from parallelutilities_jl_spark.operators.similarity import (
    KNN_GRAPH_K,
    q_knn_mutual_graph,
)


def test_dsir_separates_target_from_raw(spark, sf_dir):
    """Importance weights must (a) cover every non-empty doc, (b) put the
    target-language docs on the high side: the mean weight of 'en' docs
    exceeds the mean weight of the rest, and both keep/drop classes are
    non-empty (the score is a ranking, not a constant)."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang")
    )
    scored = q_dsir_importance_weights(spark, sf_dir).join(docs, "doc_id")
    rows = scored.groupBy(
        (F.col("lang") == "en").alias("is_target")
    ).agg(
        F.avg("q_logw").alias("mean_w"), F.count(F.lit(1)).alias("n")
    ).collect()
    by_target = {r["is_target"]: r for r in rows}
    assert by_target[True]["mean_w"] > by_target[False]["mean_w"]
    sel = scored.groupBy("selected").count().collect()
    assert len(sel) == 2  # both kept and dropped docs exist
    n_docs = docs.count()
    assert scored.count() == n_docs  # every fixture doc tokenizes


def test_reservoir_sample_is_exact_bottom_k(spark, sf_dir):
    """Per-source sample size is min(k, |source|), ranks are 1..n dense,
    and the two-stage result equals the single-window ground truth."""
    from pyspark.sql.window import Window as W

    sample = q_reservoir_sample_per_key(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src_sizes = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = {
        r["source"]: r["n"]
        for r in sample.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == {s: min(_RS_K, n) for s, n in src_sizes.items()}
    # ground truth: one global window (fine at test scale)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("rs:"), F.col("doc_id").cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    truth = (
        docs.select("source", "doc_id", h.alias("h"))
        .withColumn(
            "rnk",
            F.row_number()
            .over(W.partitionBy("source").orderBy("h", "doc_id"))
            .cast("long"),
        )
        .filter(F.col("rnk") <= _RS_K)
    )
    assert sample.exceptAll(truth).count() == 0
    assert truth.exceptAll(sample).count() == 0


def test_knn_mutual_graph_properties(spark, sf_dir):
    """Edges exist (each cell's closest pair is always mutual), are
    canonically oriented src < dst, stay within a cell, and per-node
    degree is bounded by k."""
    edges = q_knn_mutual_graph(spark, sf_dir)
    rows = edges.collect()
    assert rows, "mutual kNN graph should never be empty on the fixture"
    assert all(r["src"] < r["dst"] for r in rows)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label"
    )
    cells = {r["vec_id"]: r["label"] for r in emb.collect()}
    assert all(cells[r["src"]] == cells[r["dst"]] for r in rows)
    deg: dict[int, int] = {}
    for r in rows:
        deg[r["src"]] = deg.get(r["src"], 0) + 1
        deg[r["dst"]] = deg.get(r["dst"], 0) + 1
    assert max(deg.values()) <= KNN_GRAPH_K
