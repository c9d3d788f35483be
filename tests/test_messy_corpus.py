"""Messy-corpus robustness: the text/dedup/pipeline operators must not
crash (ANSI mode raises on bad casts/overflow) and must produce sane
rows on inputs real corpora actually contain — NULL text, empty text,
whitespace-only, unicode, and the empty table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

MESSY = [
    (0, None, "en", "src0", 0),
    (1, "", "en", "src0", 0),
    (2, "   ", "en", "src1", 3),
    (3, "naïve café — 中文 текст 🙂", "zh", "src1", 24),
    (4, "the quick brown fox jumps over the lazy dog", "en", "src2", 43),
    (5, "the quick brown fox jumps over the lazy dog", "en", "src2", 43),
]


@pytest.fixture(scope="module")
def messy_docs(spark, tmp_path_factory):
    """Messy rows written as a parquet 'documents' table so the query
    entry points (which take sf_dir) run unchanged."""
    d = tmp_path_factory.mktemp("messy")
    spark.createDataFrame(MESSY, DOC_SCHEMA).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    return str(d)


@pytest.fixture(scope="module")
def empty_docs(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty")
    spark.createDataFrame([], DOC_SCHEMA).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def _doc_queries():
    from parallelutilities_jl_spark.operators import dedup, pipeline, text

    qs = {}
    qs.update(text.QUERIES)
    qs.update(pipeline.QUERIES)
    qs.update(
        {
            k: v
            for k, v in dedup.QUERIES.items()
            if k
            in (
                "dedup_exact",
                "minhash_near_dup",
                "simhash_fingerprint",
                "quality_canonical_dedup",
            )
        }
    )
    return sorted(qs.items())


@pytest.mark.parametrize(
    "name,fn", _doc_queries(), ids=[n for n, _ in _doc_queries()]
)
def test_messy_rows_do_not_crash(spark, messy_docs, name, fn):
    rows = fn(spark, messy_docs).collect()
    assert isinstance(rows, list)  # completed without raising


@pytest.mark.parametrize(
    "name,fn", _doc_queries(), ids=[n for n, _ in _doc_queries()]
)
def test_empty_table(spark, empty_docs, name, fn):
    assert fn(spark, empty_docs).count() == 0


def test_exact_dedup_finds_the_dup(spark, messy_docs):
    from parallelutilities_jl_spark.operators.dedup import q_dedup_exact

    out = {
        r["doc_id"]: r["is_dup"]
        for r in q_dedup_exact(spark, messy_docs).collect()
    }
    assert out[4] and out[5]  # the identical pair
    assert not out[3]  # unicode doc is unique, and hashing didn't mangle it


def test_filter_pipeline_counts_null_text_as_dropped(spark, messy_docs):
    from parallelutilities_jl_spark.operators.pipeline import (
        q_filter_pipeline,
    )

    rows = {
        r["source"]: r for r in q_filter_pipeline(spark, messy_docs).collect()
    }
    # src0 is the NULL + empty docs: present in totals, kept by nothing
    assert rows["src0"]["n_total"] == 2 and rows["src0"]["n_kept"] == 0


def test_null_text_absent_from_per_doc_fingerprints(spark, messy_docs):
    """The zero-shuffle HOF folds must keep the explode-era row
    semantics: a NULL-text doc has no tokens, so it appears in NO
    per-doc fingerprint/signature frame (the DuckDB oracles' UNNEST
    drops it; an all-zero fingerprint row would be a silent parity
    break on real corpora)."""
    from parallelutilities_jl_spark.operators.dedup import (
        _simhash_df,
        minhash_per_doc,
    )
    from parallelutilities_jl_spark.operators.text import q_doc_fingerprint

    sim_ids = {r["doc_id"] for r in _simhash_df(spark, messy_docs).collect()}
    assert 0 not in sim_ids  # NULL text
    assert 1 in sim_ids  # empty string still tokenizes to ['']
    mh_ids = {
        r["doc_id"] for r in minhash_per_doc(spark, messy_docs).collect()
    }
    assert 0 not in mh_ids
    fp_ids = {
        r["doc_id"]
        for r in q_doc_fingerprint(spark, messy_docs).collect()
    }
    assert 0 not in fp_ids


def test_connected_components_chain_and_nonconvergence(spark):
    """A chain graph converges to one component (min-label propagation
    needs diameter-many rounds), and an under-capped run raises instead
    of silently returning intermediate (wrong) labels."""
    from parallelutilities_jl_spark.operators import dedup
    from parallelutilities_jl_spark.operators.dedup import (
        connected_components,
    )

    n = 8
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )
    comp = connected_components(edges)
    rows = comp.collect()
    assert len(rows) == n + 1
    assert {r["component_id"] for r in rows} == {0}
    # the tiny-graph gate is pinned to 0 so the single-task fast path
    # (which cannot fail to converge) does not bypass the loop bound
    # under test (the graph stays under the contraction gate, so the
    # flat loop sees the full chain diameter as before)
    old_tiny = dedup._CC_TINY_MAX_ROWS
    try:
        dedup._CC_TINY_MAX_ROWS = 0
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(edges, max_iters=3).collect()
    finally:
        dedup._CC_TINY_MAX_ROWS = old_tiny


def test_quality_canonical_differs_from_min_id(spark):
    """The quality-argmax canonical must actually CHANGE survivors vs
    the min-doc_id policy on the real corpus — otherwise the operator is
    a vacuous relabeling of dedup_components. sf0.01 has ~22 multi-doc
    dup clusters; in roughly half the best-quality member is not the
    lowest id."""
    from parallelutilities_jl_spark.operators.dedup import (
        q_quality_canonical_dedup,
    )

    rows = q_quality_canonical_dedup(spark, "/root/testdata/sf0.01").collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["component_id"], []).append(r)
    multi = [v for v in by_comp.values() if len(v) > 1]
    assert multi, "no multi-doc dup clusters — dedup pipeline broken"
    nonmin = [
        v
        for v in multi
        if v[0]["canonical_doc_id"] != min(r["doc_id"] for r in v)
    ]
    assert nonmin, "canonical always == min id — quality argmax vacuous"
    # exactly one survivor per component, and it is its own canonical
    for v in by_comp.values():
        keeps = [r for r in v if r["keep"]]
        assert len(keeps) == 1
        assert keeps[0]["doc_id"] == keeps[0]["canonical_doc_id"]
