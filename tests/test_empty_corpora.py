"""Empty-table contract for the events and embeddings surfaces (the
documents analog lives in test_messy_corpus): every query must return
an EMPTY result with its normal schema, never crash — the trained-model
tier (k-means/IVF/PQ) used to KeyError/AnalysisException when there
were no vectors to initialize a model from."""

from __future__ import annotations

import pytest

from tests.test_null_embeddings_corpus import EMB_QUERIES, EMB_SCHEMA
from tests.test_null_events_corpus import EV_SCHEMA, EVENTS_QUERIES

# queries whose output is a census/aggregate frame that legitimately
# emits summary rows even over zero input (e.g. a 3-step funnel of
# zeros, a 1-row skew profile, a 1-row diversity panel)
NONEMPTY_ON_EMPTY = {"funnel_conversion", "skew_profile_events",
                     "embedding_diversity"}


def _doc_tier_queries():
    from parallelutilities_jl_spark.operators import (
        dedup,
        multimodal,
        retrieval,
    )

    return sorted(
        set(dedup.QUERIES) | set(retrieval.QUERIES) | set(multimodal.QUERIES)
    )


# census frames over zero docs also legitimately emit summary rows
NONEMPTY_ON_EMPTY |= {"dedup_eval_confusion", "triangle_count"}
# the round-13 planner censuses emit their full config spine (nine tau
# deciles / four band geometries) with zero counts over zero docs —
# mirrored exactly by their oracles' spine constructions
NONEMPTY_ON_EMPTY |= {"dedup_threshold_sensitivity", "lsh_banding_plan"}
# global-aggregate planner frames (groupBy().agg) emit one NULL-valued
# summary row over zero input in BOTH engines
NONEMPTY_ON_EMPTY |= {"session_gap_plan", "embedding_dim_plan"}
# round-14: the nprobe plan keeps its 1..4 probe-count spine (zero
# candidates, NULL recall) even over zero vectors — matching the
# oracle's unconditional range() frame (ADVICE round-13 item)
NONEMPTY_ON_EMPTY |= {"ann_nprobe_plan"}


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    from tests.test_messy_corpus import DOC_SCHEMA

    d = tmp_path_factory.mktemp("empty_corpora")
    spark.createDataFrame([], EV_SCHEMA).write.mode("overwrite").parquet(
        str(d / "events.parquet")
    )
    spark.createDataFrame([], EMB_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(d / "embeddings.parquet"))
    spark.createDataFrame([], DOC_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "qname", EVENTS_QUERIES + EMB_QUERIES + _doc_tier_queries()
)
def test_empty_input_returns_empty_result(spark, empty_dir, qname):
    import __spark_entry__ as entrymod

    df = entrymod.queries()[qname](spark, empty_dir)
    rows = df.collect()
    assert df.columns  # schema intact
    if qname not in NONEMPTY_ON_EMPTY:
        assert rows == []
