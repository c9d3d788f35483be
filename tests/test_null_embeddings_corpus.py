"""NULL-robustness gate for the embedding/ANN surface: every
embeddings-only oracle query must keep cross-engine parity on a corpus
with NULL vectors and NULL labels. Found-by-probe round 7: Spark kept
NULL-embedding rows (NULL distances ranking under engine-specific NULL
ordering) while the oracles' UNNEST dropped them — closed by the
shared-loader filter (similarity._emb_double) and the NULL-label
exclusion in ann_index_delta."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from tests.harness_util import _norm

EMB_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

EMB_QUERIES = [
    "ann_cosine_topk",
    "hard_negative_mining",
    "ann_int8_topk",
    "ann_ivf_topk",
    "ann_lsh_bucket",
    "knn_mutual_graph",
    "embedding_cosine_dups",
    "embedding_cosine_exact",
    "embedding_norm_stats",
    "embedding_diversity",
    "kmeans_assign",
    "kmeans_assign_two_level",
    "ivf_trained_census",
    "ann_ivf_trained_topk",
    "ann_ivf_multiprobe_topk",
    "semantic_dedup",
    "semantic_dedup_scaled",
    "ann_pq_topk",
    "ann_pq_rerank_topk",
    "ann_index_delta",
    "embedding_power_iteration",
    "knn_components",
    "embedding_abtt_census",
    "embedding_dim_plan",
    "ann_nprobe_plan",
]


@pytest.fixture(scope="module")
def null_emb_corpus(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("null_emb_corpus")
    rng = random.Random(7)
    rows = []
    for i in range(80):
        vec = (
            None
            if i % 11 == 0 and i > 0
            else [rng.uniform(-1, 1) for _ in range(64)]
        )
        lab = None if i % 13 == 0 else i % 4
        rows.append((i, vec, lab))
    spark.createDataFrame(rows, EMB_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(d / "embeddings.parquet"))
    return str(d)


@pytest.mark.parametrize("qname", EMB_QUERIES)
def test_null_embeddings_parity(spark, null_emb_corpus, qname):
    import __spark_entry__ as entrymod

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[qname](spark, null_emb_corpus)
    s_cols = list(sdf.columns)
    s_rows = sdf.collect()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{null_emb_corpus}/embeddings.parquet/*.parquet'"
    )
    arr = con.execute(osql[qname]).fetch_arrow_table()
    d_cols = arr.schema.names
    d_rows = [tuple(r[c] for c in d_cols) for r in arr.to_pylist()]
    con.close()
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows), (len(s_rows), len(d_rows))
    order = sorted(s_cols)
    si = [s_cols.index(c) for c in order]
    di = [d_cols.index(c) for c in order]
    a = sorted((tuple(_norm(r[i]) for i in si) for r in s_rows), key=repr)
    b = sorted((tuple(_norm(r[i]) for i in di) for r in d_rows), key=repr)
    assert a == b
