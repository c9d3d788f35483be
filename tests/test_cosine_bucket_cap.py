"""Round-7: embedding_cosine_dups' hyperplane-LSH self-join gained the
same bucket cap as the MinHash/SimHash tiers (8-bit band keys average
N/256 vectors per bucket — quadratic unbounded). Cap is mirrored in
the oracle; exercise the drop branch with identical vectors (every
band bucket holds every vector) and a lowered cap, cross-engine."""

from __future__ import annotations

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

EMB_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

N_VECS = 5
VEC = [1.0 if j % 2 == 0 else -1.0 for j in range(64)]


@pytest.fixture(scope="module")
def same_vecs(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cos_cap")
    rows = [(i, VEC, 0) for i in range(N_VECS)]
    spark.createDataFrame(rows, EMB_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(d / "embeddings.parquet"))
    return str(d)


def _oracle_rows(sql: str, sf_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf_dir}/embeddings.parquet/*.parquet'"
    )
    rows = con.execute(sql).fetchall()
    con.close()
    return sorted(rows)


def test_cap_drops_hot_cos_buckets_in_both_engines(
    spark, same_vecs, monkeypatch
):
    from parallelutilities_jl_spark.operators import similarity as S

    # control: identical vectors are pairwise cos=1 dups in both engines
    got = sorted(
        (r["ia"], r["ib"], r["cos_e6"])
        for r in S.q_embedding_cosine_dups(spark, same_vecs).collect()
    )
    assert len(got) == N_VECS * (N_VECS - 1) // 2
    assert got == _oracle_rows(S._oracle_cosine_dups(), same_vecs)

    # cap below the bucket size: every band bucket holds all N vectors,
    # so no candidate survives — in BOTH engines
    monkeypatch.setattr(S, "COS_MAX_BUCKET", N_VECS - 1)
    assert S.q_embedding_cosine_dups(spark, same_vecs).count() == 0
    assert _oracle_rows(
        S._oracle_cosine_dups(N_VECS - 1), same_vecs
    ) == []
