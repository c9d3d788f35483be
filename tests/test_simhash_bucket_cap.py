"""Round-7: the simhash band self-join gained the same bucket cap as
the minhash path (a band key is only 8 bits, so buckets are ~N/256 and
the join is quadratic unbounded). The cap is mirrored in the DuckDB
oracle; exercise the drop branch — unreachable at fixture scale — by
lowering the cap over a corpus of identical docs (all 4 band buckets
hold every doc), and assert BOTH engines drop identically."""

from __future__ import annotations

import duckdb
import pytest

from tests.test_messy_corpus import DOC_SCHEMA

N_DOCS = 6
DOCS = [
    (i, "the same document text repeated verbatim for everyone", "en",
     "s", 50)
    for i in range(N_DOCS)
]


@pytest.fixture(scope="module")
def same_docs(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("simhash_cap")
    spark.createDataFrame(DOCS, DOC_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    return str(d)


def _oracle_rows(sql: str, sf_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    rows = con.execute(sql).fetchall()
    con.close()
    return sorted(rows)


def test_cap_drops_hot_band_buckets_in_both_engines(
    spark, same_docs, monkeypatch
):
    from parallelutilities_jl_spark.operators import dedup as D

    # control: identical docs are all pairwise hamming-0 near-dups
    got = D.q_simhash_near_dup(spark, same_docs).collect()
    assert len(got) == N_DOCS * (N_DOCS - 1) // 2
    assert _oracle_rows(
        D._oracles()["simhash_near_dup"], same_docs
    ) == sorted((r["doc_a"], r["doc_b"], r["hamming"]) for r in got)

    # cap below the bucket size: every band bucket holds all N docs,
    # so every bucket drops and no candidate survives — in BOTH engines
    monkeypatch.setattr(D, "MAX_LSH_BUCKET", N_DOCS - 1)
    assert D.q_simhash_near_dup(spark, same_docs).count() == 0
    assert _oracle_rows(D._oracles()["simhash_near_dup"], same_docs) == []
