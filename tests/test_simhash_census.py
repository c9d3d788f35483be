"""`simhash_hamming_census` is the SIMHASH_HAM_MAX tuning table: its
`cum_pairs` row at hamming=h is exactly the pair count a near-dup pass
at threshold h accepts over the same banding. Pin that consistency
claim against `simhash_near_dup` itself, the internal cumulative
arithmetic, and the degenerate all-identical corpus — plus the DuckDB
oracle on the fixture corpus (reference parity: the census plays the
role of the reference's tuning sweep over `nelementsdroptake` splits,
reference src/productsplit.jl — a metadata table, not a data pass)."""

from __future__ import annotations

import duckdb
import pytest

from tests.test_messy_corpus import DOC_SCHEMA
from tests.test_simhash_bucket_cap import DOCS, N_DOCS, _oracle_rows


@pytest.fixture(scope="module")
def same_docs(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("simhash_census")
    spark.createDataFrame(DOCS, DOC_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    return str(d)


def test_census_cum_row_equals_near_dup_count(spark):
    """On the real sf0.001 corpus: the cumulative census row at
    h=SIMHASH_HAM_MAX must equal the near-dup pass's accepted-pair
    count — the census IS the knob table for that threshold."""
    from parallelutilities_jl_spark.operators import dedup as D

    sf = "/root/testdata/sf0.001"
    census = {
        r["hamming"]: (r["n_pairs"], r["cum_pairs"])
        for r in D.q_simhash_hamming_census(spark, sf).collect()
    }
    accepted = D.q_simhash_near_dup(spark, sf).count()
    at_or_under = sum(
        n for h, (n, _) in census.items() if h <= D.SIMHASH_HAM_MAX
    )
    assert at_or_under == accepted
    # cumulative arithmetic: cum at the largest h <= threshold matches
    eligible = [h for h in census if h <= D.SIMHASH_HAM_MAX]
    if eligible:
        assert census[max(eligible)][1] == accepted
    # internal consistency: cum is the running sum in hamming order
    running = 0
    for h in sorted(census):
        running += census[h][0]
        assert census[h][1] == running


def test_census_identical_corpus_single_zero_row(spark, same_docs):
    from parallelutilities_jl_spark.operators import dedup as D

    rows = D.q_simhash_hamming_census(spark, same_docs).collect()
    assert len(rows) == 1
    assert rows[0]["hamming"] == 0
    n = N_DOCS * (N_DOCS - 1) // 2
    assert rows[0]["n_pairs"] == n and rows[0]["cum_pairs"] == n


def test_census_matches_oracle_and_respects_cap(
    spark, same_docs, monkeypatch
):
    from parallelutilities_jl_spark.operators import dedup as D

    got = sorted(
        (r["hamming"], r["n_pairs"], r["cum_pairs"])
        for r in D.q_simhash_hamming_census(spark, same_docs).collect()
    )
    assert got == _oracle_rows(
        D._oracles()["simhash_hamming_census"], same_docs
    )
    # cap below bucket size: both engines produce an EMPTY census
    monkeypatch.setattr(D, "MAX_LSH_BUCKET", N_DOCS - 1)
    assert D.q_simhash_hamming_census(spark, same_docs).count() == 0
    assert (
        _oracle_rows(D._oracles()["simhash_hamming_census"], same_docs)
        == []
    )


def test_census_once_filter_equals_pair_distinct(spark):
    """The round-16 first-surviving-agreeing-band filter must count
    exactly the pairs candidate_pairs' pair-distinct counts — one row
    per DISTINCT candidate pair, no more (a band double-count) and no
    fewer (a pair whose min agreeing band was cap-dropped must still
    be counted at its first SURVIVING band)."""
    from pyspark.sql import functions as F

    from parallelutilities_jl_spark.operators import dedup as D

    sf = "/root/testdata/sf0.001"
    got = {
        (r["hamming"], r["n_pairs"])
        for r in D.q_simhash_hamming_census(spark, sf)
        .select("hamming", "n_pairs")
        .collect()
    }
    bands = D._simhash_bands(D._simhash_df(spark, sf))
    cands = D.candidate_pairs(bands, carry=("simhash",))
    ham = F.bit_count(
        F.col("simhash_a").bitwiseXOR(F.col("simhash_b"))
    ).cast("long")
    ref = {
        (r["hamming"], r["n_pairs"])
        for r in cands.select(ham.alias("hamming"))
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .collect()
    }
    assert got == ref and got
