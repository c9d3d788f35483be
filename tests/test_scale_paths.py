"""Cluster-scale physical strategies: bucketed co-located joins (no
Exchange) and skew salting (same result, spread keys)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from parallelutilities_jl_spark.operators.joins import (
    bucketed_equijoin,
    q_salted_join_orders,
    salted_join,
    write_bucketed,
)
from parallelutilities_jl_spark.sources.fixtures import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    loc = tempfile.mkdtemp(prefix="pu_bucketdemo_")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdemo LOCATION '{loc}'")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    write_bucketed(li, "bucketdemo.li_b", "l_orderkey", 8)
    write_bucketed(orders, "bucketdemo.orders_b", "l_orderkey", 8)
    yield "bucketdemo.li_b", "bucketdemo.orders_b"
    spark.sql("DROP DATABASE bucketdemo CASCADE")
    shutil.rmtree(loc, ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    df = bucketed_equijoin(spark, left, right, "l_orderkey")
    plan = _plan(df)
    # bucket-to-bucket: the join must not shuffle either side
    assert "Exchange" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    bucketed_n = bucketed_equijoin(spark, left, right, "l_orderkey").count()
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    plain_n = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).count()
    assert bucketed_n == plain_n


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    left, _ = bucketed_tables
    df = spark.table(left).groupBy("l_orderkey").agg(F.sum("l_quantity"))
    # the groupBy key is the bucket key: aggregation needs no shuffle
    assert "Exchange" not in _plan(df)


def test_salted_join_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderstatus"
    )
    salted = salted_join(li, orders, "okey", n_salts=4)
    plain = li.join(orders, "okey")
    assert salted.count() == plain.count()
    s = salted.groupBy("o_orderstatus").count().collect()
    p = plain.groupBy("o_orderstatus").count().collect()
    assert sorted(map(tuple, s)) == sorted(map(tuple, p))


def test_salted_join_spreads_hot_key(spark):
    # one key owning 90% of rows must land on several salt partitions
    big = spark.range(10000).select(
        F.when(F.col("id") < 9000, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    from parallelutilities_jl_spark.operators.joins import salted_join

    out = salted_join(big, small, "k", n_salts=8)
    assert out.count() == big.join(small, "k").count()


# ---------------------------------------------------------------------------
# quadratic-blowup guards in the dedup candidate generators
# ---------------------------------------------------------------------------


def _skewed_shingles(spark, n_docs=60, hot_df=None):
    """Synthetic (doc_id, sh) shingle table where EVERY doc shares one
    stopword-like shingle ('the quick brown') plus a few unique ones —
    the pathological shape a df-uncapped self-join turns into C(n, 2)
    pairs."""
    hot_df = hot_df if hot_df is not None else n_docs
    rows = []
    for d in range(n_docs):
        if d < hot_df:
            rows.append((d, "the quick brown"))
        for u in range(3):
            rows.append((d, f"unique shingle {d} {u}"))
    return spark.createDataFrame(rows, "doc_id long, sh string")


def test_ngram_df_cap_bounds_candidates(spark):
    """With a df cap below the hot shingle's frequency, candidate count is
    bounded by the cold shingles only (zero here: uniques never collide)."""
    sh = _skewed_shingles(spark, n_docs=60)
    dfreq = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= 50)
        .select("sh")
    )
    sh_cold = sh.join(dfreq, "sh", "left_semi")
    sa, sb = sh_cold.alias("sa"), sh_cold.alias("sb")
    n_cand = (
        sa.join(
            sb,
            (F.col("sa.sh") == F.col("sb.sh"))
            & (F.col("sa.doc_id") < F.col("sb.doc_id")),
        )
        .select("sa.doc_id", "sb.doc_id")
        .distinct()
        .count()
    )
    assert n_cand == 0  # uncapped would be C(60, 2) = 1770


def test_lsh_bucket_cap_bounds_candidates(spark):
    """candidate_pairs drops band buckets larger than max_bucket: a
    degenerate all-identical bucket contributes zero pairs under the cap,
    C(n, 2) without it."""
    from parallelutilities_jl_spark.operators.dedup import candidate_pairs

    n = 50
    bands = spark.createDataFrame(
        [(d, 0, "samekey") for d in range(n)] + [(1, 1, "k1"), (2, 1, "k1")],
        "doc_id long, band long, key string",
    )
    capped = candidate_pairs(bands, max_bucket=10)
    uncapped = candidate_pairs(bands, max_bucket=None)
    assert capped.count() == 1  # only the small band-1 bucket survives
    # (1,2) occurs in both buckets and distinct() collapses it
    assert uncapped.count() == n * (n - 1) // 2


def test_funnel_windows_are_shard_partitioned(spark, sf_dir):
    """sequence_packing / corpus_shuffle global-order operators: the
    DATA-SIZED window (the one computing the per-row running value) must
    itself be partitioned by shard, with unpartitioned windows confined
    to the S-row offsets funnel — the plan shape that survives a 100 TB
    corpus. The assertion targets the specific window function, not the
    whole plan string: the funnel branch also mentions shard, so a
    plan-wide substring check would pass even on a regressed global-sort
    plan."""
    import re

    from parallelutilities_jl_spark.operators.pipeline import (
        q_corpus_shuffle,
        q_sequence_packing,
    )

    for fn, rowfun in (
        (q_sequence_packing, r"sum\(n_tokens"),
        (q_corpus_shuffle, r"row_number\(\)"),
    ):
        plan = _plan(fn(spark, sf_dir))
        # find the per-row window node and check ITS partition spec:
        # `<rowfun>... windowspecdefinition(shard#..., <order> ASC`
        pat = rowfun + r"[^\n]*windowspecdefinition\(shard#\d+L?,"
        assert re.search(pat, plan), f"{fn.__name__}: data-sized window " \
            f"is not shard-partitioned:\n{plan[:2000]}"


def test_incremental_dedup_store_never_shuffles(spark, sf_dir):
    """incremental_dedup's ingest screen: every join touching the
    corpus-sized store side must be a broadcast probe (the incoming
    batch's keys broadcast over the store, the surviving hits broadcast
    back) — a shuffle join of the store would make ingest O(|corpus|).
    The batch-internal canonical join may shuffle at real scale; at
    fixture scale everything broadcasts, so any shuffle join appearing
    here means the probe-side pushdown regressed."""
    from parallelutilities_jl_spark.operators.dedup import (
        q_incremental_dedup,
    )

    plan = _plan(q_incremental_dedup(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
