"""Physical join strategies for cluster scale: bucketed co-located
joins and skew salting.

The reference sidesteps shuffles entirely — its partitioning is static
and deterministic (`nelementsdroptake`, reference
src/productsplit.jl:124-130), so data never moves between workers after
the initial split. On Spark the analogous discipline is:

* **bucketing** — persist both sides of a recurring fact-fact join
  bucketed by the join key; Spark then sort-merge-joins bucket-to-bucket
  with NO Exchange on either side. This is the 100 TB answer to
  "lineitem ⋈ orders shuffles 100 TB every query".
* **salting** — when one join key dominates (skew), AQE's skew-join
  splitting handles sort-merge joins automatically; salting is the
  explicit fallback that also works for aggregations: spread the hot key
  across `n_salts` sub-keys, replicate the small side per sub-key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from parallelutilities_jl_spark.sources.fixtures import load_table


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Persist `df` bucketed (and optionally sorted) by `key`.

    Bucket-pruned scans + exchange-free joins for every later query that
    joins or aggregates on `key` — the write-once-shuffle-never layout."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_equijoin(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key; with matching
    bucket counts Spark plans a SortMergeJoin with no Exchange.

    The MERGE hint keeps the planner on the sort-merge path even when a
    side is small enough to broadcast (at fixture scale) — fact-fact
    joins at 100 TB can't broadcast, and the point here is the
    exchange-free bucket-to-bucket plan."""
    return (
        spark.table(left_table)
        .hint("MERGE")
        .join(spark.table(right_table), key)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: the big side gets a deterministic salt
    in [0, n_salts) (row-content hash — no RNG, so plans stay
    reproducible), the small side is replicated once per salt value, and
    the join key becomes (key, salt). A hot key's rows now land on
    n_salts reducers instead of one.

    Result is identical to `big.join(small, key)` (inner).

    The salt mixes the physical partition id into the row-content hash:
    fully identical duplicate rows are the *common* shape of real key
    skew, and a pure content hash would send them all to one salt —
    a no-op exactly in the pathological case. Partition id is stable
    within a run, so plans stay reproducible."""
    salt_col = F.pmod(
        F.xxhash64(*big.columns) + F.spark_partition_id().cast("long"),
        F.lit(n_salts),
    ).alias("_salt")
    big_s = big.select("*", salt_col)
    small_s = small.select(
        "*",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"), F.lit(n_salts - 1).cast("long")
            )
        ).alias("_salt"),
    )
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")


def runtime_filtered_join(
    lineitem: DataFrame, orders: DataFrame
) -> DataFrame:
    """Selective dim-slice ⋈ fact join shaped to benefit from Spark's
    runtime bloom-filter injection (InjectRuntimeFilter): the filtered
    orders side is small, the lineitem side is huge, and neither is
    pre-bucketed — so at warehouse scale Catalyst builds a bloom filter
    from the filtered orderkeys and pushes `might_contain(l_orderkey)`
    into the fact scan, dropping ~97% of fact rows BEFORE the join
    shuffle.

    Declarative on purpose: with default confs the filter arms itself
    exactly when it pays (probe scan > 10 GB — i.e. at the 100 TB target,
    not at fixture scale, where broadcast wins anyway).
    tests/test_cluster_and_plans.py simulates the size condition and
    asserts the bloom filter lands in the optimized plan."""
    sel = orders.where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderstatus") == "F")
    ).select("o_orderkey", "o_orderdate")
    joined = lineitem.join(
        sel, lineitem["l_orderkey"] == sel["o_orderkey"]
    )
    from parallelutilities_jl_spark.operators.relational import (
        _money,
        _two_tier_sums,
        _vol4,
    )

    projected = joined.select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        _vol4().alias("v4"),
    )
    return _two_tier_sums(
        projected, ["month"], {"t_rev": F.col("v4")}, {"n_lines": None}
    ).select("month", "n_lines", _money("t_rev", 1e4).alias("revenue"))


def q_runtime_filtered_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return runtime_filtered_join(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
    )


def key_skew_profile(df: DataFrame, key: str) -> DataFrame:
    """Shuffle-key skew diagnostic: per-key frequency profile reduced to
    the numbers that decide a salting strategy — total rows, distinct
    keys, the hottest key's share, and the salt fan-out that would level
    it (`ceil(max_cnt / avg_cnt)`, i.e. how many reducers the hot key's
    rows should spread over to cost no more than an average key).

    This is the planning half of `salted_join`: run the profile once on
    a sampled or full scan, feed `rec_salts` into the join. Integer
    arithmetic only (ceil via (a + b - 1) div b), so the oracle matches
    bit-for-bit. One map-side-combinable count per key, then a
    single-row reduce — at 100 TB the profile costs one narrow shuffle
    of (key, partial_count) pairs."""
    tc = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    prof = tc.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
    )
    # hot key's rows per average key's rows, rounded up — integer-only
    # ceil (a div b on BIGINT), no float division anywhere
    return prof.withColumn(
        "rec_salts",
        F.expr("(max_cnt * n_keys + n_rows - 1) div n_rows"),
    )


def q_skew_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile the events stream's natural shuffle key (user_id)."""
    return key_skew_profile(load_table(spark, sf_dir, "events"), "user_id")


def q_salted_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted lineitem ⋈ orders aggregated per order status — must equal
    the unsalted join (oracle below is the plain join)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderstatus"
    )
    from parallelutilities_jl_spark.operators.relational import (
        _e2,
        _money,
        _two_tier_sums,
    )

    joined = salted_join(li, orders, "okey", n_salts=8)
    # exact int64-quantized sum (repo float-parity policy): exact
    # regardless of the salt-induced combine order
    return _two_tier_sums(
        joined,
        ["o_orderstatus"],
        {"t_qty": _e2(F.col("l_quantity"))},
        {"n_lines": None},
    ).select(
        "o_orderstatus", "n_lines", _money("t_qty", 100.0).alias("sum_qty")
    )


ORACLES = {
    "skew_profile_events": """
WITH tc AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id),
a AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
             MAX(cnt) AS max_cnt
      FROM tc)
SELECT n_rows, n_keys, max_cnt,
       (max_cnt * n_keys + n_rows - 1) // n_rows AS rec_salts
FROM a
""",
    "runtime_filtered_join": """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(FLOOR((l_extendedprice) * 100 + 0.5) AS BIGINT)
                * (100 - CAST(FLOOR((l_discount) * 100 + 0.5) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
GROUP BY 1
""",
    "salted_join_orders": """
SELECT o_orderstatus, COUNT(*) AS n_lines,
       CAST(SUM(CAST(FLOOR((l_quantity) * 100 + 0.5) AS BIGINT)) AS DOUBLE)
       / 100.0 AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
""",
}

QUERIES = {
    "salted_join_orders": q_salted_join_orders,
    "runtime_filtered_join": q_runtime_filtered_join,
    "skew_profile_events": q_skew_profile_events,
}
