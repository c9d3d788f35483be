"""Approximate-aggregate sketches — the single-pass estimators a 100 TB
pipeline uses where exact answers are unaffordable (engine-extension
surface; the reference returns exact reductions only).

* `approx_count_distinct` — HyperLogLog++: fixed-size (KB) sketch per
  group, mergeable map-side, one narrow shuffle regardless of NDV. The
  exact rollup (`COUNT(DISTINCT)`) re-shuffles the raw keys — at corpus
  scale that's the difference between KBs and TBs on the wire.
* `approx_percentile` — mergeable quantile digest; same story vs a full
  sort.
* `cms_heavy_hitters` — count-min sketch over the token stream: k×m
  bounded counters (here 4×1024 ≈ KBs) whose row-minimum upper-bounds
  any token's true frequency; heavy hitters surface without keeping the
  full vocabulary. Built from deterministic md5 hashes shared with the
  DuckDB oracle, so unlike HLL/percentile the sketch itself is
  hash-checked, not just tolerance-checked.

Oracle form: HLL/percentile sketch values differ across engines by
construction, so each query emits the EXACT value (both engines agree)
plus a boolean `within_tol` computed Spark-side from
|approx − exact| / exact; the DuckDB oracle asserts the same exact value
and `TRUE`. The tolerance is 3–5× the estimator's configured error, so
the check is meaningful (a broken sketch fails) without being flaky.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parallelutilities_jl_spark.functions import texthash as TH
from parallelutilities_jl_spark.sources.fixtures import (
    load_table,
    load_table_parallel,
)

NDV_RSD = 0.02  # HLL relative standard deviation; tol below is 5x
NDV_TOL = 0.10  # 5x rsd: a broken sketch fails, engine jitter doesn't
PCTL_ACCURACY = 10_000  # approx_percentile: rank err <= N/accuracy
PCTL_RANK_TOL = 0.02  # sketch value must sit within 2% of median rank


def q_approx_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per order-priority: HLL estimate checked
    against the exact rollup.

    Shape (round-17, guide §2.3): mixing COUNT(DISTINCT) with
    approx_count_distinct in ONE aggregate makes the planner key the
    HLL partial on (priority, custkey) — a full ~400-word sketch
    buffer PER DISTINCT PAIR (412-column rows, ~GBs at sf0.1) through
    the first exchange. Deduplicating the pairs with a narrow
    2-column aggregate first and computing BOTH statistics over the
    distinct pairs shuffles 2 longs per pair instead; the HLL state is
    bit-identical because register updates are idempotent on duplicate
    values (a duplicate key re-applies the same hash to the same
    register), and COUNT over the distinct pairs IS the exact NDV.
    Measured 1.34 s -> 0.24 s exec at sf0.1 (plan: 412-col exchange ->
    2-col exchange)."""
    orders = load_table(spark, sf_dir, "orders")
    pairs = orders.select("o_orderpriority", "o_custkey").distinct()
    return pairs.groupBy("o_orderpriority").agg(
        F.count("o_custkey").alias("exact_ndv"),
        (
            (
                F.abs(
                    F.approx_count_distinct("o_custkey", rsd=NDV_RSD)
                    - F.count("o_custkey")
                ).cast("double")
                / F.count("o_custkey")
            )
            <= NDV_TOL
        ).alias("within_tol"),
    )


ORACLE_APPROX_NDV = """
SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS exact_ndv,
       TRUE AS within_tol
FROM orders GROUP BY o_orderpriority
"""


def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median order value per priority.

    The exact side is the LOWER median — the actual element at rank
    ceil(n/2) — not an interpolated value: an element passes through
    both engines bit-identically, whereas interpolation (and any ROUND
    of it) can differ by 1 ulp cross-engine (float-parity policy).

    The sketch assertion is the two-sided rank condition
    ``frac(< approx) <= 0.5 + tol AND frac(<= approx) >= 0.5 - tol``,
    which holds for ANY correct median answer regardless of group size
    or duplicate mass (a one-sided |frac(<=) - 0.5| test false-fails
    when n is small or >tol of the rows equal the median)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    grp = Window.partitionBy("o_orderpriority")
    ranked = (
        orders.withColumn(
            "rn", F.row_number().over(grp.orderBy("o_totalprice"))
        )
        .withColumn("n", F.count(F.lit(1)).over(grp))
    )
    exact = (
        ranked.where(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select(
            "o_orderpriority", F.col("o_totalprice").alias("exact_p50")
        )
    )
    approx = orders.groupBy("o_orderpriority").agg(
        F.expr(
            f"approx_percentile(o_totalprice, 0.5, {PCTL_ACCURACY})"
        ).alias("approx_p50"),
        F.count(F.lit(1)).alias("n"),
    )
    rank_ok = (
        orders.join(F.broadcast(approx), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            (
                (
                    F.sum(
                        (F.col("o_totalprice") < F.col("approx_p50"))
                        .cast("long")
                    )
                    <= (0.5 + PCTL_RANK_TOL) * F.first("n")
                )
                & (
                    F.sum(
                        (F.col("o_totalprice") <= F.col("approx_p50"))
                        .cast("long")
                    )
                    >= (0.5 - PCTL_RANK_TOL) * F.first("n")
                )
            ).alias("within_tol"),
        )
    )
    return exact.join(rank_ok, "o_orderpriority")


ORACLE_APPROX_PCTL = """
SELECT o_orderpriority, exact_p50, TRUE AS within_tol
FROM (
  SELECT o_orderpriority, o_totalprice AS exact_p50,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
) WHERE rn = (n + 1) // 2
"""


CMS_ROWS = 4  # hash rows: P(overestimate > eps*N on all rows) ~ e^-4
CMS_BUCKETS = 1024  # counters per row: eps = e / 1024 of total mass
CMS_TOPK = 20


def _cms_projections(tc: DataFrame) -> DataFrame:
    """(tok, cnt) -> one row per (tok, hash-row i) with the row's bucket.

    Bucket = first 60 md5 bits of "i:cms:tok" mod m — computable
    bit-identically in DuckDB (functions/texthash.py), which is what lets
    the oracle check the sketch VALUES, not just a tolerance."""
    return tc.select(
        "tok",
        "cnt",
        F.explode(F.array([F.lit(i) for i in range(CMS_ROWS)])).alias("i"),
    ).withColumn(
        "bucket",
        TH.md5_int60(
            F.concat(F.col("i").cast("string"), F.lit(":cms:"), F.col("tok"))
        )
        % CMS_BUCKETS,
    )


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 heavy-hitter tokens by count-min estimate, with the exact
    count beside the (never-under) estimate.

    100 TB shape: the only corpus-sized shuffle is the token-count
    aggregation (map-side combinable; at scale the CMS rows would be
    built directly from partial counts). The sketch itself is k×m = 4096
    rows — broadcast to score candidates — and the top-k is a
    TakeOrdered, not a full sort. Deterministic output: total order
    (est DESC, tok) before the cut."""
    docs = load_table_parallel(spark, sf_dir, "documents")
    toks = docs.select(F.explode(TH.words(F.col("text"))).alias("tok"))
    tc = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    pr = _cms_projections(tc)
    cms = pr.groupBy("i", "bucket").agg(F.sum("cnt").alias("row_total"))
    est = (
        pr.join(F.broadcast(cms), ["i", "bucket"])
        .groupBy("tok")
        .agg(
            F.min("row_total").alias("est"),
            F.max("cnt").alias("exact_cnt"),
        )
    )
    return est.orderBy(F.desc("est"), "tok").limit(CMS_TOPK)


ORACLE_CMS_HEAVY_HITTERS = f"""
WITH toks AS (
  SELECT unnest({TH.dd_words('text')}) AS tok FROM documents
),
tc AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
pr AS (
  SELECT tok, cnt, i,
         ('0x' || substr(md5(CAST(i AS VARCHAR) || ':cms:' || tok), 1, 15))::BIGINT
           % {CMS_BUCKETS} AS bucket
  FROM tc, (VALUES (0), (1), (2), (3)) s(i)
),
cms AS (
  SELECT i, bucket, CAST(SUM(cnt) AS BIGINT) AS row_total
  FROM pr GROUP BY i, bucket
),
est AS (
  SELECT tok, MIN(row_total) AS est, MAX(cnt) AS exact_cnt
  FROM pr JOIN cms USING (i, bucket) GROUP BY tok
)
SELECT tok, est, exact_cnt FROM est ORDER BY est DESC, tok LIMIT {CMS_TOPK}
"""


QUERIES = {
    "approx_distinct_check": q_approx_ndv,
    "approx_percentile_check": q_approx_percentile,
    "cms_heavy_hitters": q_cms_heavy_hitters,
}

ORACLES = {
    "approx_distinct_check": ORACLE_APPROX_NDV,
    "approx_percentile_check": ORACLE_APPROX_PCTL,
    "cms_heavy_hitters": ORACLE_CMS_HEAVY_HITTERS,
}
