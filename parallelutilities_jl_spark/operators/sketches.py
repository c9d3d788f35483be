"""Approximate-aggregate sketches — the single-pass estimators a 100 TB
pipeline uses where exact answers are unaffordable (engine-extension
surface; the reference returns exact reductions only).

* `approx_count_distinct` — HyperLogLog++: fixed-size (KB) sketch per
  group, mergeable map-side, one narrow shuffle regardless of NDV. The
  exact rollup (`COUNT(DISTINCT)`) re-shuffles the raw keys — at corpus
  scale that's the difference between KBs and TBs on the wire.
* `approx_percentile` — mergeable quantile digest; same story vs a full
  sort.

Oracle form: sketch values differ across engines by construction, so
each query emits the EXACT value (both engines agree) plus a boolean
`within_tol` computed Spark-side from |approx − exact| / exact; the
DuckDB oracle asserts the same exact value and `TRUE`. The tolerance is
3–5× the estimator's configured error, so the check is meaningful (a
broken sketch fails) without being flaky.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parallelutilities_jl_spark.sources.fixtures import load_table

NDV_RSD = 0.01  # HLL relative standard deviation; tol below is 5x
NDV_TOL = 0.05
PCTL_ACCURACY = 10_000  # approx_percentile: rank err <= N/accuracy
PCTL_RANK_TOL = 0.02  # sketch value must sit within 2% of median rank


def q_approx_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per order-priority: HLL estimate checked
    against the exact rollup."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_ndv"),
        (
            (
                F.abs(
                    F.approx_count_distinct("o_custkey", rsd=NDV_RSD)
                    - F.countDistinct("o_custkey")
                ).cast("double")
                / F.countDistinct("o_custkey")
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
    """Median order value per priority. The digest returns an actual
    data value (the exact percentile interpolates), so a value-distance
    check is gap-dependent; the meaningful assertion is RANK: the
    fraction of values at or below the sketch's answer must sit within
    PCTL_RANK_TOL of 0.5."""
    orders = load_table(spark, sf_dir, "orders")
    exact = F.expr("percentile(o_totalprice, 0.5)")
    approx = F.expr(
        f"approx_percentile(o_totalprice, 0.5, {PCTL_ACCURACY})"
    )
    per_grp = orders.groupBy("o_orderpriority").agg(
        F.round(exact, 4).alias("exact_p50"), approx.alias("approx_p50")
    )
    return (
        orders.join(F.broadcast(per_grp), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.first("exact_p50").alias("exact_p50"),
            (
                F.abs(
                    F.avg(
                        (F.col("o_totalprice") <= F.col("approx_p50"))
                        .cast("double")
                    )
                    - 0.5
                )
                <= PCTL_RANK_TOL
            ).alias("within_tol"),
        )
    )


ORACLE_APPROX_PCTL = """
SELECT o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS exact_p50,
       TRUE AS within_tol
FROM orders GROUP BY o_orderpriority
"""


QUERIES = {
    "approx_distinct_check": q_approx_ndv,
    "approx_percentile_check": q_approx_percentile,
}

ORACLES = {
    "approx_distinct_check": ORACLE_APPROX_NDV,
    "approx_percentile_check": ORACLE_APPROX_PCTL,
}
