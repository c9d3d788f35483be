"""Data-layout operators: Z-order clustering for multi-dimensional
data skipping.

The reference never needs this — its data is a closed-form product grid,
so "layout" is the partition arithmetic itself (reference
src/productsplit.jl:124-130). A 100 TB warehouse table is the opposite:
layout is the difference between scanning everything and scanning the
few files a box predicate touches. Sorting by a Morton key before the
write keeps parquet min/max tight on BOTH interleaved dimensions, so
predicates on either dimension prune row groups; partitioning by a
coarse z-cell prunes whole directories (partition pruning, asserted in
tests/test_layout.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from parallelutilities_jl_spark.functions import zorder as Z
from parallelutilities_jl_spark.sources.fixtures import load_table

CELL_SHIFT = 20  # drop 20 key bits -> 1024x1024 tiles (10 bits per dim)
EPOCH = "1970-01-01"


def order_dims(orders: DataFrame) -> DataFrame:
    """The two layout dimensions: customer (hash-like id space) and
    order day (time) — the classic point-lookup-by-customer plus
    time-range workload that single-column sorting can't serve."""
    return orders.select(
        "o_orderkey",
        (F.col("o_custkey") % Z.MAX_DIM).alias("x"),
        (F.datediff("o_orderdate", F.lit(EPOCH)) % Z.MAX_DIM)
        .cast("long")
        .alias("y"),
    )


def with_zkey(dims: DataFrame) -> DataFrame:
    return dims.withColumn(
        "zkey", Z.morton_key(F.col("x"), F.col("y"))
    ).withColumn("zcell", F.shiftright(F.col("zkey"), CELL_SHIFT))


def q_zorder_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per z-cell occupancy and dimension extents over orders.

    The extents ARE the layout guarantee: every cell spans < 2^10 in
    each dimension (tests assert it), which is exactly why a file or
    row group holding one cell's rows has tight min/max on both columns
    and box predicates skip it. Pure integer bit arithmetic — the
    oracle recomputes identical z-keys."""
    cells = with_zkey(order_dims(load_table(spark, sf_dir, "orders")))
    return cells.groupBy("zcell").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
    )


ORACLE_ZORDER_CELL_STATS = f"""
WITH dims AS (
  SELECT o_orderkey,
         o_custkey % {Z.MAX_DIM} AS x,
         CAST(date_diff('day', DATE '{EPOCH}', CAST(o_orderdate AS DATE))
              % {Z.MAX_DIM} AS BIGINT) AS y
  FROM orders
),
keyed AS (
  SELECT x, y, ({Z.dd_morton_key('x', 'y')}) >> {CELL_SHIFT} AS zcell
  FROM dims
)
SELECT zcell, COUNT(*) AS n,
       MIN(x) AS min_x, MAX(x) AS max_x,
       MIN(y) AS min_y, MAX(y) AS max_y
FROM keyed GROUP BY zcell
"""


QUERIES = {
    "zorder_cell_stats": q_zorder_cell_stats,
}

ORACLES = {
    "zorder_cell_stats": ORACLE_ZORDER_CELL_STATS,
}
