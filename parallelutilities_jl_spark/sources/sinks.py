"""Sinks: the DataFrameWriter surface the reference lacks entirely (its
results return in-process — reference src/mapreduce.jl:253). On Spark
the write layout IS a query optimization: hive-partitioned output turns
later filters into directory pruning, bucketed output (operators/
joins.py) removes later shuffles.

100 TB guidance encoded here:
* partition by low-cardinality, always-filtered columns only (a
  partition per distinct value — a high-cardinality key creates millions
  of tiny files);
* target file sizes via repartition(cols) before the write so each hive
  partition gets one writer task, not one file per input task.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-partitioned parquet: one directory tree level per column in
    `partition_cols`; a later `WHERE col = v` scans only that subtree."""
    (
        df.repartition(*partition_cols)
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_pruned(
    spark: SparkSession, path: str, **equals: object
) -> DataFrame:
    """Read a partitioned dataset with equality filters that resolve as
    partition pruning (no data files outside the matching directories
    are opened)."""
    df = spark.read.parquet(path)
    for col, val in equals.items():
        df = df.filter(df[col] == val)
    return df


def partition_values(path: str, col: str) -> list[str]:
    """The hive directory names actually written (for tests/ops)."""
    return sorted(
        d.split("=", 1)[1]
        for d in os.listdir(path)
        if d.startswith(f"{col}=")
    )
