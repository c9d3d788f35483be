"""Partitioned-parquet sink: write → directory layout → pruning plan →
read-back equivalence."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from parallelutilities_jl_spark.sources.fixtures import load_table
from parallelutilities_jl_spark.sources.sinks import (
    partition_values,
    read_pruned,
    write_partitioned,
)


@pytest.fixture(scope="module")
def events_by_type(spark, sf_dir):
    path = tempfile.mkdtemp(prefix="pu_sink_")
    ev = load_table(spark, sf_dir, "events")
    write_partitioned(ev, path, ["event_type"])
    yield path, ev
    shutil.rmtree(path, ignore_errors=True)


def test_hive_layout_written(spark, events_by_type):
    path, ev = events_by_type
    types = {r[0] for r in ev.select("event_type").distinct().collect()}
    assert set(partition_values(path, "event_type")) == types


def test_filter_becomes_partition_pruning(spark, events_by_type):
    path, ev = events_by_type
    some_type = ev.select("event_type").first()[0]
    df = read_pruned(spark, path, event_type=some_type)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the equality filter must resolve at the directory level
    assert "PartitionFilters: [" in plan
    assert "event_type" in plan.split("PartitionFilters")[1][:200]


def test_roundtrip_counts_match(spark, events_by_type):
    path, ev = events_by_type
    some_type = ev.select("event_type").first()[0]
    pruned_n = read_pruned(spark, path, event_type=some_type).count()
    direct_n = ev.filter(F.col("event_type") == some_type).count()
    assert pruned_n == direct_n


def test_one_file_per_partition(spark, events_by_type):
    import os

    path, _ = events_by_type
    for d in os.listdir(path):
        if d.startswith("event_type="):
            files = [
                f
                for f in os.listdir(f"{path}/{d}")
                if f.endswith(".parquet")
            ]
            # repartition(cols) before the write → one writer per value
            assert len(files) == 1
