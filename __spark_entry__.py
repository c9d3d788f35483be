"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Queries are assembled from the engine's per-module registries — one entry
per implemented operator from SURVEY.md §2 (plus the relational and
LLM-pipeline surfaces the north star mandates).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship star-join aggregate on sf0.001 (SURVEY §7 phase 0):
    returned-item revenue per customer through the lineitem→orders→
    customer→nation star join, dimensions broadcast."""
    from parallelutilities_jl_spark.operators.relational import (
        q_returned_items,
    )

    return q_returned_items(spark, "/root/testdata/sf0.001")


def _registries():
    from parallelutilities_jl_spark.plans import queries as plan_q
    from parallelutilities_jl_spark.operators import relational

    mods = [
        (plan_q.QUERIES, plan_q.oracle_queries()),
        (relational.QUERIES, relational.ORACLES),
    ]
    for name in ("mapreduce", "reductions", "dedup", "similarity", "text",
                 "multimodal", "joins", "pipeline", "clustering",
                 "sketches"):
        try:
            import importlib

            m = importlib.import_module(
                f"parallelutilities_jl_spark.operators.{name}"
            )
            mods.append((getattr(m, "QUERIES", {}), getattr(m, "ORACLES", {})))
        except ImportError:
            continue
    try:
        from parallelutilities_jl_spark.streaming import windows as sw

        mods.append((getattr(sw, "QUERIES", {}), getattr(sw, "ORACLES", {})))
    except ImportError:
        pass
    return mods


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for qs, _ in _registries():
        for k, v in qs.items():
            if k in out:
                raise ValueError(f"duplicate query name {k}")
            out[k] = v
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for _, oracles in _registries():
        out.update({k: v for k, v in oracles.items() if v is not None})
    return out
