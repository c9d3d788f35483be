"""Cluster-topology introspection (reference src/clusterquery.jl §2.7).

The reference queries which workers live on which host to build its
topology-aware reduction tree. On Spark, executor placement is the
scheduler's concern (locality-aware scheduling, AQE), so these operators
are *diagnostics*: they answer the same questions — worker ranks, hosts,
workers-per-host, effective pool size — against the live session.

`hostnames` runs a one-task-per-partition probe (the Spark analog of the
reference's `@fetchfrom p gethostname()` fan-out, src/clusterquery.jl:22-29);
the pool-trimming helpers are pure arithmetic mirroring
`maybetrimmedworkerpool` (src/clusterquery.jl:114-117). Excluded from the
oracle gate (environment-dependent), covered by tests.
"""

from __future__ import annotations

import socket
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hostnames(spark: SparkSession, n_probes: int | None = None) -> DataFrame:
    """(rank, host) for each probe task — one per default-parallelism slot
    (reference `hostnames`, src/clusterquery.jl:22-29)."""
    n = n_probes or spark.sparkContext.defaultParallelism

    def probe(idx, _it):
        yield (idx + 1, socket.gethostname())

    rdd = spark.sparkContext.parallelize(range(n), n).mapPartitionsWithIndex(probe)
    return spark.createDataFrame(rdd, "rnk int, host string")


def nodenames(spark: SparkSession) -> list[str]:
    """Unique hosts (reference `nodenames`, src/clusterquery.jl:38-42)."""
    return sorted(
        r["host"] for r in hostnames(spark).select("host").distinct().collect()
    )


def procs_node(spark: SparkSession) -> "OrderedDict[str, list[int]]":
    """host → ranks (reference `procs_node`, src/clusterquery.jl:50-58)."""
    rows = (
        hostnames(spark)
        .groupBy("host")
        .agg(F.sort_array(F.collect_list("rnk")).alias("rnks"))
        .orderBy("host")
        .collect()
    )
    return OrderedDict((r["host"], list(r["rnks"])) for r in rows)


def nprocs_node(spark: SparkSession) -> "OrderedDict[str, int]":
    """host → worker count (reference `nprocs_node`, src/clusterquery.jl:66-81)."""
    return OrderedDict(
        (h, len(v)) for h, v in procs_node(spark).items()
    )


def maybetrimmedworkerpool(spark: SparkSession, n_tasks: int) -> int:
    """Effective pool size: never more workers than tasks (reference
    src/clusterquery.jl:114-117; Spark analog of AQE partition coalescing
    — used to pick `np` for product splits)."""
    return max(1, min(spark.sparkContext.defaultParallelism, n_tasks))


def workersactive(spark: SparkSession, n_tasks: int) -> list[int]:
    """Ranks that receive non-empty splits, chosen with the reference's
    locality preference (reference `workersactive`,
    src/clusterquery.jl:83-88 — it delegates to `chooseworkers` with the
    host map, so same-host ranks are preferred when the trimmed pool is
    smaller than the full pool)."""
    n = maybetrimmedworkerpool(spark, n_tasks)
    return chooseworkers(spark, n)


def oneworkerpernode(spark: SparkSession) -> list[int]:
    """First rank on each host (reference `oneworkerpernode`,
    src/clusterquery.jl:124-136)."""
    return [v[0] for v in procs_node(spark).values()]


def chooseworkers(
    spark: SparkSession, n: int, myhost: str | None = None
) -> list[int]:
    """Pick ``n`` worker ranks preferring the caller's host — the
    reference's locality-aware pool selection (`chooseworkers`,
    src/clusterquery.jl:90-112): if the local host has enough workers,
    use only those; otherwise fill with remote ranks in host order.

    Diagnostic parity only: Spark's scheduler already places tasks
    locality-first, so nothing in the engine consumes this — it answers
    the same question the reference API answers."""
    pn = procs_node(spark)
    myhost = myhost or socket.gethostname()
    same = list(pn.get(myhost, []))
    if len(same) >= n:
        return same[:n]
    others = [r for h, v in pn.items() if h != myhost for r in v]
    return (same + others)[:n]


def workers_myhost(spark: SparkSession) -> list[int]:
    """Ranks co-located with the driver (reference `workers_myhost`,
    src/clusterquery.jl:143-144)."""
    me = socket.gethostname()
    return procs_node(spark).get(me, [])
