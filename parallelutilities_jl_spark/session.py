"""SparkSession builder tuned for this engine.

Local-mode defaults mirror what we would set on a real cluster:

* AQE on (runtime partition coalescing, skew-join splitting) — the Spark
  analog of the reference's pool trimming (`maybetrimmedworkerpool`,
  reference src/clusterquery.jl:114-117) and balanced block partitioning.
* shuffle.partitions sized to cores, not the 200 default.
* Arrow enabled for every Pandas-UDF exchange.
* Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "parallelutilities_jl_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    On a real cluster the caller passes a pre-built session; everything in
    this package only assumes a `SparkSession`, never local mode.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Parquet scans: pushdown + pruning are on by default; keep split
        # sizes explicit so partition counts are predictable at any SF.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_package_on_executors(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via ``addPyFile``.

    Arrow-UDF operators (`applyInPandas`/`mapInPandas`) close over
    classes from this package, and cloudpickle serializes those by
    REFERENCE — the executor must be able to `import
    parallelutilities_jl_spark`. That holds when the harness cwd is the
    repo root but breaks anywhere else, so every UDF-backed operator
    calls this first. Idempotent per SparkContext; on a real cluster the
    same zip rides `spark.submit.pyFiles`."""
    sc = spark.sparkContext
    if getattr(sc, "_pu_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    import parallelutilities_jl_spark as pkg

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"pu_jl_spark_pkg_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    sc.addPyFile(zpath)
    sc._pu_pkg_shipped = True


# Runtime-settable knobs the engine needs regardless of who built the
# SparkSession (a harness-supplied session may carry Spark's defaults:
# 200 shuffle partitions, no AQE coalescing, local timezone, Arrow off —
# each of which costs either wall-clock or oracle parity). Everything
# here is a *runtime* conf: safe to set on a live session, scoped to it.
_RUNTIME_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def tune_runtime(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime execution knobs to an externally built
    session (idempotent, cheap). Called at the top of every public query
    entry point: on a session from `get_spark` it is a no-op; on a
    default-config session it turns on AQE partition coalescing and
    rights-sizes `shuffle.partitions` to the session's core count — at
    small scale factors Spark's 200-partition default makes every
    exchange latency-bound (200 near-empty tasks per shuffle)."""
    if getattr(spark, "_pu_tuned", False):
        return spark
    conf = dict(_RUNTIME_CONF)
    conf["spark.sql.shuffle.partitions"] = str(
        spark.sparkContext.defaultParallelism
    )
    for k, v in conf.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # a cluster may pin some confs immutable; keep going
    spark._pu_tuned = True
    return spark


# ---------------------------------------------------------------------------
# Cached-block lifetime policy (round-13 verdict items 1/4)
# ---------------------------------------------------------------------------
#
# The engine pins blocks two ways: per-call `localCheckpoint()` /
# `persist()` inside individual queries (freed only when the RDD handle
# is GC'd AND the ContextCleaner runs), and module-level fit caches
# (clustering.py `_FIT_CACHE` and peers) that intentionally keep a
# checkpointed frame alive for reuse within a session. Neither is freed
# by `spark.catalog.clearCache()` (which only drops catalog-cached
# relations), so a long-lived session running the full 234-query roster
# accumulates storage-memory blocks without bound — the round-13 driver
# bench degraded progressively (heavy heads 5-8x) with exactly that
# signature. The policy: after a query's result has been fully
# materialized (written/collected), the caller may release EVERYTHING —
# module caches first (so no dict keeps a handle to a frame whose
# checkpoint blocks are about to vanish; a localCheckpoint has no
# lineage to recompute from), then every persistent RDD in the context.

_CACHE_CLEANERS: list = []

# every module-level dict that holds DataFrame handles (fit caches
# etc.) — `block_scope` evicts entries ADDED inside a scope before
# freeing the scope's blocks, so no cache dangles on a
# truncated-lineage frame. tests/test_block_release.py mechanically
# asserts every `*CACHE*`-named module dict in the package is
# registered here (the invariant a future unregistered cache would
# silently break).
_SCOPED_CACHES: list[dict] = []


def register_cache_cleaner(fn, caches: tuple[dict, ...] = ()) -> None:
    """Register a zero-arg callable that drops a module-level cache of
    DataFrame handles (fit caches etc.). Called by
    `release_cached_blocks` BEFORE blocks are unpersisted so no cache
    survives holding a frame whose checkpoint blocks were freed. Pass
    the cache dicts themselves via `caches` so `block_scope` can do
    entry-granular eviction (scope-created entries only)."""
    _CACHE_CLEANERS.append(fn)
    _SCOPED_CACHES.extend(caches)


def release_cached_blocks(spark: SparkSession) -> int:
    """Release every cached/checkpointed block in the session: clear
    registered module caches, the catalog cache, and unpersist every
    persistent RDD (which is where `localCheckpoint()` blocks live).
    Returns the number of RDDs unpersisted.

    SAFE only between queries — i.e. after the previous query's result
    was fully materialized and before the next one builds its plan. A
    localCheckpointed RDD has truncated lineage, so unpersisting it
    makes any still-held handle unrecomputable; clearing the module
    caches first guarantees the engine itself holds none. This is the
    100x-scale fix: a resident service running thousands of queries per
    session otherwise leaks storage memory linearly in query count."""
    for fn in list(_CACHE_CLEANERS):
        fn()
    spark.catalog.clearCache()
    n = 0
    # py4j maps java.util.Map to a dict-like JavaMap
    for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        jrdd.unpersist(False)
        n += 1
    return n


@contextmanager
def block_scope(spark: SparkSession):
    """Per-query block-lifetime scope for a RESIDENT multi-query
    service (the 100×-service shape `release_cached_blocks` is too
    blunt for: it unpersists EVERY block, clobbering concurrent
    queries' caches and every warm fit). On exit this releases ONLY
    what appeared inside the scope:

    1. cache entries ADDED to any registered module cache during the
       scope are evicted first (their checkpoint blocks are about to
       vanish; a surviving handle would be unrecomputable — the same
       clear-before-unpersist order the global release enforces);
       entries that existed at entry keep both their handle and their
       blocks, so cross-query cache warmth survives;
    2. persistent RDDs whose ids were not present at entry are
       unpersisted.

    Attribution is by id-set difference, so blocks created by OTHER
    threads' work overlapping this scope in time are released too —
    use one scope per serially executed query; partition genuinely
    concurrent work by job group before trusting finer attribution.

    Yields a dict filled at exit: {"released": n_rdds_unpersisted,
    "evicted": n_cache_entries_dropped}."""
    jsc = spark.sparkContext._jsc
    before = {int(k) for k in jsc.getPersistentRDDs().keys()}
    # snapshot (key, value REFERENCE): an entry OVERWRITTEN under a
    # pre-existing key during the scope must be evicted too — its new
    # checkpoint blocks are about to be unpersisted, and keeping the
    # handle would leave a dangling truncated-lineage frame (the
    # check-then-return memoizers never overwrite today; this enforces
    # the invariant rather than assuming it). Holding the reference —
    # not id() — matters: a del-then-recompute inside the scope frees
    # the old value first, and CPython can hand its address to the
    # replacement, defeating an id-only comparison.
    cache_snapshot = [(c, dict(c)) for c in _SCOPED_CACHES]
    stats: dict[str, int] = {}
    try:
        yield stats
    finally:
        evicted = 0
        for cache, had in cache_snapshot:
            stale = [
                k for k in cache
                if k not in had or cache[k] is not had[k]
            ]
            for k in stale:
                cache.pop(k, None)
                evicted += 1
        released = 0
        jmap = jsc.getPersistentRDDs()
        for k in jmap.keys():
            if int(k) not in before:
                jmap[k].unpersist(False)
                released += 1
        stats["released"] = released
        stats["evicted"] = evicted
