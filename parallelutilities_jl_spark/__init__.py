"""parallelutilities_jl_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of jishnub/ParallelUtilities.jl.

The reference (read-only at /root/reference) is a Julia HPC parallel
map-reduce library built around:

* deterministic balanced block-partitioning of lazy Cartesian products of
  ranges (``src/productsplit.jl``),
* O(1) per-partition metadata queries (min/max/count/membership/lookup
  without iterating, ``src/productsplit.jl:345-928``),
* topology-aware ordered tree reductions (``src/trees.jl``,
  ``src/mapreduce.jl``), and
* a reduction-operator algebra (commutativity tags, elementwise broadcast
  combiners, ragged stacking, ``src/reductionfunctions.jl``).

This package re-expresses that computational surface Spark-first
(DataFrame/SQL, Catalyst-optimized), and — because it is hosted on Spark —
adds the full relational operator surface plus LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) designed for
100 TB scale.

Layout:
    sources/    fixture loaders + range/product/zip sources
    plans/      partition planning: ProductSpec / splits / closed-form
                metadata expressions, plus the DuckDB-oracle SQL generator
    operators/  mapreduce engine, reduction algebra, relational queries,
                dedup / similarity / text / multimodal operators
    functions/  reusable column-expression helpers (mixed-radix codecs,
                array math, portable hashing)
    streaming/  Structured Streaming windows + watermark surface
"""

__version__ = "0.1.0"

from parallelutilities_jl_spark.session import get_spark  # noqa: F401

# the reference's five exports (reference src/ParallelUtilities.jl:6-10),
# re-expressed Spark-first — plus the planning types they operate on


def __getattr__(name):  # lazy: importing the package must not need a JVM
    if name in (
        "pmapreduce",
        "pmapreduce_productsplit",
        "pmapbatch",
        "pmapbatch_productsplit",
        "workerrank",
        "nworkers",
    ):
        from parallelutilities_jl_spark.operators import mapreduce

        return getattr(mapreduce, name)
    if name in ("ProductSpec", "ProductSplit", "ProductSection"):
        from parallelutilities_jl_spark.plans import productsplit

        return getattr(productsplit, name)
    if name == "RangeSpec":
        from parallelutilities_jl_spark.sources.ranges import RangeSpec

        return RangeSpec
    raise AttributeError(name)
