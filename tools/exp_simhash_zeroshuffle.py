"""SUPERSEDED by tools/stress_fingerprints.py — this round-6 scratch
experiment measured only sf0.1, where the two variants are within
noise, and led to adopting the HOF fold; the round-7 duel added a 10×
tier and showed the HOF fold 2.4× SLOWER there (the explode+groupBy
exchange is O(docs) thanks to map-side partial aggregation, while the
HOF fold pays 32 interpreted array traversals per row), so dedup.py
was reverted to the exploded shape. Kept for provenance.

Original: measure current explode+groupBy simhash vs zero-shuffle
per-row higher-order-function variant, at sf0.1."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

from parallelutilities_jl_spark.functions import texthash as TH
from parallelutilities_jl_spark.operators.dedup import _simhash_df
from parallelutilities_jl_spark.sources.fixtures import load_table_parallel

SF_DIR = "/root/testdata/sf0.1"


def simhash_zeroshuffle(spark, sf_dir):
    docs = load_table_parallel(spark, sf_dir, "documents")
    hs = F.transform(
        F.array_distinct(TH.words(F.col("text"))),
        lambda w: TH.md5_int48(w),
    )
    hdf = docs.select("doc_id", hs.alias("hs"))
    def vote(b):
        return F.aggregate(
            F.col("hs"),
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1),
        ).alias(f"s{b}")

    votes = [vote(b) for b in range(32)]
    vdf = hdf.select("doc_id", *votes)
    fp = None
    for b in range(32):
        term = F.when(
            F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return vdf.select("doc_id", fp.alias("simhash"))


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("exp_simhash")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # correctness: bit-for-bit identical
    cur = _simhash_df(spark, SF_DIR)
    new = simhash_zeroshuffle(spark, SF_DIR)
    diff = cur.join(new, "doc_id").filter(
        cur["simhash"] != new["simhash"]
    ).count()
    n = cur.count()
    print(f"rows={n} mismatches={diff}")
    assert diff == 0

    for name, fn in (
        ("current", lambda: _simhash_df(spark, SF_DIR)),
        ("zeroshuffle", lambda: simhash_zeroshuffle(spark, SF_DIR)),
    ):
        times = []
        for _ in range(5):
            t0 = time.monotonic()
            fn().selectExpr(
                "count(*) c", "sum(simhash) s"
            ).collect()
            times.append(time.monotonic() - t0)
        times.sort()
        print(f"{name}: median={times[2]:.3f} spread={times[0]:.3f}-{times[-1]:.3f}")

    spark.stop()


if __name__ == "__main__":
    main()
