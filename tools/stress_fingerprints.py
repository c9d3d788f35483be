#!/usr/bin/env python
"""Round-6 verdict task #2: the zero-shuffle (higher-order-function)
fingerprint rewrite regressed sf0.1 medians ~24% for minhash_near_dup /
simhash_fingerprint while eliminating the corpus-sized exchange. That
trade is justified only if the HOF variants hold ≤ the exploded
variants at 10× rows — measure it instead of asserting it.

Duels, each at sf0.1 (5k docs) and the x10 stress tier (50k docs,
tools/scale_stress.build_stress_corpus):

  simhash:  _simhash_df (HOF in-row bit votes, 0 exchanges)
            vs explode(tokens) → groupBy(doc_id) 32-bit vote agg
  minhash:  minhash_per_doc → h0..h15 (HOF per-salt array_min folds)
            vs shingle_docs explode → groupBy(doc_id) 16 min aggs

plus end-to-end timings of the four rewritten queries the verdict
names. Outputs one JSON line per duel; equality of the two variants is
asserted (exceptAll both ways == 0) before any timing is trusted.

NOTE on reading the numbers: local[32] is one JVM — "shuffle" is an
in-memory exchange with zero network cost, so whatever margin the HOF
variant shows here UNDERSTATES its margin on a real cluster, where the
exploded variant's corpus-sized exchange crosses the wire.

    python tools/stress_fingerprints.py        # ~5 min
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF1 = "/root/testdata/sf0.1"
REPS = 3


# ---------------------------------------------------------------------------
# exploded (pre-rewrite) variants, reconstructed for the duel
# ---------------------------------------------------------------------------


def simhash_exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The explode + groupBy(doc_id) shape — since round 7 this IS the
    production plan (dedup._simhash_df), so the duel measures the real
    code path."""
    from parallelutilities_jl_spark.operators.dedup import _simhash_df

    return _simhash_df(spark, sf_dir)


def minhash_exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shingle-explode + groupBy(doc_id) signature shape
    minhash_per_doc replaced (signature columns only)."""
    from parallelutilities_jl_spark.operators.dedup import (
        minhash_signatures,
        shingle_docs,
    )

    return minhash_signatures(shingle_docs(spark, sf_dir))


def simhash_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-6 zero-shuffle HOF fold, reconstructed inline: this
    measured 2.4× SLOWER than the exploded plan at x10 (32 interpreted
    array traversals per row vs one codegen'd partial hash-agg), so
    dedup._simhash_df was reverted to the exploded shape in round 7 —
    this reconstruction keeps the duel reproducible."""
    from parallelutilities_jl_spark.functions import texthash as TH
    from parallelutilities_jl_spark.sources.fixtures import (
        load_table_parallel,
    )

    docs = load_table_parallel(spark, sf_dir, "documents")
    hs = F.transform(
        F.array_distinct(TH.words(F.col("text"))),
        lambda w: TH.md5_int48(w),
    )
    hdf = docs.select("doc_id", hs.alias("hs")).filter(
        F.col("hs").isNotNull()
    )

    def vote(b: int):
        return F.aggregate(
            F.col("hs"),
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1),
        ).alias(f"s{b}")

    vdf = hdf.select("doc_id", *[vote(b) for b in range(32)])
    fp = None
    for b in range(32):
        term = F.when(
            F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return vdf.select("doc_id", fp.alias("simhash"))


def minhash_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parallelutilities_jl_spark.operators.dedup import (
        N_HASHES,
        minhash_per_doc,
    )

    return minhash_per_doc(spark, sf_dir).select(
        "doc_id", *[f"h{i}" for i in range(N_HASHES)]
    )


def _time(fn, spark, sf_dir) -> float:
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
    reps = []
    for _ in range(REPS):
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        reps.append(time.perf_counter() - t0)
    return round(statistics.median(reps), 2)


def main() -> None:
    from parallelutilities_jl_spark.session import get_spark
    import __spark_entry__ as entrymod
    from tools.scale_stress import STRESS, build_stress_corpus

    if not os.path.isdir(STRESS):
        build_stress_corpus()

    spark = get_spark(app_name="pu_stress_fingerprints")
    out: dict[str, dict] = {}

    # equality first (sf0.1 — full bit-for-bit both directions)
    for label, hof, expl in (
        ("simhash", simhash_hof, simhash_exploded),
        ("minhash", minhash_hof, minhash_exploded),
    ):
        a, b = hof(spark, SF1), expl(spark, SF1)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, (
            f"{label}: HOF vs exploded variants disagree — duel void"
        )

    for label, hof, expl in (
        ("simhash", simhash_hof, simhash_exploded),
        ("minhash", minhash_hof, minhash_exploded),
    ):
        row: dict[str, float] = {}
        for tier, sf_dir in (("sf0.1", SF1), ("x10", STRESS)):
            row[f"hof_{tier}"] = _time(hof, spark, sf_dir)
            row[f"exploded_{tier}"] = _time(expl, spark, sf_dir)
        row["hof_growth"] = round(row["hof_x10"] / row["hof_sf0.1"], 1)
        row["exploded_growth"] = round(
            row["exploded_x10"] / row["exploded_sf0.1"], 1
        )
        out[label] = row
        print(json.dumps({label: row}), flush=True)

    # end-to-end: the four rewritten queries the verdict names
    qs = entrymod.queries()
    for name in (
        "minhash_near_dup",
        "simhash_fingerprint",
        "incremental_dedup",
        "ngram_jaccard_pairs",
    ):
        row = {}
        for tier, sf_dir in (("sf0.1", SF1), ("x10", STRESS)):
            row[tier] = _time(qs[name], spark, sf_dir)
        row["growth"] = round(row["x10"] / row["sf0.1"], 1)
        out[name] = row
        print(json.dumps({name: row}), flush=True)

    print(json.dumps({"metric": "stress_fingerprints", "rows": out}))
    spark.stop()


if __name__ == "__main__":
    main()
