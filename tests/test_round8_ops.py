"""Semantic (non-vacuity) checks for the round-8 operators — the oracle
parity gate (test_query_oracle_parity) already hash-checks each against
DuckDB; these pin that the answers actually discriminate, so a refactor
that degenerates one into a constant output still fails."""

from __future__ import annotations

from pyspark.sql import functions as F

from parallelutilities_jl_spark.operators.pipeline import (
    _RS_K,
    q_dsir_importance_weights,
    q_reservoir_sample_per_key,
)
from parallelutilities_jl_spark.operators.similarity import (
    KNN_GRAPH_K,
    q_knn_mutual_graph,
)


def test_dsir_separates_target_from_raw(spark, sf_dir):
    """Importance weights must (a) cover every non-empty doc, (b) put the
    target-language docs on the high side: the mean weight of 'en' docs
    exceeds the mean weight of the rest, and both keep/drop classes are
    non-empty (the score is a ranking, not a constant)."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang")
    )
    scored = q_dsir_importance_weights(spark, sf_dir).join(docs, "doc_id")
    rows = scored.groupBy(
        (F.col("lang") == "en").alias("is_target")
    ).agg(
        F.avg("q_logw").alias("mean_w"), F.count(F.lit(1)).alias("n")
    ).collect()
    by_target = {r["is_target"]: r for r in rows}
    assert by_target[True]["mean_w"] > by_target[False]["mean_w"]
    sel = scored.groupBy("selected").count().collect()
    assert len(sel) == 2  # both kept and dropped docs exist
    n_docs = docs.count()
    assert scored.count() == n_docs  # every fixture doc tokenizes


def test_reservoir_sample_is_exact_bottom_k(spark, sf_dir):
    """Per-source sample size is min(k, |source|), ranks are 1..n dense,
    and the two-stage result equals the single-window ground truth."""
    from pyspark.sql.window import Window as W

    sample = q_reservoir_sample_per_key(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src_sizes = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = {
        r["source"]: r["n"]
        for r in sample.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == {s: min(_RS_K, n) for s, n in src_sizes.items()}
    # ground truth: one global window (fine at test scale)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("rs:"), F.col("doc_id").cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    truth = (
        docs.select("source", "doc_id", h.alias("h"))
        .withColumn(
            "rnk",
            F.row_number()
            .over(W.partitionBy("source").orderBy("h", "doc_id"))
            .cast("long"),
        )
        .filter(F.col("rnk") <= _RS_K)
    )
    assert sample.exceptAll(truth).count() == 0
    assert truth.exceptAll(sample).count() == 0


def test_bigram_pmi_ranks_association_not_frequency(spark, sf_dir):
    """PMI output respects the support floor, the ranking is
    non-constant, and the score actually reorders relative to raw
    frequency (otherwise it degenerated into vocab_top_bigrams)."""
    from parallelutilities_jl_spark.operators.text import (
        PMI_MIN_COUNT,
        PMI_TOP_K,
        q_bigram_pmi_top,
    )

    rows = q_bigram_pmi_top(spark, sf_dir).collect()
    assert 0 < len(rows) <= PMI_TOP_K
    assert all(r["c_xy"] >= PMI_MIN_COUNT for r in rows)
    assert len({r["q_pmi"] for r in rows}) > 1
    by_pmi = [
        (r["x"], r["y"])
        for r in sorted(rows, key=lambda r: (-r["q_pmi"], r["x"], r["y"]))
    ]
    by_freq = [
        (r["x"], r["y"])
        for r in sorted(rows, key=lambda r: (-r["c_xy"], r["x"], r["y"]))
    ]
    assert by_pmi != by_freq


def test_power_iteration_improves_rayleigh_quotient(spark, sf_dir):
    """The returned direction is unit-norm and captures at least as
    much second-moment energy as the e_0 init (power iteration is
    monotone in the Rayleigh quotient)."""
    import numpy as np

    from parallelutilities_jl_spark.operators.clustering import (
        q_embedding_power_iteration,
    )

    v_rows = q_embedding_power_iteration(spark, sf_dir).collect()
    assert len(v_rows) == 64
    v = np.zeros(64)
    for r in v_rows:
        v[r["j"]] = r["v"]
    assert abs(np.linalg.norm(v) - 1.0) < 1e-6
    X = np.array(
        [
            r["embedding"]
            for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select("embedding")
            .collect()
            if r["embedding"] is not None
        ],
        dtype=np.float64,
    )
    e0 = np.zeros(64)
    e0[0] = 1.0
    rq = lambda u: float((X @ u) @ (X @ u))  # noqa: E731
    assert rq(v) >= rq(e0)


def test_split_drift_psi_flags_real_drift_only(spark, sf_dir, tmp_path):
    """The fixture's hash split draws train/test from one distribution,
    so PSI must stay under the alert threshold; an injected
    split-correlated length shift must flag."""
    from parallelutilities_jl_spark.operators.pipeline import (
        _KNUTH,
        _TRAIN_LT,
        q_split_drift_psi,
    )

    clean = q_split_drift_psi(spark, sf_dir).collect()
    # tiny per-source samples make the RAW psi noisy by construction —
    # the flag's noise allowance is what must absorb that
    assert clean and all(not r["drifted"] for r in clean)
    # inject drift: train-bucket docs get 10x the length of test docs
    rows = []
    for i in range(400):
        b = (i * _KNUTH) % (2**32) % 100
        n = 2000 if b < _TRAIN_LT else 100
        rows.append((i, "x " * 5, "en", "srcA", n))
    import pandas as pd

    spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
        )
    ).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    drifted = q_split_drift_psi(spark, str(tmp_path)).collect()
    assert len(drifted) == 1 and drifted[0]["drifted"]


def test_fuzzy_contamination_catches_paraphrased_eval_doc(
    spark, sf_dir, tmp_path
):
    """A corpus doc that is a lightly-edited copy of an eval doc (one
    word appended — beyond the exact screen's full-shingle match on
    short docs, squarely in near-dup territory) must flag; an unrelated
    doc must not."""
    import pandas as pd

    from parallelutilities_jl_spark.operators.pipeline import (
        EVAL_SOURCE,
        q_fuzzy_contamination,
    )

    eval_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near_copy = eval_text + " lambda"
    unrelated = "one two three four five six seven eight nine ten"
    rows = [
        (0, eval_text, "en", EVAL_SOURCE, len(eval_text)),
        (1, near_copy, "en", "srcX", len(near_copy)),
        (2, unrelated, "en", "srcX", len(unrelated)),
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).pipe(spark.createDataFrame).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = q_fuzzy_contamination(spark, str(tmp_path)).collect()
    assert [r["doc_id"] for r in got] == [1]
    assert got[0]["n_eval_hits"] == 1
    assert got[0]["max_jac_e6"] > 300_000  # well past the 0.3 threshold


def test_abtt_census_energy_fractions_are_sane(spark, sf_dir):
    """Per-cell top-direction energy fraction lies in (0, 1), the
    residual complements it, and every embedding is counted."""
    from parallelutilities_jl_spark.operators.clustering import (
        q_embedding_abtt_census,
    )

    rows = q_embedding_abtt_census(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["f_top"] < 1.0
        assert abs(r["f_top"] + r["resid_frac"] - 1.0) < 1e-12
    n = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter("embedding IS NOT NULL")
        .count()
    )
    assert sum(r["n_vecs"] for r in rows) == n


def test_knn_components_are_consistent_with_edges(spark, sf_dir):
    """Both endpoints of every mutual edge share a component, the
    component id is the minimum member, and only edge-connected vectors
    are labeled."""
    from parallelutilities_jl_spark.operators.clustering import (
        q_knn_components,
    )
    from parallelutilities_jl_spark.operators.similarity import (
        q_knn_mutual_graph,
    )

    comp = {
        r["vec_id"]: r["component_id"]
        for r in q_knn_components(spark, sf_dir).collect()
    }
    edges = [
        (r["src"], r["dst"])
        for r in q_knn_mutual_graph(spark, sf_dir).collect()
    ]
    assert comp and edges
    assert set(comp) == {v for e in edges for v in e}
    for s, d in edges:
        assert comp[s] == comp[d]
    members: dict[int, list[int]] = {}
    for v, c in comp.items():
        members.setdefault(c, []).append(v)
    assert all(min(vs) == c for c, vs in members.items())


def test_knn_mutual_graph_properties(spark, sf_dir):
    """Edges exist (each cell's closest pair is always mutual), are
    canonically oriented src < dst, connect only vectors whose TRAINED
    probe-cell sets intersect (the constant-size cells of
    `_sampled_fit` + `_two_level_probes` — not the fixture's
    corpus-growing label cells), and per-node degree is bounded by
    k."""
    from parallelutilities_jl_spark.operators.clustering import (
        KNN_GRAPH_NPROBE,
        _sampled_fit,
        _two_level_probes,
    )

    edges = q_knn_mutual_graph(spark, sf_dir)
    rows = edges.collect()
    assert rows, "mutual kNN graph should never be empty on the fixture"
    assert all(r["src"] < r["dst"] for r in rows)
    emb_all, centroids = _sampled_fit(spark, sf_dir)
    probes: dict[int, set] = {}
    for r in _two_level_probes(
        emb_all, centroids, KNN_GRAPH_NPROBE
    ).collect():
        probes.setdefault(r["vec_id"], set()).add(r["cluster"])
    assert all(probes[r["src"]] & probes[r["dst"]] for r in rows)
    deg: dict[int, int] = {}
    for r in rows:
        deg[r["src"]] = deg.get(r["src"], 0) + 1
        deg[r["dst"]] = deg.get(r["dst"], 0) + 1
    assert max(deg.values()) <= KNN_GRAPH_K
