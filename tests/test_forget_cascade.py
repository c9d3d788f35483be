"""Semantic pins for `forget_cascade_plan` beyond oracle parity: the
cascade's invariants on real data, and hand-derived re-election on a
constructed corpus where the cluster canonical is / is not forgotten."""

from __future__ import annotations

from tests.test_messy_corpus import DOC_SCHEMA


def test_cascade_invariants_on_fixture(spark):
    from parallelutilities_jl_spark.operators import dedup as D

    rows = D.q_forget_cascade_plan(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows
    for r in rows:
        assert r["n_forgotten"] >= 1
        assert r["n_forgotten"] <= r["n_members"]
        # NULL re-election exactly when the whole cluster is forgotten
        assert (r["new_canonical"] is None) == (
            r["n_forgotten"] == r["n_members"]
        )
        # removing non-argmax members never changes the argmax, so the
        # canonical changes exactly when the OLD canonical is forgotten
        assert r["canonical_changed"] == (
            r["old_canonical"] % D.FORGET_MOD == 0
        )
        if r["new_canonical"] is not None:
            assert r["new_canonical"] % D.FORGET_MOD != 0


def test_cascade_reelection_hand_derived(spark, tmp_path):
    """Two near-identical docs (one dup cluster): ids 13 (forgotten)
    and 14. Whichever is canonical, the plan must report the cluster
    with n_forgotten=1 and survivor 14 as the new canonical; a second
    cluster with no forgotten member must not appear."""
    from parallelutilities_jl_spark.operators import dedup as D

    body = (
        "the common quick brown fox corpus text shared almost verbatim "
        "between the two documents with enough words to shingle cleanly"
    )
    other = (
        "a completely different pair of documents about gardens and "
        "rivers sharing their own vocabulary and nothing with the fox"
    )
    rows = [
        (13, body + " first", "en", "s", 120),
        (14, body + " second", "en", "s", 120),
        (27, other + " one", "en", "s", 120),  # 27 % 13 = 1 — kept
        (28, other + " two", "en", "s", 120),
    ]
    d = tmp_path
    spark.createDataFrame(rows, DOC_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))

    plan = {
        r["component_id"]: r
        for r in D.q_forget_cascade_plan(spark, str(d)).collect()
    }
    assert len(plan) == 1  # only the 13/14 cluster is affected
    r = next(iter(plan.values()))
    assert r["n_members"] == 2 and r["n_forgotten"] == 1
    assert r["new_canonical"] == 14
    assert r["canonical_changed"] == (r["old_canonical"] == 13)
