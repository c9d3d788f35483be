"""The dataset card must be exactly its components, joined: no row
drops (every source present) and no value drift through the joins."""

from __future__ import annotations


def test_card_matches_components(spark):
    from parallelutilities_jl_spark.operators.dedup import (
        q_dedup_rate_by_source,
    )
    from parallelutilities_jl_spark.operators.pipeline import (
        q_dataset_card_report,
    )
    from parallelutilities_jl_spark.operators.text import (
        q_lang_mix_entropy,
        q_zipf_slope_by_source,
    )

    sf = "/root/testdata/sf0.001"
    card = {
        r["source"]: r for r in q_dataset_card_report(spark, sf).collect()
    }
    lang = {r["source"]: r for r in q_lang_mix_entropy(spark, sf).collect()}
    assert set(card) == set(lang)  # inner joins dropped nothing
    for s, r in card.items():
        assert (r["n_docs"], r["n_langs"], r["entropy_q"]) == (
            lang[s]["n_docs"], lang[s]["n_langs"], lang[s]["entropy_q"]
        )
    dup = {
        r["source"]: r["dup_rate_e6"]
        for r in q_dedup_rate_by_source(spark, sf).collect()
    }
    zipf = {
        r["source"]: r["slope_e6"]
        for r in q_zipf_slope_by_source(spark, sf).collect()
    }
    for s, r in card.items():
        assert r["dup_rate_e6"] == dup[s]
        assert r["zipf_slope_e6"] == zipf[s]
