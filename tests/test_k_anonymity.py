"""Semantic pin for the k-anonymity census beyond oracle parity: a
hand-built event log with one risky and one safe quasi-identifier
group must classify exactly as derived by hand."""

from __future__ import annotations

import datetime as dt


def test_k_anonymity_hand_derived(spark, tmp_path):
    from parallelutilities_jl_spark.operators import relational as P

    assert P.K_ANON == 5  # rows below are derived for k=5
    t0 = dt.datetime(2024, 1, 1, 9, 30)  # hour_of_day 9
    t1 = dt.datetime(2024, 1, 1, 14, 5)  # hour_of_day 14
    rows = []
    # SAFE group: ('click', 9, 7) — 5 distinct users, 6 events
    for i, u in enumerate((1, 2, 3, 4, 5, 5)):
        rows.append((i, t0, u, "click", 7.25, "{}"))
    # RISKY group: ('click', 14, 7) — 2 distinct users, 3 events
    for i, u in enumerate((1, 2, 2), start=10):
        rows.append((i, t1, u, "click", 7.75, "{}"))
    # RISKY group: ('view', 9, 3) — 1 user, 1 event
    rows.append((20, t0, 9, "view", 3.5, "{}"))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        r["event_type"]: r
        for r in P.q_k_anonymity_census(spark, str(tmp_path)).collect()
    }
    c = got["click"]
    assert (c["n_groups"], c["n_risky_groups"]) == (2, 1)
    assert (c["n_risky_events"], c["n_exposed"]) == (3, 2)
    v = got["view"]
    assert (v["n_groups"], v["n_risky_groups"]) == (1, 1)
    assert (v["n_risky_events"], v["n_exposed"]) == (1, 1)
