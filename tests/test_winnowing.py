"""Winnowing fingerprint pins (Schleimer et al., SIGMOD 2003): beyond
the oracle's engine parity, assert the algorithm's defining theorems —
(1) COVERAGE: every window of WINNOW_W consecutive k-grams contains a
selected fingerprint position, so consecutive selected positions are
never more than WINNOW_W apart; (2) MATCH GUARANTEE: two docs sharing
any run of k+w-1 words share a selected hash; (3) the overlap screen's
df-cap drops boilerplate hashes in the Spark path exactly as the
oracle does."""

from __future__ import annotations

import pytest

from tests.test_messy_corpus import DOC_SCHEMA


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, DOC_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_coverage_every_window_has_a_selected_position(spark):
    """On the real sf0.001 corpus: per doc, selected positions must be
    valid shingle indices and consecutive selections can be at most
    WINNOW_W apart (first <= W, last >= n_shingles - W + 1) — the
    guarantee that makes the fingerprint set a LOCAL summary."""
    from parallelutilities_jl_spark.operators import text as T

    sf = "/root/testdata/sf0.001"
    fps = {}
    for r in T.q_winnowing_fingerprints(spark, sf).collect():
        fps.setdefault(r["doc_id"], []).append(r["pos"])
    assert fps
    docs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .selectExpr(
            "doc_id",
            "size(split(regexp_replace(lower(trim(text)), '\\\\s+', ' '),"
            " ' ')) AS n_words",
        )
        .collect()
    )
    n_sh = {
        r["doc_id"]: r["n_words"] - T.WINNOW_K + 1
        for r in docs
        if r["n_words"] >= T.WINNOW_K + T.WINNOW_W - 1
    }
    assert set(fps) == set(n_sh)
    for doc_id, positions in fps.items():
        ps = sorted(positions)
        n = n_sh[doc_id]
        assert 1 <= ps[0] <= T.WINNOW_W
        assert n - T.WINNOW_W + 1 <= ps[-1] <= n
        for a, b in zip(ps, ps[1:]):
            assert b - a <= T.WINNOW_W, (doc_id, a, b)


def test_match_guarantee_on_shared_run(spark, tmp_path):
    """Two docs sharing one run of exactly k+w-1 words (at different
    offsets, all other text disjoint) MUST share a selected hash; with
    two disjoint shared runs they must clear the overlap screen."""
    from parallelutilities_jl_spark.operators import text as T

    run1 = "alpha beta gamma delta epsilon zeta"  # k+w-1 = 6 words
    run2 = "one two three four five six"
    doc_a = f"aa bb cc {run1} dd ee ff gg {run2} hh"
    doc_b = f"pp qq rr ss tt {run1} uu vv {run2} ww xx"
    doc_c = "totally unrelated filler text with many plain words here"
    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, doc_a, "en", "s", len(doc_a)),
            (2, doc_b, "en", "s", len(doc_b)),
            (3, doc_c, "en", "s", len(doc_c)),
        ],
    )
    fps = {}
    for r in T.q_winnowing_fingerprints(spark, d).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert len(fps[1] & fps[2]) >= 2  # one hash per shared run minimum
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in T.q_winnowing_overlap(spark, d).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] >= 2


def test_contamination_guarantee_and_miss_mode(
    spark, tmp_path, monkeypatch
):
    """A corpus doc quoting a k+w-1-word run from an eval doc (source
    src0) MUST be flagged; a doc with no 6-word overlap must not be.
    Miss-mode: with the corpus-side df-cap monkeypatched below the
    quote's df, the boilerplate quote is suppressed — the documented
    trade, pinned so it stays documented."""
    from parallelutilities_jl_spark.operators import text as T
    from parallelutilities_jl_spark.operators.pipeline import EVAL_SOURCE

    quote = "question seven answer is forty two"  # 6 words
    eval_doc = f"benchmark header {quote} benchmark footer words"
    contaminated = f"train text aa bb {quote} cc dd more train text"
    clean = "entirely different training words nothing shared at all"
    rows = [
        (1, eval_doc, "en", EVAL_SOURCE, 100),
        (2, contaminated, "en", "src5", 100),
        (3, clean, "en", "src5", 100),
        # two more quoting docs so the quote's corpus df is 3
        (4, f"other intro {quote} other outro padding words", "en",
         "src6", 100),
        (5, f"third context {quote} third closing filler words", "en",
         "src7", 100),
    ]
    d = _write_docs(spark, tmp_path, rows)
    flagged = {
        r["doc_id"]: r
        for r in T.q_winnowing_contamination(spark, d).collect()
    }
    assert {2, 4, 5} <= set(flagged) and 3 not in flagged
    assert all(flagged[i]["n_eval_docs"] >= 1 for i in (2, 4, 5))
    # miss-mode: cap below the quote's corpus df suppresses it
    monkeypatch.setattr(T, "WINNOW_MAX_DF", 2)
    assert T.q_winnowing_contamination(spark, d).count() == 0


def test_overlap_df_cap_drops_boilerplate(spark, tmp_path, monkeypatch):
    """Three identical docs: every hash has df=3; capping df at 2 must
    empty the overlap output in BOTH engines (oracle re-rendered after
    the monkeypatch, mirroring test_simhash_bucket_cap)."""
    import duckdb

    from parallelutilities_jl_spark.operators import text as T

    body = "the quick brown fox jumps over the lazy dog again and again"
    d = _write_docs(
        spark,
        tmp_path,
        [(i, body, "en", "s", len(body)) for i in range(1, 4)],
    )
    assert T.q_winnowing_overlap(spark, d).count() == 3  # control
    monkeypatch.setattr(T, "WINNOW_MAX_DF", 2)
    assert T.q_winnowing_overlap(spark, d).count() == 0
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{d}/documents.parquet/*.parquet'"
    )
    sql = T._oracles()["winnowing_overlap"]
    assert con.execute(sql).fetchall() == []
    con.close()
