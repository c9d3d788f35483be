"""Perceptual-hash pins for `multimodal_dhash_near_dup` beyond oracle
parity: a light edit preserves most gradient signs (small hamming ->
flagged), unrelated content does not; and the fingerprint is a pure
function of the payload (identical payloads -> hamming 0)."""

from __future__ import annotations

from tests.test_messy_corpus import DOC_SCHEMA

BASE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu one two three four five"
)
# one word swapped mid-string: most strided samples and gradients hold
EDITED = BASE.replace("oscar", "obcar")
OTHER = (
    "9 8 7 6 5 4 3 2 1 0 zz yy xx ww vv uu tt ss rr qq pp oo nn mm "
    "ll kk jj ii hh gg ff ee dd cc bb aa 0 1 2 3 4 5 6 7 8 9 zz yy"
)


def test_banding_guarantee_and_measured_high_regime_recall(tmp_path):
    """The honest banding claims, asserted in the regime where loss is
    POSSIBLE: with 4 bands, pigeonhole guarantees a clean shared band
    at hamming <= 3 — those pairs must ALL be found (exact claim);
    above that the banding is probabilistic (same AND-OR dial as
    simhash), so the 4-6 regime gets a measured-recall FLOOR on a
    fixture built to stress it (5 spread word edits per doc flip
    gradient bits across bands; the corpus is verified to contain
    dozens of hamming 4-6 pairs before asserting — an easy corpus
    would make the check vacuous; measured here: 83/84). Both sides
    run the SAME committed fingerprint algebra (_dhash_fp_sql), so
    the comparison isolates the banding step. The x10 stress-corpus
    measurement (6598/6598, recall 1.0 — replica edits concentrate
    differing bits) is reproducible via tools/dhash_recall.py.
    Pure-DuckDB, no Spark session needed."""
    import duckdb
    import pandas as pd

    from parallelutilities_jl_spark.operators import multimodal as M

    words = [f"w{i:03d}" for i in range(40)]
    rows = []
    for k in range(30):
        body = " ".join(words[(i + k) % 40] for i in range(40))
        rows.append((k * 3, body))
        ed = body.split(" ")
        for j in range(5):  # spread edits -> differing bits hit many bands
            ed[(3 + j * 37 // 4 + k) % 40] = "zqx"
        rows.append((k * 3 + 90, " ".join(ed)))
    pd.DataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    exact = con.execute(f"""
WITH {M._dhash_fp_sql()}
SELECT a.asset_id, b.asset_id, bit_count(xor(a.dhash, b.dhash)) AS h
FROM fp a JOIN fp b ON a.asset_id < b.asset_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= {M.DHASH_HAM_MAX}
""").fetchall()
    banded = set(
        (a, b) for a, b, _ in con.execute(
            M._oracle_dhash_near_dup()
        ).fetchall()
    )
    con.close()
    low = {(a, b) for a, b, h in exact if h <= 3}
    high = {(a, b) for a, b, h in exact if h >= 4}
    assert len(high) >= 20, "fixture must reach the hamming 4-6 regime"
    # the pigeonhole GUARANTEE: every hamming<=3 pair shares a band
    assert low <= banded
    # the probabilistic regime: measured 83/84 here; floor at 0.9
    assert len(high & banded) / len(high) >= 0.9
    # no false accepts: banding+verify never emits a pair exact rejects
    assert banded <= {(a, b) for a, b, _ in exact}


def test_dhash_perceptual_property(spark, tmp_path):
    from parallelutilities_jl_spark.operators import multimodal as M

    # asset ids must be image-modality (id % 3 == 0)
    rows = [
        (0, BASE, "en", "s", len(BASE)),
        (3, EDITED, "en", "s", len(EDITED)),
        (6, BASE, "en", "s", len(BASE)),  # identical copy
        (9, OTHER, "en", "s", len(OTHER)),
        (4, BASE, "en", "s", len(BASE)),  # audio modality: must be ignored
    ]
    spark.createDataFrame(rows, DOC_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r["asset_a"], r["asset_b"]): r["hamming"]
        for r in M.q_multimodal_dhash_near_dup(
            spark, str(tmp_path)
        ).collect()
    }
    assert got[(0, 6)] == 0  # identical payload -> identical fingerprint
    assert got[(0, 3)] <= M.DHASH_HAM_MAX  # light edit flagged
    assert got[(3, 6)] == got[(0, 3)]
    # unrelated content and the audio-modality asset never appear
    flat = {i for pair in got for i in pair}
    assert 9 not in flat and 4 not in flat


def test_dhash_parity_on_non_ascii_text(spark, tmp_path):
    """Spark `ascii()` and DuckDB `ord()` both return the Unicode
    CODEPOINT of the first character (verified empirically on Spark
    4.1 — not the leading UTF-8 byte), so the luma sampling agrees on
    multi-byte text. Pin it: image docs saturated with multi-byte
    chars at every sampled position must hash-match the oracle."""
    import duckdb

    from parallelutilities_jl_spark.operators import multimodal as M

    base = "é好ü " * 40  # >= 64 chars, multibyte at most positions
    rows = [
        (0, base + "alpha", "en", "s", 100),
        (3, base + "alphb", "en", "s", 100),
        (6, base + "omega tail words", "en", "s", 100),
    ]
    spark.createDataFrame(rows, DOC_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    got = sorted(
        tuple(r)
        for r in M.q_multimodal_dhash_near_dup(
            spark, str(tmp_path)
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(
        M._oracle_dhash_near_dup()
    ).fetchall())
    con.close()
    assert got == want
    assert got, "multibyte docs sharing most samples must pair up"
