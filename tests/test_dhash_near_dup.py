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


def test_banding_recall_equals_exact_on_editped_corpus(tmp_path):
    """Banding must not LOSE pairs the exact all-pairs hamming scan
    accepts: on a corpus of base docs plus light edits (the dup shape
    the screen exists for), banded-candidates ∩ hamming<=max ==
    exact all-pairs hamming<=max. Measured the same way on the x10
    stress corpus: 6598/6598 pairs, recall 1.0 (SCALING.md row).
    Pure-DuckDB (both sides run the committed oracle algebra), no
    Spark session needed."""
    import duckdb
    import pandas as pd

    from parallelutilities_jl_spark.operators import multimodal as M

    words = [f"w{i:03d}" for i in range(40)]
    rows = []
    for k in range(30):
        body = " ".join(words[(i + k) % 40] for i in range(40))
        rows.append((k * 3, body, "en", "s", len(body)))  # image ids
        edited = body.replace(f"w{(7 + k) % 40:03d}", "zz")
        rows.append((k * 3 + 30 * 3, edited, "en", "s", len(edited)))
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    banded = set(
        (a, b) for a, b, _ in con.execute(
            M._oracle_dhash_near_dup()
        ).fetchall()
    )
    g = M.DHASH_GRID
    li = f"(b // {g - 1}) * {g} + (b % {g - 1})"
    exact = set(
        tuple(r)
        for r in con.execute(f"""
WITH base AS (SELECT doc_id AS asset_id, text FROM documents
              WHERE text IS NOT NULL AND doc_id % 3 = 0
                AND length(text) >= {M.DHASH_MIN_LEN}),
grid AS (SELECT asset_id,
                list_transform(generate_series(0, {g * g - 1}),
                  i -> ord(substr(text,
                       CAST(1 + (i * (length(text) - 1)) // {g * g - 1}
                            AS INT), 1))) AS hs
         FROM base),
fp AS (SELECT asset_id,
              list_sum(list_transform(
                generate_series(0, {M.DHASH_BITS - 1}),
                b -> CASE WHEN hs[{li} + 1] < hs[{li} + 2]
                          THEN (1::BIGINT << b) ELSE 0::BIGINT END))
                AS dhash
       FROM grid)
SELECT a.asset_id, b.asset_id FROM fp a JOIN fp b
ON a.asset_id < b.asset_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= {M.DHASH_HAM_MAX}
""").fetchall()
    )
    con.close()
    assert exact, "fixture must produce at least one true pair"
    assert banded == exact


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
