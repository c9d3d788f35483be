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
