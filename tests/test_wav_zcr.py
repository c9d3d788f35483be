"""Zero-crossing feature semantics beyond oracle parity: frame
boundaries own the pair (i-1, i) by sample i's frame, counts sum to the
whole-stream count, and an all-ASCII payload (every PCM16 sample
non-negative) has zero crossings."""

from __future__ import annotations

from tests.test_messy_corpus import DOC_SCHEMA

NF = 4


def _expected(text: str) -> tuple[int, list[int]]:
    """Independent reimplementation: UTF-8 bytes -> capped/padded PCM16
    little-endian -> per-frame pair sign-flip counts (brute loop, no
    numpy, different formulation from the operator)."""
    raw = text.encode("utf-8")[:128]
    if len(raw) % 2:
        raw += b"\x00"
    samples = []
    for k in range(len(raw) // 2):
        u = raw[2 * k] + 256 * raw[2 * k + 1]
        samples.append(u - 65536 if u >= 32768 else u)
    n = len(samples)
    zcs = [0] * NF
    for i in range(2, n + 1):  # 1-based pair (i-1, i)
        flip = (samples[i - 2] < 0) != (samples[i - 1] < 0)
        for f in range(NF):
            if f * n // NF < i <= (f + 1) * n // NF:
                zcs[f] += int(flip)
                break
    return n, zcs


def test_zcr_semantics(spark, tmp_path):
    from parallelutilities_jl_spark.operators import multimodal as M

    ascii_only = "all ascii words keep every sample positive " * 3
    mixed = "aé" * 40  # 0xA9C3-style negative samples alternate
    rows = [
        (0, ascii_only, "en", "s", len(ascii_only)),
        (1, mixed, "en", "s", len(mixed)),
        (2, "xy", "en", "s", 2),  # single sample: no pairs at all
    ]
    spark.createDataFrame(rows, DOC_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["asset_id"]: r.asDict()
        for r in M.q_multimodal_wav_zcr(spark, str(tmp_path)).collect()
    }
    for doc_id, text in [(0, ascii_only), (1, mixed), (2, "xy")]:
        n, zcs = _expected(text)
        row = got[doc_id]
        assert row["n_samples"] == n
        assert [row[f"zc{f}"] for f in range(NF)] == zcs, (doc_id, zcs)
        assert row["zc_total"] == sum(zcs)
    assert got[0]["zc_total"] == 0  # ASCII payload: all non-negative
    assert got[1]["zc_total"] > 0  # multibyte payload must flip signs
