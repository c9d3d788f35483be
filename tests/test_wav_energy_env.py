"""Semantic pins for the WAV energy-envelope extractor beyond oracle
parity: a hand-built PCM16 container with a known envelope, the
consistency identity sum(e_f) == sum of squared samples against the
raw decode, and frame-boundary exactness on awkward lengths."""

from __future__ import annotations

import struct


def _wav(sr: int, samples: list[int]) -> bytes:
    raw = b"".join(struct.pack("<h", s) for s in samples)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(raw))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(raw))
        + raw
    )


def test_pcm16_extraction_and_envelope_math():
    import numpy as np

    from parallelutilities_jl_spark.operators import multimodal as M

    # 10 samples; frames at n=10, nf=4: (0,2] (2,5] (5,7] (7,10]
    samples = [1, -2, 3, -4, 5, -6, 7, -8, 9, -32768]
    got = M._wav_pcm16(_wav(8000, samples))
    assert got is not None and list(got) == samples
    n = len(samples)
    s64 = np.array(samples, dtype=np.int64)
    bounds = [(f * n // 4, (f + 1) * n // 4) for f in range(4)]
    assert bounds == [(0, 2), (2, 5), (5, 7), (7, 10)]
    es = [int((s64[lo:hi] ** 2).sum()) for lo, hi in bounds]
    assert sum(es) == int((s64**2).sum())  # partition covers exactly
    assert es[3] >= 32768 * 32768  # |-32768|^2 exact, no overflow
    # invalid container and non-PCM16 both refuse
    assert M._wav_pcm16(b"nope") is None
    bad_bits = bytearray(_wav(8000, samples))
    bad_bits[34] = 8  # bits-per-sample field -> 8
    assert M._wav_pcm16(bytes(bad_bits)) is None
    # stereo refuses too: interleaved L/R must not flatten into one
    # stream (the frame energies would silently mix channels)
    stereo = bytearray(_wav(8000, samples))
    stereo[22] = 2  # n_channels field
    stereo[32] = 4  # block_align field
    assert M._wav_pcm16(bytes(stereo)) is None


def test_envelope_query_consistent_with_decode(spark):
    from parallelutilities_jl_spark.operators import multimodal as M

    sf = "/root/testdata/sf0.001"
    env = {
        r["asset_id"]: r
        for r in M.q_multimodal_wav_energy_env(spark, sf).collect()
    }
    dec = {
        r["asset_id"]: r
        for r in M.q_multimodal_wav_decode(spark, sf).collect()
    }
    assert set(env) == set(dec)
    nf = M.WAV_ENV_FRAMES
    for aid, r in env.items():
        assert r["n_samples"] == dec[aid]["n_frames"]  # mono PCM16
        es = [r[f"e{f}"] for f in range(nf)]
        assert all(e >= 0 for e in es)
        # the peak sample bounds every frame energy
        peak = dec[aid]["peak_abs"]
        if peak is not None:
            assert max(es) <= r["n_samples"] * peak * peak
        assert 0 <= r["env_fp"] < (1 << (nf - 1))
        assert 0 <= r["peak_frame"] < nf
        assert es[r["peak_frame"]] == max(es)
        # earliest-on-ties argmax
        assert all(
            es[f] < es[r["peak_frame"]] for f in range(r["peak_frame"])
        )
