"""Round-12 safety nets.

1. Hypothesis fuzz over the hardened RIFF/WAVE chunk walker: arbitrary
   byte soup and adversarial chunk layouts must never crash the decoder
   — it returns a well-formed metadata dict or None, and on canonical
   containers the fields match the header math exactly.
2. Partition-count invariance for the queries this round touched: the
   result set must be identical under shuffle.partitions 1 vs the
   session default (the verify-skill probe; the reference's
   worker-count-matrix analog, reference test/paralleltests.jl).
"""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from parallelutilities_jl_spark.operators.multimodal import _decode_wav


@given(data=st.binary(min_size=0, max_size=256))
@settings(max_examples=300, deadline=None)
def test_decode_wav_never_crashes_on_byte_soup(data):
    out = _decode_wav(data)
    assert out is None or set(out) == {
        "sample_rate", "n_channels", "bits", "n_frames", "peak_abs",
    }


@given(
    sr=st.integers(1, 2**31 - 1),
    channels=st.integers(1, 8),
    n=st.integers(0, 40),
    extra=st.binary(max_size=64),
)
@settings(max_examples=200, deadline=None)
def test_decode_wav_canonical_pcm16_roundtrip(sr, channels, n, extra):
    """A canonical PCM16 container round-trips its header math even
    with arbitrary trailing bytes (the walk stops at the data chunk)."""
    block_align = channels * 2
    data = struct.pack(f"<{n}h", *[(i * 2503 % 65536) - 32768
                                   for i in range(n)])
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, sr,
                                min(sr * block_align, 2**32 - 1),
                                block_align, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    m = _decode_wav(wav + extra)
    assert m is not None
    assert m["sample_rate"] == sr and m["n_channels"] == channels
    assert m["bits"] == 16
    assert m["n_frames"] == n // channels
    if n:
        import numpy as np

        samples = np.frombuffer(data, dtype="<i2")
        assert m["peak_abs"] == int(np.abs(samples.astype(np.int32)).max())
    else:
        assert m["peak_abs"] is None


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_round12_queries_partition_count_invariant(spark, sf_dir):
    """q2 (window min + TakeOrdered) and the sampled-fit SemDeDup must
    produce identical results at shuffle.partitions=1 and the session
    default — any dependence on physical partitioning (combine order,
    per-partition windows) would diverge here."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    base = {}
    for name in ("q2_min_cost_supplier", "semantic_dedup",
                 "ngram_jaccard_pairs"):
        base[name] = _rows(qs[name](spark, sf_dir))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        for name, want in base.items():
            assert _rows(qs[name](spark, sf_dir)) == want, name
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
