"""FLAC codec pins beyond oracle parity: lossless round trips through
every in-scope subframe type (CONSTANT, VERBATIM, FIXED orders 0-4
with partitioned-Rice residuals), multi-frame streams with
UTF-8-coded frame numbers past the one-byte range, stereo independent
channels, CRC-8/CRC-16 fail-closed behavior, and the out-of-scope
rejections (LPC, side stereo)."""

from __future__ import annotations

import numpy as np

from parallelutilities_jl_spark.operators.flac import (
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)


def test_crc_reference_vectors():
    """The FLAC polynomials against the classic check value inputs."""
    assert crc8(b"123456789") == 0xF4  # CRC-8/SMBUS (poly 0x07)
    assert crc16(b"123456789") == 0xFEE8  # CRC-16/BUYPASS (poly 0x8005)


def test_verbatim_round_trip_multi_frame():
    rng = np.random.default_rng(3)
    samples = [int(v) for v in rng.integers(-30000, 30000, size=150)]
    m = decode_flac(encode_flac([samples], blocksize=64))
    assert m is not None
    assert m["n_frames"] == 3  # 64 + 64 + 22 (partial final frame)
    assert m["total_samples"] == 150 and m["n_channels"] == 1
    assert list(m["channels"][0]) == samples
    assert m["peak_abs"] == max(abs(v) for v in samples)


def test_constant_subframe():
    m = decode_flac(
        encode_flac([[42] * 100], blocksize=32, subframe="constant")
    )
    assert m is not None and list(m["channels"][0]) == [42] * 100


def test_fixed_orders_round_trip_stereo():
    """All five FIXED predictor orders, two independent channels:
    warmup + Rice-coded residuals must reconstruct losslessly."""
    rng = np.random.default_rng(5)
    for order in range(5):
        chans = [
            [int(v) for v in rng.integers(-2000, 2000, size=130)]
            for _ in range(2)
        ]
        m = decode_flac(
            encode_flac(
                chans, blocksize=32, subframe="fixed", fixed_order=order
            )
        )
        assert m is not None and m["n_channels"] == 2, order
        for ci in range(2):
            assert list(m["channels"][ci]) == chans[ci], (order, ci)


def test_fixed_actually_compresses_smooth_signals():
    """The point of the predictor: a smooth signal's order-2 residuals
    are small, so the Rice stream beats verbatim — pins that the
    encoder is a real compressor, not verbatim in disguise."""
    t = np.arange(400)
    sig = [int(v) for v in (1000 * np.sin(t / 10)).astype(int)]
    fixed = encode_flac([sig], blocksize=128, subframe="fixed",
                        fixed_order=2)
    verb = encode_flac([sig], blocksize=128)
    assert len(fixed) < 0.6 * len(verb)
    m = decode_flac(fixed)
    assert m is not None and list(m["channels"][0]) == sig


def test_many_frames_utf8_numbering():
    """200 frames: frame numbers cross the 1-byte UTF-8 boundary at
    frame 128 — a wrong coded-number capacity breaks sync there."""
    rng = np.random.default_rng(7)
    long = [int(v) for v in rng.integers(-100, 100, size=16 * 200)]
    m = decode_flac(encode_flac([long], blocksize=16))
    assert m is not None and m["n_frames"] == 200
    assert list(m["channels"][0]) == long


def test_strict_rejects():
    rng = np.random.default_rng(9)
    samples = [int(v) for v in rng.integers(-500, 500, size=100)]
    good = encode_flac([samples], blocksize=64)
    assert decode_flac(good) is not None
    assert decode_flac(b"") is None
    assert decode_flac(b"fLaC") is None
    assert decode_flac(good[:-3]) is None  # truncated final frame
    # CRC-16 tamper: flip a bit in the trailing frame CRC
    bad = bytearray(good)
    bad[-1] ^= 0xFF
    assert decode_flac(bytes(bad)) is None
    # mid-stream corruption: entropy bits no longer match the CRC
    bad = bytearray(good)
    bad[60] ^= 0x01
    assert decode_flac(bytes(bad)) is None
    # a STREAMINFO total_samples that disagrees with the frames
    bad = bytearray(good)
    bad[21] ^= 0x01  # low bits of the 36-bit total field
    assert decode_flac(bytes(bad)) is None
    # header CRC-8 position: corrupt a frame-header byte only
    sync = good.index(b"\xff\xf8", 42)
    bad = bytearray(good)
    bad[sync + 2] ^= 0x10  # blocksize code nibble
    assert decode_flac(bytes(bad)) is None


def test_property_random_streams_round_trip():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        samples=st.lists(
            st.integers(min_value=-32000, max_value=32000),
            min_size=0, max_size=200,
        ),
        blocksize=st.sampled_from([16, 32, 64, 192]),
        subframe=st.sampled_from(["verbatim", "fixed"]),
        order=st.integers(min_value=0, max_value=4),
    )
    def run(samples, blocksize, subframe, order):
        m = decode_flac(
            encode_flac(
                [samples], blocksize=blocksize, subframe=subframe,
                fixed_order=order,
            )
        )
        assert m is not None
        assert list(m["channels"][0]) == samples

    run()
