"""G.711 mu-law/A-law codec pins beyond oracle parity: the expansion
must match the ITU tables at their anchor points, compression must be
the exact inverse on the quantization lattice (all 256 bytes), and the
WAV container routing must keep strict — G.711 claims with the wrong
bit depth or a foreign audio_format reject rather than misdecode."""

from __future__ import annotations

import numpy as np
import pytest

from parallelutilities_jl_spark.operators.multimodal import (
    _alaw_compress,
    _alaw_expand_byte,
    _decode_wav,
    _g711_expand,
    _g711_samples,
    _g711_wav_container_bytes,
    _mulaw_compress,
    _mulaw_expand_byte,
)


def test_expansion_anchor_values():
    """The ITU G.711 lattice endpoints and zeros."""
    assert _mulaw_expand_byte(0xFF) == 0  # canonical zero
    assert _mulaw_expand_byte(0x7F) == 0  # negative-zero alias
    assert _mulaw_expand_byte(0x00) == -32124  # most negative
    assert _mulaw_expand_byte(0x80) == 32124  # most positive
    assert _alaw_expand_byte(0x55) == -8  # smallest negative
    assert _alaw_expand_byte(0xD5) == 8  # smallest positive
    assert _alaw_expand_byte(0x2A) == -32256
    assert _alaw_expand_byte(0xAA) == 32256
    # A-law never decodes to exactly zero (no zero codeword)
    assert all(_alaw_expand_byte(b) != 0 for b in range(256))


def test_compress_is_exact_inverse_on_lattice():
    """compress(expand(b)) == b for every byte — mu-law excepting only
    0x7F, whose expansion collides with 0xFF at zero (the spec's
    negative-zero alias; encoders emit the canonical 0xFF)."""
    for b in range(256):
        want = 0xFF if b == 0x7F else b
        assert _mulaw_compress(_mulaw_expand_byte(b)) == want, hex(b)
        assert _alaw_compress(_alaw_expand_byte(b)) == b, hex(b)


def test_expansion_is_odd_symmetric():
    """Flipping the sign bit negates the sample (mu-law sign bit lives
    in the complemented byte; A-law in the 0x55-inverted byte)."""
    for b in range(256):
        u = ~b & 0xFF
        assert _mulaw_expand_byte(b) == -_mulaw_expand_byte(
            ~(u ^ 0x80) & 0xFF
        )
        a = b ^ 0x55
        assert _alaw_expand_byte(b) == -_alaw_expand_byte(
            (a ^ 0x80) ^ 0x55
        )


def test_vectorized_expand_matches_scalar():
    data = bytes(range(256))
    assert (_g711_expand(data, "ulaw")
            == np.array([_mulaw_expand_byte(b) for b in range(256)])).all()
    assert (_g711_expand(data, "alaw")
            == np.array([_alaw_expand_byte(b) for b in range(256)])).all()


def test_container_round_trip_and_strictness():
    cu = _g711_wav_container_bytes(0, "hello world")  # even: mu-law
    ca = _g711_wav_container_bytes(1, "hello world")  # odd: A-law
    for c, law, fmt_code in ((cu, "ulaw", 7), (ca, "alaw", 6)):
        m = _decode_wav(c)
        assert m is not None and m["bits"] == 8 and m["n_frames"] == 11
        assert m["sample_rate"] == 8000 and m["n_channels"] == 1
        s, got_law = _g711_samples(c)
        assert got_law == law and len(s) == 11
        table = [_mulaw_expand_byte, _alaw_expand_byte][fmt_code == 6]
        want = [table(b) for b in b"hello world"]
        assert list(s) == want
        assert m["peak_abs"] == max(abs(v) for v in want)
    # odd-length data carries the RIFF pad byte OUTSIDE the chunk:
    # 44-byte header + 11 data + 1 pad
    assert len(cu) == 56 and cu[-1] == 0
    # strictness: a G.711 claim with bits=16 must reject
    bad = bytearray(cu)
    bad[34] = 16  # bits field of the fmt chunk
    assert _decode_wav(bytes(bad)) is None
    # an unknown audio_format must reject
    bad = bytearray(cu)
    bad[20] = 2  # ADPCM: out of declared scope
    assert _decode_wav(bytes(bad)) is None
    # _g711_samples refuses linear PCM containers (separate lane)
    from parallelutilities_jl_spark.operators.multimodal import (
        _wav_container_bytes,
    )

    assert _g711_samples(_wav_container_bytes(3, "hello")) is None


def test_property_compress_expand_monotone():
    """Property: expansion is monotone in the companded domain ordering
    and compression quantizes arbitrary PCM16 onto the lattice with
    error bounded by the local step size (half-step after the bias)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(x=st.integers(min_value=-32767, max_value=32767))
    def run(x):
        for compress, expand in (
            (_mulaw_compress, _mulaw_expand_byte),
            (_alaw_compress, _alaw_expand_byte),
        ):
            b = compress(x)
            assert 0 <= b <= 255
            y = expand(b)
            # reconstruction error is bounded by the segment's step:
            # steps double per segment, max segment step = 256 (mu-law)
            # / 1024 (A-law upper segment span before the lattice point)
            assert abs(y - x) <= 1024, (x, b, y)

    run()
