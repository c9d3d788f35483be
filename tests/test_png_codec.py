"""The real PNG codec (`_png_bytes` / `_decode_png`): round-trip
exactness through all five scanline filters, CRC validation, and strict
rejection of malformed containers."""

from __future__ import annotations

import struct
import zlib

import pytest

from parallelutilities_jl_spark.operators.multimodal import (
    _decode_png,
    _png_bytes,
    _PNG_SIG,
)


def _want_luma(vals):
    return [
        (299 * v + 587 * ((2 * v) % 256) + 114 * ((3 * v) % 256)) // 1000
        for v in vals
    ]


@pytest.mark.parametrize("w,h", [(4, 3), (5, 5), (8, 6), (1, 1), (2, 7)])
def test_round_trip_exact(w, h):
    vals = [(7 + i * 53) % 256 for i in range(w * h)]
    content = _png_bytes(vals, w, h)
    m = _decode_png(content)
    assert m is not None
    assert (m["width"], m["height"]) == (w, h)
    assert m["n_raw_bytes"] == h * (1 + 3 * w)
    assert list(m["luma"]) == _want_luma(vals)
    # scanline r uses filter r % 5 — all five appear once h >= 5
    want_mask = 0
    for r in range(h):
        want_mask |= 1 << (r % 5)
    assert m["filter_mask"] == want_mask
    if h >= 5:
        assert m["filter_mask"] == 31


def test_every_filter_type_is_inverted():
    """A decoder with a broken Average or Paeth inversion still decodes
    filter-0 rows correctly — assert each ROW round-trips, pinning each
    filter type separately (h=5 puts one row on each filter)."""
    w, h = 6, 5
    vals = [(i * i * 31 + 5) % 256 for i in range(w * h)]
    m = _decode_png(_png_bytes(vals, w, h))
    want = _want_luma(vals)
    for r in range(h):
        assert list(m["luma"][r * w : (r + 1) * w]) == want[r * w : (r + 1) * w], (
            f"row {r} (filter {r % 5}) mis-inverted"
        )


def test_strict_rejects():
    good = _png_bytes([1, 2, 3, 4], 2, 2)
    assert _decode_png(good) is not None
    assert _decode_png(b"") is None
    assert _decode_png(b"\x89PNX" + good[4:]) is None  # signature
    assert _decode_png(good[:-1]) is None  # truncated IEND
    assert _decode_png(good + b"\x00") is None  # trailing bytes
    # corrupt one IDAT byte: the chunk CRC must catch it
    idat_off = good.index(b"IDAT") + 4
    bad = bytearray(good)
    bad[idat_off] ^= 0xFF
    assert _decode_png(bytes(bad)) is None
    # CRC fixed up but pixel data inflates to the wrong length
    ihdr_off = good.index(b"IHDR")
    bad = bytearray(good)
    struct.pack_into(">I", bad, ihdr_off + 4, 3)  # claim w=3, data is w=2
    data = bytes(bad[ihdr_off : ihdr_off + 4 + 13])
    struct.pack_into(
        ">I", bad, ihdr_off + 4 + 13, zlib.crc32(data) & 0xFFFFFFFF
    )
    assert _decode_png(bytes(bad)) is None
    # IHDR not first
    assert _decode_png(_PNG_SIG + good[len(_PNG_SIG) + 25 :]) is None
