"""The real BMP codec (`_bmp_bytes` / `_decode_bmp`): round-trip
exactness, strict container validation, and the spec corners a naive
parser gets wrong (bottom-up rows, 4-byte stride padding, BGR channel
order)."""

from __future__ import annotations

import struct

import pytest

from parallelutilities_jl_spark.operators.multimodal import (
    BMP_HEADER_BYTES,
    _bmp_bytes,
    _bmp_stride,
    _decode_bmp,
)


def test_gray_round_trip_exact():
    vals = [(i * 37) % 256 for i in range(8 * 8)]
    content = _bmp_bytes(vals, 8, 8, gray=True)
    assert len(content) == BMP_HEADER_BYTES + _bmp_stride(8) * 8
    m = _decode_bmp(content)
    assert m is not None
    assert (m["width"], m["height"], m["row_stride"]) == (8, 8, 24)
    # gray pixels: integer luma == the base value exactly
    assert list(m["luma"]) == vals


@pytest.mark.parametrize("w,h", [(5, 4), (6, 5), (7, 6), (8, 4), (1, 1)])
def test_rgb_round_trip_all_padding_cases(w, h):
    """w=5..8 exercises every row-pad width (1/2/3/0 bytes)."""
    vals = [(3 + i * 91) % 256 for i in range(w * h)]
    content = _bmp_bytes(vals, w, h)
    m = _decode_bmp(content)
    assert m is not None
    assert m["row_stride"] == _bmp_stride(w)
    want = [
        (299 * v + 587 * ((2 * v) % 256) + 114 * ((3 * v) % 256)) // 1000
        for v in vals
    ]
    assert list(m["luma"]) == want


def test_luma_is_order_sensitive():
    """A decoder that forgets the bottom-up un-flip returns a permuted
    grid — the top-left pixel must come from the LAST file row."""
    vals = [0] * 16
    vals[0] = 200  # top-left in image space
    content = _bmp_bytes(vals, 4, 4, gray=True)
    m = _decode_bmp(content)
    assert m["luma"][0] == 200 and int(sum(m["luma"])) == 200
    # the 200-valued pixel is physically in the LAST stored row
    stride = _bmp_stride(4)
    last_row_off = BMP_HEADER_BYTES + (4 - 1) * stride
    assert content[last_row_off] == 200


def test_strict_rejects():
    good = _bmp_bytes([1, 2, 3, 4], 2, 2, gray=True)
    assert _decode_bmp(good) is not None
    assert _decode_bmp(b"") is None
    assert _decode_bmp(b"XX" + good[2:]) is None  # magic
    assert _decode_bmp(good[:-1]) is None  # file_size mismatch
    assert _decode_bmp(good + b"\x00") is None  # trailing bytes
    # bpp != 24
    bad = bytearray(good)
    struct.pack_into("<H", bad, 28, 32)
    assert _decode_bmp(bytes(bad)) is None
    # compression != 0 (BI_RLE8)
    bad = bytearray(good)
    struct.pack_into("<I", bad, 30, 1)
    assert _decode_bmp(bytes(bad)) is None
    # top-down variant (negative height): out of scope, must reject
    bad = bytearray(good)
    struct.pack_into("<i", bad, 22, -2)
    assert _decode_bmp(bytes(bad)) is None
    # truncated pixel array (claimed dims exceed payload)
    bad = bytearray(good)
    struct.pack_into("<i", bad, 18, 64)
    assert _decode_bmp(bytes(bad)) is None


def test_raw_text_never_parses_as_bmp():
    """`decode_assets` sniffs image bytes for the real decoder; raw
    UTF-8 text (the synthesize_assets payload) must always fall back
    to the stub, even text starting with 'BM'."""
    assert _decode_bmp("BMarley & the Wailers, greatest hits " .encode() * 4) is None


def test_nn_resize_luma_mapping():
    """Nearest-neighbor floor mapping: target (y, x) reads source
    ((y*h)//nh, (x*w)//nw); aspect preserved; identity when the image
    already fits the box."""
    from parallelutilities_jl_spark.operators.multimodal import (
        _nn_resize_luma,
    )

    # 8x4 -> box 4: nw=4, nh=2
    w, h = 8, 4
    luma = list(range(w * h))
    out, nw, nh = _nn_resize_luma(luma, w, h, box=4)
    assert (nw, nh) == (4, 2)
    want = [
        luma[((y * h) // nh) * w + ((x * w) // nw)]
        for y in range(nh)
        for x in range(nw)
    ]
    assert list(out) == want
    # tall image: 3x6 -> nw=(3*4)//6=2, nh=(6*4)//6=4
    out2, nw2, nh2 = _nn_resize_luma(list(range(18)), 3, 6, box=4)
    assert (nw2, nh2) == (2, 4) and len(out2) == 8
    # fit-to-box semantics: a smaller image UPSCALES (pixel replication)
    out3, nw3, nh3 = _nn_resize_luma([1, 2, 3, 4], 2, 2, box=4)
    assert (nw3, nh3) == (4, 4)
    assert list(out3) == [1, 1, 2, 2, 1, 1, 2, 2, 3, 3, 4, 4, 3, 3, 4, 4]
