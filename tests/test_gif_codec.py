"""The real GIF codec: container round trip through the module encoder,
full LZW decode exercised against an independent COMPRESSING reference
encoder (dict growth + variable width bumps — paths the module's
uncompressed-style writer never emits), and strict container rejects."""

from __future__ import annotations

from parallelutilities_jl_spark.operators.multimodal import (
    _decode_gif,
    _gif_bytes,
    _gif_lzw_decode,
    _gif_lzw_encode,
)


def _ref_compress(min_size: int, data: bytes):
    """Independent spec-faithful compressing GIF-LZW encoder (greedy
    longest-match, width bump when entry 2^width-1 is created), LSB-
    first per-code-width packing — NOT the module's implementation."""
    clear, eoi = 1 << min_size, (1 << min_size) + 1
    width = min_size + 1
    d = {bytes((i,)): i for i in range(clear)}
    next_code = clear + 2
    codes = [(clear, width)]
    w = b""
    for ch in data:
        wc = w + bytes((ch,))
        if wc in d:
            w = wc
            continue
        codes.append((d[w], width))
        if next_code < 4096:
            d[wc] = next_code
            next_code += 1
            # giflib schedule: the bump lands after packing the code
            # that makes the table reach 2^width, so the 256th data
            # code after a clear is the first 10-bit one
            if next_code > (1 << width) and width < 12:
                width += 1
        w = bytes((ch,))
    if w:
        codes.append((d[w], width))
    codes.append((eoi, width))
    buf = nbits = 0
    out = bytearray()
    for code, cw in codes:
        buf |= code << nbits
        nbits += cw
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


def test_lzw_round_trip_uncompressed_writer():
    long = bytes((i * 31) % 256 for i in range(1500))  # > one CLEAR period
    assert _gif_lzw_decode(8, _gif_lzw_encode(long)) == long


def test_lzw_decodes_genuinely_compressed_streams():
    """Repetitive data forces dict growth past the 512/1024 boundaries,
    so the decoder's KwKwK case and width bumps are all on the path."""
    for pattern in (b"abcabcabcabc" * 120, bytes(range(256)) * 8,
                    b"aaaaaaaaaaaaaaaa" * 64):
        enc = _ref_compress(8, pattern)
        assert len(enc) < len(pattern), "reference must actually compress"
        assert _gif_lzw_decode(8, enc) == pattern
    # small min-code-size variant (4-bit palette)
    data4 = bytes((i % 16) for i in range(600))
    assert _gif_lzw_decode(4, _ref_compress(4, data4)) == data4


def test_container_round_trip_multiframe():
    frames = [[(i * 13 + f * 7) % 256 for i in range(5 * 4)]
              for f in range(3)]
    m = _decode_gif(_gif_bytes(frames, 5, 4))
    assert m is not None
    assert (m["width"], m["height"], m["n_frames"]) == (5, 4, 3)
    assert m["frames"] == frames  # gray palette: luma == index


def test_strict_rejects():
    good = _gif_bytes([[1, 2, 3, 4]], 2, 2)
    assert _decode_gif(good) is not None
    assert _decode_gif(b"") is None
    assert _decode_gif(b"GIX89a" + good[6:]) is None  # magic
    assert _decode_gif(good[:-1]) is None  # missing trailer
    assert _decode_gif(good + b"\x00") is None  # trailing bytes
    # frame dims disagreeing with the logical screen. NB: don't search
    # for 0x2C — the gray palette contains that byte; the image
    # descriptor sits at a fixed offset (header 13 + GCT 768 + GCE 8)
    idesc = 13 + 768 + 8
    assert good[idesc] == 0x2C
    bad = bytearray(good)
    bad[idesc + 5] = 3  # image width 3 != screen width 2
    assert _decode_gif(bytes(bad)) is None
    # truncated LZW stream (cut inside the data sub-block)
    assert _decode_gif(good[: idesc + 14]) is None


def test_width_schedule_boundary_is_giflib_conformant():
    """The 256th data code after a clear is the FIRST 10-bit one (the
    code that brings the table to 2^9 is still packed at 9 bits) — the
    boundary a self-consistent-but-shifted pair would get wrong while
    still round-tripping its own streams. Constructed so the reference
    encoder emits exactly one code per input symbol (all-distinct pairs
    exhausted is avoided by using a non-repeating byte sequence: every
    two-byte window is unique, so every symbol after the first is a
    dictionary miss)."""
    data = bytes(((i * i + 3 * i) // 2) % 256 for i in range(400))
    enc = _ref_compress(8, data)
    assert _gif_lzw_decode(8, enc) == data


def test_rejects_interlaced_frames():
    import struct

    good = _gif_bytes([[1, 2, 3, 4]], 2, 2)
    idesc = 13 + 768 + 8
    assert good[idesc] == 0x2C
    bad = bytearray(good)
    bad[idesc + 9] |= 0x40  # image-descriptor interlace flag
    assert _decode_gif(bytes(bad)) is None
