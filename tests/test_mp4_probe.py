"""MP4/ISO-BMFF container-probe pins beyond oracle parity: the box
walk must be strict (framing errors, truncation, trailing bytes, and
overrunning sizes reject), handle 64-bit largesize and run-to-end
boxes, read v0 AND v1 fullbox layouts at their spec offsets, and sum
both stsz forms (fixed sample_size and per-sample entries)."""

from __future__ import annotations

import struct

from parallelutilities_jl_spark.operators.mp4 import (
    MP4_SAMPLE_DELTA,
    MP4_TIMESCALE,
    encode_mp4,
    probe_mp4,
)


def test_round_trip_probe():
    sizes = [104, 101, 108, 108, 111]
    m = probe_mp4(encode_mp4(sizes, 48, 32))
    assert m == {
        "brand": "isom",
        "timescale": MP4_TIMESCALE,
        "duration": 5 * MP4_SAMPLE_DELTA,
        "n_tracks": 1,
        "width": 48,
        "height": 32,
        "n_samples": 5,
        "media_bytes": sum(sizes),
        "mdat_bytes": sum(sizes),
    }


def test_empty_track():
    m = probe_mp4(encode_mp4([], 16, 16))
    assert m["n_samples"] == 0 and m["media_bytes"] == 0
    assert m["duration"] == 0 and m["mdat_bytes"] == 0


def test_strict_rejects():
    good = encode_mp4([10, 20], 32, 16)
    assert probe_mp4(good) is not None
    assert probe_mp4(b"") is None
    assert probe_mp4(b"notanmp4" * 4) is None
    assert probe_mp4(good[:-5]) is None  # truncated final box
    assert probe_mp4(good + b"x") is None  # trailing bytes
    bad = bytearray(good)
    bad[0] = 0xFF  # ftyp size overruns the file
    assert probe_mp4(bytes(bad)) is None
    # a file whose first box is not ftyp rejects
    assert probe_mp4(good[struct.unpack(">I", good[:4])[0]:]) is None
    # moov missing: ftyp+mdat alone is not probeable
    ft_end = struct.unpack(">I", good[:4])[0]
    md_size = struct.unpack(">I", good[ft_end : ft_end + 4])[0]
    assert probe_mp4(good[: ft_end + md_size]) is None


def test_largesize_and_run_to_end_boxes():
    good = encode_mp4([5, 6, 7], 32, 16)
    ft_end = struct.unpack(">I", good[:4])[0]
    md_size = struct.unpack(">I", good[ft_end : ft_end + 4])[0]
    payload = good[ft_end + 8 : ft_end + md_size]
    # rewrite mdat with a 64-bit largesize header
    big = (
        good[:ft_end]
        + struct.pack(">I", 1) + b"mdat"
        + struct.pack(">Q", 16 + len(payload)) + payload
        + good[ft_end + md_size :]
    )
    m = probe_mp4(big)
    assert m is not None and m["mdat_bytes"] == len(payload)
    # size-0 final box (runs to end of file): rewrite the moov header
    moov_off = ft_end + md_size
    zero = good[:moov_off] + struct.pack(">I", 0) + good[moov_off + 4 :]
    m = probe_mp4(zero)
    assert m is not None and m["n_samples"] == 3


def test_v1_fullbox_offsets():
    """mvhd/tkhd version-1 layouts (64-bit times) shift the fixed
    fields; hand-build a v1 movie header and a v1 track header and
    assert the probe reads timescale/duration/width from the v1
    offsets."""
    from parallelutilities_jl_spark.operators.mp4 import (
        _UNITY_MATRIX,
        _box,
        _full,
    )

    mvhd1 = _full(
        b"mvhd", 1,
        struct.pack(">QQ", 0, 0)  # 64-bit ctime/mtime
        + struct.pack(">I", 90000) + struct.pack(">Q", 1234567)
        + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
        + b"\x00" * 10 + _UNITY_MATRIX + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd1 = _full(
        b"tkhd", 1,
        struct.pack(">QQ", 0, 0) + struct.pack(">I", 1) + b"\x00" * 4
        + struct.pack(">Q", 1234567) + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0) + _UNITY_MATRIX
        + struct.pack(">II", 640 << 16, 480 << 16),
        flags=3,
    )
    hdlr = _full(
        b"hdlr", 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"x\x00",
    )
    stsz = _full(b"stsz", 0, struct.pack(">II", 100, 7))  # fixed-size form
    stbl = _box(b"stbl", stsz)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", hdlr + minf)
    trak = _box(b"trak", tkhd1 + mdia)
    moov = _box(b"moov", mvhd1 + trak)
    ftyp = _box(b"ftyp", b"iso5" + struct.pack(">I", 0) + b"isom")
    m = probe_mp4(ftyp + moov)
    assert m is not None
    assert m["brand"] == "iso5"
    assert m["timescale"] == 90000 and m["duration"] == 1234567
    assert (m["width"], m["height"]) == (640, 480)
    # fixed-size stsz: media_bytes = sample_size * count
    assert m["n_samples"] == 7 and m["media_bytes"] == 700
    assert m["mdat_bytes"] == 0  # no mdat box in this fixture


def test_unknown_boxes_and_multi_track():
    """Real files carry free/skip padding and non-video tracks: the
    walk must skip unknown boxes at every level, count ALL tracks, and
    take dimensions from the FIRST video track (hdlr 'vide'), not from
    an audio track that happens to come first."""
    from parallelutilities_jl_spark.operators.mp4 import (
        _UNITY_MATRIX,
        _box,
        _full,
    )

    def track(handler: bytes, w: int, h: int, n_samples: int):
        tkhd = _full(
            b"tkhd", 0,
            struct.pack(">II", 0, 0) + struct.pack(">I", 1) + b"\x00" * 4
            + struct.pack(">I", 0) + b"\x00" * 8
            + struct.pack(">HHHH", 0, 0, 0, 0) + _UNITY_MATRIX
            + struct.pack(">II", w << 16, h << 16),
            flags=3,
        )
        hdlr = _full(
            b"hdlr", 0,
            struct.pack(">I", 0) + handler + b"\x00" * 12 + b"x\x00",
        )
        stsz = _full(b"stsz", 0, struct.pack(">II", 10, n_samples))
        stbl = _box(b"stbl", stsz)
        minf = _box(b"minf", _box(b"free", b"pad") + stbl)
        mdia = _box(b"mdia", hdlr + _box(b"skip", b"") + minf)
        return _box(b"trak", tkhd + mdia)

    mvhd = _full(
        b"mvhd", 0,
        struct.pack(">II", 0, 0) + struct.pack(">II", 1000, 555)
        + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
        + b"\x00" * 10 + _UNITY_MATRIX + b"\x00" * 24
        + struct.pack(">I", 3),
    )
    moov = _box(
        b"moov",
        mvhd + _box(b"udta", b"meta!")  # unknown moov child: skipped
        + track(b"soun", 0, 0, 4)  # audio track first
        + track(b"vide", 320, 240, 9),
    )
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    data = ftyp + _box(b"free", b"\x00" * 13) + moov
    m = probe_mp4(data)
    assert m is not None
    assert m["n_tracks"] == 2
    # dims come from the VIDEO track even though audio came first
    assert (m["width"], m["height"]) == (320, 240)
    # stsz totals sum over ALL tracks (fixed-size form: 10*4 + 10*9)
    assert m["n_samples"] == 13 and m["media_bytes"] == 130
    assert m["timescale"] == 1000 and m["duration"] == 555


def test_truncated_inner_boxes_fail_closed():
    """Round-16 review finding: a well-framed file whose tkhd/stsz/
    mvhd payload is SHORTER than its fixed layout must return None —
    fixed-offset reads may never spill into a sibling box and report
    confident garbage."""
    from parallelutilities_jl_spark.operators.mp4 import _box, _full

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")

    def movie(trak_children: bytes, mvhd: bytes | None = None) -> bytes:
        if mvhd is None:
            mvhd = _full(
                b"mvhd", 0,
                struct.pack(">II", 0, 0) + struct.pack(">II", 1000, 5)
                + b"\x00" * 80,
            )
        return ftyp + _box(b"moov", mvhd + _box(b"trak", trak_children))

    # tkhd with a 12-byte payload (v0 needs 80): must reject
    short_tkhd = _full(b"tkhd", 0, b"\x00" * 8)
    assert probe_mp4(movie(short_tkhd)) is None
    # stsz with a 4-byte payload (needs 8): must reject
    hdlr = _full(
        b"hdlr", 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"\x00"
    )
    short_stsz = _full(b"stsz", 0, struct.pack(">I", 0))
    mdia = _box(b"mdia", hdlr + _box(b"minf", _box(b"stbl", short_stsz)))
    ok_tkhd = _full(b"tkhd", 0, b"\x00" * 80)
    assert probe_mp4(movie(ok_tkhd + mdia)) is None
    # mvhd with an 8-byte payload (v0 needs 16): must reject
    short_mvhd = _full(b"mvhd", 0, b"\x00" * 4)
    assert probe_mp4(movie(ok_tkhd, mvhd=short_mvhd)) is None


def test_multi_mdat_sums_and_double_moov_rejects():
    good = encode_mp4([5, 6, 7], 32, 16)
    ft_end = struct.unpack(">I", good[:4])[0]
    md_size = struct.unpack(">I", good[ft_end : ft_end + 4])[0]
    mdat = good[ft_end : ft_end + md_size]
    moov = good[ft_end + md_size :]
    # progressive-download layout: two mdat boxes -> payloads SUM
    m = probe_mp4(good[:ft_end] + mdat + mdat + moov)
    assert m is not None and m["mdat_bytes"] == 2 * (md_size - 8)
    # a second moov is rejected, not double-counted
    assert probe_mp4(good + moov) is None
