"""Baseline-JPEG codec pins beyond oracle parity: the oracle-checked
query only exercises DC-only solid blocks (the exactness trick), so the
general entropy/IDCT machinery is pinned here against an INDEPENDENT
reference — arbitrary quantized coefficients round-trip through
encode_jpeg_blocks → decode_jpeg and must match `idct_block` applied
straight to the dequantized coefficient matrices, covering DC
prediction, AC run-lengths, ZRL, EOB, large amplitude categories, and
byte stuffing."""

from __future__ import annotations

import numpy as np
import pytest

from parallelutilities_jl_spark.operators.jpeg import (
    _ZZ,
    JPEG_Q,
    decode_jpeg,
    encode_jpeg_blocks,
    encode_jpeg_gray,
    idct_block,
)


def _reference_pixels(q_blocks, bw, bh, quant):
    grid = np.zeros((bh * 8, bw * 8), dtype=np.int64)
    for bi, blk in enumerate(q_blocks):
        coeffs = np.zeros((8, 8))
        for k, qv in enumerate(blk):
            zz = _ZZ[k]
            coeffs[zz // 8, zz % 8] = qv * quant
        by, bx = bi // bw, bi % bw
        grid[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = idct_block(coeffs)
    return grid


def test_solid_blocks_round_trip_exact():
    """Even-valued solid blocks with q=16: decoded pixels == input
    values bit-for-bit (the property the driver oracle relies on)."""
    vals = [130, 2, 254, 128, 76, 200]
    m = decode_jpeg(encode_jpeg_gray(vals, 3, 2))
    assert m is not None
    assert (m["width"], m["height"], m["n_blocks"]) == (24, 16, 6)
    grid = m["luma"].reshape(16, 24)
    for bi, v in enumerate(vals):
        by, bx = bi // 3, bi % 3
        blk = grid[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
        assert (blk == (v & ~1)).all(), (bi, v)


def test_arbitrary_coefficients_match_reference_idct():
    """Random sparse coefficient blocks (negative DCs, scattered ACs)
    must decode to exactly the reference IDCT — pins Huffman encode/
    decode symmetry, DC prediction, and run-length coding."""
    rng = np.random.default_rng(7)
    blocks = []
    for _ in range(6):
        blk = [0] * 64
        blk[0] = int(rng.integers(-200, 200))
        for _k in range(10):
            blk[int(rng.integers(1, 64))] = int(rng.integers(-500, 500))
        blocks.append(blk)
    content = encode_jpeg_blocks(blocks, 3, 2, quant=5)
    m = decode_jpeg(content)
    assert m is not None
    want = _reference_pixels(blocks, 3, 2, 5)
    assert (m["luma"].reshape(16, 24) == want).all()


def test_zrl_long_zero_runs():
    """A lone AC at zigzag position 40 needs two ZRL (16-zero) symbols
    before the coefficient — the run>15 path."""
    blk = [0] * 64
    blk[0] = 3
    blk[40] = -7
    m = decode_jpeg(encode_jpeg_blocks([blk], 1, 1))
    assert m is not None
    assert (m["luma"].reshape(8, 8) == _reference_pixels([blk], 1, 1, JPEG_Q)).all()


def test_byte_stuffing_round_trips():
    """Large positive amplitudes produce 0xFF bytes in the entropy
    stream; the encoder must stuff 0x00 and the decoder unstuff it.
    The coefficient pattern is searched (bit alignment dependent) and
    the test asserts stuffing actually occurred."""
    for k in range(1, 12):
        for amp in (255, 511, 1023, 767, 895):
            blk = [0] * 64
            for j in range(1, k + 1):
                blk[j] = amp
            content = encode_jpeg_blocks([blk] + [[0] * 64], 1, 2)
            sos = content.find(b"\xff\xda")
            entropy = content[sos + 14 : -2]
            if b"\xff\x00" in entropy:
                m = decode_jpeg(content)
                assert m is not None
                want = _reference_pixels([blk, [0] * 64], 1, 2, JPEG_Q)
                assert (m["luma"].reshape(16, 8) == want).all()
                return
    pytest.fail("no coefficient pattern produced a stuffed byte")


def test_dc_prediction_chains_across_blocks():
    """DC is differentially coded: N blocks with distinct DCs pin the
    predictor update (a decoder that resets it per block mismatches
    from block 2 on)."""
    blocks = [[dc] + [0] * 63 for dc in (5, -3, 100, 99, -120)]
    m = decode_jpeg(encode_jpeg_blocks(blocks + [[0] * 64], 3, 2))
    assert m is not None
    want = _reference_pixels(blocks + [[0] * 64], 3, 2, JPEG_Q)
    assert (m["luma"].reshape(16, 24) == want).all()


def test_strict_rejects():
    good = encode_jpeg_gray([10, 20], 2, 1)
    assert decode_jpeg(good) is not None
    assert decode_jpeg(b"") is None
    assert decode_jpeg(b"notajpeg") is None
    assert decode_jpeg(b"\xff\xd8\xff\xd9") is None  # no scan
    assert decode_jpeg(good[:-4]) is None  # truncated entropy/EOI
    # flipping SOF0->SOF2 makes a MALFORMED progressive stream (its
    # single scan spans Ss=0..Se=63, illegal in progressive): the
    # decoder must reject it, not misdecode it as either mode
    prog = bytearray(good)
    prog[good.find(b"\xff\xc0") + 1] = 0xC2
    assert decode_jpeg(bytes(prog)) is None
    # a MALFORMED multi-component header (ncomp=3 claimed over a
    # 1-component SOF payload) is rejected, not misdecoded — real
    # 4:4:4 color streams decode (test_color_* below)
    sof = good.find(b"\xff\xc0")
    color = bytearray(good)
    color[sof + 9] = 3  # ncomp byte inside SOF0
    assert decode_jpeg(bytes(color)) is None
    # a DRI whose interval exceeds the MCU count declares restarts
    # that never fire — the stream must still decode identically
    sos = good.find(b"\xff\xda")
    dri = good[:sos] + b"\xff\xdd\x00\x04\x00\x08" + good[sos:]
    m = decode_jpeg(dri)
    assert m is not None
    assert (m["luma"] == decode_jpeg(good)["luma"]).all()
    # but a DRI that PROMISES restarts over a stream that has none
    # must fail the sync check, not silently misdecode
    dri1 = good[:sos] + b"\xff\xdd\x00\x04\x00\x01" + good[sos:]
    assert decode_jpeg(dri1) is None


def test_restart_intervals_round_trip():
    """DRI + RST0..7: byte realignment and the per-interval DC
    predictor reset must round-trip arbitrary coefficients; the marker
    cycle is verified (a tampered RST index fails closed)."""
    rng = np.random.default_rng(11)
    blocks = []
    for _ in range(12):
        blk = [0] * 64
        blk[0] = int(rng.integers(-180, 180))
        for _k in range(6):
            blk[int(rng.integers(1, 64))] = int(rng.integers(-300, 300))
        blocks.append(blk)
    for ri in (1, 2, 5):
        content = encode_jpeg_blocks(blocks, 4, 3, quant=7,
                                     restart_interval=ri)
        # the stream really contains restart markers
        assert any(
            bytes((0xFF, 0xD0 + k)) in content for k in range(8)
        ), ri
        m = decode_jpeg(content)
        assert m is not None, ri
        want = _reference_pixels(blocks, 4, 3, 7)
        assert (m["luma"].reshape(24, 32) == want).all(), ri
    # tamper: swap the first RST0 for RST1 — the modulo-8 sync check
    # must reject rather than resynchronize silently
    content = encode_jpeg_blocks(blocks, 4, 3, quant=7, restart_interval=2)
    i = content.find(b"\xff\xd0", content.find(b"\xff\xda"))
    assert i > 0
    bad = content[:i] + b"\xff\xd1" + content[i + 2 :]
    assert decode_jpeg(bad) is None


def test_decode_assets_routes_image_jpeg():
    """The image-modality sniff chain in decode_assets must recognise a
    real JPEG container (BMP and PNG parsers return None on it) and
    emit its real dims rather than the stub's."""
    from parallelutilities_jl_spark.operators.multimodal import (
        _decode_bmp,
        _decode_png,
    )

    content = encode_jpeg_gray([10, 200, 30, 64, 90, 128], 3, 2)
    assert _decode_bmp(content) is None and _decode_png(content) is None
    m = decode_jpeg(content)
    assert (m["width"], m["height"]) == (24, 16)
    # progressive streams route through the same chain (round-16: the
    # crawl's ~10-20% SOF2 files get real dims, not the stub's)
    from parallelutilities_jl_spark.operators.jpeg import (
        encode_jpeg_prog_gray,
    )
    from parallelutilities_jl_spark.operators.multimodal import (
        _decode_image_any,
    )

    prog = encode_jpeg_prog_gray([10, 200, 30, 64, 90, 128], 3, 2)
    assert _decode_bmp(prog) is None and _decode_png(prog) is None
    m = _decode_image_any(prog)
    assert m is not None and m.get("progressive") is True
    assert (m["width"], m["height"]) == (24, 16)


def test_color_solid_planes_round_trip_exact():
    """YCbCr 4:4:4 with per-block-solid even planes: every plane
    decodes to its input values bit-for-bit (the color oracle's
    exactness property)."""
    from parallelutilities_jl_spark.operators.jpeg import encode_jpeg_color

    y = [130, 2, 254, 128, 76, 200]
    cb = [(v + 64) % 256 for v in y]
    cr = [255 - v for v in y]
    m = decode_jpeg(encode_jpeg_color(y, cb, cr, 3, 2))
    assert m is not None and m["n_components"] == 3
    for plane, vals in (("luma", y), ("cb", cb), ("cr", cr)):
        g = m[plane].reshape(16, 24)
        for bi, v in enumerate(vals):
            by, bx = bi // 3, bi % 3
            assert (
                g[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] == (v & ~1)
            ).all(), (plane, bi)


def test_color_arbitrary_coefficients_with_restarts():
    """Interleaved MCUs with distinct luma/chroma quant tables,
    arbitrary coefficients, and restart markers: each plane must match
    the reference IDCT — pins per-component DC predictors (a
    cross-component leak corrupts from MCU 2 on) and the per-interval
    reset of all three."""
    from parallelutilities_jl_spark.operators.jpeg import (
        encode_jpeg_color_blocks,
    )

    rng = np.random.default_rng(3)
    comp_blocks = []
    for _ in range(3):
        blocks = []
        for _b in range(6):
            blk = [0] * 64
            blk[0] = int(rng.integers(-150, 150))
            for _k in range(5):
                blk[int(rng.integers(1, 64))] = int(rng.integers(-200, 200))
            blocks.append(blk)
        comp_blocks.append(blocks)
    content = encode_jpeg_color_blocks(
        comp_blocks, 3, 2, quant_y=4, quant_c=9, restart_interval=2
    )
    m = decode_jpeg(content)
    assert m is not None
    for ci, (plane, qv) in enumerate((("luma", 4), ("cb", 9), ("cr", 9))):
        want = _reference_pixels(comp_blocks[ci], 3, 2, qv)
        assert (m[plane].reshape(16, 24) == want).all(), plane
    # chroma subsampling (sampling factor 0x22) is out of the declared
    # scope and must reject, not misdecode
    i = content.find(b"\xff\xc0")
    sub = bytearray(content)
    sub[i + 11] = 0x22
    assert decode_jpeg(bytes(sub)) is None


def test_420_solid_planes_round_trip_exact():
    """4:2:0: four full-res Y blocks + one half-res chroma pair per
    16x16 MCU; solid even blocks decode bit-exactly, with chroma
    replicated to full resolution (16x16 per MCU block)."""
    from parallelutilities_jl_spark.operators.jpeg import encode_jpeg_420

    mcw, mch = 2, 1
    yv = [10, 40, 70, 100, 130, 160, 190, 220]  # 2x4 full-res grid
    cb, cr = [64, 128], [200, 30]
    m = decode_jpeg(encode_jpeg_420(yv, cb, cr, mcw, mch))
    assert m is not None
    assert (m["width"], m["height"], m["n_components"], m["n_blocks"]) == (
        32, 16, 3, 2,
    )
    Y = m["luma"].reshape(16, 32)
    for bi, v in enumerate(yv):
        by, bx = bi // 4, bi % 4
        assert (Y[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] == (v & ~1)).all()
    for plane, vals in (("cb", cb), ("cr", cr)):
        g = m[plane].reshape(16, 32)
        for mi, v in enumerate(vals):
            my, mx = mi // mcw, mi % mcw
            assert (
                g[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16]
                == (v & ~1)
            ).all(), (plane, mi)


def test_420_arbitrary_coefficients_with_restarts():
    """4:2:0 with arbitrary coefficients, distinct quant tables, and a
    restart every MCU: each native-resolution plane must match the
    reference IDCT (chroma compared after replicate-upsampling) — pins
    the in-MCU Y block order, the three predictors, and the upsample."""
    from parallelutilities_jl_spark.operators.jpeg import (
        encode_jpeg_420_blocks,
    )

    rng = np.random.default_rng(5)

    def rand_blocks(n):
        out = []
        for _ in range(n):
            blk = [0] * 64
            blk[0] = int(rng.integers(-120, 120))
            for _k in range(4):
                blk[int(rng.integers(1, 64))] = int(rng.integers(-150, 150))
            out.append(blk)
        return out

    yb, cbb, crb = rand_blocks(16), rand_blocks(4), rand_blocks(4)
    m = decode_jpeg(
        encode_jpeg_420_blocks(
            yb, cbb, crb, 2, 2, quant_y=6, quant_c=11, restart_interval=1
        )
    )
    assert m is not None
    assert (m["luma"].reshape(32, 32) == _reference_pixels(yb, 4, 4, 6)).all()
    for plane, blocks in (("cb", cbb), ("cr", crb)):
        want = np.repeat(
            np.repeat(_reference_pixels(blocks, 2, 2, 11), 2, axis=0),
            2, axis=1,
        )
        assert (m[plane].reshape(32, 32) == want).all(), plane


def test_unsupported_sampling_layouts_reject():
    """Only all-1x1 and Y-2x2/chroma-1x1 are in scope: 4:1:1 (Y 4x1)
    and 4:2:2 (Y 2x1) must reject rather than misdecode."""
    from parallelutilities_jl_spark.operators.jpeg import encode_jpeg_420

    good = encode_jpeg_420([10] * 8, [20, 30], [40, 50], 2, 1)
    i = good.find(b"\xff\xc0")
    for byte in (0x41, 0x21, 0x12):
        bad = bytearray(good)
        bad[i + 11] = byte  # Y sampling factor
        assert decode_jpeg(bytes(bad)) is None, hex(byte)


def test_property_random_blocks_round_trip_all_layouts():
    """Property: ANY quantized coefficient pattern round-trips exactly
    in all three layouts (gray, 4:4:4, 4:2:0). Hypothesis drives the
    coefficient geometry; the reference is the straight IDCT."""
    from hypothesis import given, settings, strategies as st

    from parallelutilities_jl_spark.operators.jpeg import (
        encode_jpeg_420_blocks,
        encode_jpeg_color_blocks,
    )

    coeff = st.integers(min_value=-1023, max_value=1023)
    pos = st.integers(min_value=1, max_value=63)

    @st.composite
    def block(draw):
        blk = [0] * 64
        blk[0] = draw(st.integers(min_value=-256, max_value=256))
        for p, c in draw(
            st.lists(st.tuples(pos, coeff), min_size=0, max_size=8)
        ):
            blk[p] = c
        return blk

    @settings(max_examples=20, deadline=None)
    @given(
        blocks=st.lists(block(), min_size=4, max_size=4),
        quant=st.integers(min_value=1, max_value=32),
        ri=st.sampled_from([0, 1, 3]),
    )
    def run(blocks, quant, ri):
        # gray 2x2 blocks
        m = decode_jpeg(
            encode_jpeg_blocks(blocks, 2, 2, quant=quant,
                               restart_interval=ri)
        )
        assert m is not None
        assert (
            m["luma"].reshape(16, 16)
            == _reference_pixels(blocks, 2, 2, quant)
        ).all()
        # 4:4:4 — same blocks in every plane
        m = decode_jpeg(
            encode_jpeg_color_blocks(
                [blocks, blocks, blocks], 2, 2,
                quant_y=quant, quant_c=quant, restart_interval=ri,
            )
        )
        assert m is not None
        want = _reference_pixels(blocks, 2, 2, quant)
        for plane in ("luma", "cb", "cr"):
            assert (m[plane].reshape(16, 16) == want).all(), plane
        # 4:2:0 — one MCU: the 4 blocks are the Y grid, chroma reuses
        # block 0
        m = decode_jpeg(
            encode_jpeg_420_blocks(
                blocks, [blocks[0]], [blocks[0]], 1, 1,
                quant_y=quant, quant_c=quant,
            )
        )
        assert m is not None
        assert (
            m["luma"].reshape(16, 16)
            == _reference_pixels(blocks, 2, 2, quant)
        ).all()
        cw = np.repeat(
            np.repeat(_reference_pixels([blocks[0]], 1, 1, quant), 2,
                      axis=0),
            2, axis=1,
        )
        assert (m["cb"].reshape(16, 16) == cw).all()

    run()


# ---------------------------------------------------------------------------
# progressive (SOF2) — round 16
# ---------------------------------------------------------------------------


def test_progressive_solid_blocks_round_trip_exact():
    """Per-block-solid progressive stream (the oracle's exactness
    pattern): six scans — DC first/refine, two AC bands first/refine —
    must reconstruct the even-ified inputs bit-for-bit."""
    from parallelutilities_jl_spark.operators.jpeg import (
        encode_jpeg_prog_gray,
    )

    vals = [130, 2, 254, 128, 76, 200]
    m = decode_jpeg(encode_jpeg_prog_gray(vals, 3, 2))
    assert m is not None and m.get("progressive") is True
    assert (m["width"], m["height"], m["n_blocks"]) == (24, 16, 6)
    grid = m["luma"].reshape(16, 24)
    for bi, v in enumerate(vals):
        by, bx = bi // 3, bi % 3
        assert (grid[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                == (v & ~1)).all(), (bi, v)


def test_progressive_arbitrary_coefficients_match_reference():
    """Arbitrary coefficients through the full successive-approximation
    script (DC Al=1→0, AC bands Al=1→0) must equal the straight IDCT —
    pins point transforms, newly-significant placement, correction-bit
    ordering, and EOBn runs, with and without restart markers."""
    from parallelutilities_jl_spark.operators.jpeg import (
        encode_jpeg_progressive_blocks,
    )

    rng = np.random.default_rng(19)
    blocks = []
    for _ in range(6):
        blk = [0] * 64
        blk[0] = int(rng.integers(-200, 200))
        for _k in range(10):
            blk[int(rng.integers(1, 64))] = int(rng.integers(-500, 500))
        blocks.append(blk)
    want = _reference_pixels(blocks, 3, 2, 5)
    for ri in (0, 1, 2, 5):
        content = encode_jpeg_progressive_blocks(
            blocks, 3, 2, quant=5, restart_interval=ri
        )
        assert b"\xff\xc2" in content  # really SOF2
        m = decode_jpeg(content)
        assert m is not None, ri
        assert (m["luma"].reshape(16, 24) == want).all(), ri
    # tampered restart index must fail closed in progressive scans too
    content = encode_jpeg_progressive_blocks(
        blocks, 3, 2, quant=5, restart_interval=1
    )
    i = content.find(b"\xff\xd0", content.find(b"\xff\xda"))
    assert i > 0
    assert decode_jpeg(content[:i] + b"\xff\xd1" + content[i + 2 :]) is None


def test_progressive_dense_small_amplitudes():
    """Bands dense with +-1..+-3 values maximise the hard refinement
    interleavings (newly-significant next to history-nonzero inside
    ZRL spans and EOB tails)."""
    from parallelutilities_jl_spark.operators.jpeg import (
        encode_jpeg_progressive_blocks,
    )

    rng = np.random.default_rng(23)
    for _trial in range(10):
        blocks = []
        for _ in range(4):
            blk = [int(rng.integers(-3, 4)) for _ in range(64)]
            blk[0] = int(rng.integers(-60, 60))
            blocks.append(blk)
        m = decode_jpeg(
            encode_jpeg_progressive_blocks(blocks, 2, 2, quant=3)
        )
        assert m is not None
        assert (
            m["luma"].reshape(16, 16) == _reference_pixels(blocks, 2, 2, 3)
        ).all()


def test_progressive_long_eob_runs():
    """An EOBn run spanning 38 all-zero high bands (needs extension
    bits: 38 = 2^5 + 6) must skip exactly that many blocks."""
    from parallelutilities_jl_spark.operators.jpeg import (
        encode_jpeg_progressive_blocks,
    )

    blocks = [[0] * 64 for _ in range(40)]
    blocks[0][0] = 10
    blocks[0][5] = 7
    blocks[39][63] = -3
    m = decode_jpeg(encode_jpeg_progressive_blocks(blocks, 8, 5))
    assert m is not None
    assert (
        m["luma"].reshape(40, 64) == _reference_pixels(blocks, 8, 5, JPEG_Q)
    ).all()


def test_progressive_color_444_and_420():
    """Progressive color: interleaved DC scans (per-component
    predictors over MCU order) + per-component AC band scans, in both
    4:4:4 and the camera-standard 4:2:0 (chroma compared after
    replicate-upsample)."""
    from parallelutilities_jl_spark.operators.jpeg import (
        encode_jpeg_progressive_420_blocks,
        encode_jpeg_progressive_color_blocks,
    )

    rng = np.random.default_rng(29)

    def rand_blocks(n):
        out = []
        for _ in range(n):
            blk = [0] * 64
            blk[0] = int(rng.integers(-120, 120))
            for _k in range(5):
                blk[int(rng.integers(1, 64))] = int(rng.integers(-200, 200))
            out.append(blk)
        return out

    comp_blocks = [rand_blocks(6) for _ in range(3)]
    m = decode_jpeg(
        encode_jpeg_progressive_color_blocks(
            comp_blocks, 3, 2, quant_y=4, quant_c=9, restart_interval=2
        )
    )
    assert m is not None and m["n_components"] == 3
    for ci, (plane, qv) in enumerate((("luma", 4), ("cb", 9), ("cr", 9))):
        assert (
            m[plane].reshape(16, 24)
            == _reference_pixels(comp_blocks[ci], 3, 2, qv)
        ).all(), plane

    yb, cbb, crb = rand_blocks(16), rand_blocks(4), rand_blocks(4)
    m = decode_jpeg(
        encode_jpeg_progressive_420_blocks(
            yb, cbb, crb, 2, 2, quant_y=6, quant_c=11, restart_interval=1
        )
    )
    assert m is not None
    assert (m["luma"].reshape(32, 32) == _reference_pixels(yb, 4, 4, 6)).all()
    for plane, blocks in (("cb", cbb), ("cr", crb)):
        want = np.repeat(
            np.repeat(_reference_pixels(blocks, 2, 2, 11), 2, axis=0),
            2, axis=1,
        )
        assert (m[plane].reshape(32, 32) == want).all(), plane


def test_progressive_rejects_malformed_scans():
    """Fail-closed pins: a progressive scan mixing DC and AC bands, an
    interleaved AC scan, and a truncated stream all return None."""
    from parallelutilities_jl_spark.operators.jpeg import (
        encode_jpeg_prog_gray,
    )

    good = encode_jpeg_prog_gray([10, 20, 30, 40], 2, 2)
    assert decode_jpeg(good) is not None
    assert decode_jpeg(good[:-4]) is None  # truncated
    # corrupt the first SOS's spectral selection: Ss=0,Se=63 in a
    # progressive frame is the mixed-band error branch
    sos = good.find(b"\xff\xda")
    bad = bytearray(good)
    bad[sos + 2 + 2 + 1 + 2 + 1] = 63  # Se byte of the DC scan header
    assert decode_jpeg(bytes(bad)) is None


def test_header_fill_bytes_and_tem_markers():
    """T.81 B.1.1.2: 0xFF fill bytes may pad any marker and TEM (0xFF01)
    is a standalone marker — both must parse, in baseline and
    progressive headers (the round-15 ADVICE item)."""
    from parallelutilities_jl_spark.operators.jpeg import (
        encode_jpeg_prog_gray,
    )

    for enc in (lambda v: encode_jpeg_gray(v, 2, 2),
                lambda v: encode_jpeg_prog_gray(v, 2, 2)):
        good = enc([10, 200, 30, 64])
        base = decode_jpeg(good)
        assert base is not None
        i = good.find(b"\xff\xdb")
        filled = good[:i] + b"\xff\xff\xff" + good[i:]
        m = decode_jpeg(filled)
        assert m is not None and (m["luma"] == base["luma"]).all()
        tem = good[:i] + b"\xff\x01" + good[i:]
        m = decode_jpeg(tem)
        assert m is not None and (m["luma"] == base["luma"]).all()
        both = good[:i] + b"\xff\xff\x01" + good[i:]
        m = decode_jpeg(both)
        assert m is not None and (m["luma"] == base["luma"]).all()


def test_property_random_blocks_round_trip_progressive():
    """Property: ANY quantized coefficient pattern round-trips exactly
    through the progressive scan script, in grayscale and 4:4:4."""
    from hypothesis import given, settings, strategies as st

    from parallelutilities_jl_spark.operators.jpeg import (
        encode_jpeg_progressive_blocks,
        encode_jpeg_progressive_color_blocks,
    )

    coeff = st.integers(min_value=-1023, max_value=1023)
    pos = st.integers(min_value=1, max_value=63)

    @st.composite
    def block(draw):
        blk = [0] * 64
        blk[0] = draw(st.integers(min_value=-256, max_value=256))
        for p, c in draw(
            st.lists(st.tuples(pos, coeff), min_size=0, max_size=8)
        ):
            blk[p] = c
        return blk

    @settings(max_examples=20, deadline=None)
    @given(
        blocks=st.lists(block(), min_size=4, max_size=4),
        quant=st.integers(min_value=1, max_value=32),
        ri=st.sampled_from([0, 1, 3]),
    )
    def run(blocks, quant, ri):
        want = _reference_pixels(blocks, 2, 2, quant)
        m = decode_jpeg(
            encode_jpeg_progressive_blocks(
                blocks, 2, 2, quant=quant, restart_interval=ri
            )
        )
        assert m is not None and m.get("progressive") is True
        assert (m["luma"].reshape(16, 16) == want).all()
        m = decode_jpeg(
            encode_jpeg_progressive_color_blocks(
                [blocks, blocks, blocks], 2, 2,
                quant_y=quant, quant_c=quant, restart_interval=ri,
            )
        )
        assert m is not None
        for plane in ("luma", "cb", "cr"):
            assert (m[plane].reshape(16, 16) == want).all(), plane

    run()
