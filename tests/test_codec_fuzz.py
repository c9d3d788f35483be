"""Adversarial-bytes hardening for EVERY real container parser: at
100 TB the decode path eats crawled, untrusted, frequently-corrupt
bytes, and the engine's contract is fail-closed — each strict parser
returns None (or a valid result) on ANY input, never raises an
unhandled exception, never hangs, and never misdecodes one container
family as another. Hypothesis drives three adversaries: pure random
bytes, truncations of valid streams at every depth, and byte-level
mutations of valid streams (bit flips land in length fields, entropy
data, and box sizes alike)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from parallelutilities_jl_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg_420,
    encode_jpeg_gray,
    encode_jpeg_prog_gray,
)
from parallelutilities_jl_spark.operators.flac import (
    decode_flac,
    encode_flac,
)
from parallelutilities_jl_spark.operators.mp4 import encode_mp4, probe_mp4
from parallelutilities_jl_spark.operators.multimodal import (
    _bmp_bytes,
    _decode_bmp,
    _decode_gif,
    _decode_png,
    _decode_wav,
    _g711_samples,
    _g711_wav_container_bytes,
    _gif_bytes,
    _png_bytes,
    _wav_container_bytes,
)

# every strict parser under contract: name -> callable(bytes) that
# must return None or a result, never raise
PARSERS = {
    "jpeg": decode_jpeg,
    "wav": _decode_wav,
    "g711": _g711_samples,
    "mp4": probe_mp4,
    "bmp": _decode_bmp,
    "png": _decode_png,
    "gif": _decode_gif,
    "flac": decode_flac,
}

# one representative VALID stream per family (deterministic)
VALID = {
    "jpeg": encode_jpeg_gray([10, 200, 30, 64], 2, 2),
    "jpeg_prog": encode_jpeg_prog_gray([10, 200, 30, 64], 2, 2),
    "jpeg_420": encode_jpeg_420([10] * 8, [20, 30], [40, 50], 2, 1),
    "wav": _wav_container_bytes(3, "hello fuzzing world"),
    "g711": _g711_wav_container_bytes(0, "hello fuzzing world"),
    "mp4": encode_mp4([5, 6, 7, 8], 32, 16),
    "gif": _gif_bytes([[v % 256 for v in range(64)]], 8, 8),
    "bmp": _bmp_bytes([v % 256 for v in range(35)], 7, 5),
    "png": _png_bytes([v % 256 for v in range(35)], 7, 5),
    "flac": encode_flac(
        [[(v * 37) % 199 - 99 for v in range(70)]], blocksize=32,
        subframe="fixed", fixed_order=2,
    ),
}


def _assert_all_parsers_survive(data: bytes):
    for name, fn in PARSERS.items():
        fn(data)  # must not raise; None or a dict/tuple both fine


def test_random_bytes_never_crash_any_parser():
    @settings(
        max_examples=300, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(data=st.binary(min_size=0, max_size=256))
    def run(data):
        _assert_all_parsers_survive(data)

    run()


def test_truncations_of_valid_streams_never_crash():
    """Every prefix length of every valid container: strict parsers
    must reject (or, for a prefix that is itself complete, succeed) —
    no index errors at any cut point."""
    for fam, blob in VALID.items():
        step = max(1, len(blob) // 200)
        for cut in range(0, len(blob), step):
            _assert_all_parsers_survive(blob[:cut])


def test_mutations_of_valid_streams_never_crash():
    @settings(
        max_examples=200, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        fam=st.sampled_from(sorted(VALID)),
        pos=st.integers(min_value=0, max_value=10_000),
        val=st.integers(min_value=0, max_value=255),
        n_mut=st.integers(min_value=1, max_value=8),
        data=st.data(),
    )
    def run(fam, pos, val, n_mut, data):
        blob = bytearray(VALID[fam])
        blob[pos % len(blob)] = val
        for _ in range(n_mut - 1):
            p = data.draw(st.integers(min_value=0, max_value=len(blob) - 1))
            blob[p] = data.draw(st.integers(min_value=0, max_value=255))
        _assert_all_parsers_survive(bytes(blob))

    run()


def test_cross_family_rejection():
    """No parser may claim another family's valid container as its
    own: the sniff chains rely on strict magic+structure checks, so a
    JPEG fed to the WAV parser (etc.) must return None — the
    misrouting that would silently corrupt a census."""
    owners = {
        "jpeg": "jpeg", "jpeg_prog": "jpeg", "jpeg_420": "jpeg",
        "wav": "wav", "g711": ("wav", "g711"), "mp4": "mp4",
        "gif": "gif", "bmp": "bmp", "png": "png", "flac": "flac",
    }
    for fam, blob in VALID.items():
        own = owners[fam]
        own = own if isinstance(own, tuple) else (own,)
        for pname, fn in PARSERS.items():
            res = fn(blob)
            if pname in own:
                assert res is not None, (fam, pname)
            elif pname == "wav" and fam == "g711":
                pass  # g711 IS a wav container
            else:
                assert res is None, (
                    f"{pname} parser accepted a {fam} container"
                )
