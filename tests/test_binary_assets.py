"""binaryFile landing-zone ingest pins beyond oracle parity: the
write→list→read loop must reproduce the in-flight asset frame BYTE
FOR BYTE (id and modality recovered from file names, payload via the
binaryFile source's content column), and the materialization must be
idempotent with a truthful _SUCCESS.count sentinel."""

from __future__ import annotations

import os

from parallelutilities_jl_spark.operators.multimodal import (
    synthesize_media_from_docs,
)
from parallelutilities_jl_spark.sources.binary_assets import (
    materialize_media_dir,
    media_dir_for,
    read_media_dir,
)
from parallelutilities_jl_spark.sources.fixtures import load_table


def test_binaryfile_ingest_round_trips_bytes(spark, sf_dir):
    landing = materialize_media_dir(spark, sf_dir)
    want = {
        r.asset_id: (r.modality, bytes(r.content))
        for r in synthesize_media_from_docs(
            load_table(spark, sf_dir, "documents")
        ).collect()
    }
    got = {
        r.asset_id: (r.modality, bytes(r.content))
        for r in read_media_dir(spark, landing).collect()
    }
    assert got == want
    assert len(got) >= 3  # all three modalities present at sf0.001
    with open(os.path.join(landing, "_SUCCESS.count")) as f:
        assert int(f.read()) == len(want)


def test_materialize_is_idempotent(spark, sf_dir):
    """A second materialization overwrites in place: same file set,
    same bytes, same sentinel — the crash-safe tmp+rename publish."""
    d1 = materialize_media_dir(spark, sf_dir)
    files1 = sorted(os.listdir(d1))
    d2 = materialize_media_dir(spark, sf_dir)
    assert d1 == d2 == media_dir_for(sf_dir)
    assert sorted(os.listdir(d2)) == files1


def test_materialize_reclaims_stale_files(spark, sf_dir):
    """A landing dir holding files from a previously-larger fixture
    must be rebuilt from empty, not censused with phantom assets."""
    landing = materialize_media_dir(spark, sf_dir)
    with open(os.path.join(landing, "999999999.bmp"), "wb") as f:
        f.write(b"stale")
    landing2 = materialize_media_dir(spark, sf_dir)
    assert landing2 == landing
    assert not os.path.exists(os.path.join(landing, "999999999.bmp"))
    with open(os.path.join(landing, "_SUCCESS.count")) as f:
        n = int(f.read())
    got = read_media_dir(spark, landing).count()
    assert got == n
