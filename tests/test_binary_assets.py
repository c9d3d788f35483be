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


def test_landing_dir_keys_on_absolute_path():
    """Two fixture trees sharing a basename must get DISTINCT landing
    dirs (the round-15 ADVICE hazard: one run's stale-rebuild rmtree
    destroying another's files mid-census)."""
    a = media_dir_for("/root/testdata/sf0.001")
    b = media_dir_for("/some/other/checkout/sf0.001")
    assert a != b
    assert a == media_dir_for("/root/testdata/sf0.001")  # deterministic
    # and relative/absolute spellings of the SAME dir agree
    import os

    cwd = os.getcwd()
    try:
        os.chdir("/root/testdata")
        assert media_dir_for("sf0.001") == a
    finally:
        os.chdir(cwd)


def test_partial_landing_raises(spark, sf_dir):
    """read_media_dir must refuse a landing whose file census does not
    match the _SUCCESS.count sentinel — a truncated corpus is an error,
    not a smaller census."""
    import pytest

    landing = materialize_media_dir(spark, sf_dir)
    victim = next(
        os.path.join(d, f)
        for d, _s, files in os.walk(landing)
        for f in files
        if f.endswith((".bmp", ".wav", ".gif"))
    )
    os.remove(victim)
    with pytest.raises(ValueError, match="partial media landing"):
        read_media_dir(spark, landing)
    # re-materializing heals the landing and the read succeeds again
    materialize_media_dir(spark, sf_dir)
    assert read_media_dir(spark, landing).count() > 0


def test_landing_layout_is_shard_prefixed(spark, sf_dir):
    """Media files land under the store's fixed shard subdirectories
    (the single-directory write-contention fix), the shard is a pure
    function of the file name, and the sentinel stays at the root."""
    from parallelutilities_jl_spark.sources.binary_assets import (
        _is_media_name,
        _shard_of,
    )

    landing = materialize_media_dir(spark, sf_dir)
    root_entries = os.listdir(landing)
    assert not any(_is_media_name(f) for f in root_entries)
    assert "_SUCCESS.count" in root_entries
    n_sharded = 0
    for d, _s, files in os.walk(landing):
        if d == landing:
            continue
        shard = os.path.basename(d)
        for f in files:
            assert _shard_of(f) == shard  # deterministic placement
            n_sharded += 1
    assert n_sharded >= 3
    assert _shard_of("_SUCCESS.count") is None


def test_media_store_seam_is_honored(spark, sf_dir):
    """Injecting a MediaStore reroutes every write — file puts AND the
    sentinel — through the store object, and the binaryFile census over
    the store's target matches the default path's. This is the
    object-store hook: a production S3 store swaps in here with zero
    changes downstream."""
    from parallelutilities_jl_spark.sources.binary_assets import (
        LocalFSMediaStore,
    )

    class RecordingStore(LocalFSMediaStore):
        """LocalFS store that also journals driver-side lifecycle calls
        (put runs on executors in other processes, so the journal
        covers the driver-side seam; the puts themselves are proven by
        the files landing under the injected root)."""

        def __init__(self, root: str) -> None:
            super().__init__(root)
            self.calls: list[str] = []

        def prepare(self) -> None:
            self.calls.append("prepare")
            super().prepare()

        def list_names(self) -> list[str]:
            self.calls.append("list")
            return super().list_names()

    root = media_dir_for(sf_dir) + "_injected"
    store = RecordingStore(root)
    landing = materialize_media_dir(spark, sf_dir, store=store)
    assert landing == root
    assert "prepare" in store.calls and "list" in store.calls
    assert os.path.exists(os.path.join(root, "_SUCCESS.count"))
    default = materialize_media_dir(spark, sf_dir)
    got = sorted(
        (r.asset_id, r.modality, bytes(r.content))
        for r in read_media_dir(spark, landing).collect()
    )
    want = sorted(
        (r.asset_id, r.modality, bytes(r.content))
        for r in read_media_dir(spark, default).collect()
    )
    assert got == want and len(got) >= 3
    import shutil

    shutil.rmtree(root, ignore_errors=True)
