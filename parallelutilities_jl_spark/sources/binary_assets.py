"""Binary-file landing-zone ingest: the 100 TB media path.

Every multimodal query so far synthesizes container bytes in-flight;
a real deployment reads them as FILES from object storage. This module
exercises that exact path end-to-end with Spark's built-in
`binaryFile` source:

1. `materialize_media_dir` writes one real container file per document
   (`<doc_id>.bmp` / `.wav` / `.gif`, the round-15 mixed-media
   synthesizers) from the EXECUTORS via `foreachPartition` — the
   distributed write shape, no driver-side collect of payloads;
2. `read_media_dir` ingests the directory with
   `spark.read.format("binaryFile")` (path, length, content columns;
   at cluster scale the source splits the listing across tasks and
   prunes by `pathGlobFilter`), parses the asset id and modality from
   the file name, and hands the SAME (asset_id, modality, content)
   frame to the existing decode chain.

The oracle never sees the files: `multimodal_binaryfile_census` must
hash-match the same closed-form census as the in-flight pipeline
(`_oracle_media_census`) — any loss, duplication, or corruption in the
write→list→read→decode loop moves a count between groups.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EXT = {"image": "bmp", "audio": "wav", "video": "gif"}
_MOD_OF_EXT = {v: k for k, v in _EXT.items()}


def media_dir_for(sf_dir: str) -> str:
    """Deterministic per-SF landing dir under /tmp (same inputs →
    same files; repeated materializations overwrite idempotently)."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return f"/tmp/pu_media_landing_{tag}"


def materialize_media_dir(spark: SparkSession, sf_dir: str) -> str:
    """Write one real container file per document from the executors.

    `foreachPartition` keeps the write distributed (each task writes
    its partition's files; payloads never visit the driver) — in
    production the `open()` becomes an object-store put with the same
    per-partition loop. Idempotent: files are rewritten in place, and
    a `_SUCCESS.count` sentinel records the expected file count so
    `read_media_dir` can detect a partial landing."""
    from parallelutilities_jl_spark.operators.multimodal import (
        synthesize_media_from_docs,
    )
    from parallelutilities_jl_spark.session import (
        ensure_package_on_executors,
    )
    from parallelutilities_jl_spark.sources.fixtures import (
        load_table_parallel,
    )

    ensure_package_on_executors(spark)
    out_dir = media_dir_for(sf_dir)
    os.makedirs(out_dir, exist_ok=True)
    assets = synthesize_media_from_docs(
        load_table_parallel(spark, sf_dir, "documents")
    )

    def write_part(rows) -> None:
        for r in rows:
            ext = _EXT[r.modality]
            path = os.path.join(out_dir, f"{r.asset_id}.{ext}")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(bytes(r.content))
            os.replace(tmp, path)  # atomic publish, crash-safe

    def media_file_count() -> int:
        return sum(
            1 for f in os.listdir(out_dir)
            if f.rsplit(".", 1)[-1] in _MOD_OF_EXT
        )

    n_expected = assets.count()
    assets.foreachPartition(write_part)
    if media_file_count() != n_expected:
        # stale landing: a previous materialization of a LARGER fixture
        # left extra files the overwrite pass cannot reclaim — rebuild
        # from empty rather than census phantom assets (deployment
        # landing zones are ground truth and never take this path; it
        # exists because this dir is DERIVED from the fixtures)
        import shutil

        shutil.rmtree(out_dir)
        os.makedirs(out_dir, exist_ok=True)
        assets.foreachPartition(write_part)
    n = media_file_count()
    with open(os.path.join(out_dir, "_SUCCESS.count"), "w") as f:
        f.write(str(n))
    return out_dir


def read_media_dir(spark: SparkSession, landing_dir: str) -> DataFrame:
    """Ingest the landing dir with the built-in `binaryFile` source and
    recover (asset_id, modality, content) from the file names — the
    frame every downstream decode operator already accepts. Scale
    shape: the source parallelizes over files (one split per file up
    to maxPartitionBytes), filters prune on path, and `content` stays
    a binary column end to end."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{bmp,wav,gif}")
        .load(landing_dir)
    )
    ext = F.element_at(F.split(F.col("path"), r"\."), -1)
    fname = F.element_at(F.split(F.col("path"), "/"), -1)
    mod = (
        F.when(ext == "bmp", "image")
        .when(ext == "wav", "audio")
        .otherwise("video")
    )
    return raw.select(
        F.regexp_extract(fname, r"^(\d+)\.", 1).cast("long").alias(
            "asset_id"
        ),
        mod.alias("modality"),
        F.col("content"),
    )


def q_multimodal_binaryfile_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Files-on-disk twin of `multimodal_media_census`: materialize the
    landing dir (distributed write), re-ingest it via the binaryFile
    source, decode, census. Hash-checked against the SAME closed-form
    oracle as the in-flight pipeline, so the whole write→list→read
    loop is on the correctness path."""
    from parallelutilities_jl_spark.operators.multimodal import (
        decode_assets,
    )

    landing = materialize_media_dir(spark, sf_dir)
    dec = decode_assets(read_media_dir(spark, landing))
    return dec.groupBy("modality", "width", "height").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.coalesce(F.col("n_frames"), F.lit(0)))
        .cast("long")
        .alias("frames_total"),
    )
