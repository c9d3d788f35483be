"""Multimodal-column plumbing: image/audio/video as opaque `binary`
columns with typed metadata (BASELINE.json north star).

The *Spark-side* machinery is real and tested — schemas, Arrow-batched
`mapInPandas` decode/feature/resize/frame-sample operators, partitioning
notes — while the actual codec calls are stubbed (`NotImplementedError`)
behind a deterministic fake, because the image/audio libraries are not in
this container. Swapping `_decode_stub` for a real `PIL.Image.open` /
`soundfile.read` changes nothing structurally: the UDF signatures,
schemas and batch shapes are what a real deployment uses.

Scale design:
* binary payloads stay columnar (parquet BYTE_ARRAY) and are only
  materialized inside the Arrow batch being decoded;
* decode → feature-extract is `mapInPandas` (per-partition batch
  iterator): no per-row Python, one Arrow exchange per batch;
* `spark.sql.files.maxPartitionBytes` bounds per-task memory — a 100 TB
  corpus of ~1 MB blobs lands ~128 blobs per task.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parallelutilities_jl_spark.sources.fixtures import load_table_parallel

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 8


def _decode_stub(content: bytes, modality: str) -> dict:
    """STUB for the real codec (PIL / soundfile / pyav are not in this
    container). Deterministic fake: metadata derived from the byte
    stream so tests are reproducible. Replace the body with the real
    decoder in deployment."""
    if modality not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for modality {modality!r}")
    h = hashlib.sha256(content).digest()
    return {
        "width": 16 + h[0] % 64,
        "height": 16 + h[1] % 64,
        "sample_rate": 8000 + (h[2] % 4) * 8000,
        "n_frames": 1 + h[3] % 32,
    }


def _features_stub(content: bytes) -> list[float]:
    """Deterministic fake embedding: FEATURE_DIM floats from sha256
    bytes. Replace with the real encoder in deployment."""
    h = hashlib.sha256(content).digest()
    return [round(b / 255.0, 6) for b in h[:FEATURE_DIM]]


def _modality_col() -> F.Column:
    return (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )


def synthesize_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a multimodal asset table from the documents fixture: text
    bytes stand in for encoded media (binary column + modality tag).
    NULL-text docs are EXCLUDED — a NULL payload cannot be decoded
    (the codec UDFs would crash on None content), mirroring how NULL
    text drops from the fingerprint tier; every multimodal oracle
    carries the same `WHERE text IS NOT NULL`."""
    docs = load_table_parallel(spark, sf_dir, "documents")
    return docs.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").alias("asset_id"),
        _modality_col().alias("modality"),
        F.col("text").cast("binary").alias("content"),
    )


def decode_assets(assets: DataFrame) -> DataFrame:
    """mapInPandas decode: (asset_id, modality, content) → + decoded
    metadata columns. Arrow-batched; per-batch Python, not per-row."""

    # the decode closure references module-level stubs, which cloudpickle
    # serializes by reference — executors must be able to import the pkg
    from parallelutilities_jl_spark.session import ensure_package_on_executors

    ensure_package_on_executors(assets.sparkSession)

    out_schema = (
        "asset_id long, modality string, n_bytes long, width int, "
        "height int, sample_rate int, n_frames int"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _decode_stub(c, m)
                for c, m in zip(pdf["content"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(c) for c in pdf["content"]],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "sample_rate": [m["sample_rate"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                }
            )

    return assets.mapInPandas(decode, out_schema)


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction → array<double> embedding column."""
    from parallelutilities_jl_spark.session import ensure_package_on_executors

    ensure_package_on_executors(assets.sparkSession)

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "features": [_features_stub(c) for c in pdf["content"]],
                }
            )

    return assets.mapInPandas(feats, "asset_id long, features array<double>")


RESIZE_BOX = 224


def resize_plan(decoded: DataFrame, box: int = RESIZE_BOX) -> DataFrame:
    """mapInPandas resize: fit decoded images into a `box`×`box` square
    preserving aspect ratio. The pixel transform itself is the stubbed
    part (no PIL in this container — content passes through untouched);
    the dimension arithmetic, batch shape, and schema are the real
    deployment surface."""
    imgs = decoded.filter(F.col("modality") == "image")

    out_schema = (
        "asset_id long, width int, height int, new_w int, new_h int"
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            new_w, new_h = [], []
            for w, h in zip(pdf["width"], pdf["height"]):
                scale = box / max(int(w), int(h))
                # floor, not round: round-half ties differ across engines
                new_w.append(max(1, math.floor(int(w) * scale)))
                new_h.append(max(1, math.floor(int(h) * scale)))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "new_w": pd.array(new_w, dtype="int32"),
                    "new_h": pd.array(new_h, dtype="int32"),
                }
            )

    return imgs.select("asset_id", "width", "height", "modality").mapInPandas(
        resize, out_schema
    )


def frame_sample(decoded: DataFrame, every_k: int = 8) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame index —
    pure column ops (sequence + explode), no decode until the downstream
    consumer fetches the frame."""
    vids = decoded.filter(F.col("modality") == "video")
    return vids.select(
        "asset_id",
        F.explode(
            F.sequence(
                F.lit(0), F.col("n_frames") - 1, F.lit(every_k)
            )
        ).alias("frame_idx"),
    )


# ---------------------------------------------------------------------------
# oracle-checked query: the binary plumbing itself (byte length, content
# hash, magic prefix) — engine-agnostic ground truth
# ---------------------------------------------------------------------------


def arrow_length_buckets(assets: DataFrame) -> DataFrame:
    """`mapInArrow` variant of the batch-UDF surface: per-row byte-length
    buckets computed directly on the Arrow RecordBatch with pyarrow
    compute kernels. Unlike mapInPandas, the binary payloads are never
    converted to Python objects — `pc.binary_length` reads the Arrow
    offsets buffer only, so a task's memory stays at the Arrow batch
    plus two integer arrays regardless of blob size. This is the shape
    real fixed-cost batch metadata passes (length/magic/validity
    screens) should take at 100 TB."""
    import pyarrow as pa

    def buckets(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        for batch in batches:
            cols = {n: batch.column(i) for i, n in enumerate(batch.schema.names)}
            lens = pc.cast(pc.binary_length(cols["content"]), pa.int64())
            bucket = pc.divide(lens, pa.scalar(256, pa.int64()))
            yield pa.RecordBatch.from_arrays(
                [cols["asset_id"], cols["modality"], lens, bucket],
                ["asset_id", "modality", "n_bytes", "bucket"],
            )

    return assets.mapInArrow(
        buckets, "asset_id long, modality string, n_bytes long, bucket long"
    )


def q_multimodal_arrow_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-copy length histogram: mapInArrow screen, then built-in agg."""
    per_row = arrow_length_buckets(synthesize_assets(spark, sf_dir))
    return per_row.groupBy("modality", "bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
    )


def q_multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = synthesize_assets(spark, sf_dir)
    return assets.select(
        "asset_id",
        "modality",
        F.length("content").cast("long").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("sha256_hex"),
        F.lower(F.hex(F.expr("substring(content, 1, 4)"))).alias("magic_hex"),
    )


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full decode pipeline over the synthesized asset table."""
    return decode_assets(synthesize_assets(spark, sf_dir))


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction: binary content → embedding, flattened to
    scalar columns f0..f{FEATURE_DIM-1} (the `minhash_signature` h0..h3
    pattern) so the driver's pandas canonicalizer can sort/hash the
    result — raw array<double> columns are unhashable there. The
    internal API (`extract_features`) still returns the array form."""
    feats = extract_features(synthesize_assets(spark, sf_dir))
    return feats.select(
        "asset_id",
        *[F.col("features")[i].alias(f"f{i}") for i in range(FEATURE_DIM)],
    )


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → video filter → every-8th-frame sampling plan."""
    return frame_sample(decode_assets(synthesize_assets(spark, sf_dir)))


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → image filter → aspect-preserving resize plan."""
    return resize_plan(decode_assets(synthesize_assets(spark, sf_dir)))


# the decode stub derives metadata from sha256 bytes; DuckDB reproduces it
# from the hex digest, making the whole stubbed pipeline oracle-checkable
def _byte(i: int) -> str:
    return f"('0x' || substring(sha256(text), {2 * i + 1}, 2))::INT"


_DD_DECODED = f"""
decoded AS (
  SELECT doc_id AS asset_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS modality,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         CAST(16 + {_byte(0)} % 64 AS INT) AS width,
         CAST(16 + {_byte(1)} % 64 AS INT) AS height,
         CAST(8000 + ({_byte(2)} % 4) * 8000 AS INT) AS sample_rate,
         CAST(1 + {_byte(3)} % 32 AS INT) AS n_frames
  FROM documents WHERE text IS NOT NULL)
"""

ORACLES = {
    "multimodal_decode": f"""
WITH {_DD_DECODED}
SELECT * FROM decoded
""",
    "multimodal_features": f"""
SELECT doc_id AS asset_id,
       {", ".join(f"ROUND({_byte(i)} / 255.0, 6) AS f{i}" for i in range(FEATURE_DIM))}
FROM documents WHERE text IS NOT NULL
""",
    "multimodal_frame_sample": f"""
WITH {_DD_DECODED}
SELECT asset_id, CAST(UNNEST(generate_series(0, n_frames - 1, 8)) AS INT)
           AS frame_idx
FROM decoded WHERE modality = 'video'
""",
    "multimodal_resize": f"""
WITH {_DD_DECODED}
SELECT asset_id, width, height,
       CAST(GREATEST(1, FLOOR(width * ({RESIZE_BOX}.0 / GREATEST(width, height)))) AS INT) AS new_w,
       CAST(GREATEST(1, FLOOR(height * ({RESIZE_BOX}.0 / GREATEST(width, height)))) AS INT) AS new_h
FROM decoded WHERE modality = 'image'
""",
    "multimodal_arrow_hist": """
SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS modality,
       CAST(octet_length(encode(text)) AS BIGINT) // 256 AS bucket,
       COUNT(*) AS n,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
FROM documents WHERE text IS NOT NULL GROUP BY 1, 2
""",
    "multimodal_binary_stats": """
SELECT doc_id AS asset_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS modality,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha256_hex,
       lower(substring(hex(encode(text)), 1, 8)) AS magic_hex
FROM documents WHERE text IS NOT NULL
""",
}

DEDUP_BLOCK = 9  # assets per shared-content block (3 copies per modality)


def q_multimodal_dedup_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Binary-asset dedup census: content-hash every blob, count unique
    payloads and the bytes an asset store saves by storing each payload
    once — the dedup accounting a multimodal ingest logs. The fixture's
    synthesized assets are all-distinct, so (as with the PII scrub's
    seeded contacts) duplication is seeded deterministically: every
    block of {DEDUP_BLOCK} consecutive asset ids shares one payload,
    giving each modality 3 copies of each blob — non-vacuous and
    identically reproducible in the oracle.

    Scale shape: per-asset sha256 is a narrow map; the census is a
    two-level hash agg — groupBy(modality, sha) with map-side combine,
    then groupBy(modality) over one row per distinct payload. No
    distinct-expand, no window; the payload bytes themselves never
    shuffle (only 32-byte hashes and lengths do) — at 100 TB of blobs
    that is the only workable dedup-accounting shape."""
    # NULL-text docs are excluded from both roles (asset and payload
    # base): a NULL payload has no hash — mirrored in the oracle
    docs = load_table_parallel(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    a = docs.select(
        F.col("doc_id").alias("asset_id"),
        _modality_col().alias("modality"),
        (F.col("doc_id") - F.col("doc_id") % DEDUP_BLOCK).alias("base_id"),
    )
    b = docs.select(
        F.col("doc_id").alias("base_id"),
        F.col("text").cast("binary").alias("content"),
    )
    per_asset = a.join(b, "base_id").select(
        "modality",
        F.sha2(F.col("content"), 256).alias("sha"),
        F.length("content").cast("long").alias("nb"),
    )
    g = per_asset.groupBy("modality", "sha").agg(
        F.count(F.lit(1)).alias("n_copies"), F.max("nb").alias("nb")
    )
    return g.groupBy("modality").agg(
        F.sum("n_copies").alias("n_assets"),
        F.count(F.lit(1)).alias("n_unique"),
        F.sum(F.col("n_copies") * F.col("nb")).alias("bytes_total"),
        F.sum("nb").alias("bytes_unique"),
        (
            F.sum(F.col("n_copies") * F.col("nb")) - F.sum("nb")
        ).alias("bytes_saved"),
    )


ORACLE_DEDUP_CENSUS = f"""
WITH a AS (
  SELECT doc_id AS asset_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS modality,
         doc_id - (doc_id % {DEDUP_BLOCK}) AS base_id
  FROM documents WHERE text IS NOT NULL),
c AS (SELECT a.modality, sha256(d.text) AS sha,
             CAST(length(d.text) AS BIGINT) AS nb
      FROM a JOIN documents d
        ON d.doc_id = a.base_id AND d.text IS NOT NULL),
g AS (SELECT modality, sha, COUNT(*) AS n_copies, MAX(nb) AS nb
      FROM c GROUP BY 1, 2)
SELECT modality,
       CAST(SUM(n_copies) AS BIGINT) AS n_assets,
       COUNT(*) AS n_unique,
       CAST(SUM(n_copies * nb) AS BIGINT) AS bytes_total,
       CAST(SUM(nb) AS BIGINT) AS bytes_unique,
       CAST(SUM(n_copies * nb) - SUM(nb) AS BIGINT) AS bytes_saved
FROM g GROUP BY modality
"""



SHARD_BYTES = 16384  # target shard size (WebDataset-style tar shards)
PREFIX_BUCKET = 64  # asset_id range per tier-1 prefix-sum bucket


def q_multimodal_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard manifest: assign every asset a byte offset
    in deterministic asset_id order and cut shards every {SHARD_BYTES}
    bytes (an item may straddle a cut, as tar writers that cap "bytes
    before starting a new shard" do) — the packing manifest a
    large-scale multimodal training loader is driven by.

    Scale shape: the global running byte offset is a TWO-TIER
    distributed prefix sum — tier 1 is a windowed cumulative sum WITHIN
    each asset_id//{PREFIX_BUCKET} bucket (hash-partitioned, parallel),
    tier 2 is a running total over the per-bucket byte sums. Tier 2 is
    still a single-partition window, but over |ids|/{PREFIX_BUCKET}
    rows — a {PREFIX_BUCKET}× constant-factor reduction, not an
    asymptotic one; at cluster scale, size PREFIX_BUCKET ≈ √n (or add
    a third tier) so every window stays O(√n). The manifest agg reuses
    the shard_id key. Offsets are exact int64, so shard cuts are
    engine-identical."""
    from pyspark.sql.window import Window as W

    assets = synthesize_assets(spark, sf_dir).select(
        "asset_id",
        "modality",
        F.length("content").cast("long").alias("n_bytes"),
    )
    b = assets.withColumn(
        "b", F.expr(f"asset_id div {PREFIX_BUCKET}")
    )
    w_in = (
        W.partitionBy("b")
        .orderBy("asset_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    intra = b.withColumn(
        "cum_in",
        F.coalesce(F.sum("n_bytes").over(w_in), F.lit(0).cast("long")),
    )
    btot = b.groupBy("b").agg(F.sum("n_bytes").alias("tot"))
    w_b = W.orderBy("b").rowsBetween(W.unboundedPreceding, -1)
    boff = btot.withColumn(
        "off",
        F.coalesce(F.sum("tot").over(w_b), F.lit(0).cast("long")),
    ).select("b", "off")
    placed = intra.join(F.broadcast(boff), "b").select(
        "asset_id",
        "modality",
        "n_bytes",
        (F.col("off") + F.col("cum_in")).alias("start_off"),
    )
    shards = placed.withColumn(
        "shard_id", F.expr(f"start_off div {SHARD_BYTES}")
    )
    return shards.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("n_bytes").alias("shard_bytes"),
        F.min("asset_id").alias("first_asset"),
        F.max("asset_id").alias("last_asset"),
        F.sum((F.col("modality") == "image").cast("long")).alias(
            "n_image"
        ),
    )


ORACLE_SHARD_MANIFEST = f"""
WITH a AS (
  SELECT doc_id AS asset_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS modality,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents WHERE text IS NOT NULL),
placed AS (
  SELECT asset_id, modality, n_bytes,
         COALESCE(SUM(n_bytes) OVER (ORDER BY asset_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS start_off
  FROM a)
SELECT CAST(start_off // {SHARD_BYTES} AS BIGINT) AS shard_id,
       COUNT(*) AS n_assets,
       CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
       MIN(asset_id) AS first_asset,
       MAX(asset_id) AS last_asset,
       CAST(SUM(CASE WHEN modality = 'image' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_image
FROM placed GROUP BY 1
"""


QUERIES = {
    "multimodal_arrow_hist": q_multimodal_arrow_hist,
    "multimodal_dedup_census": q_multimodal_dedup_census,
    "multimodal_binary_stats": q_multimodal_binary_stats,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_features": q_multimodal_features,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "multimodal_resize": q_multimodal_resize,
    "multimodal_shard_manifest": q_multimodal_shard_manifest,
}

ORACLES["multimodal_dedup_census"] = ORACLE_DEDUP_CENSUS
ORACLES["multimodal_shard_manifest"] = ORACLE_SHARD_MANIFEST
