"""Structured Streaming surface over the `events` fixture (SURVEY §7
phase 6 — the reference has no streaming; this is the Spark-native
extension the north star mandates).

Streaming entry points (`stream_events` → windowed/session aggregations →
memory/foreachBatch sinks) are exercised by tests/test_streaming.py with
`processAllAvailable()`; the oracle-checked queries below are the *batch
equivalents* of the same window specs (identical semantics by Spark's
unified batch/streaming model), so the driver can hash-check them against
DuckDB.

Watermark notes for the real stream: 10-minute watermark bounds state for
tumbling/sliding windows; session windows merge while events arrive within
the gap. At scale, state lives in the checkpointed state store partitioned
by group key — the same shuffle key as the batch equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parallelutilities_jl_spark.sources.fixtures import load_table

EVENTS_STREAM_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

SESSION_GAP_SEC = 1800


def _stage_dir(sf_dir: str, fname: str, prefix: str) -> str:
    """Create the single-file staging dir (dir-watching file sources
    want a directory; the fixture is one file, exposed via symlink) and
    register it for removal at interpreter exit — each call otherwise
    leaks one temp dir per stream construction."""
    import atexit
    import os
    import shutil
    import tempfile

    stage = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, stage, ignore_errors=True)
    os.symlink(os.path.join(sf_dir, fname), os.path.join(stage, fname))
    return stage


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet. The fixture stores
    `ts` as parquet `timestamp[us]` (see tests/test_streaming.py fixture
    guard), so the stream schema declares `ts timestamp` directly — the
    same type the batch loader sees.

    The parquet file source wants a *directory* it can watch for new
    files; the fixture is a single file, so it is exposed through a
    temp directory symlink (in production the directory is the landing
    zone new files arrive into)."""
    stage = _stage_dir(sf_dir, "events.parquet", "pu_events_stream_")
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .load(stage)
    )



DOCUMENTS_STREAM_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents parquet (same staging
    trick as `stream_events`) — the ingest side of decode-on-arrival
    pipelines: stateless mapInPandas codec stages apply to this stream
    unchanged (tests/test_streaming_decode.py pins stream ≡ batch for
    the BMP decode census)."""
    stage = _stage_dir(sf_dir, "documents.parquet", "pu_documents_stream_")
    return (
        spark.readStream.schema(DOCUMENTS_STREAM_SCHEMA)
        .format("parquet")
        .load(stage)
    )


def _val_e2() -> F.Column:
    """Exact int64 of the 2-dp-exact value column: integer streaming
    state is combine-order- and trigger-boundary-independent, and
    cheaper than per-row decimal accumulation. Reuses the batch path's
    quantizer so the formula can never silently diverge from the
    _DD_E2 oracle template."""
    from parallelutilities_jl_spark.operators.relational import _e2

    return _e2(F.col("value"))

def tumbling_counts(events: DataFrame, watermark: bool = True) -> DataFrame:
    """1-hour tumbling window × event_type counts (+ watermark when
    streaming)."""
    src = events.withWatermark("ts", "10 minutes") if watermark else events
    return (
        src.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # exact quantized int64 sum (order-independent), cast to
            # double, no ROUND: Spark rounds a double's shortest decimal
            # repr while DuckDB rounds its binary value, so ROUND on the
            # same double can disagree at exact ties (e.g. x.xxx75/8)
            (
                F.sum(_val_e2()).cast("double") / F.lit(100.0)
            ).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_avg(events: DataFrame, watermark: bool = True) -> DataFrame:
    """1-hour window sliding every 30 minutes."""
    src = events.withWatermark("ts", "10 minutes") if watermark else events
    return (
        src.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(_val_e2()).cast("double") / F.lit(100.0)
                / F.count(F.lit(1))
            ).alias("avg_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start"),
            "n",
            "avg_value",
        )
    )


def session_agg(events: DataFrame, watermark: bool = True) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap."""
    src = events.withWatermark("ts", "10 minutes") if watermark else events
    return (
        src.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(_val_e2()).cast("double") / F.lit(100.0)
            ).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start")).alias("sess_start"),
            "n_events",
            "sum_value",
        )
    )


def dedup_within_watermark(events: DataFrame) -> DataFrame:
    """Stateful streaming dedup on event_id bounded by the watermark."""
    return events.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def dedup_coarse_key(events: DataFrame, watermark: bool = True) -> DataFrame:
    """Streaming dedup on a coarse business key — first event per
    (user, event_type, day) survives; repeats later the same day are
    dropped (~20% of the fixture, so the dedup is non-vacuous, unlike an
    event_id-level dedup — fixture ids are all unique).

    Exactness: two duplicates of one day-key are <= 24 h apart in event
    time, and the 25 h watermark delay (> the key's span) keeps the
    first's state entry alive until the watermark can no longer be
    behind any same-day sibling — so within-lateness-bound streams dedup
    EXACTLY, while state stays bounded at roughly one day of live keys.
    Only the key columns are emitted: which physical row
    `dropDuplicatesWithinWatermark` keeps is arrival-order dependent,
    the key set is not."""
    keyed = events.withColumn(
        "day_start",
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))),
    )
    if watermark:
        keyed = keyed.withWatermark(
            "ts", "25 hours"
        ).dropDuplicatesWithinWatermark(["user_id", "event_type", "day_start"])
    else:
        keyed = keyed.dropDuplicates(["user_id", "event_type", "day_start"])
    return keyed.select("user_id", "event_type", "day_start")


ATTRIBUTION_WINDOW_SEC = 3600


def purchase_attribution(
    clicks: DataFrame, purchases: DataFrame, watermark: bool = True
) -> DataFrame:
    """Stream-stream interval join (the attribution query): each
    purchase matched to the same user's clicks in the preceding hour.

    Streaming semantics: both sides carry watermarks and the join
    condition bounds click_ts to [purchase_ts − 1 h, purchase_ts], so
    the state store can evict a click one hour + watermark after its
    event time — the canonical bounded-state stream-stream join. The
    batch equivalent (watermark=False) is the identical plan on the
    static frames and is what the DuckDB oracle checks."""
    if watermark:
        clicks = clicks.withWatermark("ts", "10 minutes")
        purchases = purchases.withWatermark("ts", "10 minutes")
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("amount"),
    )
    cond = (
        (p.user_id == c.c_user)
        & (c.click_ts <= p.purchase_ts)
        & (
            c.click_ts
            >= p.purchase_ts
            - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_SEC} SECONDS")
        )
    )
    return p.join(c, cond).select(
        "purchase_id", "user_id", "click_id", "amount"
    )


# ---------------------------------------------------------------------------
# oracle-checked batch equivalents
# ---------------------------------------------------------------------------


def q_windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load_table(spark, sf_dir, "events"), watermark=False)


def q_sliding_window_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_avg(load_table(spark, sf_dir, "events"), watermark=False)


def q_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_agg(load_table(spark, sf_dir, "events"), watermark=False)


def q_stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_coarse_key(
        load_table(spark, sf_dir, "events"), watermark=False
    )


def q_stream_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return purchase_attribution(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        watermark=False,
    )


ORACLES = {
    "windowed_event_counts": """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start,
       event_type, COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR((value) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
FROM events GROUP BY 1, 2
""",
    "sliding_window_avg": """
WITH e AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS sec, value FROM events),
w AS (SELECT (sec // 1800) * 1800 - off.o AS win_start, value
      FROM e, (VALUES (0), (1800)) off(o))
SELECT win_start, COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR((value) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) AS avg_value
FROM w GROUP BY win_start
""",
    # session semantics: a new session starts when the gap since the
    # previous event is >= the 30 min inactivity gap (Spark merges an
    # event into a session iff ts < last_ts + gap)
    "session_window_agg": f"""
WITH g AS (
  SELECT user_id, value, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch(ts) - epoch(LAG(ts) OVER w) >= {SESSION_GAP_SEC}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)
),
s AS (
  SELECT user_id, value, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, value
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM g
)
SELECT user_id, CAST(floor(epoch(MIN(ts))) AS BIGINT) AS sess_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR((value) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
FROM s GROUP BY user_id, sid
""",
}

ORACLES["stream_dedup_events"] = """
SELECT DISTINCT user_id, event_type,
       CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_start
FROM events
"""

QUERIES = {
    "windowed_event_counts": q_windowed_event_counts,
    "sliding_window_avg": q_sliding_window_avg,
    "session_window_agg": q_session_window_agg,
    "stream_join_attribution": q_stream_join_attribution,
    "stream_dedup_events": q_stream_dedup_events,
}

ORACLES["stream_join_attribution"] = f"""
SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id,
       p.value AS amount
FROM events p JOIN events c
  ON c.user_id = p.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL {ATTRIBUTION_WINDOW_SEC} SECOND
"""
