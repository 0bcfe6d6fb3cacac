"""Streaming window operators (SURVEY.md section 2-B streaming rows + north
star). Tumbling/sliding/session windows run batch-first (oracle-checkable,
same window() semantics as streaming); watermark/dedup run a REAL readStream
over the replayed fixture via the streaming harness.

Scale posture: windowed aggregation states are bounded by watermarks; batch
window() compiles to a plain hash aggregate on the window struct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bee_proof_spark.queries import dsum, o_dsum, register, tbl


@register(
    "stream_tumbling_batch",
    oracle=f"""
    SELECT cast(cast(to_timestamp(floor(epoch(ts) / 3600) * 3600) as timestamp) as varchar) AS window_start,
           event_type,
           count(*) AS n_events,
           {o_dsum('value')} AS sum_value
    FROM events GROUP BY window_start, event_type
    """,
)
def stream_tumbling_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows over events.ts (epoch-floor oracle)."""
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_sliding_batch",
    oracle="""
    WITH shifted AS (
      SELECT cast(to_timestamp(floor(epoch(ts) / 1800) * 1800) as timestamp) AS slot_start, ts
      FROM events
    ),
    both_windows AS (
      SELECT cast(slot_start as varchar) AS window_start, ts FROM shifted
      UNION ALL
      SELECT cast(slot_start - INTERVAL 30 MINUTE as varchar) AS window_start, ts FROM shifted
    )
    SELECT window_start, count(*) AS n_events FROM both_windows GROUP BY window_start
    """,
)
def stream_sliding_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h size, 30 min slide): each event lands in exactly
    two windows - the oracle materializes both by shifting the 30-min slot."""
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").cast("string").alias("window_start"), "n_events")
    )


@register(
    "stream_session_batch",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM ordered
    ),
    islands AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM flagged
    )
    SELECT user_id, cast(min(ts) as varchar) AS session_start, count(*) AS n_events
    FROM islands GROUP BY user_id, session_no
    """,
)
def stream_session_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) via session_window(); oracle rebuilds the
    same sessions with gaps-and-islands (stable because event times are
    unique per user)."""
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("string").alias("session_start"),
            "n_events",
        )
    )


@register("stream_watermark_late")  # rows-only: true streaming execution
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL readStream: tumbling windows under a 1-hour watermark with
    AvailableNow replay into a memory sink. Late data beyond the watermark is
    dropped by the state store; with in-order replay the totals match batch."""
    from bee_proof_spark.streaming import replay_events_stream, run_to_memory_sink

    stream = replay_events_stream(spark, sf_dir)
    windowed = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").cast("string").alias("window_start"), "n_events")
    )
    return run_to_memory_sink(windowed, output_mode="append")


@register("stream_dedup_state")  # rows-only: true streaming execution
def stream_dedup_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL readStream: stateful dropDuplicates on (user_id, event_type)
    within the watermark - the streaming dedup pattern; state is bounded by
    the event-time watermark."""
    from bee_proof_spark.streaming import replay_events_stream, run_to_memory_sink

    stream = replay_events_stream(spark, sf_dir)
    deduped = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicates(["user_id", "event_type"])
        .select("event_id", "user_id", "event_type")
    )
    return run_to_memory_sink(deduped, output_mode="append")
