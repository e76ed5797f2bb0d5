"""Structured Streaming over the ``events`` table.

Design: every streaming aggregation here has a *batch-equivalent
declared form* so correctness is oracle-checkable — the streaming
run (file source -> windowed agg -> memory sink, availableNow
trigger) must produce exactly the batch answer (SURVEY §7.1 M4).

- st01_stream_tumbling — 1-hour tumbling window counts/sums, executed
  by the streaming engine inside the callable; oracle = the same
  DATE_TRUNC aggregation DuckDB runs on the static table (Q26's pin).
- st02_stream_sliding  — 1-hour window sliding every 30 minutes (each
  event lands in 2 windows); same run-to-completion streaming
  execution; oracle = unnest over the two bucket starts.
- st03_session_window  — session windows (30-minute gap) via
  ``F.session_window``; declared in batch mode (same operator the
  streaming engine uses), oracle = gaps-and-islands SQL. The
  streaming execution of the same plan is exercised in
  tests/test_streaming.py (append mode emits only watermark-closed
  sessions, so the batch form is the deterministic declared surface).

At scale: windowed streaming aggs shuffle on (window, key) with
partial aggregation map-side; watermarks bound state. The memory sink
exists only for verification — production sinks are parquet/Kafka.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WATERMARK = "1 hour"
SESSION_GAP = "30 minutes"


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream replaying the events parquet; identical
    ts normalization to the batch catalog (ns long -> µs timestamp)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # the file source wants a directory; glob-filter to the one table
    sdf = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(sdf.dtypes).get("ts") == "bigint":
        # integer DIV: float division drifts by ±1 µs above 2^53 ns
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return sdf


def run_stream_to_memory(
    sdf: DataFrame,
    mode: str = "complete",
    name: str | None = None,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a
    memory sink; return the sink table as a batch DataFrame.

    ``state_partitions`` bounds the number of state stores for the
    run: each stateful-operator partition pays store init/commit per
    micro-batch, which dominates bounded replays (measured 10.6 s →
    2.1 s at sf0.1 going 32 → 8). A production cluster sizes this to
    cores x N instead; pass None to inherit the session setting.
    The partition count is pinned at first run per query, so setting
    it per-run is safe.
    """
    spark = sdf.sparkSession
    name = name or f"sink_{uuid.uuid4().hex[:12]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def st01_stream_tumbling(spark, sf_dir):
    """Tumbling 1-hour window, run by the actual streaming engine."""
    agg = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("value").alias("sv"))
    )
    sink = run_stream_to_memory(agg, mode="complete")
    return sink.select(
        F.col("w.start").alias("h"),
        "event_type",
        "c",
        F.round("sv", 2).alias("s"),
    ).orderBy("h", "event_type", "c", "s")


def st02_stream_sliding(spark, sf_dir):
    """Sliding window: 1 hour wide, advancing every 30 minutes."""
    agg = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("value").alias("sv"))
    )
    sink = run_stream_to_memory(agg, mode="complete")
    return sink.select(
        F.col("w.start").alias("h"),
        "event_type",
        "c",
        F.round("sv", 2).alias("s"),
    ).orderBy("h", "event_type", "c", "s")


def session_windows(events: DataFrame, gap: str = SESSION_GAP) -> DataFrame:
    """Session-window aggregation per user — the same plan runs in
    batch and streaming (streaming needs watermark + append mode; see
    tests for the streaming execution)."""
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("c"), F.round(F.sum("value"), 2).alias("s"))
        .select("user_id", F.col("w.start").alias("session_start"), "c", "s")
    )


def st03_session_window(spark, sf_dir):
    from crossfire_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    return session_windows(e).orderBy("user_id", "session_start", "c", "s")


STREAMING_ORACLE_SQL: dict[str, str] = {
    "st01_stream_tumbling": """
        SELECT DATE_TRUNC('hour', ts) h, event_type, COUNT(*) c, ROUND(SUM(value),2) s
        FROM events GROUP BY DATE_TRUNC('hour', ts), event_type
        ORDER BY h, event_type, c, s""",
    "st02_stream_sliding": """
        WITH x AS (SELECT event_type, value,
                          unnest([time_bucket(INTERVAL '30 minutes', ts),
                                  time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) h
                   FROM events)
        SELECT h, event_type, COUNT(*) c, ROUND(SUM(value),2) s
        FROM x GROUP BY h, event_type ORDER BY h, event_type, c, s""",
    "st03_session_window": """
        WITH o AS (SELECT user_id, ts, value,
                          CASE WHEN LAG(ts) OVER w IS NULL
                                 OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
                               THEN 1 ELSE 0 END brk
                   FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) sid FROM o)
        SELECT user_id, MIN(ts) session_start, COUNT(*) c, ROUND(SUM(value),2) s
        FROM g GROUP BY user_id, sid
        ORDER BY user_id, session_start, c, s""",
}

STREAMING_QUERIES = {
    "st01_stream_tumbling": st01_stream_tumbling,
    "st02_stream_sliding": st02_stream_sliding,
    "st03_session_window": st03_session_window,
}
