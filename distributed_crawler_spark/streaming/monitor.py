"""Structured-Streaming rebuild of the reference's live monitoring plane.

The reference ingests heartbeat/result/error messages into in-memory
dataclasses on a Dash callback thread (monitoring.py:466-641) and
computes sliding crawl rates over a bounded deque (monitoring.py:451-464).
Here the same semantics are a Structured Streaming job: readStream →
watermarked sliding-window aggregation → writeStream.

The crawl itself stays batch-iterative (SURVEY.md §2.10 — rounds are
bounded jobs); streaming is only the *telemetry* plane, which genuinely
is unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def sliding_crawl_rate(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "5 minutes",
    slide: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """monitoring.py:451-464's 5-minute sliding rate as a windowed
    streaming aggregate (works identically on a batch DataFrame)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window, slide).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col("n"),
        )
    )


def heartbeat_liveness(
    heartbeats: DataFrame,
    id_col: str = "crawler_id",
    ts_col: str = "ts",
    failure_window_sec: int = 60,
) -> DataFrame:
    """Failure detection (master_node.py:713-745: silence > 2×interval ⇒
    failed): latest heartbeat per crawler + derived liveness, relative to
    the max observed ts (deterministic)."""
    latest = heartbeats.groupBy(id_col).agg(F.max(ts_col).alias("last_seen"))
    anchor = heartbeats.agg(F.max(ts_col).alias("now"))
    return (
        latest.crossJoin(F.broadcast(anchor))
        .select(
            id_col,
            "last_seen",
            F.when(
                F.col("last_seen")
                >= F.col("now") - F.expr(f"INTERVAL {failure_window_sec} SECONDS"),
                F.lit("active"),
            )
            .otherwise(F.lit("failed"))
            .alias("liveness"),
        )
    )


def run_rate_stream_smoke(spark: SparkSession, seconds: int = 5) -> list:
    """Smoke: rate source → sliding window agg → memory sink. Returns the
    collected rows (proves the streaming plumbing end-to-end without any
    external broker)."""
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 50).load()
        .withColumnRenamed("timestamp", "ts")
    )
    agg = sliding_crawl_rate(stream, window="2 seconds", slide="1 second", watermark="2 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("rate_smoke")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        import time

        time.sleep(seconds)
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql("SELECT * FROM rate_smoke").collect()
