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


def heartbeat_sessions_stream(
    heartbeats,
    id_col: str = "crawler_id",
    ts_col: str = "ts",
    gap_seconds: int = 60,
):
    """Custom stateful streaming operator (applyInPandasWithState):
    groups heartbeats into sessions per crawler; a silence longer than
    ``gap_seconds`` closes the session and emits
    (crawler_id, session_start, session_end, n_beats) — the streaming
    twin of the master's failure detection (master_node.py:713-745),
    maintaining per-key state across micro-batches instead of an
    in-memory dict on a daemon thread.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("crawler_id", StringType()),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_beats", IntegerType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start", TimestampType()),
            StructField("last", TimestampType()),
            StructField("n", IntegerType()),
        ]
    )

    def fn(key, pdfs, state: GroupState):
        (crawler_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "crawler_id": [crawler_id],
                    "session_start": [start],
                    "session_end": [last],
                    "n_beats": [n],
                }
            )
            return
        ts_min, ts_max, n_new = None, None, 0
        for pdf in pdfs:
            col = pdf[ts_col]
            n_new += len(col)
            lo, hi = col.min(), col.max()
            ts_min = lo if ts_min is None else min(ts_min, lo)
            ts_max = hi if ts_max is None else max(ts_max, hi)
        if state.exists:
            start, last, n = state.get
            start, last, n = start, max(last, ts_max), n + n_new
        else:
            start, last, n = ts_min, ts_max, n_new
        state.update((start, last, n))
        # event-time timeout: the session closes when the WATERMARK
        # passes last_beat + gap — deterministic w.r.t. the data, unlike
        # processing-time timeouts
        state.setTimeoutTimestamp(
            int(last.timestamp() * 1000) + gap_seconds * 1000
        )
        yield pd.DataFrame(
            columns=["crawler_id", "session_start", "session_end", "n_beats"]
        )

    return (
        heartbeats.withWatermark(ts_col, f"{gap_seconds} seconds")
        .groupBy(id_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_session_stream_smoke(spark, workdir: str | None = None) -> list:
    """Deterministic end-to-end run of the stateful sessionizer: two
    heartbeat files consumed as two micro-batches (maxFilesPerTrigger=1);
    the second batch's far-future event advances the watermark past the
    first sessions' gap, firing their event-time timeouts."""
    import json
    import os
    import shutil
    import tempfile

    from pyspark.sql.types import StringType, StructField, StructType, TimestampType

    workdir = workdir or tempfile.mkdtemp(prefix="dcs_sessions_")
    src = os.path.join(workdir, "src")
    os.makedirs(src, exist_ok=True)

    def write(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for cid, ts in rows:
                f.write(json.dumps({"crawler_id": cid, "ts": ts}) + "\n")

    write(
        "batch1.json",
        [
            ("c1", "2024-01-01 00:00:00"),
            ("c1", "2024-01-01 00:00:10"),
            ("c1", "2024-01-01 00:00:20"),
            ("c2", "2024-01-01 00:00:05"),
        ],
    )
    write("batch2.json", [("c9", "2024-01-01 01:00:00")])

    schema = StructType(
        [StructField("crawler_id", StringType()), StructField("ts", TimestampType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    sessions = heartbeat_sessions_stream(stream, gap_seconds=60)
    q = (
        sessions.writeStream.format("memory")
        .queryName("hb_sessions")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # one more empty-batch pass so timeouts armed by the watermark
        # advance are evaluated
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM hb_sessions").collect()
    shutil.rmtree(workdir, ignore_errors=True)
    return rows
