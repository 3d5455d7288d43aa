"""Search-analytics capture — the reference's track_search rebuilt as an
append-only event log plus declarative aggregate views.

The reference records every executed search into a DynamoDB analytics
table (search_interface.py:66-105 track_search: query text, results
count, timestamp; :822-846 get_search_suggestions consumes it). Here the
capture is an append-only parquet event log (an Iceberg append at
cluster scale — the natural shape for 10^5 QPS of tiny rows: appends
never rewrite, the aggregate views below fold the log lazily), and the
reference's read paths are aggregations over it:

    analytics_summary  — per-query frequency, zero-result count, last
                         seen (the dashboard's "popular searches" table)
    suggest (operators/search.py) — prefix top-5 with the has-results
                         gate, fed by this log instead of a synthesized
                         one
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LOG_SCHEMA = "query STRING, results_count INT, ts TIMESTAMP"


def track_searches(
    spark: SparkSession,
    log_dir: str,
    rows: list[tuple[str, int]] | list[tuple[str, int, object]],
    now: float | None = None,
) -> None:
    """Append executed searches (query, results_count[, ts]) to the log —
    track_search per row, batched (the reference writes one DynamoDB item
    per search; an append-only log never rewrites existing files)."""
    ts = now if now is not None else time.time()
    normalized = [
        r if len(r) == 3 else (r[0], r[1], ts)  # type: ignore[misc]
        for r in rows
    ]
    df = spark.createDataFrame(normalized, "query STRING, results_count INT, ts DOUBLE")
    df.select(
        "query", "results_count", F.timestamp_seconds("ts").alias("ts")
    ).write.mode("append").parquet(log_dir)


def query_log(spark: SparkSession, log_dir: str) -> DataFrame:
    if not os.path.isdir(log_dir):
        return spark.createDataFrame([], LOG_SCHEMA)
    return spark.read.schema(LOG_SCHEMA).parquet(log_dir)


def analytics_summary(qlog: DataFrame, topk: int = 10) -> DataFrame:
    """Per-query rollup (the dashboard's popular-searches view): how
    often, how often empty, most recent run."""
    return (
        qlog.groupBy("query")
        .agg(
            F.count("*").alias("freq"),
            F.sum(F.when(F.col("results_count") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_zero_results"),
            F.max("results_count").alias("max_results"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy(F.desc("freq"), F.col("query"))
        .limit(topk)
    )
