"""Monitoring / dashboard analytics — every Flask endpoint of the
reference's dashboard becomes one aggregate (SURVEY.md §2.5, §3.3).

Reference semantics reproduced (each was a full DynamoDB scan + Python
loop; here they're pushed-down parquet scans + hash aggregates):
  * status counts        — dashboard.py:377-417
  * domain top-10        — dashboard.py:525-569
  * hourly crawl history — dashboard.py:419-523 (hour bucket + zero-fill)
  * crawl rate (per min) — dashboard.py:578-615 (last-hour count / 60)
  * error rate           — monitoring.py:444-449 (failed/total·100)
  * latest heartbeat     — monitoring.py:494-525 (group-by-latest per key)
  * row counts           — dashboard.py:740
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def status_counts(df: DataFrame, status_col: str = "status") -> DataFrame:
    return df.groupBy(F.col(status_col).alias("status")).agg(
        F.count("*").alias("n")
    )


def top_domains(frontier: DataFrame, host_col: str = "host", k: int = 10) -> DataFrame:
    return (
        frontier.groupBy(F.col(host_col).alias("host"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.col("host"))
        .limit(k)
    )


def hourly_history(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Events per hour with zero-filled gaps over the observed span
    (dashboard.py:419-523 zero-fills 24h; here: min..max of the data via a
    sequence() join — no driver-side loop)."""
    counted = df.groupBy(F.date_trunc("hour", F.col(ts_col)).alias("hour")).agg(
        F.count("*").alias("n")
    )
    span = df.agg(
        F.date_trunc("hour", F.min(ts_col)).alias("lo"),
        F.date_trunc("hour", F.max(ts_col)).alias("hi"),
    )
    hours = span.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    return (
        hours.join(counted, "hour", "left")
        .select("hour", F.coalesce(F.col("n"), F.lit(0)).alias("n"))
        .orderBy("hour")
    )


def crawl_rate_per_minute(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Rows in the last hour of the data / 60 (dashboard.py:578-615 uses
    wall-clock now(); here the anchor is max(ts) so the result is
    deterministic)."""
    anchor = df.agg(F.max(ts_col).alias("hi"))
    return (
        df.crossJoin(F.broadcast(anchor))
        .filter(F.col(ts_col) >= F.col("hi") - F.expr("INTERVAL 1 HOUR"))
        .agg(F.round(F.count("*") / 60.0, 4).alias("rate_per_min"))
    )


def error_rate(df: DataFrame, flag_col, total_alias: str = "error_rate_pct") -> DataFrame:
    """failed/total*100 (monitoring.py:444-449); flag_col is a boolean
    Column marking failures."""
    return df.agg(
        F.round(
            F.sum(F.when(flag_col, 1).otherwise(0)) * 100.0 / F.count("*"), 4
        ).alias(total_alias)
    )


def latest_per_key(df: DataFrame, key_col: str, ts_col: str, value_cols: list[str]) -> DataFrame:
    """Group-by-latest (heartbeat upsert, monitoring.py:494-525):
    max_by on the timestamp, deterministic."""
    aggs = [F.max_by(c, F.col(ts_col)).alias(c) for c in value_cols]
    return df.groupBy(key_col).agg(F.max(ts_col).alias(ts_col), *aggs)
