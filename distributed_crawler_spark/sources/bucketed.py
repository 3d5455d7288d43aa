"""Bucketed storage layout — the co-located fetch join.

The crawl's biggest join is frontier ⋈ pages on canonical url
(SURVEY §2.4: 'storage-partitioned join via bucket(N, url_hash) on both
tables avoids shuffling the 10^10-row corpus'). With both sides written
as bucketed+sorted tables on the same key and bucket count, Spark plans
a sort-merge join with ZERO Exchange — neither the corpus nor the
frontier moves (tests/test_plans.py:test_bucketed_fetch_join_no_shuffle
asserts it).

This module is the storage seam: in this sandbox the catalog is Spark's
session catalog over a /tmp warehouse; on a cluster the same call sites
write Iceberg tables with a `bucket(N, url)` partition transform and
spark.sql.sources.v2.bucketing.enabled gives the equivalent
storage-partitioned join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 32,
    key: str = "url",
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) table keyed on ``key``."""
    w = df.write.bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.mode("overwrite").saveAsTable(table)


def bucketed_fetch_join(
    spark: SparkSession,
    frontier_table: str,
    pages_table: str,
    key: str = "url",
    how: str = "left",
) -> DataFrame:
    """frontier ⋈ pages with both sides pre-bucketed: shuffle-free."""
    return spark.table(frontier_table).join(spark.table(pages_table), key, how)
