"""CDX capture index — the web-archive lookup layout (Common Crawl's
cdx index / OpenWayback CDXJ) over the crawl's page snapshots.

The reference keeps its crawl results as per-url DynamoDB items
(src/master/master_node.py put_item path) — point lookups only; asking
"every capture of host X" or "of domain Y" is a full table scan. The
archive-native answer is a CDX index: one row per capture keyed by the
SURT of the url (reversed host labels — see functions/urls.py:surt_key),
sorted by (surt, ts), so every host and every registrable domain is one
CONTIGUOUS key range.

Scale design: the index is written range-partitioned AND sorted by the
surt key, so a prefix lookup is (a) partition-pruned to the few files
whose [min, max] key range can intersect the prefix, then (b) row-group
pruned inside them by parquet min/max stats — Spark pushes the
``startswith`` predicate down to the scan (plan-asserted in
tests/test_plans.py). At cluster scale the same layout is an Iceberg
table with a truncate(surt) sort order; lookups never touch the other
10^10 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import phash
from ..functions.urls import surt_key


def cdx_records(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    ts_col: str | None = None,
) -> DataFrame:
    """One CDX record per capture: (surt, url, ts, digest, length).
    ``digest`` is the portable content hash (the CC index stores a SHA-1
    of the payload; same role), ``length`` the payload size."""
    ts = F.col(ts_col) if ts_col else F.lit(None).cast("timestamp")
    return pages.select(
        surt_key(F.col(url_col)).alias("surt"),
        F.col(url_col).alias("url"),
        ts.alias("ts"),
        phash(F.col(text_col)).alias("digest"),
        F.length(text_col).cast("long").alias("length"),
    )


def write_cdx_index(records: DataFrame, out_dir: str, n_parts: int = 8) -> str:
    """Materialize the index range-partitioned + sorted by surt — the
    layout that turns prefix lookups into pruned range scans."""
    (
        records.repartitionByRange(n_parts, "surt")
        .sortWithinPartitions("surt", "ts")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir


def cdx_prefix_lookup(spark: SparkSession, index_dir: str, prefix: str) -> DataFrame:
    """All captures under a SURT prefix (a host: 'com,example,h7)/'; a
    whole registrable domain: 'com,example,'), in key order. The
    startswith filter reaches the parquet scan as a pushed predicate."""
    return (
        spark.read.parquet(index_dir)
        .filter(F.col("surt").startswith(prefix))
        .orderBy("surt", "ts")
    )
