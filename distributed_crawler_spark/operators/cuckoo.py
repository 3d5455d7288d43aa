"""Deletable URL-seen filter — the cuckoo-filter role (north_rule:
"partitioned Bloom/cuckoo filter … that survives checkpoints") realized
as a COUNTING fingerprint filter, the set-oriented shape Spark can build
and maintain without the cuckoo's sequential eviction loop:

    filter := table (bucket: long, fp: long, cnt: long)
    bucket  = xxhash64('b:'||url) mod m
    fp      = xxhash64('f:'||url) mod 2^FP_BITS

Same API role as operators/bloom.py but supports DELETION: counts are
exact per (bucket, fp) cell, so removing a retired key set yields the
byte-identical filter that a fresh build over (seen ∖ deleted) produces
(tested). Membership stays approximate (a probe hit means "some key with
this bucket+fp was inserted") and is only ever used as a PREFILTER: the
maybe-seen side still goes through the exact anti-join, so false
positives cost time, never correctness — and deletions can make a probe
MISS only for keys actually deleted, never for surviving ones.

Scale shape: the filter is (≤ n_distinct_cells) rows partitioned by
bucket; probes join on (bucket, fp) — co-partitioned shuffle join, never
a broadcast requirement (same partitioned-probe layout as
bloom.bloom_split_partitioned). Persisted like any state table, so it
survives checkpoints; per-round maintenance is a unionByName + groupBy
sum (append inserts, negative rows for deletes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FP_BITS = 16
BUCKETS_PER_KEY = 4  # target load < 1 key/bucket ⇒ (bucket, fp) FP rate ~ 2^-16/4


def filter_size_buckets(n_keys: int) -> int:
    return max(64, n_keys * BUCKETS_PER_KEY)


def _bucket(url, m: int):
    return F.pmod(F.xxhash64(F.concat(F.lit("b:"), url)), F.lit(m))


def _fp(url):
    return F.pmod(F.xxhash64(F.concat(F.lit("f:"), url)), F.lit(1 << FP_BITS))


def _cells(keys: DataFrame, m: int, url_col: str, weight: int) -> DataFrame:
    url = F.col(url_col)
    return keys.select(
        _bucket(url, m).alias("bucket"),
        _fp(url).alias("fp"),
        F.lit(weight).cast("long").alias("cnt"),
    )


def build_filter(seen: DataFrame, m: int, url_col: str = "url") -> DataFrame:
    """Aggregate the seen keys into filter cells (bucket, fp, cnt)."""
    return (
        _cells(seen, m, url_col, 1)
        .groupBy("bucket", "fp")
        .agg(F.sum("cnt").alias("cnt"))
    )


def delete_keys(
    filter_df: DataFrame, deleted: DataFrame, m: int, url_col: str = "url"
) -> DataFrame:
    """Remove keys (e.g. retired frontier rows): subtract their cell
    counts; cells reaching 0 disappear. delete(build(S), D) ≡ build(S∖D)
    exactly (counting cells — tested)."""
    return (
        filter_df.unionByName(_cells(deleted, m, url_col, -1))
        .groupBy("bucket", "fp")
        .agg(F.sum("cnt").alias("cnt"))
        .filter(F.col("cnt") > 0)
    )


def filter_split(
    candidates: DataFrame,
    filter_df: DataFrame,
    m: int,
    url_col: str = "url",
) -> tuple[DataFrame, DataFrame]:
    """(definitely_fresh, maybe_seen) by an equi-join on (bucket, fp) —
    partitioned probe, the filter side is never required to broadcast."""
    url = F.col(url_col)
    probed = candidates.withColumn("bucket", _bucket(url, m)).withColumn(
        "fp", _fp(url)
    )
    cells = filter_df.select("bucket", "fp").hint("shuffle_hash")
    out_cols = candidates.columns
    fresh = probed.join(cells, ["bucket", "fp"], "left_anti").select(*out_cols)
    maybe = probed.join(cells, ["bucket", "fp"], "left_semi").select(*out_cols)
    return fresh, maybe


def cuckoo_anti_join(
    candidates: DataFrame,
    seen: DataFrame,
    n_seen_estimate: int,
    url_col: str = "url",
    deleted: DataFrame | None = None,
) -> DataFrame:
    """Exact anti-join with the deletable-filter prefilter.

    ``deleted`` means "keys retired FROM the seen set": the effective
    membership set is seen ∖ deleted, the exact check runs against that
    set, and result ≡ candidates left_anti (seen ∖ deleted) regardless of
    filter state (tested). The counting-cell delete ≡ rebuild guarantee
    only holds for D ⊆ S, so only deleted ∩ seen is subtracted — a
    retired key that was never inserted must not zero a surviving key's
    (bucket, fp) collision cell (that would be a filter false negative
    and a duplicate crawl at 10^10-key scale)."""
    m = filter_size_buckets(max(n_seen_estimate, 1))
    filt = build_filter(seen, m, url_col)
    if deleted is not None:
        deleted_in_seen = deleted.select(url_col).join(
            seen.select(url_col), url_col, "left_semi"
        )
        filt = delete_keys(filt, deleted_in_seen, m, url_col)
        seen = seen.join(deleted.select(url_col), url_col, "left_anti")
    fresh, maybe = filter_split(candidates, filt, m, url_col)
    checked = maybe.join(seen.select(F.col(url_col)), url_col, "left_anti")
    return fresh.unionByName(checked)
