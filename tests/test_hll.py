"""Explicit-register HyperLogLog (operators/stats.py:hll_cardinality):
estimate quality against known cardinalities, determinism, and the
small-range (linear-counting) correction path. The DuckDB mirror is
hash-compared per-run by tests/test_queries_oracle.py
(url_cardinality_hll); these tests bound the sketch's actual accuracy,
which no equality check can."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_crawler_spark.operators.stats import hll_cardinality


def _estimate(spark, n_distinct: int, dup: int = 1, p: int = 10):
    df = (
        spark.range(n_distinct * dup)
        .select((F.col("id") % n_distinct).alias("k"))
        .select(F.concat(F.lit("url-"), F.col("k")).alias("u"))
    )
    row = hll_cardinality(df, "u", p=p).collect()[0]
    return row


def test_accuracy_mid_range(spark):
    # standard error ~1.04/sqrt(1024) = 3.25%; 3 sigma ~ 9.8%
    for n in (5_000, 50_000):
        row = _estimate(spark, n, dup=2)
        assert row["n_rows"] == 2 * n
        assert abs(row["hll_estimate"] - n) / n < 0.10, row


def test_small_range_linear_counting(spark):
    # estimates far below 2.5*m with empty registers must take the
    # m*ln(m/V) branch, which is near-exact at tiny cardinalities
    row = _estimate(spark, 300)
    assert row["n_zero_registers"] > 0
    assert abs(row["hll_estimate"] - 300) / 300 < 0.10, row


def test_duplicates_do_not_move_the_estimate(spark):
    once = _estimate(spark, 10_000, dup=1)
    thrice = _estimate(spark, 10_000, dup=3)
    assert once["hll_estimate"] == thrice["hll_estimate"]
    assert once["n_registers_set"] == thrice["n_registers_set"]


def test_deterministic_across_partitionings(spark):
    df = (
        spark.range(20_000)
        .select(F.concat(F.lit("u"), F.col("id")).alias("u"))
    )
    a = hll_cardinality(df.repartition(32), "u").collect()[0]
    b = hll_cardinality(df.coalesce(1), "u").collect()[0]
    assert a == b
