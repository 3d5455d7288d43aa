"""stats.exact_quantiles + stats.heavy_hitters: python-reference parity
and the Misra-Gries superset guarantee under adversarial skew (staged
oracle parity runs in the staged sweep)."""

from __future__ import annotations

import random

import pytest

from distributed_crawler_spark.operators.stats import exact_quantiles, heavy_hitters


@pytest.mark.parametrize("seed,n", [(1, 97), (2, 1000)])
def test_exact_quantiles_reference(spark, seed, n):
    rng = random.Random(seed)
    rows = [(i, rng.uniform(0, 100)) for i in range(n)]
    df = spark.createDataFrame(rows, "eid LONG, val DOUBLE").repartition(7)
    got = {
        r.permille: r.val
        for r in exact_quantiles(df, "val", "eid").collect()
    }
    srt = sorted((v, i) for i, v in rows)
    for p in (500, 900, 950, 990):
        want = srt[max(1, (p * n + 999) // 1000) - 1][0]
        assert got[p] == want, p


def test_exact_quantiles_duplicate_values_tiebreak(spark):
    # all-equal values: every rank selects the same value; ties on the
    # id column keep the row choice deterministic
    df = spark.createDataFrame(
        [(i, 7.0) for i in range(50)], "eid LONG, val DOUBLE"
    )
    out = exact_quantiles(df, "val", "eid").collect()
    assert [r.val for r in out] == [7.0] * 4


@pytest.mark.parametrize("seed", [3, 4])
def test_heavy_hitters_exact_vs_groupby(spark, seed):
    """Zipf-ish skew: output must equal the plain full groupBy threshold
    query exactly (the MG pass may only shrink the CANDIDATE set, never
    the result)."""
    rng = random.Random(seed)
    vals = []
    for v in range(40):
        vals += [v] * rng.randint(1, 30)
    vals += [777] * 400  # one dominant key
    rng.shuffle(vals)
    df = spark.createDataFrame(
        [(v,) for v in vals], "user LONG"
    ).repartition(9)
    k = 15
    got = [(r.user, r.cnt) for r in heavy_hitters(df, "user", k=k).collect()]
    n = len(vals)
    from collections import Counter

    cnt = Counter(vals)
    want = sorted(
        ((v, c) for v, c in cnt.items() if c * k > n),
        key=lambda t: (-t[1], t[0]),
    )
    assert got == want
    assert (777, 400) in got


def test_heavy_hitters_adversarial_many_distinct(spark):
    """n distinct values + one value just over threshold, scattered so
    every partition sees mostly-unique keys — the MG decrement churns
    constantly and must still keep the true heavy hitter."""
    n_unique = 2000
    n_heavy = 800  # n = 2800, threshold n/k = 700 < 800
    vals = list(range(n_unique)) + [-1] * n_heavy
    random.Random(9).shuffle(vals)
    df = spark.createDataFrame([(v,) for v in vals], "user LONG").repartition(13)
    out = heavy_hitters(df, "user", k=4).collect()
    assert [(r.user, r.cnt) for r in out] == [(-1, n_heavy)]
