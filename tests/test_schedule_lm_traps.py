"""Round-6 third-continuation operators: crawl-delay fetch scheduling
(unbounded per-host enumeration on the prefix-sum shape), crawler-trap
detection, and the CCNet-style bigram-LM quality filter.

The registry oracles verify end-to-end values against DuckDB; these tests
pin the properties the oracle can't see — partition-layout invariance of
the distributed rank, the LM math against an independent Python
reference, and the flag edge cases."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from distributed_crawler_spark.operators.politeness import crawl_delay_schedule
from distributed_crawler_spark.operators.stats import host_trap_stats
from distributed_crawler_spark.operators.textstats import bigram_lm_score


def _schedule_rows(spark, n_parts):
    rows = [
        (f"h{i % 3}.test", f"https://h{i % 3}.test/p/{i:04d}", i % 4)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "host string, url string, host_id int")
    out = crawl_delay_schedule(
        df.repartition(7),
        delay_ms=F.lit(500) * (F.lit(1) + F.pmod(F.col("host_id"), F.lit(4))),
        order_partitions=n_parts,
    )
    return sorted(
        (r.host, r.url, r.slot, r.delay_ms, r.fetch_offset_ms)
        for r in out.collect()
    )


def test_crawl_delay_schedule_matches_window_and_is_layout_invariant(spark):
    """The distributed per-host rank must equal a plain per-host
    row_number for ANY range-partition count — each (partition, host)
    cell is a contiguous slice, so cell offsets reassemble the exact
    global order. 2 partitions forces multi-cell hosts; 32 forces many
    near-empty cells."""
    expected = {}
    by_host: dict[str, list[str]] = {}
    for h, u, *_ in _schedule_rows(spark, 2):
        by_host.setdefault(h, []).append(u)
    for h, urls in by_host.items():
        for slot, u in enumerate(sorted(urls)):
            expected[u] = slot
    for n_parts in (2, 5, 32):
        got = _schedule_rows(spark, n_parts)
        assert len(got) == 200
        for h, u, slot, delay, off in got:
            assert slot == expected[u], (n_parts, u)
            assert off == slot * delay


def test_crawl_delay_schedule_no_global_window(spark):
    """The plan must not contain a single-partition global sort/window —
    the mega-host is enumerated via bounded (partition, host) cells."""
    df = spark.createDataFrame(
        [("h0.test", f"https://h0.test/p/{i}", 0) for i in range(50)],
        "host string, url string, host_id int",
    )
    out = crawl_delay_schedule(df, delay_ms=F.lit(1000))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_host_trap_stats_flags(spark):
    rows = (
        # trap host: 5 urls, 1 content
        [(f"https://trap.test/p/{i}", "trap.test", f"/p/{i}", "same") for i in range(5)]
        # healthy host: 5 urls, 5 contents
        + [(f"https://ok.test/p/{i}", "ok.test", f"/p/{i}", f"c{i}") for i in range(5)]
        # small host below min_urls: 2 urls, 1 content
        + [(f"https://tiny.test/p/{i}", "tiny.test", f"/p/{i}", "x") for i in range(2)]
    )
    df = spark.createDataFrame(rows, "url string, host string, path string, ck string")
    out = {
        r.host: r
        for r in host_trap_stats(
            df, F.col("ck"), min_urls=3, max_dup_ratio=2.0
        ).collect()
    }
    assert out["trap.test"].trap_flag and out["trap.test"].dup_ratio == 5.0
    assert not out["ok.test"].trap_flag and out["ok.test"].dup_ratio == 1.0
    # high ratio but too few urls: not flagged
    assert not out["tiny.test"].trap_flag and out["tiny.test"].dup_ratio == 2.0
    assert out["trap.test"].n_templates == 1


def test_bigram_lm_score_matches_python_reference(spark):
    """Independent Python replay of the full contract: hash-pruned vocab
    from the training slice, OOV→<unk> on both sides, add-one bigram
    probabilities with the +1 <unk> denominator slot."""
    import hashlib

    def phash(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    docs = [
        (0, "a b a b c"),          # train
        (10, "a b x a b"),         # train — 'x' may be pruned from vocab
        (3, "a b q q"),            # eval: q is OOV
        (7, "c a"),                # eval: single bigram
        (9, "z"),                  # eval: 1 token -> no bigrams -> absent
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in bigram_lm_score(df, head_cutoff=1.0, mid_cutoff=2.0).collect()
    }

    # python reference
    train = {0: "a b a b c", 10: "a b x a b"}
    vocab = {
        t
        for d in train.values()
        for t in d.split()
        if phash("v0:" + t) % 4 != 0
    }
    def m(tok):
        return tok if tok in vocab else "<unk>"
    c2: dict[tuple, int] = {}
    c1: dict[str, int] = {}
    for d in train.values():
        ts = [m(t) for t in d.split()]
        for a, b in zip(ts, ts[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    v = len(vocab)
    expected = {}
    for doc_id, text in docs:
        ts = [m(t) for t in text.split()]
        lls = [
            math.log((c2.get((a, b), 0) + 1) / (c1.get(a, 0) + v + 1))
            for a, b in zip(ts, ts[1:])
        ]
        if lls:
            expected[doc_id] = (len(lls), round(-sum(lls) / len(lls), 4))

    assert set(got) == set(expected)
    for doc_id, (nb, nll) in expected.items():
        assert got[doc_id].n_bigrams == nb
        assert got[doc_id].nll == pytest.approx(nll, abs=1e-4)
        want_bucket = "head" if nll < 1.0 else ("middle" if nll < 2.0 else "tail")
        assert got[doc_id].ppl_bucket == want_bucket
