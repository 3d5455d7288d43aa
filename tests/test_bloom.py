"""Bloom URL-seen prefilter: exact equivalence to plain anti-join (false
positives must fall through to the exact check) and actual pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_crawler_spark.operators.bloom import (
    bloom_anti_join,
    bloom_size_bits,
    bloom_split,
    build_bloom,
)


def _sets(spark, n_seen=5000, n_cand=8000, overlap=2000):
    seen = spark.range(n_seen).select(
        F.concat(F.lit("https://h.com/s/"), F.col("id")).alias("url")
    )
    cand = spark.range(n_cand).select(
        F.when(
            F.col("id") < overlap,
            F.concat(F.lit("https://h.com/s/"), F.col("id")),       # seen
        )
        .otherwise(F.concat(F.lit("https://h.com/c/"), F.col("id")))  # fresh
        .alias("url")
    )
    return seen, cand


def test_bloom_anti_join_equals_plain_anti_join(spark):
    seen, cand = _sets(spark)
    want = {r["url"] for r in cand.join(seen, "url", "left_anti").collect()}
    got = {r["url"] for r in bloom_anti_join(cand, seen, 5000).collect()}
    assert got == want


def test_bloom_never_false_negative_and_prunes(spark):
    seen, cand = _sets(spark)
    m = bloom_size_bits(5000)
    words = build_bloom(seen, m)
    fresh, maybe = bloom_split(cand, words, m)
    fresh_set = {r["url"] for r in fresh.collect()}
    seen_set = {r["url"] for r in seen.collect()}
    # no false negatives: nothing the bloom calls fresh is actually seen
    assert not (fresh_set & seen_set)
    # and it actually prunes: most truly-fresh candidates skip the join
    n_truly_fresh = 6000
    assert len(fresh_set) > 0.8 * n_truly_fresh
    # the maybe side contains every real duplicate
    maybe_set = {r["url"] for r in maybe.collect()}
    assert seen_set & {r["url"] for r in cand.collect()} <= maybe_set


def test_crawl_with_bloom_prefilter_matches_plain(spark, corpus_dir):
    """Full crawl with the bloom prefilter on ≡ the plain anti-join crawl
    (strict-optimization property end-to-end)."""
    import shutil

    from distributed_crawler_spark.config import CrawlConfig
    from distributed_crawler_spark.operators.scheduler import CrawlScheduler

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    robots = spark.read.parquet(f"{corpus_dir}/robots.parquet")
    seeds = spark.read.parquet(f"{corpus_dir}/seeds.parquet")

    results = {}
    for use_bloom in (False, True):
        state = f"/tmp/dcs_state_bloom_{use_bloom}"
        shutil.rmtree(state, ignore_errors=True)
        cfg = CrawlConfig(
            max_depth=2, max_urls_per_domain=10, use_bloom_prefilter=use_bloom
        )
        s = CrawlScheduler(spark, pages, robots, state, cfg)
        s.run(seeds=seeds)
        results[use_bloom] = {
            (r["url"], r["depth"], r["status"]) for r in s.frontier().collect()
        }
    assert results[True] == results[False]


def test_partitioned_probe_equals_broadcast_probe(spark):
    """The word_idx-join probe (words never broadcast) must produce the
    exact same anti-join result as the broadcast probe and the plain
    anti-join."""
    seen, cand = _sets(spark)
    want = {r["url"] for r in cand.join(seen, "url", "left_anti").collect()}
    got = {
        r["url"]
        for r in bloom_anti_join(cand, seen, 5000, partitioned=True).collect()
    }
    assert got == want


def test_partitioned_probe_never_broadcasts_words(spark):
    """Plan assertion: in partitioned mode the words-table probe join is a
    shuffle join — no BroadcastHashJoin / BroadcastExchange anywhere in
    the probe subplan (at 10^10 keys the words table is ~1.9 GB)."""
    from distributed_crawler_spark.operators.bloom import (
        _probe_maybe_urls,
        bloom_split_partitioned,
    )

    seen, cand = _sets(spark)
    m = bloom_size_bits(5000)
    words = build_bloom(seen, m)
    probe_plan = (
        _probe_maybe_urls(cand, words, m)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" not in probe_plan
    assert "BroadcastExchange" not in probe_plan
    assert "ShuffledHashJoin" in probe_plan

    fresh, maybe = bloom_split_partitioned(cand, words, m)
    fresh_set = {r["url"] for r in fresh.collect()}
    seen_set = {r["url"] for r in seen.collect()}
    assert not (fresh_set & seen_set)          # no false negatives
    maybe_set = {r["url"] for r in maybe.collect()}
    assert seen_set & {r["url"] for r in cand.collect()} <= maybe_set


def test_partitioned_probe_duplicate_candidates(spark):
    """ADVICE r02: duplicated candidate rows must not break the
    partitioned probe's sum(hit) == K test (a duplicated SEEN url would
    accumulate 2K hits and leak out as definitely-fresh). Result must
    equal plain left_anti INCLUDING multiplicity."""
    from collections import Counter

    seen, cand = _sets(spark, n_seen=2000, n_cand=3000, overlap=1000)
    dups = cand.unionByName(cand)  # every candidate twice
    want = Counter(r["url"] for r in dups.join(seen, "url", "left_anti").collect())
    got = Counter(
        r["url"]
        for r in bloom_anti_join(dups, seen, 2000, partitioned=True).collect()
    )
    assert got == want
