"""Deletable (cuckoo-role) URL-seen filter: anti-join equivalence, exact
delete ≡ rebuild, and the no-false-negative prefilter invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_crawler_spark.operators.cuckoo import (
    build_filter,
    cuckoo_anti_join,
    delete_keys,
    filter_size_buckets,
    filter_split,
)


def _sets(spark, n_seen=4000, n_cand=6000, overlap=1500):
    seen = spark.range(n_seen).select(
        F.concat(F.lit("https://h.com/s/"), F.col("id")).alias("url")
    )
    cand = spark.range(n_cand).select(
        F.when(
            F.col("id") < overlap,
            F.concat(F.lit("https://h.com/s/"), F.col("id")),
        )
        .otherwise(F.concat(F.lit("https://h.com/c/"), F.col("id")))
        .alias("url")
    )
    return seen, cand


def test_cuckoo_anti_join_equals_plain_anti_join(spark):
    seen, cand = _sets(spark)
    want = {r["url"] for r in cand.join(seen, "url", "left_anti").collect()}
    got = {r["url"] for r in cuckoo_anti_join(cand, seen, 4000).collect()}
    assert got == want


def test_delete_equals_rebuild_exactly(spark):
    """delete(build(S), D) must be the byte-identical cell table that
    build(S ∖ D) produces — the counting-cell guarantee that makes
    retiring frontier rows safe."""
    seen, _ = _sets(spark)
    retired = seen.filter(F.expr("url like '%/s/1%'"))
    survivors = seen.join(retired, "url", "left_anti")
    m = filter_size_buckets(4000)

    after_delete = {
        (r["bucket"], r["fp"], r["cnt"])
        for r in delete_keys(build_filter(seen, m), retired, m).collect()
    }
    rebuilt = {
        (r["bucket"], r["fp"], r["cnt"])
        for r in build_filter(survivors, m).collect()
    }
    assert after_delete == rebuilt


def test_delete_then_probe_no_false_negatives_and_equivalent(spark):
    """After retiring keys, surviving seen keys must still probe
    maybe-seen (no false negatives), and the full anti-join with the
    deleted filter still equals the exact anti-join vs survivors."""
    seen, cand = _sets(spark)
    retired = seen.filter(F.expr("url like '%/s/2%'"))
    survivors = seen.join(retired, "url", "left_anti")
    m = filter_size_buckets(4000)

    filt = delete_keys(build_filter(seen, m), retired, m)
    fresh, maybe = filter_split(cand, filt, m)
    fresh_set = {r["url"] for r in fresh.collect()}
    surv_set = {r["url"] for r in survivors.collect()}
    assert not (fresh_set & surv_set)  # survivors never leak to fresh
    maybe_set = {r["url"] for r in maybe.collect()}
    cand_set = {r["url"] for r in cand.collect()}
    assert surv_set & cand_set <= maybe_set

    want = {r["url"] for r in cand.join(survivors, "url", "left_anti").collect()}
    got = {
        r["url"]
        for r in cuckoo_anti_join(cand, survivors, 4000, deleted=retired).collect()
    }
    assert got == want


def test_probe_plan_never_broadcasts_filter(spark):
    """Partitioned-probe layout: the filter side of the (bucket, fp) join
    is a shuffle join, mirroring bloom_split_partitioned."""
    seen, cand = _sets(spark)
    m = filter_size_buckets(4000)
    fresh, _ = filter_split(cand, build_filter(seen, m), m)
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
    assert "BroadcastExchange" not in plan


def test_crawl_with_cuckoo_prefilter_matches_plain(spark, corpus_dir):
    """Full crawl with the cuckoo-role prefilter on ≡ the plain anti-join
    crawl (strict-optimization property end-to-end, mirroring the bloom
    equivalence test)."""
    import shutil

    from distributed_crawler_spark.config import CrawlConfig
    from distributed_crawler_spark.operators.scheduler import CrawlScheduler

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    robots = spark.read.parquet(f"{corpus_dir}/robots.parquet")
    seeds = spark.read.parquet(f"{corpus_dir}/seeds.parquet")

    results = {}
    for use_cuckoo in (False, True):
        state = f"/tmp/dcs_state_cuckoo_{use_cuckoo}"
        shutil.rmtree(state, ignore_errors=True)
        cfg = CrawlConfig(
            max_depth=2, max_urls_per_domain=10,
            use_cuckoo_prefilter=use_cuckoo,
        )
        s = CrawlScheduler(spark, pages, robots, state, cfg)
        s.run(seeds=seeds)
        results[use_cuckoo] = {
            (r["url"], r["depth"], r["status"]) for r in s.frontier().collect()
        }
    assert results[True] == results[False]


def test_deleted_overlapping_and_foreign_keys(spark):
    """ADVICE r02: `deleted` means keys retired FROM seen — the result is
    candidates left_anti (seen ∖ deleted), and deleted keys never inserted
    must not subtract cells (a (bucket, fp) collision with a surviving
    cnt=1 key would zero it → filter false negative → duplicate crawl)."""
    seen, cand = _sets(spark)
    retired = seen.filter(F.expr("url like '%/s/3%'"))       # ⊆ seen
    foreign = spark.range(500).select(
        F.concat(F.lit("https://x.com/never/"), F.col("id")).alias("url")
    )                                                          # ∩ seen = ∅
    deleted = retired.unionByName(foreign)
    survivors = seen.join(deleted, "url", "left_anti")

    want = {r["url"] for r in cand.join(survivors, "url", "left_anti").collect()}
    got = {
        r["url"]
        for r in cuckoo_anti_join(cand, seen, 4000, deleted=deleted).collect()
    }
    assert got == want
    # retired seen URLs present in candidates must now come back as fresh
    retired_cands = {
        r["url"] for r in cand.join(retired, "url", "left_semi").collect()
    }
    assert retired_cands and retired_cands <= got
