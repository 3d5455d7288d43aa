"""Structured-Streaming seed-submission front door (streaming/
crawl_stream.py): stream-driven crawls converge to the same frontier as
a batch crawl seeded with the union, and epoch replay (the foreachBatch
at-least-once contract) is idempotent against the durable crawl state.

The reference analog is submit_url.py -> SQS -> master polling thread;
here file-source micro-batches -> submit_urls -> run(resume=True).
"""

from __future__ import annotations

import json
import os
import shutil

import pytest

from distributed_crawler_spark.config import CrawlConfig
from distributed_crawler_spark.operators.scheduler import CrawlScheduler
from distributed_crawler_spark.streaming.crawl_stream import (
    crawl_seed_stream,
    run_crawl_seed_stream,
)

STATE = "/tmp/dcs_state_seed_stream"


def _frontier_set(sched: CrawlScheduler):
    return {
        (r["url"], r["status"])
        for r in sched.frontier().select("url", "status").collect()
    }


@pytest.fixture(scope="module")
def streamed(spark, corpus_dir):
    """Run the crawl via the seed stream: the seed set split across two
    JSON files consumed as two micro-batches."""
    shutil.rmtree(STATE, ignore_errors=True)
    src = os.path.join(STATE, "seed_src")
    os.makedirs(src, exist_ok=True)

    seeds = sorted(
        r["url"]
        for r in spark.read.parquet(f"{corpus_dir}/seeds.parquet").collect()
    )
    assert len(seeds) >= 2
    half = len(seeds) // 2
    for name, chunk in (("a.json", seeds[:half]), ("b.json", seeds[half:])):
        with open(os.path.join(src, name), "w") as f:
            for u in chunk:
                f.write(json.dumps({"url": u}) + "\n")

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    robots = spark.read.parquet(f"{corpus_dir}/robots.parquet")
    # generous budget so scheduling order can't change survivors (the
    # submit_urls parity contract)
    cfg = CrawlConfig(max_depth=2, max_urls_per_domain=1000, job_id="stream-a")
    summary = run_crawl_seed_stream(spark, pages, robots, STATE, src, cfg)
    sched = CrawlScheduler(spark, pages, robots, STATE, cfg)
    return src, cfg, sched, summary


def test_stream_equals_direct_submit_sequence(spark, corpus_dir, streamed):
    """The streaming layer adds DELIVERY, not semantics: two seed files
    consumed as two micro-batches must produce exactly the frontier of
    the same two submit_urls(...) + run(resume=True) calls made
    directly. (A union-seeded single crawl is NOT the right reference:
    a wave-B seed already crawled at depth>0 by wave A is correctly
    suppressed by the seen anti-join, so its depth-0 re-expansion never
    happens — the reference's SQS submit has the identical property.)"""
    src, _, streamed_sched, summary = streamed
    assert summary["total_scheduled"] > 0

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    robots = spark.read.parquet(f"{corpus_dir}/robots.parquet")
    batch = CrawlScheduler(
        spark,
        pages,
        robots,
        STATE,
        CrawlConfig(max_depth=2, max_urls_per_domain=1000, job_id="batch-b"),
    )
    waves = sorted(f for f in os.listdir(src) if f.endswith(".json"))
    assert len(waves) == 2
    for name in waves:
        wave = spark.read.json(os.path.join(src, name)).select("url")
        batch.submit_urls(wave)
        batch.run(resume=True)

    assert _frontier_set(streamed_sched) == _frontier_set(batch)
    # extracted text is byte-identical per url on both paths
    a = {
        r["url"]: r["text"]
        for r in streamed_sched.extracted_all().select("url", "text").collect()
    }
    b = {
        r["url"]: r["text"]
        for r in batch.extracted_all().select("url", "text").collect()
    }
    assert a == b


def test_epoch_replay_is_idempotent(spark, corpus_dir, streamed):
    """Wipe the stream checkpoint so BOTH seed files replay from scratch
    against the already-completed crawl state — the worst-case
    at-least-once replay. The frontier must not change (submit_urls
    anti-joins seen; resume re-enters at the first uncommitted round)."""
    src, cfg, sched, _ = streamed
    before = _frontier_set(sched)
    rounds_before = sched.committed_rounds()

    ckpt = os.path.join(STATE, f"job={cfg.job_id}", "_seed_stream_ckpt")
    shutil.rmtree(ckpt)
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    robots = spark.read.parquet(f"{corpus_dir}/robots.parquet")
    q = crawl_seed_stream(
        spark, pages, robots, STATE, src, cfg, available_now=True
    )
    q.awaitTermination()

    after_sched = CrawlScheduler(spark, pages, robots, STATE, cfg)
    assert _frontier_set(after_sched) == before
    assert after_sched.committed_rounds() == rounds_before


def test_no_new_files_is_noop(spark, corpus_dir, streamed):
    """Re-starting the stream on the SAME checkpoint with no new seed
    files processes nothing and leaves the state untouched."""
    src, cfg, sched, _ = streamed
    before = _frontier_set(sched)
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    robots = spark.read.parquet(f"{corpus_dir}/robots.parquet")
    q = crawl_seed_stream(
        spark, pages, robots, STATE, src, cfg, available_now=True
    )
    q.awaitTermination()
    assert _frontier_set(CrawlScheduler(spark, pages, robots, STATE, cfg)) == before
