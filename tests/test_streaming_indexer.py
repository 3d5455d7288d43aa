"""Streaming indexer (indexer_node.py's SQS consumer as Structured
Streaming): the index built by streaming micro-batches over the crawl's
extracted tables must equal the batch-built snapshot, including after an
incremental resume that only processes NEW rounds."""

from __future__ import annotations

import json
import shutil

from pyspark.sql import functions as F

from distributed_crawler_spark.config import CrawlConfig
from distributed_crawler_spark.operators.scheduler import CrawlScheduler
from distributed_crawler_spark.operators.search import (
    bm25_from_index,
    write_index_snapshot,
)
from distributed_crawler_spark.streaming.indexer import start_streaming_indexer


def _postings_set(spark, index_dir):
    return {
        (r["doc_id"], r["term"], r["tf"])
        for r in spark.read.parquet(f"{index_dir}/postings").collect()
    }


def _batch_index(spark, sched, out_dir):
    docs = sched.extracted_all().select(
        F.col("url").alias("doc_id"), "text"
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    write_index_snapshot(docs, out_dir)
    return out_dir


def test_streaming_indexer_matches_batch_and_resumes(spark, corpus_dir):
    state = "/tmp/dcs_stream_idx_state"
    idx = "/tmp/dcs_stream_idx"
    ckpt = "/tmp/dcs_stream_idx_ckpt"
    for d in (state, idx, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    robots = spark.read.parquet(f"{corpus_dir}/robots.parquet")
    seeds = spark.read.parquet(f"{corpus_dir}/seeds.parquet")

    cfg = CrawlConfig(max_depth=1, max_urls_per_domain=8, max_retries=0)
    sched = CrawlScheduler(spark, pages, robots, state, cfg)
    sched.run(seeds=seeds)

    glob_path = f"{state}/job={cfg.job_id}/extracted/round=*"
    q = start_streaming_indexer(spark, glob_path, idx, ckpt)
    q.awaitTermination()

    want = _postings_set(spark, _batch_index(spark, sched, "/tmp/dcs_stream_idx_ref"))
    assert _postings_set(spark, idx) == want
    with open(f"{idx}/meta.json") as f:
        meta = json.load(f)
    with open("/tmp/dcs_stream_idx_ref/meta.json") as f:
        ref_meta = json.load(f)
    assert meta["n_docs"] == ref_meta["n_docs"]
    assert abs(meta["avgdl"] - ref_meta["avgdl"]) < 1e-9

    # crawl deeper (new rounds append new extracted dirs), restart the
    # stream from its checkpoint: only the NEW files are indexed, and the
    # final index still equals a full batch rebuild
    deeper = CrawlScheduler(
        spark, pages, robots, state,
        CrawlConfig(max_depth=2, max_urls_per_domain=8, max_retries=0),
    )
    deeper.run(resume=True)
    q2 = start_streaming_indexer(spark, glob_path, idx, ckpt)
    q2.awaitTermination()

    want2 = _postings_set(
        spark, _batch_index(spark, deeper, "/tmp/dcs_stream_idx_ref2")
    )
    assert _postings_set(spark, idx) == want2

    # and the streamed index is queryable like any snapshot
    hits = bm25_from_index(spark, idx, ["page", "doc"]).collect()
    assert hits and all(r["score"] > 0 for r in hits)
