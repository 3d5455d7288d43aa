"""Structured-Streaming front door for the crawl: an unbounded stream of
seed-URL submissions drives the batch-iterative scheduler.

The reference accepts mid-crawl URL submissions over SQS
(submit_url.py — fire-and-forget sends into the task queue that the
master drains on its polling thread). Here the same capability is a
Structured Streaming job: a file-source stream of seed batches (the SQS
analog in this storage-backed design; at cluster scale the source is a
Kafka topic or an Iceberg CDC feed — one `.format()` swap) feeds
``foreachBatch``, and each micro-batch

    1. submits its URLs through ``CrawlScheduler.submit_urls`` — the
       crash-safe, idempotent gate (normalize -> robots -> URL-seen
       anti-join -> staged pending cohort), and
    2. drains the crawl with ``run(resume=True)`` — bounded rounds, the
       same per-round lineage commits as a batch crawl.

Exactly-once composition: foreachBatch gives at-least-once epoch
delivery (a crashed epoch replays after restart), and BOTH steps are
idempotent against durable state — submit_urls anti-joins the seen set
(resubmitting an already-scheduled URL is a no-op) and run(resume=True)
re-enters at the first uncommitted round — so replays converge to the
same frontier instead of double-scheduling. That is the streaming twin
of the reference's SQS at-least-once delivery + DynamoDB conditional-put
dedup (master_node.py:336-391).

The crawl rounds themselves stay batch jobs (SURVEY.md §2.10): ordering
semantics are per-round barriers, which is exactly what a bounded
foreachBatch body gives — Spark's recommended shape for stream-driven
iterative work.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from ..config import CrawlConfig
from ..operators.scheduler import CrawlScheduler

SEED_SCHEMA = StructType([StructField("url", StringType())])


def crawl_seed_stream(
    spark: SparkSession,
    pages: DataFrame,
    robots: DataFrame,
    state_dir: str,
    seeds_src: str,
    cfg: CrawlConfig | None = None,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = 1,
    available_now: bool = True,
):
    """Start the seed-submission stream; returns the StreamingQuery.

    ``seeds_src`` is a directory of JSON-lines files with a single
    ``url`` column; every new file becomes (part of) a micro-batch.
    With ``available_now=True`` the query drains the current backlog and
    stops (the testable bounded form); with ``False`` it keeps watching
    for new seed files (the daemon form).
    """
    cfg = cfg or CrawlConfig()
    checkpoint_dir = checkpoint_dir or os.path.join(
        state_dir, f"job={cfg.job_id}", "_seed_stream_ckpt"
    )

    reader = spark.readStream.schema(SEED_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.json(seeds_src)

    def _handle(batch_df: DataFrame, epoch_id: int) -> None:
        sched = CrawlScheduler(spark, pages, robots, state_dir, cfg)
        sched.submit_urls(batch_df.select("url"))
        sched.run(resume=True)

    writer = stream.writeStream.foreachBatch(_handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_crawl_seed_stream(
    spark: SparkSession,
    pages: DataFrame,
    robots: DataFrame,
    state_dir: str,
    seeds_src: str,
    cfg: CrawlConfig | None = None,
) -> dict:
    """Blocking convenience wrapper: drain the seed backlog
    (availableNow) and return the final crawl summary."""
    q = crawl_seed_stream(
        spark, pages, robots, state_dir, seeds_src, cfg, available_now=True
    )
    q.awaitTermination()
    sched = CrawlScheduler(spark, pages, robots, state_dir, cfg or CrawlConfig())
    return sched.summary()
