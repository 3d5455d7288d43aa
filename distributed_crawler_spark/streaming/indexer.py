"""Streaming index maintenance — the reference's indexer node rebuilt as
Structured Streaming.

The reference indexer polls SQS forever and upserts each crawled page
into the Whoosh index (indexer_node.py:181-243: writer.update_document
per message). Here the same role is a file-source stream over the
crawl's extracted tables: every new ``extracted/round=R`` directory the
scheduler commits is a micro-batch, and ``foreachBatch`` merges that
batch's stemmed postings into the persistent index snapshot
(operators/search.py:write_index_snapshot layout) with the same
update-else-insert semantics as update_document — a re-crawled url's
postings replace its old ones.

Scale shape: each micro-batch touches only the NEW pages' postings; the
merge is the crash-safe parquet swap of sources/storage.py (an Iceberg
MERGE INTO at cluster scale). State (which files are already indexed)
lives in the streaming checkpoint, so the indexer resumes exactly like
the reference's queue consumer.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _merge_batch_into_index(
    batch: DataFrame, index_dir: str, id_col: str = "doc_id"
) -> None:
    """update_document semantics per micro-batch: delete the batch docs'
    old postings, insert their fresh ones; docstats likewise; meta.json
    (n_docs, avgdl) recomputed from the merged docstats."""
    from ..operators.search import build_postings_stemmed
    from ..sources.storage import merge_upsert, read_table, recover_table

    spark = batch.sparkSession
    postings = build_postings_stemmed(batch, id_col).persist()
    postings_dir = os.path.join(index_dir, "postings")
    stats_dir = os.path.join(index_dir, "docstats")

    # postings key is (doc, term) — but update_document replaces the DOC:
    # anti-join out every old row of the batch's docs, then append new
    recover_table(postings_dir)
    if os.path.exists(os.path.join(postings_dir, "_SUCCESS")):
        current = read_table(spark, postings_dir)
        kept = current.join(postings.select(id_col).distinct(), id_col, "left_anti")
        merged = kept.unionByName(postings)
        tmp = postings_dir + ".tmp-stream"
        merged.write.mode("overwrite").parquet(tmp)
        bak = postings_dir + ".bak"
        os.rename(postings_dir, bak)
        os.rename(tmp, postings_dir)
        import shutil

        shutil.rmtree(bak)
    else:
        postings.write.mode("overwrite").parquet(postings_dir)

    stats = postings.groupBy(id_col).agg(F.sum("tf").cast("long").alias("dl"))
    merge_upsert(spark, stats_dir, stats, key=id_col)
    postings.unpersist()

    all_stats = read_table(spark, stats_dir)
    row = all_stats.agg(
        F.count("*").alias("n"), F.avg("dl").alias("a")
    ).collect()[0]
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(
            {"n_docs": row["n"], "avgdl": float(row["a"] or 0.0), "id_col": id_col},
            f,
        )


def start_streaming_indexer(
    spark: SparkSession,
    extracted_glob: str,
    index_dir: str,
    checkpoint_dir: str,
    schema: str | None = None,
    max_files_per_trigger: int = 8,
):
    """Run the indexer as a stream over the scheduler's extracted tables
    (``state_dir/job=J/extracted/round=*``). Returns the StreamingQuery;
    callers drive it with processAllAvailable() (tests) or awaitTermination
    (a real deployment). File-source + checkpoint = exactly-once indexing
    of each extracted file, resumable like the reference's queue consumer."""
    if schema is None:
        schema = (
            "url STRING, title STRING, description STRING, keywords STRING, "
            "text STRING, links ARRAY<STRING>, language STRING, "
            "fetch_ts TIMESTAMP, depth INT"
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(extracted_glob)
        .select(F.col("url").alias("doc_id"), "text")
    )
    return (
        stream.writeStream.option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            lambda batch, _epoch: _merge_batch_into_index(batch, index_dir)
        )
        .trigger(availableNow=True)
        .start()
    )
