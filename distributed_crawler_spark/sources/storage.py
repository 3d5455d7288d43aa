"""Upsert (MERGE) seam over plain parquet — the sandbox stand-in for
Iceberg `MERGE INTO`.

Reference ops this replaces (SURVEY §2.1):
  * DynamoDB put_item / update_item row upserts
    (master_node.py:404-428, crawler_node.py:740-837)
  * Whoosh writer.update_document add-or-replace by unique url
    (indexer_node.py:196-218)

Semantics: updates win on key collision; everything else is carried
over. Implemented as anti-join + union + atomic directory swap — a full
partition rewrite, which is exactly what a copy-on-write Iceberg MERGE
does per touched file; with the table bucketed on the key only the
buckets containing updates need rewriting (bucket pruning is the
Iceberg-side optimization this seam hides).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def merge_upsert(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    key: str = "url",
) -> None:
    """MERGE updates INTO table_dir ON key (update-else-insert)."""
    tmp = table_dir.rstrip("/") + ".tmp-" + uuid.uuid4().hex[:8]
    if os.path.exists(os.path.join(table_dir, "_SUCCESS")):
        current = spark.read.parquet(table_dir)
        kept = current.join(updates.select(key), key, "left_anti")
        merged = kept.unionByName(updates)
    else:
        merged = updates
    merged.write.mode("overwrite").parquet(tmp)
    # atomic-ish swap (rename); a crash between rm and rename is recovered
    # by re-running the merge (updates are idempotent on key)
    if os.path.exists(table_dir):
        shutil.rmtree(table_dir)
    os.rename(tmp, table_dir)


def read_table(spark: SparkSession, table_dir: str) -> DataFrame:
    return spark.read.parquet(table_dir)
