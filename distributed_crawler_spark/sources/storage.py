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


def recover_table(table_dir: str) -> None:
    """Recover from a crash mid-swap (single-writer assumption).

    Swap protocol is: write tmp -> rename table to .bak -> rename tmp to
    table -> delete .bak. A leftover ``.bak`` therefore means either the
    swap completed (table has _SUCCESS: drop the backup) or it crashed
    between the two renames (table missing: restore the backup). Orphaned
    ``.tmp-*`` staging dirs are always safe to delete.
    """
    table_dir = table_dir.rstrip("/")
    bak = table_dir + ".bak"
    if os.path.exists(bak):
        if os.path.exists(os.path.join(table_dir, "_SUCCESS")):
            shutil.rmtree(bak)
        else:
            if os.path.exists(table_dir):
                shutil.rmtree(table_dir)
            os.rename(bak, table_dir)
    parent = os.path.dirname(table_dir) or "."
    base = os.path.basename(table_dir)
    if os.path.isdir(parent):
        for d in os.listdir(parent):
            if d.startswith(base + ".tmp-"):
                shutil.rmtree(os.path.join(parent, d))


def merge_upsert(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    key: str = "url",
) -> None:
    """MERGE updates INTO table_dir ON key (update-else-insert)."""
    table_dir = table_dir.rstrip("/")
    recover_table(table_dir)
    tmp = table_dir + ".tmp-" + uuid.uuid4().hex[:8]
    bak = table_dir + ".bak"
    if os.path.exists(os.path.join(table_dir, "_SUCCESS")):
        current = spark.read.parquet(table_dir)
        kept = current.join(updates.select(key), key, "left_anti")
        merged = kept.unionByName(updates)
    else:
        merged = updates
    merged.write.mode("overwrite").parquet(tmp)
    # crash-safe swap: current aside as .bak, tmp into place, drop .bak.
    # Any interruption point is undone/completed by recover_table().
    if os.path.exists(table_dir):
        os.rename(table_dir, bak)
    os.rename(tmp, table_dir)
    if os.path.exists(bak):
        shutil.rmtree(bak)


def read_table(spark: SparkSession, table_dir: str) -> DataFrame:
    recover_table(table_dir)
    return spark.read.parquet(table_dir)
