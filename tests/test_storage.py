"""MERGE-upsert seam (DynamoDB put_item / Whoosh update_document analog)."""

from __future__ import annotations

import shutil

from distributed_crawler_spark.sources.storage import merge_upsert, read_table


def test_merge_upsert_update_else_insert(spark):
    d = "/tmp/dcs_upsert_test"
    shutil.rmtree(d, ignore_errors=True)

    base = spark.createDataFrame(
        [("u1", "pending", 0), ("u2", "pending", 0)], ["url", "status", "v"]
    )
    merge_upsert(spark, d, base)
    assert read_table(spark, d).count() == 2

    updates = spark.createDataFrame(
        [("u2", "completed", 1), ("u3", "pending", 0)], ["url", "status", "v"]
    )
    merge_upsert(spark, d, updates)
    rows = {r["url"]: (r["status"], r["v"]) for r in read_table(spark, d).collect()}
    assert rows == {
        "u1": ("pending", 0),     # untouched row carried over
        "u2": ("completed", 1),   # updated in place
        "u3": ("pending", 0),     # inserted
    }

    # idempotent re-merge (crash-recovery property)
    merge_upsert(spark, d, updates)
    assert read_table(spark, d).count() == 3
