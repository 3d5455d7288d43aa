"""MERGE-upsert seam (DynamoDB put_item / Whoosh update_document analog)."""

from __future__ import annotations

import os
import shutil

from distributed_crawler_spark.sources.storage import (
    merge_upsert,
    read_table,
    recover_table,
)


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


def test_merge_upsert_crash_between_renames(spark):
    """Crash after `table -> .bak` but before `tmp -> table`: the table is
    missing and only .bak holds the data. recover_table must restore it —
    the old rmtree+rename protocol silently dropped all prior rows here."""
    d = "/tmp/dcs_upsert_crash_test"
    for suffix in ("", ".bak"):
        shutil.rmtree(d + suffix, ignore_errors=True)

    base = spark.createDataFrame(
        [("u1", "pending"), ("u2", "pending")], ["url", "status"]
    )
    merge_upsert(spark, d, base)

    # simulate the torn swap: table renamed aside, new data still in tmp
    os.rename(d, d + ".bak")
    tmp = d + ".tmp-deadbeef"
    spark.createDataFrame([("u3", "pending")], ["url", "status"]).write.mode(
        "overwrite"
    ).parquet(tmp)

    # a plain read recovers: .bak restored, orphan tmp removed
    rows = {r["url"] for r in read_table(spark, d).collect()}
    assert rows == {"u1", "u2"}
    assert not os.path.exists(d + ".bak")
    assert not os.path.exists(tmp)

    # re-running the merge now lands all three rows
    merge_upsert(spark, d, spark.createDataFrame([("u3", "pending")], ["url", "status"]))
    assert read_table(spark, d).count() == 3


def test_merge_upsert_crash_after_swap(spark):
    """Crash after `tmp -> table` but before the .bak delete: table is
    committed; recovery must drop the stale backup, not resurrect it."""
    d = "/tmp/dcs_upsert_crash2_test"
    for suffix in ("", ".bak"):
        shutil.rmtree(d + suffix, ignore_errors=True)

    merge_upsert(
        spark, d, spark.createDataFrame([("u1", "old")], ["url", "status"])
    )
    # stage a fake leftover backup beside a committed table
    shutil.copytree(d, d + ".bak")
    merge_upsert(
        spark, d, spark.createDataFrame([("u1", "new")], ["url", "status"])
    )
    recover_table(d)
    rows = {(r["url"], r["status"]) for r in read_table(spark, d).collect()}
    assert rows == {("u1", "new")}
    assert not os.path.exists(d + ".bak")
