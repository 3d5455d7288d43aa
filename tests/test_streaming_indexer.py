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


def test_merge_touches_only_batch_buckets(spark, corpus_dir):
    """Scale property (VERDICT r02): a micro-batch merge must leave every
    bucket the batch doesn't touch byte-identical (same files, same
    mtimes) — I/O is O(batch buckets), not O(index)."""
    import os

    from distributed_crawler_spark.streaming.indexer import (
        N_DOC_BUCKETS,
        _merge_batch_into_index,
        _with_bucket,
    )

    idx = "/tmp/dcs_bucket_touch_idx"
    shutil.rmtree(idx, ignore_errors=True)
    docs = spark.range(500).select(
        F.concat(F.lit("u"), F.col("id")).alias("doc_id"),
        F.concat(F.lit("alpha beta doc "), F.col("id").cast("string")).alias("text"),
    )
    _merge_batch_into_index(docs, idx)

    def snapshot(bucket_dir):
        return {
            f: os.stat(os.path.join(bucket_dir, f)).st_mtime_ns
            for f in os.listdir(bucket_dir)
        }

    pdir = f"{idx}/postings"
    before = {d: snapshot(os.path.join(pdir, d))
              for d in os.listdir(pdir) if d.startswith("bucket=")}

    batch2 = spark.range(3).select(
        F.concat(F.lit("u"), F.col("id")).alias("doc_id"),
        F.lit("gamma delta").alias("text"),
    )
    touched = {
        f"bucket={r['bucket']}"
        for r in _with_bucket(batch2.select("doc_id"), "doc_id", N_DOC_BUCKETS)
        .select("bucket").distinct().collect()
    }
    assert len(touched) < len(before)  # the test is vacuous otherwise
    _merge_batch_into_index(batch2, idx)

    after = {d: snapshot(os.path.join(pdir, d))
             for d in os.listdir(pdir) if d.startswith("bucket=")}
    for d, files in before.items():
        if d not in touched:
            assert after[d] == files, f"untouched {d} was rewritten"
    # and the touched docs were replaced, not duplicated
    rows = spark.read.parquet(pdir).filter(F.col("doc_id") == "u0").collect()
    assert {r["term"] for r in rows} == {"gamma", "delta"}
    assert N_DOC_BUCKETS >= len(before)


def test_recover_buckets_heals_torn_swap(spark):
    """Crash between the two renames (bucket=K missing, .bak present) is
    restored; a completed swap with a leftover .bak drops the backup;
    orphaned staging dirs are removed."""
    import os

    from distributed_crawler_spark.streaming.indexer import _recover_buckets

    pdir = "/tmp/dcs_recover_buckets/postings"
    shutil.rmtree("/tmp/dcs_recover_buckets", ignore_errors=True)
    os.makedirs(f"{pdir}/bucket=1")
    os.makedirs(f"{pdir}/bucket=2")
    open(f"{pdir}/bucket=2/f.parquet", "w").write("new")
    os.makedirs(f"{pdir}/bucket=2.bak")
    os.rename(f"{pdir}/bucket=1", f"{pdir}/bucket=1.bak")  # torn: live missing
    os.makedirs(pdir + ".tmp-stream")

    _recover_buckets(pdir)
    assert os.path.isdir(f"{pdir}/bucket=1")          # restored
    assert not os.path.exists(f"{pdir}/bucket=1.bak")
    assert os.path.exists(f"{pdir}/bucket=2/f.parquet")  # kept the new copy
    assert not os.path.exists(f"{pdir}/bucket=2.bak")
    assert not os.path.exists(pdir + ".tmp-stream")


def test_docstats_bucketed_and_meta_incremental(spark):
    """docstats uses the same touched-bucket merge as postings, and
    meta.json (n_docs, avgdl) maintained incrementally equals a full
    recompute after inserts AND updates."""
    import os

    from distributed_crawler_spark.streaming.indexer import _merge_batch_into_index

    idx = "/tmp/dcs_meta_incr_idx"
    shutil.rmtree(idx, ignore_errors=True)
    b1 = spark.range(300).select(
        F.concat(F.lit("u"), F.col("id")).alias("doc_id"),
        F.concat(F.lit("alpha beta doc "), F.col("id").cast("string")).alias("text"),
    )
    _merge_batch_into_index(b1, idx, epoch_id=0)
    # update 5 existing docs + insert 2 new ones
    b2 = spark.range(5).select(
        F.concat(F.lit("u"), F.col("id")).alias("doc_id"),
        F.lit("gamma delta epsilon").alias("text"),
    ).unionByName(
        spark.range(2).select(
            F.concat(F.lit("new"), F.col("id")).alias("doc_id"),
            F.lit("zeta").alias("text"),
        )
    )
    _merge_batch_into_index(b2, idx, epoch_id=1)

    stats = spark.read.parquet(f"{idx}/docstats")
    want = stats.agg(F.count("*").alias("n"), F.avg("dl").alias("a")).collect()[0]
    meta = json.load(open(f"{idx}/meta.json"))
    assert meta["n_docs"] == want["n"] == 302
    assert abs(meta["avgdl"] - want["a"]) < 1e-9
    # docstats is bucket-partitioned like postings
    assert any(d.startswith("bucket=") for d in os.listdir(f"{idx}/docstats"))

    # checkpoint-replay semantics: re-running the SAME epoch must not
    # re-apply the meta delta (merges are idempotent, the delta is not)
    _merge_batch_into_index(b2, idx, epoch_id=1)
    meta2 = json.load(open(f"{idx}/meta.json"))
    assert meta2["n_docs"] == meta["n_docs"]
    assert abs(meta2["avgdl"] - meta["avgdl"]) < 1e-9


def test_legacy_flat_docstats_migrates(spark):
    """An index whose docstats was written by the pre-bucketing layout
    (flat merge_upsert table, no bucket column) must migrate on the next
    merge instead of crashing on the bucket filter."""
    import os

    from distributed_crawler_spark.streaming.indexer import _merge_batch_into_index

    idx = "/tmp/dcs_legacy_stats_idx"
    shutil.rmtree(idx, ignore_errors=True)
    b1 = spark.range(50).select(
        F.concat(F.lit("u"), F.col("id")).alias("doc_id"),
        F.lit("alpha beta").alias("text"),
    )
    _merge_batch_into_index(b1, idx, epoch_id=0)
    # rewrite docstats into the LEGACY flat layout
    flat = spark.read.parquet(f"{idx}/docstats").select("doc_id", "dl")
    tmp = f"{idx}/docstats.flat"
    flat.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(f"{idx}/docstats")
    os.rename(tmp, f"{idx}/docstats")

    b2 = spark.range(3).select(
        F.concat(F.lit("u"), F.col("id")).alias("doc_id"),
        F.lit("gamma delta epsilon").alias("text"),
    )
    _merge_batch_into_index(b2, idx, epoch_id=1)  # must not raise
    stats = spark.read.parquet(f"{idx}/docstats")
    assert "bucket" in stats.columns and stats.count() == 50
    meta = json.load(open(f"{idx}/meta.json"))
    want = stats.agg(F.count("*").alias("n"), F.avg("dl").alias("a")).collect()[0]
    assert meta["n_docs"] == want["n"]
    assert abs(meta["avgdl"] - want["a"]) < 1e-9


def test_new_checkpoint_over_existing_index_applies_meta(spark, corpus_dir):
    """The meta guard keys on (stream identity, epoch): a FRESH checkpoint
    over an existing index restarts epochs at 0 but must still apply its
    delta (same-epoch-number skip only holds within one checkpoint)."""
    from distributed_crawler_spark.streaming.indexer import _merge_batch_into_index

    idx = "/tmp/dcs_epoch_key_idx"
    shutil.rmtree(idx, ignore_errors=True)
    b1 = spark.range(10).select(
        F.concat(F.lit("u"), F.col("id")).alias("doc_id"),
        F.lit("alpha beta").alias("text"),
    )
    _merge_batch_into_index(b1, idx, epoch_id=0, stream_id="ckpt-A")
    n1 = json.load(open(f"{idx}/meta.json"))["n_docs"]
    # new checkpoint, epoch numbering restarts at 0, new docs
    b2 = spark.range(4).select(
        F.concat(F.lit("v"), F.col("id")).alias("doc_id"),
        F.lit("gamma").alias("text"),
    )
    _merge_batch_into_index(b2, idx, epoch_id=0, stream_id="ckpt-B")
    meta = json.load(open(f"{idx}/meta.json"))
    assert meta["n_docs"] == n1 + 4
    # and a replay WITHIN ckpt-B of the same epoch is still skipped
    _merge_batch_into_index(b2, idx, epoch_id=0, stream_id="ckpt-B")
    assert json.load(open(f"{idx}/meta.json"))["n_docs"] == n1 + 4


def test_bucket_count_parameterized(spark):
    """n_buckets is a per-index creation parameter recorded in meta.json
    (VERDICT r03 wrong #3): indexes created at two different counts both
    merge correctly, each keeping its own layout — and a later merge
    passing a DIFFERENT n_buckets must stick with the meta's count (the
    bucket function never changes under a live layout)."""
    import os

    from distributed_crawler_spark.streaming.indexer import _merge_batch_into_index

    b1 = spark.range(40).select(
        F.concat(F.lit("u"), F.col("id")).alias("doc_id"),
        F.concat(F.lit("alpha beta w"), F.col("id").cast("string")).alias("text"),
    )
    b2 = spark.range(5).select(
        F.concat(F.lit("u"), F.col("id")).alias("doc_id"),
        F.lit("gamma delta").alias("text"),
    )
    results = {}
    for n in (4, 16):
        idx = f"/tmp/dcs_nbuckets_{n}_idx"
        shutil.rmtree(idx, ignore_errors=True)
        _merge_batch_into_index(b1, idx, epoch_id=0, n_buckets=n)
        meta = json.load(open(f"{idx}/meta.json"))
        assert meta["n_buckets"] == n
        buckets = {d for d in os.listdir(f"{idx}/postings") if d.startswith("bucket=")}
        assert 0 < len(buckets) <= n
        assert all(int(b.split("=")[1]) < n for b in buckets)
        # second merge: a different n_buckets argument must be ignored
        _merge_batch_into_index(b2, idx, epoch_id=1, n_buckets=64)
        meta2 = json.load(open(f"{idx}/meta.json"))
        assert meta2["n_buckets"] == n
        buckets2 = {d for d in os.listdir(f"{idx}/postings") if d.startswith("bucket=")}
        assert all(int(b.split("=")[1]) < n for b in buckets2)
        post = spark.read.parquet(f"{idx}/postings")
        results[n] = {
            (r["doc_id"], r["term"], r["tf"])
            for r in post.select("doc_id", "term", "tf").collect()
        }
        assert meta2["n_docs"] == 40
    # layout-independent content: both bucket counts hold identical postings
    assert results[4] == results[16]


def test_stream_identity_survives_checkpoint_recreate(tmp_path):
    """The stream identity is a uuid INSIDE the checkpoint dir (ADVICE
    r03): stable across restarts of the same checkpoint, but deleting and
    recreating the checkpoint at the SAME PATH yields a fresh identity —
    so the meta guard cannot skip the new stream's first delta against a
    stale last_epoch_key."""
    import shutil as _shutil

    from distributed_crawler_spark.streaming.indexer import _stream_identity

    ckpt = str(tmp_path / "ckpt")
    a = _stream_identity(ckpt)
    assert _stream_identity(ckpt) == a  # stable within one checkpoint
    _shutil.rmtree(ckpt)
    b = _stream_identity(ckpt)
    assert b != a


def test_streamed_index_serves_phrase_queries(spark):
    """A fresh stream-maintained index stores POSITIONAL postings, so
    phrase queries run against it exactly like against a batch snapshot
    (same analyzed-adjacency results) — including after an upsert moves
    a doc's phrase."""
    from distributed_crawler_spark.operators.search import (
        phrase_from_index,
        write_index_snapshot,
    )
    from distributed_crawler_spark.streaming.indexer import _merge_batch_into_index

    rows = [
        ("u0", "breaking news today and the breaking news cycle"),
        ("u1", "breaking the news gently"),
        ("u2", "news breaking order"),
    ]
    docs = spark.createDataFrame(rows, "doc_id STRING, text STRING")
    idx = "/tmp/dcs_phrase_stream_idx"
    shutil.rmtree(idx, ignore_errors=True)
    _merge_batch_into_index(docs, idx, epoch_id=0)
    snap = "/tmp/dcs_phrase_snap_idx"
    shutil.rmtree(snap, ignore_errors=True)
    write_index_snapshot(docs, snap)

    def res(d):
        return {
            (r["doc_id"], r["n_occurrences"])
            for r in phrase_from_index(spark, d, "breaking news").collect()
        }

    assert res(idx) == res(snap) and res(idx)

    # upsert u1 to drop its phrase; the streamed index must reflect it
    b2 = spark.createDataFrame(
        [("u1", "nothing here now")], "doc_id STRING, text STRING"
    )
    _merge_batch_into_index(b2, idx, epoch_id=1)
    # only u0 keeps the phrase (u2 has the words in reverse order)
    assert {d for d, _ in res(idx)} == {"u0"}


def test_legacy_positionless_streamed_index_still_merges(spark):
    """Merging into an index created before positional postings keeps its
    schema (the merge select drops the batch's positions column) and
    phrase queries against it raise the rebuild hint."""
    import os

    import pytest as _pytest

    from distributed_crawler_spark.operators.search import phrase_from_index
    from distributed_crawler_spark.streaming.indexer import _merge_batch_into_index

    idx = "/tmp/dcs_legacy_pos_idx"
    shutil.rmtree(idx, ignore_errors=True)
    b1 = spark.range(20).select(
        F.concat(F.lit("u"), F.col("id")).alias("doc_id"),
        F.lit("alpha beta gamma").alias("text"),
    )
    _merge_batch_into_index(b1, idx, epoch_id=0)
    # rewrite into the LEGACY schema: no positions column, meta flag off
    p = spark.read.parquet(f"{idx}/postings").drop("positions")
    tmp = f"{idx}/postings.legacy"
    p.repartition(F.col("bucket")).write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(tmp)
    shutil.rmtree(f"{idx}/postings")
    os.rename(tmp, f"{idx}/postings")
    meta = json.load(open(f"{idx}/meta.json"))
    meta["positions"] = False
    json.dump(meta, open(f"{idx}/meta.json", "w"))

    b2 = spark.range(3).select(
        F.concat(F.lit("u"), F.col("id")).alias("doc_id"),
        F.lit("delta epsilon").alias("text"),
    )
    _merge_batch_into_index(b2, idx, epoch_id=1)  # must not raise
    post = spark.read.parquet(f"{idx}/postings")
    assert "positions" not in post.columns
    assert {r["term"] for r in post.filter(F.col("doc_id") == "u0").collect()} == {
        "delta", "epsilon"
    }
    assert json.load(open(f"{idx}/meta.json"))["positions"] is False
    with _pytest.raises(ValueError):
        phrase_from_index(spark, idx, "alpha beta")


def test_pre_upgrade_checkpoint_keeps_path_identity(tmp_path):
    """Review r04 migration: a checkpoint that already has Spark state
    (offsets dir) but no id file predates the uuid scheme — its identity
    must be the abs path (the old key), so meta deltas applied before the
    upgrade are still recognized on replay. A brand-new checkpoint gets
    a uuid."""
    import os

    from distributed_crawler_spark.streaming.indexer import _stream_identity

    old = str(tmp_path / "old_ckpt")
    os.makedirs(os.path.join(old, "offsets"))
    assert _stream_identity(old) == os.path.abspath(old)

    new = str(tmp_path / "new_ckpt")
    ident = _stream_identity(new)
    assert ident != os.path.abspath(new) and len(ident) == 32


def _ts_set(spark, index_dir):
    from distributed_crawler_spark.streaming.indexer import read_termstats

    ts = read_termstats(spark, index_dir)
    assert ts is not None
    return {(r["term"], r["df"]) for r in ts.collect()}


def _snap_ts_set(spark, docs, out_dir):
    from distributed_crawler_spark.operators.search import write_index_snapshot

    shutil.rmtree(out_dir, ignore_errors=True)
    write_index_snapshot(docs, out_dir)
    return {
        (r["term"], r["df"])
        for r in spark.read.parquet(f"{out_dir}/termstats").collect()
    }


def test_streamed_termstats_matches_batch(spark):
    """The stream-maintained index's termstats LSM view (base ∪ epoch
    deltas) equals the batch snapshot's precomputed table after inserts
    AND updates; a same-epoch replay changes nothing; bm25_from_index
    ranks identically against both."""
    from distributed_crawler_spark.functions.text import process_text_py
    from distributed_crawler_spark.operators.search import bm25_from_index
    from distributed_crawler_spark.streaming.indexer import _merge_batch_into_index

    idx = "/tmp/dcs_ts_stream_idx"
    shutil.rmtree(idx, ignore_errors=True)
    b1 = spark.range(30).select(
        F.concat(F.lit("u"), F.col("id")).alias("doc_id"),
        F.concat(
            F.lit("alpha beta running doc "), F.col("id").cast("string")
        ).alias("text"),
    )
    _merge_batch_into_index(b1, idx, epoch_id=0, stream_id="ts")
    assert _ts_set(spark, idx) == _snap_ts_set(spark, b1, "/tmp/dcs_ts_snap1")

    # update 4 docs (their old terms' df must drop), insert 2 new
    b2 = spark.range(4).select(
        F.concat(F.lit("u"), F.col("id")).alias("doc_id"),
        F.lit("gamma delta joins").alias("text"),
    ).unionByName(
        spark.range(2).select(
            F.concat(F.lit("n"), F.col("id")).alias("doc_id"),
            F.lit("epsilon alpha").alias("text"),
        )
    )
    _merge_batch_into_index(b2, idx, epoch_id=1, stream_id="ts")
    full = b1.join(b2.select("doc_id"), "doc_id", "left_anti").unionByName(b2)
    want = _snap_ts_set(spark, full, "/tmp/dcs_ts_snap2")
    assert _ts_set(spark, idx) == want

    # checkpoint replay of the same epoch: exactly-once, nothing drifts
    _merge_batch_into_index(b2, idx, epoch_id=1, stream_id="ts")
    assert _ts_set(spark, idx) == want

    # and the query path consumes it: identical BM25 rankings
    terms = process_text_py("alpha joins running")
    got = [
        (r["doc_id"], r["score"])
        for r in bm25_from_index(spark, idx, terms).collect()
    ]
    snap = [
        (r["doc_id"], r["score"])
        for r in bm25_from_index(spark, "/tmp/dcs_ts_snap2", terms).collect()
    ]
    assert got == snap and got


def test_termstats_compaction_and_legacy_bootstrap(spark, monkeypatch):
    """Compaction folds deltas into the base (same values, bounded delta
    count, folded dirs cleaned up), and a pre-termstats index bootstraps
    its base from the full postings on the next merge so df covers every
    pre-existing doc."""
    import os

    from distributed_crawler_spark import streaming
    from distributed_crawler_spark.streaming.indexer import (
        _delta_dirs,
        _merge_batch_into_index,
        _termstats_paths,
    )

    monkeypatch.setattr(streaming.indexer, "TERMSTATS_COMPACT_AT", 3)
    idx = "/tmp/dcs_ts_compact_idx"
    shutil.rmtree(idx, ignore_errors=True)
    batches = []
    for e in range(5):
        b = spark.range(6).select(
            F.concat(F.lit(f"e{e}-"), F.col("id")).alias("doc_id"),
            F.concat(F.lit(f"word{e} shared tok"), F.lit(" x")).alias("text"),
        )
        batches.append(b)
        _merge_batch_into_index(b, idx, epoch_id=e, stream_id="c")
    base_dir, delta_root = _termstats_paths(idx)
    assert os.path.exists(os.path.join(base_dir, "_SUCCESS"))  # compacted
    assert len(_delta_dirs(delta_root)) < 5
    full = batches[0]
    for b in batches[1:]:
        full = full.unionByName(b)
    assert _ts_set(spark, idx) == _snap_ts_set(spark, full, "/tmp/dcs_ts_snap3")

    # legacy: strip termstats entirely -> next merge bootstraps the base
    shutil.rmtree(base_dir)
    shutil.rmtree(delta_root)
    b5 = spark.range(2).select(
        F.concat(F.lit("e0-"), F.col("id")).alias("doc_id"),
        F.lit("replaced completely").alias("text"),
    )
    _merge_batch_into_index(b5, idx, epoch_id=5, stream_id="c")
    full5 = full.join(b5.select("doc_id"), "doc_id", "left_anti").unionByName(b5)
    assert _ts_set(spark, idx) == _snap_ts_set(spark, full5, "/tmp/dcs_ts_snap4")


def test_random_merge_sequences_equal_batch_rebuild(spark, monkeypatch):
    """Seeded random upsert sequences (overlapping batches, repeated doc
    ids, varying sizes, compaction forced mid-sequence) must leave EVERY
    index artifact — postings (with positions), docstats, meta, the
    termstats LSM view — identical to a one-shot batch snapshot of the
    final doc set."""
    import random

    from distributed_crawler_spark import streaming
    from distributed_crawler_spark.operators.search import write_index_snapshot
    from distributed_crawler_spark.streaming.indexer import (
        _merge_batch_into_index,
        read_termstats,
    )

    monkeypatch.setattr(streaming.indexer, "TERMSTATS_COMPACT_AT", 2)
    rng = random.Random(13)
    vocab = ["alpha", "beta", "running", "joins", "the", "gamma", "doc"]
    idx = "/tmp/dcs_random_seq_idx"
    shutil.rmtree(idx, ignore_errors=True)
    final: dict[str, str] = {}
    for e in range(6):
        n = rng.randint(1, 8)
        ids = [f"u{rng.randint(0, 14)}" for _ in range(n)]
        batch_rows = []
        seen = set()
        for d in ids:
            if d in seen:
                continue  # one attempt per doc per micro-batch
            seen.add(d)
            text = " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 9)))
            batch_rows.append((d, text))
            final[d] = text
        b = spark.createDataFrame(batch_rows, "doc_id STRING, text STRING")
        _merge_batch_into_index(b, idx, epoch_id=e, stream_id="rand")

    ref = "/tmp/dcs_random_seq_ref"
    shutil.rmtree(ref, ignore_errors=True)
    docs = spark.createDataFrame(sorted(final.items()), "doc_id STRING, text STRING")
    write_index_snapshot(docs, ref)

    def postings_set(d):
        rows = spark.read.parquet(f"{d}/postings").collect()
        return {
            (r["doc_id"], r["term"], r["tf"], tuple(r["positions"]))
            for r in rows
        }

    assert postings_set(idx) == postings_set(ref)
    stats = {
        (r["doc_id"], r["dl"])
        for r in spark.read.parquet(f"{idx}/docstats").collect()
    }
    ref_stats = {
        (r["doc_id"], r["dl"])
        for r in spark.read.parquet(f"{ref}/docstats").collect()
    }
    assert stats == ref_stats
    meta = json.load(open(f"{idx}/meta.json"))
    ref_meta = json.load(open(f"{ref}/meta.json"))
    assert meta["n_docs"] == ref_meta["n_docs"]
    assert abs(meta["avgdl"] - ref_meta["avgdl"]) < 1e-9
    ts = {(r["term"], r["df"]) for r in read_termstats(spark, idx).collect()}
    ref_ts = {(r["term"], r["df"]) for r in read_termstats(spark, ref).collect()}
    assert ts == ref_ts


def test_raw_analyzer_merge_preserves_term_space(spark):
    """Merging a micro-batch into a RAW-analyzer index must build RAW
    postings (ADVICE r04: the merge always built stemmed postings while
    meta kept claiming 'raw', silently mixing term spaces — raw-path
    queries apply no stemming and would miss the merged docs). The
    merged index must equal a raw rebuild of the union, including for
    stopword/inflected terms a stemmed build would drop or rewrite."""
    import os

    from distributed_crawler_spark.operators.search import (
        tf_from_index,
        write_index_snapshot,
    )
    from distributed_crawler_spark.streaming.indexer import _merge_batch_into_index

    idx = "/tmp/dcs_raw_merge_idx"
    shutil.rmtree(idx, ignore_errors=True)
    b1 = spark.createDataFrame(
        [("u0", "the running dogs"), ("u1", "alpha beta")],
        "doc_id STRING, text STRING",
    )
    write_index_snapshot(b1, idx, analyzer="raw")
    # update u1, insert u2 — with terms stemming would mangle ('running'
    # -> 'run') or drop ('the')
    b2 = spark.createDataFrame(
        [("u1", "the running water"), ("u2", "running the race")],
        "doc_id STRING, text STRING",
    )
    _merge_batch_into_index(b2, idx, epoch_id=0, stream_id="raw-m")

    full = b1.join(b2.select("doc_id"), "doc_id", "left_anti").unionByName(b2)
    ref = "/tmp/dcs_raw_merge_ref"
    shutil.rmtree(ref, ignore_errors=True)
    write_index_snapshot(full, ref, analyzer="raw")
    got = {
        (r["doc_id"], r["term"], r["tf"], tuple(r["positions"]))
        for r in spark.read.parquet(f"{idx}/postings")
        .select("doc_id", "term", "tf", "positions").collect()
    }
    want = {
        (r["doc_id"], r["term"], r["tf"], tuple(r["positions"]))
        for r in spark.read.parquet(f"{ref}/postings")
        .select("doc_id", "term", "tf", "positions").collect()
    }
    assert got == want
    assert _ts_set(spark, idx) == {
        (r["term"], r["df"])
        for r in spark.read.parquet(f"{ref}/termstats").collect()
    }
    with open(os.path.join(idx, "meta.json")) as f:
        assert json.load(f)["analyzer"] == "raw"
    # raw-path query (no stemming) finds the merged docs by raw terms
    hits = {r["doc_id"] for r in tf_from_index(spark, idx, ["running"]).collect()}
    assert hits == {"u0", "u1", "u2"}

    # an index claiming an unknown analyzer refuses to merge rather than
    # guessing a term space
    meta_path = os.path.join(idx, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["analyzer"] = "lemmatized"
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    import pytest

    with pytest.raises(ValueError, match="analyzer"):
        _merge_batch_into_index(b2, idx, epoch_id=1, stream_id="raw-m")


def test_manual_merge_idempotency_key(spark):
    """A keyed manual merge (epoch_id < 0 + idempotency_key) dedupes on
    rerun exactly like a streaming epoch (ADVICE r04: keyless reruns
    write a second uuid delta and double-count df); the termstats view,
    meta, and postings all equal the run-once state."""
    import os

    from distributed_crawler_spark.streaming.indexer import (
        _merge_batch_into_index,
        _termstats_paths,
    )

    idx = "/tmp/dcs_manual_key_idx"
    shutil.rmtree(idx, ignore_errors=True)
    b1 = spark.createDataFrame(
        [("u0", "alpha beta"), ("u1", "alpha gamma")], "doc_id STRING, text STRING"
    )
    _merge_batch_into_index(b1, idx, idempotency_key="load-b1")
    b2 = spark.createDataFrame(
        [("u1", "delta delta"), ("u2", "alpha delta")], "doc_id STRING, text STRING"
    )
    _merge_batch_into_index(b2, idx, idempotency_key="load-b2")
    ts_once = _ts_set(spark, idx)
    with open(os.path.join(idx, "meta.json")) as f:
        meta_once = json.load(f)

    # rerun of a keyed merge (the crashed-manual-merge replay shape):
    # nothing may drift, and no second delta dir may appear
    delta_root = _termstats_paths(idx)[1]
    n_deltas = len(os.listdir(delta_root))
    _merge_batch_into_index(b2, idx, idempotency_key="load-b2")
    assert _ts_set(spark, idx) == ts_once
    with open(os.path.join(idx, "meta.json")) as f:
        assert json.load(f) == meta_once
    assert len(os.listdir(delta_root)) == n_deltas
    # the keyed delta dirs are named from the key (deterministic), not uuid
    assert sum(1 for d in os.listdir(delta_root) if d.startswith("delta-manual-")) == 2

    # a DIFFERENT key applies normally
    b3 = spark.createDataFrame([("u3", "omega")], "doc_id STRING, text STRING")
    _merge_batch_into_index(b3, idx, idempotency_key="load-b3")
    assert ("omega", 1) in _ts_set(spark, idx)


def test_termstats_delta_names_embed_epoch(spark):
    """Epoch delta dirs embed the raw epoch id (ADVICE r04: 48-bit
    truncated digests could collide across epochs and silently skip the
    later delta) and still honor a legacy 12-hex-named entry so replays
    across the upgrade don't double-apply."""
    import hashlib
    import os

    from distributed_crawler_spark.streaming.indexer import (
        _merge_batch_into_index,
        _termstats_paths,
        _write_termstats_delta,
    )

    idx = "/tmp/dcs_delta_name_idx"
    shutil.rmtree(idx, ignore_errors=True)
    b1 = spark.createDataFrame([("u0", "alpha beta")], "doc_id STRING, text STRING")
    _merge_batch_into_index(b1, idx, epoch_id=0, stream_id="nm")
    b2 = spark.createDataFrame([("u1", "alpha gamma")], "doc_id STRING, text STRING")
    _merge_batch_into_index(b2, idx, epoch_id=1, stream_id="nm")
    delta_root = _termstats_paths(idx)[1]
    names = sorted(os.listdir(delta_root))
    assert any(n.startswith("delta-0-") for n in names), names
    assert any(n.startswith("delta-1-") for n in names), names

    # legacy pre-upgrade entry for epoch 2: the writer must recognize it
    # as that epoch's completed delta and skip writing a new dir
    key = "nm:2"
    legacy = os.path.join(
        delta_root, "delta-" + hashlib.md5(key.encode()).hexdigest()[:12]
    )
    os.makedirs(legacy)
    open(os.path.join(legacy, "_SUCCESS"), "w").close()
    before = sorted(os.listdir(delta_root))
    from distributed_crawler_spark.operators.search import build_postings_stemmed_pos

    _write_termstats_delta(
        idx, build_postings_stemmed_pos(b2), None, key, 2
    )
    assert sorted(os.listdir(delta_root)) == before
