"""streaming/delay_queue: per-host slot state must survive micro-batch
boundaries AND query restarts, and must match the batch scheduling
contract wave by wave."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _write_wave(spark, path, rows):
    spark.createDataFrame(rows, "host STRING, url STRING").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def _expected(waves):
    """Per host: slots in (wave order, url order within wave)."""
    nxt: dict[str, int] = {}
    out = []
    for wave in waves:
        by_host: dict[str, list[str]] = {}
        for h, u in wave:
            by_host.setdefault(h, []).append(u)
        for h in by_host:
            for u in sorted(by_host[h]):
                out.append((h, u, nxt.get(h, 0)))
                nxt[h] = nxt.get(h, 0) + 1
    return sorted(out)


def test_slots_carry_across_batches_and_restart(spark, tmp_path):
    from distributed_crawler_spark.streaming.delay_queue import (
        start_delay_scheduler,
    )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    w1 = [("a.com", "u3"), ("a.com", "u1"), ("b.com", "v1")]
    w2 = [("a.com", "u2"), ("b.com", "v0"), ("c.com", "w1")]
    _write_wave(spark, f"{in_dir}/wave1", w1)
    _write_wave(spark, f"{in_dir}/wave2", w2)

    q = start_delay_scheduler(
        spark, f"{in_dir}/wave*", out_dir, ckpt, delay_ms=500
    )
    q.awaitTermination()
    got = sorted(
        (r.host, r.url, r.slot)
        for r in spark.read.parquet(out_dir).collect()
    )
    assert got == _expected([w1, w2])

    # restart the query with a THIRD wave on the same checkpoint: state
    # must resume (a.com continues at slot 3), not restart at 0
    w3 = [("a.com", "u0"), ("c.com", "w0")]
    _write_wave(spark, f"{in_dir}/wave3", w3)
    q2 = start_delay_scheduler(
        spark, f"{in_dir}/wave*", out_dir, ckpt, delay_ms=500
    )
    q2.awaitTermination()
    got = sorted(
        (r.host, r.url, r.slot)
        for r in spark.read.parquet(out_dir).collect()
    )
    assert got == _expected([w1, w2, w3])
    # offsets are the affine slot map
    offs = {
        (r.host, r.url): r.fetch_offset_ms
        for r in spark.read.parquet(out_dir).collect()
    }
    for (h, u, s) in got:
        assert offs[(h, u)] == s * 500


def test_single_batch_matches_batch_contract(spark, tmp_path):
    """Within one micro-batch the ordering contract (slots by url order
    per host, starting at 0) is the wave-0 case of the batch
    crawl_delay_schedule."""
    from distributed_crawler_spark.operators.politeness import (
        crawl_delay_schedule,
    )
    from distributed_crawler_spark.streaming.delay_queue import (
        start_delay_scheduler,
    )

    rows = [
        ("a.com", f"u{i}") for i in range(5)
    ] + [("b.com", f"v{i}") for i in range(3)]
    in_dir = str(tmp_path / "in2")
    _write_wave(spark, f"{in_dir}/wave1", rows)
    out_dir = str(tmp_path / "out2")
    q = start_delay_scheduler(
        spark, f"{in_dir}/wave*", out_dir, str(tmp_path / "ck2"), delay_ms=250
    )
    q.awaitTermination()
    stream_slots = {
        (r.host, r.url): (r.slot, r.fetch_offset_ms)
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = crawl_delay_schedule(
        spark.createDataFrame(rows, "host STRING, url STRING"),
        delay_ms=F.lit(250),
    )
    batch_slots = {
        (r.host, r.url): (r.slot, r.fetch_offset_ms) for r in batch.collect()
    }
    assert stream_slots == batch_slots
