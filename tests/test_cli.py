"""CLI surface (client.py / search.py / dashboard analogs) driven
in-process: crawl → search → stats round trip."""

from __future__ import annotations

import json
import shutil


def _run(capsys, argv):
    from distributed_crawler_spark import cli

    cli.main(argv)
    return capsys.readouterr().out.strip().splitlines()


def test_cli_crawl_search_stats(spark, corpus_dir, capsys):
    state = "/tmp/dcs_cli_test_state"
    shutil.rmtree(state, ignore_errors=True)

    out = _run(capsys, [
        "--cores", "8", "crawl", "--corpus", corpus_dir, "--state", state,
        "--max-depth", "1", "--budget", "10",
    ])
    summary = json.loads(out[-1])
    assert summary["total_scheduled"] > 0
    # rounds 0..1 are the BFS proper; dangling-link failures may add up to
    # max_retries retry-only rounds after the depth cap
    assert summary["rounds"][:2] == [0, 1]
    assert summary["rounds"] == list(range(len(summary["rounds"])))
    assert max(summary["rounds"]) <= 1 + 3

    out = _run(capsys, [
        "--cores", "8", "search", "spark window", "--state", state,
        "--mode", "tf", "--topk", "3",
    ])
    hits = [json.loads(l) for l in out]
    assert len(hits) <= 3
    assert all("score" in h for h in hits)

    out = _run(capsys, ["--cores", "8", "stats", "--state", state])
    stats = json.loads(out[-1])
    assert stats["urls_total"] == summary["total_scheduled"]
    assert "by_status" in stats

    # index snapshot + search against it (indexer_node analog)
    idx = "/tmp/dcs_cli_test_index"
    shutil.rmtree(idx, ignore_errors=True)
    out = _run(capsys, ["--cores", "8", "index", "--state", state, "--out", idx])
    assert json.loads(out[-1])["index"] == idx
    out = _run(capsys, [
        "--cores", "8", "search", "running pages", "--index", idx,
        "--mode", "bm25", "--topk", "3",
    ])
    hits = [json.loads(l) for l in out]
    assert len(hits) <= 3
    assert all("score" in h for h in hits)

    # multifield index lifecycle: build -> inspect -> composed query
    # against it -> drop (VERDICT r04 next #5: snapshots are a CLI-owned
    # lifecycle, not a bench-harness tempdir memo)
    mfidx = "/tmp/dcs_cli_test_mfindex"
    shutil.rmtree(mfidx, ignore_errors=True)
    out = _run(capsys, [
        "--cores", "8", "index", "--state", state, "--out", mfidx,
        "--multifield",
    ])
    built = json.loads(out[-1])
    assert built["fields"] == ["body", "title"]
    out = _run(capsys, ["index-inspect", "--index", mfidx])
    meta = json.loads(out[-1])
    assert meta["layout"] == "multifield" and meta["id_col"] == "doc_id"
    assert set(meta["fields"]) == {"title", "body"}
    assert all(f["analyzer"] == "stemmed" and f["positions"]
               for f in meta["fields"].values())
    assert all(f["n_docs"] > 0 for f in meta["fields"].values())
    out = _run(capsys, [
        "--cores", "8", "search", 'title:page OR "running pages"', "--index",
        mfidx, "--mode", "query", "--scoring", "bm25f", "--topk", "3",
    ])
    hits = [json.loads(l) for l in out]
    assert hits and all(h["score"] > 0 for h in hits)
    out = _run(capsys, ["index-drop", "--index", mfidx])
    assert json.loads(out[-1])["dropped"] == mfidx
    import os
    assert not os.path.exists(mfidx)
    # drop refuses a non-index dir
    import pytest
    os.makedirs("/tmp/dcs_cli_not_an_index", exist_ok=True)
    with pytest.raises(SystemExit):
        _run(capsys, ["index-drop", "--index", "/tmp/dcs_cli_not_an_index"])
    assert os.path.exists("/tmp/dcs_cli_not_an_index")

    # composed query language + analytics tracking -> suggestions
    log = "/tmp/dcs_cli_test_qlog"
    shutil.rmtree(log, ignore_errors=True)
    out = _run(capsys, [
        "--cores", "8", "search", "page AND doc*", "--state", state,
        "--mode", "query", "--topk", "3", "--track", log,
    ])
    hits = [json.loads(l) for l in out]
    assert len(hits) <= 3 and all("score" in h for h in hits)
    # a zero-result query is tracked but must never surface in suggest
    _run(capsys, [
        "--cores", "8", "search", "pagexyzzy", "--state", state,
        "--mode", "query", "--topk", "3", "--track", log,
    ])
    out = _run(capsys, ["--cores", "8", "suggest", "page", "--log", log])
    suggestions = [json.loads(l)["query"] for l in out]
    assert suggestions == ["page AND doc*"]


def test_cli_export_archives(spark, corpus_dir, capsys):
    """CLI archive exports: WET from a crawl's extracted docs, WARC from
    the corpus pages — both readable back by the matching reader with
    the same record counts."""
    import json as _json
    import shutil as _shutil

    from distributed_crawler_spark.sources.warc import read_warc, read_wet

    state = "/tmp/dcs_cli_export_state"
    _shutil.rmtree(state, ignore_errors=True)
    out = _run(capsys, [
        "--cores", "8", "crawl", "--corpus", corpus_dir, "--state", state,
        "--max-depth", "1", "--budget", "10",
    ])
    summary = _json.loads(out[-1])

    wet_dir = "/tmp/dcs_cli_export_wet"
    _shutil.rmtree(wet_dir, ignore_errors=True)
    out = _run(capsys, ["--cores", "8", "export", "--state", state, "--out", wet_dir])
    m = _json.loads(out[-1])
    assert m["n_records"] == summary["by_status"]["completed"]
    assert read_wet(spark, wet_dir + "/*").count() == m["n_records"]

    warc_dir = "/tmp/dcs_cli_export_warc"
    _shutil.rmtree(warc_dir, ignore_errors=True)
    out = _run(capsys, [
        "--cores", "8", "export", "--corpus", corpus_dir, "--out", warc_dir,
        "--no-compress",
    ])
    m = _json.loads(out[-1])
    assert m["n_records"] == spark.read.parquet(f"{corpus_dir}/pages.parquet").count()
    assert read_warc(spark, warc_dir + "/*").count() == m["n_records"]

    import pytest as _pytest
    with _pytest.raises(SystemExit):
        _run(capsys, ["export", "--out", "/tmp/x"])


def test_cli_submit(spark, corpus_dir, capsys):
    """CLI submit (submit_url.py analog): enqueue-only then resume, and
    the one-shot submit-and-run form."""
    import json as _json
    import shutil as _shutil

    state = "/tmp/dcs_cli_submit_state"
    _shutil.rmtree(state, ignore_errors=True)
    out = _run(capsys, [
        "--cores", "8", "crawl", "--corpus", corpus_dir, "--state", state,
        "--max-depth", "1", "--budget", "10",
    ])
    before = _json.loads(out[-1])

    new_url = [
        r["url"] for r in spark.read.parquet(f"{corpus_dir}/pages.parquet")
        .select("url").limit(50).collect()
        if r["url"] not in set()  # take any; dedup happens engine-side
    ][:5]
    out = _run(capsys, [
        "--cores", "8", "submit", *new_url, "--corpus", corpus_dir,
        "--state", state, "--no-run",
    ])
    queued = _json.loads(out[-1])
    assert queued["submitted"] >= 0
    # resume drains whatever was enqueued
    out = _run(capsys, [
        "--cores", "8", "crawl", "--corpus", corpus_dir, "--state", state,
        "--resume",
    ])
    after = _json.loads(out[-1])
    # submitted urls start at depth 0, so the resume schedules them PLUS
    # whatever new links they discover
    assert after["total_scheduled"] >= before["total_scheduled"] + queued["submitted"]
