"""Round-6 fifth-continuation operators: UT1-style blocklist gate
(parent-domain suffix matching), SURT/CDX prefix index (key form +
pushdown), C4 line filter (python-reference parity), and DUST rule
mining (evidence/violation edge cases)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_crawler_spark.functions.urls import surt_key
from distributed_crawler_spark.operators.politeness import blocklist_filter
from distributed_crawler_spark.operators.stats import dust_rule_mining
from distributed_crawler_spark.operators.textstats import c4_line_filter
from distributed_crawler_spark.sources.cdx import (
    cdx_prefix_lookup,
    cdx_records,
    write_cdx_index,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- SURT/CDX


def test_surt_key_forms(spark):
    cases = [
        ("https://Sub.Example.com/a/b?q=1", "com,example,sub)/a/b?q=1"),
        ("https://www.example.com/x", "com,example)/x"),
        ("http://h5.example.com/p/7", "com,example,h5)/p/7"),
        ("https://example.com", "com,example)/"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url STRING")
    got = [r["s"] for r in df.select(surt_key(F.col("url")).alias("s")).collect()]
    assert got == [s for _, s in cases]


def test_cdx_prefix_lookup_pushdown_and_no_sibling_bleed(spark, tmp_path):
    """'h7)' prefix must not match host h70; the startswith predicate
    must reach the parquet scan as a pushed filter."""
    rows = [
        (f"https://h{h}.example.com/p/{i}", f"t{h}-{i}")
        for h in (7, 70) for i in range(5)
    ]
    pages = spark.createDataFrame(rows, "url STRING, text STRING")
    idx = str(tmp_path / "cdx")
    write_cdx_index(cdx_records(pages), idx, n_parts=2)
    out = cdx_prefix_lookup(spark, idx, "com,example,h7)/")
    plan = _plan(out)
    assert "StringStartsWith(surt,com,example,h7)/)" in plan, plan
    urls = [r["url"] for r in out.collect()]
    assert urls == [f"https://h7.example.com/p/{i}" for i in range(5)]


# --------------------------------------------------------------- blocklist


def test_blocklist_parent_domain_and_keywords(spark):
    cands = spark.createDataFrame(
        [
            ("https://ads.bad.com/x", "ads.bad.com"),
            ("https://bad.com/y", "bad.com"),
            ("https://sub.a.tracker.net/z", "sub.a.tracker.net"),
            ("https://notbad.com/ok", "notbad.com"),
            ("https://good.com/casino/slots", "good.com"),
            ("https://good.com/fine", "good.com"),
        ],
        "url STRING, host STRING",
    )
    blk = spark.createDataFrame([("bad.com",), ("tracker.net",)], "domain STRING")
    out = blocklist_filter(cands, blk, path_keywords=["/casino/"])
    got = {r["url"]: (r["blocked_domain"], r["kw_blocked"], r["allowed"]) for r in out.collect()}
    assert got["https://ads.bad.com/x"] == ("bad.com", False, False)
    assert got["https://bad.com/y"] == ("bad.com", False, False)
    # 4-label host matched by its 2-label suffix entry
    assert got["https://sub.a.tracker.net/z"] == ("tracker.net", False, False)
    # substring of a blocked domain is NOT a suffix match
    assert got["https://notbad.com/ok"] == (None, False, True)
    assert got["https://good.com/casino/slots"] == (None, True, False)
    assert got["https://good.com/fine"] == (None, False, True)


def test_blocklist_candidate_side_never_sort_merge_joins(spark):
    cands = spark.createDataFrame(
        [(f"https://h{i}.example.com/p/{i}", f"h{i}.example.com") for i in range(50)],
        "url STRING, host STRING",
    )
    blk = spark.createDataFrame([("h3.example.com",)], "domain STRING")
    plan = _plan(blocklist_filter(cands, blk))
    assert "SortMergeJoin" not in plan
    # probe range derives from the list's actual label span (ADVICE r06
    # fix): a single 3-label entry needs exactly ONE suffix probe
    assert plan.count("BroadcastHashJoin") == 1


def test_blocklist_matches_outside_old_probe_range(spark):
    """Entries with 1 label or more labels than the old [2, 4] cap were
    silently ignored before the ADVICE r06 fix — both must block now."""
    cands = spark.createDataFrame(
        [
            ("https://localhost/p/1", "localhost"),
            ("https://a.b.c.d.example.com/p/2", "a.b.c.d.example.com"),
            ("https://ok.example.com/p/3", "ok.example.com"),
        ],
        "url STRING, host STRING",
    )
    blk = spark.createDataFrame(
        [("localhost",), ("a.b.c.d.example.com",)], "domain STRING"
    )
    rows = {r["host"]: r["allowed"] for r in blocklist_filter(cands, blk).collect()}
    assert rows == {
        "localhost": False,
        "a.b.c.d.example.com": False,
        "ok.example.com": True,
    }


# ------------------------------------------------------------ C4 line rules


def _c4_py(text: str, min_words: int = 5, min_kept: int = 3):
    lines = text.split("\n")
    kept = [
        ln
        for ln in lines
        if ln[-1:] in ('.', '!', '?', '"')
        and len([w for w in ln.split(" ") if w]) >= min_words
        and "lorem ipsum" not in ln.lower()
        and "{" not in ln
        and "javascript" not in ln.lower()
    ]
    return (
        len(lines),
        len(kept),
        len(kept) >= min_kept,
        "\n".join(kept),
    )


def test_c4_line_filter_python_parity(spark):
    docs = [
        # all three phrase bans, the punctuation rule, and the word-count
        # rule each knock out exactly one line; 3 survive -> kept_doc
        (
            0,
            "one two three four five six.\n"
            "this line has javascript in it and seven words.\n"
            "curly { brace line with six words here.\n"
            "Lorem Ipsum dolor sit amet consectetur.\n"
            "no terminal punctuation on this line\n"
            "short line.\n"
            'a quoted ending line with six words"\n'
            "another clean line with five words!",
        ),
        # only 2 survive -> kept_doc False
        (1, "good line with five words.\ngood line with six words here?\nbad\n"),
        (2, ""),  # empty doc: one empty line, nothing kept
    ]
    df = spark.createDataFrame(docs, "doc_id INT, text STRING")
    out = {r["doc_id"]: r for r in c4_line_filter(df).collect()}
    for doc_id, text in docs:
        n_lines, n_kept, kept_doc, clean = _c4_py(text)
        r = out[doc_id]
        assert (r["n_lines"], r["n_kept"], r["kept_doc"], r["text_clean"]) == (
            n_lines,
            n_kept,
            kept_doc,
            clean,
        ), f"doc {doc_id}"
    assert out[0]["kept_doc"] is True and out[0]["n_kept"] == 3
    assert out[1]["kept_doc"] is False
    assert out[2]["n_lines"] == 1 and out[2]["n_kept"] == 0


def test_c4_line_filter_null_text_behaves_like_empty(spark):
    df = spark.createDataFrame([(0, None), (1, "good line with five words.")],
                               "doc_id INT, text STRING")
    out = {r["doc_id"]: r for r in c4_line_filter(df, min_kept_lines=1).collect()}
    assert out[0]["n_lines"] == 1 and out[0]["n_kept"] == 0 and out[0]["text_clean"] == ""
    assert out[1]["kept_doc"] is True


# ----------------------------------------------------------------- DUST


def test_dust_rule_mining_edges(spark):
    pages = spark.createDataFrame(
        [
            ("https://a.com/p/1", "c1"),
            ("https://a.com/p/1?sessionid=x", "c1"),   # support for strip_session
            ("https://a.com/p/2", "c2"),
            ("https://a.com/p/2?page=2", "c2p2"),      # violation for strip_query
            ("https://a.com/p/3?sessionid=y", "c3"),   # rewritten target NOT crawled
        ],
        "url STRING, ck STRING",
    )
    rules = [
        ("strip_session", r"\?sessionid=[^&]*$", ""),
        ("strip_query", r"\?.*$", ""),
    ]
    out = {r["rule"]: r for r in dust_rule_mining(pages, rules, min_support=1).collect()}
    s = out["strip_session"]
    # two urls rewritten, only one rewritten target exists in the crawl
    assert (s["n_candidates"], s["n_evidence"], s["support"], s["violations"]) == (2, 1, 1, 0)
    assert s["rule_precision"] == 1.0 and s["valid"] is True
    q = out["strip_query"]
    assert (q["n_candidates"], q["n_evidence"], q["support"], q["violations"]) == (3, 2, 1, 1)
    assert q["rule_precision"] == 0.5 and q["valid"] is False


def test_dust_min_support_gate(spark):
    pages = spark.createDataFrame(
        [("https://a.com/p/1", "c1"), ("https://a.com/p/1/", "c1")],
        "url STRING, ck STRING",
    )
    out = dust_rule_mining(
        pages, [("strip_slash", r"/$", "")], min_support=2
    ).collect()[0]
    # precision 1.0 but support 1 < min_support -> not deployable
    assert out["support"] == 1 and out["rule_precision"] == 1.0 and out["valid"] is False


# ------------------------------------------------------------- WARC revisit


def test_revisit_plan_is_aggregate_join_not_window(spark):
    """The firsts-per-digest decomposition must be a map-side-combined
    min(struct) + equi-join — a Window over digest would single-partition
    a mega-digest (one boilerplate body captured 10^6 times)."""
    from distributed_crawler_spark.sources.warc import revisit_plan

    caps = spark.createDataFrame(
        [(f"https://a.com/{i}", i, f"d{i % 3}") for i in range(30)],
        "url STRING, ts LONG, digest STRING",
    )
    plan = _plan(revisit_plan(caps, ts_col="ts"))
    assert "Window" not in plan
    assert "partial_min" in plan or "partial min" in plan.lower(), plan
