"""HTML extraction parity with the reference's behavioral spec:
crawler_node.py:86-129 (metadata/links), utils.py:44-51 (regex text),
indexer_node.py:133-158 (soup text), test_crawl_quality.py:48-136
(script/style stripping, link filtering)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_crawler_spark.functions.extract import (
    extract_text_regex_py,
    extract_text_soup_py,
    native_text_regex,
    parse_page_py,
    parse_page_udf,
)

FIXTURE = (
    '<html lang="en"><head><title>My Title</title>'
    '<meta name="description" content="A test page">'
    '<meta name="keywords" content="k1 k2">'
    "<style>body {color: red}</style></head>"
    "<body><h1>Head  line</h1><p>Body text here.</p>"
    "<script>var hidden = 'SECRET';</script>"
    '<a href="https://other.com/page/">abs</a>'
    '<a href="/rel/path">rel</a>'
    '<a href="javascript:void(0)">js</a>'
    '<a href="mailto:x@y.z">mail</a>'
    '<a href="#frag">frag-only</a>'
    "</body></html>"
)


def test_soup_text_strips_script_and_style():
    text = extract_text_soup_py(FIXTURE)
    assert "SECRET" not in text
    assert "color: red" not in text
    assert "Body text here." in text
    # double-space inside an element splits into chunks joined by \n
    assert "Head\nline" in text


def test_regex_text_leaks_script_like_reference():
    # utils.py:44-51 keeps script text (tags only are stripped)
    text = extract_text_regex_py(FIXTURE)
    assert "SECRET" in text
    assert "<" not in text


def test_link_extraction_filters_and_normalizes():
    parsed = parse_page_py(FIXTURE, "https://base.com/dir/page")
    # http(s) only (crawler_node.py:128; test_crawl_quality.py:82-107)
    assert "https://other.com/page" in parsed["links"]  # trailing / stripped
    assert "https://base.com/rel/path" in parsed["links"]  # urljoin resolved
    assert not any("javascript" in l for l in parsed["links"])
    assert not any("mailto" in l for l in parsed["links"])
    # fragment-only href resolves to the base page (normalized, no #)
    assert "https://base.com/dir/page" in parsed["links"]


def test_metadata_extraction():
    parsed = parse_page_py(FIXTURE, "https://base.com/")
    assert parsed["title"] == "My Title"
    assert parsed["description"] == "A test page"
    assert parsed["keywords"] == "k1 k2"
    assert parsed["language"] == "en"


def test_udf_matches_python(spark):
    df = spark.createDataFrame(
        [(FIXTURE.encode(), "https://base.com/dir/page")], ["html", "url"]
    )
    row = df.select(
        parse_page_udf(F.col("html"), F.col("url")).alias("p")
    ).collect()[0]["p"]
    want = parse_page_py(FIXTURE, "https://base.com/dir/page")
    assert row["title"] == want["title"]
    assert row["text"] == want["text"]
    assert list(row["links"]) == want["links"]


def test_native_regex_text_matches_python(spark):
    df = spark.createDataFrame([(FIXTURE.encode(),)], ["html"])
    got = df.select(native_text_regex(F.col("html")).alias("t")).collect()[0]["t"]
    assert got == extract_text_regex_py(FIXTURE)


def test_corpus_text_byte_identical(spark, corpus_dir):
    """input_hint invariant: extracted text per url is byte-identical to
    the corpus golden text column."""
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    from distributed_crawler_spark.functions.extract import extract_text_soup_udf

    mismatches = (
        pages.withColumn("re_text", extract_text_soup_udf(F.col("html")))
        .filter(F.col("re_text") != F.col("text"))
        .count()
    )
    assert mismatches == 0


def _slow_collect(html):
    from distributed_crawler_spark.functions.extract import _PageParser

    p = _PageParser()
    p.feed(html)
    p.close()
    return p


def _state(p):
    return (
        "".join(p.text_parts),
        " ".join(t.strip() for t in p.title_parts if t),
        p.descriptions,
        p.keywords,
        p.hrefs,
        p.lang,
    )


ADVERSARIAL = [
    "",
    "plain text only, no tags & an &amp; entity",
    "<html lang='de'><title>T &amp; U</title><body>a &lt; b</body></html>",
    "<!-- comment <a href='x'> inside -->visible",
    "<!DOCTYPE html><p>doc</p>",
    "<script>var s = '</notscript>' + 1;</script>after",
    "<style type='text/css'>p { color: red }</style>text",
    "<a href=unquoted>u</a><A HREF='single'>s</A>",
    '<meta content="desc first" name="description">',
    "<meta name='keywords' content='a,b'><meta name='description'>",
    "<script src='x.js'/>not raw text",
    "<p>unclosed <b>tags everywhere",
    '<div title="a > b">quote-gt</div>',             # fast path falls back
    "<title>nested <b>markup</b></title>",            # fast path falls back
    "text with trailing <",                            # truncated tag
    "<?xml version='1.0'?><p>pi</p>",
    "<html LANG='fr'><p>upper attr</p></html>",
    "<a href='h&amp;m'>entity in attr</a>",
]


def test_fast_scan_matches_htmlparser_on_fixtures():
    from distributed_crawler_spark.functions.extract import _parse_collected

    for html in ADVERSARIAL:
        assert _state(_parse_collected(html)) == _state(_slow_collect(html)), html


def test_fast_scan_matches_htmlparser_on_corpus(spark, corpus_dir):
    import duckdb

    from distributed_crawler_spark.functions.extract import _parse_collected

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT html FROM '{corpus_dir}/pages.parquet/*.parquet'"
    ).fetchall()
    con.close()
    for (html,) in rows:
        h = bytes(html).decode("utf-8", "ignore")
        assert _state(_parse_collected(h)) == _state(_slow_collect(h))


# ---------------------------------------------------------------------------
# Anchor-text extraction (functions/extract.py:_AnchorParser)
# ---------------------------------------------------------------------------

def test_extract_anchors_basic_attribution():
    from distributed_crawler_spark.functions.extract import extract_anchors_py

    out = extract_anchors_py(FIXTURE, "https://base.example.com/dir/page")
    # js/mailto dropped; #frag resolves onto the base page (fragment
    # stripped by normalization); relative resolves against the base
    assert out == [
        {"url": "https://other.com/page", "anchor": "abs"},
        {"url": "https://base.example.com/rel/path", "anchor": "rel"},
        {"url": "https://base.example.com/dir/page", "anchor": "frag-only"},
    ]


def test_extract_anchors_nested_markup_and_entities():
    from distributed_crawler_spark.functions.extract import extract_anchors_py

    html = (
        '<a href="https://a.com/x"><b>bold</b> &amp; <i>ital</i></a>'
        '<a href="https://a.com/y"><img src="i.png"></a>'
        '<a href="https://a.com/z">outer '
        '<a href="https://a.com/w">implicit close</a>'
    )
    out = extract_anchors_py(html, None)
    assert out == [
        {"url": "https://a.com/x", "anchor": "bold & ital"},
        {"url": "https://a.com/y", "anchor": ""},
        # a new <a> closes the open one (browser behavior); the last
        # anchor is open at EOF and still emitted
        {"url": "https://a.com/z", "anchor": "outer"},
        {"url": "https://a.com/w", "anchor": "implicit close"},
    ]


def test_extract_anchors_skips_script_inside_anchor():
    from distributed_crawler_spark.functions.extract import extract_anchors_py

    html = '<a href="https://a.com/s">seen<script>var x="HIDDEN";</script> text</a>'
    out = extract_anchors_py(html, None)
    assert out == [{"url": "https://a.com/s", "anchor": "seen text"}]
    assert extract_anchors_py(None, None) == []


def test_anchor_udf_matches_python(spark, corpus_dir):
    """Arrow UDF ≡ row-at-a-time python over the real HTML corpus."""
    import os
    from distributed_crawler_spark.functions.extract import (
        extract_anchors_py,
        extract_anchors_udf,
    )

    pages = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))
    rows = (
        pages.select("url", extract_anchors_udf(F.col("html"), F.col("url")).alias("a"))
        .orderBy("url")
        .collect()
    )
    golden = {
        r["url"]: extract_anchors_py(bytes(r["html"]).decode("utf-8"), r["url"])
        for r in pages.select("url", "html").collect()
    }
    assert len(rows) > 0
    for r in rows:
        got = [{"url": x["url"], "anchor": x["anchor"]} for x in r["a"]]
        assert got == golden[r["url"]], r["url"]
