"""WARC ingestion: byte-level round trip into the input_hint page-table
shape, HTTP-envelope stripping, non-response records skipped, and a
crawl driven off WARC-ingested pages matching the parquet-ingested
crawl."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from distributed_crawler_spark.sources.warc import read_warc, write_warc


def test_warc_round_trip(spark, tmp_path):
    rows = [
        ("https://a.example.com/", "2024-01-02T03:04:05Z", b"<html>alpha</html>"),
        ("https://b.example.com/x", "2024-02-03T04:05:06Z", b"<html>beta \xe2\x9c\x93</html>"),
    ]
    p = str(tmp_path / "test.warc")
    write_warc(rows, p)
    # splice in a non-response record: must be skipped, framing intact
    blob = open(p, "rb").read()
    extra = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: https://a.example.com/\r\n"
        b"Content-Length: 4\r\n\r\nGET /\r\n\r\n"
    )
    open(p, "wb").write(extra + blob)

    got = {
        r["url"]: (str(r["warc_ts"]), bytes(r["html"]))
        for r in read_warc(spark, p).collect()
    }
    assert set(got) == {u for u, _, _ in rows}
    assert got["https://a.example.com/"][1] == b"<html>alpha</html>"
    assert got["https://b.example.com/x"][1] == b"<html>beta \xe2\x9c\x93</html>"
    assert got["https://a.example.com/"][0].startswith("2024-01-02 03:04:05")


def test_crawl_from_warc_matches_parquet_ingest(spark, corpus_dir, tmp_path):
    """End-to-end: export a slice of the HTML corpus to WARC, re-ingest
    with read_warc, run the same bounded crawl on both page tables, and
    compare the frontiers."""
    from distributed_crawler_spark.config import CrawlConfig
    from distributed_crawler_spark.operators.scheduler import CrawlScheduler

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    robots = spark.read.parquet(f"{corpus_dir}/robots.parquet")
    seeds = spark.read.parquet(f"{corpus_dir}/seeds.parquet")

    sample = pages.orderBy("url").limit(200).select("url", "warc_ts", "html")
    rows = [
        (r["url"], r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ"), bytes(r["html"]))
        for r in sample.collect()
    ]
    # two archives to prove file-granular parallelism composes
    write_warc(rows[:100], str(tmp_path / "a.warc"))
    write_warc(rows[100:], str(tmp_path / "b.warc"))
    warc_pages = read_warc(spark, str(tmp_path) + "/*.warc")

    # byte parity of the ingested html (timestamps survive to the second)
    orig = {r["url"]: bytes(r["html"]) for r in sample.collect()}
    back = {r["url"]: bytes(r["html"]) for r in warc_pages.collect()}
    assert back == orig

    results = {}
    for name, table in (("parquet", sample), ("warc", warc_pages)):
        state = f"/tmp/dcs_warc_crawl_{name}"
        shutil.rmtree(state, ignore_errors=True)
        s = CrawlScheduler(
            spark, table.withColumn("html", F.col("html").cast("binary")),
            robots, state,
            CrawlConfig(max_depth=1, max_urls_per_domain=5, max_retries=0),
        )
        s.run(seeds=seeds)
        results[name] = {
            (r["url"], r["depth"], r["status"]) for r in s.frontier().collect()
        }
    assert results["warc"] == results["parquet"]


def test_warc_gzip_and_diagnostics(spark, tmp_path):
    """.warc.gz archives (how Common-Crawl ships) inflate transparently;
    unrecognizable content raises instead of yielding an empty table."""
    import gzip

    import pytest

    from distributed_crawler_spark.sources.warc import _parse_warc_bytes

    rows = [("https://gz.example.com/", "2024-01-01T00:00:00Z", b"<html>gz</html>")]
    p = str(tmp_path / "test.warc")
    write_warc(rows, p)
    gz = str(tmp_path / "test.warc.gz")
    open(gz, "wb").write(gzip.compress(open(p, "rb").read()))

    got = {r["url"]: bytes(r["html"]) for r in read_warc(spark, gz).collect()}
    assert got == {"https://gz.example.com/": b"<html>gz</html>"}

    with pytest.raises(ValueError):
        list(_parse_warc_bytes(b"this is definitely not an archive"))


def test_warc_rejects_negative_and_truncated_records():
    """A negative Content-Length must not loop forever, and a record cut
    off mid-body raises instead of yielding a clamped page."""
    import pytest

    from distributed_crawler_spark.sources.warc import _parse_warc_bytes

    neg = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x/\r\nContent-Length: -1000\r\n\r\nbody"
    )
    with pytest.raises(ValueError):
        list(_parse_warc_bytes(neg))

    truncated = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x/\r\nContent-Length: 99999\r\n\r\nshort"
    )
    with pytest.raises(ValueError):
        list(_parse_warc_bytes(truncated))


def test_wet_round_trip(spark, tmp_path):
    """WET (conversion-record) archives read into the documents-style
    (url, warc_ts, text) table; response records in the same stream are
    skipped by the type filter, and read_warc on a WET file yields no
    rows (and vice versa)."""
    from distributed_crawler_spark.sources.warc import (
        read_warc,
        read_wet,
        write_wet,
    )

    rows = [
        ("http://a.example/x", "2024-01-01T00:00:00Z", "alpha beta text"),
        ("http://b.example/y", "2024-01-02T00:00:00Z", "unicode éà text"),
    ]
    p = str(tmp_path / "f.wet")
    write_wet(rows, p)
    got = {
        (r["url"], r["text"]) for r in read_wet(spark, p).collect()
    }
    assert got == {(u, t) for u, _, t in rows}
    ts = [r["warc_ts"] for r in read_wet(spark, p).collect()]
    assert all(t is not None for t in ts)
    assert read_warc(spark, p).count() == 0  # no response records


def test_wet_body_starting_with_http_not_stripped(spark, tmp_path):
    """Review r04: the HTTP-envelope strip belongs to response records
    ONLY — a WET conversion payload that quotes a raw HTTP exchange
    (starts with 'HTTP/' and contains CRLFCRLF) must come back intact."""
    from distributed_crawler_spark.sources.warc import read_wet, write_wet

    text = "HTTP/1.1 200 OK demo\r\n\r\nthe actual extracted text"
    p = str(tmp_path / "h.wet")
    write_wet([("http://q/", "2024-01-01T00:00:00Z", text)], p)
    assert read_wet(spark, p).collect()[0]["text"] == text


def test_randomized_mixed_archive_round_trip(spark, tmp_path):
    """Seeded random archives mixing response/conversion/metadata records
    with adversarial bodies (bodies containing 'WARC/', CRLFCRLF, or
    'HTTP/' prefixes): Content-Length framing must recover exactly the
    records of each requested type, bodies byte-intact."""
    import random

    from distributed_crawler_spark.sources.warc import read_warc, read_wet

    rng = random.Random(11)
    nasty = ["WARC/1.0\r\n", "\r\n\r\n", "HTTP/1.1 500 x\r\n\r\ntail", "plain"]
    recs = []
    for i in range(30):
        kind = rng.choice(["response", "conversion", "metadata"])
        body = (rng.choice(nasty) + f" body-{i} " + rng.choice(nasty)).encode()
        recs.append((kind, f"http://h{i}.ex/p", "2024-01-01T00:00:00Z", body))

    p = str(tmp_path / "mix.warc")
    with open(p, "wb") as f:
        for kind, url, date, body in recs:
            payload = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
                if kind == "response"
                else body
            )
            f.write(
                b"WARC/1.0\r\nWARC-Type: " + kind.encode()
                + b"\r\nWARC-Target-URI: " + url.encode()
                + b"\r\nWARC-Date: " + date.encode()
                + b"\r\nContent-Length: " + str(len(payload)).encode()
                + b"\r\n\r\n" + payload + b"\r\n\r\n"
            )

    got_warc = {
        (r["url"], bytes(r["html"])) for r in read_warc(spark, p).collect()
    }
    assert got_warc == {(u, b) for k, u, _, b in recs if k == "response"}
    got_wet = {(r["url"], r["text"]) for r in read_wet(spark, p).collect()}
    want_wet = set()
    for k, u, _, b in recs:
        if k == "conversion":
            t = b.decode("utf-8", "replace")
            want_wet.add((u, t))
    assert got_wet == want_wet


def test_export_warc_round_trip(spark, tmp_path):
    """Distributed WARC export -> read_warc is the identity on
    (url, warc_ts, html), including over empty partitions, adversarial
    bodies (bytes that LOOK like WARC/HTTP headers), gzip and plain."""
    import datetime as dt

    from pyspark.sql import functions as F

    from distributed_crawler_spark.sources.warc import export_warc, read_warc

    rows = [
        ("https://a.example.com/p/1", dt.datetime(2024, 1, 1, 12, 0, 0),
         b"<html>plain</html>"),
        ("https://b.example.com/p/2", dt.datetime(2024, 2, 2, 3, 4, 5),
         b"HTTP/1.1 200 OK\r\n\r\nbody that quotes an http exchange"),
        ("https://c.example.com/p/3", dt.datetime(2024, 3, 3, 0, 0, 0),
         b"WARC/1.0\r\nContent-Length: 999\r\n\r\nfake nested record"),
        ("https://d.example.com/p/4", dt.datetime(2024, 4, 4, 4, 4, 4), b""),
    ]
    df = spark.createDataFrame(rows, "url STRING, warc_ts TIMESTAMP, html BINARY")
    for compress in (True, False):
        out = str(tmp_path / f"warc_out_{compress}")
        manifest = export_warc(df.repartition(8), out, compress=compress).collect()
        assert sum(m["n_records"] for m in manifest) == len(rows)
        assert all(m["n_bytes"] > 0 for m in manifest)
        # empty partitions produced no shard
        assert len(manifest) <= 8
        back = {
            (r["url"], r["warc_ts"], bytes(r["html"]))
            for r in read_warc(spark, out + "/*").collect()
        }
        assert back == set(rows), f"compress={compress}"


def test_export_wet_round_trip(spark, tmp_path):
    import datetime as dt

    from distributed_crawler_spark.sources.warc import export_wet, read_wet

    rows = [
        ("https://a.example.com/1", dt.datetime(2024, 5, 5, 5, 5, 5),
         "plain extracted text"),
        ("https://b.example.com/2", dt.datetime(2024, 6, 6, 6, 6, 6),
         "HTTP/1.1 text that begins like an envelope stays intact"),
        ("https://c.example.com/3", dt.datetime(2024, 7, 7, 7, 7, 7),
         "unicode: éß中文"),
    ]
    df = spark.createDataFrame(rows, "url STRING, warc_ts TIMESTAMP, text STRING")
    out = str(tmp_path / "wet_out")
    manifest = export_wet(df.repartition(2), out).collect()
    assert sum(m["n_records"] for m in manifest) == len(rows)
    back = {
        (r["url"], r["warc_ts"], r["text"])
        for r in read_wet(spark, out + "/*").collect()
    }
    assert back == set(rows)


def test_warc_record_round_trip_property():
    """Property test: ANY (url-ish string, arbitrary bytes body) list
    survives serialize -> parse byte-exactly, for both record flavors —
    the framing is Content-Length-based, so bodies containing CRLFCRLF,
    WARC headers, HTTP envelopes, or NUL bytes must never confuse it."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from distributed_crawler_spark.sources.warc import (
        _parse_warc_bytes,
        _record_bytes,
    )

    url_st = st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=1,
        max_size=40,
    ).map(lambda s: "https://h/" + s)
    body_st = st.binary(max_size=300)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(url_st, body_st), min_size=1, max_size=8))
    def check(rows):
        date = "2024-01-01T00:00:00Z"
        blob = b"".join(
            _record_bytes("response", u, date, b, True) for u, b in rows
        )
        got = list(_parse_warc_bytes(blob, want_type="response"))
        assert [(u, date, b) for u, b in rows] == got

        blob_wet = b"".join(
            _record_bytes("conversion", u, date, b, False) for u, b in rows
        )
        got_wet = list(_parse_warc_bytes(blob_wet, want_type="conversion"))
        assert [(u, date, b) for u, b in rows] == got_wet

    check()


def test_export_warc_dedup_revisit_records(spark, tmp_path):
    """Revisit dedup export: first capture per payload digest is a full
    response record; later identical captures are zero-body revisit
    records carrying WARC-Refers-To-Target-URI + WARC-Payload-Digest +
    the identical-payload-digest profile. read_warc on the output sees
    ONLY the keepers; the revisit records parse back from the same
    files with correct pointers."""
    import datetime as dt
    import glob
    import gzip
    import re

    from distributed_crawler_spark.sources.warc import (
        export_warc_dedup,
        read_warc,
        revisit_plan,
    )

    body_a, body_b = b"<html>one</html>", b"<html>two</html>"
    rows = [
        ("https://a.com/1", dt.datetime(2024, 1, 1, 0, 0, 1), body_a),
        ("https://a.com/2", dt.datetime(2024, 1, 1, 0, 0, 2), body_a),  # revisit
        ("https://b.com/1", dt.datetime(2024, 1, 1, 0, 0, 3), body_b),
        ("https://b.com/0", dt.datetime(2024, 1, 1, 0, 0, 3), body_b),  # ts tie -> url breaks it
        ("https://a.com/3", dt.datetime(2024, 1, 1, 0, 0, 9), body_a),  # revisit
    ]
    df = spark.createDataFrame(rows, "url STRING, warc_ts TIMESTAMP, html BINARY")
    out = str(tmp_path / "warc_dedup")
    manifest = export_warc_dedup(df.repartition(4), out).collect()
    assert sum(m["n_records"] for m in manifest) == 5
    assert sum(m["n_revisits"] for m in manifest) == 3

    keepers = {
        (r["url"], bytes(r["html"])) for r in read_warc(spark, out + "/*").collect()
    }
    assert keepers == {("https://a.com/1", body_a), ("https://b.com/0", body_b)}

    # raw revisit records: zero body, refers-to points at the keeper
    refs = {}
    for path in glob.glob(out + "/*.warc.gz"):
        blob = gzip.decompress(open(path, "rb").read())
        for m in re.finditer(
            rb"WARC-Type: revisit\r\n"
            rb"WARC-Target-URI: (?P<u>[^\r]+)\r\n"
            rb"WARC-Date: [^\r]+\r\n"
            rb"WARC-Refers-To-Target-URI: (?P<r>[^\r]+)\r\n"
            rb"WARC-Payload-Digest: md5:[0-9a-f]{32}\r\n"
            rb"WARC-Profile: [^\r]+identical-payload-digest\r\n"
            rb"Content-Length: 0\r\n",
            blob,
        ):
            refs[m["u"].decode()] = m["r"].decode()
    assert refs == {
        "https://a.com/2": "https://a.com/1",
        "https://a.com/3": "https://a.com/1",
        "https://b.com/1": "https://b.com/0",
    }

    # plan-level: the classification itself matches a python reference
    planned = {
        r["url"]: (r["record_type"], r["refers_to_url"])
        for r in revisit_plan(
            df.withColumn("digest", F.md5(F.col("html")))
            , digest_col="digest"
        ).collect()
    }
    assert planned["https://a.com/1"] == ("response", "")
    assert planned["https://b.com/0"] == ("response", "")
    assert planned["https://b.com/1"] == ("revisit", "https://b.com/0")


def test_revisit_plan_random_parity(spark):
    """Seeded random captures (shared digests, ts ties) vs a pure-Python
    reference of the firsts-per-digest rule."""
    import random

    rng = random.Random(42)
    rows = []
    for i in range(300):
        d = f"d{rng.randrange(40)}"
        ts = rng.randrange(20)
        rows.append((f"https://h{rng.randrange(9)}.com/p/{i}", ts, d))
    firsts = {}
    for url, ts, d in rows:
        if d not in firsts or (ts, url) < firsts[d]:
            firsts[d] = (ts, url)
    expect = {
        url: ("response", "") if firsts[d] == (ts, url) else ("revisit", firsts[d][1])
        for url, ts, d in rows
    }

    from distributed_crawler_spark.sources.warc import revisit_plan

    caps = spark.createDataFrame(rows, "url STRING, ts LONG, digest STRING")
    got = {
        r["url"]: (r["record_type"], r["refers_to_url"])
        for r in revisit_plan(caps.repartition(7), ts_col="ts").collect()
    }
    assert got == expect
