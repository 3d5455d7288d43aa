"""Sitemap ingestion — the standard crawler seed-discovery channel
(sitemaps.org protocol) the reference crawler does not read at all
(its frontier grows only from seeds + extracted <a href>,
crawler_node.py:86-129; a sitemap-aware crawler additionally enqueues
every <urlset> entry reachable from a host's sitemap.xml).

Two-level protocol, exactly as published:

  * ``sitemap.xml`` may be a ``<urlset>`` (leaf: ``<url><loc>..</loc>
    <lastmod>..</lastmod></url>`` entries) or a ``<sitemapindex>``
    (``<sitemap><loc>child-url</loc></sitemap>`` references — large
    hosts shard their url lists into child sitemaps).
  * Only children REFERENCED from an index count: an orphan shard on
    the host is not discoverable (and a referenced-but-missing child
    must be tolerated, not crash the ingest).

Scale shape: XML never touches Python — entry extraction is native
``regexp_extract_all`` + ``explode`` (JVM, whole-stage codegen); the
index indirection is one equi-join on (host, name) whose left side is
index REFERENCES (tiny — one row per shard), never the sitemap bodies.
At 10^10 urls the sitemap table is itself Iceberg-partitioned by host;
nothing here shuffles page content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

XML_HEADER = '<?xml version="1.0" encoding="UTF-8"?>'
URLSET_OPEN = '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
INDEX_OPEN = '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'


def sitemap_url_entries(sitemaps: DataFrame) -> DataFrame:
    """Parse a sitemap table (host, name, body) into discovered url
    entries (sitemap_host, url, lastmod).

    ``sitemap.xml`` is each host's entry point (the robots.txt
    ``Sitemap:`` convention). ``<urlset>`` entry points yield their own
    entries; ``<sitemapindex>`` entry points yield the entries of the
    child sitemaps they REFERENCE (resolved by file name on the same
    host) — unreferenced shards are invisible, dangling references are
    ignored by the inner join."""
    top = sitemaps.filter(F.col("name") == F.lit("sitemap.xml"))
    is_index = F.col("body").contains("<sitemapindex")
    urlsets_top = top.filter(~is_index).select("host", "body")

    refs = top.filter(is_index).select(
        "host",
        F.explode(
            F.regexp_extract_all("body", F.lit("<loc>([^<]*)</loc>"), 1)
        ).alias("child_loc"),
    )
    child_names = refs.select(
        "host", F.element_at(F.split("child_loc", "/"), -1).alias("name")
    )
    children = sitemaps.join(child_names, ["host", "name"]).select("host", "body")

    allsets = urlsets_top.unionByName(children)
    ents = allsets.select(
        "host",
        F.explode(
            # (?s): Java regex '.' does not match newlines — without
            # DOTALL a pretty-printed (multi-line) <url> element would
            # silently yield zero entries (ADVICE r06)
            F.regexp_extract_all("body", F.lit("(?s)<url>(.*?)</url>"), 1)
        ).alias("ent"),
    )
    return ents.select(
        F.col("host").alias("sitemap_host"),
        F.regexp_extract("ent", "<loc>([^<]*)</loc>", 1).alias("url"),
        F.regexp_extract("ent", "<lastmod>([^<]*)</lastmod>", 1).alias("lastmod"),
    )
