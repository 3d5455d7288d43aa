"""Local twin of the driver's correctness gate: run every queries() entry
and its oracle_sql() through DuckDB on the same parquet, compare row
count, column names, and order-insensitive values."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from distributed_crawler_spark.plans import registry

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    return v


def _rows_to_set(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm(r[i]) for i in order))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = registry.QUERIES[name](spark, SF)
    srows = sdf.collect()
    scols = sdf.columns

    ddf = duck.execute(registry.ORACLES[name])
    dcols = [c[0] for c in ddf.description]
    drows = ddf.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs oracle {len(drows)}"
    )
    sset = _rows_to_set([tuple(r[c] for c in scols) for r in srows], scols)
    dset = _rows_to_set(drows, dcols)
    mism = [i for i, (a, b) in enumerate(zip(sset, dset)) if a != b][:5]
    assert sset == dset, f"{name}: value mismatch at {mism}: " + "; ".join(
        f"spark={sset[i]} oracle={dset[i]}" for i in mism
    )


@pytest.mark.parametrize(
    "name", sorted(set(registry.QUERIES) - set(registry.ORACLES))
)
def test_rows_only_queries_run(spark, name):
    """Queries without a SQL oracle still must run and return rows with a
    stable schema (the driver's weaker check; full semantics are covered
    by dedicated pytest)."""
    df = registry.QUERIES[name](spark, SF)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.columns) > 0


def test_driver_window_priority_names_all_registered():
    """Every name in the rotation list must be a registered query — a
    typo would silently shrink the driver's 50-query validation window;
    and this round's new queries must actually sit inside the window."""
    from distributed_crawler_spark.plans import registry

    missing = [
        n for n in registry._DRIVER_WINDOW_PRIORITY if n not in registry.QUERIES
    ]
    assert not missing, f"window names not registered: {missing}"
    window = list(registry.QUERIES)[:50]
    for n in (
        "crawl_bfs",
        # round-6 additions and changed code paths
        "embedding_neardup_lsh",
        "ann_ivf_topk_fixed",
        "media_features",
        "media_summary",
        "media_transcode",
        "search_bm25f",
        "simhash_neardup_wide",
        "search_fuzzy",
        # late-round-6 first-ever hash oracles (SQL Porter / explicit
        # HLL / unrolled Lloyd's k-means)
        "url_cardinality_hll",
        "ann_ivf_topk_kmeans",
        "search_tf_stemmed",
        "search_bm25_indexed",
        "search_bm25_stemmed",
        "search_phrase_stemmed",
        # late-round-6 LLM-pipeline additions
        "decontaminate_ngrams",
        "semantic_dedup",
        "dedup_clusters",
        "dedup_keep_one",
        "pii_scrub",
        "curate_corpus",
        "pagerank",
        "mixture_sample",
        "dedup_paragraphs",
        "token_count_bpe",
        "training_shards",
        "anchor_texts",
        "search_anchor_bm25f",
        "frontier_priority",
        "sequence_packing",
        # first hash oracle in r06 after rows-only since r02
        "crawl_html_round0",
        # round-6 third continuation: first driver rows
        "fetch_schedule",
        "trap_detection",
        "lm_perplexity",
        "hits_scores",
        "crawl_delta",
        "recrawl_priority",
        "recrawl_queue",
        # round-6 fourth continuation: first driver rows
        "redirect_resolve",
        "sitemap_urls",
        "canonical_clusters",
        "host_pagerank",
        "bpe_learn",
        "bpe_encode",
        # round-6 fifth continuation: first driver rows (displaced
        # normalize_urls/sliding_rate/rep_signals/hash_sample — r04-green
        # map-only trivia, swept locally every pytest run, re-rotated in
        # the r07 window per NEXT.md)
        "url_blocklist",
        "cdx_lookup",
        "c4_line_filter",
        "dust_rules",
        "warc_revisit",
        # r04-stale rotation that must regain a fresh row this round
        "minhash_lsh_pairs",
    ):
        assert n in window, f"{n} fell out of the driver window"
