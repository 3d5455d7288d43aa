"""search.percolate: conjunctive reverse-search semantics (staged
oracle parity runs in the staged sweep)."""

from __future__ import annotations

from distributed_crawler_spark.operators.search import percolate


def _run(spark, docs, queries):
    ddf = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    qdf = spark.createDataFrame(queries, "query_id STRING, terms ARRAY<STRING>")
    return sorted(
        (r.query_id, r.doc_id) for r in percolate(ddf, qdf).collect()
    )


def test_and_semantics(spark):
    docs = [
        (1, "alpha beta gamma"),
        (2, "alpha beta"),
        (3, "beta gamma delta"),
    ]
    queries = [
        ("q_ab", ["alpha", "beta"]),
        ("q_abg", ["alpha", "beta", "gamma"]),
        ("q_d", ["delta"]),
        ("q_none", ["omega"]),
    ]
    got = _run(spark, docs, queries)
    assert got == [("q_ab", 1), ("q_ab", 2), ("q_abg", 1), ("q_d", 3)]


def test_repeated_terms_in_doc_and_query(spark):
    # duplicate terms in the stored query dedupe; repeated tokens in the
    # doc satisfy a term only once
    docs = [(1, "x x x y"), (2, "x x x")]
    queries = [("q", ["x", "y", "x"])]
    assert _run(spark, docs, queries) == [("q", 1)]
