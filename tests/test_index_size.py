"""search.postings_gamma_size: hand-computed Elias-gamma costs (oracle
parity for the staged query runs in the staged sweep)."""

from __future__ import annotations

from distributed_crawler_spark.operators.search import postings_gamma_size


def test_gamma_bits_hand_computed(spark):
    # term 'x' in docs 0, 2, 6  -> gaps 1, 2, 4 -> bits 1 + 3 + 5 = 9
    # term 'y' in doc 5         -> gap 6        -> bits 2*2+1 = 5
    docs = spark.createDataFrame(
        [(0, "x"), (2, "x"), (6, "x"), (5, "y")], "doc_id LONG, text STRING"
    )
    rows = {r.term: r for r in postings_gamma_size(docs).collect()}
    assert rows["x"].df == 3 and rows["x"].gamma_bits == 9
    assert rows["x"].bits_per_posting == 3.0
    assert rows["y"].df == 1 and rows["y"].gamma_bits == 5


def test_duplicate_tokens_count_once_per_doc(spark):
    # postings are per (term, doc): repeated tokens in one doc add no bits
    docs = spark.createDataFrame(
        [(3, "z z z z")], "doc_id LONG, text STRING"
    )
    r = postings_gamma_size(docs).collect()[0]
    assert r.df == 1 and r.gamma_bits == 2 * 3 - 1  # gap 4 -> bitlen 3


def test_topk_orders_by_bits_then_term(spark):
    # rare1 (odd docs): gaps 2,2,2,2 -> 12 bits; rare0 (even): gaps
    # 1,2,2,2 -> 10; common (all): gaps 1x8 -> 8 — smaller ids compress
    # better, so the DENSER term can be the CHEAPER one
    docs = spark.createDataFrame(
        [(i, "common rare%d" % (i % 2)) for i in range(8)],
        "doc_id LONG, text STRING",
    )
    out = postings_gamma_size(docs, topk=2).collect()
    assert [(r.term, r.gamma_bits) for r in out] == [("rare1", 12), ("rare0", 10)]
