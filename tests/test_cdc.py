"""dedup.cdc_chunk_stats: python-reference parity and the boundary-
resynchronization property CDC exists for (oracle parity for the staged
query runs in tests/test_suffix.py::test_staged_queries_against_oracles)."""

from __future__ import annotations

import random

import pytest

from distributed_crawler_spark.operators.dedup import cdc_chunk_stats

W, B, M, D = 8, 31, 1 << 20, 64


def _py_cdc(texts):
    """Sequential reference: chunk every doc, then per-doc shared stats."""
    per_doc_chunks = {}
    for d, t in texts:
        if not t:
            continue
        cuts = [
            i
            for i in range(W, len(t))
            if sum(ord(t[i - 1 - j]) * pow(B, j, M) for j in range(W)) % M % D == 0
        ]
        bounds = [0] + cuts + [len(t)]
        per_doc_chunks[d] = [
            t[bounds[k] : bounds[k + 1]] for k in range(len(bounds) - 1)
        ]
    owners = {}
    for d, cs in per_doc_chunks.items():
        for c in cs:
            owners.setdefault(c, set()).add(d)
    out = {}
    for d, cs in per_doc_chunks.items():
        shared = [c for c in cs if len(owners[c]) >= 2]
        out[d] = (len(cs), len(shared), sum(len(c) for c in shared))
    return out


@pytest.mark.parametrize("seed", [5, 6])
def test_cdc_python_parity(spark, seed):
    rng = random.Random(seed)
    alpha = "abcdefgh "
    texts = [
        (d, "".join(rng.choice(alpha) for _ in range(rng.randint(0, 300))))
        for d in range(20)
    ]
    texts.append((20, texts[4][1]))  # one exact duplicate
    df = spark.createDataFrame(texts, "doc_id LONG, text STRING").repartition(5)
    got = {
        r.doc_id: (r.n_chunks, r.n_shared, r.shared_chars)
        for r in cdc_chunk_stats(df).collect()
    }
    assert got == _py_cdc(texts)


def test_cdc_resynchronizes_after_prefix_edit(spark):
    """A 1-char prefix insertion shifts EVERY fixed-size block but only
    the first few CDC chunks: boundaries re-lock once the rolling
    window clears the edit, so most chunk content stays shared."""
    rng = random.Random(17)
    base_text = "".join(rng.choice("abcdefgh ") for _ in range(4000))
    texts = [(0, base_text), (1, "x" + base_text)]
    df = spark.createDataFrame(texts, "doc_id LONG, text STRING")
    got = {
        r.doc_id: (r.n_chunks, r.n_shared, r.shared_chars)
        for r in cdc_chunk_stats(df).collect()
    }
    n0, s0, sc0 = got[0]
    assert n0 > 20  # enough chunks for the property to be meaningful
    # all but the chunk(s) touching the edit are shared
    assert s0 >= n0 - 2
    assert sc0 >= len(base_text) - 2 * D * 4


def test_cdc_empty_and_null_docs_dropped(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, None), (2, "hello world once upon a time")],
        "doc_id LONG, text STRING",
    )
    rows = {r.doc_id for r in cdc_chunk_stats(df).collect()}
    assert rows == {2}
