"""TrustRank (graph.trustrank_int): python-reference parity on seeded
random graphs, spam-farm isolation, and the all-seeds == PageRank
reduction.  Oracle parity for the staged query runs in
tests/test_suffix.py::test_staged_queries_against_oracles."""

from __future__ import annotations

import random

import pytest

from distributed_crawler_spark.operators.graph import pagerank_int, trustrank_int

SCALE, NUM, DEN = 1_000_000, 85, 100


def _py_trustrank(n, edges, seeds, iters=5):
    base = (SCALE * (DEN - NUM)) // DEN
    od = {}
    for s, _ in edges:
        od[s] = od.get(s, 0) + 1
    score = {v: (SCALE if v in seeds else 0) for v in range(n)}
    for _ in range(iters):
        inc = {}
        for s, d in edges:
            inc[d] = inc.get(d, 0) + score[s] // od[s]
        score = {
            v: (base if v in seeds else 0) + (NUM * inc.get(v, 0)) // DEN
            for v in range(n)
        }
    return score


@pytest.mark.parametrize("seed", [3, 11])
def test_trustrank_python_parity(spark, seed):
    rng = random.Random(seed)
    n = 40
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(150)})
    seeds = {v for v in range(n) if v % 7 == 0}
    nodes = spark.createDataFrame([(v,) for v in range(n)], "node LONG")
    e = spark.createDataFrame(edges, "src LONG, dst LONG").repartition(5)
    sd = spark.createDataFrame([(v,) for v in sorted(seeds)], "node LONG")
    got = {r.node: r.score for r in trustrank_int(nodes, e, sd).collect()}
    want = _py_trustrank(n, edges, seeds)
    assert got == want


def test_spam_farm_scores_zero(spark):
    """A clique disconnected from the seed set accumulates NO trust —
    the property TrustRank exists for (PageRank gives it plenty)."""
    # nodes 0-4: trusted chain; nodes 5-8: dense spam clique, no inlink
    # from the trusted side
    edges = [(i, i + 1) for i in range(4)] + [
        (a, b) for a in range(5, 9) for b in range(5, 9) if a != b
    ]
    nodes = spark.createDataFrame([(v,) for v in range(9)], "node LONG")
    e = spark.createDataFrame(edges, "src LONG, dst LONG")
    sd = spark.createDataFrame([(0,)], "node LONG")
    tr = {r.node: r.score for r in trustrank_int(nodes, e, sd).collect()}
    pr = {r.node: r.score for r in pagerank_int(nodes, e).collect()}
    assert all(tr[v] == 0 for v in range(5, 9))
    assert all(pr[v] > 0 for v in range(5, 9))  # PageRank can't tell
    assert tr[1] > 0 and tr[4] > 0  # trust flows down the chain


def test_all_seeds_reduces_to_pagerank(spark):
    rng = random.Random(99)
    n = 25
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(80)})
    nodes = spark.createDataFrame([(v,) for v in range(n)], "node LONG")
    e = spark.createDataFrame(edges, "src LONG, dst LONG")
    tr = {
        r.node: r.score for r in trustrank_int(nodes, e, nodes).collect()
    }
    pr = {r.node: r.score for r in pagerank_int(nodes, e).collect()}
    assert tr == pr
