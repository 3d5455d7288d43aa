"""Redirect-chain resolution (graph.resolve_chains) — pointer-doubling
semantics against a pure-Python chain follower, plus the cap and cycle
edge cases that the arithmetic model cannot plant at small scale."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from distributed_crawler_spark.corpus import (
    REDIR_CYCLE_BWD,
    REDIR_CYCLE_FWD,
    REDIR_CYCLE_MOD,
    REDIR_MAX_HOPS,
    REDIR_STEP_MAX,
    REDIR_STEP_MOD,
    model_redirects_df,
)
from distributed_crawler_spark.operators.graph import resolve_chains

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _py_resolve(redirects: dict[int, int], node: int, max_hops: int):
    """Reference: follow the chain one hop at a time."""
    cur, hops = node, 0
    while cur in redirects:
        if hops >= max_hops:
            return None, None, False
        cur = redirects[cur]
        hops += 1
    return cur, hops, True


def _run(spark, nodes: list[int], redirects: dict[int, int], max_hops: int):
    ndf = spark.createDataFrame([(n,) for n in nodes], "id long")
    rdf = spark.createDataFrame(
        [(s, d) for s, d in redirects.items()], "id long, dst long"
    )
    got = {
        r["id"]: (r["final_id"], r["hops"], r["resolved"])
        for r in resolve_chains(ndf, rdf, max_hops=max_hops).collect()
    }
    assert set(got) == set(nodes)
    return got


def test_model_redirects_match_python_reference(spark):
    """Every doc in the sf corpus resolves exactly as the one-hop-at-a-
    time reference walker says (final id, exact hop count, resolved)."""
    docs = [
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .select("doc_id")
        .collect()
    ]
    redirects = {
        r["src_doc_id"]: r["dst_doc_id"]
        for r in model_redirects_df(spark, SF).collect()
    }
    # the model's redirect rules, re-derived independently
    n = len(docs)
    for d in docs:
        if d % REDIR_CYCLE_MOD == REDIR_CYCLE_FWD:
            assert redirects[d] == (d + 1) % n
        elif d % REDIR_CYCLE_MOD == REDIR_CYCLE_BWD:
            assert redirects[d] == d - 1
        elif 1 <= d % REDIR_STEP_MOD <= REDIR_STEP_MAX:
            assert redirects[d] == d - 1
        else:
            assert d not in redirects

    ndf = spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
        F.col("doc_id").alias("id")
    )
    rdf = model_redirects_df(spark, SF).select(
        F.col("src_doc_id").alias("id"), F.col("dst_doc_id").alias("dst")
    )
    got = {
        r["id"]: (r["final_id"], r["hops"], r["resolved"])
        for r in resolve_chains(ndf, rdf, max_hops=REDIR_MAX_HOPS).collect()
    }
    for d in docs:
        fin, hops, ok = _py_resolve(redirects, d, REDIR_MAX_HOPS)
        assert got[d] == (fin, hops, ok), f"doc {d}"
    # the step family guarantees multi-hop chains exist
    assert any(h is not None and h >= 2 for _, h, _ in got.values())


def test_long_chain_exactly_at_cap_resolves(spark):
    """A chain of length exactly max_hops resolves (hops == cap); one
    hop longer comes back unresolved — the 2^ceil(log2(cap)) doubling
    rounds implement 'follow at most cap hops' exactly for cap a power
    of two."""
    cap = 8
    # chain A: 100 -> 101 -> ... -> 108 (length 8, terminal 108)
    # chain B: 200 -> ... -> 209 (length 9 > cap)
    redirects = {100 + i: 100 + i + 1 for i in range(cap)}
    redirects.update({200 + i: 200 + i + 1 for i in range(cap + 1)})
    nodes = list(range(100, 109)) + list(range(200, 210))
    got = _run(spark, nodes, redirects, cap)
    assert got[100] == (108, cap, True)
    assert got[200] == (None, None, False)
    assert got[201] == (209, cap, True)  # one fewer hop than the cap+1 chain
    assert got[108] == (108, 0, True)


def test_chain_into_cycle_is_unresolved(spark):
    """A chain that enters a 2-cycle never terminates: every node on
    the approach path and in the cycle is unresolved."""
    redirects = {1: 2, 2: 3, 3: 4, 4: 3}
    got = _run(spark, [0, 1, 2, 3, 4], redirects, 32)
    assert got[0] == (0, 0, True)
    for n in (1, 2, 3, 4):
        assert got[n] == (None, None, False)


def test_dangling_target_is_terminal(spark):
    """A redirect target outside the node set is treated as terminal
    (resolved at the dangling id) rather than lost."""
    got = _run(spark, [1, 2], {1: 2, 2: 99}, 32)
    assert got[1] == (99, 2, True)
    assert got[2] == (99, 1, True)


def test_self_loop_is_unresolved(spark):
    got = _run(spark, [5], {5: 5}, 32)
    assert got[5] == (None, None, False)


@pytest.mark.parametrize("seed", [11, 23])
def test_random_functional_graph_parity(spark, seed):
    """Seeded random functional graphs (every node 0..N-1, ~60% are
    redirects to a random node): arbitrary chain/cycle/tree-onto-cycle
    shapes must match the Python walker exactly."""
    import random

    rng = random.Random(seed)
    n = 300
    redirects = {
        i: rng.randrange(n) for i in range(n) if rng.random() < 0.6
    }
    redirects = {s: d for s, d in redirects.items()}
    got = _run(spark, list(range(n)), redirects, 32)
    for i in range(n):
        assert got[i] == _py_resolve(redirects, i, 32), f"node {i}"
