"""hits_int and snapshot_delta: Python-reference parity and edge cases
the registry oracles don't isolate (dangling nodes, partition-layout
invariance, null-side join handling)."""

from __future__ import annotations

from distributed_crawler_spark.operators.frontier import snapshot_delta
from distributed_crawler_spark.operators.graph import hits_int
from pyspark.sql import functions as F

SCALE = 1_000_000


def _hits_python(nodes, edges, iters=3, scale=SCALE):
    hub = {v: scale for v in nodes}
    auth = {}
    ns = len(nodes) * scale

    def norm(raw):
        tot = sum(raw.values())
        return {v: (raw.get(v, 0) * ns) // tot for v in nodes}

    for _ in range(iters):
        a_raw = {}
        for s, d in edges:
            a_raw[d] = a_raw.get(d, 0) + hub[s]
        auth = norm(a_raw)
        h_raw = {}
        for s, d in edges:
            h_raw[s] = h_raw.get(s, 0) + auth[d]
        hub = norm(h_raw)
    return hub, auth


def test_hits_int_matches_python_reference(spark):
    """Graph with a clear hub (0 links everywhere), a clear authority
    (everything links 9), a dangling node (5: no in/out links beyond the
    hub's), and a 2-cycle — bit-exact score equality."""
    nodes = list(range(10))
    edges = (
        [(0, d) for d in range(1, 10)]
        + [(s, 9) for s in range(1, 9)]
        + [(3, 4), (4, 3)]
    )
    exp_hub, exp_auth = _hits_python(nodes, edges)
    ndf = spark.createDataFrame([(v,) for v in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    for n_parts in (1, 7):
        got = {
            r.node: (r.hub, r.authority)
            for r in hits_int(ndf.repartition(n_parts), edf.repartition(n_parts)).collect()
        }
        assert set(got) == set(nodes)
        for v in nodes:
            assert got[v] == (exp_hub[v], exp_auth[v]), (n_parts, v)
    # sanity on the shape: 0 is the top hub, 9 the top authority
    assert max(exp_hub, key=exp_hub.get) == 0
    assert max(exp_auth, key=exp_auth.get) == 9


def test_snapshot_delta_statuses(spark):
    old = spark.createDataFrame(
        [("u1", 11), ("u2", 22), ("u3", 33)], "url string, fp long"
    )
    new = spark.createDataFrame(
        [("u1", 11), ("u2", 99), ("u4", 44)], "url string, fp long"
    )
    got = {r.url: r.status for r in snapshot_delta(old, new).collect()}
    assert got == {"u1": "same", "u2": "changed", "u3": "removed", "u4": "added"}


def test_snapshot_delta_shuffles_fingerprints_not_bodies(spark):
    """The operator contract: callers pass (key, fingerprint); the plan
    must not reference any text column (bodies never enter the join)."""
    docs = spark.createDataFrame(
        [("u1", "body one"), ("u2", "body two")], "url string, text string"
    )
    fp = F.xxhash64("text").alias("fp")
    out = snapshot_delta(docs.select("url", fp), docs.select("url", fp))
    plan = out._jdf.queryExecution().executedPlan().toString()
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert exchanges, plan  # the join does shuffle (on the key)
    for ln in exchanges:
        assert "text" not in ln, ln
