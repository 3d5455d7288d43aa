"""graph.related_hosts: python-reference parity on a seeded random host
multigraph (cap semantics, tie-breaks, self-loop exclusion); staged
oracle parity runs in the staged sweep."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from distributed_crawler_spark.operators.graph import related_hosts


def _py_related(edges, topk, max_out):
    w = Counter((s, d) for s, d in edges if s != d)
    by_src: dict = {}
    for (s, d), c in w.items():
        by_src.setdefault(s, []).append((d, c))
    capped = []
    for s, lst in by_src.items():
        lst.sort(key=lambda t: (-t[1], t[0]))
        capped += [(s, d) for d, _ in lst[:max_out]]
    by_src2: dict = {}
    for s, d in capped:
        by_src2.setdefault(s, []).append(d)
    co = Counter()
    for s, ds in by_src2.items():
        for a in ds:
            for b in ds:
                if a != b:
                    co[(a, b)] += 1
    out = []
    by_a: dict = {}
    for (a, b), c in co.items():
        by_a.setdefault(a, []).append((b, c))
    for a, lst in by_a.items():
        lst.sort(key=lambda t: (-t[1], t[0]))
        out += [
            (a, b, c, i + 1) for i, (b, c) in enumerate(lst[:topk])
        ]
    return sorted(out)


@pytest.mark.parametrize("seed", [21, 22])
def test_related_hosts_python_parity(spark, seed):
    rng = random.Random(seed)
    hosts = [f"h{i}" for i in range(15)]
    edges = [
        (rng.choice(hosts), rng.choice(hosts)) for _ in range(600)
    ]
    df = spark.createDataFrame(
        edges, "src_host STRING, dst_host STRING"
    ).repartition(7)
    got = sorted(
        (r.host, r.related, r.cocitations, r.rank)
        for r in related_hosts(df, topk=3, max_out=4).collect()
    )
    assert got == _py_related(edges, topk=3, max_out=4)


def test_cocited_but_never_linked_pair_is_found(spark):
    """The point of co-citation: a and b never link each other, but 3
    sources link both -> strongly related."""
    edges = []
    for s in ("s1", "s2", "s3"):
        edges += [(s, "a"), (s, "b")]
    edges += [("s4", "c")]
    df = spark.createDataFrame(edges, "src_host STRING, dst_host STRING")
    got = {(r.host, r.related): r.cocitations for r in related_hosts(df).collect()}
    assert got[("a", "b")] == 3 and got[("b", "a")] == 3
    assert ("c", "a") not in got
