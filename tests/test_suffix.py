"""Generalized suffix array (prefix doubling) + exact substring dedup:
python-reference parity on seeded random corpora with planted
duplicates, plus the staged-query preconditions."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from distributed_crawler_spark.operators.suffix import (
    exact_substr_dups,
    global_dense_rank,
    global_row_number,
    lcp_edges,
    prefix_sum,
    remove_exact_spans,
    suffix_array,
)

VOCAB = ["ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen"]


def _mk_corpus(seed: int, n_docs: int, with_dups: bool = True):
    """Seeded word-salad docs; optionally plant a shared 10-token span
    into several docs (cross-doc) and a repeated span within one doc
    (self-repetition — must NOT count as cross-doc duplication)."""
    rng = random.Random(seed)
    docs = []
    span = [rng.choice(VOCAB) for _ in range(10)]
    for d in range(n_docs):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(5, 40))]
        if with_dups and d % 3 == 0:
            at = rng.randint(0, len(words))
            words[at:at] = span
        docs.append((d, " ".join(words)))
    # one doc with ONLY self-repetition of a unique span
    selfspan = ["zz%d" % i for i in range(9)]
    docs.append((n_docs, " ".join(selfspan + ["mid"] + selfspan)))
    return docs


def _py_suffix_array(docs):
    """Direct O(n^2 log n) reference: sort token-tuple suffixes."""
    sufs = []
    for d, text in docs:
        toks = text.split(" ")
        for p in range(1, len(toks) + 1):
            sufs.append((tuple(toks[p - 1 :]), d, p))
    sufs.sort()
    return [(d, p, i + 1) for i, (_, d, p) in enumerate(sufs)]


def _py_exact_dups(docs, min_len=8):
    """Independent reference for exact_substr_dups: direct suffix sort,
    adjacent LCP, run segmentation, cross-doc gate."""
    sa = []
    for d, text in docs:
        toks = text.split(" ")
        for p in range(1, len(toks) + 1):
            sa.append((tuple(toks[p - 1 :]), d, p))
    sa.sort()
    lcp = []
    for i in range(len(sa) - 1):
        a, b = sa[i][0], sa[i + 1][0]
        m = min(len(a), len(b))
        j = 0
        while j < m and a[j] == b[j]:
            j += 1
        lcp.append(j)
    members = {}  # rank(0-based) -> dup_len
    for i, v in enumerate(lcp):
        if v >= min_len:
            members[i] = max(members.get(i, 0), v)
            members[i + 1] = max(members.get(i + 1, 0), v)
    out = {}
    ranks = sorted(members)
    island = []
    islands = []
    for r in ranks:
        if island and r == island[-1] + 1 and lcp[r - 1] >= min_len:
            island.append(r)
        else:
            if island:
                islands.append(island)
            island = [r]
    if island:
        islands.append(island)
    for isl in islands:
        docs_in = {sa[r][1] for r in isl}
        if len(docs_in) < 2:
            continue
        for r in isl:
            d = sa[r][1]
            cnt, mx = out.get(d, (0, 0))
            out[d] = (cnt + 1, max(mx, members[r]))
    return sorted((d, c, m) for d, (c, m) in out.items())


def _py_member_spans(docs, min_len=8):
    """(doc, pos, dup_len) members of cross-doc islands — the shared
    middle of the dups report and the removal action."""
    sa = []
    for d, text in docs:
        toks = text.split(" ")
        for p in range(1, len(toks) + 1):
            sa.append((tuple(toks[p - 1 :]), d, p))
    sa.sort()
    lcp = []
    for i in range(len(sa) - 1):
        a, b = sa[i][0], sa[i + 1][0]
        m = min(len(a), len(b))
        j = 0
        while j < m and a[j] == b[j]:
            j += 1
        lcp.append(j)
    members = {}
    for i, v in enumerate(lcp):
        if v >= min_len:
            members[i] = max(members.get(i, 0), v)
            members[i + 1] = max(members.get(i + 1, 0), v)
    spans = []
    ranks = sorted(members)
    island = []
    islands = []
    for r in ranks:
        if island and r == island[-1] + 1 and lcp[r - 1] >= min_len:
            island.append(r)
        else:
            if island:
                islands.append(island)
            island = [r]
    if island:
        islands.append(island)
    for isl in islands:
        if len({sa[r][1] for r in isl}) < 2:
            continue
        spans += [(sa[r][1], sa[r][2], members[r]) for r in isl]
    return spans


def _py_removal(docs, min_len=8):
    spans = _py_member_spans(docs, min_len)
    cov = {}
    for d, pos, ln in spans:
        cov.setdefault(d, set()).update(range(pos, pos + ln))
    out = []
    for d, text in docs:
        if not text:
            continue
        toks = text.split(" ")
        covered = cov.get(d, set())
        kept = [t for i, t in enumerate(toks, start=1) if i not in covered]
        out.append((d, len(toks), len(toks) - len(kept), " ".join(kept)))
    return sorted(out)


@pytest.mark.parametrize("seed", [13, 14])
def test_remove_exact_spans_python_parity(spark, seed):
    docs = _mk_corpus(seed, 14)
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING").repartition(6)
    got = sorted(
        (r.doc_id, r.n_tokens, r.n_removed, r.text_dedup)
        for r in remove_exact_spans(df, min_len=8).collect()
    )
    want = _py_removal(docs, min_len=8)
    assert got == want
    # the planted span must actually be gone from every affected doc
    removed = [r for r in got if r[2] > 0]
    assert removed, "no spans removed despite planted duplicates"
    # untouched docs pass through byte-identical
    by_doc = dict((d, t) for d, t in docs)
    for d, n, nr, t in got:
        if nr == 0:
            assert t == by_doc[d]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_suffix_array_python_parity(spark, seed):
    docs = _mk_corpus(seed, 12)
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING").repartition(5)
    got = sorted(
        (r.doc_id, r.pos, r.sa_rank) for r in suffix_array(df).collect()
    )
    want = sorted(_py_suffix_array(docs))
    assert got == want


@pytest.mark.parametrize("seed", [7, 8])
def test_exact_substr_dups_python_parity(spark, seed):
    docs = _mk_corpus(seed, 15)
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING").repartition(7)
    got = sorted(
        (r.doc_id, r.n_dup_starts, r.max_dup_len)
        for r in exact_substr_dups(df, min_len=8).collect()
    )
    want = _py_exact_dups(docs, min_len=8)
    assert got == want
    # the planted cross-doc span must be found, and the self-repetition
    # doc (highest id) must NOT be reported
    assert got, "planted duplicates not detected"
    assert all(d != 15 for d, _, _ in got)


def test_suffix_array_pathological_repetition(spark):
    """Worst case for prefix doubling: near-unary strings (massive rank
    ties that survive many rounds, LCPs ~ doc length) and full-document
    duplicates (ties that NEVER resolve and fall to the (doc,pos)
    tie-break).  Also exercises early-stop never firing before the
    final round."""
    docs = [
        (0, " ".join(["a"] * 30)),
        (1, " ".join(["a"] * 30)),          # exact duplicate of 0
        (2, " ".join(["a"] * 17 + ["b"] + ["a"] * 12)),
        (3, "b " + " ".join(["a"] * 25)),
        (4, "c"),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING").repartition(3)
    got = sorted((r.doc_id, r.pos, r.sa_rank) for r in suffix_array(df).collect())
    want = sorted(_py_suffix_array(docs))
    assert got == want
    dups = sorted(
        (r.doc_id, r.n_dup_starts, r.max_dup_len)
        for r in exact_substr_dups(df, min_len=8).collect()
    )
    want_dups = _py_exact_dups(docs, min_len=8)
    assert dups == want_dups
    # the full-duplicate pair must be reported with a 30-token span
    by_doc = dict((d, (n, m)) for d, n, m in dups)
    assert by_doc[0][1] == 30 and by_doc[1][1] == 30


def test_lcp_edges_match_direct_compare(spark):
    docs = _mk_corpus(42, 10)
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    sa = {(r.doc_id, r.pos): r.sa_rank for r in suffix_array(df).collect()}
    toks = {d: t.split(" ") for d, t in docs}
    by_rank = sorted(((v, k) for k, v in sa.items()))
    edges = {r.sa_rank: r.lcp for r in lcp_edges(df).collect()}
    assert len(edges) == len(by_rank) - 1
    for i in range(len(by_rank) - 1):
        (_, (da, pa)), (_, (db, pb)) = by_rank[i], by_rank[i + 1]
        a, b = toks[da][pa - 1 :], toks[db][pb - 1 :]
        m = min(len(a), len(b))
        j = 0
        while j < m and a[j] == b[j]:
            j += 1
        assert edges[by_rank[i][0]] == j, f"rank {by_rank[i][0]}"


def test_prefix_sum_and_row_number(spark):
    rows = [(i * 3 % 101, i % 7 + 1) for i in range(101)]
    df = spark.createDataFrame(rows, "k LONG, v LONG").repartition(9)
    ps = {
        r.k: r.s
        for r in prefix_sum(df, ["k"], "v", "s", partitions=8).collect()
    }
    acc = 0
    for k, v in sorted(rows):
        acc += v
        assert ps[k] == acc
    rn = {
        r.k: r.rn
        for r in global_row_number(df, ["k"], "rn", partitions=8).collect()
    }
    for i, (k, _) in enumerate(sorted(rows)):
        assert rn[k] == i + 1


@pytest.mark.parametrize("seed,nkeys", [(1, 3), (2, 50)])
def test_global_dense_rank_vs_reference(spark, seed, nkeys):
    """One-shuffle dense rank vs a python reference, with FEW distinct
    keys over MANY partitions so key runs are guaranteed to cross range
    partition boundaries (the double-start correction path)."""
    rng = random.Random(seed)
    rows = [(rng.randrange(nkeys), rng.randrange(nkeys), i) for i in range(500)]
    df = spark.createDataFrame(rows, "a LONG, b LONG, rid LONG").repartition(11)
    ranked, n_distinct = global_dense_rank(df, ["a", "b"], "rk", partitions=8)
    got = {(r.a, r.b, r.rid): r.rk for r in ranked.collect()}
    keys = sorted({(a, b) for a, b, _ in rows})
    want_rank = {k: i + 1 for i, k in enumerate(keys)}
    assert n_distinct == len(keys)
    assert len(got) == len(rows)
    for (a, b, rid), rk in got.items():
        assert rk == want_rank[(a, b)], (a, b, rid)


def test_sa_oracle_string_order_precondition(spark, sf_dir):
    """The staged oracle sorts suffixes as space-joined STRINGS; that
    equals token-wise order only while every token character sorts
    above ' '.  Assert the corpus keeps that contract."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bad = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .filter((F.col("t") == "") | (F.col("t") < " "))
        .count()
    )
    assert bad == 0


def test_staged_queries_against_oracles(spark, sf_dir):
    """Driver-twin comparison (rows, schema, order-insensitive values)
    for every staged r07 query — the same gate registry entries face."""
    import duckdb

    from distributed_crawler_spark.plans import staging_r07

    con = duckdb.connect()
    for t in ["documents", "embeddings", "events", "orders", "lineitem"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    assert staging_r07.QUERIES, "staging module must not be empty"
    # r07 promotion is a move into the registry: names must be free
    from distributed_crawler_spark.plans import registry

    clash = set(staging_r07.QUERIES) & set(registry.QUERIES)
    assert not clash, f"staged names already registered: {clash}"
    # staged entries must ALL carry oracles (that is the point of
    # staging: hash-verifiable on arrival)
    assert set(staging_r07.ORACLES) == set(staging_r07.QUERIES)
    for name, fn in staging_r07.QUERIES.items():
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        cur = con.execute(staging_r07.ORACLES[name])
        dcols = [c[0] for c in cur.description]
        drows = cur.fetchall()
        assert sorted(scols) == sorted(dcols), name
        assert len(srows) == len(drows), name
        # order-insensitive compare on name-sorted columns
        sidx = sorted(range(len(scols)), key=lambda i: scols[i])
        didx = sorted(range(len(dcols)), key=lambda i: dcols[i])
        sset = sorted(tuple(r[i] for i in sidx) for r in srows)
        dset = sorted(tuple(r[i] for i in didx) for r in drows)
        assert sset == dset, f"{name}: value mismatch"
    con.close()
