"""Skew-bound guarantees for the salted per-host budget window
(north_rule: a few mega-domains must not create straggler partitions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_crawler_spark.operators.politeness import (
    host_budget_filter,
    salted_prefilter,
)


def _mega_candidates(spark, n_mega=20000, n_small=50):
    """One mega-host with n_mega URLs + 10 small hosts."""
    mega = spark.range(n_mega).select(
        F.concat(F.lit("https://mega.com/p/"), F.col("id")).alias("url"),
        F.lit("mega.com").alias("host"),
    )
    small = spark.range(10 * n_small).select(
        F.concat(
            F.lit("https://s"), (F.col("id") % 10).cast("string"),
            F.lit(".com/p/"), F.col("id"),
        ).alias("url"),
        F.concat(F.lit("s"), (F.col("id") % 10).cast("string"), F.lit(".com")).alias("host"),
    )
    return mega.unionByName(small)


def test_prefilter_caps_rows_per_host(spark):
    cand = _mega_candidates(spark)
    budget, salts = 10, 16
    pre = salted_prefilter(cand, budget, salt_buckets=salts)
    per_host = {r["host"]: r["n"] for r in pre.groupBy("host").agg(F.count("*").alias("n")).collect()}
    # mega host: 20k candidates → at most salt_buckets × budget survive
    assert per_host["mega.com"] <= salts * budget
    # small hosts keep everything under budget
    assert all(v <= salts * budget for v in per_host.values())


def test_budget_result_identical_with_and_without_salting(spark):
    """The salted two-phase window must be a pure optimization: same
    result as a single exact window."""
    from pyspark.sql import Window

    cand = _mega_candidates(spark, n_mega=5000)
    budget = 7
    got = {
        (r["url"], r["host_budget_rank"])
        for r in host_budget_filter(cand, None, budget, salt_buckets=16).collect()
    }
    w = Window.partitionBy("host").orderBy("url")
    want = {
        (r["url"], r["rn"])
        for r in cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= budget)
        .collect()
    }
    assert got == want


def test_budget_with_prior_counts(spark):
    cand = _mega_candidates(spark, n_mega=100)
    prior = spark.createDataFrame(
        [("mega.com", 95), ("s0.com", 1)], ["host", "n_scheduled"]
    )
    out = host_budget_filter(cand, prior, 100)
    per_host = {
        r["host"]: r["n"]
        for r in out.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert per_host["mega.com"] == 5          # 100 - 95
    assert per_host["s0.com"] == 50           # all 50 fit (1 + 50 <= 100)


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """IVF probe must recover most of the exact top-10 while scanning only
    a fraction of the lists."""
    from distributed_crawler_spark.operators.similarity import (
        brute_force_topk,
        ivf_index,
        ivf_search,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    others = emb.filter(F.col("vec_id") != 0)

    exact = {r["vec_id"] for r in brute_force_topk(others, qvec, k=10).collect()}
    assigned, centroids = ivf_index(others, n_centroids=8, seed=42)

    # probing ALL lists must reproduce brute force exactly
    full = {
        r["vec_id"]
        for r in ivf_search(others, assigned, centroids, qvec, n_probe=8, k=10).collect()
    }
    assert full == exact

    # partial probe: recall is data-dependent (synthetic embeddings are
    # near-uniform, the worst case for IVF) — sanity-bound it and assert
    # monotonicity in n_probe
    r3 = {
        r["vec_id"]
        for r in ivf_search(others, assigned, centroids, qvec, n_probe=3, k=10).collect()
    }
    r5 = {
        r["vec_id"]
        for r in ivf_search(others, assigned, centroids, qvec, n_probe=5, k=10).collect()
    }
    recall3 = len(exact & r3) / len(exact)
    recall5 = len(exact & r5) / len(exact)
    assert recall3 >= 0.3, f"IVF recall@3 too low: {recall3}"
    assert recall5 >= recall3


def test_knn_join_matches_brute_force_per_query(spark, sf_dir):
    from distributed_crawler_spark.operators.similarity import (
        brute_force_topk,
        knn_join_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    out = knn_join_topk(queries, emb, k=5)
    grouped = {}
    for r in out.collect():
        grouped.setdefault(r["q_id"], []).append((r["rank"], r["v_id"], r["score"]))
    for qid, rows in grouped.items():
        qvec = [float(x) for x in emb.filter(F.col("vec_id") == qid).head()["embedding"]]
        want = [
            (i + 1, r["vec_id"], r["score"])
            for i, r in enumerate(
                brute_force_topk(emb.filter(F.col("vec_id") != qid), qvec, k=5).collect()
            )
        ]
        assert sorted(rows) == want, qid


def test_lsh_neardup_pairs_subset_of_exact(spark, sf_dir):
    from distributed_crawler_spark.operators.similarity import (
        embedding_neardup_pairs,
        lsh_neardup_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(emb, threshold=0.8, max_id=200).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in lsh_neardup_pairs(emb, threshold=0.8, planes=4).collect()
    }
    # every LSH-found pair is exactly re-ranked → must be a true pair
    assert lsh <= exact

    # multi-table union: still a subset of exact (each candidate is
    # re-ranked), recall monotone in n_tables, and auto-sized planes
    # from plan_srp_lsh stay within the documented clamp
    from distributed_crawler_spark.operators.similarity import plan_srp_lsh

    assert plan_srp_lsh(200) == 4  # ceil(log2(200/16)) = 4
    assert plan_srp_lsh(10**10) == 30
    assert plan_srp_lsh(2) == 1 and plan_srp_lsh(2**70) == 62
    mt1 = {
        (r["id_a"], r["id_b"])
        for r in lsh_neardup_pairs(emb, threshold=0.8, planes=4, n_tables=1).collect()
    }
    mt3 = {
        (r["id_a"], r["id_b"])
        for r in lsh_neardup_pairs(emb, threshold=0.8, planes=4, n_tables=3).collect()
    }
    assert mt1 == lsh          # table 0 keeps the legacy seeds exactly
    assert mt1 <= mt3 <= exact # more tables → recall grows, never false pairs


def test_ivf_bucketed_index_prunes_partitions(spark, sf_dir):
    """The centroid-partitioned IVF index: probing n_probe lists reads
    ONLY those partitions (PartitionFilters on centroid in the scan) and
    returns the same top-k as the in-memory ivf_search."""
    import shutil

    from distributed_crawler_spark.operators.similarity import (
        ivf_index,
        ivf_search,
        ivf_search_pruned,
        ivf_write_bucketed,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    others = emb.filter(F.col("vec_id") != 0)
    assigned, centroids = ivf_index(others, n_centroids=8, seed=42)

    idx_dir = "/tmp/dcs_ivf_index"
    shutil.rmtree(idx_dir, ignore_errors=True)
    ivf_write_bucketed(others, assigned, idx_dir)

    pruned = ivf_search_pruned(
        spark, idx_dir, centroids, qvec, n_probe=3, k=10
    )
    want = [
        (r["vec_id"], r["score"])
        for r in ivf_search(others, assigned, centroids, qvec, n_probe=3, k=10).collect()
    ]
    got = [(r["vec_id"], r["score"]) for r in pruned.collect()]
    assert got == want

    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid" in plan
    # the non-probed lists' directories are never touched
    import os

    n_dirs = len([d for d in os.listdir(idx_dir) if d.startswith("centroid=")])
    assert n_dirs == 8  # all lists exist on disk; the scan reads only 3


def test_host_budget_filter_order_cols(spark):
    """order_cols generalization: [url] ≡ the order_col default (same
    rows AND ranks), and a priority order keeps the per-host TOP-budget
    by score — the salted two-phase bound must hold for any total
    order."""
    from distributed_crawler_spark.operators.politeness import host_budget_filter

    rows = [
        (f"https://h{h}.t/p/{i:03d}", f"h{h}.t", (i * 37 + h * 11) % 100)
        for h in range(3)
        for i in range(40)
    ]
    cand = spark.createDataFrame(rows, "url STRING, host STRING, score LONG")

    base = host_budget_filter(cand, None, 5)
    gen = host_budget_filter(cand, None, 5, order_cols=[F.col("url")])
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, gen.collect()))

    pri = host_budget_filter(
        cand, None, 5, order_cols=[F.col("score").desc(), F.col("url")]
    ).collect()
    got = {}
    for r in pri:
        got.setdefault(r["host"], []).append((r["score"], r["url"], r["host_budget_rank"]))
    for h in ("h0.t", "h1.t", "h2.t"):
        per_host = sorted(((-s, u) for (u2, h2, s) in rows if h2 == h for s, u in [(s, u2)]))
        want = [(-ns, u) for ns, u in per_host[:5]]
        have = sorted(((s, u) for s, u, _ in got[h]), key=lambda x: (-x[0], x[1]))
        assert [(s, u) for s, u in have] == want
        # ranks are 1..5 following the priority order
        assert sorted(r for _, _, r in got[h]) == [1, 2, 3, 4, 5]
