"""Deterministic Lloyd's k-means (operators/similarity.py:kmeans_lloyd):
the SQL-unrollable quantizer behind ann_ivf_topk_kmeans. The DuckDB
iteration-replay parity is hash-checked by tests/test_queries_oracle.py;
these bound the clustering's behavior itself."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_crawler_spark.operators.similarity import (
    brute_force_topk,
    ivf_search,
    kmeans_lloyd,
)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_full_probe_equals_brute_force(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    others = emb.filter(F.col("vec_id") != 0)
    assigned, cents = kmeans_lloyd(others, k=8, iters=3, seed=42)
    full = ivf_search(others, assigned, cents, qvec, n_probe=8, k=10).collect()
    brute = brute_force_topk(others, qvec, k=10).collect()
    assert full == brute


def test_deterministic_across_partitionings(spark, sf_dir):
    emb = _emb(spark, sf_dir).filter(F.col("vec_id") != 0)
    a_assigned, a_cents = kmeans_lloyd(emb.repartition(32), k=8, iters=3, seed=42)
    b_assigned, b_cents = kmeans_lloyd(emb.coalesce(1), k=8, iters=3, seed=42)
    assert a_cents == b_cents
    assert sorted(map(tuple, a_assigned.collect())) == sorted(
        map(tuple, b_assigned.collect())
    )


def test_assignment_is_total_and_improves(spark, sf_dir):
    emb = _emb(spark, sf_dir).filter(F.col("vec_id") != 0)
    n = emb.count()
    assigned, cents = kmeans_lloyd(emb, k=8, iters=5, seed=42)
    rows = assigned.collect()
    assert len(rows) == n
    assert {r["centroid"] for r in rows} <= set(range(8))
    assert len(cents) == 8 and all(len(c) == 64 for c in cents)


def test_empty_clusters_carry_previous_centroid(spark):
    # 4 identical points, k=3: after one assignment every point lands on
    # one centroid; the other two must survive as their init vectors
    df = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(4)],
        "vec_id int, embedding array<float>",
    )
    assigned, cents = kmeans_lloyd(df, k=3, iters=2, seed=7)
    assert assigned.count() == 4
    assert len(cents) == 3
    assert all(len(c) == 4 for c in cents)
