"""replicate_sf_dir (the second bench scale point's corpus generator):
the k-fold replica must scale per-query OUTPUT semantics linearly —
lexically disjoint document replicas, rotated embeddings, per-domain key
offsets that preserve FK join selectivity."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F


def test_replicate_sf_dir_invariants(spark, sf_dir):
    from distributed_crawler_spark.corpus import replicate_sf_dir

    out = "/tmp/dcs_rep_test"
    shutil.rmtree(out, ignore_errors=True)
    k = 3
    replicate_sf_dir(spark, sf_dir, out, k=k)

    base_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = spark.read.parquet(f"{out}/documents.parquet")
    n = base_docs.count()
    assert docs.count() == k * n
    # contiguous ids (the arithmetic crawl model derives hosts/links from
    # doc_id, so the replica extends the same web)
    assert docs.agg(F.min("doc_id"), F.max("doc_id")).first() == (0, k * n - 1)

    # replicas are LEXICALLY DISJOINT: a near-dup operator sees only
    # within-replica pairs (k x base), never k^2 cross-replica pairs
    vocab = (
        docs.withColumn("rep", (F.col("doc_id") / n).cast("int"))
        .select("rep", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.countDistinct("rep").alias("n_reps"))
    )
    assert vocab.filter(F.col("n_reps") > 1).count() == 0
    # and dedup output really is linear: exact-dup groups scale by k
    from distributed_crawler_spark.operators.dedup import exact_duplicates

    assert exact_duplicates(docs).count() == k * exact_duplicates(base_docs).count()

    # embeddings: rotated replicas — cross-replica copies of one vector
    # are different vectors (a verbatim copy would make every replica a
    # mutual nearest neighbor and blow up near-dup outputs k^2)
    emb = spark.read.parquet(f"{out}/embeddings.parquet")
    n_vec = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert emb.count() == k * n_vec
    v0, v1 = (
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin(0, n_vec)).orderBy("vec_id").collect()
    )
    assert v0 != v1
    assert sorted(v0) == sorted(v1)  # rotation: same multiset

    # FK joins keep base selectivity: orders x customer matches scale by
    # exactly k (per-domain key offsets line up within a replica and
    # never across replicas)
    def joined_count(d):
        o = spark.read.parquet(f"{d}/orders.parquet")
        c = spark.read.parquet(f"{d}/customer.parquet")
        return o.join(c, o.o_custkey == c.c_custkey).count()

    assert joined_count(out) == k * joined_count(sf_dir)

    # dims stay single-copy (fixed-size broadcast sides)
    for name in ("nation", "region"):
        assert (
            spark.read.parquet(f"{out}/{name}.parquet").count()
            == spark.read.parquet(f"{sf_dir}/{name}.parquet").count()
        )
