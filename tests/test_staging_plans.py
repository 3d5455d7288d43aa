"""Physical-plan guards for the r07-staged operators: the scale claims
their docstrings make must be visible in the executed plan."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_script_profile_is_pure_map(spark):
    """script_profile claims zero shuffles and no Python: the plan must
    contain no Exchange and no *EvalPython at all."""
    from distributed_crawler_spark.operators.textstats import script_profile

    docs = spark.createDataFrame(
        [(1, "abc αε"), (2, "xyz")], "doc_id LONG, text STRING"
    )
    plan = _plan(script_profile(docs))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_trustrank_broadcasts_seeds(spark):
    """The seed set joins by broadcast (seed sets are tiny by
    definition) — never a sort-merge join against the node list."""
    from distributed_crawler_spark.operators.graph import trustrank_int

    nodes = spark.range(100).select(F.col("id").alias("node"))
    edges = spark.range(100).select(
        F.col("id").alias("src"), ((F.col("id") * 3 + 1) % 100).alias("dst")
    )
    seeds = spark.range(5).select(F.col("id").alias("node"))
    plan = _plan(trustrank_int(nodes, edges, seeds, iters=1))
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_cdc_chunks_no_python_no_cartesian(spark):
    """CDC chunking is JVM-native end to end: no Python evaluation, no
    cartesian product; the dedup stat shuffles on the chunk key."""
    from distributed_crawler_spark.operators.dedup import cdc_chunk_stats

    docs = spark.createDataFrame(
        [(1, "hello world the quick brown fox"), (2, "hello world again")],
        "doc_id LONG, text STRING",
    )
    plan = _plan(cdc_chunk_stats(docs))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Exchange hashpartitioning(chunk#" in plan


def test_lcp_edges_no_python_no_cartesian(spark):
    """The LCP compare is zip_with + array_position (JVM higher-order
    functions), never a UDF; adjacency is an equi-join on sa_rank."""
    from distributed_crawler_spark.operators.suffix import lcp_edges

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "b c d e")], "doc_id LONG, text STRING"
    )
    plan = _plan(lcp_edges(docs))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_global_dense_rank_single_range_shuffle(spark):
    """global_dense_rank's whole point: ONE range exchange on the key,
    no hash exchange of the data, no join back against a distinct-key
    table (the broadcast offset join is the only join)."""
    from distributed_crawler_spark.operators.suffix import global_dense_rank

    df = spark.range(1000).select(
        (F.col("id") % 37).alias("a"), (F.col("id") % 11).alias("b")
    )
    ranked, n = global_dense_rank(df, ["a", "b"], "rk", partitions=8)
    assert n == ranked.select("a", "b").distinct().count()
    plan = _plan(ranked)
    # post-checkpoint plan: scan of the checkpointed RDD + broadcast join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan
