"""Crawl BFS over the arithmetic corpus model — the oracle-checkable twin
of the HTML-corpus scheduler (operators/scheduler.py).

Same gate order as the reference's _enqueue_url (master_node.py:315-448):
depth → seen-dedup → robots → host budget (consumed in canonical url-asc
order); the "fetch" is the links equi-join. The DuckDB oracle is the same
BFS unrolled into per-round CTEs by ``bfs_sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..corpus import (
    model_links_df,
    model_pages_df,
    model_robots_df,
    model_seeds_df,
    model_sql_ctes,
)
from ..operators.politeness import host_budget_filter, robots_filter


def model_bfs(
    spark: SparkSession,
    sf_dir: str,
    max_depth: int = 2,
    budget: int = 100,
) -> DataFrame:
    """Scheduled set (url, host, depth) of a BFS crawl over the arithmetic
    link graph."""
    pages = model_pages_df(spark, sf_dir).select("url", "host").cache()
    # the link graph is re-joined every round — cache it once
    links = model_links_df(spark, sf_dir).select("src_url", "dst_url").cache()
    robots = model_robots_df(spark, sf_dir)
    seeds = model_seeds_df(spark, sf_dir)

    cand0 = seeds.join(pages, "url").select(
        "url", "host", F.lit(0).alias("depth")
    )
    cur = (
        host_budget_filter(robots_filter(cand0, robots), None, budget)
        .select("url", "host", "depth")
    )
    scheduled = cur.cache()
    for rnd in range(1, max_depth + 1):
        cand = (
            links.join(cur.select(F.col("url").alias("src_url")), "src_url")
            .select(F.col("dst_url").alias("url"))
            .distinct()
            .join(pages, "url")
            .withColumn("depth", F.lit(rnd))
        )
        fresh = cand.join(scheduled.select("url"), "url", "left_anti")
        fresh = robots_filter(fresh, robots)
        prior = scheduled.groupBy("host").agg(F.count("*").alias("n_scheduled"))
        cur = host_budget_filter(fresh, prior, budget).select(
            "url", "host", "depth"
        )
        scheduled = scheduled.unionByName(cur).cache()
    return scheduled


def bfs_sql(max_depth: int = 2, budget: int = 100) -> str:
    """The identical BFS as DuckDB SQL (rounds unrolled into CTEs)."""
    ctes = [model_sql_ctes().strip().rstrip(",")]
    ctes.append(
        f"""
sched0 AS (
  SELECT c.url, c.host, 0 AS depth FROM (
    SELECT p.url, p.host,
           row_number() OVER (PARTITION BY p.host ORDER BY p.url) AS rn
    FROM seeds s JOIN pages p USING (url)
    WHERE NOT EXISTS (SELECT 1 FROM robots r
                      WHERE r.host = p.host AND starts_with(p.path, r.path_prefix))
  ) c WHERE c.rn <= {budget}
),
seen0 AS (SELECT url, host, depth FROM sched0)"""
    )
    for rnd in range(1, max_depth + 1):
        prev, seen_prev = f"sched{rnd-1}", f"seen{rnd-1}"
        ctes.append(
            f"""
cand{rnd} AS (SELECT DISTINCT l.dst_url AS url
              FROM links l JOIN {prev} s ON l.src_url = s.url),
fresh{rnd} AS (
  SELECT p.url, p.host,
         row_number() OVER (PARTITION BY p.host ORDER BY p.url) AS rn
  FROM cand{rnd} c JOIN pages p ON p.url = c.url
  WHERE NOT EXISTS (SELECT 1 FROM {seen_prev} x WHERE x.url = c.url)
    AND NOT EXISTS (SELECT 1 FROM robots r
                    WHERE r.host = p.host AND starts_with(p.path, r.path_prefix))
),
prior{rnd} AS (SELECT host, count(*) AS n FROM {seen_prev} GROUP BY host),
sched{rnd} AS (
  SELECT f.url, f.host, {rnd} AS depth
  FROM fresh{rnd} f LEFT JOIN prior{rnd} pr ON pr.host = f.host
  WHERE f.rn + coalesce(pr.n, 0) <= {budget}
),
seen{rnd} AS (SELECT * FROM {seen_prev} UNION ALL SELECT * FROM sched{rnd})"""
        )
    body = ",".join(ctes)
    return f"WITH {body}\nSELECT url, host, depth FROM seen{max_depth}"
