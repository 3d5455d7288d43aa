"""distributed_crawler_spark — a PySpark-native batch-iterative URL-frontier
crawler/analytics engine.

A brand-new Spark-first rebuild of the *capabilities* of
``Adham-Osama11/distributed_crawler`` (reference, read-only at
``/root/reference/``): the master/worker fetch→parse→extract→enqueue loop
recast as bounded Spark jobs per crawl round over a parquet/Iceberg corpus of
Common-Crawl-style pages, plus the search/ranking and monitoring analytics
the reference serves from DynamoDB scans, plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
plumbing).

Design principles (see SURVEY.md §7):
  * DataFrame / SQL only — no RDDs; Catalyst does pushdown/pruning/join
    selection.
  * Vectorized Arrow pandas UDFs for the only genuinely-Python work
    (HTML parsing, exact urllib-parity URL canonicalization).
  * Explicit partitioning for 10^10-row scale: frontier and page corpus
    bucketed on ``xxhash64(canonical_url)``; per-host budget windows and
    salting for mega-domain skew; AQE as backstop.
  * Iterative driver loop per crawl round with per-partition lineage rows
    for exact checkpoint resume.
"""

__version__ = "0.1.0"
