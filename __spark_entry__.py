"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship crawl-BFS frontier query at sf0.001;
``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 plus the training-data-pipeline operators, each with a
DuckDB-runnable oracle (see distributed_crawler_spark/plans/registry.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from distributed_crawler_spark.plans import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: 3-round BFS frontier
    scheduling (depth gate → URL-seen anti-join → robots broadcast join →
    salted host-budget window) over the arithmetic corpus model."""
    return registry.QUERIES["crawl_bfs"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
