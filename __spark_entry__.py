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
from distributed_crawler_spark.session import _ship_package  # noqa: E402


def _prepared(spark: SparkSession) -> SparkSession:
    # the caller owns the session; our Arrow UDF closures import this
    # package inside executor Python workers, so ship it (idempotent —
    # the local equivalent of spark-submit --py-files)
    _ship_package(spark)
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: 3-round BFS frontier
    scheduling (depth gate → URL-seen anti-join → robots broadcast join →
    salted host-budget window) over the arithmetic corpus model."""
    return registry.QUERIES["crawl_bfs"](_prepared(spark), "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_prepared(spark), sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
