"""Search-analytics capture loop: track → aggregate → suggest (the
reference's track_search / get_search_suggestions pair,
search_interface.py:66-105, 822-846)."""

from __future__ import annotations

import shutil

from distributed_crawler_spark.operators.analytics import (
    analytics_summary,
    query_log,
    track_searches,
)
from distributed_crawler_spark.operators.search import suggest

LOG = "/tmp/dcs_test_search_log"


def test_track_aggregate_suggest_loop(spark):
    shutil.rmtree(LOG, ignore_errors=True)
    # empty log: empty summary, empty suggestions
    empty = query_log(spark, LOG)
    assert analytics_summary(empty).count() == 0

    track_searches(spark, LOG, [("spark join", 12), ("spark window", 0)], now=100.0)
    track_searches(
        spark, LOG,
        [("spark join", 3), ("spark window", 0), ("pandas", 5)],
        now=200.0,
    )

    qlog = query_log(spark, LOG)
    rows = {r["query"]: r for r in analytics_summary(qlog).collect()}
    assert rows["spark join"]["freq"] == 2
    assert rows["spark join"]["n_zero_results"] == 0
    assert rows["spark join"]["max_results"] == 12
    assert rows["spark window"]["freq"] == 2
    assert rows["spark window"]["n_zero_results"] == 2
    assert rows["pandas"]["freq"] == 1
    # appends accumulate, never rewrite: last_ts advances
    assert rows["spark join"]["last_ts"].timestamp() == 200.0

    # suggest consumes the captured log with the has-results gate:
    # 'spark window' only ever returned 0 results -> never surfaces
    got = [r["query"] for r in
           suggest(qlog, "spark", results_col="results_count").collect()]
    assert got == ["spark join"]
