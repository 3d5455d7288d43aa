"""textstats.script_profile: counting, dominance, tie-break, and
degenerate-input semantics (oracle parity for the staged query runs in
tests/test_suffix.py::test_staged_queries_against_oracles)."""

from __future__ import annotations

from distributed_crawler_spark.operators.textstats import script_profile


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    return {r.doc_id: r.asDict() for r in script_profile(df).collect()}


def test_counts_and_dominance(spark):
    got = _run(
        spark,
        [
            (1, "abc αε xyz"),        # 6 latin, 2 greek
            (2, "αεηιυ αε k"),        # 7 greek, 1 latin
            (3, "おた おた"),          # 4 cjk
        ],
    )
    assert got[1]["n_latin"] == 6 and got[1]["n_greek"] == 2
    assert got[1]["script"] == "latin"
    assert got[1]["confidence"] == round(6 / 8, 4)
    assert got[2]["script"] == "greek" and got[2]["n_greek"] == 7
    assert got[3]["script"] == "cjk" and got[3]["confidence"] == 1.0


def test_tiebreak_and_empty(spark):
    got = _run(
        spark,
        [
            (1, "ab αε"),   # 2 latin vs 2 greek -> max name 'latin'
            (2, ""),         # empty -> none, 0.0
            (3, "12 34 !"),  # no script chars at all
            (4, None),       # null text behaves like empty
        ],
    )
    assert got[1]["script"] == "latin" and got[1]["confidence"] == 0.5
    for d in (2, 3, 4):
        assert got[d]["script"] == "none"
        assert got[d]["confidence"] == 0.0


def test_custom_alphabets(spark):
    from pyspark.sql import functions as F  # noqa: F401

    df = spark.createDataFrame([(1, "zzz yy")], "doc_id LONG, text STRING")
    out = script_profile(
        df, scripts={"zed": "z", "why": "y"}
    ).collect()[0]
    assert out.n_zed == 3 and out.n_why == 2
    assert out.script == "zed" and out.confidence == 0.6
