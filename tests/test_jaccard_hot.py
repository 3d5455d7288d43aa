"""Parity tests for the round-7 hot-shingle path of ngram_jaccard_pairs:
the hot/cold split with exact fix-up must produce EXACTLY the plain
inverted-index join's pairs, including the hot-dominated edge cases the
bound-proof covers (pairs sharing only hot shingles)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from distributed_crawler_spark.operators import dedup

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _plain_pairs(docs, threshold, shingle_n=3):
    """The un-split exact join (hot_df high enough that nothing is hot)."""
    return dedup.ngram_jaccard_pairs(
        docs, shingle_n=shingle_n, threshold=threshold, hot_df=1 << 30
    )


def _as_set(df):
    return {(r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect()}


def test_hot_path_parity_on_corpus(spark):
    """hot_df forced to 2 makes almost EVERY shingle hot — maximal
    exercise of the hot fix-up + hot-dominated brute branch — and the
    result must still equal the plain join's."""
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    plain = _as_set(_plain_pairs(docs, 0.5))
    hot = _as_set(dedup.ngram_jaccard_pairs(docs, threshold=0.5, hot_df=2))
    assert hot == plain and plain  # non-trivial on this corpus


@pytest.mark.parametrize("hot_df", [2, 3, 4])
def test_hot_only_pairs_recovered(spark, hot_df):
    """Adversarial corpus: docs 1/2 share ONLY boilerplate (hot)
    shingles — the hot-dominated branch must still report their J=1.0
    pair; docs 3/4 mix hot boilerplate with cold text."""
    rows = [
        (1, "nav home nav about nav contact"),
        (2, "nav home nav about nav contact"),
        (3, "nav home nav about unique alpha text body here"),
        (4, "nav home nav about unique alpha text body here too"),
        (5, "totally different content with no overlap at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    plain = _as_set(_plain_pairs(docs, 0.3))
    hot = _as_set(dedup.ngram_jaccard_pairs(docs, threshold=0.3, hot_df=hot_df))
    assert hot == plain
    assert (1, 2, 1.0) in hot  # the hot-only pair survived


def test_fallback_when_everything_hot_dominated(spark):
    """A corpus of identical docs makes every doc hot-dominated; with
    the brute set under the cap the result must still be exact."""
    rows = [(i, "same words every single time") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    plain = _as_set(_plain_pairs(docs, 0.5, shingle_n=2))
    hot = _as_set(
        dedup.ngram_jaccard_pairs(docs, shingle_n=2, threshold=0.5, hot_df=2)
    )
    assert hot == plain and len(plain) == 12 * 11 // 2
