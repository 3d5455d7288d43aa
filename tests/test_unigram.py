"""bpe.unigram_viterbi_stats: independent python Viterbi parity and the
(cost, pieces) tie-break contract (staged oracle parity runs in the
staged sweep)."""

from __future__ import annotations

import random

import pytest

from distributed_crawler_spark.operators.bpe import unigram_viterbi_stats

VOCAB = {
    **{c: 100 for c in "abcdefgh"},
    "ab": 70, "bc": 70, "cd": 70, "abc": 90, "bcd": 90, "abcd": 120,
}


def _py_viterbi(word, vocab):
    """(min_cost, min_pieces_at_min_cost) — plain tuple DP, no encoding
    trick, so an encoding bug in the engine can't hide here."""
    inf = (float("inf"), 0)
    maxp = max(len(k) for k in vocab)
    dp = [(0, 0)] + [inf] * len(word)
    for i in range(1, len(word) + 1):
        best = inf
        for j in range(max(0, i - maxp), i):
            piece = word[j:i]
            if piece in vocab and dp[j][0] != float("inf"):
                cand = (dp[j][0] + vocab[piece], dp[j][1] + 1)
                if cand < best:
                    best = cand
            # unknown piece contributes nothing (single chars keep it
            # feasible when they are in the vocab)
        dp[i] = best
    return dp[len(word)]


def _py_stats(docs, vocab, max_w=16):
    out = {}
    for d, text in docs:
        n = c = p = 0
        for w in text.split(" "):
            if not w or len(w) > max_w:
                continue
            wc, wp = _py_viterbi(w, vocab)
            n += 1
            c += wc
            p += wp
        if n:
            out[d] = (n, c, p)
    return out


@pytest.mark.parametrize("seed", [41, 42])
def test_unigram_python_parity(spark, seed):
    rng = random.Random(seed)
    docs = [
        (
            d,
            " ".join(
                "".join(rng.choice("abcdefgh") for _ in range(rng.randint(1, 12)))
                for _ in range(rng.randint(1, 20))
            ),
        )
        for d in range(15)
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING").repartition(5)
    got = {
        r.doc_id: (r.n_tokens, r.total_cost, r.total_pieces)
        for r in unigram_viterbi_stats(df, VOCAB).collect()
    }
    assert got == _py_stats(docs, VOCAB)


def test_tiebreak_prefers_fewer_pieces(spark):
    # 'abcd': ab+cd = 140/2 pieces; abcd = 120/1; abc+d = 190; a+bcd=190
    # -> single piece wins on cost.  'abab': ab+ab = 140/2 is unique min.
    # 'aab': a+ab = 170/2 vs aa?(absent) a+a+b=300/3 -> 170/2.
    # cost tie case: vocab where two splits cost the same but differ in
    # piece count -> fewer pieces reported
    vocab = {**{c: 100 for c in "xy"}, "xy": 200, "xyx": 300}
    # 'xyx': x+y+x=300/3, xy+x=300/2, xyx=300/1 -> (300, 1)
    df = spark.createDataFrame([(1, "xyx")], "doc_id LONG, text STRING")
    r = unigram_viterbi_stats(df, vocab).collect()[0]
    assert (r.total_cost, r.total_pieces) == (300, 1)


def test_long_words_excluded(spark):
    df = spark.createDataFrame(
        [(1, "ab " + "a" * 30)], "doc_id LONG, text STRING"
    )
    r = unigram_viterbi_stats(df, VOCAB, max_word_len=16).collect()[0]
    assert r.n_tokens == 1 and r.total_cost == 70
