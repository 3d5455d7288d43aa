"""Parity: the SQL-generated Porter chain (plans/porter_sql.py) must
stem EXACTLY like the engine's Python stemmer (functions/text.py
porter_stem) — the independence guarantee behind the round-6 stemmed
hash oracles. Covers the corpus vocabulary, a hand-picked suite hitting
every rule (incl. the step-4 for/else 'ion' clause, 1b's flag
continuation, and y-run classification), and seeded suffix-fuzz."""

from __future__ import annotations

import random
import string

import duckdb
import pytest

from distributed_crawler_spark.functions.text import porter_stem
from distributed_crawler_spark.plans.porter_sql import porter_ctes

TRICKY = """caresses ponies ties caress cats feed agreed plastered bled
motoring sing conflated troubled sized hopping tanned falling hissing
fizzed failing filing happy sky relational conditional rational valenci
hesitanci digitizer conformabli radicalli differentli vileli analogousli
vietnamization predication operator feudalism decisiveness hopefulness
callousness formaliti sensitiviti sensibiliti triplicate formative
formalize electriciti electrical hopeful goodness revival allowance
inference airliner gyroscopic adjustable defensible irritant replacement
adjustment dependent adoption homologou communism activate angulariti
homologous effective bowdlerize probate rate cease controll roll skies
dying lying tying news innings proceed exceed succeed oed eed ing s ss
sses ies yyy syzygy sayyid crying string spring bias agreement eement
ement ment ent y by say sky die lie tie ratio patio ion sion tion
ization ational tional enci anci izer abli alli entli eli ousli ation
ator alism iveness fulness ousness aliti iviti biliti icate ative alize
iciti ical ful ness al ance ence er ic able ible ant cement event nt ou
ism ate iti ous ive ize yes eye run running runner easily r1 x2y3 42
a1b2c3 0 yy yyyy ayy byy cyyy ayyya""".split()


def _sql_stems(words: list[str]) -> dict[str, str]:
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE allterms (tok VARCHAR)")
        con.executemany("INSERT INTO allterms VALUES (?)", [(w,) for w in words])
        sql = f"""
WITH {porter_ctes('allterms', 'tok', 'pm').strip()}
SELECT a.tok, coalesce(s.stem, a.tok) AS stem
FROM allterms a LEFT JOIN pm_stems s ON s.term = a.tok
"""
        return dict(con.sql(sql).fetchall())
    finally:
        con.close()


def _assert_parity(words: list[str]) -> None:
    got = _sql_stems(words)
    bad = [
        (w, porter_stem(w), got[w]) for w in words if got[w] != porter_stem(w)
    ]
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_tricky_words():
    _assert_parity(sorted(set(TRICKY)))


def test_corpus_vocabulary(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    vocab = [
        r[0]
        for r in con.sql(
            f"""SELECT DISTINCT t.tok
        FROM read_parquet('{sf_dir}/documents.parquet'),
        LATERAL (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok) t"""
        ).fetchall()
    ]
    con.close()
    assert vocab
    _assert_parity(sorted(vocab))


@pytest.mark.parametrize("seed", [7, 42])
def test_suffix_fuzz(seed):
    rng = random.Random(seed)
    alpha = string.ascii_lowercase + "y" * 6 + "aeiou" * 3 + "0123456789"
    sufs = [
        "", "s", "es", "ies", "sses", "ed", "eed", "ing", "ational",
        "tional", "enci", "izer", "abli", "ization", "ator", "alism",
        "iveness", "aliti", "iviti", "biliti", "icate", "ative", "alize",
        "ical", "ful", "ness", "al", "ance", "ence", "er", "ic", "able",
        "ible", "ant", "ement", "ment", "ent", "ion", "sion", "tion",
        "ou", "ism", "ate", "iti", "ous", "ive", "ize", "e", "ll", "y",
        "ly", "eli", "ousli", "at", "bl", "iz",
    ]
    words = set()
    for _ in range(1500):
        stem = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 8)))
        words.add(stem + rng.choice(sufs))
    _assert_parity(sorted(words))
