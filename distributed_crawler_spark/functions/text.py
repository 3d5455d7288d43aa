"""Token pipeline — the reference indexer's NLTK path
(indexer_node.py:75-94: word_tokenize(lower) → keep isalnum ∧ not
stopword → PorterStemmer.stem) rebuilt without NLTK:

  * native fast path: lower → split → array filter vs broadcast stopword
    list (JVM, codegen'd) — used in the hot pipeline.
  * parity path: a pure-Python Porter stemmer (the classic published
    algorithm) in an Arrow pandas UDF, for stemmed-postings parity with
    the reference's index.

The stemmer implements Porter's original 1980 algorithm (public domain
description); not a copy of NLTK's extended implementation — NLTK's
PorterStemmer(mode=NLTK_EXTENSIONS) differs on a few words (e.g.
'fluently'); documented divergence, acceptable because the index parity
target is our own spec'd pipeline (SURVEY.md §2.3).
"""

from __future__ import annotations

import functools
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from ..operators.textstats import EN_STOPWORDS

_VOWEL = "aeiou"


def _cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWEL:
        return False
    if c == "y":
        return i == 0 or not _cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Porter's m: number of VC sequences."""
    forms = "".join("c" if _cons(stem, i) else "v" for i in range(len(stem)))
    return len(re.findall("vc", forms))


def _has_vowel(stem: str) -> bool:
    return any(not _cons(stem, i) for i in range(len(stem)))


def _ends_cvc(stem: str) -> bool:
    if len(stem) < 3:
        return False
    if not (_cons(stem, -3 + len(stem)) and not _cons(stem, len(stem) - 2) and _cons(stem, len(stem) - 1)):
        return False
    return stem[-1] not in "wxy"


def _dbl(stem: str) -> bool:
    return len(stem) >= 2 and stem[-1] == stem[-2] and _cons(stem, len(stem) - 1)


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


@functools.lru_cache(maxsize=1 << 20)
def porter_stem(word: str) -> str:
    """Porter 1980 stemmer, steps 1a-5b. Memoized: corpora repeat a small
    vocabulary thousands of times per partition, so per-token stemming is
    vocab-bound, not token-bound (pure function — cache is safe)."""
    w = word
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]
    # step 1b
    flag = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w, flag = w[:-2], True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w, flag = w[:-3], True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _dbl(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break
    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break
    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and (not stem or stem[-1] not in "st"):
                continue
            if _measure(stem) > 1:
                w = stem
            break
    else:
        if w.endswith("ion") and len(w) > 3 and w[-4] in "st" and _measure(w[:-3]) > 1:
            w = w[:-3]
    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem
    # step 5b
    if w.endswith("ll") and _measure(w) > 1:
        w = w[:-1]
    return w


_TOKEN_RE = re.compile(r"[a-z0-9]+")
_STOPSET = set(EN_STOPWORDS)


def process_text_py(text: str | None) -> list[str]:
    """indexer_node.py:82-89 analog: lower, tokenize, keep alnum
    non-stopwords, stem."""
    if not text:
        return []
    return [
        porter_stem(t)
        for t in _TOKEN_RE.findall(text.lower())
        if t not in _STOPSET
    ]


@pandas_udf(ArrayType(StringType()))
def process_text_udf(texts: pd.Series) -> pd.Series:
    return texts.map(process_text_py)


def tokens_fast(text_col: Column) -> Column:
    """Native fast path: lower/split/stopword-filter, no stemming
    (stemming forces Python; at scale run it only where the product
    needs stemmed postings)."""
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    toks = F.split(F.lower(text_col), r"[^a-z0-9]+")
    # array_except would dedup (breaking tf counts) — filter keeps dups
    return F.filter(
        toks, lambda t: (t != "") & ~F.array_contains(stop_arr, t)
    )
