"""Composed multifield query language — the reference's only query IR
rebuilt Spark-first.

The reference parses every search box string with Whoosh's
MultifieldParser over the title/content/description/keywords fields with
the Fuzzy/Phrase/Wildcard plugins enabled (indexer_node.py:233-243) and
scores the resulting tree in one retrieval. Round 2 had each plugin as a
separate scored query; this module composes them: a tiny recursive-
descent parser (driver-side, queries are bytes long) produces an AST,
and the executor lowers the AST to ONE declarative DataFrame plan —
boolean retrieval as set-oriented joins:

    leaf       -> per-field postings filter (term equality / prefix /
                  levenshtein) or phrase occurrence count, summed per doc
    AND        -> inner join on doc (scores added)
    OR         -> full outer join on doc (scores added, absent side = 0)
    NOT        -> left anti join against the negated child's doc set

Grammar (Whoosh defaults: implicit AND, uppercase operators):

    query  := and ( OR and )*
    and    := unit ( [AND] unit )*          # adjacency is AND
    unit   := NOT unit | '(' query ')' | [field':'] leaf
    leaf   := '"words..."' | word'*' | word'~' | word

An unfielded leaf searches EVERY field (MultifieldParser behavior);
scores are summed over fields. Leaf scores are term frequencies (the
search_tf scoring surface — SQL-oracle-able); for BM25-weighted
retrieval feed the matched doc set into bm25_from_index.

Scale shape: each leaf touches only its terms' postings rows (predicate
reaches the parquet scan on a persisted index); the boolean joins key on
doc_id. Query trees are tiny, so the plan is a handful of joins — no
per-row Python anywhere.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .search import build_postings


# ---- AST ------------------------------------------------------------------

@dataclass(frozen=True)
class Term:
    field: str | None
    text: str


@dataclass(frozen=True)
class Wildcard:
    field: str | None
    prefix: str


@dataclass(frozen=True)
class Fuzzy:
    field: str | None
    text: str
    max_edits: int = 1


@dataclass(frozen=True)
class Phrase:
    field: str | None
    words: tuple[str, ...]


@dataclass(frozen=True)
class And:
    children: tuple


@dataclass(frozen=True)
class Or:
    children: tuple


@dataclass(frozen=True)
class Not:
    child: object


# ---- parser ----------------------------------------------------------------

_TOKEN = re.compile(r'\s*(?:(?P<lparen>\()|(?P<rparen>\))|(?P<phrase>"[^"]*")|(?P<word>[^\s()"]+))')
_OPERATORS = ("AND", "OR", "NOT")


def _tokenize(q: str) -> list[tuple[str, str | None, int, int]]:
    """(kind, value, start, end) — spans let the parser distinguish
    adjacent constructs (title:"x") from whitespace-separated ones
    (title: "x"), which tokenization would otherwise erase."""
    out: list[tuple[str, str | None, int, int]] = []
    i = 0
    while i < len(q):
        m = _TOKEN.match(q, i)
        if m is None or m.end() == i:
            if q[i:].strip():
                # e.g. an unterminated quote — erroring beats silently
                # truncating the query (which would broaden its scope)
                raise ValueError(f"cannot tokenize query at position {i}: {q[i:]!r}")
            break
        i = m.end()
        if m.group("lparen"):
            out.append(("(", None, m.start("lparen"), m.end("lparen")))
        elif m.group("rparen"):
            out.append((")", None, m.start("rparen"), m.end("rparen")))
        elif m.group("phrase") is not None:
            out.append(
                ("phrase", m.group("phrase")[1:-1], m.start("phrase"), m.end("phrase"))
            )
        else:
            w = m.group("word")
            kind = w if w in _OPERATORS else "word"
            out.append((kind, None if kind != "word" else w, m.start("word"), m.end("word")))
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str | None]], known_fields: set[str]):
        self.toks = tokens
        self.pos = 0
        self.fields = known_fields

    def _peek(self) -> str | None:
        return self.toks[self.pos][0] if self.pos < len(self.toks) else None

    def parse(self):
        node = self._or()
        if self.pos != len(self.toks):
            raise ValueError(f"trailing tokens at {self.pos}: {self.toks[self.pos:]}")
        return node

    def _or(self):
        parts = [self._and()]
        while self._peek() == "OR":
            self.pos += 1
            parts.append(self._and())
        return parts[0] if len(parts) == 1 else Or(tuple(parts))

    def _and(self):
        parts = [self._unit()]
        while self._peek() in ("AND", "NOT", "(", "phrase", "word"):
            if self._peek() == "AND":
                self.pos += 1
            parts.append(self._unit())
        return parts[0] if len(parts) == 1 else And(tuple(parts))

    def _unit(self):
        kind = self._peek()
        if kind is None:
            raise ValueError("unexpected end of query")
        if kind == "NOT":
            self.pos += 1
            return Not(self._unit())
        if kind == "(":
            self.pos += 1
            node = self._or()
            if self._peek() != ")":
                raise ValueError("unbalanced parenthesis")
            self.pos += 1
            return node
        kind, val, _start, end = self.toks[self.pos]
        self.pos += 1
        if kind == "phrase":
            return self._phrase(None, val)
        if kind != "word":
            raise ValueError(f"unexpected {kind!r} where a term was expected")
        field = None
        text = val
        if ":" in text:
            maybe_field, rest = text.split(":", 1)
            if maybe_field in self.fields and rest:
                field, text = maybe_field, rest
            elif (
                maybe_field in self.fields
                and not rest
                and self._peek() == "phrase"
                and self.toks[self.pos][2] == end  # ADJACENT: title:"x",
                # not title: "x" (whitespace separates into two units)
            ):
                # fielded phrase: title:"key order"
                _, pval, _, _ = self.toks[self.pos]
                self.pos += 1
                return self._phrase(maybe_field, pval)
        if text.endswith("*") and len(text) > 1:
            return Wildcard(field, text[:-1])
        if text.endswith("~") and len(text) > 1:
            return Fuzzy(field, text[:-1])
        return Term(field, text)

    @staticmethod
    def _phrase(field: str | None, val: str) -> Phrase:
        words = tuple(w for w in val.split(" ") if w)
        if not words:
            raise ValueError("empty phrase")
        return Phrase(field, words)


def parse_query(q: str, known_fields: set[str] | frozenset[str] = frozenset()):
    """Parse a search-box string into the AST. ``known_fields`` gates the
    ``field:term`` syntax so URLs like http://x don't parse as fields."""
    tokens = _tokenize(q)
    if not tokens:
        raise ValueError("empty query")
    return _Parser(tokens, set(known_fields)).parse()


# ---- executor ---------------------------------------------------------------

def _leaf_scores(
    leaf,
    postings: dict[str, DataFrame],
    docs: dict[str, DataFrame],
    id_col: str,
    transform,
) -> DataFrame:
    names = [leaf.field] if leaf.field else list(postings)
    parts = []
    for f in names:
        p = postings[f]
        if isinstance(leaf, Term):
            parts.append(
                p.filter(F.col("term") == transform(leaf.text)).select(
                    id_col, F.col("tf").alias("score")
                )
            )
        elif isinstance(leaf, Wildcard):
            parts.append(
                p.filter(F.col("term").startswith(transform(leaf.prefix))).select(
                    id_col, F.col("tf").alias("score")
                )
            )
        elif isinstance(leaf, Fuzzy):
            parts.append(
                p.filter(
                    F.levenshtein(F.col("term"), F.lit(transform(leaf.text)))
                    <= leaf.max_edits
                ).select(id_col, F.col("tf").alias("score"))
            )
        elif isinstance(leaf, Phrase):
            # phrases match the RAW field text (search.py phrase_match's
            # occurrence-count arithmetic), so the analyzer transform is
            # deliberately NOT applied — stemming the words of
            # '"Breaking News"' would make a literally-present phrase
            # unmatchable against the unanalyzed text
            from .search import phrase_match

            phrase = " ".join(leaf.words)
            parts.append(
                phrase_match(docs[f], phrase, id_col).select(
                    id_col, F.col("n_occurrences").alias("score")
                )
            )
        else:  # pragma: no cover
            raise TypeError(f"not a leaf: {leaf!r}")
    unioned = reduce(lambda a, b: a.unionByName(b), parts)
    return unioned.groupBy(id_col).agg(F.sum("score").cast("long").alias("score"))


def _combine(a: DataFrame, b: DataFrame, id_col: str, how: str) -> DataFrame:
    b2 = b.withColumnRenamed("score", "__score_b")
    return a.join(b2, id_col, how).select(
        id_col,
        (
            F.coalesce(F.col("score"), F.lit(0))
            + F.coalesce(F.col("__score_b"), F.lit(0))
        ).alias("score"),
    )


def _execute(node, postings, docs, id_col, transform) -> DataFrame:
    if isinstance(node, (Term, Wildcard, Fuzzy, Phrase)):
        return _leaf_scores(node, postings, docs, id_col, transform)
    if isinstance(node, Or):
        if any(isinstance(c, Not) for c in node.children):
            raise ValueError("NOT under OR is not supported (match-all semantics)")
        parts = [_execute(c, postings, docs, id_col, transform) for c in node.children]
        return reduce(lambda a, b: _combine(a, b, id_col, "full"), parts)
    if isinstance(node, And):
        pos = [c for c in node.children if not isinstance(c, Not)]
        neg = [c.child for c in node.children if isinstance(c, Not)]
        if not pos:
            raise ValueError("purely negative query (Whoosh also rejects these)")
        out = reduce(
            lambda a, b: _combine(a, b, id_col, "inner"),
            [_execute(c, postings, docs, id_col, transform) for c in pos],
        )
        for n in neg:
            excl = _execute(n, postings, docs, id_col, transform)
            out = out.join(excl.select(id_col), id_col, "left_anti")
        return out
    if isinstance(node, Not):
        raise ValueError("top-level NOT needs a positive clause")
    raise TypeError(f"unknown node {node!r}")


def search_composed(
    fields: dict[str, DataFrame],
    query: str,
    id_col: str = "doc_id",
    topk: int = 20,
    term_transform=None,
    postings_fn=build_postings,
) -> DataFrame:
    """Parse ``query`` and run it across ``fields`` (name -> DataFrame of
    (id, text)) as one plan; returns (id, score) top-k. Pass
    ``term_transform=porter_stem``-style analyzers to query a stemmed
    index with analyzer parity (preprocess_query analog), and
    ``postings_fn=build_postings_stemmed`` to match."""
    ast = parse_query(query, frozenset(fields))
    transform = term_transform or (lambda t: t)
    postings = {f: postings_fn(df, id_col) for f, df in fields.items()}
    scored = _execute(ast, postings, fields, id_col, transform)
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(topk)


# ---- persisted multifield index (index once, parse-and-query many) ---------

def write_multifield_index(
    fields: dict[str, DataFrame], index_dir: str, id_col: str = "doc_id"
) -> str:
    """Persist one stemmed index snapshot PER FIELD (the Whoosh schema's
    field columns, indexer_node.py:108-118) under
    ``index_dir/field=NAME/`` — write_index_snapshot layout each, so
    every leaf's term predicate reaches a term-sorted parquet scan."""
    import json
    import os

    from .search import write_index_snapshot

    for name, df in fields.items():
        write_index_snapshot(df, os.path.join(index_dir, f"field={name}"), id_col)
    with open(os.path.join(index_dir, "fields.json"), "w") as f:
        json.dump({"fields": sorted(fields), "id_col": id_col}, f)
    return index_dir


def search_composed_indexed(
    spark,
    index_dir: str,
    query: str,
    topk: int = 20,
    term_transform=None,
) -> DataFrame:
    """Run a composed query against a persisted multifield index with
    ZERO query-time tokenization: leaves read per-field postings straight
    from the snapshot (term filters pushed to the scan). The index stores
    analyzer-processed terms, so query terms default through the same
    lower+Porter transform (preprocess_query analog). Phrase leaves need
    raw field text and are rejected here — run those via search_composed
    over the source docs."""
    import json
    import os

    from ..functions.text import porter_stem

    fields_json = os.path.join(index_dir, "fields.json")
    if os.path.exists(fields_json):
        with open(fields_json) as f:
            meta = json.load(f)
        field_dirs = {
            name: os.path.join(index_dir, f"field={name}") for name in meta["fields"]
        }
    else:
        # plain write_index_snapshot layout (the CLI `index` command):
        # treat it as one body field
        with open(os.path.join(index_dir, "meta.json")) as f:
            meta = json.load(f)
        field_dirs = {"body": index_dir}
        meta = {"fields": ["body"], "id_col": meta["id_col"]}
    id_col = meta["id_col"]
    ast = parse_query(query, frozenset(meta["fields"]))

    def _has_phrase(node) -> bool:
        if isinstance(node, Phrase):
            return True
        if isinstance(node, (And, Or)):
            return any(_has_phrase(c) for c in node.children)
        if isinstance(node, Not):
            return _has_phrase(node.child)
        return False

    if _has_phrase(ast):
        raise ValueError(
            "phrase leaves need raw field text; use search_composed over the docs"
        )
    transform = term_transform or (lambda t: porter_stem(t.lower()))
    postings = {
        name: spark.read.parquet(os.path.join(d, "postings"))
        for name, d in field_dirs.items()
    }
    scored = _execute(ast, postings, {}, id_col, transform)
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(topk)
