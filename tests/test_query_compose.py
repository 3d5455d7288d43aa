"""Composed multifield query language: parser AST shapes, executor vs an
independent row-at-a-time Python reference, analyzer (stemmed) parity,
and error cases (Whoosh MultifieldParser analog, indexer_node.py:233-243)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_crawler_spark.operators.query import (
    And,
    Fuzzy,
    Not,
    Or,
    Phrase,
    Term,
    Wildcard,
    parse_query,
    search_composed,
)

FIELDS = frozenset({"title", "body"})


def test_parser_shapes():
    assert parse_query("spark", FIELDS) == Term(None, "spark")
    assert parse_query("title:spark", FIELDS) == Term("title", "spark")
    # unknown field prefix stays a literal term (URLs must not split)
    assert parse_query("http://x", FIELDS) == Term(None, "http://x")
    assert parse_query("wind*", FIELDS) == Wildcard(None, "wind")
    assert parse_query("spak~", FIELDS) == Fuzzy(None, "spak", 1)
    assert parse_query('"key order"', FIELDS) == Phrase(None, ("key", "order"))
    # adjacency is AND; explicit AND is the same tree
    assert parse_query("spark join", FIELDS) == parse_query(
        "spark AND join", FIELDS
    ) == And((Term(None, "spark"), Term(None, "join")))
    assert parse_query("spark OR join", FIELDS) == Or(
        (Term(None, "spark"), Term(None, "join"))
    )
    assert parse_query("spark NOT join", FIELDS) == And(
        (Term(None, "spark"), Not(Term(None, "join")))
    )
    # precedence: AND binds tighter than OR; parens override
    assert parse_query("a b OR c", FIELDS) == Or(
        (And((Term(None, "a"), Term(None, "b"))), Term(None, "c"))
    )
    assert parse_query("a (b OR c)", FIELDS) == And(
        (Term(None, "a"), Or((Term(None, "b"), Term(None, "c"))))
    )


def test_parser_errors():
    with pytest.raises(ValueError):
        parse_query("", FIELDS)
    with pytest.raises(ValueError):
        parse_query("(spark", FIELDS)


_DOCS = [
    (0, "spark joins the window order"),
    (1, "join join the key order club"),
    (2, "windows spark and spark again"),
    (3, "nothing relevant here"),
    (4, "spark wind turbine"),
]


def _py_reference(query_kind):
    """Independent row-at-a-time evaluation of the fixed test queries."""
    title = {d: " ".join(t.split()[:2]) for d, t in _DOCS}
    body = dict(_DOCS)

    def tf(text, term):
        return sum(1 for w in text.split() if w == term)

    def tf_prefix(text, prefix):
        return sum(1 for w in text.split() if w.startswith(prefix))

    scores = {}
    for d, _ in _DOCS:
        if query_kind == "or_not":
            # (title:spark OR join) AND NOT wind*
            s = tf(title[d], "spark") + tf(title[d], "join") + tf(body[d], "join")
            has_wind = tf_prefix(title[d], "wind") + tf_prefix(body[d], "wind")
            if s > 0 and not has_wind:
                scores[d] = s
        elif query_kind == "phrase_and":
            # "key order" AND join  (multifield: phrase counted per field)
            p = title[d].count("key order") + body[d].count("key order")
            j = tf(title[d], "join") + tf(body[d], "join")
            if p > 0 and j > 0:
                scores[d] = p + j
    return sorted(((d, s) for d, s in scores.items()), key=lambda x: (-x[1], x[0]))


def _fields(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id INT, text STRING")
    return {
        "title": docs.select(
            "doc_id",
            F.concat_ws(" ", F.slice(F.split("text", " "), 1, 2)).alias("text"),
        ),
        "body": docs.select("doc_id", "text"),
    }


def test_executor_matches_python_reference(spark):
    fields = _fields(spark)
    got = [
        (r["doc_id"], r["score"])
        for r in search_composed(
            fields, "(title:spark OR join) AND NOT wind*"
        ).collect()
    ]
    assert got == _py_reference("or_not")

    got2 = [
        (r["doc_id"], r["score"])
        for r in search_composed(fields, '"key order" AND join').collect()
    ]
    assert got2 == _py_reference("phrase_and")


def test_fuzzy_and_wildcard_leaves(spark):
    fields = _fields(spark)
    # spak~ matches 'spark' within 1 edit
    got = {r["doc_id"] for r in search_composed(fields, "spak~").collect()}
    assert got == {0, 2, 4}
    got_w = {r["doc_id"] for r in search_composed(fields, "wind*").collect()}
    assert got_w == {0, 2, 4}  # window, windows, wind


def test_stemmed_analyzer_parity(spark):
    """preprocess_query analog: with the Porter transform + stemmed
    postings, a query for 'running joins' matches docs with 'run'/'join'."""
    from distributed_crawler_spark.functions.text import porter_stem
    from distributed_crawler_spark.operators.search import build_postings_stemmed

    docs = spark.createDataFrame(
        [(0, "we run the join daily"), (1, "nothing")], "doc_id INT, text STRING"
    )
    fields = {"body": docs}
    got = search_composed(
        fields,
        "running AND joins",
        term_transform=porter_stem,
        postings_fn=build_postings_stemmed,
    ).collect()
    assert [r["doc_id"] for r in got] == [0]


def test_executor_rejects_pure_negation(spark):
    fields = _fields(spark)
    with pytest.raises(ValueError):
        search_composed(fields, "NOT spark")
    with pytest.raises(ValueError):
        search_composed(fields, "a OR NOT b")


def test_indexed_composed_matches_live(spark, tmp_path):
    """search_composed_indexed over the persisted multifield index must
    rank identically to the live stemmed path; phrase leaves are
    rejected with a pointer to the docs path."""
    from distributed_crawler_spark.functions.text import porter_stem
    from distributed_crawler_spark.operators.query import (
        search_composed_indexed,
        write_multifield_index,
    )
    from distributed_crawler_spark.operators.search import build_postings_stemmed

    docs = spark.createDataFrame(
        [
            (0, "running the spark join daily"),
            (1, "windows sparked a joining run"),
            (2, "nothing to see"),
        ],
        "doc_id INT, text STRING",
    )
    fields = {
        "title": docs.select(
            "doc_id",
            F.concat_ws(" ", F.slice(F.split("text", " "), 1, 2)).alias("text"),
        ),
        "body": docs.select("doc_id", "text"),
    }
    idx = str(tmp_path / "mf_index")
    write_multifield_index(fields, idx)

    q = "running AND join~"
    want = [
        (r["doc_id"], r["score"])
        for r in search_composed(
            fields, q,
            term_transform=lambda t: porter_stem(t.lower()),
            postings_fn=build_postings_stemmed,
        ).collect()
    ]
    got = [
        (r["doc_id"], r["score"])
        for r in search_composed_indexed(spark, idx, q).collect()
    ]
    assert got == want and got  # non-empty: 'running'->'run' matches both docs

    with pytest.raises(ValueError):
        search_composed_indexed(spark, idx, '"spark join"')


def test_fielded_phrase(spark):
    assert parse_query('title:"key order"', FIELDS) == Phrase(
        "title", ("key", "order")
    )
    # unknown field prefix before a phrase stays two units (implicit AND)
    assert parse_query('nope:"key order"', FIELDS) == And(
        (Term(None, "nope:"), Phrase(None, ("key", "order")))
    )
    fields = _fields(spark)
    # 'key order' is in doc 1's body but not in any 2-word title
    assert [r["doc_id"] for r in
            search_composed(fields, 'body:"key order"').collect()] == [1]
    assert search_composed(fields, 'title:"key order"').count() == 0


# ---- property-based parser fuzz (hypothesis) --------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _words = st.text(
        alphabet="abcdefghij:*~", min_size=1, max_size=8
    ).filter(lambda w: w not in ("AND", "OR", "NOT"))

    @st.composite
    def _queries(draw, depth=0):
        if depth >= 3:
            return draw(_words)
        kind = draw(st.integers(0, 5))
        if kind == 0:
            return draw(_words)
        if kind == 1:
            ws = draw(st.lists(_words, min_size=1, max_size=3))
            return '"' + " ".join(w.replace('"', "") for w in ws) + '"'
        if kind == 2:
            return "(" + draw(_queries(depth + 1)) + ")"
        a, b = draw(_queries(depth + 1)), draw(_queries(depth + 1))
        op = {3: " AND ", 4: " OR ", 5: " NOT "}[kind]
        return a + op + b

    @given(_queries())
    @settings(max_examples=200, deadline=None)
    def test_parser_total_on_generated_queries(q):
        """Any string the grammar can produce parses without crashing, and
        the AST is well-formed (group arity >= 2, leaves non-empty)."""
        ast = parse_query(q, FIELDS)

        def check(node):
            if isinstance(node, (And, Or)):
                assert len(node.children) >= 2
                for c in node.children:
                    check(c)
            elif isinstance(node, Not):
                check(node.child)
            elif isinstance(node, Phrase):
                assert node.words and all(node.words)
            elif isinstance(node, (Term, Wildcard, Fuzzy)):
                text = getattr(node, "text", None) or getattr(node, "prefix")
                assert text
            else:
                raise AssertionError(f"unknown node {node!r}")

        check(ast)

    @given(st.text(max_size=40))
    @settings(max_examples=300, deadline=None)
    def test_parser_never_crashes_unexpectedly(q):
        """Arbitrary input either parses to a well-formed AST or raises
        ValueError — never anything else."""
        try:
            parse_query(q, FIELDS)
        except ValueError:
            pass

except ImportError:  # pragma: no cover
    pass


def test_review_r03_parser_edge_cases(spark):
    """Code-review findings: operator-in-leaf-position and unterminated
    quotes raise ValueError (never AssertionError / silent truncation);
    empty phrases are rejected; phrase leaves match RAW text even under
    an analyzer transform."""
    from distributed_crawler_spark.functions.text import porter_stem
    from distributed_crawler_spark.operators.search import build_postings_stemmed

    for bad in ("AND", ")", "OR foo", "x AND AND y", 'foo "bar baz', '""', 'a "" b'):
        with pytest.raises(ValueError):
            parse_query(bad, FIELDS)

    # phrase + analyzer transform: '"Breaking News"' must match the raw
    # text even though the transform would stem/lower the words
    docs = spark.createDataFrame(
        [(0, "Breaking News today and running joins")], "doc_id INT, text STRING"
    )
    got = search_composed(
        {"body": docs},
        '"Breaking News" AND running',
        term_transform=lambda t: porter_stem(t.lower()),
        postings_fn=build_postings_stemmed,
    ).collect()
    assert [r["doc_id"] for r in got] == [0]


def test_indexed_composed_single_field_snapshot(spark, tmp_path):
    """search_composed_indexed accepts a plain write_index_snapshot dir
    (the CLI `index` output) as a single body field."""
    from distributed_crawler_spark.operators.query import search_composed_indexed
    from distributed_crawler_spark.operators.search import write_index_snapshot

    docs = spark.createDataFrame(
        [(0, "running the join daily"), (1, "nothing")], "doc_id INT, text STRING"
    )
    idx = str(tmp_path / "plain_index")
    write_index_snapshot(docs, idx)
    got = search_composed_indexed(spark, idx, "running AND joins").collect()
    assert [r["doc_id"] for r in got] == [0]


def test_fielded_phrase_requires_adjacency():
    """'title: "key order"' (whitespace after the colon) must stay two
    units — only the adjacent form binds the phrase to the field."""
    assert parse_query('title: "key order"', FIELDS) == And(
        (Term(None, "title:"), Phrase(None, ("key", "order")))
    )
