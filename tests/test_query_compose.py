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
    rank identically to the live stemmed path; phrase leaves run against
    the POSITIONAL postings with analyzed-adjacency semantics."""
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

    # indexed phrase: '"spark join"' analyzes to [spark, join], which is
    # adjacent in BOTH docs' analyzed streams — doc 0 literally ('the' is
    # a stopword, renumbered away on both sides would not matter here),
    # doc 1 via stemming ('sparked a joining' -> [spark, join] after the
    # stopword 'a' drops and the renumbered stream makes them adjacent).
    # The raw-text path would only match doc 0 — this is Whoosh's
    # analyzed-phrase semantics, which the raw scan could never give.
    phr = {
        r["doc_id"] for r in search_composed_indexed(spark, idx, '"spark join"').collect()
    }
    assert phr == {0, 1}


def test_indexed_wildcard_prefix_not_stemmed(spark, tmp_path):
    """Whoosh does not stem wildcard text (ADVICE r03): 'testing*' must
    probe the stemmed term space with the LOWERCASED prefix 'testing' —
    which no stemmed term starts with — instead of stemming to 'test'
    and matching far more than the reference would. 'Test*' still
    matches (lowercased prefix 'test' = the stemmed term)."""
    from distributed_crawler_spark.operators.query import (
        search_composed_indexed,
        write_multifield_index,
    )

    docs = spark.createDataFrame(
        [(0, "we are testing the pipeline"), (1, "nothing here")],
        "doc_id INT, text STRING",
    )
    idx = str(tmp_path / "wc_index")
    write_multifield_index({"body": docs}, idx)
    assert search_composed_indexed(spark, idx, "testing*").count() == 0
    got = [r["doc_id"] for r in search_composed_indexed(spark, idx, "Test*").collect()]
    assert got == [0]


def test_fuzzy_max_edits_syntax(spark):
    """Whoosh FuzzyTermPlugin 'term~N' syntax (ADVICE r03): the digit
    parses into max_edits instead of the whole token silently becoming a
    literal term that matches nothing."""
    assert parse_query("spak~2", FIELDS) == Fuzzy(None, "spak", 2)
    assert parse_query("title:spak~2", FIELDS) == Fuzzy("title", "spak", 2)
    fields = _fields(spark)
    # 'spok' is 2 edits from 'spark' (insert r, o->a): ~2 matches, ~ (1) not
    assert search_composed(fields, "spok~").count() == 0
    got = {r["doc_id"] for r in search_composed(fields, "spok~2").collect()}
    assert got == {0, 2, 4}


def test_phrase_from_index_matches_python(spark, tmp_path):
    """phrase_from_index ≡ an independent Python implementation of
    analyzed-adjacency matching over the same corpus (positions index
    the post-analyzer stream on both sides)."""
    from distributed_crawler_spark.functions.text import process_text_py
    from distributed_crawler_spark.operators.search import (
        phrase_from_index,
        write_index_snapshot,
    )

    rows = [
        (0, "Breaking News today: the breaking news cycle"),
        (1, "breaking the news gently"),  # stopword drop makes it adjacent
        (2, "news breaking order is reversed"),
        (3, "nothing relevant"),
    ]
    docs = spark.createDataFrame(rows, "doc_id INT, text STRING")
    idx = str(tmp_path / "pidx")
    write_index_snapshot(docs, idx)

    phrase = "breaking news"
    want = {}
    q = process_text_py(phrase)
    for d, t in rows:
        toks = process_text_py(t)
        n = sum(
            1
            for i in range(len(toks) - len(q) + 1)
            if toks[i : i + len(q)] == q
        )
        if n:
            want[d] = n
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_from_index(spark, idx, phrase).collect()
    }
    assert got == want and set(want) == {0, 1}

    # duplicate-word phrase exercises the same-postings-row double shift
    docs2 = spark.createDataFrame(
        [(0, "buffalo buffalo buffalo"), (1, "buffalo alone")],
        "doc_id INT, text STRING",
    )
    idx2 = str(tmp_path / "pidx2")
    write_index_snapshot(docs2, idx2)
    got2 = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_from_index(spark, idx2, "buffalo buffalo").collect()
    }
    assert got2 == {0: 2}

    with pytest.raises(ValueError):
        phrase_from_index(spark, idx, "the a of")  # analyzes to no terms


def test_phrase_from_index_requires_positions(spark, tmp_path):
    from distributed_crawler_spark.operators.search import (
        phrase_from_index,
        write_index_snapshot,
    )

    docs = spark.createDataFrame([(0, "a b")], "doc_id INT, text STRING")
    idx = str(tmp_path / "nopos")
    write_index_snapshot(docs, idx, positions=False)
    with pytest.raises(ValueError):
        phrase_from_index(spark, idx, "a b")


def test_composed_bm25f_matches_python(spark, tmp_path):
    """Composed tree + BM25F scoring (VERDICT r03 next #3) ≡ an
    independent row-at-a-time Python computation of per-field BM25
    (Whoosh's scoring of the parsed multifield tree,
    indexer_node.py:246-251) on a raw-analyzer index."""
    import math

    from distributed_crawler_spark.operators.query import (
        search_composed_indexed,
        write_multifield_index,
    )

    rows = [
        (0, "spark joins the window order"),
        (1, "join join the key order club"),
        (2, "windows spark and spark again"),
        (3, "nothing relevant here"),
        (4, "spark wind turbine"),
    ]
    docs = spark.createDataFrame(rows, "doc_id INT, text STRING")
    title = {d: " ".join(t.split()[:2]) for d, t in rows}
    body = dict(rows)
    fields_py = {"title": title, "body": body}
    fields = {
        "title": docs.select(
            "doc_id",
            F.concat_ws(" ", F.slice(F.split("text", " "), 1, 2)).alias("text"),
        ),
        "body": docs.select("doc_id", "text"),
    }
    idx = str(tmp_path / "bm25f_idx")
    write_multifield_index(fields, idx, analyzer="raw")

    k1, b = 1.2, 0.75

    def bm25(field, term, d):
        toks = fields_py[field][d].split()
        tf = toks.count(term)
        if tf == 0:
            return None
        dls = {dd: len(tt.split()) for dd, tt in fields_py[field].items()}
        n = len(dls)
        avgdl = sum(dls.values()) / n
        df = sum(1 for tt in fields_py[field].values() if term in tt.split())
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[d] / avgdl))

    # query: (title:spark OR join) AND NOT wind*
    want = {}
    for d, _ in rows:
        s_title = bm25("title", "spark", d)
        s_join = [bm25(f, "join", d) for f in ("title", "body")]
        s_join = [x for x in s_join if x is not None]
        if s_title is None and not s_join:
            continue
        has_wind = any(
            w.startswith("wind")
            for f in ("title", "body")
            for w in fields_py[f][d].split()
        )
        if has_wind:
            continue
        want[d] = round((s_title or 0.0) + sum(s_join), 4)

    got = {
        r["doc_id"]: r["score"]
        for r in search_composed_indexed(
            spark, idx, "(title:spark OR join) AND NOT wind*", scoring="bm25f"
        ).collect()
    }
    assert got == pytest.approx(want) and set(got) == {1}


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


def test_bm25f_termstats_equals_fallback(spark, tmp_path):
    """The precomputed termstats (Whoosh term-dictionary df) path must
    score identically to the groupBy-over-matched-postings fallback —
    same df by construction, so same BM25F numbers."""
    import shutil as _shutil

    from distributed_crawler_spark.operators.query import (
        search_composed_indexed,
        write_multifield_index,
    )

    docs = spark.createDataFrame(
        [
            (0, "spark joins the window order"),
            (1, "join join the key order club"),
            (2, "windows spark and spark again"),
        ],
        "doc_id INT, text STRING",
    )
    fields = {"body": docs}
    idx = str(tmp_path / "ts_idx")
    write_multifield_index(fields, idx, analyzer="raw")
    q = "spark OR (join AND order*)"

    def res(d):
        return [
            (r["doc_id"], r["score"])
            for r in search_composed_indexed(spark, d, q, scoring="bm25f").collect()
        ]

    with_ts = res(idx)
    # strip termstats -> the scorer falls back to the matched-postings df
    _shutil.rmtree(f"{idx}/field=body/termstats")
    assert res(idx) == with_ts and with_ts


def test_live_wildcard_prefix_matches_indexed_behavior(spark, tmp_path):
    """Review r04: the no-stem-wildcards rule applies to the LIVE path
    too — with an analyzer transform, 'testing*' must not stem to 'test'
    and over-match; live and indexed runs of the same query agree."""
    from distributed_crawler_spark.functions.text import porter_stem
    from distributed_crawler_spark.operators.query import (
        search_composed_indexed,
        write_multifield_index,
    )
    from distributed_crawler_spark.operators.search import build_postings_stemmed

    docs = spark.createDataFrame(
        [(0, "we are testing the pipeline"), (1, "nothing here")],
        "doc_id INT, text STRING",
    )
    fields = {"body": docs}
    live = search_composed(
        fields,
        "testing*",
        term_transform=lambda t: porter_stem(t.lower()),
        postings_fn=build_postings_stemmed,
    )
    assert live.count() == 0  # prefix 'testing' probes stemmed terms: none
    live2 = search_composed(
        fields,
        "Test*",
        term_transform=lambda t: porter_stem(t.lower()),
        postings_fn=build_postings_stemmed,
    )
    idx = str(tmp_path / "wc_live_idx")
    write_multifield_index(fields, idx)
    indexed2 = search_composed_indexed(spark, idx, "Test*")
    assert (
        [(r["doc_id"], r["score"]) for r in live2.collect()]
        == [(r["doc_id"], r["score"]) for r in indexed2.collect()]
        == [(0, 1)]
    )


def test_bm25f_not_subtree_skips_scoring_joins(spark, tmp_path):
    """Review r04: negated children only feed an anti-join, so a bm25f
    query must not pay idf/docstats joins for them — exactly one
    docstats scan (the positive 'spark' leaf) in the plan."""
    from distributed_crawler_spark.operators.query import (
        search_composed_indexed,
        write_multifield_index,
    )

    docs = spark.createDataFrame(
        [(0, "spark rules"), (1, "spark wind rules")], "doc_id INT, text STRING"
    )
    idx = str(tmp_path / "neg_idx")
    write_multifield_index({"body": docs}, idx, analyzer="raw")
    df = search_composed_indexed(spark, idx, "spark AND NOT wind*", scoring="bm25f")
    # formatted explain lists every scan once (plain toString truncates
    # long plans mid-string and can hide scans entirely)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("docstats") == 1, f"docstats scans != 1 in:\n{plan}"
    assert [r["doc_id"] for r in df.collect()] == [0]


def whoosh_span_count(text, words, slop):
    """Independent Python reference of Whoosh's ACTUAL phrase matcher:
    Phrase lowers to SpanNear2(terms, slop, ordered=True, mindist=1)
    (whoosh/query/positional.py Phrase.matcher; whoosh/query/spans.py
    SpanNear2._get_spans + Span.distance_to), re-derived step by step —
    ordered check, overlap->distance-0, mindist/slop window, span merge,
    span SET — so the Spark implementation is tested against the
    published algorithm, not against a simplification of itself."""
    toks = text.split()

    def overlaps(a, b):
        return (
            (b[0] <= a[0] <= b[1])
            or (b[0] <= a[1] <= b[1])
            or (a[0] <= b[0] <= a[1])
            or (a[0] <= b[1] <= a[1])
        )

    def distance_to(a, b):  # Span.distance_to
        if overlaps(a, b):
            return 0
        return max(a[0], b[0]) - min(a[1], b[1])

    spans = [(i, i) for i, t in enumerate(toks) if t == words[0]]
    for w in words[1:]:
        bspans = [(i, i) for i, t in enumerate(toks) if t == w]
        out = set()
        for a in spans:
            for b in bspans:
                if a[0] > b[0]:  # ordered=True
                    continue
                if 1 <= distance_to(a, b) <= slop:  # mindist=1
                    out.add((min(a[0], b[0]), max(a[1], b[1])))  # Span.to
        spans = sorted(out)
        if not spans:
            return 0
    return len(spans)


def test_phrase_slop_parsing_and_matching(spark, tmp_path):
    """Whoosh PhrasePlugin slop ('"a b"~N'): adjacent ~N binds to the
    phrase; matching follows Whoosh's SpanNear2 span-set semantics,
    verified against the independent Python reference on a raw index."""
    from distributed_crawler_spark.operators.search import (
        phrase_from_index,
        write_index_snapshot,
    )

    assert parse_query('"a b"~2', FIELDS) == Phrase(None, ("a", "b"), 2)
    assert parse_query('title:"a b"~3', FIELDS) == Phrase("title", ("a", "b"), 3)
    # non-adjacent ~2 stays its own unit (implicit AND with a Fuzzy-less term)
    assert parse_query('"a b" ~2', FIELDS) == And(
        (Phrase(None, ("a", "b")), Term(None, "~2"))
    )

    rows = [
        (0, "a b c"),          # adjacent
        (1, "a x b"),          # gap 2
        (2, "a x y b"),        # gap 3
        (3, "b a"),            # wrong order
        (4, "a a x b"),        # two chain starts
        (5, "a x b x b"),      # two ends within slop 2
        (6, "a a b"),          # two SPANS sharing one end: (0,2) and (1,2)
    ]
    docs = spark.createDataFrame(rows, "doc_id INT, text STRING")
    idx = str(tmp_path / "slop_idx")
    write_index_snapshot(docs, idx, analyzer="raw")

    for slop in (1, 2, 3):
        got = {
            r["doc_id"]: r["n_occurrences"]
            for r in phrase_from_index(spark, idx, "a b", slop=slop).collect()
        }
        want = {
            d: whoosh_span_count(t, ["a", "b"], slop) for d, t in rows
            if whoosh_span_count(t, ["a", "b"], slop) > 0
        }
        assert got == want, f"slop={slop}: {got} != {want}"
    # the span-SET anchor: doc 6 has TWO spans (0,2),(1,2) at slop 2 —
    # counting distinct chain ENDS would say 1 (the pre-round-5 bug)
    assert (
        phrase_from_index(spark, idx, "a b", slop=2)
        .filter(F.col("doc_id") == 6)
        .collect()[0]["n_occurrences"]
        == 2
    )
    # ordered=True: wrong-order text never matches at any slop (refutes
    # the "slop admits out-of-order" reading of Whoosh — SpanNear2 is
    # constructed with ordered=True by Phrase.matcher)
    for slop in (1, 2, 3):
        assert 3 not in {
            r["doc_id"]
            for r in phrase_from_index(spark, idx, "a b", slop=slop).collect()
        }
    # sanity anchors for the semantics themselves
    assert 1 not in {
        r["doc_id"] for r in phrase_from_index(spark, idx, "a b", slop=1).collect()
    }
    assert {
        r["doc_id"] for r in phrase_from_index(spark, idx, "a b", slop=2).collect()
    } >= {0, 1, 4, 5}

    # composed executor lowers slop through the AST; raw-docs path rejects it
    from distributed_crawler_spark.operators.query import search_composed_indexed

    got_c = {
        r["doc_id"]
        for r in search_composed_indexed(spark, idx, '"a b"~2').collect()
    }
    assert got_c == {0, 1, 4, 5, 6}
    with pytest.raises(ValueError):
        search_composed({"body": docs}, '"a b"~2')


def test_phrase_slop_randomized_parity(spark, tmp_path):
    """Seeded randomized docs over a tiny alphabet vs the Python
    SpanNear2 reference (whoosh_span_count), at slops 1-3 — one
    DataFrame, one index, several phrase shapes (covers overlap/
    duplicate-word/shared-end/edge-of-doc shapes the hand-written cases
    might miss; 3-word phrases exercise span-set dedup on (start, end)
    with differing middles)."""
    import random

    from distributed_crawler_spark.operators.search import (
        phrase_from_index,
        write_index_snapshot,
    )

    rng = random.Random(42)
    rows = [
        (d, " ".join(rng.choice("aabx") for _ in range(rng.randint(1, 12))))
        for d in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id INT, text STRING")
    idx = str(tmp_path / "rand_slop_idx")
    write_index_snapshot(docs, idx, analyzer="raw")

    for words in (["a", "b"], ["a", "a"], ["b", "a", "x"], ["a", "a", "b"]):
        for slop in (1, 2, 3):
            got = {
                r["doc_id"]: r["n_occurrences"]
                for r in phrase_from_index(
                    spark, idx, " ".join(words), slop=slop
                ).collect()
            }
            want = {
                d: whoosh_span_count(t, words, slop)
                for d, t in rows
                if whoosh_span_count(t, words, slop) > 0
            }
            assert got == want, f"{words} slop={slop}"


def test_randomized_composed_queries_match_python_evaluator(spark):
    """Seeded random query trees (terms/wildcards/fuzzy/phrases composed
    with AND/OR/NOT/parens) executed by the Spark plan vs an independent
    row-at-a-time Python interpreter of the SAME parsed AST — catches
    combiner bugs (score addition, outer-join null handling, anti-join
    scope) no fixed query exercises."""
    import random

    from distributed_crawler_spark.operators.query import parse_query

    rng = random.Random(7)
    vocab = ["spark", "join", "wind", "window", "key", "order", "club"]
    rows = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 10))))
        for d in range(25)
    ]
    title = {d: " ".join(t.split()[:2]) for d, t in rows}
    body = dict(rows)
    fields_py = {"title": title, "body": body}

    def leafgen():
        k = rng.randint(0, 3)
        field = rng.choice(["", "title:", "body:"])
        w = rng.choice(vocab)
        if k == 0:
            return field + w
        if k == 1:
            return field + w[:3] + "*"
        if k == 2:
            return field + w + "~"
        return f'{field}"{w} {rng.choice(vocab)}"'

    def qgen(depth=0):
        if depth >= 2 or rng.random() < 0.4:
            return leafgen()
        a, b = qgen(depth + 1), qgen(depth + 1)
        op = rng.choice([" AND ", " OR ", " AND NOT "])
        return f"({a}{op}{b})"

    def edits(a, b):
        # classic DP Levenshtein (mirrors Spark's levenshtein())
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[n]

    def ev(node, d):
        from distributed_crawler_spark.operators.query import (
            And, Fuzzy, Not, Or, Phrase, Term, Wildcard,
        )

        if isinstance(node, (Term, Wildcard, Fuzzy, Phrase)):
            names = [node.field] if node.field else ["title", "body"]
            s = 0
            for f in names:
                toks = fields_py[f][d].split()
                if isinstance(node, Term):
                    s += sum(1 for t in toks if t == node.text)
                elif isinstance(node, Wildcard):
                    s += sum(1 for t in toks if t.startswith(node.prefix))
                elif isinstance(node, Fuzzy):
                    s += sum(
                        1 for t in toks if edits(t, node.text) <= node.max_edits
                    )
                else:
                    s += fields_py[f][d].count(" ".join(node.words))
            return s if s > 0 else None
        if isinstance(node, Or):
            vals = [ev(c, d) for c in node.children]
            if all(v is None for v in vals):
                return None
            return sum(v or 0 for v in vals)
        if isinstance(node, And):
            pos = [c for c in node.children if not isinstance(c, Not)]
            neg = [c.child for c in node.children if isinstance(c, Not)]
            vals = [ev(c, d) for c in pos]
            if any(v is None for v in vals):
                return None
            if any(ev(n, d) is not None for n in neg):
                return None
            return sum(vals)
        raise AssertionError(node)

    docs = spark.createDataFrame(rows, "doc_id INT, text STRING")
    fields = {
        "title": docs.select(
            "doc_id",
            F.concat_ws(" ", F.slice(F.split("text", " "), 1, 2)).alias("text"),
        ),
        "body": docs.select("doc_id", "text"),
    }

    checked = 0
    for _ in range(40):
        q = qgen()
        ast = parse_query(q, frozenset(["title", "body"]))
        try:
            got = {
                r["doc_id"]: r["score"]
                for r in search_composed(fields, q, topk=100).collect()
            }
        except ValueError:
            continue  # e.g. purely-negative tree the executor rejects
        want = {d: ev(ast, d) for d, _ in rows}
        want = {d: v for d, v in want.items() if v is not None}
        assert got == want, f"query {q!r}: {got} != {want}"
        checked += 1
    assert checked >= 25  # the generator must mostly produce valid queries
