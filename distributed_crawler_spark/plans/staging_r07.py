"""Round-7 STAGED queries — implemented, oracled, and locally verified
this round, but intentionally NOT registered in plans/registry.py yet.

Why staged: the driver validates the FIRST 50 registry entries per
round, and the round-6 window is exactly full of first-row queries (see
registry._DRIVER_WINDOW_PRIORITY) — registering more now would either
evict a query that still needs its first driver row or create entries
that can never be rowed this round, breaking the cross-round freshness
invariant ("every registry query has >= 1 driver row").  The same
pattern banked graph.host_link_features for r07 (NEXT.md).

Every entry here has the SAME contract as a registry entry — a
``(spark, sf_dir) -> DataFrame`` callable plus a DuckDB oracle SQL with
matching column aliases — and tests/test_staging_r07.py runs the exact
driver-twin comparison (row count, schema, order-insensitive values)
over them every pytest run.  Promotion at r07 is mechanical: move the
entries into registry.py and add the names to the driver window.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
ORACLES: dict[str, str] = {}


def q(name: str, sql: str | None):
    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# =========================================================================
# Generalized suffix array + exact substring dedup (operators/suffix.py)
# =========================================================================
# The oracle sorts suffix STRINGS directly (feasible at oracle scale);
# joined-with-space string order equals token-wise order here because
# every token character sorts above ' ' (corpus tokens are lowercase
# words/digits — asserted in tests/test_suffix.py).

_SA_CTES = """t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents WHERE length(text) > 0),
s AS (SELECT doc_id, unnest(range(1, len(toks)+1)) AS pos, toks FROM t),
sa AS (SELECT doc_id, pos, toks,
       row_number() OVER (ORDER BY array_to_string(list_slice(toks, pos, len(toks)), ' '), doc_id, pos) AS sa_rank
       FROM s)"""

_SA_SAMPLE_SQL = f"""WITH {_SA_CTES}
SELECT sa_rank, doc_id, pos::INT AS pos
FROM sa WHERE sa_rank % 97 = 1 ORDER BY sa_rank"""


@q("suffix_array_sample", _SA_SAMPLE_SQL)
def q_suffix_array_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 97th entry of the generalized token-level suffix array over
    the documents table — a deterministic systematic sample that pins
    the EXACT global rank of ~1% of all suffixes (a single wrong
    comparison anywhere in the doubling reorders some sampled rank).
    The Spark side never materializes suffix strings (prefix doubling,
    operators/suffix.py); the oracle sorts them directly."""
    from ..operators.suffix import suffix_array

    docs = _read(spark, sf_dir, "documents")
    sa = suffix_array(docs)
    return (
        sa.filter(F.col("sa_rank") % 97 == 1)
        .select("sa_rank", "doc_id", F.col("pos").cast("int").alias("pos"))
        .orderBy("sa_rank")
    )


# island CTE chain shared by exact_substr_dups and exact_substr_removal:
# direct suffix sort -> adjacent LCP -> >=8-token runs -> cross-doc
# islands -> mspans = (doc_id, pos, dup_len) member spans
_ISLAND_CTES = f"""{_SA_CTES},
edges AS (
  SELECT a.sa_rank,
         list_slice(a.toks, a.pos, len(a.toks)) AS ta,
         list_slice(b.toks, b.pos, len(b.toks)) AS tb
  FROM sa a JOIN sa b ON b.sa_rank = a.sa_rank + 1),
lcps AS (
  SELECT sa_rank, CASE WHEN fp = 0 THEN m ELSE fp - 1 END AS lcp
  FROM (SELECT sa_rank,
               list_position(list_transform(range(1, least(len(ta), len(tb))+1), i -> ta[i] = tb[i]), false) AS fp,
               least(len(ta), len(tb)) AS m
        FROM edges)),
strong AS (SELECT * FROM lcps WHERE lcp >= 8),
memb AS (SELECT sa_rank, lcp FROM strong UNION ALL SELECT sa_rank + 1, lcp FROM strong),
mem AS (SELECT sa_rank, max(lcp) AS dup_len FROM memb GROUP BY sa_rank),
flg AS (SELECT m.sa_rank, m.dup_len,
        CASE WHEN EXISTS (SELECT 1 FROM strong st WHERE st.sa_rank = m.sa_rank - 1) THEN 0 ELSE 1 END AS strt
        FROM mem m),
isl AS (SELECT sa_rank, dup_len, sum(strt) OVER (ORDER BY sa_rank) AS island FROM flg),
wd AS (SELECT i.*, s.doc_id, s.pos FROM isl i JOIN sa s USING (sa_rank)),
xd AS (SELECT island FROM wd GROUP BY island HAVING count(DISTINCT doc_id) >= 2),
mspans AS (SELECT doc_id, pos, dup_len FROM wd WHERE island IN (SELECT island FROM xd))"""

_EXACT_DUPS_SQL = f"""WITH {_ISLAND_CTES}
SELECT doc_id, count(*)::BIGINT AS n_dup_starts, max(dup_len)::BIGINT AS max_dup_len
FROM mspans
GROUP BY doc_id ORDER BY doc_id"""


@q("exact_substr_dups", _EXACT_DUPS_SQL)
def q_exact_substr_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT cross-document duplicated-substring report (ExactSubstr,
    Lee et al. 2022) at min_len=8 tokens — the exact counterpart of the
    probabilistic span-fingerprint gate (dedup.py dup_span_stats): per
    doc, how many token positions start a >= 8-token span that also
    appears in another document, and the longest such span.  Built on
    the suffix array + rank-adjacent LCP; the oracle replays the same
    run/island semantics over a directly-sorted suffix list."""
    from ..operators.suffix import exact_substr_dups

    docs = _read(spark, sf_dir, "documents")
    return exact_substr_dups(docs, min_len=8)


_EXACT_REMOVAL_SQL = f"""WITH {_ISLAND_CTES},
cov AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + dup_len)) AS p FROM mspans),
toks2 AS (SELECT doc_id, unnest(range(1, len(toks)+1)) AS p, toks FROM t),
kept AS (SELECT t2.doc_id, t2.p, t2.toks[t2.p] AS tok
         FROM toks2 t2
         WHERE NOT EXISTS (SELECT 1 FROM cov c WHERE c.doc_id = t2.doc_id AND c.p = t2.p)),
reb AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
               string_agg(tok, ' ' ORDER BY p) AS text_dedup
        FROM kept GROUP BY doc_id),
base AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens FROM t)
SELECT b.doc_id, b.n_tokens,
       (b.n_tokens - coalesce(r.n_kept, 0))::BIGINT AS n_removed,
       coalesce(r.text_dedup, '') AS text_dedup
FROM base b LEFT JOIN reb r USING (doc_id) ORDER BY b.doc_id"""


@q("exact_substr_removal", _EXACT_REMOVAL_SQL)
def q_exact_substr_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTION for exact_substr_dups (suffix.remove_exact_spans):
    delete every >= 8-token cross-document duplicated span (overlaps
    unioned) and rebuild the residual text in token order — ExactSubstr
    removal per Lee et al. 2022, the exact twin of the probabilistic
    dedup_remove_spans.  Oracle replays the same island spans, coverage
    union, and ordered rebuild in SQL."""
    from ..operators.suffix import remove_exact_spans

    docs = _read(spark, sf_dir, "documents")
    return remove_exact_spans(docs, min_len=8)


# =========================================================================
# TrustRank (graph.trustrank_int) over the generator link graph
# =========================================================================

_TRUST_MOD = 17  # seeds: doc_id % 17 == 0 — deterministic, SQL-mirrorable


def _trustrank_ctes(iters: int = 5) -> list[str]:
    """Unrolled integer TrustRank fixpoint — pagerank's CTE chain with
    the teleport base confined to the seed set."""
    from ..corpus import LINK_COEFFS

    scale, num, den = 1_000_000, 85, 100
    base = (scale * (den - num)) // den
    unions = "\n  UNION ALL\n".join(
        f"  SELECT doc_id AS src, ({a} * doc_id + {b}) % nn.n AS dst FROM documents, nn"
        for a, b in LINK_COEFFS
    )
    seed = f"doc_id % {_TRUST_MOD} = 0"
    ctes = [
        "nn AS (SELECT count(*) AS n FROM documents)",
        f"edges AS (\n{unions}\n)",
        "odeg AS (SELECT src, count(*) AS od FROM edges GROUP BY src)",
        f"s0 AS (SELECT doc_id AS node, (CASE WHEN {seed} THEN {scale} ELSE 0 END)::BIGINT AS score FROM documents)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""c{i} AS (
  SELECT e.dst, sum(s.score // o.od) AS inc
  FROM edges e JOIN s{i-1} s ON s.node = e.src JOIN odeg o ON o.src = e.src
  GROUP BY e.dst
)"""
        )
        ctes.append(
            f"""s{i} AS (
  SELECT s.node,
         ((CASE WHEN s.node % {_TRUST_MOD} = 0 THEN {base} ELSE 0 END)
          + ({num} * coalesce(c.inc, 0)) // {den})::BIGINT AS score
  FROM s{i-1} s LEFT JOIN c{i} c ON c.dst = s.node
)"""
        )
    return ctes


def _trustrank_sql(iters: int = 5) -> str:
    body = ",\n".join(_trustrank_ctes(iters))
    return f"WITH {body}\nSELECT node AS doc_id, score FROM s{iters} ORDER BY doc_id"


@q("trustrank", _trustrank_sql())
def q_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank over the crawl model's link graph: integer PageRank
    with teleport mass confined to the trusted seed set (doc_id %
    17 == 0), 5 iterations, damping 85/100 — the web-spam demotion
    signal (Gyöngyi et al. 2004) to pair with [[host_pagerank]]'s
    authority and host_link_features' spam ratios.  Bit-exact integer
    arithmetic; the oracle unrolls the same 5 rounds with the
    seed-conditional base."""
    from ..corpus import _doc_count, LINK_COEFFS
    from ..operators.graph import trustrank_int

    docs = _read(spark, sf_dir, "documents")
    n = F.lit(_doc_count(spark, sf_dir))
    d = F.col("doc_id")
    edges = docs.select(
        d.alias("src"),
        F.explode(
            F.array(*[(F.lit(a) * d + F.lit(b)) % n for a, b in LINK_COEFFS])
        ).alias("dst"),
    )
    nodes = docs.select(F.col("doc_id").alias("node"))
    seeds = docs.filter(d % _TRUST_MOD == 0).select(F.col("doc_id").alias("node"))
    return (
        trustrank_int(nodes, edges, seeds, iters=5)
        .select(F.col("node").alias("doc_id"), "score")
        .orderBy("doc_id")
    )


# =========================================================================
# host_link_features (banked in graph.py since round 6 — NEXT.md asked for
# a links-CTE oracle at r07 registration time; here it is, staged)
# =========================================================================

def _hlf_sql() -> str:
    from ..corpus import HOST_MOD, MEGA_LT, MEGA_MOD
    from ..plans.registry import _MODEL

    dh = (
        f"'h' || (CASE WHEN l.dst_doc_id % {MEGA_MOD} < {MEGA_LT} THEN 0 "
        f"ELSE l.dst_doc_id % {HOST_MOD} END) || '.example.com'"
    )
    return f"""WITH {_MODEL},
he AS (
  SELECT p.host AS src, {dh} AS dst
  FROM links l JOIN pages p ON p.url = l.src_url
),
hg AS (SELECT src, dst, count(*)::BIGINT AS w FROM he GROUP BY src, dst),
inter AS (SELECT src, dst, w FROM hg WHERE src <> dst),
recip AS (
  SELECT i.src, count(*)::BIGINT AS n_recip
  FROM inter i
  WHERE EXISTS (SELECT 1 FROM inter b WHERE b.src = i.dst AND b.dst = i.src)
  GROUP BY i.src),
outs AS (
  SELECT src AS host, sum(w)::BIGINT AS out_edges,
         sum(CASE WHEN src = dst THEN w ELSE 0 END)::BIGINT AS self_edges,
         sum(CASE WHEN src <> dst THEN 1 ELSE 0 END)::BIGINT AS out_hosts
  FROM hg GROUP BY src),
ins AS (
  SELECT dst AS host, sum(w)::BIGINT AS in_edges, count(*)::BIGINT AS in_hosts
  FROM inter GROUP BY dst),
feats AS (
  SELECT coalesce(o.host, i.host) AS host,
         coalesce(o.out_edges, 0) AS out_edges,
         coalesce(i.in_edges, 0) AS in_edges,
         coalesce(o.out_hosts, 0) AS out_hosts,
         coalesce(i.in_hosts, 0) AS in_hosts,
         coalesce(o.self_edges, 0) AS self_edges
  FROM outs o FULL OUTER JOIN ins i ON i.host = o.host)
SELECT f.host,
       f.out_edges, f.in_edges, f.out_hosts, f.in_hosts,
       CASE WHEN f.out_edges > 0 THEN round(f.self_edges / f.out_edges, 4) ELSE 0.0 END AS self_frac,
       CASE WHEN f.out_hosts > 0 THEN round(coalesce(r.n_recip, 0) / f.out_hosts, 4) ELSE 0.0 END AS recip_frac
FROM feats f LEFT JOIN recip r ON r.src = f.host
ORDER BY f.host"""


@q("host_link_features", _hlf_sql())
def q_host_link_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host web-graph spam/quality features (out/in edge and
    distinct-counterparty counts, self-link fraction, reciprocity
    fraction) over the crawl model's link graph — the RefinedWeb-style
    domain gating signals.  graph.host_link_features contracts the page
    graph to weighted host edges in ONE shuffle; the oracle re-derives
    the same features from the model links CTE."""
    from ..corpus import host_id_for_doc, _doc_count, LINK_COEFFS
    from ..operators.graph import host_link_features

    docs = _read(spark, sf_dir, "documents")
    n = F.lit(_doc_count(spark, sf_dir))
    d = F.col("doc_id")
    host = lambda c: F.concat(
        F.lit("h"), host_id_for_doc(c).cast("string"), F.lit(".example.com")
    )
    edges = docs.select(
        host(d).alias("src_host"),
        F.explode(
            F.array(*[(F.lit(a) * d + F.lit(b)) % n for a, b in LINK_COEFFS])
        ).alias("t"),
    ).select("src_host", host(F.col("t")).alias("dst_host"))
    return host_link_features(edges).orderBy("host")


# =========================================================================
# Related hosts by co-citation (graph.related_hosts)
# =========================================================================

def _related_hosts_sql(topk: int = 3, max_out: int = 8) -> str:
    from ..corpus import HOST_MOD, MEGA_LT, MEGA_MOD
    from ..plans.registry import _MODEL

    dh = (
        f"'h' || (CASE WHEN l.dst_doc_id % {MEGA_MOD} < {MEGA_LT} THEN 0 "
        f"ELSE l.dst_doc_id % {HOST_MOD} END) || '.example.com'"
    )
    return f"""WITH {_MODEL},
he AS (
  SELECT p.host AS src, {dh} AS dst
  FROM links l JOIN pages p ON p.url = l.src_url
),
hg AS (SELECT src, dst, count(*) AS w FROM he GROUP BY src, dst),
inter AS (SELECT src, dst, w FROM hg WHERE src <> dst),
capped AS (
  SELECT src, dst FROM (
    SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS r
    FROM inter) WHERE r <= {max_out}),
pairs AS (
  SELECT x.dst AS a, y.dst AS b
  FROM capped x JOIN capped y USING (src)
  WHERE x.dst <> y.dst),
cocite AS (SELECT a, b, count(*)::BIGINT AS cocitations FROM pairs GROUP BY a, b),
ranked AS (
  SELECT a, b, cocitations,
         row_number() OVER (PARTITION BY a ORDER BY cocitations DESC, b) AS rnk
  FROM cocite)
SELECT a AS host, b AS related, cocitations, rnk::INT AS rank
FROM ranked WHERE rnk <= {topk}
ORDER BY host, rank"""


@q("related_hosts", _related_hosts_sql())
def q_related_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Related hosts by co-citation over the crawl model's link graph
    (graph.related_hosts — Dean & Henzinger related-pages contracted to
    hosts): sources' neighbor lists capped to the 8 strongest edges
    (bounding the pair explosion at sources * cap^2 regardless of hub
    size), then one self-join + count + per-host top-3.  Pure graph
    similarity — the no-content 'similar sites' signal."""
    from ..corpus import host_id_for_doc, _doc_count, LINK_COEFFS
    from ..operators.graph import related_hosts

    docs = _read(spark, sf_dir, "documents")
    n = F.lit(_doc_count(spark, sf_dir))
    d = F.col("doc_id")
    host = lambda c: F.concat(
        F.lit("h"), host_id_for_doc(c).cast("string"), F.lit(".example.com")
    )
    edges = docs.select(
        host(d).alias("src_host"),
        F.explode(
            F.array(*[(F.lit(a) * d + F.lit(b)) % n for a, b in LINK_COEFFS])
        ).alias("t"),
    ).select("src_host", host(F.col("t")).alias("dst_host"))
    return related_hosts(edges, topk=3, max_out=8)


# =========================================================================
# Composed per-host quality report (authority x spam features x related)
# =========================================================================

def _host_report_sql() -> str:
    """One oracle composing three independently-oracled derivations:
    weighted host PageRank (unrolled integer CTEs), link spam/quality
    features, and the top co-cited related host — the per-host table a
    crawl scheduler and a corpus curator both read."""
    from ..corpus import HOST_MOD, LINK_COEFFS, MEGA_LT, MEGA_MOD

    scale, num, den = 1_000_000, 85, 100
    base = (scale * (den - num)) // den

    def h(col: str) -> str:
        return (
            f"CASE WHEN {col} % {MEGA_MOD} < {MEGA_LT} THEN 0"
            f" ELSE {col} % {HOST_MOD} END"
        )

    unions = "\n    UNION ALL\n".join(
        f"    SELECT {h('doc_id')} AS s_host,"
        f" {h(f'(({a} * doc_id + {b}) % nn.n)')} AS d_host"
        f" FROM documents, nn"
        for a, b in LINK_COEFFS
    )
    ctes = [
        "nn AS (SELECT count(*) AS n FROM documents)",
        f"he AS (\n  SELECT s_host, d_host, count(*) AS w FROM (\n{unions}\n  ) GROUP BY s_host, d_host\n)",
        f"hosts AS (SELECT DISTINCT {h('doc_id')} AS node FROM documents)",
        "odeg AS (SELECT s_host, sum(w) AS od FROM he GROUP BY s_host)",
        f"s0 AS (SELECT node, {scale}::BIGINT AS score FROM hosts)",
    ]
    iters = 5
    for i in range(1, iters + 1):
        ctes.append(
            f"""c{i} AS (
  SELECT e.d_host AS dst, sum((s.score * e.w) // o.od) AS inc
  FROM he e JOIN s{i-1} s ON s.node = e.s_host JOIN odeg o ON o.s_host = e.s_host
  GROUP BY e.d_host
)"""
        )
        ctes.append(
            f"""s{i} AS (
  SELECT s.node, ({base} + ({num} * coalesce(c.inc, 0)) // {den})::BIGINT AS score
  FROM s{i-1} s LEFT JOIN c{i} c ON c.dst = s.node
)"""
        )
    ctes += [
        "inter AS (SELECT s_host, d_host, w FROM he WHERE s_host <> d_host)",
        """recip AS (
  SELECT i.s_host, count(*)::BIGINT AS n_recip FROM inter i
  WHERE EXISTS (SELECT 1 FROM inter b WHERE b.s_host = i.d_host AND b.d_host = i.s_host)
  GROUP BY i.s_host)""",
        """outs AS (
  SELECT s_host AS node, sum(w)::BIGINT AS out_edges,
         sum(CASE WHEN s_host = d_host THEN w ELSE 0 END)::BIGINT AS self_edges,
         sum(CASE WHEN s_host <> d_host THEN 1 ELSE 0 END)::BIGINT AS out_hosts
  FROM he GROUP BY s_host)""",
        """ins AS (
  SELECT d_host AS node, sum(w)::BIGINT AS in_edges, count(*)::BIGINT AS in_hosts
  FROM inter GROUP BY d_host)""",
        # tie-breaks use the HOST STRING form ('h'||id||'.example.com'),
        # matching the Spark side, which caps/ranks string-keyed host
        # frames ('h10...' sorts before 'h2...' as a string)
        """capped AS (
  SELECT s_host, d_host FROM (
    SELECT s_host, d_host,
           row_number() OVER (PARTITION BY s_host
                              ORDER BY w DESC, 'h' || d_host || '.example.com') AS r
    FROM inter) WHERE r <= 8)""",
        """cocite AS (
  SELECT x.d_host AS a, y.d_host AS b, count(*)::BIGINT AS cocitations
  FROM capped x JOIN capped y USING (s_host)
  WHERE x.d_host <> y.d_host GROUP BY a, b)""",
        """rel1 AS (
  SELECT a AS node, b AS top_related_id, cocitations FROM (
    SELECT a, b, cocitations,
           row_number() OVER (PARTITION BY a
                              ORDER BY cocitations DESC, 'h' || b || '.example.com') AS r
    FROM cocite) WHERE r = 1)""",
        f"""rep AS (
  SELECT s.node, s.score,
         coalesce(o.out_edges, 0) AS out_edges,
         coalesce(i.in_edges, 0) AS in_edges,
         coalesce(i.in_hosts, 0) AS in_hosts,
         CASE WHEN coalesce(o.out_edges, 0) > 0
              THEN round(coalesce(o.self_edges, 0) / o.out_edges, 4) ELSE 0.0 END AS self_frac,
         CASE WHEN coalesce(o.out_hosts, 0) > 0
              THEN round(coalesce(r.n_recip, 0) / o.out_hosts, 4) ELSE 0.0 END AS recip_frac,
         coalesce('h' || r1.top_related_id || '.example.com', '') AS top_related,
         coalesce(r1.cocitations, 0) AS top_cocitations
  FROM s{iters} s
  LEFT JOIN outs o ON o.node = s.node
  LEFT JOIN ins i ON i.node = s.node
  LEFT JOIN recip r ON r.s_host = s.node
  LEFT JOIN rel1 r1 ON r1.node = s.node)""",
    ]
    body = ",\n".join(ctes)
    return f"""WITH {body}
SELECT 'h' || node || '.example.com' AS host, score,
       row_number() OVER (ORDER BY score DESC, 'h' || node || '.example.com') AS authority_rank,
       out_edges, in_edges, in_hosts, self_frac, recip_frac,
       top_related, top_cocitations
FROM rep ORDER BY authority_rank"""


@q("host_report", _host_report_sql())
def q_host_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed per-host quality table (crawl-scheduler AND
    corpus-curation view): weighted integer host PageRank + link
    spam/quality features + top co-cited related host + a global
    authority rank — three independently-oracled derivations joined on
    the host key, with the global rank computed by the distributed
    row-number (range-partition + broadcast offsets), never a
    single-partition window.  All-integer/rounded-float columns, so
    the composition is hash-exact across engines."""
    from ..corpus import _doc_count, LINK_COEFFS, host_id_for_doc
    from ..operators.graph import host_link_features, pagerank_int, related_hosts
    from ..operators.suffix import global_row_number

    docs = _read(spark, sf_dir, "documents")
    n = F.lit(_doc_count(spark, sf_dir))
    d = F.col("doc_id")
    hid = host_id_for_doc(d)
    host_str = lambda c: F.concat(F.lit("h"), c.cast("string"), F.lit(".example.com"))
    hedges_id = (
        docs.select(hid.alias("src"), F.explode(
            F.array(*[(F.lit(a) * d + F.lit(b)) % n for a, b in LINK_COEFFS])
        ).alias("t"))
        .select("src", host_id_for_doc(F.col("t")).alias("dst"))
    )
    hosts = docs.select(hid.alias("node")).distinct()
    pr = pagerank_int(
        hosts,
        hedges_id.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w")),
        iters=5,
        weight="w",
    ).select(host_str(F.col("node")).alias("host"), "score")
    sedges = hedges_id.select(
        host_str(F.col("src")).alias("src_host"),
        host_str(F.col("dst")).alias("dst_host"),
    )
    feats = host_link_features(sedges).select(
        "host", "out_edges", "in_edges", "in_hosts", "self_frac", "recip_frac"
    )
    rel1 = (
        related_hosts(sedges, topk=1, max_out=8)
        .select(
            "host",
            F.col("related").alias("top_related"),
            F.col("cocitations").alias("top_cocitations"),
        )
    )
    rep = (
        pr.join(feats, "host", "left")
        .join(rel1, "host", "left")
        .na.fill({"out_edges": 0, "in_edges": 0, "in_hosts": 0,
                  "top_related": "", "top_cocitations": 0})
        .na.fill({"self_frac": 0.0, "recip_frac": 0.0})
    )
    ranked = global_row_number(
        rep.withColumn("__neg", -F.col("score")), ["__neg", "host"],
        "authority_rank",
    ).drop("__neg")
    return ranked.select(
        "host", "score", "authority_rank", "out_edges", "in_edges",
        "in_hosts", "self_frac", "recip_frac", "top_related",
        "top_cocitations",
    ).orderBy("authority_rank")


# =========================================================================
# Writing-script profile (textstats.script_profile)
# =========================================================================
# The synthetic corpus is pure ASCII, so the query derives a
# deterministic multiscript variant in-flight (vowels remapped per
# doc_id residue — the SAME translate() on both engines) and profiles
# that; the operator itself is corpus-agnostic.

_SCRIPT_VARIANT_CASES = [
    (1, "aeiou", "αεηιυ"),  # Greek vowels
    (2, "aeiou", "аеиоу"),  # Cyrillic vowels
    (3, "ot", "おた"),       # Hiragana on two frequent consonant letters
]


def _script_detect_sql() -> str:
    from ..operators.textstats import DEFAULT_SCRIPTS

    var = "CASE " + " ".join(
        f"WHEN doc_id % 4 = {r} THEN translate(text, '{f}', '{t}')"
        for r, f, t in _SCRIPT_VARIANT_CASES
    ) + " ELSE text END"
    counts = ",\n         ".join(
        f"(length(t) - length(translate(t, '{alpha}', '')))::BIGINT AS n_{name}"
        for name, alpha in sorted(DEFAULT_SCRIPTS.items())
    )
    names = sorted(DEFAULT_SCRIPTS)
    structs = ", ".join(
        f"{{'n': n_{name}, 's': '{name}'}}" for name in names
    )
    total = " + ".join(f"n_{name}" for name in names)
    cols = ", ".join(f"n_{name}" for name in names)
    return f"""WITH v AS (SELECT doc_id, {var} AS t FROM documents),
c AS (SELECT doc_id,
         {counts}
      FROM v),
b AS (SELECT doc_id, {cols}, {total} AS tot,
             (SELECT max(p) FROM (SELECT unnest([{structs}]) AS p)) AS bp
      FROM c)
SELECT doc_id, {cols},
       CASE WHEN bp.n > 0 THEN bp.s ELSE 'none' END AS script,
       CASE WHEN tot > 0 THEN round(bp.n / tot, 4) ELSE 0.0 END AS confidence
FROM b ORDER BY doc_id"""


@q("script_detect", _script_detect_sql())
def q_script_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writing-script histogram + dominant script per document
    (textstats.script_profile) over a deterministic multiscript variant
    of the corpus — the CLD3-style script prior upstream of marker-word
    language ID.  Pure map, zero shuffles, translate()-based counting
    (no regex, no explode); identical translate arithmetic on both
    engines."""
    from ..operators.textstats import script_profile

    docs = _read(spark, sf_dir, "documents")
    t = F.col("text")
    for r, src, dst in _SCRIPT_VARIANT_CASES:
        t = F.when(F.col("doc_id") % 4 == r, F.translate(F.col("text"), src, dst)).otherwise(t)
    variant = docs.select("doc_id", t.alias("text"))
    return script_profile(variant).orderBy("doc_id")


# =========================================================================
# Content-defined chunking dedup (dedup.cdc_chunk_stats)
# =========================================================================

def _cdc_sql(window: int = 8, base: int = 31, modulus: int = 1 << 20, divisor: int = 64) -> str:
    pows = [pow(base, j, modulus) for j in range(window)]
    return f"""WITH c0 AS (SELECT doc_id, text AS t FROM documents WHERE length(text) > 0),
c1 AS (SELECT doc_id, t,
       list_transform(range(1, length(t)+1), i -> ord(t[i:i])::BIGINT) AS codes
       FROM c0),
c2 AS (SELECT doc_id, t,
       list_filter(range({window}, greatest(length(t), {window})), i ->
         i < length(t) AND
         (list_sum(list_transform(range(0, {window}), j -> codes[i-j] * ({pows})[j+1])))::BIGINT % {modulus} % {divisor} = 0) AS cuts
       FROM c1),
chunks AS (
  SELECT doc_id, unnest(list_transform(range(1, len(cuts)+2), k ->
     t[(CASE WHEN k = 1 THEN 0 ELSE cuts[k-1] END) + 1 :
       CASE WHEN k <= len(cuts) THEN cuts[k] ELSE length(t) END])) AS chunk
  FROM c2),
freq AS (SELECT chunk, count(DISTINCT doc_id) AS nd FROM chunks GROUP BY chunk)
SELECT c.doc_id,
       count(*)::BIGINT AS n_chunks,
       sum(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_shared,
       sum(CASE WHEN f.nd >= 2 THEN length(c.chunk) ELSE 0 END)::BIGINT AS shared_chars
FROM chunks c JOIN freq f USING (chunk)
GROUP BY c.doc_id ORDER BY c.doc_id"""


# =========================================================================
# Exact global quantiles + exact heavy hitters (operators/stats.py)
# =========================================================================

_QUANTILES_SQL = """WITH r AS (
  SELECT value AS v, event_id AS t,
         row_number() OVER (ORDER BY value, event_id) AS rn
  FROM events),
n AS (SELECT count(*) AS n FROM events),
q AS (SELECT unnest([500, 900, 950, 990]) AS permille),
tg AS (SELECT q.permille::INT AS permille,
              greatest(1, (q.permille * n.n + 999) // 1000) AS rn
       FROM q, n)
SELECT tg.permille, r.v AS value
FROM tg JOIN r USING (rn) ORDER BY tg.permille"""


@q("exact_quantiles", _QUANTILES_SQL)
def q_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p50/p90/p95/p99 of the events value column (fetch-latency
    analog) — stats.exact_quantiles: rank selection over a distributed
    row number (range-partition + broadcast offsets, never a
    single-partition sort), integer permille rank arithmetic so both
    engines pick the identical existing element; the monitoring
    contract approxQuantile's epsilon can't serve."""
    from ..operators.stats import exact_quantiles

    events = _read(spark, sf_dir, "events")
    return exact_quantiles(events, "value", "event_id")


_HEAVY_SQL = """WITH n AS (SELECT count(*) AS n FROM events)
SELECT user_id, count(*)::BIGINT AS cnt
FROM events, n
GROUP BY user_id, n.n
HAVING count(*) * 20 > n.n
ORDER BY cnt DESC, user_id"""


@q("heavy_hitters", _HEAVY_SQL)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (count > n/20) over the events user column —
    stats.heavy_hitters: bounded-memory Misra-Gries candidate sweep
    (mapInPandas, k counters/partition, guaranteed-superset bound) then
    broadcast-semi-join exact verification; the per-host/per-user skew
    detector a crawl monitor runs continuously.  Output exact, so the
    oracle is the plain SQL threshold query."""
    from ..operators.stats import heavy_hitters

    events = _read(spark, sf_dir, "events")
    return heavy_hitters(events, "user_id", k=20)


# =========================================================================
# Unigram-LM (SentencePiece) Viterbi segmentation (bpe.unigram_viterbi_stats)
# =========================================================================

_UNIGRAM_VOCAB = {
    **{c: 100 for c in "abcdefghijklmnopqrstuvwxyz0123456789"},
    **{p: 70 for p in [
        "er", "in", "at", "st", "or", "an", "te", "co", "ro", "ha",
        "fa", "jo", "ta", "al", "um", "as", "ow", "ve", "ue", "ey",
    ]},
    **{p: 90 for p in [
        "ing", "ter", "ast", "col", "row", "dat", "has", "umn", "ord",
        "que", "joi", "fas", "val", "vec", "tor", "ine",
    ]},
}
_UNIGRAM_MAXW = 16


def _unigram_sql(vocab: dict[str, int] = _UNIGRAM_VOCAB, max_w: int = _UNIGRAM_MAXW) -> str:
    max_piece = max(len(k) for k in vocab)
    keys = ", ".join(f"'{k}'" for k in sorted(vocab))
    vals = ", ".join(str(int(vocab[k]) * 64 + 1) for k in sorted(vocab))
    inf = 1 << 55
    ctes = [
        f"""toks AS (
  SELECT doc_id, t.word FROM documents,
         LATERAL (SELECT unnest(string_split(text, ' ')) AS word) t
  WHERE t.word <> '' AND length(t.word) <= {max_w})""",
        "words AS (SELECT DISTINCT word FROM toks)",
        "d0 AS (SELECT word, [0::BIGINT] AS dp FROM words)",
    ]
    for i in range(1, max_w + 1):
        ctes.append(
            f"""d{i} AS (SELECT word, CASE WHEN length(word) >= {i} THEN list_append(dp,
    list_min(list_transform(range(greatest(1, {i} - {max_piece} + 1), {i} + 1), j ->
      dp[j] + coalesce(element_at(map([{keys}], [{vals}]), word[j:{i}])[1], {inf}::BIGINT))))
  ELSE dp END AS dp FROM d{i-1})"""
        )
    ctes.append(
        f"seg AS (SELECT word, dp[length(word)+1] AS c FROM d{max_w})"
    )
    ctes.append(
        "ws AS (SELECT word, c // 64 AS w_cost, c % 64 AS w_pieces FROM seg)"
    )
    body = ",\n".join(ctes)
    return f"""WITH {body}
SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
       sum(w.w_cost)::BIGINT AS total_cost,
       sum(w.w_pieces)::BIGINT AS total_pieces
FROM toks t JOIN ws w USING (word)
GROUP BY t.doc_id ORDER BY t.doc_id"""


@q("unigram_segment", _unigram_sql())
def q_unigram_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece, Kudo 2018) Viterbi segmentation stats
    over a fixed integer-cost vocabulary — the other production
    tokenizer family beside [[bpe_learn]]/bpe_encode: per doc, token
    count, total min segmentation cost, and total piece count.  The
    Viterbi DP runs NATIVELY in Catalyst (aggregate/transform/array_min
    + one map-literal lookup per piece candidate — zero UDFs), once per
    DISTINCT word; cost and piece count share one long (cost*64 +
    pieces) so min() is the (cost, pieces) lexicographic argmin and the
    oracle replays the identical DP as unrolled CTE steps."""
    from ..operators.bpe import unigram_viterbi_stats

    docs = _read(spark, sf_dir, "documents")
    return unigram_viterbi_stats(
        docs, _UNIGRAM_VOCAB, max_word_len=_UNIGRAM_MAXW
    )


# =========================================================================
# Percolation / saved-search alerting (search.percolate)
# =========================================================================

_PERC_QUERIES = {
    "q_fast_join": ["fast", "join"],
    "q_spark_window_join": ["spark", "window", "join"],
    "q_vector": ["vector"],
    "q_never": ["zzznotinvocab"],
}


def _percolate_sql() -> str:
    values = ", ".join(
        f"('{qid}', '{t}')" for qid, ts in sorted(_PERC_QUERIES.items()) for t in ts
    )
    return f"""WITH q AS (SELECT * FROM (VALUES {values}) v(query_id, term)),
need AS (SELECT query_id, count(DISTINCT term) AS need FROM q GROUP BY query_id),
toks AS (
  SELECT DISTINCT doc_id, t.term FROM documents,
         LATERAL (SELECT unnest(string_split(text, ' ')) AS term) t
  WHERE t.term <> ''),
hits AS (
  SELECT q.query_id, toks.doc_id, count(DISTINCT toks.term) AS got
  FROM toks JOIN q USING (term) GROUP BY q.query_id, toks.doc_id)
SELECT h.query_id, h.doc_id FROM hits h JOIN need n USING (query_id)
WHERE h.got = n.need ORDER BY h.query_id, h.doc_id"""


@q("percolate", _percolate_sql())
def q_percolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse search / saved-search alerting (the Elasticsearch
    percolator semantics): four stored conjunctive term queries —
    including one that can never match — evaluated against the corpus
    in ONE broadcast join + one (query, doc) aggregate
    (search.percolate); no per-query scans."""
    from ..operators.search import percolate

    docs = _read(spark, sf_dir, "documents")
    qdf = spark.createDataFrame(
        [(qid, ts) for qid, ts in sorted(_PERC_QUERIES.items())],
        "query_id STRING, terms ARRAY<STRING>",
    )
    return percolate(docs, qdf)


# =========================================================================
# Index capacity planning (search.postings_gamma_size)
# =========================================================================

_GAMMA_SQL = """WITH toks AS (
  SELECT doc_id, t.term FROM documents,
         LATERAL (SELECT unnest(string_split(text, ' ')) AS term) t
  WHERE t.term <> ''
),
p AS (SELECT DISTINCT doc_id, term FROM toks),
g AS (SELECT term, doc_id,
      coalesce(doc_id - lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id), doc_id + 1) AS gap
      FROM p),
b AS (SELECT term, count(*) AS df, sum(2*length(printf('%b', gap)) - 1) AS bits FROM g GROUP BY term)
SELECT term, df::BIGINT AS df, bits::BIGINT AS gamma_bits,
       round(bits / df, 4) AS bits_per_posting
FROM b ORDER BY gamma_bits DESC, term LIMIT 50"""


@q("index_size_plan", _GAMMA_SQL)
def q_index_size_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term Elias-gamma postings size (gap-encoded doc ids, exact
    bit-length arithmetic — no float log2), top 50 terms by compressed
    bits: the index capacity-planning query (Managing Gigabytes
    arithmetic) for sizing a sharded index and spotting stopword-class
    terms.  One postings shuffle + one term-partitioned window."""
    from ..operators.search import postings_gamma_size

    docs = _read(spark, sf_dir, "documents")
    return postings_gamma_size(docs, topk=50)


@q("cdc_chunks", _cdc_sql())
def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (positional Rabin-style rolling hash,
    window 8 / divisor 64) over the documents table with cross-document
    chunk dedup stats — the storage-level dedup family member
    (WARC/snapshot stores) beside the token-level ones.  Pure-map
    chunking, one content-keyed shuffle for the dedup stat; identical
    integer arithmetic on both engines."""
    from ..operators.dedup import cdc_chunk_stats

    docs = _read(spark, sf_dir, "documents")
    return cdc_chunk_stats(docs).orderBy("doc_id")
