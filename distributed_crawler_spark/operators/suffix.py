"""Generalized suffix array over a tokenized corpus by prefix doubling,
plus rank-adjacent LCP and EXACT duplicated-substring detection — the
ExactSubstr half of Lee et al. 2022 ("Deduplicating Training Data Makes
Language Models Better"), whose probabilistic approximation lives in
operators/dedup.py (span fingerprints).  The reference has no analog
(its dedup is a whole-URL DynamoDB get, crawler_node.py:60-84); this is
the training-pipeline operator a 100-TB corpus needs for exact
substring-level dedup.

Algorithm notes (all public literature):
- Suffix array by PREFIX DOUBLING (Manber & Myers 1990): round k sorts
  suffixes by their first 2^k tokens using the pair (rank_k(i),
  rank_k(i + 2^k)); ceil(log2(maxlen)) rounds total.  Each round is one
  self-join on (doc, pos) plus one distributed dense-rank — shuffles
  carry (doc_id, pos, long) triples only, never suffix text, which is
  what makes the log-round formulation the 100-TB shape (a direct sort
  of suffix STRINGS shuffles O(total_text * avg_suffix_len) bytes;
  doubling shuffles O(total_tokens * log maxlen) longs).
- Dense rank / row number over a total order WITHOUT the bare
  Window.orderBy single-partition trap: range-partition on the order
  key, number within partitions, add broadcast per-partition offsets —
  the crawl_order prefix-sum shape (scheduler.py:524-545), reused here
  as `prefix_sum` / `global_row_number`.
- LCP between rank-adjacent suffixes by direct token comparison
  (zip_with + first-mismatch, all JVM-side): one hash join per side to
  re-attach token arrays — linear in corpus size, same cost class as
  any dedup pass.  (The join-free alternative — binary lifting over the
  retained per-round rank tables — trades the two corpus joins for
  2*log(maxlen) joins on (doc,pos,long) tables; at petabyte scale with
  wide documents that trade can win, noted here for the record.)
- Duplicated-substring semantics: a suffix is a *duplicated start* iff
  its rank-neighborhood shares a >= min_len token prefix, i.e. it lies
  in a maximal run of rank-consecutive suffixes whose adjacent LCPs are
  all >= min_len (every pair inside such a run shares >= min_len tokens,
  since pairwise LCP is the min of adjacent LCPs).  Runs entirely inside
  ONE document are self-repetition, not duplication, and are gated out
  (cross-doc runs only).  dup_len for a member is its max adjacent LCP
  — the length of its longest duplicated prefix with any other suffix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    val_col: str,
    out: str,
    partitions: int = 32,
    inclusive: bool = True,
) -> DataFrame:
    """Global running sum of ``val_col`` over the total order given by
    ``order_cols`` (which must be a unique key), computed without ever
    collapsing to one partition: range-partition on the order key,
    per-partition running sum, then add the exclusive per-partition
    totals (a #partitions-row broadcast).  Exact for any range
    boundaries — each partition is a contiguous slice of the order."""
    base = df.repartitionByRange(partitions, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    hi = 0 if inclusive else -1
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    base = base.withColumn(
        "__cum", F.coalesce(F.sum(val_col).over(w_in), F.lit(0))
    )
    totals = base.groupBy("__pid").agg(F.sum(val_col).alias("__n"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid", F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off")
    )
    return (
        base.join(F.broadcast(offsets), "__pid")
        .withColumn(out, (F.col("__off") + F.col("__cum")).cast("long"))
        .drop("__pid", "__cum", "__off")
    )


def global_row_number(
    df: DataFrame, order_cols: list[str], out: str, partitions: int = 32
) -> DataFrame:
    """1-based global row number over a total order whose key columns
    are unique — prefix_sum of 1s (the scalable Window.orderBy)."""
    return prefix_sum(
        df.withColumn("__one", F.lit(1)), order_cols, "__one", out, partitions
    ).drop("__one")


def _dense_rank_join(
    df: DataFrame, key_cols: list[str], out: str, partitions: int = 32
) -> DataFrame:
    """Dense rank of the key tuple, attached back to every row: rank the
    DISTINCT keys with global_row_number (unique by construction), then
    one hash join back.  The distinct + join pair is the standard
    distributed dense-rank; both shuffles carry key tuples of longs."""
    keys = df.select(*key_cols).distinct()
    ranked = global_row_number(keys, key_cols, out, partitions)
    return df.join(ranked, key_cols)


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, toks) with empty docs dropped — split on single spaces,
    mirroring the oracle's string_split(text, ' ')."""
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.split(F.col(text_col), " ").alias("toks"),
    ).filter(F.length(F.col(text_col)) > 0)


def suffix_array(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    partitions: int = 32,
) -> DataFrame:
    """Generalized (multi-document) suffix array at token granularity:
    (doc_id, pos, sa_rank) for every 1-based token position, where
    sa_rank is the 1-based position of suffix (doc_id, pos) in the
    lexicographic order of ALL suffixes (token-wise comparison, ties
    between identical suffixes broken by (doc_id, pos)).

    Prefix doubling with per-round eager localCheckpoint (the hits_int
    pattern — per-round state is one (doc,pos,long) frame and the
    lineage never grows), early-stopping as soon as every suffix holds
    a distinct rank."""
    toks = _tokens(docs, id_col, text_col)
    maxlen = toks.agg(F.max(F.size("toks"))).collect()[0][0]
    if maxlen is None:
        return docs.sparkSession.createDataFrame(
            [], "doc_id LONG, pos INT, sa_rank LONG"
        )
    s = toks.select(
        "doc_id", F.posexplode("toks").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "tok")
    cur = (
        _dense_rank_join(s, ["tok"], "rk", partitions)
        .select("doc_id", "pos", "rk")
        .localCheckpoint(eager=True)
    )
    n = cur.count()
    k = 1
    while k < maxlen:
        if cur.agg(F.max("rk")).collect()[0][0] == n:
            break  # all ranks distinct — the order is already total
        right = cur.select(
            "doc_id", (F.col("pos") - k).alias("pos"), F.col("rk").alias("rk2")
        )
        pair = cur.join(right, ["doc_id", "pos"], "left").na.fill({"rk2": 0})
        nxt = (
            _dense_rank_join(pair, ["rk", "rk2"], "nrk", partitions)
            .select("doc_id", "pos", F.col("nrk").alias("rk"))
            .localCheckpoint(eager=True)
        )
        cur = nxt
        k *= 2
    return global_row_number(
        cur, ["rk", "doc_id", "pos"], "sa_rank", partitions
    ).select("doc_id", "pos", "sa_rank")


def lcp_edges(
    docs: DataFrame,
    sa: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    partitions: int = 32,
) -> DataFrame:
    """LCP (in tokens) between rank-adjacent suffixes: one row per edge
    (sa_rank r, r+1) with the left side's identity and the token LCP.
    Token arrays are re-attached by two hash joins on doc_id; the
    compare itself is zip_with + array_position — JVM-native, no UDF."""
    if sa is None:
        sa = suffix_array(docs, id_col, text_col, partitions)
    toks = _tokens(docs, id_col, text_col)
    left = sa.alias("a")
    right = sa.select(
        (F.col("sa_rank") - 1).alias("sa_rank"),
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("pos_b"),
    ).alias("b")
    adj = left.join(right, "sa_rank")
    adj = (
        adj.join(toks.select(F.col("doc_id"), F.col("toks").alias("ta")), "doc_id")
        .join(
            toks.select(
                F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb")
            ),
            "doc_b",
        )
    )
    m = F.least(
        F.size("ta") - F.col("pos") + 1, F.size("tb") - F.col("pos_b") + 1
    )
    sl_a = F.slice(F.col("ta"), F.col("pos"), m)
    sl_b = F.slice(F.col("tb"), F.col("pos_b"), m)
    fmm = F.array_position(
        F.zip_with(sl_a, sl_b, lambda x, y: x != y), F.lit(True)
    )
    lcp = F.when(fmm == 0, m).otherwise(fmm - 1)
    return adj.select(
        "sa_rank",
        F.col("doc_id").alias("doc_a"),
        F.col("pos").alias("pos_a"),
        "doc_b",
        "pos_b",
        lcp.cast("long").alias("lcp"),
    )


def exact_substr_dups(
    docs: DataFrame,
    min_len: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    partitions: int = 32,
) -> DataFrame:
    """Exact duplicated-substring report per document: for every doc
    holding at least one CROSS-DOCUMENT duplicated span of >= min_len
    tokens, (doc_id, n_dup_starts, max_dup_len) — the number of token
    positions starting such a span and the longest duplicated prefix
    length among them.  See the module docstring for the run/island
    semantics (exactly mirrored by the staged DuckDB oracle).

    Scale shape after the suffix array: the strong-edge frame (adjacent
    LCP >= min_len) is OUTPUT-bounded — proportional to duplicated
    positions, not corpus size — and every step over it (member union,
    island prefix-sum, cross-doc gate) shuffles only that small frame
    plus one (sa_rank -> doc_id) join back to the array."""
    sa = suffix_array(docs, id_col, text_col, partitions)
    sa = sa.localCheckpoint(eager=True)  # reused by edges AND the doc join
    edges = lcp_edges(docs, sa, id_col, text_col, partitions)
    strong = edges.filter(F.col("lcp") >= min_len).select("sa_rank", "lcp")
    strong = strong.localCheckpoint(eager=True)
    # each strong edge (r, r+1) contributes BOTH endpoints; explode
    # instead of a self-union (sidesteps a Catalyst constraint-rewrite
    # crash on self-unions of checkpointed frames, and is one fewer
    # scan anyway)
    members = (
        strong.select(
            F.explode(
                F.array(F.col("sa_rank"), F.col("sa_rank") + 1)
            ).alias("sa_rank"),
            "lcp",
        )
        .groupBy("sa_rank")
        .agg(F.max("lcp").alias("dup_len"))
    )
    # island start: member with no strong edge ending at it
    starts = strong.select((F.col("sa_rank") + 1).alias("sa_rank"))
    members = members.join(
        starts.withColumn("__cont", F.lit(1)).distinct(), "sa_rank", "left"
    ).withColumn("__flag", F.when(F.col("__cont").isNull(), 1).otherwise(0))
    members = prefix_sum(
        members, ["sa_rank"], "__flag", "island", partitions
    ).drop("__cont", "__flag")
    withdoc = members.join(sa.select("sa_rank", "doc_id"), "sa_rank")
    xdoc = (
        withdoc.groupBy("island")
        .agg(F.countDistinct("doc_id").alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("island")
    )
    return (
        withdoc.join(xdoc, "island")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_starts"),
            F.max("dup_len").cast("long").alias("max_dup_len"),
        )
        .orderBy("doc_id")
    )
