"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting — all native
column expressions (JVM, codegen'd; zero Python).

These extend the reference's indexer text pipeline (indexer_node.py:75-94
tokenize/stopword/stem) to the filters a web-scale corpus pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import phash

# tiny function-word marker lists per language (n-gram heuristic stand-in:
# highest marker-hit-rate wins; 'unk' when nothing matches)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "es": ["el", "la", "los", "que", "es", "y", "un", "una"],
    "fr": ["le", "la", "les", "est", "et", "un", "une", "que"],
}

EN_STOPWORDS = [
    "the", "and", "of", "to", "a", "in", "that", "it", "is", "was",
    "for", "on", "are", "as", "with", "his", "they", "i", "at", "be",
]


def _tokens(text_col):
    return F.filter(F.split(text_col, " "), lambda t: t != "")


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword proxy count
    (alnum runs and single punctuation marks, the usual pre-tokenizer
    regex shape)."""
    toks = _tokens(F.col(text_col))
    bpe_ish = F.regexp_extract_all(
        F.col(text_col), F.lit(r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"), 0
    )
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(bpe_ish).alias("n_subword_tokens"),
        F.length(F.col(text_col)).alias("n_chars_measured"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language ID: for each language, the fraction of tokens
    that are marker words; argmax wins (ties broken by max language code).
    Returns (id, pred_lang, best_ratio).

    Plan: explode tokens once → broadcast-join a (token, langs[]) marker
    table → ONE hash aggregate per doc with conditional per-lang sums —
    everything whole-stage-codegen'd, one shuffle. (The earlier version
    ran 4 higher-order lambda filters per row; HOFs are interpreted, and
    it was 13.8 s / 31% of the bench suite at sf0.1.) Markers shared by
    two languages (la/que/un es+fr) are one row with both langs so the
    left join never duplicates token rows and n stays exact."""
    spark = docs.sparkSession
    token_langs: dict[str, list[str]] = {}
    for lang, markers in sorted(LANG_MARKERS.items()):
        for m in markers:
            token_langs.setdefault(m, []).append(lang)
    marker_df = spark.createDataFrame(
        [(t, sorted(ls)) for t, ls in sorted(token_langs.items())],
        "token STRING, langs ARRAY<STRING>",
    )

    exploded = docs.select(
        F.col(id_col),
        # explode_outer keeps empty docs as one null-token row, so the
        # aggregate still emits them (n clamps to 1, all hits 0 → 'unk')
        F.explode_outer(_tokens(F.lower(F.col(text_col)))).alias("token"),
    )
    joined = exploded.join(F.broadcast(marker_df), "token", "left")
    aggs = [
        F.greatest(
            F.sum(F.when(F.col("token").isNotNull(), 1).otherwise(0)), F.lit(1)
        ).alias("n")
    ]
    for lang in sorted(LANG_MARKERS):
        aggs.append(
            F.sum(
                F.when(F.array_contains("langs", lang), 1).otherwise(0)
            ).alias(f"h_{lang}")
        )
    per_doc = joined.groupBy(id_col).agg(*aggs)

    # argmax by (ratio, lang): array_max on structs orders by first field
    # then second, so ties deterministically pick the max lang code.
    ratio_cols = [
        F.struct(
            F.round(F.col(f"h_{lang}") / F.col("n"), 6).alias("ratio"),
            F.lit(lang).alias("lang"),
        )
        for lang in sorted(LANG_MARKERS)
    ]
    best = F.array_max(F.array(*ratio_cols))
    return per_doc.select(
        F.col(id_col),
        F.when(best["ratio"] > 0, best["lang"]).otherwise(F.lit("unk")).alias("pred_lang"),
        best["ratio"].alias("best_ratio"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score:
    length, mean word length, stopword ratio, punctuation ratio,
    alpha ratio. score = stopword_ratio·2 + alpha_ratio − punct_ratio
    clipped to [0, 3] — the usual cheap quality gate shape."""
    text = F.col(text_col)
    toks = _tokens(text)
    n_toks = F.greatest(F.size(toks), F.lit(1))
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    n_chars = F.greatest(F.length(text), F.lit(1))
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0))
    n_alpha = F.size(F.regexp_extract_all(text, F.lit(r"[a-zA-Z]"), 0))
    mean_wlen = (n_chars - (F.size(toks) - 1)) / n_toks
    stop_ratio = n_stop / n_toks
    punct_ratio = n_punct / n_chars
    alpha_ratio = n_alpha / n_chars
    score = F.least(
        F.greatest(stop_ratio * 2 + alpha_ratio - punct_ratio, F.lit(0.0)),
        F.lit(3.0),
    )
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.round(mean_wlen, 4).alias("mean_word_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprints: full-content md5, a 60-bit
    numeric fingerprint, and a normalized fingerprint (lowercased,
    whitespace-collapsed) that survives trivial reformatting."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return docs.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("content_md5"),
        phash(F.col(text_col)).alias("fingerprint"),
        F.md5(norm).alias("normalized_md5"),
    )


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1:
    high top-n-gram / duplicated-n-gram fractions mark boilerplate and
    spam): per doc,

        top2_frac = occurrences(most frequent 2-gram) * 2 / n_tokens
        dup3_frac = Σ_{3-grams with count >= 2} count * 3 / n_tokens

    token-fraction variants of the paper's character fractions (the
    synthetic corpus is uniform-length words, so they rank identically),
    both capped at 1.0 since overlapping occurrences can push the raw
    ratio over it. All native, ONE PASS: posexplode + per-doc lead()
    window, then every position emits tagged (kind, gram) entries —
    kind 1 = the token (for n_tokens), 2 = bigram, 3 = trigram — so the
    token count, top-bigram count, and duplicated-trigram mass all come
    from one tagged aggregation. The window's doc-id exchange is the
    plan's ONLY shuffle (both groupBys cluster on supersets of the id)
    — the previous three-branch form re-tokenized and re-shuffled the
    corpus once per signal (round 5, plan-asserted)."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok")
    ).filter(F.col("tok") != "")
    w = Window.partitionBy(id_col).orderBy("pos")
    grams = toks.select(
        F.col(id_col),
        F.col("tok"),
        F.lead("tok", 1).over(w).alias("t1"),
        F.lead("tok", 2).over(w).alias("t2"),
    )
    entries = F.array(
        F.struct(F.lit(1).alias("kind"), F.col("tok").alias("gram")),
        F.struct(
            F.lit(2).alias("kind"),
            F.when(
                F.col("t1").isNotNull(), F.concat_ws(" ", "tok", "t1")
            ).alias("gram"),
        ),
        F.struct(
            F.lit(3).alias("kind"),
            F.when(
                F.col("t2").isNotNull(), F.concat_ws(" ", "tok", "t1", "t2")
            ).alias("gram"),
        ),
    )
    counts = (
        grams.select(F.col(id_col), F.explode(entries).alias("e"))
        .select(id_col, F.col("e.kind").alias("kind"), F.col("e.gram").alias("gram"))
        .filter(F.col("gram").isNotNull())
        .groupBy(id_col, "kind", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    per_doc = counts.groupBy(id_col).agg(
        F.sum(F.when(F.col("kind") == 1, F.col("cnt"))).alias("n_tokens"),
        F.max(F.when(F.col("kind") == 2, F.col("cnt"))).alias("top2_cnt"),
        F.sum(
            F.when((F.col("kind") == 3) & (F.col("cnt") >= 2), F.col("cnt"))
        ).alias("dup3_cnt"),
    )
    return per_doc.select(
        F.col(id_col),
        "n_tokens",
        F.round(
            F.least(
                F.lit(1.0),
                F.coalesce(F.col("top2_cnt"), F.lit(0)) * 2.0 / F.col("n_tokens"),
            ),
            4,
        ).alias("top2_frac"),
        F.round(
            F.least(
                F.lit(1.0),
                F.coalesce(F.col("dup3_cnt"), F.lit(0)) * 3.0 / F.col("n_tokens"),
            ),
            4,
        ).alias("dup3_frac"),
    )


def hash_sample(
    docs: DataFrame,
    fraction_pct: int,
    key_col: str = "doc_id",
    seed: str = "s0",
    bucket_col: str | None = None,
) -> DataFrame:
    """DETERMINISTIC corpus sampling (the training-data down-sampling /
    mixing-weights primitive): keep a row iff
    portable_hash(seed || key) mod 100 < fraction_pct. Unlike
    DataFrame.sample(), the decision is a pure function of the key — the
    same rows are selected on every engine, every run, every partition
    layout (reproducible data recipes; per-domain quotas compose by
    keying on the domain). Uses the md5-derived portable hash
    (functions/hashing.py phash; DuckDB twin phash_sql). With
    ``bucket_col`` the 0-99 bucket is kept as an output column."""
    h = phash(F.concat(F.lit(seed), F.col(key_col).cast("string")))
    bucket = F.pmod(h, F.lit(100))
    out = docs.filter(bucket < fraction_pct)
    if bucket_col is not None:
        out = out.withColumn(bucket_col, bucket)
    return out


def domain_quota_sample(
    docs: DataFrame,
    quota: int,
    domain_col: str = "source",
    key_col: str = "doc_id",
    seed: str = "q0",
) -> DataFrame:
    """Per-domain down-sampling quota (the other half of the mixing-
    weights primitive beside hash_sample's global fraction): keep at most
    ``quota`` docs per domain, chosen by DETERMINISTIC hash order —
    uniform within the domain, reproducible on every engine/run/layout.
    Output carries ``quota_rank`` (1-based position in the domain's hash
    order). Reuses the salted two-phase budget window
    (politeness.host_budget_filter), so a mega-domain holding most of
    the corpus contributes at most salt_buckets x quota rows to the
    exact-ranking partition — the same skew bound the crawl's host
    budget carries."""
    from .politeness import host_budget_filter

    keyed = docs.withColumn(
        "__qh", phash(F.concat(F.lit(seed), F.col(key_col).cast("string")))
    )
    out = host_budget_filter(keyed, None, quota, host_col=domain_col, order_col="__qh")
    return out.drop("__qh").withColumnRenamed("host_budget_rank", "quota_rank")
