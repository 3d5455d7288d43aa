"""DataFrame-level Bloom filter for URL-seen prefiltering.

north_rule: "URL-seen dedup via a partitioned Bloom/cuckoo filter keyed
on canonicalized-URL xxhash64 that survives checkpoints". Spark 4 does
not expose ``bloom_filter_agg`` to SQL, so the filter is built AS A
DATAFRAME — which is exactly what makes it partitionable and
checkpoint-survivable: the filter is a table of 64-bit words
``(word_idx: long, bits: long)`` produced by an aggregation, persisted
like any other state table, and unioned/refreshed per round.

Correctness NEVER depends on the filter (SURVEY §7.4.3): candidates the
bloom calls "maybe seen" still go through the exact anti-join; only the
definite negatives skip it. With a fresh-heavy candidate stream (the
common case while the crawl expands) most candidates skip the big join.

Scale shape: k seeded hashes per key; the words table is m/64 rows
(m ≈ 12 bits/key ⇒ for 10^10 seen URLs ≈ 1.9 GB of words). BOTH probe
variants are implemented: k broadcast joins while the words table is
small, and a partitioned word_idx shuffle-join probe beyond the
broadcast limit (bloom_split_partitioned — words never broadcast,
probes and words co-partition on word_idx). bloom_anti_join
auto-selects by filter size; results are identical (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K_HASHES = 4
BITS_PER_KEY = 12


def _probe_hash(url, seed: int, m_bits: int):
    # two independent 64-bit hashes via seeded xxhash64 (the engine's
    # native key hash per north_rule), reduced mod m
    return F.pmod(F.xxhash64(F.concat(F.lit(f"{seed}:"), url)), F.lit(m_bits))


def build_bloom(seen: DataFrame, m_bits: int, url_col: str = "url") -> DataFrame:
    """Aggregate the seen set into bloom words: (word_idx, bits)."""
    url = F.col(url_col)
    positions = F.array(
        *[_probe_hash(url, s, m_bits) for s in range(K_HASHES)]
    )
    return (
        seen.select(F.explode(positions).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_size_bits(n_keys: int) -> int:
    return max(64, ((n_keys * BITS_PER_KEY + 63) // 64) * 64)


def bloom_split(
    candidates: DataFrame,
    bloom_words: DataFrame,
    m_bits: int,
    url_col: str = "url",
) -> tuple[DataFrame, DataFrame]:
    """Split candidates into (definitely_fresh, maybe_seen).

    k broadcast joins against the words table; a candidate is
    'maybe seen' iff EVERY probed bit is set. False positives land in
    maybe_seen and are resolved by the exact anti-join downstream —
    never dropped."""
    df = candidates
    url = F.col(url_col)
    hit_cols = []
    for s in range(K_HASHES):
        pos = _probe_hash(url, s, m_bits)
        w = bloom_words.select(
            F.col("word_idx").alias(f"__w{s}"), F.col("bits").alias(f"__b{s}")
        )
        df = df.withColumn(f"__p{s}", pos).join(
            F.broadcast(w),
            (F.col(f"__p{s}") / 64).cast("long") == F.col(f"__w{s}"),
            "left",
        )
        hit = F.col(f"__b{s}").isNotNull() & (
            F.expr(
                f"shiftright(__b{s}, CAST(pmod(__p{s}, 64) AS INT)) & 1"
            )
            == 1
        )
        hit_cols.append(hit)
        df = df.drop(f"__w{s}")
    all_hit = hit_cols[0]
    for h in hit_cols[1:]:
        all_hit = all_hit & h
    df = df.withColumn("__maybe_seen", all_hit)
    out_cols = candidates.columns
    fresh = df.filter(~F.col("__maybe_seen")).select(*out_cols)
    maybe = df.filter(F.col("__maybe_seen")).select(*out_cols)
    return fresh, maybe


def _probe_maybe_urls(
    candidates: DataFrame,
    bloom_words: DataFrame,
    m_bits: int,
    url_col: str = "url",
) -> DataFrame:
    """Partitioned probe core: explode each candidate's k probe positions,
    SHUFFLE-join the words table on word_idx (shuffle_hash hint — the
    words side is never broadcast), and keep urls where every probed bit
    is set. Returns the maybe-seen url set.

    Probes run over DISTINCT candidate urls: the sum(hit) == K test is
    per-url, so a duplicated candidate row would accumulate 2×K hits and
    leak a seen URL into the fresh side (the callers' joins against the
    returned set preserve original multiplicity either way)."""
    positions = F.array(
        *[_probe_hash(F.col("__url"), s, m_bits) for s in range(K_HASHES)]
    )
    probes = (
        candidates.select(F.col(url_col).alias("__url"))
        .distinct()
        .select("__url", F.explode(positions).alias("pos"))
        .select("__url", "pos", (F.col("pos") / 64).cast("long").alias("word_idx"))
    )
    joined = probes.join(bloom_words.hint("shuffle_hash"), "word_idx", "left")
    hit = F.when(
        F.col("bits").isNotNull()
        & (F.expr("shiftright(bits, CAST(pmod(pos, 64) AS INT)) & 1") == 1),
        1,
    ).otherwise(0)
    return (
        joined.groupBy("__url")
        .agg(F.sum(hit).alias("__n_hit"))
        .filter(F.col("__n_hit") == K_HASHES)
        .select(F.col("__url").alias(url_col))
    )


def bloom_split_partitioned(
    candidates: DataFrame,
    bloom_words: DataFrame,
    m_bits: int,
    url_col: str = "url",
) -> tuple[DataFrame, DataFrame]:
    """Split candidates into (definitely_fresh, maybe_seen) WITHOUT
    broadcasting the words table — the 10^10-key variant: at 12 bits/key
    and 10^10 seen URLs the words table is ~1.9 GB, over any broadcast
    limit. Probes and words co-partition on word_idx (one shuffle each);
    at cluster scale the words table is stored bucketed by word_idx so
    only the probe side shuffles."""
    maybe_urls = _probe_maybe_urls(candidates, bloom_words, m_bits, url_col)
    fresh = candidates.join(maybe_urls, url_col, "left_anti")
    maybe = candidates.join(maybe_urls, url_col, "left_semi")
    return fresh, maybe


# words tables bigger than this (in filter bits; /8 for bytes) probe via
# the partitioned path instead of k broadcast joins
BROADCAST_WORDS_MAX_BITS = 64 * 1024 * 1024 * 8


def bloom_anti_join(
    candidates: DataFrame,
    seen: DataFrame,
    n_seen_estimate: int,
    url_col: str = "url",
    partitioned: bool | None = None,
) -> DataFrame:
    """Exact anti-join with a bloom prefilter: candidates that the bloom
    proves unseen bypass the join; the rest are checked exactly.
    Result ≡ plain left_anti (tested, both probe variants).

    ``partitioned=None`` auto-selects: broadcast probe while the words
    table fits comfortably in a broadcast, partitioned word_idx-join
    probe beyond that."""
    m = bloom_size_bits(max(n_seen_estimate, 1))
    if partitioned is None:
        partitioned = m > BROADCAST_WORDS_MAX_BITS
    words = build_bloom(seen, m, url_col)
    split = bloom_split_partitioned if partitioned else bloom_split
    fresh, maybe = split(candidates, words, m, url_col)
    checked = maybe.join(seen.select(F.col(url_col)), url_col, "left_anti")
    return fresh.unionByName(checked)
