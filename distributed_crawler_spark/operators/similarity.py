"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the scale path buckets
vectors with sign-random-projection LSH so each query probes only its
bucket (candidates ∩ bucket, then exact re-rank). All math is native
(`aggregate`/`zip_with` — JVM, codegen'd); the LSH hyperplanes are
derived deterministically from the portable hash so the DuckDB oracle
can reproduce them.

Scale notes: brute force is a broadcast of the query vector + one pass —
fine for one query over 10^9 vectors but not for k-NN joins; the LSH
variant turns a k-NN join into an equi-join on bucket id. IVF (k-means
coarse quantizer) is the next step up — same probe structure, learned
centroids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_flat(a: str, b: str, dim: int) -> Column:
    """``cosine()`` with the folds UNROLLED for a KNOWN dimension, over
    two array COLUMN NAMES. Two costs of the generic HOF cosine go away
    (round-6 measurements):

      * execution: Catalyst interprets higher-order array lambdas per
        element (no whole-stage codegen inside aggregate/zip_with) — ~3
        lambda dispatches x dim per row; the unrolled chain codegens
        flat (1.05 -> 0.87 s warm on a 16k x 64-dim assignment pass);
      * plan construction: built operator-by-operator, a 3x64-term tree
        is ~600 py4j round trips (~1.1 s of DRIVER time per call —
        fatal in an iterative loop); as ONE F.expr string it is a
        single JVM call parsed in milliseconds.

    Bit-identical result: the flat chains add left-to-right exactly
    like the fold (0.0 + x == x in IEEE)."""
    dot = " + ".join(f"element_at({a}, {j}) * element_at({b}, {j})" for j in range(1, dim + 1))
    na = " + ".join(f"element_at({a}, {j}) * element_at({a}, {j})" for j in range(1, dim + 1))
    nb = " + ".join(f"element_at({b}, {j}) * element_at({b}, {j})" for j in range(1, dim + 1))
    return F.expr(f"({dot}) / (sqrt({na}) * sqrt({nb}))")


def brute_force_topk(
    vectors: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine against a literal query vector. One scan,
    no shuffle except the final TakeOrderedAndProject."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (
        vectors.select(
            F.col(id_col), vec.alias("_va"), q.alias("_qv")
        )
        .select(
            F.col(id_col),
            F.round(cosine_flat("_va", "_qv", len(query_vec)), 4).alias(
                "score"
            ),
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def knn_join_topk(
    queries: DataFrame,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact k-NN join (each query row × all vectors, windowed top-k).
    Quadratic — the correctness baseline the LSH path is measured
    against; only for bounded query sets."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    v = vectors.select(
        F.col(id_col).alias("v_id"), F.col(vec_col).alias("v_vec")
    )
    qv = F.transform(F.col("q_vec"), lambda x: x.cast("double"))
    vv = F.transform(F.col("v_vec"), lambda x: x.cast("double"))
    scored = (
        q.crossJoin(v)
        .filter(F.col("q_id") != F.col("v_id"))
        .select(
            "q_id",
            "v_id",
            F.round(cosine(qv, vv), 4).alias("score"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.col("v_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def plan_srp_lsh(
    n_vectors: int, target_bucket: int = 16, max_planes: int = 62
) -> int:
    """Plane count for sign-random-projection LSH, SIZED FROM THE CORPUS
    (round 5 — the simhash auto-banding pattern applied to embeddings):
    2^planes buckets keep the expected random-collision bucket near
    ``target_bucket`` rows, so the bucket equi-join's candidate set
    grows ~linearly with n instead of ~quadratically at a fixed plane
    count. Planes is the SELECTIVITY knob; RECALL is the orthogonal
    knob ``n_tables`` on lsh_neardup_pairs (union of independently
    seeded tables: per-table match probability for vectors at angle θ
    is (1 − θ/π)^planes, so recall = 1 − (1 − p^b)^L — at extreme
    corpus sizes raise L alongside b)."""
    import math

    return min(
        max(math.ceil(math.log2(max(n_vectors, 2) / target_bucket)), 1),
        max_planes,
    )


def lsh_bucket_ids(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    dim: int = 64,
    table: int = 0,
) -> DataFrame:
    """Sign-random-projection LSH: bucket = bits of sign(v · h_p) for
    deterministic pseudo-random hyperplanes
    h_p[j] = ((phash('p,j') % 2001) - 1000) / 1000 — reproducible in SQL.
    Returns (id, bucket). ``table`` seeds an independent hash table for
    multi-table recall ('t<table>:p,j' for table >= 1; table 0 keeps the
    legacy seed so existing buckets/oracles are unchanged).

    The plane components are CONSTANTS, so they are computed once on the
    driver (hashlib md5 — bit-identical to functions/hashing.py:phash =
    conv(substr(md5(s),1,15),16,10), which the passing ann_lsh_buckets
    oracle verifies) and embedded as literals: the earlier per-row
    F.transform(phash(...)) recomputed planes×dim md5 hashes PER ROW —
    512 md5/row, the whole cost of the query at sf0.1."""
    import hashlib

    def _phash_py(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    prefix = "" if table == 0 else f"t{table}:"
    # The plane MATRIX is one constant-folded array<array<double>> literal
    # and the projection loop is a fold over the plane index — versus the
    # earlier per-plane unrolled chain (planes x dim expression nodes,
    # re-planned and re-codegen'd per table and per plane count) this
    # keeps the generated code structurally IDENTICAL across invocations
    # (literals codegen as object references, so the multi-table path and
    # repeated queries hit the codegen cache instead of recompiling
    # multi-thousand-node projections). Arithmetic is the same fold in
    # the same order — bit-identical buckets, and the passing
    # ann_lsh_buckets oracle pins it.
    if planes <= 0:
        # degenerate single-bucket table (used by tests to force the
        # all-in-one-bucket case) — the fold below needs >= 1 plane
        return vectors.select(
            F.col(id_col), F.lit(0).cast("long").alias("bucket")
        )
    comps = [
        [
            (_phash_py(f"{prefix}{p},{j}") % 2001 - 1000) / 1000.0
            for j in range(dim)
        ]
        for p in range(planes)
    ]
    arr_sql = "array(" + ",".join(
        "array(" + ",".join(f"{v!r}D" for v in row) + ")" for row in comps
    ) + ")"
    bucket = F.expr(
        f"""aggregate(sequence(0, {planes - 1}), 0L, (acc, p) ->
          acc + IF(aggregate(zip_with(_v, element_at({arr_sql}, p + 1),
                                      (x, y) -> x * y),
                   0.0D, (a, v) -> a + v) > 0D,
                   shiftleft(1L, p), 0L))"""
    )
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return vectors.select(F.col(id_col), vec.alias("_v")).select(
        F.col(id_col), bucket.alias("bucket")
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_id: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, score ≥
    threshold). Exact pairwise within the (optionally capped) id range —
    the LSH-bucketed variant prefilters candidates at scale."""
    v = vectors
    if max_id is not None:
        v = v.filter(F.col(id_col) < max_id)
    a = v.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = v.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    va = F.transform(F.col("va"), lambda x: x.cast("double"))
    vb = F.transform(F.col("vb"), lambda x: x.cast("double"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(va, vb).alias("_raw"))
        # raw-double prefilter before round(): round(x,4) builds a
        # BigDecimal per row, and round(x,4) >= t implies x >= t - 5e-5
        .filter(F.col("_raw") >= threshold - 1e-4)
        .select("id_a", "id_b", F.round(F.col("_raw"), 4).alias("score"))
        .filter(F.col("score") >= threshold)
    )


def lsh_neardup_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    planes: int = 8,
    dim: int = 64,
    n_tables: int = 1,
) -> DataFrame:
    """Scale path: candidates only within an LSH bucket, then exact
    cosine re-rank. Equi-join on (table, bucket) replaces the cross
    product. ``planes`` is the selectivity knob (size from the corpus
    with plan_srp_lsh); ``n_tables`` is the recall knob — candidates are
    the UNION over independently seeded tables (the minhash band-OR
    shape), recovering neighbors a single b-plane table splits apart."""
    parts = [
        lsh_bucket_ids(vectors, id_col, vec_col, planes, dim, table=t).withColumn(
            "t", F.lit(t)
        )
        for t in range(n_tables)
    ]
    buckets = parts[0]
    for p in parts[1:]:
        buckets = buckets.unionByName(p)
    # candidate (id_a, id_b) pairs are DEDUPED across tables BEFORE any
    # vector travels or any cosine runs: the multi-table union re-finds
    # the same pair in up to n_tables buckets, and the earlier shape
    # scored every rediscovery (and carried both 64-float arrays through
    # the bucket join) only to distinct() at the end. Pairs are two
    # longs; vectors attach afterwards by id equi-join.
    a = buckets.select(F.col(id_col).alias("id_a"), "t", "bucket")
    b = buckets.select(F.col(id_col).alias("id_b"), "t", "bucket")
    cand = (
        a.join(b, ["t", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va_t = vectors.select(
        F.col(id_col).alias("id_a"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("va"),
    )
    vb_t = vectors.select(
        F.col(id_col).alias("id_b"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vb"),
    )
    return (
        cand.join(va_t, "id_a")
        .join(vb_t, "id_b")
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("_raw"))
        # raw-double prefilter before round() — see embedding_neardup_pairs
        .filter(F.col("_raw") >= threshold - 1e-4)
        .select("id_a", "id_b", F.round(F.col("_raw"), 4).alias("score"))
        .filter(F.col("score") >= threshold)
    )


def ivf_assign_fixed(
    vectors: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF assignment against FIXED literal centroids (no k-means):
    broadcast the tiny centroid table, cosine every vector against every
    centroid, then argmax with a deterministic (similarity DESC, cid
    ASC) tie-break via a single partially-aggregatable max(struct) — one
    map-side-combined shuffle on the vector id, no window. This is the
    SCALE shape whenever the coarse quantizer is already trained
    (offline k-means, downloaded codebook): assignment is embarrassingly
    parallel and — unlike the iterative k-means in ivf_index — exactly
    mirrorable in SQL, which is what gives ann_ivf_topk_fixed its
    DuckDB hash oracle."""
    spark = vectors.sparkSession
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cid int, cv array<double>",
    )
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # cosine as the generic fold over the broadcast centroid ROWS (not a
    # k x dim literal-unrolled chain): the unrolled form re-planned and
    # re-Janino-compiled a multi-thousand-node projection on EVERY
    # invocation — fatal inside the Lloyd iteration loop and the bulk of
    # ann_ivf_topk_fixed's wall — while this shape keeps the generated
    # code identical across iterations/queries (centroid VALUES live in
    # the broadcast relation, not the plan). The fold adds left-to-right
    # exactly like the unrolled chain (0.0 + x == x in IEEE), so scores
    # and the argmax tie-break are bit-identical — the k-means and fixed
    # IVF oracles pin that.
    sim = F.expr(
        "aggregate(zip_with(_va, cv, (x, y) -> x * y), 0.0D, (a, v) -> a + v)"
        " / (sqrt(aggregate(_va, 0.0D, (a, v) -> a + v * v))"
        " * sqrt(aggregate(cv, 0.0D, (a, v) -> a + v * v)))"
    )
    scored = (
        vectors.select(F.col(id_col), vec.alias("_va"))
        .crossJoin(F.broadcast(cdf))
        .select(F.col(id_col), F.col("cid"), sim.alias("sim"))
    )
    best = scored.groupBy(id_col).agg(
        F.max(
            F.struct(F.col("sim"), (-F.col("cid")).alias("ncid"))
        ).alias("b")
    )
    return best.select(
        F.col(id_col), (-F.col("b.ncid")).cast("int").alias("centroid")
    )


def ivf_index(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 42,
):
    """IVF coarse quantizer: seeded k-means over the vectors; returns
    (assignments DataFrame (id, centroid), centroids list[list[float]]).

    At scale the assignment table is written bucketed by centroid so a
    probe touches only its lists' files (partition pruning)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    ml_df = vectors.select(
        F.col(id_col),
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("features"),
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=20).fit(ml_df)
    assigned = model.transform(ml_df).select(
        id_col, F.col("prediction").alias("centroid")
    )
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def ivf_search(
    vectors: DataFrame,
    assignments: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
    k: int = 10,
) -> DataFrame:
    """IVF probe: rank centroids by cosine to the query (driver-side —
    centroids are tiny), scan only the top n_probe inverted lists, exact
    cosine re-rank inside them. The centroid filter prunes partitions at
    scale; recall vs brute force is bounded by n_probe/n_centroids
    coverage (pytest measures it)."""
    import math

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na and nb else 0.0

    ranked = sorted(
        range(len(centroids)), key=lambda i: -cos(centroids[i], query_vec)
    )
    probe = ranked[:n_probe]
    cand = vectors.join(
        assignments.filter(F.col("centroid").isin(probe)).select(id_col), id_col
    )
    return brute_force_topk(cand, query_vec, id_col, vec_col, k)


def ivf_write_bucketed(
    vectors: DataFrame,
    assignments: DataFrame,
    out_dir: str,
    id_col: str = "vec_id",
) -> str:
    """Materialize the IVF inverted lists partitioned BY CENTROID —
    the layout that makes a probe read only its n_probe lists' files
    (Spark partition pruning; Iceberg identity-partition at cluster
    scale). One directory per list: out_dir/centroid=C/..."""
    (
        vectors.join(assignments, id_col)
        .repartition("centroid")
        .write.mode("overwrite")
        .partitionBy("centroid")
        .parquet(out_dir)
    )
    return out_dir


def ivf_search_pruned(
    spark,
    index_dir: str,
    centroids: list[list[float]],
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
    k: int = 10,
) -> DataFrame:
    """IVF probe against the bucketed index: the `centroid IN (...)`
    predicate is a PARTITION filter — non-probed lists are never read
    (plan-asserted in tests). Same results as ivf_search on the same
    assignments."""
    import math

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na and nb else 0.0

    ranked = sorted(
        range(len(centroids)), key=lambda i: -cos(centroids[i], query_vec)
    )
    probe = ranked[:n_probe]
    lists = spark.read.parquet(index_dir).filter(F.col("centroid").isin(probe))
    return brute_force_topk(lists, query_vec, id_col, vec_col, k)


def kmeans_lloyd(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 5,
    seed: int = 42,
):
    """Deterministic Lloyd's k-means — the ORACLE-PORTABLE coarse
    quantizer beside the MLlib path (ivf_index). "K-means is iterative
    (not SQL-expressible)" held from r02-r05 only because MLlib's
    k-means|| init and unbounded convergence aren't mirrorable; a fixed
    Lloyd unrolling is (plans side: ivf_kmeans_sql — one CTE block per
    iteration). Three choices make both engines agree bit-for-bit:

      * init = the k vectors with the smallest seeded portable hash of
        their id (hash-order cid numbering) — no RNG;
      * a FIXED iteration count (no data-dependent convergence test);
      * each new centroid component is round(avg, 6) — the only
        aggregation whose float summation order differs across engines
        /partitionings, so the rounding is part of the ALGORITHM, not
        the comparison (spark-graft perf memo: driver-side literal
        centroids per round keep assignment a broadcast cross-join).

    Scale: per iteration one broadcast assignment pass (map-side
    combined argmax, see ivf_assign_fixed) + one (k x dim)-group mean;
    the k x dim means collect to the driver (tiny) and feed the next
    round as literals — the classic distributed-Lloyd shape."""
    from ..functions.hashing import phash

    spark = vectors.sparkSession
    vd = vectors.select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    ).persist()
    try:
        init = (
            vd.select(
                "_id",
                "_v",
                phash(
                    F.concat(F.lit(f"km{seed}:"), F.col("_id").cast("string"))
                ).alias("hk"),
            )
            .orderBy("hk", "_id")
            .limit(k)
            .collect()
        )
        cents = [[float(x) for x in r["_v"]] for r in init]
        for _ in range(iters):
            # one assignment pass (broadcast argmax, ivf_assign_fixed's
            # exact tie-break) + one (cid, dim) mean agg over the
            # persisted projection; the argmax result is id->cid only —
            # carrying the 64-double vector through the argmax shuffle
            # instead (max_by(struct(cid, v))) measured 60% SLOWER, the
            # array dominates the agg buffers. A wide-aggregate mean
            # (dim avg columns instead of posexplode) was ALSO measured
            # 2.8x slower per iteration (2x64-buffer codegen per new
            # literal plan dominates) and is no safer at scale: the
            # explode's groupBy(centroid, pos) map-side combines, so
            # both forms shuffle exactly k x dim partial rows per task.
            assigned = ivf_assign_fixed(vd, cents, "_id", "_v")
            means = (
                vd.join(assigned, "_id")
                .select("centroid", F.posexplode("_v").alias("pos", "val"))
                .groupBy("centroid", "pos")
                .agg(F.round(F.avg("val"), 6).alias("v"))
                .collect()
            )
            by_cid: dict[int, dict[int, float]] = {}
            for r in means:
                by_cid.setdefault(r["centroid"], {})[r["pos"]] = r["v"]
            cents = [
                [by_cid[c][p] for p in range(len(cents[c]))]
                if c in by_cid
                else cents[c]
                for c in range(k)
            ]
    finally:
        vd.unpersist()
    return ivf_assign_fixed(vectors, cents, id_col, vec_col), cents


def ivf_kmeans_sql(
    k: int = 8, iters: int = 5, seed: int = 42, n_probe: int = 4, topk: int = 10
) -> str:
    """DuckDB mirror of kmeans_lloyd + ivf_search over the embeddings
    view (query = vec_id 0, corpus = the rest): the fixed Lloyd
    unrolling as one CTE block per iteration, then probe + re-rank."""
    from ..functions.hashing import phash_sql

    ph = phash_sql(f"'km{seed}:' || vec_id")
    parts = [
        f"""
ev AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ve
       FROM embeddings WHERE vec_id <> 0),
q AS (SELECT list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings WHERE vec_id = 0),
c0 AS (
  SELECT (row_number() OVER (ORDER BY hk, vec_id) - 1)::INT AS cid, ve AS cv
  FROM (SELECT vec_id, ve, {ph} AS hk FROM ev ORDER BY hk, vec_id LIMIT {k}))
"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""
a{i} AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.ve, c.cv) DESC, c.cid
           ) AS rn
    FROM ev e, c{i - 1} c) WHERE rn = 1),
x{i} AS (SELECT a.cid, unnest(generate_series(1, len(e.ve))) AS dpos, e.ve
         FROM ev e JOIN a{i} a USING (vec_id)),
m{i} AS (SELECT cid, dpos, round(avg(ve[dpos]), 6) AS v
         FROM x{i} GROUP BY cid, dpos),
g{i} AS (SELECT cid, list(v ORDER BY dpos) AS cv FROM m{i} GROUP BY cid),
c{i} AS (SELECT c.cid, coalesce(g.cv, c.cv) AS cv
         FROM c{i - 1} c LEFT JOIN g{i} g USING (cid))
"""
        )
    parts.append(
        f"""
af AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.ve, c.cv) DESC, c.cid
           ) AS rn
    FROM ev e, c{iters} c) WHERE rn = 1),
probe AS (SELECT cid FROM c{iters}, q
          ORDER BY list_cosine_similarity(cv, q.v) DESC, cid LIMIT {n_probe})
"""
    )
    body = ",".join(p.strip() for p in parts)
    return f"""
WITH {body}
SELECT e.vec_id, round(list_cosine_similarity(e.ve, q.v), 4) AS score
FROM ev e JOIN af USING (vec_id) JOIN q ON TRUE
WHERE af.cid IN (SELECT cid FROM probe)
ORDER BY score DESC, e.vec_id
LIMIT {topk}
"""


def semantic_dedup_removed(
    vectors: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int | None = None,
    dim: int = 64,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540) — the REMOVAL decision, not just the pair list:
    assign every embedding to its nearest centroid of a fixed codebook
    (the paper's offline k-means step, here ivf_assign_fixed so the
    assignment argmax is SQL-mirrorable), find near-duplicate pairs
    WITHIN a cluster, and remove every vector that has a LOWER-id
    neighbor at cosine >= threshold in its cluster (the paper keeps one
    exemplar per duplicate group; lowest id is the deterministic
    exemplar rule, matching dedup.exact_duplicates' min-keeper).

    Scale shape: the paper's within-cluster pairwise pass is O(sum
    |cluster|^2) — with a FIXED codebook that densifies exactly like
    the fixed-plane LSH this repo already demoted (n^2/k growth). So
    candidates here require BOTH the cluster AND an auto-sized SRP-LSH
    bucket to agree (equi-join on (centroid, bucket); planes from
    plan_srp_lsh, so expected bucket occupancy stays ~16 rows and the
    candidate set grows ~linearly with n). The exact cosine verifies
    every candidate; the cluster key adds SemDeDup's semantic locality
    on top of the bucket's selectivity.

    Returns (vec_id, centroid, keeper, score): one row per REMOVED
    vector with its lowest-id qualifying neighbor and the cosine to
    that keeper.
    """
    if planes is None:
        planes = plan_srp_lsh(vectors.count())
    assigned = ivf_assign_fixed(vectors, centroids, id_col, vec_col)
    buckets = lsh_bucket_ids(vectors, id_col, vec_col, planes, dim)
    keyed = vectors.select(id_col, vec_col).join(assigned, id_col).join(
        buckets, id_col
    )
    a = keyed.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        "centroid",
        "bucket",
    )
    b = keyed.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        "centroid",
        "bucket",
    )
    va = F.transform(F.col("va"), lambda x: x.cast("double"))
    vb = F.transform(F.col("vb"), lambda x: x.cast("double"))
    pairs = (
        a.join(b, ["centroid", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("centroid", "id_a", "id_b", cosine(va, vb).alias("_raw"))
        # raw-double prefilter before round() — see embedding_neardup_pairs
        .filter(F.col("_raw") >= threshold - 1e-4)
        .select(
            "centroid", "id_a", "id_b", F.round(F.col("_raw"), 4).alias("score")
        )
        .filter(F.col("score") >= threshold)
        .distinct()
    )
    # removal rule: id_b is removed; its keeper is the LOWEST id_a among
    # qualifying neighbors (and the score reported is the cosine to that
    # keeper). min(struct(id_a, score)) picks exactly that pair in one
    # map-side-combined aggregate — (id_a, id_b) is unique post-distinct.
    return (
        pairs.groupBy("id_b", "centroid")
        .agg(F.min(F.struct(F.col("id_a"), F.col("score"))).alias("k"))
        .select(
            F.col("id_b").alias(id_col),
            "centroid",
            F.col("k.id_a").alias("keeper"),
            F.col("k.score").alias("score"),
        )
    )
