"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  The query set is broadcast; the corpus side streams through one
  projection + per-query window rank. At 100 TB corpus scale this is
  a single pass, no shuffle of the corpus (TakeOrdered per query).
- ``lsh_bucket`` / ``lsh_topk``: random-hyperplane LSH — the scale
  path. Hyperplanes are seeded constants (numpy RandomState), the
  bucket key is the sign pattern of the projections; candidate
  generation becomes an equi-join on bucket keys.

Dot products use ``zip_with`` + ``aggregate`` higher-order functions
(sequential left fold in double) — JVM-side, deterministic order, and
bit-identical to a SQL oracle's list_dot_product on DOUBLE[].
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from ..operators.partitioning import ensure_parallelism

LSH_SEED = 42


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


# A vectorized (Arrow/numpy) pandas_udf dot was benchmarked for the
# pair-verify stages and performed no better than the native fold at
# 64 dims: shipping both vectors to Python (~1 KB/pair) costs as much
# as the JVM evaluation it replaces. At 512+ dims or with the vectors
# already Python-side, revisit.


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double(col: str) -> Column:
    return F.col(col).cast("array<double>")


def _require_sane_seeds(seeds) -> None:
    """Reject degenerate seeds at collection time (driver-side, k tiny
    vectors — free). A zero-norm / NaN / null seed makes every row's
    cosine against it NaN; the Spark ranking clamps that to -inf
    (ranks LAST) while an unguarded SQL oracle's ``ORDER BY csim
    DESC`` ranks NaN FIRST (both Spark and DuckDB sort NaN above all
    doubles) — a silent engine-vs-oracle divergence. Failing fast here
    keeps the clamp a pure belt-and-braces path and the oracles
    honest (ADVICE r6)."""
    import math

    for sid, cv in seeds:
        if cv is None or any(x is None or math.isnan(float(x)) for x in cv):
            raise ValueError(f"seed {sid} contains null/NaN components")
        if not any(float(x) != 0.0 for x in cv):
            raise ValueError(f"seed {sid} has zero norm")


def nearest_seed_l2(vec_col: Column, seeds, id_field: str = "cluster_id") -> Column:
    """Map-side nearest-seed assignment: given ``seeds`` as a list of
    ``(seed_id, [floats])`` collected driver-side (the sanctioned
    broadcast-params collect — k tiny vectors), returns a struct
    column ``(d2, <id_field>)`` for the closest seed by squared L2,
    ties to the lowest id.

    This replaces the crossJoin + PARTITION BY vec window shape,
    which shuffles corpus×k rows just to rank k candidates per
    vector: each seed's d2 is one fixed-order zip_with fold (same
    arithmetic the window form used), the k candidates form an array
    of structs, and ``array_min`` picks the (d2, id)-lexicographic
    minimum — zero shuffle, zero sort, identical semantics to
    ``ROW_NUMBER() OVER (PARTITION BY vec ORDER BY d2, id) = 1``."""
    cands = F.array(*[
        F.struct(
            F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(float(x)) for x in cv]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d2"),
            F.lit(int(sid)).alias(id_field),
        )
        for sid, cv in seeds
    ])
    return F.array_min(cands)


def nearest_seed_cosine(vec_col: Column, seeds, id_field: str = "list_id") -> Column:
    """Cosine twin of ``nearest_seed_l2``: map-side argmax of cosine
    similarity over driver-collected ``(seed_id, [floats])`` seeds,
    ties to the LOWEST id (the id is negated inside the comparison
    struct so ``array_max`` breaks equal-similarity ties toward the
    smallest id — identical to ``ROW_NUMBER() OVER (ORDER BY csim
    DESC, id ASC) = 1``). Returns a struct ``(csim, <id_field>)``.
    Degenerate cosines (NaN from a zero-norm seed or vector, NULL
    from a null vector) are clamped to -inf so a broken seed can never
    win the argmax (Spark orders NaN ABOVE every double, so unguarded
    a zero-norm seed would be every row's nearest)."""
    import math

    _require_sane_seeds(seeds)
    n_v = norm(vec_col)

    def _guarded(c: Column) -> Column:
        return F.when(c.isNull() | F.isnan(c), F.lit(float("-inf"))).otherwise(c)

    cands = F.array(*[
        F.struct(
            _guarded(
                F.aggregate(
                    F.zip_with(
                        vec_col,
                        F.array(*[F.lit(float(x)) for x in cv]),
                        lambda a, b: a * b,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / (n_v * F.lit(math.sqrt(sum(float(x) * float(x) for x in cv))))
            ).alias("csim"),
            F.lit(-int(sid)).alias("__neg_id"),
        )
        for sid, cv in seeds
    ])
    best = F.array_max(cands)
    return F.struct(
        best["csim"].alias("csim"), (-best["__neg_id"]).alias(id_field)
    )


def top_seeds_cosine(
    vec_col: Column,
    seeds,
    nprobe: int,
    id_field: str = "list_id",
    n_col: Column | None = None,
) -> Column:
    """Top-``nprobe`` generalization of ``nearest_seed_cosine``:
    map-side ranking of driver-collected ``(seed_id, [floats])`` seeds
    by cosine DESC with id ASC tie-break, returned as an array of
    ``(<id_field>)``-bearing structs in rank order. ``array_sort`` on
    ``struct(-csim, id)`` ascending realizes exactly
    ``ROW_NUMBER() OVER (ORDER BY csim DESC, id ASC) <= nprobe`` with
    zero shuffle — the caller explodes the slice instead of windowing
    a corpus×seeds cross join. Pass a precomputed vector-norm column
    via ``n_col`` when the projection already carries one (avoids the
    no-CSE-across-array-elements re-evaluation of the norm fold).

    Degenerate cosines (NULL from a null vector, NaN from a zero-norm
    vector or seed) are clamped to -inf similarity so they rank LAST
    deterministically — a bare struct sort would instead float a NULL
    field to the FRONT and make a degenerate seed every row's top
    probe."""
    import math

    _require_sane_seeds(seeds)
    n_v = n_col if n_col is not None else norm(vec_col)
    elems = []
    for sid, cv in seeds:
        csim = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(x)) for x in cv]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ) / (n_v * F.lit(math.sqrt(sum(float(x) * float(x) for x in cv))))
        neg = -csim
        guarded = F.when(
            neg.isNull() | F.isnan(neg), F.lit(float("inf"))
        ).otherwise(neg)
        elems.append(
            F.struct(
                guarded.alias("__neg_csim"),
                F.lit(int(sid)).alias(id_field),
            )
        )
    return F.slice(F.array_sort(F.array(*elems)), 1, nprobe)


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Output: (query_id, neighbor_id, cos_sim) — ranked on the raw
    similarity with id tie-break, rounded 6dp after ranking.

    Norms are attached per vector BEFORE the pair join (the join
    boundary materializes them), so each pair pays one dot product +
    one divide instead of three array folds — same expression,
    bit-identical result.
    """
    corpus = ensure_parallelism(
        embeddings.select(F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("v"))
    ).withColumn("n_v", norm(F.col("v")))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    ).withColumn("n_q", norm(F.col("qv")))
    pairs = corpus.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    sims = pairs.withColumn(
        "sim", dot(F.col("v"), F.col("qv")) / (F.col("n_v") * F.col("n_q"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("cos_sim"))
    )


def hyperplanes(
    dim: int, n_planes: int, n_tables: int = 1, seed: int = LSH_SEED
) -> list[list[float]]:
    """Deterministic random hyperplanes (shared with the SQL oracle):
    ``n_tables * n_planes`` flat list; table t owns planes
    [t*n_planes, (t+1)*n_planes)."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_tables * n_planes, dim).round(6).tolist()


def lsh_bucket(
    embeddings: DataFrame,
    planes: list[list[float]],
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-pattern bucket keys, one per hash table (multi-table /
    OR-amplified LSH — the standard recall fix for random-hyperplane
    hashing). Output: (id_col, v, n_v, tbl, bucket), one row per table
    (``n_v`` is the vector norm, precomputed for downstream cosines)."""
    v = _as_double(vec_col)
    per_table = len(planes) // n_tables
    signs = [
        F.when(dot(v, F.array(*[F.lit(float(x)) for x in plane])) >= 0, "1").otherwise("0")
        for plane in planes
    ]
    tables = F.array(*[
        F.struct(
            F.lit(t).alias("tbl"),
            F.concat(*signs[t * per_table:(t + 1) * per_table]).alias("bucket"),
        )
        for t in range(n_tables)
    ])
    return embeddings.select(
        F.col(id_col), v.alias("v"), norm(v).alias("n_v"), F.explode(tables).alias("tb")
    ).select(
        id_col, "v", "n_v", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket")
    )


def ivf_centroids(
    embeddings: DataFrame, n_lists: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic coarse quantizer for IVF: the ``n_lists`` lowest-id
    vectors serve as centroids. (A production index would k-means-train
    on a sample offline; the centroid CHOICE is orthogonal to the
    Spark mechanics — inverted-list partitioning, multi-probe, rerank —
    which are what this module provides.) Output: (list_id, cv)."""
    return (
        embeddings.orderBy(id_col)
        .limit(n_lists)
        .select(F.col(id_col).alias("list_id"), _as_double(vec_col).alias("cv"))
    )


def _assign_lists(
    vectors: DataFrame, centroids: DataFrame, id_out: str, vec_out: str, nprobe: int
) -> DataFrame:
    """Rank centroids per vector by cosine (id tie-break) and keep the
    top ``nprobe`` — the centroids are collected driver-side (a
    codebook: n_lists tiny vectors, the sanctioned bounded collect)
    and ranked with a zero-shuffle map-side ``top_seeds_cosine``
    projection. The previous shape cross-joined broadcast centroids
    and ranked with a ``PARTITION BY vector`` window, which shuffled
    corpus×n_lists rows (vectors attached) just to pick each row's
    top ``nprobe`` of ~16 candidates — a corpus-grain exchange that
    dominates the index build at 100 TB. Output carries the vector
    norm for downstream rerank cosines."""
    n_out = f"n_{vec_out}"
    seeds = [(r["list_id"], r["cv"]) for r in centroids.collect()]
    ranked = top_seeds_cosine(
        F.col(vec_out), seeds, nprobe, n_col=F.col(n_out)
    )
    return (
        vectors.withColumn(n_out, norm(F.col(vec_out)))
        .withColumn("__probe", F.explode(ranked))
        .select(id_out, vec_out, n_out, F.col("__probe.list_id").alias("list_id"))
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    n_lists: int = 16,
    nprobe: int = 4,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their single
    nearest centroid's inverted list; each query probes its ``nprobe``
    nearest lists and exact-reranks only those candidates. The corpus
    pass is one broadcast-centroid projection + an equi-join on
    list_id — at 100 TB you'd additionally ``partitionBy(list_id)`` the
    index table so probes prune partitions."""
    cents = ivf_centroids(embeddings, n_lists, id_col, vec_col)
    corpus = ensure_parallelism(
        embeddings.select(F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("v"))
    )
    inv_lists = _assign_lists(corpus, cents, "neighbor_id", "v", nprobe=1)
    probes = _assign_lists(
        queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")),
        cents, "query_id", "qv", nprobe=nprobe,
    )
    cands = (
        inv_lists.join(F.broadcast(probes), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "v", "qv", "n_v", "n_qv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sims = cands.withColumn(
        "sim", dot(F.col("v"), F.col("qv")) / (F.col("n_v") * F.col("n_qv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("cos_sim"))
    )


def cosine_near_duplicates(
    embeddings: DataFrame,
    planes: list[list[float]],
    n_tables: int = 1,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates share an LSH
    bucket in ANY table (one equi-join, never O(n²)); candidates pay
    exact cosine and keep pairs ≥ threshold. Output: (id_a, id_b,
    cos_sim), id_a < id_b. The embedding-space sibling of the MinHash
    text near-dup — same candidate-then-verify shape."""
    # candidate generation over BARE ids — the bucket-collect pair
    # unfold must not carry the vectors (128 doubles/pair); they are
    # re-attached afterwards from the slim per-vector frame (AQE
    # broadcasts it when small, shuffle-joins at scale). Bucket-collect
    # (one exchange + map-side pair expansion, shared with the MinHash
    # pipeline) also means the signature projection runs ONCE, not per
    # self-join side.
    from .dedup import lsh_candidate_pairs

    b = lsh_bucket(embeddings, planes, n_tables, id_col, vec_col).select(
        id_col, "tbl", F.col("bucket")
    )
    band_keys = b.select(
        F.col(id_col), F.col("tbl").alias("band"), F.col("bucket").alias("band_key")
    )
    cands = lsh_candidate_pairs(band_keys, id_col).select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    vecs = embeddings.select(
        F.col(id_col).alias("__vid"), _as_double(vec_col).alias("__v")
    ).withColumn("__n", norm(F.col("__v")))
    a = vecs.select(
        F.col("__vid").alias("id_a"), F.col("__v").alias("va"), F.col("__n").alias("na")
    )
    bv = vecs.select(
        F.col("__vid").alias("id_b"), F.col("__v").alias("vb"), F.col("__n").alias("nb")
    )
    sim = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        cands.join(a, "id_a")
        .join(bv, "id_b")
        .withColumn("cos_sim", F.round(sim, 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 3,
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates are vectors sharing the query's
    bucket in ANY hash table (OR over tables boosts recall; AND over
    planes within a table keeps buckets small). One equi-join on
    (tbl, bucket) replaces the full scan — the 100 TB shape."""
    corpus = lsh_bucket(embeddings, planes, n_tables, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("v"), F.col("n_v"), "tbl", "bucket"
    )
    q = lsh_bucket(queries, planes, n_tables, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"),
        F.col("n_v").alias("n_q"), "tbl", "bucket",
    )
    cands = (
        corpus.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "v", "qv", "n_v", "n_q")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sims = cands.withColumn(
        "sim", dot(F.col("v"), F.col("qv")) / (F.col("n_v") * F.col("n_q"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("cos_sim"))
    )
