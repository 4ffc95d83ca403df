"""Persistent inverted index: build the postings once, serve keyword
searches from the materialized index without touching raw text again.

``doc_keyword_search`` (plans/round3_queries.py) computes its postings
inline — right for one-off queries, wrong for a serving path that
answers many queries over a static corpus. This module materializes
the same structure:

- ``postings/`` — (tok, doc_id, tf), range-partitioned and sorted by
  token so every parquet row group covers a tight token range; a term
  lookup pushes ``tok IN (...)`` into the scan and row-group min/max
  statistics skip everything else. That is the columnar stand-in for
  a posting-list seek — no corpus scan at query time.
- ``df/`` — (tok, df) document frequencies (vocabulary-sized).
- ``meta/`` — one row: corpus document count.

At 100 TB the build is one tokenize + one (doc, term) count shuffle —
the same cost the inline query pays ONCE — and the index sizes with
the token stream, while every search after that reads only the probed
row groups.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.partitioning import ensure_parallelism

INDEX_PARTITIONS = 16


def build_inverted_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_partitions: int = INDEX_PARTITIONS,
) -> None:
    """Tokenize, count, and materialize the index at ``path``."""
    tok = ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("tok"),
    )
    tf = tok.groupBy("tok", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    (
        tf.repartitionByRange(n_partitions, "tok")
        .sortWithinPartitions("tok", "doc_id")
        .write.mode("overwrite")
        .parquet(f"{path}/postings")
    )
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    df_t.coalesce(1).write.mode("overwrite").parquet(f"{path}/df")
    docs.agg(F.count(F.lit(1)).alias("n_docs")).write.mode(
        "overwrite"
    ).parquet(f"{path}/meta")


def search_index(
    spark: SparkSession, path: str, terms: tuple[str, ...]
) -> DataFrame:
    """OR-query the materialized index: per matching doc, the matched
    term count, total hits, and the TF-IDF score — the same schema and
    arithmetic as ``doc_keyword_search``, but reading only the probed
    token row groups (``tok IN`` is pushed to the postings scan)."""
    postings = spark.read.parquet(f"{path}/postings").filter(
        F.col("tok").isin(*terms)
    )
    df_t = spark.read.parquet(f"{path}/df").filter(
        F.col("tok").isin(*terms)
    )
    n = spark.read.parquet(f"{path}/meta")
    return (
        postings.join(F.broadcast(df_t), "tok")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("tf").alias("n_hits"),
            F.round(
                F.sum(F.col("tf") * F.log(F.col("n_docs") / F.col("df"))),
                4,
            ).alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# Persistent IVF (ANN) index: the partitionBy(list_id) serving layout
# the inline ``similarity.ivf_topk`` docstring prescribes for 100 TB.
# ---------------------------------------------------------------------------


def build_ivf_index(
    embeddings: DataFrame,
    path: str,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF structure: ``centroids/`` (the coarse
    quantizer) and ``lists/`` — every corpus vector in its nearest
    centroid's inverted list, PARTITIONED BY list_id so a probe reads
    only its lists' directories (partition pruning, the file-layout
    twin of the inverted-index row-group skip)."""
    from .similarity import _as_double, _assign_lists, ivf_centroids

    cents = ivf_centroids(embeddings, n_lists, id_col, vec_col)
    cents.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    corpus = ensure_parallelism(
        embeddings.select(
            F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("v")
        )
    )
    inv = _assign_lists(corpus, cents, "neighbor_id", "v", nprobe=1)
    inv.write.mode("overwrite").partitionBy("list_id").parquet(
        f"{path}/lists"
    )


def search_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    nprobe: int = 4,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the materialized IVF index: rank centroids per query,
    read ONLY the probed list partitions (the probed list ids are a
    queries x nprobe scalar set, collected and inlined as a literal
    predicate so Catalyst prunes partitions at planning), then
    exact-rerank candidates. Same output contract as
    ``similarity.ivf_topk``."""
    from .similarity import _as_double, _assign_lists, dot

    cents = spark.read.parquet(f"{path}/centroids")
    probes = _assign_lists(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
        ),
        cents,
        "query_id",
        "qv",
        nprobe=nprobe,
    )
    probe_lists = sorted(
        {r.list_id for r in probes.select("list_id").distinct().collect()}
    )
    lists = spark.read.parquet(f"{path}/lists").filter(
        F.col("list_id").isin(probe_lists)
    )
    cands = (
        lists.join(F.broadcast(probes), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "v", "qv", "n_v", "n_qv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sims = cands.withColumn(
        "sim", dot(F.col("v"), F.col("qv")) / (F.col("n_v") * F.col("n_qv"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("cos_sim"))
    )
