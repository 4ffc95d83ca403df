"""Round-4 corpus additions: ANN recall contracts and composed
pipeline marts.

Every query is oracle-paired (ANSI SQL for DuckDB) and keeps the
100 TB shape rules: broadcast for query-sized frames, candidate
generation by equi-join only, exact integer or bit-parity float
arithmetic wherever a cross-engine difference could flip a rounded
digit.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Window

from .corpus import ORACLES, QUERIES, query
from .tables import load_tables

# PQ search parameters (mirrors round3_queries): queries are
# vec_id in [PQ_Q_LO, PQ_Q_HI), k = PQ_TOPK, metric = squared L2.
from .round3_queries import PQ_Q_LO, PQ_Q_HI, PQ_TOPK

ANN_K = 3  # cosine-top-k contract size (mirrors emb_cosine_topk)


def _l2_truth_oracle() -> str:
    """Exact squared-L2 top-PQ_TOPK ground truth for the PQ query set
    — same arithmetic order as the Spark side (dot(v,v) + dot(q,q)
    - 2*dot(v,q), no sqrt round-trip) so ranks match bit-for-bit."""
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (
        SELECT vec_id AS query_id, v AS qv FROM e
        WHERE vec_id >= {PQ_Q_LO} AND vec_id < {PQ_Q_HI}
    ),
    pairs AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               list_dot_product(e.v, e.v) + list_dot_product(q.qv, q.qv)
               - 2 * list_dot_product(e.v, q.qv) AS d2
        FROM e, q WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY d2, neighbor_id) rn
          FROM pairs)
    WHERE rn <= {PQ_TOPK}
    """


def _ann_recall_oracle() -> str:
    """Composed oracle (the doc_near_dup_consensus pattern): each ANN
    method's REGISTERED oracle is embedded verbatim as a subquery, so
    the contract can never drift from what the per-method correctness
    rows verify; ground truth is the registered brute-force cosine
    oracle (ivf/lsh) and the exact-L2 derivation above (pq)."""
    blocks = []
    for method, src, truth, k in (
        ("ivf", ORACLES["emb_ivf_topk"], "truth_cos", ANN_K),
        ("lsh", ORACLES["emb_lsh_topk"], "truth_cos", ANN_K),
        ("pq", ORACLES["emb_pq_topk"], "truth_l2", PQ_TOPK),
    ):
        blocks.append(f"""
    SELECT '{method}' AS method, t.query_id,
           COUNT(a.neighbor_id) * 1.0 / {k} AS recall
    FROM (SELECT DISTINCT query_id FROM {truth}) t
    LEFT JOIN (
        SELECT s.query_id, s.neighbor_id
        FROM ({src}) s
        JOIN {truth} g
          ON g.query_id = s.query_id AND g.neighbor_id = s.neighbor_id
    ) a ON a.query_id = t.query_id
    GROUP BY t.query_id""")
    union = "\n    UNION ALL\n".join(blocks)
    return f"""
    WITH truth_cos AS (
        SELECT query_id, neighbor_id FROM ({ORACLES["emb_cosine_topk"]}) t
    ),
    truth_l2 AS (
        SELECT query_id, neighbor_id FROM ({_l2_truth_oracle()}) t
    ),
    per_query AS ({union})
    SELECT method,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           ROUND(AVG(recall), 4) AS avg_recall,
           ROUND(MIN(recall), 4) AS min_recall
    FROM per_query GROUP BY method
    """


@query("emb_ann_recall_contract", oracle=_ann_recall_oracle())
def q_emb_ann_recall_contract(spark, sf_dir):
    """Recall@k of every approximate-nearest-neighbor path against its
    exact ground truth — the quality contract CORRECTNESS alone can't
    see: an ANN index can be 'correct' (returns what its algorithm
    says) while silently losing recall, which is the LLM-pipeline
    failure mode that matters. ivf and lsh are scored against the
    brute-force cosine top-3 (emb_cosine_topk); pq against exact
    squared-L2 top-5 over its own query set (PQ ranks by approximate
    L2, so cosine truth would be the wrong contract).

    Scale shape: each method's result and truth are query-set-sized
    (handfuls of rows at any corpus size — k rows per query); the
    joins and the per-query hit counts are on those tiny frames. The
    expensive parts are the underlying searches, whose plans are
    audited by their own queries; this contract adds only
    query-set-grain work on top."""
    truth_cos = (
        QUERIES["emb_cosine_topk"](spark, sf_dir)
        .select("query_id", "neighbor_id")
        .persist()
    )
    t = load_tables(spark, sf_dir)
    from ..llmdata.similarity import _as_double, dot
    from ..operators.partitioning import ensure_parallelism

    e = ensure_parallelism(t["embeddings"]).select(
        "vec_id", _as_double("embedding").alias("v")
    )
    q = e.filter(
        (F.col("vec_id") >= PQ_Q_LO) & (F.col("vec_id") < PQ_Q_HI)
    ).select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    pairs = e.withColumnRenamed("vec_id", "neighbor_id").join(
        F.broadcast(q), F.col("neighbor_id") != F.col("query_id")
    )
    d2 = (
        dot(F.col("v"), F.col("v"))
        + dot(F.col("qv"), F.col("qv"))
        - 2 * dot(F.col("v"), F.col("qv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("d2"), F.asc("neighbor_id")
    )
    truth_l2 = (
        pairs.withColumn("d2", d2)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= PQ_TOPK)
        .select("query_id", "neighbor_id")
        .persist()
    )

    per_query = []
    for method, ann_name, truth, k in (
        ("ivf", "emb_ivf_topk", truth_cos, ANN_K),
        ("lsh", "emb_lsh_topk", truth_cos, ANN_K),
        ("pq", "emb_pq_topk", truth_l2, PQ_TOPK),
    ):
        ann = QUERIES[ann_name](spark, sf_dir).select(
            "query_id", "neighbor_id"
        )
        hits = (
            ann.join(truth, ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("hits"))
        )
        per_query.append(
            truth.select("query_id")
            .distinct()
            .join(hits, "query_id", "left")
            .select(
                F.lit(method).alias("method"),
                "query_id",
                (F.coalesce(F.col("hits"), F.lit(0)) / k).alias("recall"),
            )
        )
    allq = reduce(lambda a, b: a.unionByName(b), per_query)
    return allq.groupBy("method").agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg("recall"), 4).alias("avg_recall"),
        F.round(F.min("recall"), 4).alias("min_recall"),
    )
