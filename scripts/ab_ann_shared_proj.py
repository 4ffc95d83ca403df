"""Interleaved same-session A/B for emb_ann_recall_contract (r12):
shared pinned corpus projection (vec_id, v, n2) feeding both truth
sides vs the r11 form (each truth side re-scans embeddings; the L2
side re-evaluates dot(v,v) per pair).

Usage: python scripts/ab_ann_shared_proj.py [reps=5]
"""
from __future__ import annotations

import os
import sys
import time
from functools import reduce

sys.path.insert(0, ".")

import pyspark.sql.functions as F
from pyspark.sql import Window

from event_driven_data_pipeline_for_e_commerce_spark.llmdata.similarity import (
    _as_double,
    dot,
)
from event_driven_data_pipeline_for_e_commerce_spark.operators.partitioning import (
    ensure_parallelism,
)
from event_driven_data_pipeline_for_e_commerce_spark.operators.pinning import (
    pin,
    release_pinned,
)
from event_driven_data_pipeline_for_e_commerce_spark.plans.corpus import QUERIES
from event_driven_data_pipeline_for_e_commerce_spark.plans.round3_queries import (
    PQ_Q_HI,
    PQ_Q_LO,
    PQ_TOPK,
)
from event_driven_data_pipeline_for_e_commerce_spark.plans.tables import load_tables
from event_driven_data_pipeline_for_e_commerce_spark.session import get_spark

ANN_K = 3
ANN_Q_HI = 5


def build(spark, sf_dir, shared: bool):
    t = load_tables(spark, sf_dir)
    if shared:
        corpus = pin(
            ensure_parallelism(t["embeddings"])
            .select("vec_id", _as_double("embedding").alias("v"))
            .withColumn("n2", dot(F.col("v"), F.col("v")))
        )
        cos_corpus = corpus.select(
            F.col("vec_id").alias("neighbor_id"),
            "v",
            F.sqrt(F.col("n2")).alias("n_v"),
        )
        cos_q = corpus.filter(F.col("vec_id") < ANN_Q_HI).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.sqrt(F.col("n2")).alias("n_q"),
        )
        w_cos = Window.partitionBy("query_id").orderBy(
            F.desc("sim"), F.asc("neighbor_id")
        )
        truth_cos = (
            cos_corpus.join(
                F.broadcast(cos_q), F.col("neighbor_id") != F.col("query_id")
            )
            .withColumn(
                "sim",
                dot(F.col("v"), F.col("qv")) / (F.col("n_v") * F.col("n_q")),
            )
            .withColumn("__rn", F.row_number().over(w_cos))
            .filter(F.col("__rn") <= ANN_K)
            .select("query_id", "neighbor_id")
        )
        q = corpus.filter(
            (F.col("vec_id") >= PQ_Q_LO) & (F.col("vec_id") < PQ_Q_HI)
        ).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("n2").alias("qn2"),
        )
        pairs = corpus.withColumnRenamed("vec_id", "neighbor_id").join(
            F.broadcast(q), F.col("neighbor_id") != F.col("query_id")
        )
        d2 = F.col("n2") + F.col("qn2") - 2 * dot(F.col("v"), F.col("qv"))
    else:
        truth_cos = QUERIES["emb_cosine_topk"](spark, sf_dir).select(
            "query_id", "neighbor_id"
        )
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
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("neighbor_id"))
    truth_l2 = (
        pairs.withColumn("d2", d2)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= PQ_TOPK)
        .select("query_id", "neighbor_id")
    )

    def _tag(df, method):
        return df.select(
            F.lit(method).alias("method"), "query_id", "neighbor_id"
        )

    cands = reduce(
        lambda a, b: a.unionByName(b),
        [
            _tag(
                QUERIES[ann_name](spark, sf_dir).select(
                    "query_id", "neighbor_id"
                ),
                method,
            )
            for method, ann_name in (
                ("ivf", "emb_ivf_topk"),
                ("lsh", "emb_lsh_topk"),
                ("pq", "emb_pq_topk"),
            )
        ],
    )
    truths = pin(
        truth_cos.withColumn(
            "method", F.explode(F.array(F.lit("ivf"), F.lit("lsh")))
        )
        .select("method", "query_id", "neighbor_id")
        .unionByName(_tag(truth_l2, "pq"))
    )
    k_expr = F.when(F.col("method") == "pq", F.lit(PQ_TOPK)).otherwise(
        F.lit(ANN_K)
    )
    hits = (
        cands.join(
            F.broadcast(truths),
            ["method", "query_id", "neighbor_id"],
            "left_semi",
        )
        .groupBy("method", "query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    allq = (
        truths.select("method", "query_id")
        .distinct()
        .join(F.broadcast(hits), ["method", "query_id"], "left")
        .select(
            "method",
            "query_id",
            (F.coalesce(F.col("hits"), F.lit(0)) / k_expr).alias("recall"),
        )
    )
    return allq.groupBy("method").agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg("recall"), 4).alias("avg_recall"),
        F.round(F.min("recall"), 4).alias("min_recall"),
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-ann-shared")
    for shared in (False, True):
        build(spark, "/root/testdata/sf0.001", shared).write.format(
            "noop"
        ).mode("overwrite").save()
        release_pinned()
    spark.catalog.clearCache()
    times: dict[bool, list[float]] = {False: [], True: []}
    for r in range(reps):
        for shared in (False, True):
            release_pinned()
            spark.catalog.clearCache()
            df = build(spark, sf_dir, shared)
            spark.sparkContext.setJobDescription(
                f"ab-ann:{'shared' if shared else 'old'}#{r}"
            )
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times[shared].append(round(time.perf_counter() - t0, 4))
            spark.sparkContext.setJobDescription(None)
    for shared in (False, True):
        ts = sorted(times[shared])
        print(
            f"{'shared' if shared else 'old'}: median={ts[len(ts) // 2]} "
            f"min={ts[0]} all={times[shared]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
