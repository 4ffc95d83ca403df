#!/usr/bin/env python
"""Standalone A/B of emb_ann_recall_contract forms (VERDICT r6 #1).

Times each form end-to-end (noop sink) at $SPARK_GRAFT_SF_DIR with
release_pinned() + clearCache() between EVERY run, alternating A/B so
JVM warm-up and box noise hit both sides equally. Form A is the
current registered query (one-pin union-tagged after the round-7
fix); form B is the pre-round-6 three-chain scoring tail rebuilt on
the same truth frames; form C is the explicit one-pin union-tagged
build (identical to the registered form post-fix — kept so the
round-6 five-pin regression A/B stays reproducible from history).

Round-7 measurement (sf0.1, local[32], alternating, medians of 4):
five-pin A=3.42s, three-chain B=3.16s, one-pin C=3.14s — the r5
bench number (2.27s) was cross-query cache reuse, not a real floor.
"""

from __future__ import annotations

import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import Window

from event_driven_data_pipeline_for_e_commerce_spark.operators.pinning import (
    pin,
    release_pinned,
)
from event_driven_data_pipeline_for_e_commerce_spark.plans.corpus import QUERIES
from event_driven_data_pipeline_for_e_commerce_spark.plans.round4_queries import (
    ANN_K,
    PQ_Q_HI,
    PQ_Q_LO,
    PQ_TOPK,
)
from event_driven_data_pipeline_for_e_commerce_spark.plans.tables import load_tables
from event_driven_data_pipeline_for_e_commerce_spark.session import get_spark


def _truths(spark, sf_dir):
    from event_driven_data_pipeline_for_e_commerce_spark.llmdata.similarity import (
        _as_double,
        dot,
    )
    from event_driven_data_pipeline_for_e_commerce_spark.operators.partitioning import (
        ensure_parallelism,
    )

    truth_cos = pin(
        QUERIES["emb_cosine_topk"](spark, sf_dir).select("query_id", "neighbor_id")
    )
    t = load_tables(spark, sf_dir)
    e = ensure_parallelism(t["embeddings"]).select(
        "vec_id", _as_double("embedding").alias("v")
    )
    q = e.filter((F.col("vec_id") >= PQ_Q_LO) & (F.col("vec_id") < PQ_Q_HI)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pairs = e.withColumnRenamed("vec_id", "neighbor_id").join(
        F.broadcast(q), F.col("neighbor_id") != F.col("query_id")
    )
    d2 = (
        dot(F.col("v"), F.col("v"))
        + dot(F.col("qv"), F.col("qv"))
        - 2 * dot(F.col("v"), F.col("qv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("neighbor_id"))
    truth_l2 = pin(
        pairs.withColumn("d2", d2)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= PQ_TOPK)
        .select("query_id", "neighbor_id")
    )
    return truth_cos, truth_l2


def form_a(spark, sf_dir):
    """Current registered query (union-tagged single scoring pass)."""
    return QUERIES["emb_ann_recall_contract"](spark, sf_dir)


def form_b(spark, sf_dir):
    """Pre-round-6 three-chain scoring tail (git eda70da~1)."""
    truth_cos, truth_l2 = _truths(spark, sf_dir)
    per_query = []
    for method, ann_name, truth, k in (
        ("ivf", "emb_ivf_topk", truth_cos, ANN_K),
        ("lsh", "emb_lsh_topk", truth_cos, ANN_K),
        ("pq", "emb_pq_topk", truth_l2, PQ_TOPK),
    ):
        ann = QUERIES[ann_name](spark, sf_dir).select("query_id", "neighbor_id")
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


def form_c(spark, sf_dir):
    """Union-tagged single pass, but ONE pin (the twice-consumed
    unioned truths) instead of five."""
    from event_driven_data_pipeline_for_e_commerce_spark.llmdata.similarity import (
        _as_double,
        dot,
    )
    from event_driven_data_pipeline_for_e_commerce_spark.operators.partitioning import (
        ensure_parallelism,
    )

    truth_cos = QUERIES["emb_cosine_topk"](spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    t = load_tables(spark, sf_dir)
    e = ensure_parallelism(t["embeddings"]).select(
        "vec_id", _as_double("embedding").alias("v")
    )
    q = e.filter((F.col("vec_id") >= PQ_Q_LO) & (F.col("vec_id") < PQ_Q_HI)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
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
        return df.select(F.lit(method).alias("method"), "query_id", "neighbor_id")

    cands = reduce(
        lambda a, b: a.unionByName(b),
        [
            _tag(QUERIES[ann_name](spark, sf_dir).select("query_id", "neighbor_id"), m)
            for m, ann_name in (
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
    k_expr = F.when(F.col("method") == "pq", F.lit(PQ_TOPK)).otherwise(F.lit(ANN_K))
    hits = (
        cands.join(
            F.broadcast(truths), ["method", "query_id", "neighbor_id"], "left_semi"
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "4"))
    spark = get_spark("ab-ann-recall")

    def timed(fn):
        release_pinned()
        spark.catalog.clearCache()
        df = fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm both code paths once (JVM/codegen) at the smallest SF
    warm = "/root/testdata/sf0.001"
    for fn in (form_a, form_b, form_c):
        timed_dir = warm if os.path.isdir(warm) else sf_dir
        release_pinned()
        spark.catalog.clearCache()
        fn(spark, timed_dir).write.format("noop").mode("overwrite").save()

    a_times, b_times, c_times = [], [], []
    for _ in range(rounds):
        a_times.append(timed(form_a))
        b_times.append(timed(form_b))
        c_times.append(timed(form_c))
    print("A (union-tagged, current):", [round(x, 3) for x in a_times])
    print("B (three-chain, pre-r6):  ", [round(x, 3) for x in b_times])
    print("C (union-tagged, 1 pin):  ", [round(x, 3) for x in c_times])
    print(
        f"medians  A={sorted(a_times)[len(a_times)//2]:.3f}"
        f"  B={sorted(b_times)[len(b_times)//2]:.3f}"
        f"  C={sorted(c_times)[len(c_times)//2]:.3f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
