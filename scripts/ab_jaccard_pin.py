"""Interleaved same-session A/B: supplier_shared_part_jaccard_topk
with the distinct (pk, sk) edge frame pinned vs recomputed per
consumer (r12 candidate, guide §2.4 reuse-the-exchange).

Protocol: alternate variants, medians of N, release_pinned() +
clearCache() between runs, warm-up both variants at sf0.001 first.

Usage: python scripts/ab_jaccard_pin.py [reps=5]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F

from event_driven_data_pipeline_for_e_commerce_spark.operators.pinning import (
    pin,
    release_pinned,
)
from event_driven_data_pipeline_for_e_commerce_spark.plans.tables import load_tables
from event_driven_data_pipeline_for_e_commerce_spark.session import get_spark


def build(spark, sf_dir, pinned: bool):
    t = load_tables(spark, sf_dir)
    e = (
        t["lineitem"]
        .select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    if pinned:
        e = pin(e)
    deg = e.groupBy("sk").agg(F.count(F.lit(1)).alias("n_parts"))
    a = e.select("pk", F.col("sk").alias("s1"))
    b = e.select(F.col("pk").alias("pk2"), F.col("sk").alias("s2"))
    p = (
        a.join(b, (F.col("pk") == F.col("pk2")) & (F.col("s1") < F.col("s2")))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    d1 = deg.select(F.col("sk").alias("s1"), F.col("n_parts").alias("np1"))
    d2 = deg.select(F.col("sk").alias("s2"), F.col("n_parts").alias("np2"))
    return (
        p.join(d1, "s1")
        .join(d2, "s2")
        .select(
            "s1", "s2", "n_shared",
            F.col("np1").cast("long").alias("n_parts_1"),
            F.col("np2").cast("long").alias("n_parts_2"),
            F.round(
                F.col("n_shared") * 1.0
                / (F.col("np1") + F.col("np2") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "s1", "s2")
        .limit(20)
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-jaccard-pin")
    # warm-up both variants (codegen)
    for pinned in (False, True):
        build(spark, "/root/testdata/sf0.001", pinned).write.format(
            "noop"
        ).mode("overwrite").save()
        release_pinned()
    spark.catalog.clearCache()
    times: dict[bool, list[float]] = {False: [], True: []}
    for r in range(reps):
        for pinned in (False, True):
            release_pinned()
            spark.catalog.clearCache()
            df = build(spark, sf_dir, pinned)
            spark.sparkContext.setJobDescription(
                f"ab-jaccard:{'pin' if pinned else 'nopin'}#{r}"
            )
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times[pinned].append(round(time.perf_counter() - t0, 4))
            spark.sparkContext.setJobDescription(None)
    for pinned in (False, True):
        ts = sorted(times[pinned])
        print(
            f"{'pin' if pinned else 'nopin'}: median={ts[len(ts) // 2]} "
            f"min={ts[0]} all={times[pinned]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
