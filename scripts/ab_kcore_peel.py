"""Interleaved same-session A/B for copurchase_kcore_peel3 peel-loop
variants (r12):

  A  current: pin(keep) + pin(cur) per round
  B  no keep pin: only cur pinned per round (keep recomputed from the
     pinned cur — one extra tiny exchange vs one persist pass)

Usage: python scripts/ab_kcore_peel.py [reps=5]
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

K = 3
MIN_CO = 2
PAIR_EXPR = (
    "flatten(transform(parts, (a, i) -> "
    "transform(slice(parts, i + 2, size(parts)), "
    "b -> struct(a AS pa, b AS pb))))"
)


def build(spark, sf_dir, pin_keep: bool):
    t = load_tables(spark, sf_dir)
    baskets = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") > 1)
    )
    pairs = baskets.select(F.explode(F.expr(PAIR_EXPR)).alias("p")).select(
        "p.pa", "p.pb"
    )
    edges = pin(
        pairs.groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= MIN_CO)
        .select("pa", "pb")
    )
    rows = []
    cur = edges
    for rnd in (1, 2, 3):
        deg = (
            cur.select(F.col("pa").alias("node"))
            .unionAll(cur.select(F.col("pb").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= K).select("node")
        if pin_keep:
            keep = pin(keep)
        cur = pin(
            cur.join(keep.select(F.col("node").alias("pa")), "pa").join(
                keep.select(F.col("node").alias("pb")), "pb"
            )
        )
        n_nodes = keep.agg(F.count(F.lit(1)).alias("n_nodes"))
        n_edges = cur.agg(F.count(F.lit(1)).alias("n_edges"))
        rows.append(
            n_nodes.crossJoin(n_edges).select(
                F.lit(rnd).cast("long").alias("round"), "n_nodes", "n_edges"
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("round")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-kcore-peel")
    for pk in (True, False):
        build(spark, "/root/testdata/sf0.001", pk).write.format("noop").mode(
            "overwrite"
        ).save()
        release_pinned()
    spark.catalog.clearCache()
    times: dict[bool, list[float]] = {True: [], False: []}
    for r in range(reps):
        for pk in (True, False):
            release_pinned()
            spark.catalog.clearCache()
            df = build(spark, sf_dir, pk)
            spark.sparkContext.setJobDescription(
                f"ab-kcore:{'pinkeep' if pk else 'nokeep'}#{r}"
            )
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times[pk].append(round(time.perf_counter() - t0, 4))
            spark.sparkContext.setJobDescription(None)
    for pk in (True, False):
        ts = sorted(times[pk])
        print(
            f"{'A pinkeep' if pk else 'B nokeep'}: median={ts[len(ts) // 2]} "
            f"min={ts[0]} all={times[pk]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
