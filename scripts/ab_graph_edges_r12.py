"""Interleaved same-session A/B (r12, VERDICT-r11 task 8): re-measure
the r11 basket-collect rewrites where the sf0.1 deltas sat inside the
noise floor, at sf0.5 where they should resolve.

  pagerank-edges : basket-collect unfold vs orderkey self-join, timed
                   as edge-pin materialization + count (the piece the
                   official bench can't see — it runs at construction)
  triangle       : full copurchase_triangle_census with wedge unfold
                   from collected out-lists vs the oriented self-join

Usage: python scripts/ab_graph_edges_r12.py [reps=4]
       ($SPARK_GRAFT_SF_DIR selects the SF)
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
from event_driven_data_pipeline_for_e_commerce_spark.plans import corpus as _c  # noqa: F401
from event_driven_data_pipeline_for_e_commerce_spark.plans.tables import load_tables
from event_driven_data_pipeline_for_e_commerce_spark.session import get_spark

PAIR_EXPR = (
    "flatten(transform(parts, (a, i) -> "
    "transform(slice(parts, i + 2, size(parts)), "
    "b -> struct(a AS src, b AS dst))))"
)
WEDGE_EXPR = (
    "flatten(transform(ids, (a, i) -> "
    "transform(slice(ids, i + 2, size(ids)), "
    "b -> struct(a AS x, b AS y))))"
)
MIN_CO = 2


def pagerank_edges(spark, sf_dir, collect_form: bool):
    t = load_tables(spark, sf_dir)
    if collect_form:
        und = (
            t["lineitem"]
            .groupBy("l_orderkey")
            .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
            .filter(F.size("parts") > 1)
            .select(F.explode(F.expr(PAIR_EXPR)).alias("p"))
            .select("p.src", "p.dst")
            .distinct()
        )
        edges = pin(
            und.unionAll(
                und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
        )
    else:
        op = t["lineitem"].select("l_orderkey", "l_partkey").distinct()
        a = op.select(
            F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src")
        )
        b = op.select(
            F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst")
        )
        edges = pin(
            a.join(b, "k")
            .filter(F.col("src") != F.col("dst"))
            .select("src", "dst")
            .distinct()
        )
    return edges


def triangle(spark, sf_dir, collect_form: bool):
    t = load_tables(spark, sf_dir)
    baskets = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") > 1)
    )
    pair_expr = PAIR_EXPR.replace("AS src", "AS u").replace("AS dst", "AS v")
    und = (
        baskets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .groupBy("p.u", "p.v")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= MIN_CO)
        .select("u", "v")
    )
    und = pin(und)
    deg = (
        und.select(F.col("u").alias("n"))
        .unionAll(und.select("v"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
    )
    if collect_form:
        wedge = (
            oriented.groupBy("src")
            .agg(F.sort_array(F.collect_list("dst")).alias("ids"))
            .filter(F.size("ids") > 1)
            .select(F.explode(F.expr(WEDGE_EXPR)).alias("wd"))
            .select("wd.x", "wd.y")
        )
    else:
        o1 = oriented.select("src", F.col("dst").alias("x"))
        o2 = oriented.select("src", F.col("dst").alias("y"))
        wedge = o1.join(o2, "src").filter(F.col("x") < F.col("y"))
    tri = wedge.join(
        und,
        (F.col("u") == F.least("x", "y")) & (F.col("v") == F.greatest("x", "y")),
    ).agg(F.count(F.lit(1)).alias("t"))
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges"),
    )
    n_edges = und.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        stats.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            F.col("t").cast("long").alias("n_triangles"),
            F.round(3.0 * F.col("t") / F.col("n_wedges"), 6).alias(
                "global_clustering"
            ),
        )
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-graph-r12")
    for cf in (True, False):
        pagerank_edges(spark, "/root/testdata/sf0.001", cf).count()
        release_pinned()
        triangle(spark, "/root/testdata/sf0.001", cf).write.format(
            "noop"
        ).mode("overwrite").save()
        release_pinned()
    spark.catalog.clearCache()

    pr_times: dict[bool, list[float]] = {True: [], False: []}
    tri_times: dict[bool, list[float]] = {True: [], False: []}
    for r in range(reps):
        for cf in (True, False):
            release_pinned()
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(
                f"ab-pr-edges:{'collect' if cf else 'join'}#{r}"
            )
            t0 = time.perf_counter()
            e = pagerank_edges(spark, sf_dir, cf)
            e.count()
            pr_times[cf].append(round(time.perf_counter() - t0, 4))
            spark.sparkContext.setJobDescription(None)
        for cf in (True, False):
            release_pinned()
            spark.catalog.clearCache()
            df = triangle(spark, sf_dir, cf)
            spark.sparkContext.setJobDescription(
                f"ab-triangle:{'collect' if cf else 'join'}#{r}"
            )
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            tri_times[cf].append(round(time.perf_counter() - t0, 4))
            spark.sparkContext.setJobDescription(None)
    for name, times in (("pagerank-edges", pr_times), ("triangle", tri_times)):
        for cf in (True, False):
            ts = sorted(times[cf])
            print(
                f"{name} {'collect' if cf else 'join'}: "
                f"median={ts[len(ts) // 2]} min={ts[0]} all={times[cf]}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
