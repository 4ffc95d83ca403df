"""Behavioral invariants for the round-3 batch-2 corpus additions —
properties the oracle diff can't express (cross-engine hash equality
proves parity, not that the semantics are the right ones)."""

from __future__ import annotations

import pyspark.sql.functions as F

from event_driven_data_pipeline_for_e_commerce_spark.plans.corpus import QUERIES


def test_cms_never_underestimates(spark, sf_dir):
    """The Count-Min guarantee: est >= exact for every probed key
    (every true occurrence increments the probed cell)."""
    rows = QUERIES["cms_heavy_hitters"](spark, sf_dir).collect()
    assert rows, "no heavy hitters returned"
    for r in rows:
        assert r.cms_est >= r.exact_cnt, r
        assert r.overestimate == r.cms_est - r.exact_cnt


def test_cms_overestimate_within_depth_width_bound(spark, sf_dir):
    """Collision inflation stays under the classic eps*N bound with
    the min-over-depth taken (eps = e/width); a blown bound means the
    hash rows aren't independent."""
    import math

    df = QUERIES["cms_heavy_hitters"](spark, sf_dir)
    n = df.agg(F.sum("exact_cnt")).collect()[0][0]  # lower bound on stream N
    from event_driven_data_pipeline_for_e_commerce_spark.plans.round3b_queries import (
        CMS_WIDTH,
    )
    # N here is only the top-k mass; the true stream length is larger,
    # so use the lineitem count for the bound.
    from event_driven_data_pipeline_for_e_commerce_spark.plans.tables import load_tables

    stream_n = load_tables(spark, sf_dir)["lineitem"].count()
    bound = math.e / CMS_WIDTH * stream_n
    for r in df.collect():
        assert r.overestimate <= bound, (r, bound, n)


def test_running_balance_final_row_equals_total(spark, sf_dir):
    """The last cumulative value per supplier must equal that
    supplier's total shipped quantity."""
    df = QUERIES["supplier_ship_cumulative"](spark, sf_dir)
    finals = (
        df.groupBy("l_suppkey")
        .agg(
            F.max_by("cum_qty", "day").alias("final_cum"),
            F.round(F.sum("qty"), 2).alias("total"),
        )
        .collect()
    )
    assert finals
    for r in finals:
        assert abs(r.final_cum - r.total) < 1e-6, r


def test_priority_mix_drift_bounded(spark, sf_dir):
    """Total-variation distance lives in [0, 1] by definition."""
    for r in QUERIES["priority_mix_drift"](spark, sf_dir).collect():
        assert 0.0 <= r.tv_distance <= 1.0, r


def test_ngram_novelty_first_doc_fully_novel(spark, sf_dir):
    """The smallest doc_id that has shingles introduces every one of
    them — novelty_pct must be exactly 100."""
    df = QUERIES["doc_ngram_novelty"](spark, sf_dir)
    first = df.orderBy("doc_id").first()
    assert first.novelty_pct == 100.0, first
    # and every doc's novel count is bounded by its shingle count
    assert df.filter(F.col("n_novel") > F.col("n_shingles")).count() == 0


def test_conversion_latency_user_conservation(spark, sf_dir):
    """Histogram user counts must sum to the number of users whose
    first view precedes (or equals) their first purchase."""
    from event_driven_data_pipeline_for_e_commerce_spark.plans.tables import load_tables

    t = load_tables(spark, sf_dir)
    per_user = t["events"].groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("v"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "p"
        ),
    )
    expected = per_user.filter(
        F.col("v").isNotNull()
        & F.col("p").isNotNull()
        & (F.col("p") >= F.col("v"))
    ).count()
    got = (
        QUERIES["conversion_latency_histogram"](spark, sf_dir)
        .agg(F.sum("n_users"))
        .collect()[0][0]
    )
    assert got == expected
