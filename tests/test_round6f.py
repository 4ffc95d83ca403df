"""Semantic invariants for the round-6f operators — properties the
oracle hash-compare can't state directly (determinism across runs,
cross-column algebraic bounds, partition completeness)."""

from __future__ import annotations

import pyspark.sql.functions as F

from event_driven_data_pipeline_for_e_commerce_spark.plans.corpus import QUERIES
from event_driven_data_pipeline_for_e_commerce_spark.plans.tables import load_tables


def test_weighted_sample_deterministic_and_weight_biased(spark, sf_dir):
    """Two evaluations return the identical sample (the whole point of
    hash-seeded priority keys), and the sample skews heavy: the mean
    char-weight of sampled docs exceeds the corpus mean (w = n_chars,
    so P(pick) increases with length)."""
    a = QUERIES["doc_weighted_sample"](spark, sf_dir).collect()
    b = QUERIES["doc_weighted_sample"](spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    sample_mean = sum(r["n_chars"] for r in a) / len(a)
    corpus_mean = (
        load_tables(spark, sf_dir)["documents"]
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    assert sample_mean > corpus_mean


def test_containment_dominates_jaccard(spark, sf_dir):
    """For every reported pair: jaccard <= min(containments) (the
    intersection-over-union can never exceed intersection-over-one-
    side), at least one containment clears the 80% gate, and n_common
    never exceeds either side."""
    rows = QUERIES["doc_containment_pairs"](spark, sf_dir).collect()
    assert rows, "audit should surface at least one pair at sf0.001"
    for r in rows:
        assert r["jaccard_e4"] <= min(
            r["cont_a_in_b_e4"], r["cont_b_in_a_e4"]
        )
        assert (
            r["n_common"] * 10 >= r["na"] * 8
            or r["n_common"] * 10 >= r["nb"] * 8
        )
        assert r["n_common"] <= min(r["na"], r["nb"])


def test_curriculum_phases_partition_corpus(spark, sf_dir):
    """The three phases exactly partition the corpus (doc and token
    totals match the source), every phase is non-empty, and quality is
    monotone non-increasing across phases (best-first curriculum)."""
    rows = {
        r["phase"]: r
        for r in QUERIES["doc_curriculum_phases"](spark, sf_dir).collect()
    }
    assert set(rows) == {1, 2, 3}
    docs = load_tables(spark, sf_dir)["documents"]
    assert sum(r["n_docs"] for r in rows.values()) == docs.count()
    assert (
        rows[1]["avg_quality_e4"]
        >= rows[2]["avg_quality_e4"]
        >= rows[3]["avg_quality_e4"]
    )
    # equal-token-budget split: no phase hoards more than ~half the
    # token mass (boundaries land on document edges, so thirds are
    # approximate but must stay in the same order of magnitude)
    tot = sum(r["phase_tokens"] for r in rows.values())
    for r in rows.values():
        assert 0 < r["phase_tokens"] < 0.6 * tot


def test_int8_recall_bounded_and_high(spark, sf_dir):
    """Recall is a share (0..10000 bp) and int8-absmax reconstruction
    must keep brute-force cosine top-3 nearly intact on smooth
    synthetic embeddings — a collapse here means the quantizer (not
    the data) broke."""
    r = QUERIES["emb_int8_recall_contract"](spark, sf_dir).first()
    assert 0 <= r["min_recall_e4"] <= r["avg_recall_e4"] <= 10000
    assert r["avg_recall_e4"] >= 6000


def test_backlog_peak_within_open_interval_count(spark, sf_dir):
    """Each supplier's peak concurrency is positive and can never
    exceed their total interval count; the peak date renders as
    YYYY-MM-DD."""
    rows = QUERIES["supplier_backlog_peak"](spark, sf_dir).collect()
    assert rows
    t = load_tables(spark, sf_dir)
    totals = {
        r["suppkey"]: r["n"]
        for r in t["lineitem"]
        .join(
            t["orders"], F.col("o_orderkey") == F.col("l_orderkey")
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert 0 < r["peak_open"] <= totals[r["suppkey"]]
        assert len(r["peak_date"]) == 10 and r["peak_date"][4] == "-"


def test_ab_arms_cover_all_users(spark, sf_dir):
    """Arm sizes sum to the distinct-user count (deterministic split
    loses nobody) and conversions never exceed arm sizes."""
    r = QUERIES["ab_test_conversion_lift"](spark, sf_dir).first()
    n_users = (
        load_tables(spark, sf_dir)["events"]
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
        .count()
    )
    assert r["n_a"] + r["n_b"] == n_users
    assert 0 <= r["k_a"] <= r["n_a"] and 0 <= r["k_b"] <= r["n_b"]


def test_weighted_median_lies_between_min_and_max(spark, sf_dir):
    """The weighted median price per brand is an actual observed
    price for that brand (the lower weighted median picks a real
    row), and total_qty matches the brand's quantity mass."""
    rows = QUERIES["brand_weighted_median_price"](spark, sf_dir).collect()
    t = load_tables(spark, sf_dir)
    lp = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].select("p_partkey", "p_brand")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
            F.collect_set(
                F.round(F.col("l_extendedprice") * 100).cast("long")
            ).alias("prices"),
        )
        .collect()
    )
    by_brand = {r["brand"]: r for r in lp}
    for r in rows:
        src = by_brand[r["brand"]]
        assert r["total_qty"] == src["qty"]
        assert r["weighted_median_price_e2"] in set(src["prices"])


def test_winnowing_guarantee(spark):
    """The MOSS guarantee: two documents sharing a substring of length
    >= k + w - 1 (11 normalized chars here) MUST share at least one
    winnowed fingerprint; disjoint-alphabet documents share none."""
    from event_driven_data_pipeline_for_e_commerce_spark.llmdata.dedup import (
        winnow_fingerprint_frame,
    )

    shared = "the quick brown fox jumps"
    df = spark.createDataFrame(
        [
            (1, f"AAA {shared} BBB padding text one two three"),
            (2, f"zzz {shared} yyy completely different tail words"),
            (3, "0123456789 0123456789 0123456789 0123456789"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprint_frame(df, "text", "doc_id", k=8, w=4)
    by_doc = {
        r["doc_id"]: set(r["fps"])
        for r in fps.groupBy("doc_id")
        .agg(F.collect_set("fp").alias("fps"))
        .collect()
    }
    assert by_doc[1] & by_doc[2], "shared passage must share a fingerprint"
    assert not (by_doc[1] & by_doc[3]), "disjoint alphabets must not"
    assert not (by_doc[2] & by_doc[3])
