"""Behavioral invariants for the round-2 operators (SURVEY §5.2.2
style): properties that must hold on ANY input, checked on the
sf0.001 testdata alongside the oracle-differential rows."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from event_driven_data_pipeline_for_e_commerce_spark.plans.corpus import QUERIES
from event_driven_data_pipeline_for_e_commerce_spark.plans.tables import load_tables


def test_sequence_pack_conserves_tokens(spark, sf_dir):
    """Packing must neither drop nor duplicate tokens: per-source
    bin_tokens sums equal the per-source corpus token counts, and
    every bin holds at least one document."""
    t = load_tables(spark, sf_dir)
    packed = QUERIES["doc_sequence_pack"](spark, sf_dir)
    per_source = {
        r["source"]: r["tok"]
        for r in t["documents"]
        .groupBy("source")
        .agg(
            F.sum(
                F.size(F.split(F.lower(F.trim("text")), r"\s+"))
            ).alias("tok")
        )
        .collect()
    }
    rows = packed.collect()
    assert all(r["n_docs"] >= 1 for r in rows)
    got = {}
    for r in rows:
        got[r["source"]] = got.get(r["source"], 0) + r["bin_tokens"]
    assert got == per_source


def test_vocab_encode_bounds(spark, sf_dir):
    """Encoded ids live in [0, VOCAB_SIZE]; OOV count never exceeds the
    token count; the id prefix is exactly min(n_tokens, 16) long."""
    from event_driven_data_pipeline_for_e_commerce_spark.plans.llm_queries import (
        ENCODE_PREFIX,
        VOCAB_SIZE,
    )

    rows = QUERIES["doc_vocab_encode"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        ids = [int(x) for x in r["id_prefix"].split(",") if x != ""]
        assert len(ids) == min(r["n_tokens"], ENCODE_PREFIX)
        assert all(0 <= i <= VOCAB_SIZE for i in ids)


def test_kmeans_assignment_partitions_corpus(spark, sf_dir):
    """One Lloyd iteration must assign every vector to exactly one of
    the k seed clusters (counts partition the corpus) and every
    emitted centroid norm is finite and positive."""
    from event_driven_data_pipeline_for_e_commerce_spark.plans.llm_queries import KMEANS_K

    t = load_tables(spark, sf_dir)
    n_vectors = t["embeddings"].count()
    rows = QUERIES["emb_kmeans_assign"](spark, sf_dir).collect()
    assert sum(r["n_members"] for r in rows) == n_vectors
    assert {r["cluster_id"] for r in rows} <= set(range(KMEANS_K))
    assert all(
        r["new_centroid_norm"] > 0 and math.isfinite(r["new_centroid_norm"])
        for r in rows
    )


def test_int8_quantize_error_bound(spark, sf_dir):
    """Symmetric absmax int8: per-dimension error is at most half a
    quantization step (amax/254), so the L2 reconstruction error is
    bounded by sqrt(dim) * amax / 254."""
    rows = QUERIES["emb_int8_quantize"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        bound = math.sqrt(64) * r["scale_max"] / 254.0
        assert r["recon_err"] <= bound + 1e-6, (r, bound)


def test_basket_pairs_match_brute_force(spark, sf_dir):
    """The basket-collect pair unfold must produce exactly the pair
    supports a naive distinct self-join computes."""
    t = load_tables(spark, sf_dir)
    op = t["lineitem"].select("l_orderkey", "l_partkey").distinct()
    a = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_a"))
    b = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_b"))
    brute = (
        a.join(b, "k")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("support"))
        .orderBy(F.desc("support"), "part_a", "part_b")
        .limit(20)
        .collect()
    )
    got = QUERIES["basket_part_pairs"](spark, sf_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in brute]


def test_rfm_segments_partition_customers(spark, sf_dir):
    """Every customer with an order lands in exactly one RFM segment."""
    t = load_tables(spark, sf_dir)
    n_cust = t["orders"].select("o_custkey").distinct().count()
    rows = QUERIES["rfm_segments"](spark, sf_dir).collect()
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert 1 <= r["r_score"] <= 4
        assert 1 <= r["f_score"] <= 4
        assert 1 <= r["m_score"] <= 4


def test_segment_dedup_fraction_bounds(spark, sf_dir):
    """Duplicated-segment counts are bounded by the segment count and
    the fraction is consistent with them."""
    rows = QUERIES["doc_segment_dedup"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["dup_segments"] <= r["n_segments"]
        assert abs(r["dup_fraction"] - round(r["dup_segments"] / r["n_segments"], 4)) < 1e-9


def test_gapfill_calendar_is_dense(spark, sf_dir):
    """Gap-fill must emit one row per calendar day between min and max
    with no holes, and ma7 must equal the trailing mean of the emitted
    series."""
    rows = sorted(
        QUERIES["daily_revenue_gapfill_ma7"](spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    days = [r["day"] for r in rows]
    assert (days[-1] - days[0]).days + 1 == len(days), "calendar has holes"
    for i in range(len(rows)):
        window = [r["revenue"] for r in rows[max(0, i - 6): i + 1]]
        assert abs(rows[i]["ma7"] - round(sum(window) / len(window), 2)) <= 0.011


def test_simhash_banding_is_complete(spark, sf_dir):
    """Pigeonhole banding is EXACT for Hamming search (unlike
    probabilistic LSH): every pair within the radius shares a band, so
    the banded result must equal the brute-force all-pairs answer."""
    import pyspark.sql.functions as F

    from event_driven_data_pipeline_for_e_commerce_spark.llmdata.dedup import (
        simhash,
        simhash_near_duplicates,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    fp = simhash(docs, "text", "doc_id", bits=16)
    a = fp.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"))
    b = fp.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"))
    brute = (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.expr("bit_count(sh_a ^ sh_b)").cast("long"))
        .filter(F.col("hamming") <= 2)
        .select("doc_a", "doc_b", "hamming")
        .collect()
    )
    banded = simhash_near_duplicates(
        docs, "text", "doc_id", bits=16, max_hamming=2
    ).collect()
    assert sorted(map(tuple, banded)) == sorted(map(tuple, brute))


def test_snapshot_diff_partitions_old_rows(spark, sf_dir):
    """deleted + changed + unchanged must equal the old snapshot's row
    count (every old row gets exactly one verdict)."""
    t = load_tables(spark, sf_dir)
    n_old = t["orders"].count()
    rows = {r["change_type"]: r["cnt"]
            for r in QUERIES["snapshot_diff_reconciliation"](spark, sf_dir).collect()}
    assert set(rows) == {"deleted", "changed", "unchanged"}
    assert sum(rows.values()) == n_old


def test_wau_first_day_equals_dau(spark, sf_dir):
    """On the first calendar day the trailing-7 window holds only that
    day, so WAU(d0) must equal day-0 distinct users."""
    t = load_tables(spark, sf_dir)
    rows = sorted(
        QUERIES["weekly_active_users"](spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    d0 = rows[0]["day"]
    dau0 = (
        t["events"]
        .filter(F.to_date("ts") == F.lit(d0))
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows[0]["wau"] == dau0


def test_winsorize_clip_fraction_bounded(spark, sf_dir):
    """Clipping to [p01, p99] can touch at most ~2% of rows per
    segment (plus discrete-quantile tie slack)."""
    for r in QUERIES["winsorized_order_values"](spark, sf_dir).collect():
        assert r["clipped_cnt"] <= max(0.05 * r["n_orders"], 4), r


def test_abandonment_counts_consistent(spark, sf_dir):
    """Abandoned sessions are a subset of clicked sessions, which are
    a subset of all sessions; the percentage matches the counts."""
    for r in QUERIES["cart_abandonment_daily"](spark, sf_dir).collect():
        assert r["abandoned_sessions"] <= r["clicked_sessions"] <= r["n_sessions"]
        if r["clicked_sessions"]:
            want = round(100.0 * r["abandoned_sessions"] / r["clicked_sessions"], 4)
            assert abs(r["abandonment_pct"] - want) < 1e-6
