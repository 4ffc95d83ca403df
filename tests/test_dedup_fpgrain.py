"""Round-11 optimization: fingerprint-grain SimHash radius search.

The r11 rewrite moved ``simhash_near_duplicates`` (and the count/flag
forms the agreement queries derive from it) from a doc-grain band
self-join to fingerprint-value grain. These tests pin the exact
equivalence the rewrite relies on:

1. the operator's output equals a brute-force all-pairs Hamming scan
   (the ground truth BOTH the old and new forms must match), on a
   synthetic corpus engineered to hold identical-text classes
   (fingerprint multiplicity > 1 — the hamming-0 membership self-join
   path) AND near-copy docs at radius 1-2 (the cross-fingerprint
   band-join path);
2. ``simhash_fp_pairs`` finds exactly the distinct fingerprint pairs
   within the radius (pigeonhole completeness over the banding);
3. the capped-bucket flag derivation used by doc_dedup_detector_kappa
   equals the pair-endpoint union of ``lsh_candidate_pairs`` on the
   same band-keys input, including when the max_bucket cap binds.
"""

from __future__ import annotations

import itertools

import pyspark.sql.functions as F

from event_driven_data_pipeline_for_e_commerce_spark.llmdata.dedup import (
    lsh_candidate_pairs,
    simhash,
    simhash_fp_pairs,
    simhash_near_duplicates,
)
from event_driven_data_pipeline_for_e_commerce_spark.operators.pinning import (
    release_pinned,
)

# near-copy cluster (single-word edits => Hamming-close fingerprints),
# an identical-text class of 3 (fingerprint multiplicity 3), and
# unrelated texts
_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river edge"),
    (3, "the quick brown fox jumps over the lazy cat near the river bank"),
    (4, "completely different text about warehouse inventory management"),
    (5, "completely different text about warehouse inventory management"),
    (6, "completely different text about warehouse inventory management"),
    (7, "unrelated third document discussing quarterly revenue forecasts"),
    (8, "the quick brown fox leaps over the lazy dog near the river bank"),
]


def _docs_df(spark):
    return spark.createDataFrame(_DOCS, ["doc_id", "text"])


def test_simhash_near_duplicates_matches_brute_force(spark):
    docs = _docs_df(spark)
    for bits, radius in ((16, 2), (32, 2), (32, 1)):
        fps = {
            r["doc_id"]: r["simhash"]
            for r in simhash(docs, "text", "doc_id", bits=bits).collect()
        }
        truth = sorted(
            (a, b, bin(fps[a] ^ fps[b]).count("1"))
            for a, b in itertools.combinations(sorted(fps), 2)
            if bin(fps[a] ^ fps[b]).count("1") <= radius
        )
        got = sorted(
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in simhash_near_duplicates(
                docs, "text", "doc_id", bits=bits, max_hamming=radius
            ).collect()
        )
        release_pinned()
        assert got == truth, (bits, radius)
    # the identical-text class must surface all 3 hamming-0 pairs
    pairs = sorted(
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_duplicates(
            docs, "text", "doc_id", bits=32, max_hamming=2
        ).collect()
        if r["hamming"] == 0
    )
    release_pinned()
    assert [(4, 5), (4, 6), (5, 6)] == [p for p in pairs if p[0] >= 4]


def test_simhash_fp_pairs_completeness(spark):
    docs = _docs_df(spark)
    fp = simhash(docs, "text", "doc_id", bits=32)
    vals = sorted({r["simhash"] for r in fp.collect()})
    truth = sorted(
        (a, b, bin(a ^ b).count("1"))
        for a, b in itertools.combinations(vals, 2)
        if bin(a ^ b).count("1") <= 2
    )
    got = sorted(
        (r["fa"], r["fb"], r["hamming"])
        for r in simhash_fp_pairs(fp, bits=32, max_hamming=2).collect()
    )
    release_pinned()
    assert got == truth


def test_capped_bucket_flags_equal_pair_endpoints(spark):
    # band-keys frame where one bucket exceeds the cap: with cap=3,
    # the 5-doc bucket keeps ids (1,2,3) only — flags must mirror the
    # pair-generation slice exactly
    rows = [(i, 0, "hot") for i in (5, 3, 1, 4, 2)] + [
        (10, 0, "warm"),
        (11, 0, "warm"),
        (20, 1, "lonely"),
    ]
    bands = spark.createDataFrame(rows, ["doc_id", "band", "band_key"])
    for cap in (3, 1000):
        pairs = lsh_candidate_pairs(bands, "doc_id", max_bucket=cap)
        endpoint_flags = sorted(
            r["doc_id"]
            for r in pairs.select(F.col("doc_a").alias("doc_id"))
            .union(pairs.select("doc_b"))
            .distinct()
            .collect()
        )
        ids = F.slice(
            F.array_distinct(F.sort_array(F.collect_list("doc_id"))), 1, cap
        )
        explode_flags = sorted(
            r["doc_id"]
            for r in bands.groupBy("band", "band_key")
            .agg(ids.alias("ids"))
            .filter(F.size("ids") > 1)
            .select(F.explode("ids").alias("doc_id"))
            .distinct()
            .collect()
        )
        assert endpoint_flags == explode_flags, cap
        if cap == 3:
            assert explode_flags == [1, 2, 3, 10, 11]


def test_family_agreement_count_identity(spark):
    """n_simhash_pairs = sum(mult choose 2) + sum(mult_a*mult_b over
    verified fp pairs) must equal the materialized pair count."""
    docs = _docs_df(spark)
    n_pairs = simhash_near_duplicates(
        docs, "text", "doc_id", bits=32, max_hamming=2
    ).count()
    release_pinned()
    fp = simhash(docs, "text", "doc_id", bits=32)
    fpg = fp.groupBy("simhash").agg(F.count(F.lit(1)).alias("mult"))
    same = (
        fpg.agg(F.sum(F.col("mult") * (F.col("mult") - 1) / 2).cast("long"))
        .collect()[0][0]
    )
    fpp = simhash_fp_pairs(fpg, bits=32, max_hamming=2)
    ma = fpg.select(F.col("simhash").alias("fa"), F.col("mult").alias("ma"))
    mb = fpg.select(F.col("simhash").alias("fb"), F.col("mult").alias("mb"))
    cross = (
        fpp.join(ma, "fa").join(mb, "fb")
        .agg(F.coalesce(F.sum(F.col("ma") * F.col("mb")), F.lit(0)).cast("long"))
        .collect()[0][0]
    )
    release_pinned()
    assert same + cross == n_pairs
