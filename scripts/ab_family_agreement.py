#!/usr/bin/env python
"""Standalone A/B of doc_dedup_family_agreement (VERDICT r7 #3).

The round-7 verdict flagged the query as the slowest headline entry
(5.81s at sf0.1) and asked for a profile: is the cost the COMPOSITION
(running both dedup families in one query + the pair-set intersect),
or the irreducible cost of the two detectors themselves — dominated on
the mass-duplicated testdata corpus by SimHash's quadratic candidate
OUTPUT (777k pairs from 5k docs, llmdata/dedup.py simhash_near_duplicates
docstring)?

Forms (each timed end-to-end to a noop sink, release_pinned() +
clearCache() between EVERY run, alternating, medians of 4 — the
scripts/ab_ann_recall.py protocol):

  A  the REGISTERED composition after the round-8 rewrite: ONE
     full-outer join of the two pair frames with membership markers,
     one scalar agg — each detector executes exactly once, no pins
  B  the MinHash-LSH banded detector ALONE (pair count agg)
  C  the SimHash pigeonhole detector ALONE (pair count agg)
  D  the pre-round-8 composition (pinned frames, each consumed twice:
     count + left-semi intersect) — the form behind the r7 5.81s

Verdict criterion: composition overhead = A - (B + C); if it is <10%
of (B + C), the cost is the detectors' own and the contract is
irreducible as specified.

Round-8 measurement (sf0.1, local[32], alternating, medians of 4):
A=5.04s, B=0.84s, C=4.08s, D=5.74s -> A-overhead 0.13s = 2.5% of
B+C (the old form D carried 16.7%). The composition now adds <10%;
the cost IS the two detectors, and C (SimHash) dominates because its
candidate OUTPUT is quadratic in the true near-dup classes of the
mass-duplicated testdata corpus (777k pairs from 5k docs) — see
llmdata/dedup.py simhash_near_duplicates.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from event_driven_data_pipeline_for_e_commerce_spark.operators.pinning import (
    release_pinned,
)
from event_driven_data_pipeline_for_e_commerce_spark.plans.corpus import QUERIES
from event_driven_data_pipeline_for_e_commerce_spark.plans.tables import load_tables
from event_driven_data_pipeline_for_e_commerce_spark.session import get_spark


def form_a(spark, sf_dir):
    """The registered composition."""
    return QUERIES["doc_dedup_family_agreement"](spark, sf_dir)


def form_b(spark, sf_dir):
    """MinHash-LSH banded candidate pairs alone (count agg)."""
    from event_driven_data_pipeline_for_e_commerce_spark.llmdata.dedup import (
        _minhash_agg_hashed,
        lsh_candidate_pairs,
        minhash_band_keys,
        shingle_hash_frame,
    )
    from event_driven_data_pipeline_for_e_commerce_spark.plans.llm_queries import (
        NUM_HASHES,
        ROWS_PER_BAND,
        SHINGLE_N,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    shb = shingle_hash_frame(docs, "text", "doc_id", SHINGLE_N)
    sigs = _minhash_agg_hashed(shb, "doc_id", NUM_HASHES)
    bands = minhash_band_keys(sigs, "doc_id", NUM_HASHES, ROWS_PER_BAND)
    mh = lsh_candidate_pairs(bands, "doc_id")
    return mh.agg(F.count(F.lit(1)).alias("n_minhash_pairs"))


def form_c(spark, sf_dir):
    """SimHash Hamming<=2 near-dup pairs alone (count agg)."""
    from event_driven_data_pipeline_for_e_commerce_spark.llmdata.dedup import (
        simhash_near_duplicates,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    sh = simhash_near_duplicates(docs, "text", "doc_id", bits=32, max_hamming=2)
    return sh.agg(F.count(F.lit(1)).alias("n_simhash_pairs"))


def form_d(spark, sf_dir):
    """The pre-round-8 composition (git f20296e): both pair frames
    pinned, each consumed twice (count + left-semi intersect), three
    crossJoined scalar counts — kept so the r7 5.81s headline number
    stays reproducible from history."""
    from event_driven_data_pipeline_for_e_commerce_spark.llmdata.dedup import (
        _minhash_agg_hashed,
        lsh_candidate_pairs,
        minhash_band_keys,
        shingle_hash_frame,
        simhash_near_duplicates,
    )
    from event_driven_data_pipeline_for_e_commerce_spark.operators.pinning import (
        pin,
    )
    from event_driven_data_pipeline_for_e_commerce_spark.plans.llm_queries import (
        NUM_HASHES,
        ROWS_PER_BAND,
        SHINGLE_N,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    shb = shingle_hash_frame(docs, "text", "doc_id", SHINGLE_N)
    sigs = _minhash_agg_hashed(shb, "doc_id", NUM_HASHES)
    bands = minhash_band_keys(sigs, "doc_id", NUM_HASHES, ROWS_PER_BAND)
    mh = pin(lsh_candidate_pairs(bands, "doc_id"))
    sh = pin(
        simhash_near_duplicates(
            docs, "text", "doc_id", bits=32, max_hamming=2
        ).select("doc_a", "doc_b")
    )
    both = mh.join(sh, ["doc_a", "doc_b"], "left_semi")
    n_mh = mh.agg(F.count(F.lit(1)).alias("n_minhash_pairs"))
    n_sh = sh.agg(F.count(F.lit(1)).alias("n_simhash_pairs"))
    n_b = both.agg(F.count(F.lit(1)).alias("n_both"))
    return (
        n_mh.crossJoin(n_sh)
        .crossJoin(n_b)
        .select(
            "n_minhash_pairs",
            "n_simhash_pairs",
            "n_both",
            F.round(
                F.col("n_both")
                * 1.0
                / F.greatest(
                    F.col("n_minhash_pairs")
                    + F.col("n_simhash_pairs")
                    - F.col("n_both"),
                    F.lit(1),
                ),
                4,
            ).alias("pair_jaccard"),
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "4"))
    spark = get_spark("ab-family-agreement")

    def timed(fn):
        release_pinned()
        spark.catalog.clearCache()
        df = fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    warm = "/root/testdata/sf0.001"
    for fn in (form_a, form_b, form_c, form_d):
        timed_dir = warm if os.path.isdir(warm) else sf_dir
        release_pinned()
        spark.catalog.clearCache()
        fn(spark, timed_dir).write.format("noop").mode("overwrite").save()

    a_times, b_times, c_times, d_times = [], [], [], []
    for _ in range(rounds):
        a_times.append(timed(form_a))
        b_times.append(timed(form_b))
        c_times.append(timed(form_c))
        d_times.append(timed(form_d))
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print("A (registered, 1-pass full-outer):", [round(x, 3) for x in a_times])
    print("B (MinHash alone):                ", [round(x, 3) for x in b_times])
    print("C (SimHash alone):                ", [round(x, 3) for x in c_times])
    print("D (pre-r8 pinned intersect):      ", [round(x, 3) for x in d_times])
    a, b, c, d = med(a_times), med(b_times), med(c_times), med(d_times)
    print(
        f"medians  A={a:.3f}  B={b:.3f}  C={c:.3f}  D={d:.3f}"
        f"  A-overhead={a - (b + c):.3f}s"
        f" ({(a - (b + c)) * 100.0 / (b + c):.1f}% of B+C)"
        f"  D-overhead={(d - (b + c)) * 100.0 / (b + c):.1f}%"
    )
    spark.stop()


if __name__ == "__main__":
    main()
