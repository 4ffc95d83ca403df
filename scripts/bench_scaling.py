#!/usr/bin/env python
"""Measured scaling curve for the heavy query families (VERDICT-r10
task 2): run the headline heavy subset at sf0.1 (driver data) and at
the locally tiled sf0.5 / sf1 (scripts/gen_scaled_testdata.py), fit
the per-query time-vs-rows exponent, and write BENCH_SCALING.json.

alpha = log(t_hi / t_lo) / log(rows_hi / rows_lo) between sf0.1 and
the largest generated SF (per-SF times are the MIN of REPS runs —
minimum is the right noise estimator on a box whose CPU drifts
1.2-3x; the dual fixed-work probes are recorded alongside). alpha ~ 1
means the plan's cost is linear in data volume (what every "scales"
claim in VERDICT/PLANS asserts); alpha ~ 2 means a pair blowup.

Fixed-cost caveat: at these absolute sizes (0.3-5s) a query's time
includes a constant scheduling/setup floor, so alpha UNDER-estimates
pure data-volume scaling slightly — fine for the purpose (catching
accidental quadratics), stated for honesty.

Usage: python scripts/bench_scaling.py            # all three SFs
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Production-path heavy families (the two documented sample-scale
# audit contracts — minhash_recall_stats, doc_containment_pairs —
# are excluded BY CONTRACT: their truth sides are quadratic in the
# sample by design and carry `weak` labels already).
HEAVY = [
    "doc_minhash_near_dup",
    "doc_dedup_family_agreement",
    "doc_dedup_family_agreement_survivors",
    "copurchase_kcore_peel3",
    "supplier_shared_part_jaccard_topk",
    "part_copurchase_pagerank",
    "copurchase_triangle_census",
    "emb_cosine_topk",
    "emb_ivf_topk",
    "emb_ann_recall_contract",
    "doc_dedup_survivors",
    "session_windows",
]

SFS = [
    ("sf0.1", "/root/testdata/sf0.1", 600_000),
    ("sf0.5", os.path.join(REPO, "scaledata/sf0.5"), 3_000_000),
    ("sf1", os.path.join(REPO, "scaledata/sf1"), 6_000_000),
]
REPS = 2


def _cpu_probe() -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(10_000_000):
        s += i
    return round(time.perf_counter() - t0, 4)


def main() -> None:
    from event_driven_data_pipeline_for_e_commerce_spark.operators.pinning import (
        release_pinned,
    )
    from event_driven_data_pipeline_for_e_commerce_spark.plans import corpus
    from event_driven_data_pipeline_for_e_commerce_spark.session import get_spark

    spark = get_spark("edp-bench-scaling")
    probe_pre = _cpu_probe()

    # warm-up: one pass at sf0.001 (JIT/codegen, same code)
    for name in HEAVY:
        try:
            corpus.QUERIES[name](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass
    release_pinned()
    spark.catalog.clearCache()

    results: dict[str, dict[str, float]] = {n: {} for n in HEAVY}
    for sf_name, sf_dir, _rows in SFS:
        if not os.path.isdir(sf_dir):
            print(f"skip {sf_name}: {sf_dir} missing", flush=True)
            continue
        for name in HEAVY:
            best = None
            for _ in range(REPS):
                release_pinned()
                spark.catalog.clearCache()
                # time CONSTRUCTION + execution: queries that pin()
                # intermediates materialize them at construction, and
                # for a scaling curve that work is the point (bench.py
                # deliberately times post-pin steady state instead —
                # different instrument, both documented)
                t0 = time.perf_counter()
                df = corpus.QUERIES[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results[name][sf_name] = round(best, 3)
            print(f"{sf_name} {name}: {best:.3f}s", flush=True)

    probe_post = _cpu_probe()

    lo_name, _, lo_rows = SFS[0]
    hi_name, _, hi_rows = SFS[-1]
    per_query = {}
    for name, r in results.items():
        entry = dict(r)
        if lo_name in r and hi_name in r and r[lo_name] > 0:
            alpha = math.log(r[hi_name] / r[lo_name]) / math.log(
                hi_rows / lo_rows
            )
            if r[hi_name] < 2.0:
                # below ~2s the constant driver-side construction /
                # scheduling floor dominates and the fitted exponent
                # is noise — report the times, not a fake alpha (a
                # genuine quadratic would be far above this floor at
                # 10x data)
                entry["alpha_note"] = "too fast to fit (floor-bound)"
            else:
                entry["alpha"] = round(alpha, 3)
        per_query[name] = entry

    payload = {
        "metric": "scaling_curve",
        "construction": (
            "sf0.5/sf1 = sf0.1 tiled 5x/10x with disjoint key ranges, "
            "~1/3 token rewrite per doc copy, per-element embedding "
            "jitter (scripts/gen_scaled_testdata.py) — linear corpus "
            "growth at preserved distribution shape"
        ),
        "rows_basis": "lineitem rows (all fact tables scale together)",
        "reps": REPS,
        "estimator": "min over reps",
        "cpu_probe_s_pre": probe_pre,
        "cpu_probe_s": probe_post,
        "alpha_between": [lo_name, hi_name],
        "queries": per_query,
    }
    out = os.path.join(REPO, "BENCH_SCALING.json")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({k: v.get("alpha") for k, v in per_query.items()}))
    try:
        spark.stop()
    except Exception:
        pass


if __name__ == "__main__":
    main()
