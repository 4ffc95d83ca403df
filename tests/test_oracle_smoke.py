"""Fast oracle smoke (r12): the full 447-query oracle sweep
(tests/test_corpus_oracle.py) is `slow`-marked and excluded from the
default driver-verify pytest run (pytest.ini), so the default run
keeps a targeted oracle-differential check on the queries whose
IMPLEMENTATIONS were rewritten in the last two optimization rounds —
the highest-risk semantic surface. Each is compared value-exactly
against its unchanged DuckDB oracle at sf0.001 (the compare the
driver's correctness gate runs at sf0.01)."""

from __future__ import annotations

import pytest

from event_driven_data_pipeline_for_e_commerce_spark.plans.corpus import (
    ORACLES,
    QUERIES,
)

from .oracle_utils import compare_query

# r11 rewrites (fingerprint/count/flag-grain dedup, session affinity,
# watermark sweep, triangle wedge collect) + r12-touched queries
# (shared ANN truth projection, pagerank edge-build revert).
REWRITTEN = [
    "doc_simhash_near_dup",
    "doc_dedup_family_agreement",
    "doc_dedup_family_agreement_survivors",
    "doc_dedup_detector_kappa",
    "session_event_type_affinity",
    "events_watermark_drop_sweep",
    "copurchase_triangle_census",
    "part_copurchase_pagerank",
    "emb_ann_recall_contract",
    "doc_minhash_near_dup",
    "copurchase_kcore_peel3",
]


@pytest.mark.parametrize("name", REWRITTEN)
def test_rewritten_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    compare_query(spark, sf_dir, df, ORACLES[name])
