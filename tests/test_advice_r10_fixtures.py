"""Adversarial fixtures for the three ADVICE-r10 fixes.

Each test builds a tiny crafted parquet table that puts the query in
EXACTLY the regime the advice flagged — magnitudes past 2^53 for the
changepoint argmax, a chain whose single-pass closure would strand a
state, sub-quantum distance near-ties for the 2-NN rank — and
asserts the fixed semantics on the ENGINE and (where the oracle is
portable across data) agreement with a from-first-principles Python
computation. The stock testdata never exercises these regimes (that
is why the advice called them latent), so these fixtures are the
regression guard that keeps the fixes fixed.
"""

from __future__ import annotations

import os
from datetime import date, datetime
from fractions import Fraction

import duckdb
import pytest

from event_driven_data_pipeline_for_e_commerce_spark.plans.corpus import (
    ORACLES,
    QUERIES,
)


def _write_parquet(spark, tmpdir: str, name: str, df) -> None:
    # coalesce(1): tiny fixture, one file, deterministic scan order
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmpdir, f"{name}.parquet")
    )


def _oracle_rows(tmpdir: str, name: str):
    con = duckdb.connect()
    for t in os.listdir(tmpdir):
        if t.endswith(".parquet"):
            con.execute(
                f"CREATE VIEW {t[:-8]} AS SELECT * FROM "
                f"read_parquet('{tmpdir}/{t}/*.parquet')"
            )
    return con.execute(ORACLES[name]).fetchall()


def test_best_split_exact_argmax_past_2pow53(spark, tmp_path):
    """Daily cents large enough that prefix sums exceed 2^53 — the
    regime where the former ROUND(q) ordering key was the identity on
    a double and inherited ULP noise. The fixed pairwise-rational
    argmax must agree with an exact Fraction computation of the
    objective, and the DuckDB oracle must agree with the engine on
    the same crafted data."""
    tmpdir = str(tmp_path)
    # 12 days; totals ~9e12 dollars -> ~9e14 cents/day, prefix sums
    # up to ~1e16 > 2^53. A real mean shift at day 9 so the argmax is
    # meaningful; values vary so no two objectives tie.
    rows = []
    cents = [
        9_000_000_000_000_37,
        9_000_000_000_000_91,
        9_000_000_000_001_53,
        9_000_000_000_000_11,
        9_000_000_000_002_77,
        9_000_000_000_001_03,
        9_000_000_000_000_59,
        9_000_000_000_002_23,
        3_000_000_000_000_41,
        3_000_000_000_001_87,
        3_000_000_000_000_67,
        3_000_000_000_002_09,
    ]
    for i, c in enumerate(cents):
        rows.append(
            (
                i + 1,
                1,
                "O",
                c / 100.0,
                datetime(1995, 1, i + 1),
                "1-URGENT",
            )
        )
    odf = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    )
    _write_parquet(spark, tmpdir, "orders", odf)

    # engine
    got = QUERIES["daily_revenue_best_split"](spark, tmpdir).collect()
    assert len(got) == 1
    engine_day = got[0]["split_day"]

    # exact Fraction argmax of q = s1^2/n1 + (s-s1)^2/(n-n1) from the
    # EXACT cents the engine derives (double o_totalprice*100 rounds
    # back to these integers exactly: 9e14 < 2^53)
    n = len(cents)
    s = sum(cents)
    best = None
    for k in range(1, n):
        s1 = sum(cents[:k])
        q = Fraction(s1 * s1, k) + Fraction((s - s1) ** 2, n - k)
        if best is None or q > best[0]:
            best = (q, k)
    true_day = date(1995, 1, best[1])
    assert engine_day == true_day

    # oracle parity on the same crafted data
    ora = _oracle_rows(tmpdir, "daily_revenue_best_split")
    assert len(ora) == 1
    ora_day = ora[0][0]
    ora_day = ora_day.date() if hasattr(ora_day, "date") else ora_day
    assert ora_day == true_day


def test_markov_closure_conserves_mass_on_strandable_chain(
    spark, tmp_path
):
    """A chain where the single-pass closure strands a state: C's
    only transition goes to D, and D is never a source — one closure
    pass keeps C (it IS a source) while dropping its only out-cell,
    so C's probability mass silently leaks from the power iteration
    (the ADVICE-r10 mode). The fixpoint closure must drop C entirely
    and return a distribution that sums to exactly 1 over {A, B}."""
    tmpdir = str(tmp_path)
    rows = []
    ts0 = datetime(2024, 1, 1)
    # user 1: A -> B -> A -> B -> A  (closed two-state loop)
    for i, et in enumerate(["A", "B", "A", "B", "A"]):
        rows.append((i + 1, ts0.replace(minute=i), 1, et, 1.0, "{}"))
    # user 2: C -> D  (D never appears as a source)
    rows.append((10, ts0.replace(minute=10), 2, "C", 1.0, "{}"))
    rows.append((11, ts0.replace(minute=11), 2, "D", 1.0, "{}"))
    edf = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    _write_parquet(spark, tmpdir, "events", edf)

    got = {
        r["state"]: r["stationary_prob"]
        for r in QUERIES["event_markov_stationary"](spark, tmpdir).collect()
    }
    assert set(got) == {"A", "B"}, got
    assert abs(sum(got.values()) - 1.0) < 1e-9, got

    ora = _oracle_rows(tmpdir, "event_markov_stationary")
    assert {r[0] for r in ora} == {"A", "B"}
    assert abs(sum(r[1] for r in ora) - 1.0) < 1e-9


def test_intrinsic_2nn_ties_and_duplicates_deterministic(spark, tmp_path):
    """Exact-duplicate exclusion plus symmetric distance ties — the
    regimes the integerized ranking key must make deterministic
    across engines (the ADVICE-r10 hazard was DuckDB's
    list_dot_product and Spark's zip_with fold disagreeing by a ULP
    on near-equal distances and swapping ranks). The sample is the
    whole corpus here (every id is 0 mod 4): ids 0 and 4 are
    byte-identical vectors (d2_1 = 0 -> both excluded, exactly the
    documented survivor accounting), ids 8 and 12 sit at EXACTLY
    tied distances from them by symmetry (+-1 on axis x), and both
    engines must resolve every tie by vec_id and emit identical
    integer-derived outputs."""
    tmpdir = str(tmp_path)
    dim = 4

    def vec(x):
        return [float(x)] + [0.0] * (dim - 1)

    rows = [
        (0, vec(0.0), 0),   # exact duplicate pair -> excluded
        (4, vec(0.0), 0),   # (d2_1 = 0 for both)
        (8, vec(1.0), 1),   # tie: d2 to 0 and to 4 both exactly 1
        (12, vec(-1.0), 1),  # symmetric partner, d2 to 0/4 also 1
        (16, vec(3.0), 1),
    ]
    edf = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )
    _write_parquet(spark, tmpdir, "embeddings", edf)

    got = QUERIES["emb_intrinsic_dimension_2nn"](spark, tmpdir).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_sample"] == 5
    # anchors 8, 12, 16 survive; the duplicate pair is excluded
    assert r["n_anchors_used"] == 3

    ora = _oracle_rows(tmpdir, "emb_intrinsic_dimension_2nn")
    assert len(ora) == 1
    assert ora[0][0] == 5 and ora[0][1] == 3
    # exact agreement of the integer-derived outputs: the tie choices
    # (0-vs-4 as rank 1 for anchors 8/12; 8-vs-12 ordering for 16's
    # neighbors) resolve by vec_id identically on both engines
    assert float(ora[0][2]) == pytest.approx(r["id_2nn"], abs=1e-9)
    assert float(ora[0][3]) == pytest.approx(r["mean_ln_mu"], abs=1e-9)

    # from-first-principles check of the surviving anchors' estimate:
    # 8: r1 = 1 (to 0), r2 = 1 (to 4)   -> ln mu = 0
    # 12: r1 = 1 (to 0), r2 = 1 (to 4)  -> ln mu = 0
    # 16: r1 = 4 (to 8), r2 = 9 (to 0)  -> ln mu = 0.5*ln(9/4)
    import math

    expect_mean = (0.0 + 0.0 + 0.5 * math.log(9.0 / 4.0)) / 3.0
    assert r["mean_ln_mu"] == pytest.approx(expect_mean, abs=1e-6)
