"""Numpy/pandas re-derivations of the statistical query family.

The driver's correctness gate proves engine == DuckDB oracle; these
tests add a THIRD, independently-coded opinion (pandas/numpy, often a
different formulation — e.g. group-mean ANOVA sums of squares instead
of the Q-shortcut both SQL engines use), so a formula bug shared by
the Spark plan and its oracle cannot survive (the ADVICE-r8 ANOVA-df
lesson generalized). Tolerances allow for the engines' final ROUND()
plus float association differences, never for formula drift.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from event_driven_data_pipeline_for_e_commerce_spark.plans.corpus import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders():
    df = pd.read_parquet(f"{SF}/orders.parquet")
    df["cents"] = np.rint(df["o_totalprice"] * 100).astype(np.int64)
    df["day"] = pd.to_datetime(df["o_orderdate"]).dt.normalize()
    return df


@pytest.fixture(scope="module")
def lineitem():
    df = pd.read_parquet(f"{SF}/lineitem.parquet")
    return df


def _row(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_kruskal_wallis_matches_numpy(spark, orders):
    """Tie-corrected H via pandas average ranks (a different rank
    mechanism than the engines' cumulative-count formula)."""
    r = _row(QUERIES["order_value_priority_kruskal_wallis"](spark, SF))
    g = orders[["o_orderpriority", "cents"]].copy()
    g["rank"] = g["cents"].rank(method="average")
    n = len(g)
    rj = g.groupby("o_orderpriority")["rank"].agg(["sum", "count"])
    h = 12.0 / (n * (n + 1)) * float(
        (rj["sum"] ** 2 / rj["count"]).sum()
    ) - 3.0 * (n + 1)
    _, t = np.unique(g["cents"].to_numpy(), return_counts=True)
    corr = 1.0 - float((t.astype(float) ** 3 - t).sum()) / (n**3 - n)
    k = len(rj)
    h_adj = h / corr
    assert r["n_orders"] == n
    assert r["k_groups"] == k
    assert abs(r["h_stat"] - h_adj) < 1e-3
    assert abs(r["tie_correction"] - corr) < 1e-5
    assert abs(r["epsilon_sq"] - (h_adj - k + 1) / (n - k)) < 1e-5


def test_mann_kendall_matches_numpy(spark, orders):
    """S via a literal O(n^2) double loop over the day series."""
    r = _row(QUERIES["daily_revenue_mann_kendall"](spark, SF))
    d = orders.groupby("day")["cents"].sum().sort_index().to_numpy()
    n = len(d)
    s = int(sum(np.sign(d[j] - d[i]) for i in range(n) for j in range(i + 1, n)))
    _, t = np.unique(d, return_counts=True)
    tie = float((t * (t - 1) * (2 * t + 5)).sum())
    var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
    cc = 1 if s > 0 else (-1 if s < 0 else 0)
    assert r["n_days"] == n
    assert r["s_stat"] == s
    assert abs(r["var_s"] - var) < 1e-2
    assert abs(r["z_score"] - (s - cc) / np.sqrt(var)) < 1e-3
    assert abs(r["kendall_tau"] - s / (0.5 * n * (n - 1))) < 1e-5


def test_theilsen_matches_numpy(spark, orders):
    """Median pairwise slope via numpy broadcasting + np.percentile
    (linear interpolation — the percentile_cont convention)."""
    r = _row(QUERIES["monthly_revenue_theilsen_trend"](spark, SF))
    m = orders.copy()
    m["idx"] = m["day"].dt.year * 12 + m["day"].dt.month
    mo = m.groupby("idx")["cents"].sum().sort_index()
    x = mo.index.to_numpy(dtype=float)
    y = mo.to_numpy(dtype=float)
    i, j = np.triu_indices(len(x), k=1)
    slopes = (y[j] - y[i]) / (x[j] - x[i])
    assert r["n_months"] == len(x)
    assert r["n_pairs"] == len(slopes)
    assert abs(r["theilsen_slope"] - np.percentile(slopes, 50)) < 1e-3
    assert abs(r["slope_p25"] - np.percentile(slopes, 25)) < 1e-3
    assert abs(r["slope_p75"] - np.percentile(slopes, 75)) < 1e-3
    b = np.polyfit(x, y, 1)[0]
    assert abs(r["ols_slope"] - b) < max(1e-3, abs(b) * 1e-6)


def test_runs_test_matches_numpy(spark, orders):
    """Runs counted by literal scan of the sign sequence."""
    r = _row(QUERIES["daily_revenue_runs_test"](spark, SF))
    d = orders.groupby("day")["cents"].sum().sort_index().to_numpy(dtype=float)
    med = np.percentile(d, 50)
    signs = [1 if v > med else 0 for v in d if v != med]
    n1 = sum(signs)
    n2 = len(signs) - n1
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1.0))
    )
    assert r["n_above"] == n1 and r["n_below"] == n2
    assert r["n_runs"] == runs
    assert abs(r["z_score"] - (runs - mu) / np.sqrt(var)) < 1e-3


def test_welch_ttest_matches_numpy(spark, lineitem):
    """Welch t via pandas group means/vars (ddof=1) — the textbook
    formulation, not the pooled-moment pivot the engines use."""
    r = _row(QUERIES["late_shipment_value_welch_ttest"](spark, SF))
    orders = pd.read_parquet(f"{SF}/orders.parquet")[
        ["o_orderkey", "o_orderdate"]
    ]
    j = lineitem.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    cents = np.rint(
        j["l_extendedprice"] * (1 - j["l_discount"]) * 100
    ).astype(np.int64)
    delay = (
        pd.to_datetime(j["l_shipdate"]).dt.normalize()
        - pd.to_datetime(j["o_orderdate"]).dt.normalize()
    ).dt.days
    late = delay > 90
    a = cents[late].to_numpy(dtype=float)
    b = cents[~late].to_numpy(dtype=float)
    se1 = a.var(ddof=1) / len(a)
    se2 = b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(se1 + se2)
    df = (se1 + se2) ** 2 / (
        se1**2 / (len(a) - 1) + se2**2 / (len(b) - 1)
    )
    assert r["n_late"] == len(a) and r["n_ontime"] == len(b)
    assert abs(r["mean_late_cents"] - a.mean()) < 0.02
    assert abs(r["mean_ontime_cents"] - b.mean()) < 0.02
    assert abs(r["t_stat"] - t) < 1e-3
    assert abs(r["df_welch"] - df) < max(0.02, df * 1e-6)


def test_anova2_matches_group_mean_decomposition(spark, orders):
    """Two-way weighted (Type-I) F stats re-derived from GROUP MEANS
    (SSA = sum n_a (mean_a - grand)^2, etc.) — a structurally
    different computation than the Q-sum shortcut both SQL engines
    share, so a shared shortcut bug cannot pass."""
    r = _row(QUERIES["order_value_priority_weekend_anova2"](spark, SF))
    g = orders.copy()
    g["wk"] = (
        (g["day"] - pd.Timestamp("1970-01-05")).dt.days % 7 >= 5
    ).astype(int)
    y = g["cents"].astype(float)
    grand = y.mean()
    n = len(g)
    ssa = sum(
        len(sub) * (sub["cents"].mean() - grand) ** 2
        for _, sub in g.groupby("o_orderpriority")
    )
    ssb = sum(
        len(sub) * (sub["cents"].mean() - grand) ** 2
        for _, sub in g.groupby("wk")
    )
    cells = g.groupby(["o_orderpriority", "wk"])
    ssc = sum(
        len(sub) * (sub["cents"].mean() - grand) ** 2 for _, sub in cells
    )
    sst = float(((y - grand) ** 2).sum())
    sse = sst - ssc
    npri = g["o_orderpriority"].nunique()
    nwk = g["wk"].nunique()
    ncells = len(cells)
    dfa, dfb = npri - 1, nwk - 1
    dfi = ncells - npri - nwk + 1
    dfe = n - ncells
    err = sse / dfe
    assert r["n_orders"] == n
    assert abs(r["f_priority"] - (ssa / dfa) / err) < 1e-2
    assert abs(r["f_weekend"] - (ssb / dfb) / err) < 1e-2
    assert abs(r["f_interaction"] - ((ssc - ssa - ssb) / dfi) / err) < 1e-2
    assert abs(r["eta2_cells"] - ssc / sst) < 1e-4


def test_dispersion_matches_numpy(spark, lineitem):
    r = _row(QUERIES["order_linecount_dispersion"](spark, SF))
    c = lineitem.groupby("l_orderkey").size().to_numpy(dtype=float)
    vmr = c.var(ddof=1) / c.mean()
    assert r["n_orders"] == len(c)
    assert abs(r["mean_lines"] - c.mean()) < 1e-3
    assert abs(r["vmr"] - vmr) < 1e-3
    z = np.sqrt(2 * vmr * (len(c) - 1)) - np.sqrt(2 * (len(c) - 1) - 1)
    assert abs(r["dispersion_z"] - z) < 1e-3


def test_assortativity_matches_numpy(spark, lineitem):
    r = _row(QUERIES["supplier_part_degree_assortativity"](spark, SF))
    e = lineitem[["l_suppkey", "l_partkey"]].drop_duplicates()
    ds = e.groupby("l_suppkey").size().rename("x")
    dp = e.groupby("l_partkey").size().rename("y")
    j = e.join(ds, on="l_suppkey").join(dp, on="l_partkey")
    rho = np.corrcoef(j["x"].astype(float), j["y"].astype(float))[0, 1]
    assert r["n_edges"] == len(e)
    assert r["n_suppliers"] == ds.size and r["n_parts"] == dp.size
    assert abs(r["assortativity_r"] - rho) < 1e-5


def test_mutual_information_matches_numpy(spark, lineitem):
    r = _row(QUERIES["quantity_discount_mutual_information"](spark, SF))
    q = np.rint(lineitem["l_quantity"]).astype(int)
    d = np.rint(lineitem["l_discount"] * 100).astype(int)
    tab = pd.crosstab(q, d).to_numpy(dtype=float)
    n = tab.sum()
    p = tab / n
    px = p.sum(axis=1, keepdims=True)
    py = p.sum(axis=0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        mi = float(np.nansum(np.where(p > 0, p * np.log2(p / (px * py)), 0)))
        hx = float(-(px[px > 0] * np.log2(px[px > 0])).sum())
        hy = float(-(py[py > 0] * np.log2(py[py > 0])).sum())
    assert r["n_lines"] == int(n)
    assert abs(r["mi_bits"] - mi) < 1e-4
    assert abs(r["h_quantity_bits"] - hx) < 1e-4
    assert abs(r["h_discount_bits"] - hy) < 1e-4
    assert abs(r["nmi"] - mi / min(hx, hy)) < 1e-4


def test_lag1_autocorr_matches_pandas(spark, orders):
    r = _row(QUERIES["customer_order_value_lag1_autocorr"](spark, SF))
    g = orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]).copy()
    g["prev"] = g.groupby("o_custkey")["cents"].shift(1)
    p = g.dropna(subset=["prev"])
    rho = np.corrcoef(
        p["prev"].astype(float), p["cents"].astype(float)
    )[0, 1]
    assert r["n_pairs"] == len(p)
    assert r["n_customers_multi"] == p["o_custkey"].nunique()
    assert abs(r["lag1_pearson_r"] - rho) < 1e-5
