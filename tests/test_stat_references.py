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


# ---------------------------------------------------------------------------
# Round-10 additions: Spearman, GK gamma, Poisson bootstrap, periodogram,
# Markov stationary, modularity, JS divergence, circular stats, triplet
# margins, Cramér's V
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def events():
    return pd.read_parquet(f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def documents():
    return pd.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def embeddings():
    return pd.read_parquet(f"{SF}/embeddings.parquet")


def test_spearman_matches_pandas(spark, orders):
    """pandas' own Spearman (average-rank + Pearson) vs the engines'
    integer-midrank formulation."""
    r = _row(QUERIES["daily_revenue_ordercount_spearman"](spark, SF))
    d = orders.groupby("day").agg(
        cents=("cents", "sum"), n_orders=("cents", "size")
    )
    rho = float(
        d["cents"]
        .rank(method="average")
        .corr(d["n_orders"].rank(method="average"))
    )
    assert r["n_days"] == len(d)
    assert abs(r["spearman_rho"] - rho) < 1e-5


def test_gk_gamma_matches_numpy_pairs(spark, orders):
    """Literal O(n^2) pairwise concordance over RAW ROWS (the engines
    count from the contingency cells)."""
    r = _row(QUERIES["order_priority_value_gamma"](spark, SF))
    pri = orders["o_orderpriority"].str[0].astype(int).to_numpy()
    band = orders["cents"].astype(str).str.len().to_numpy()
    sp = np.sign(pri[:, None] - pri[None, :])
    sb = np.sign(band[:, None] - band[None, :])
    prod = sp * sb
    conc = int((prod > 0).sum()) // 2
    disc = int((prod < 0).sum()) // 2
    assert r["concordant_pairs"] == conc
    assert r["discordant_pairs"] == disc
    assert abs(r["gk_gamma"] - (conc - disc) / (conc + disc)) < 1e-6


def test_poisson_bootstrap_matches_numpy(spark, orders):
    """Replicate the deterministic hash-weight stream and the replicate
    means in numpy; np.percentile(linear) is the same interpolation as
    percentile_cont."""
    r = _row(QUERIES["orders_poisson_bootstrap_ci"](spark, SF))
    ok = orders["o_orderkey"].to_numpy().astype(np.int64)
    cents = orders["cents"].to_numpy().astype(np.float64)
    T = [367879, 735759, 919699, 981012, 996340]
    means = []
    for b in range(64):
        u = ((ok % 1000003) * 2654435761 + b * 40503) % 1000000
        w = np.select(
            [u < T[0], u < T[1], u < T[2], u < T[3], u < T[4]],
            [0, 1, 2, 3, 4],
            5,
        )
        means.append(float((w * cents).sum() / w.sum()))
    lo, hi = np.percentile(means, [2.5, 97.5])
    assert r["n_orders"] == len(ok)
    assert r["n_replicates"] == 64
    assert abs(r["mean_cents"] - cents.mean()) < 0.011
    assert abs(r["ci_lo_cents"] - lo) < 0.011
    assert abs(r["ci_hi_cents"] - hi) < 0.011


def test_periodogram_matches_numpy(spark, orders):
    """Direct numpy cos/sin dot products on the day series (no per-row
    integerization)."""
    rows = {
        r["period_days"]: r
        for r in QUERIES["daily_revenue_periodogram"](spark, SF).collect()
    }
    d = orders.groupby("day")["cents"].sum().sort_index().to_numpy(float)
    t = np.arange(1, len(d) + 1, dtype=float)
    for p in (7, 14, 30, 91, 365):
        th = 2 * np.pi * t / p
        amp = (
            2
            * np.hypot((d * np.cos(th)).sum(), (d * np.sin(th)).sum())
            / d.sum()
        )
        assert abs(rows[p]["amplitude_share"] - amp) < 1e-4, p


def test_markov_stationary_matches_numpy(spark, events):
    """Replicate the 8 requantized power iterations with a numpy
    matrix product; also sanity-check v8 against the true stationary
    eigenvector (the chain mixes fast)."""
    rows = {
        r["state"]: r
        for r in QUERIES["event_markov_stationary"](spark, SF).collect()
    }
    ev = events.sort_values(["user_id", "ts", "event_id"]).copy()
    ev["dst"] = ev.groupby("user_id")["event_type"].shift(-1)
    pairs = ev.dropna(subset=["dst"])
    cells = pairs.groupby(["event_type", "dst"]).size()
    states = sorted(cells.index.get_level_values(0).unique())
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    P = np.zeros((k, k))
    for (s, d), c in cells.items():
        if d in idx:
            P[idx[s], idx[d]] = c
    P = P / P.sum(axis=1, keepdims=True)
    v = np.full(k, 1.0 / k)
    for _ in range(8):
        v = np.round(v @ P, 12)
    for s in states:
        assert abs(rows[s]["stationary_prob"] - v[idx[s]]) < 1e-6, s
    # convergence sanity: v8 is near the true left eigenvector
    w, vecs = np.linalg.eig(P.T)
    pi = np.real(vecs[:, np.argmin(np.abs(w - 1))])
    pi = pi / pi.sum()
    assert np.abs(v - pi).max() < 0.02


def test_modularity_matches_numpy(spark, lineitem):
    """Rebuild the shared-part supplier graph with pandas merges and
    compute Newman Q directly."""
    r = _row(QUERIES["supplier_graph_nation_modularity"](spark, SF))
    sup = pd.read_parquet(f"{SF}/supplier.parquet")
    sp = lineitem[["l_suppkey", "l_partkey"]].drop_duplicates()
    e = sp.merge(sp, on="l_partkey", suffixes=("_a", "_b"))
    e = e[e["l_suppkey_a"] < e["l_suppkey_b"]][
        ["l_suppkey_a", "l_suppkey_b"]
    ].drop_duplicates()
    m = len(e)
    nat = dict(zip(sup["s_suppkey"], sup["s_nationkey"]))
    deg = (
        pd.concat([e["l_suppkey_a"], e["l_suppkey_b"]])
        .value_counts()
        .rename_axis("s")
        .reset_index(name="d")
    )
    deg["c"] = deg["s"].map(nat)
    dc = deg.groupby("c")["d"].sum()
    ca = e["l_suppkey_a"].map(nat)
    cb = e["l_suppkey_b"].map(nat)
    mcc = ca[ca == cb].value_counts()
    q = sum(
        float(mcc.get(c, 0)) / m - (float(dc[c]) * 0.5 / m) ** 2
        for c in dc.index
    )
    assert r["n_edges"] == m
    assert r["n_communities"] == len(dc)
    assert abs(r["modularity"] - q) < 1e-5


def test_js_divergence_matches_numpy(spark, documents):
    """Counter-based token distributions + direct numpy JS."""
    r = _row(QUERIES["doc_train_test_js_divergence"](spark, SF))
    docs = documents.copy()
    docs["toks"] = docs["text"].str.lower().str.strip().str.split()
    is_train = (docs["doc_id"] % 10 < 8).to_numpy()
    from collections import Counter

    cp, cq = Counter(), Counter()
    for toks, tr in zip(docs["toks"], is_train):
        (cp if tr else cq).update(toks)
    vocab = sorted(set(cp) | set(cq))
    p = np.array([cp.get(t, 0) for t in vocab], float)
    q = np.array([cq.get(t, 0) for t in vocab], float)
    np_, nq_ = p.sum(), q.sum()
    p, q = p / np_, q / nq_
    m = (p + q) / 2
    with np.errstate(divide="ignore", invalid="ignore"):
        js = 0.5 * np.nansum(
            np.where(p > 0, p * np.log2(p / m), 0.0)
        ) + 0.5 * np.nansum(np.where(q > 0, q * np.log2(q / m), 0.0))
    assert r["n_train_tokens"] == int(np_)
    assert r["n_test_tokens"] == int(nq_)
    assert r["shared_vocab"] == int(((p > 0) & (q > 0)).sum())
    assert abs(r["js_bits"] - js) < 1e-4


def test_circular_stats_match_numpy(spark, events):
    """Complex-exponential formulation: R = |sum(e^{i theta})|/n,
    mean hour from the argument — vs the engines' integerized
    cos/sin sums + atan2."""
    rows = {
        r["event_type"]: r
        for r in QUERIES["event_hour_circular_stats"](spark, SF).collect()
    }
    ev = events.copy()
    sec = (
        ev["ts"].dt.hour * 3600 + ev["ts"].dt.minute * 60 + ev["ts"].dt.second
    )
    ev["theta"] = 2 * np.pi * sec / 86400
    for et, g in ev.groupby("event_type"):
        z = np.exp(1j * g["theta"].to_numpy()).sum()
        n = len(g)
        r_len = abs(z) / n
        mean_hour = (np.angle(z) % (2 * np.pi)) / (2 * np.pi) * 24
        assert rows[et]["n_events"] == n
        assert abs(rows[et]["resultant_r"] - r_len) < 1e-4, et
        assert abs(rows[et]["mean_hour"] - mean_hour) < 1e-3, et


def test_triplet_margins_match_numpy(spark, embeddings):
    """Rebuild the deterministic triplets in pandas and the cosine
    margins in vectorized numpy."""
    r = _row(QUERIES["emb_triplet_margin_stats"](spark, SF))
    emb = embeddings.sort_values(["label", "vec_id"]).copy()
    emb["pos_id"] = emb.groupby("label")["vec_id"].shift(-1)
    vec = {
        int(i): np.asarray(v, float)
        for i, v in zip(embeddings["vec_id"], embeddings["embedding"])
    }
    lab = dict(zip(embeddings["vec_id"].astype(int), embeddings["label"]))
    margins = []
    for _, row in emb.iterrows():
        a = int(row["vec_id"])
        if a % 4 != 0 or pd.isna(row["pos_id"]):
            continue
        pos, neg = int(row["pos_id"]), a + 17
        if neg not in vec or lab[neg] == row["label"]:
            continue

        def cos(x, y):
            return float(
                np.dot(x, y) / (np.linalg.norm(x) * np.linalg.norm(y))
            )

        margins.append(cos(vec[a], vec[pos]) - cos(vec[a], vec[neg]))
    m_e6 = np.rint(np.array(margins) * 1e6)
    assert r["n_triplets"] == len(margins)
    assert abs(r["mean_margin"] - m_e6.sum() / (len(m_e6) * 1e6)) < 1e-6
    assert abs(r["violation_rate"] - (m_e6 < 0).mean()) < 1e-4
    assert abs(r["p10_margin"] - np.percentile(m_e6, 10) / 1e6) < 1e-5
    assert abs(r["p90_margin"] - np.percentile(m_e6, 90) / 1e6) < 1e-5


def test_cramers_v_matches_numpy(spark, lineitem):
    """Observed-cell chi-square (the documented semantics) from a
    pandas crosstab."""
    r = _row(QUERIES["quantity_discount_cramers_v"](spark, SF))
    q = np.rint(lineitem["l_quantity"]).astype(int)
    d = np.rint(lineitem["l_discount"] * 100).astype(int)
    cells = pd.crosstab(q, d)
    n = int(cells.values.sum())
    rq = cells.sum(axis=1)
    cd = cells.sum(axis=0)
    chi = 0.0
    for qi in cells.index:
        for di in cells.columns:
            o = cells.loc[qi, di]
            if o > 0:
                e = float(rq[qi]) * float(cd[di]) / n
                chi += (o - e) ** 2 / e
    v = np.sqrt(chi / (n * (min(len(rq), len(cd)) - 1)))
    assert r["n_lines"] == n
    assert r["n_quantity_levels"] == len(rq)
    assert r["n_discount_levels"] == len(cd)
    assert abs(r["chi_square"] - chi) < 1e-3
    assert abs(r["cramers_v"] - v) < 1e-5


def test_hurst_rs_matches_numpy(spark, orders):
    """Classical float R/S replication (float block means + cumsum,
    np.polyfit) vs the engines' exact-integer block deviations."""
    r = _row(QUERIES["daily_revenue_hurst_rs"](spark, SF))
    x = orders.groupby("day")["cents"].sum().sort_index().to_numpy(float)
    n = len(x)
    ws, ys = [], []
    for w in (8, 16, 32, 64, 128):
        nb = n // w
        vals = []
        for b in range(nb):
            blk = x[b * w : (b + 1) * w]
            dev = np.cumsum(blk - blk.mean())
            rng = dev.max() - dev.min()
            s = blk.std()  # population std, ddof=0
            if rng > 0 and s > 0:
                vals.append(np.log(rng / s))
        ws.append(np.log(w))
        ys.append(np.mean(vals))
    slope = np.polyfit(ws, ys, 1)[0]
    assert r["n_days"] == n
    assert r["n_block_sizes"] == 5
    assert abs(r["hurst_exponent"] - slope) < 1e-3


def test_weibull_fit_matches_numpy(spark, orders):
    """np.polyfit on the grouped Weibull plot (same plotting positions,
    independent code path)."""
    r = _row(QUERIES["repeat_gap_weibull_fit"](spark, SF))
    o = orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    nxt = o.groupby("o_custkey")["day"].shift(-1)
    gaps = (nxt - o["day"]).dt.days.dropna().astype(int)
    gaps = gaps[gaps >= 1]
    v = gaps.value_counts().sort_index()
    nn = int(v.sum())
    cinc = v.cumsum()
    xs = np.log(v.index.to_numpy(float))
    ys = np.log(-np.log(1 - cinc.to_numpy(float) / (nn + 1)))
    k, a = np.polyfit(xs, ys, 1)
    lam = np.exp(-a / k)
    assert r["n_gaps"] == nn
    assert r["n_gap_values"] == len(v)
    assert abs(r["weibull_shape"] - k) < 1e-3
    assert abs(r["weibull_scale_days"] - lam) / lam < 1e-3


def test_intrinsic_dimension_matches_numpy(spark, embeddings):
    """Full numpy distance matrix + argsort two-NN + Facco MLE."""
    r = _row(QUERIES["emb_intrinsic_dimension_2nn"](spark, SF))
    sub = embeddings[embeddings["vec_id"] % 4 == 0].sort_values("vec_id")
    V = np.stack(sub["embedding"].to_numpy()).astype(float)
    n = len(V)
    d2 = ((V[:, None, :] - V[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    lnmu = []
    for i in range(n):
        idx = np.lexsort((sub["vec_id"].to_numpy(), d2[i]))
        r1, r2 = d2[i][idx[0]], d2[i][idx[1]]
        if r1 > 0:
            lnmu.append(0.5 * np.log(r2 / r1))
    est = len(lnmu) / sum(lnmu)
    assert r["n_sample"] == n
    assert r["n_anchors_used"] == len(lnmu)
    assert abs(r["id_2nn"] - est) < 1e-3
    assert abs(r["mean_ln_mu"] - np.mean(lnmu)) < 1e-5


def test_ljung_box_matches_numpy(spark, orders):
    """Direct float autocorrelations + the textbook Q formula."""
    r = _row(QUERIES["daily_revenue_ljung_box"](spark, SF))
    x = orders.groupby("day")["cents"].sum().sort_index().to_numpy(float)
    n = len(x)
    d = x - x.mean()
    den = (d * d).sum()
    q = 0.0
    rhos = []
    for k in range(1, 15):
        rho = (d[:-k] * d[k:]).sum() / den
        rhos.append(rho)
        q += rho * rho / (n - k)
    q *= n * (n + 2)
    assert r["n_days"] == n
    assert r["max_lag"] == 14
    assert abs(r["q_stat"] - q) < max(1e-3, 1e-6 * abs(q))
    assert abs(r["rho_lag1"] - rhos[0]) < 1e-6


# ---------------------------------------------------------------------------
# Round-11 additions (each independently formulated — see module doc)
# ---------------------------------------------------------------------------


def test_chao1_matches_pandas(spark, documents):
    """Token value_counts per source + the bias-corrected Chao1 and
    Good-Turing formulas (pandas split/explode instead of the SQL
    regex tokenizer)."""
    rows = {
        r["source"]: r
        for r in QUERIES["doc_vocab_chao1_richness"](spark, SF).collect()
    }
    toks = (
        documents.assign(
            token=documents["text"].str.strip().str.lower().str.split()
        )
        .explode("token")
        .groupby(["source", "token"])
        .size()
    )
    for source, tf in toks.groupby(level=0):
        v = len(tf)
        f1 = int((tf == 1).sum())
        f2 = int((tf == 2).sum())
        n = int(tf.sum())
        r = rows[source]
        assert r["vocab_size"] == v
        assert r["f1"] == f1 and r["f2"] == f2 and r["n_tokens"] == n
        assert abs(
            r["chao1_vocab_est"] - (v + f1 * (f1 - 1) / (2 * (f2 + 1)))
        ) < 0.01
        assert r["gt_unseen_ppm"] == f1 * 1_000_000 // n


def test_cohen_kappa_formula_consistency(spark):
    """The kappa output must satisfy the textbook float po/pe
    formulation recomputed from the query's OWN 2x2 counts (the
    engines use exact integer polynomials — this checks the algebra,
    marginals, and universe accounting all agree)."""
    r = _row(QUERIES["doc_dedup_detector_kappa"](spark, SF))
    n = r["n_docs"]
    n11, n10 = r["n_both_flag"], r["n_minhash_only"]
    n01, n00 = r["n_simhash_only"], r["n_neither"]
    assert n == n11 + n10 + n01 + n00
    po = (n11 + n00) / n
    pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / n**2
    assert abs(r["observed_agreement"] - po) < 1e-6
    assert abs(r["chance_agreement"] - pe) < 1e-6
    assert abs(r["cohen_kappa"] - (po - pe) / (1 - pe)) < 1e-5


def test_jarque_bera_matches_numpy(spark, orders):
    """Raw float central moments of the daily series (no
    standardization pass — a different computation order than the
    engines' integerized z-powers)."""
    r = _row(QUERIES["daily_revenue_jarque_bera"](spark, SF))
    x = orders.groupby("day")["cents"].sum().sort_index().to_numpy(float)
    n = len(x)
    d = x - x.mean()
    m2 = (d**2).mean()
    s = (d**3).mean() / m2**1.5
    k = (d**4).mean() / m2**2 - 3
    jb = n / 6 * (s**2 + k**2 / 4)
    assert r["n_days"] == n
    assert abs(r["skewness"] - s) < 1e-3
    assert abs(r["excess_kurtosis"] - k) < 1e-3
    assert abs(r["jb_stat"] - jb) < max(1e-2, 1e-3 * abs(jb))


def test_blocked_edit_pairs_match_python_dp(spark):
    """Pure-Python DP Levenshtein over the same (brand, size) blocks
    — an independent edit-distance implementation."""
    part = pd.read_parquet(f"{SF}/part.parquet")

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    ref: dict[str, list[int]] = {}
    for (brand, _size), blk in part.groupby(["p_brand", "p_size"]):
        blk = blk.sort_values("p_partkey")
        names = blk["p_name"].tolist()
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                ref.setdefault(brand, []).append(lev(names[i], names[j]))
    rows = {
        r["p_brand"]: r
        for r in QUERIES["part_name_blocked_edit_pairs"](spark, SF).collect()
    }
    assert set(rows) == set(ref)
    for brand, dists in ref.items():
        r = rows[brand]
        assert r["n_pairs"] == len(dists)
        assert r["n_near"] == sum(1 for d in dists if d <= 12)
        assert r["min_dist"] == min(dists)
        assert abs(r["avg_dist"] - sum(dists) / len(dists)) < 0.005


def test_cuped_matches_numpy(spark, orders):
    """theta/corr via np.cov over the per-customer pre/post matrix
    (population normalization cancels in the ratios)."""
    r = _row(QUERIES["customer_spend_cuped"](spark, SF))
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    split = pd.Timestamp("1996-01-01")
    o = orders.copy()
    pre = o[o["day"] < split].groupby("o_custkey")["cents"].sum()
    post = o[o["day"] >= split].groupby("o_custkey")["cents"].sum()
    u = pd.DataFrame(index=cust["c_custkey"])
    u["x"] = pre.reindex(u.index).fillna(0)
    u["y"] = post.reindex(u.index).fillna(0)
    c = np.cov(u["x"], u["y"], ddof=0)
    theta = c[0, 1] / c[0, 0]
    rho = c[0, 1] / np.sqrt(c[0, 0] * c[1, 1])
    assert r["n_customers"] == len(u)
    assert abs(r["theta"] - theta) < 1e-5
    assert abs(r["corr_xy"] - rho) < 1e-5
    assert abs(r["var_reduction_pct"] - 100 * rho**2) < 1e-3


def test_permutation_entropy_matches_python(spark, orders):
    """Stable-argsort ordinal patterns via Python sorted() keys (a
    different pattern-encoding mechanism than the SQL comparison
    counts)."""
    r = _row(QUERIES["daily_revenue_permutation_entropy"](spark, SF))
    x = orders.groupby("day")["cents"].sum().sort_index().to_numpy()
    counts: dict[int, int] = {}
    for i in range(len(x) - 2):
        vals = x[i : i + 3]
        order = sorted(range(3), key=lambda k: (vals[k], k))
        rank = [0] * 3
        for pos, k in enumerate(order):
            rank[k] = pos
        pid = rank[0] * 9 + rank[1] * 3 + rank[2]
        counts[pid] = counts.get(pid, 0) + 1
    n = sum(counts.values())
    p = np.array(list(counts.values())) / n
    h = float(-(p * np.log(p)).sum())
    top = max(counts, key=lambda k: (counts[k], -k))
    assert r["n_triples"] == n
    assert r["n_patterns_seen"] == len(counts)
    assert abs(r["perm_entropy"] - h) < 1e-4
    assert abs(r["normalized_pe"] - h / np.log(6)) < 1e-4
    assert r["top_pattern"] == top


def test_ccc_matches_numpy(spark, orders, lineitem):
    """Lin's CCC from float means/variances/covariance (ddof=0)."""
    r = _row(QUERIES["order_total_lineitem_ccc"](spark, SF))
    li = lineitem.copy()
    # half-up cent rounding to match SQL ROUND (np.rint banker's
    # rounding differs on exact .5 boundaries and shifts the means)
    li["lc"] = np.floor(
        li["l_extendedprice"] * (1 - li["l_discount"]) * 100 + 0.5
    ).astype(np.int64)
    o = orders.copy()
    o["cents_hu"] = np.floor(o["o_totalprice"] * 100 + 0.5).astype(np.int64)
    y = li.groupby("l_orderkey")["lc"].sum()
    x = o.set_index("o_orderkey")["cents_hu"].reindex(y.index)
    keep = x.notna()
    x, y = x[keep].to_numpy(float), y[keep].to_numpy(float)
    sxy = np.cov(x, y, ddof=0)[0, 1]
    ccc = 2 * sxy / (x.var() + y.var() + (x.mean() - y.mean()) ** 2)
    pear = sxy / np.sqrt(x.var() * y.var())
    assert r["n_orders"] == len(x)
    assert abs(r["ccc"] - ccc) < 1e-5
    assert abs(r["pearson_r"] - pear) < 1e-5
    assert abs(r["mean_diff_cents"] - (x.mean() - y.mean())) < 0.01


def test_morans_i_matches_numpy(spark, orders, lineitem):
    """Double loop over the nation-pair weight matrix with float
    z-scores (no integerization)."""
    r = _row(QUERIES["nation_revenue_morans_i"](spark, SF))
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    supp = pd.read_parquet(f"{SF}/supplier.parquet")
    o = orders.merge(
        cust[["c_custkey", "c_nationkey"]],
        left_on="o_custkey",
        right_on="c_custkey",
    )
    revs = (
        o.groupby("c_nationkey")["cents"]
        .sum()
        .reindex(nation["n_nationkey"])
        .fillna(0)
        .to_numpy(float)
    )
    edges = (
        lineitem.merge(
            orders[["o_orderkey", "o_custkey"]],
            left_on="l_orderkey",
            right_on="o_orderkey",
        )
        .merge(
            cust[["c_custkey", "c_nationkey"]],
            left_on="o_custkey",
            right_on="c_custkey",
        )
        .merge(
            supp[["s_suppkey", "s_nationkey"]],
            left_on="l_suppkey",
            right_on="s_suppkey",
        )
    )
    edges = edges[edges["c_nationkey"] != edges["s_nationkey"]]
    w = edges.groupby(["c_nationkey", "s_nationkey"]).size()
    z = revs - revs.mean()
    nk = nation["n_nationkey"].to_numpy()
    pos = {int(k): idx for idx, k in enumerate(nk)}
    swzz = sum(
        wt * z[pos[int(i)]] * z[pos[int(j)]] for (i, j), wt in w.items()
    )
    n = len(nk)
    i_stat = n / w.sum() * swzz / (z**2).sum()
    assert r["n_nations"] == n
    assert r["w_total"] == int(w.sum())
    assert abs(r["morans_i"] - i_stat) < 1e-4
    assert abs(r["expected_i"] - (-1 / (n - 1))) < 1e-6
