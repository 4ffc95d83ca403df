"""TPC-H-shaped analytical join queries over the testdata star schema.

The reference's Gold layer is one multi-way star join
(``PROJECT/ecom_Gold_Layer.ipynb:62-84``) and its dashboard runs
filter -> join -> aggregate -> top-k marts (``app.py`` tabs).  These
queries exercise the same plan shapes at their industry-standard
hardest: selective multi-way joins (Q3/Q5), semi-join EXISTS (Q4),
cross-nation pair analysis (Q7), conditional-aggregate market share
(Q8), decorrelated scalar subquery (Q17), disjunctive predicate
join (Q19), and scalar-threshold + NOT EXISTS anti-join (Q22) —
each a canonical 100 TB plan-shape stressor.

Scale notes (local[32] now, 1000-executor target):
- dimension chains (region/nation/customer-slice, part-slice,
  supplier) are broadcast explicitly; the probe side never shuffles
  for them.
- selective filters are applied BEFORE joins so Catalyst pushes them
  into the parquet scan (verified: ``PushedFilters`` on
  ``c_mktsegment``, ``o_orderdate``, ``p_brand``).
- fact-fact joins (orders x lineitem) shuffle on the join key once;
  group-bys reuse that partitioning where keys align (Q3 groups by
  ``l_orderkey`` right after the ``l_orderkey`` join).
- top-k always goes through ``orderBy().limit()`` ->
  ``TakeOrderedAndProject`` (no global sort materialization).

Registered into the same QUERIES/ORACLES registry as the relational
corpus (imported at the end of ``corpus.py``).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from .corpus import query
from .tables import load_tables


def _ts(lit: str):
    """UTC midnight timestamp literal matching DuckDB ``TIMESTAMP 'x'``."""
    return F.lit(lit).cast("timestamp")


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q_q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: segment-filtered customers x date-filtered orders
    x shipped-later lineitems, grouped per order, top-10 by revenue.

    Reference parity: the dashboard's filter->join->agg->nlargest marts
    (app.py:253-260,400) composed into one plan.  The filtered customer
    slice (~1/5 of an already-small dim) is broadcast; the orders
    filter pushes into the scan; the final group-by key equals the
    orders-lineitem join key so AQE keeps the partitioning.
    """
    t = load_tables(spark, sf_dir)
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = (
        t["orders"]
        .filter(F.col("o_orderdate") < _ts("1998-01-01"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate")
    )
    li = t["lineitem"].filter(F.col("l_shipdate") > _ts("1998-01-01"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q4_priority_semi_exists",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def q_q4_priority_semi_exists(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS over the fact table as a left-semi join
    with a cross-column residual predicate (shipped >60 days after
    order), counted per priority.

    The only anti/semi construct in the reference is the SCD2 MERGE
    not-matched branch (Scd_Type2.sql:46-53); this is its semi twin at
    fact-fact scale.  Spark plans a shuffle on ``orderkey`` for the
    semi join and the residual stays in the join condition — no
    fan-out, no dedup pass.
    """
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    semi = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def q_q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: six-way join with a cyclic condition (customer
    and supplier must share a nation) — the hardest join-ordering case
    in the dashboard's geography chain (corpus ``revenue_by_region``).

    Plan: region->nation restricts to ASIA nations (broadcast);
    customer and supplier are pre-joined to that slice (broadcast
    probes, no shuffle); the one real shuffle is orders x lineitem on
    ``orderkey``; the cyclic nation-equality is enforced as a residual
    equi-condition on the supplier join.
    """
    t = load_tables(spark, sf_dir)
    asia_nations = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    cust = (
        t["customer"]
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_nationkey")
    )
    supp = (
        t["supplier"]
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    orders = (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= _ts("1997-01-01"))
            & (F.col("o_orderdate") < _ts("1998-01-01"))
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_nationkey")
    )
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "q7_nation_trade_volume",
    oracle="""
    SELECT cn.n_name AS cust_nation,
           sn.n_name AS supp_nation,
           CAST(YEAR(l.l_shipdate) AS BIGINT) AS ship_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS volume
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    WHERE cn.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5')
      AND sn.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5')
      AND cn.n_name <> sn.n_name
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY cust_nation, supp_nation, ship_year
    ORDER BY cust_nation, supp_nation, ship_year
    """,
)
def q_q7_nation_trade_volume(spark, sf_dir):
    """TPC-H Q7 shape: cross-border trade volume between nation pairs
    per ship year — the cross-entity flavor of the dashboard's monthly
    revenue-by-state mart (app.py:345-347).

    Both nation slices broadcast through customer and supplier; the
    pair predicate (customer nation != supplier nation) spans the two
    sides, so it applies after both enrich joins — it cannot push
    below either; one shuffle for orders x lineitem, one for the
    final group-by.
    """
    t = load_tables(spark, sf_dir)
    trade_nations = ["NATION_1", "NATION_2", "NATION_3", "NATION_4", "NATION_5"]
    nations = t["nation"].filter(F.col("n_name").isin(*trade_nations))
    cust = (
        t["customer"]
        .join(F.broadcast(nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    supp = (
        t["supplier"]
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = (
        t["orders"]
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "cust_nation")
    )
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("volume")
        )
        .orderBy("cust_nation", "supp_nation", "ship_year")
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS order_year,
           ROUND(SUM(CASE WHEN sn.n_name = 'NATION_3'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS mkt_share
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = cn.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'EUROPE'
    GROUP BY order_year
    ORDER BY order_year
    """,
)
def q_q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of a region's import volume
    per year — a conditional-aggregate ratio (G11 ``sum(when)`` over
    the J3 geography chain), the engine form of the dashboard's
    conversion-rate KPIs (app.py:258-260).

    Every dimension path is broadcast; the single shuffle pair is
    orders x lineitem then the year group-by.  The CASE lives inside
    the aggregate, so both numerator and denominator come out of one
    pass (no self-join).
    """
    t = load_tables(spark, sf_dir)
    europe_cust = (
        t["customer"]
        .join(
            F.broadcast(
                t["nation"].join(
                    F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    orders = (
        t["orders"]
        .join(F.broadcast(europe_cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("mkt_share")
        )
        .orderBy("order_year")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#4'
      AND l.l_quantity < (
        SELECT 0.5 * AVG(l2.l_quantity)
        FROM lineitem l2
        WHERE l2.l_partkey = p.p_partkey
      )
    """,
)
def q_q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity threshold), decorrelated Spark-side into a partial
    aggregate + broadcast join.

    The scalar-subquery pattern appears in the reference as the SCD2
    SK offset (Scd_Type2.sql:33-34); this is its per-group
    generalization.  The per-part averages frame is tiny (one row per
    part) and broadcast; lineitem is scanned once for the averages and
    once for the probe — at 100 TB the averages side would be
    pre-aggregated map-side (partial avg) before its shuffle, which is
    exactly what Catalyst plans for the groupBy.
    """
    t = load_tables(spark, sf_dir)
    brand_parts = (
        t["part"].filter(F.col("p_brand") == "Brand#4").select("p_partkey")
    )
    part_avg = (
        t["lineitem"]
        .groupBy("l_partkey")
        .agg((F.avg("l_quantity") * F.lit(0.5)).alias("qty_threshold"))
        .join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("l_partkey").alias("t_partkey"), "qty_threshold")
    )
    return (
        t["lineitem"]
        .join(F.broadcast(part_avg), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"))
    )


@query(
    "q22_prospective_customers",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS num_cust,
           ROUND(SUM(c.c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c.c_mktsegment
    """,
)
def q_q22_prospective_customers(spark, sf_dir):
    """TPC-H Q22 shape: global scalar-subquery threshold (average
    positive balance) combined with NOT EXISTS (lapsed customers —
    no order since 2000), grouped per market segment.

    The scalar average is computed as a 1-row frame and crossJoin-
    broadcast onto the probe — no ``collect()``, so the plan stays a
    single DAG the scheduler can overlap with the anti-join side.
    The NOT EXISTS maps to ``left_anti`` against the bare ``o_custkey``
    column (column-pruned scan of orders, shuffle on the key only).
    """
    t = load_tables(spark, sf_dir)
    avg_bal = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    return (
        t["customer"]
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            t["orders"]
            .filter(F.col("o_orderdate") >= _ts("2000-01-01"))
            .select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("num_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@query(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS line_count
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#2'  AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 15)
       OR (p.p_brand = 'Brand#17' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q_q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides.

    The part side of each disjunct (brand + size band) is pushed into
    the broadcast build; the cross-side residual (quantity band per
    brand) stays in the join filter.  Catalyst extracts the common
    part-side filter ``p_brand IN (...)`` below the join
    (PushedFilters on the part scan), which is the scan-reduction that
    matters at 100 TB — the disjunction itself is cheap codegen.
    """
    t = load_tables(spark, sf_dir)
    part = t["part"].select("p_partkey", "p_brand", "p_size")
    li = t["lineitem"].select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#17")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_brand").isin("Brand#2", "Brand#17", "Brand#19"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("line_count"),
        )
    )
