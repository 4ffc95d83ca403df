"""Round-6-staged corpus additions, part 3 (registered in round 5,
below the round-5 driver window): clustering stability
(split-half centroid drift), corpus diversity (per-source bigram
conditional entropy), dedup provenance (near-dup pairs cross-tabbed
by source), behavioral sessionization (gap-session conversion
stats), training-shard balance (hash-shard size audit), fulfilment
shape (order completion mix), and repeat-purchase affinity
(consecutive-order shared-part rate).

Same parity rules as every round: money in integer cents, shares in
integer basis points (Spark impls use exact integral `DIV`; oracles
use the two-engine-portable `CAST(FLOOR(a / b) AS BIGINT)` — equal to
floor division while a < 2^53, which holds at every tested SF),
composed oracles embed the registered oracle CTEs verbatim,
4-6-decimal rounding on float outputs, windows always partitioned by
a key.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from event_driven_data_pipeline_for_e_commerce_spark.llmdata.dedup import (
    minhash_near_duplicates,
)
from event_driven_data_pipeline_for_e_commerce_spark.operators.partitioning import (
    ensure_parallelism,
)

from .corpus import query
from .llm_queries import (
    _MINHASH_CTES,
    JACCARD_THRESHOLD,
    NUM_HASHES,
    ROWS_PER_BAND,
    SHINGLE_N,
)
from .llm_queries import KMEANS_K
from .tables import load_tables


@query(
    "emb_centroid_split_drift",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    seeds AS (SELECT vec_id AS cluster_id, v AS cv FROM e WHERE vec_id < {KMEANS_K}),
    ranked AS (
        SELECT e.vec_id, e.v, e.vec_id % 2 AS half, s.cluster_id,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_distance(e.v, s.cv), s.cluster_id
               ) AS rn
        FROM e, seeds s
    ),
    a AS (SELECT vec_id, v, half, cluster_id FROM ranked WHERE rn = 1),
    pos AS (
        SELECT half, cluster_id, u.i AS pos, v[u.i] AS x
        FROM a, UNNEST(generate_series(1, len(v))) AS u(i)
    ),
    cent AS (
        SELECT half, cluster_id, pos, AVG(x) AS cx
        FROM pos GROUP BY half, cluster_id, pos
    ),
    dots AS (
        SELECT c0.cluster_id,
               SUM(c0.cx * c1.cx) AS dot,
               SQRT(SUM(c0.cx * c0.cx)) AS n0,
               SQRT(SUM(c1.cx * c1.cx)) AS n1
        FROM cent c0
        JOIN cent c1 ON c1.cluster_id = c0.cluster_id AND c1.pos = c0.pos
        WHERE c0.half = 0 AND c1.half = 1
        GROUP BY c0.cluster_id
    ),
    cnt AS (
        SELECT cluster_id,
               CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
               CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_odd
        FROM a GROUP BY cluster_id
    )
    SELECT c.cluster_id, c.n_even, c.n_odd,
           ROUND(d.dot / (d.n0 * d.n1), 6) AS centroid_cosine
    FROM cnt c JOIN dots d USING (cluster_id)
    """,
)
def q_emb_centroid_split_drift(spark, sf_dir):
    """Clustering-stability contract: split the corpus into two
    halves by vec_id parity, assign BOTH halves to the same global
    seed centroids (lowest-id vectors, the emb_kmeans_assign seeds),
    recompute each half's mean centroid per cluster, and report the
    cosine between the two halves' centroids — ~1.0 means the
    clustering is sample-stable, a low value flags clusters driven by
    a handful of vectors (the check run before trusting k-means
    buckets for data mixing).

    Scale shape: seeds broadcast (map-side argmin, zero shuffle for
    assignment — the emb_kmeans_assign shape); centroid means are the
    posexplode + (half, cluster, dim) partial-agg; the cosine join is
    K*dims rows. Nothing corpus-sized shuffles.
    """
    from ..llmdata.similarity import nearest_seed_l2

    t = load_tables(spark, sf_dir)
    e = ensure_parallelism(t["embeddings"]).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    seeds = [
        (r["vec_id"], r["v"])
        for r in e.filter(F.col("vec_id") < KMEANS_K).collect()
    ]
    assigned = e.withColumn("__best", nearest_seed_l2(F.col("v"), seeds)).select(
        "vec_id",
        "v",
        (F.col("vec_id") % 2).alias("half"),
        F.col("__best.cluster_id").alias("cluster_id"),
    )
    pos = assigned.select(
        "half", "cluster_id", F.posexplode("v").alias("pos", "x")
    )
    cent = pos.groupBy("half", "cluster_id", "pos").agg(F.avg("x").alias("cx"))
    c0 = cent.filter(F.col("half") == 0).select(
        "cluster_id", "pos", F.col("cx").alias("cx0")
    )
    c1 = cent.filter(F.col("half") == 1).select(
        "cluster_id", "pos", F.col("cx").alias("cx1")
    )
    dots = (
        c0.join(c1, ["cluster_id", "pos"])
        .groupBy("cluster_id")
        .agg(
            F.sum(F.col("cx0") * F.col("cx1")).alias("dot"),
            F.sqrt(F.sum(F.col("cx0") * F.col("cx0"))).alias("n0"),
            F.sqrt(F.sum(F.col("cx1") * F.col("cx1"))).alias("n1"),
        )
    )
    cnt = assigned.groupBy("cluster_id").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_even"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_odd"),
    )
    return cnt.join(dots, "cluster_id").select(
        "cluster_id",
        "n_even",
        "n_odd",
        F.round(F.col("dot") / (F.col("n0") * F.col("n1")), 6).alias(
            "centroid_cosine"
        ),
    )


@query(
    "doc_bigram_cond_entropy",
    oracle=r"""
    WITH toks AS (
        SELECT source, string_split_regex(lower(trim(text)), '\s+') AS ts
        FROM documents
    ),
    bg AS (
        SELECT source, ts[u.i] AS w1, ts[u.i + 1] AS w2
        FROM toks, UNNEST(generate_series(1, len(ts) - 1)) AS u(i)
    ),
    cnt AS (SELECT source, w1, w2, COUNT(*) AS c FROM bg GROUP BY source, w1, w2),
    tot1 AS (SELECT source, w1, SUM(c) AS t FROM cnt GROUP BY source, w1),
    n AS (SELECT source, SUM(c) AS nb FROM cnt GROUP BY source)
    SELECT c.source,
           CAST(MAX(n.nb) AS BIGINT) AS n_bigrams,
           COUNT(*) AS n_distinct_bigrams,
           ROUND(SUM(-(c.c * 1.0 / n.nb) * LOG2(c.c * 1.0 / t1.t)), 4)
               AS cond_entropy_bits
    FROM cnt c
    JOIN tot1 t1 ON t1.source = c.source AND t1.w1 = c.w1
    JOIN n ON n.source = c.source
    GROUP BY c.source
    """,
)
def q_doc_bigram_cond_entropy(spark, sf_dir):
    """Corpus-diversity metric: per source, the conditional entropy
    H(w2|w1) of its own bigram distribution in bits — low entropy
    flags templated/repetitive sources whose next token is too
    predictable to teach a model anything (the source-level twin of
    doc_bigram_lm_score's per-document fluency score).

    Scale shape: bigrams built map-side (zip_with over two array
    slices, no per-token shuffle); the three aggregations are all
    partial-agg'd on (source, w1[, w2]) keys; the entropy sum joins
    the vocabulary-sized count frame to its own two marginals — no
    corpus-sized join.
    """
    t = load_tables(spark, sf_dir)
    d = ensure_parallelism(t["documents"]).select(
        "source", F.split(F.lower(F.trim("text")), r"\s+").alias("ts")
    )
    bg = d.select(
        "source",
        F.explode(
            F.zip_with(
                F.expr("slice(ts, 1, size(ts) - 1)"),
                F.expr("slice(ts, 2, size(ts) - 1)"),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("b"),
    ).select("source", "b.w1", "b.w2")
    cnt = bg.groupBy("source", "w1", "w2").agg(F.count("*").alias("c"))
    tot1 = cnt.groupBy("source", "w1").agg(F.sum("c").alias("t"))
    n = cnt.groupBy("source").agg(F.sum("c").alias("nb"))
    p_term = -(F.col("c") * 1.0 / F.col("nb")) * F.log2(
        F.col("c") * 1.0 / F.col("t")
    )
    return (
        cnt.join(tot1, ["source", "w1"])
        .join(n, "source")
        .groupBy("source")
        .agg(
            F.max("nb").cast("bigint").alias("n_bigrams"),
            F.count("*").alias("n_distinct_bigrams"),
            F.round(F.sum(p_term), 4).alias("cond_entropy_bits"),
        )
    )


@query(
    "doc_near_dup_cross_source",
    oracle=rf"""
    WITH {_MINHASH_CTES},
    pairs AS (
        SELECT i.doc_a, i.doc_b
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
        WHERE i.n_common * 1.0 / (sa.n + sb.n - i.n_common)
              >= {JACCARD_THRESHOLD}
    )
    SELECT LEAST(da.source, db.source) AS source_a,
           GREATEST(da.source, db.source) AS source_b,
           COUNT(*) AS n_pairs
    FROM pairs p
    JOIN documents da ON da.doc_id = p.doc_a
    JOIN documents db ON db.doc_id = p.doc_b
    GROUP BY 1, 2
    """,
)
def q_doc_near_dup_cross_source(spark, sf_dir):
    """Dedup provenance matrix: the verified MinHash near-dup pairs
    (doc_minhash_near_dup's exact output, oracle CTEs embedded
    verbatim) cross-tabbed by unordered source pair — which sources
    copy from each other vs self-duplicate, the report that decides
    whether to dedup within or across crawl snapshots.

    Scale shape: everything heavy is the registered near-dup pipeline
    (banded candidates, hash-only verify); this adds two broadcast
    joins of the tiny pair list against a 2-column doc projection and
    a 20x20-bounded aggregation.
    """
    t = load_tables(spark, sf_dir)
    pairs = minhash_near_duplicates(
        t["documents"], "text", "doc_id",
        n=SHINGLE_N, num_hashes=NUM_HASHES,
        rows_per_band=ROWS_PER_BAND, threshold=JACCARD_THRESHOLD,
    ).select("doc_a", "doc_b")
    src = t["documents"].select("doc_id", "source")
    return (
        pairs.join(
            src.select(
                F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")
            ),
            "doc_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")
            ),
            "doc_b",
        )
        .groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "session_conversion_stats",
    oracle="""
    WITH ev AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events WHERE user_id IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, event_type,
               SUM(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS sid
        FROM ev
    ),
    per AS (
        SELECT user_id, sid, COUNT(*) AS n_events,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS has_purchase
        FROM sess GROUP BY user_id, sid
    )
    SELECT COUNT(*) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(has_purchase) AS BIGINT) AS purchase_sessions,
           CAST(FLOOR(SUM(has_purchase) * 10000 / COUNT(*)) AS BIGINT)
               AS purchase_share_bp
    FROM per
    """,
)
def q_session_conversion_stats(spark, sf_dir):
    """Gap-sessionization conversion roll-up: sessions = runs of a
    user's events with < 30 min between neighbors (the lag-flag +
    running-sum islands form, the batch twin of the streaming
    session_windows query), scored by the share that contain a
    purchase — the per-session conversion KPI the reference's funnel
    tab approximates per-user.

    Scale shape: both windows are PARTITIONED BY user_id (one key
    shuffle, reused by the session aggregation); the final roll-up is
    a 1-row scalar agg in exact integers (share in basis points via
    integral division).
    """
    t = load_tables(spark, sf_dir)
    w_desc = "(PARTITION BY user_id ORDER BY ts, event_id)"
    ev = (
        t["events"]
        .filter(F.col("user_id").isNotNull())
        .withColumn("prev_ts", F.expr(f"LAG(ts) OVER {w_desc}"))
        .withColumn(
            "new_s",
            F.when(
                F.col("prev_ts").isNull()
                | F.expr("ts > prev_ts + INTERVAL 30 MINUTE"),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "sid",
            F.expr(
                "SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id"
                " ROWS UNBOUNDED PRECEDING)"
            ),
        )
    )
    per = ev.groupBy("user_id", "sid").agg(
        F.count("*").alias("n_events"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("has_purchase"),
    )
    return (
        per.agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("has_purchase").cast("bigint").alias("purchase_sessions"),
        )
        .withColumn(
            "purchase_share_bp",
            F.expr("CAST(purchase_sessions * 10000 DIV n_sessions AS BIGINT)"),
        )
    )


@query(
    "doc_shard_balance",
    oracle="""
    WITH s AS (
        SELECT instr('0123456789abcdef',
                     substr(md5('shard:' || CAST(doc_id AS STRING)), 1, 1))
               - 1 AS shard,
               n_chars
        FROM documents
    ),
    tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS tc FROM s)
    SELECT CAST(shard AS BIGINT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS shard_chars,
           CAST(FLOOR(CAST(SUM(n_chars) AS BIGINT) * 10000 / (SELECT tc FROM tot))
                AS BIGINT) AS chars_share_bp
    FROM s GROUP BY shard
    """,
)
def q_doc_shard_balance(spark, sf_dir):
    """Training-shard balance audit: assign every document to one of
    16 output shards by a salted md5 hex digit (the writer-side
    assignment a packed-shard export uses) and report per-shard doc
    count, byte weight, and share in basis points — uniform shares
    (~625 bp each) mean no shard becomes the straggler when 1000
    executors each write their slice.

    Scale shape: the shard key is one map-side md5; the audit is one
    16-group partial-agg plus a broadcast of the 1-row total. The
    same expression (`operators.sketches`-style hex-digit arithmetic)
    is reproducible in any engine, so shard membership is portable.
    """
    t = load_tables(spark, sf_dir)
    s = ensure_parallelism(t["documents"]).select(
        (
            F.expr(
                "instr('0123456789abcdef',"
                " substr(md5(concat('shard:', CAST(doc_id AS STRING))), 1, 1))"
            )
            - 1
        )
        .cast("bigint")
        .alias("shard"),
        "n_chars",
    )
    tot = s.agg(F.sum("n_chars").cast("bigint").alias("tc"))
    return (
        s.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("shard_chars"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "shard",
            "n_docs",
            "shard_chars",
            F.expr("CAST(shard_chars * 10000 DIV tc AS BIGINT)").alias(
                "chars_share_bp"
            ),
        )
    )


@query(
    "order_completion_mix",
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey, COUNT(*) AS n_lines,
               SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS n_f
        FROM lineitem GROUP BY l_orderkey
    ),
    cls AS (
        SELECT o.o_orderstatus,
               CASE WHEN p.n_f = p.n_lines THEN 'complete'
                    WHEN p.n_f = 0 THEN 'none'
                    ELSE 'partial' END AS fill_class,
               o.o_totalprice
        FROM per_order p JOIN orders o ON o.o_orderkey = p.l_orderkey
    )
    SELECT o_orderstatus, fill_class,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM cls GROUP BY o_orderstatus, fill_class
    """,
)
def q_order_completion_mix(spark, sf_dir):
    """Fulfilment-shape mix: each order classified by its line-status
    composition (all lines finalized / none / mixed), cross-tabbed
    with the order-header status and revenue-weighted — the
    operational report that catches header/line status drift
    (complements orders_quality_checks' rule audit and
    pit_status_at_ship's point-in-time view).

    Scale shape: one keyed partial-agg over lineitem, one equi-join
    on the order key (co-partitioned fact-fact join), one 9-group
    roll-up in exact integer cents.
    """
    t = load_tables(spark, sf_dir)
    per_order = (
        ensure_parallelism(t["lineitem"])
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(
                F.when(F.col("l_linestatus") == "F", 1).otherwise(0)
            ).alias("n_f"),
        )
    )
    cls = per_order.join(
        t["orders"].select("o_orderkey", "o_orderstatus", "o_totalprice"),
        per_order["l_orderkey"] == F.col("o_orderkey"),
    ).select(
        "o_orderstatus",
        F.when(F.col("n_f") == F.col("n_lines"), "complete")
        .when(F.col("n_f") == 0, "none")
        .otherwise("partial")
        .alias("fill_class"),
        "o_totalprice",
    )
    return cls.groupBy("o_orderstatus", "fill_class").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("revenue_cents"),
    )


@query(
    "customer_reorder_affinity",
    oracle="""
    WITH seq AS (
        SELECT o_custkey, o_orderkey,
               LAG(o_orderkey) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS prev_key
        FROM orders
    ),
    pairs AS (
        SELECT o_custkey, prev_key, o_orderkey AS curr_key
        FROM seq WHERE prev_key IS NOT NULL
    ),
    op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    rep AS (
        SELECT p.o_custkey, p.curr_key,
               MAX(CASE WHEN b.l_partkey IS NOT NULL THEN 1 ELSE 0 END)
                   AS has_repeat
        FROM pairs p
        LEFT JOIN op a ON a.l_orderkey = p.prev_key
        LEFT JOIN op b ON b.l_orderkey = p.curr_key
                      AND b.l_partkey = a.l_partkey
        GROUP BY p.o_custkey, p.curr_key
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS n_order_pairs,
           CAST(SUM(r.has_repeat) AS BIGINT) AS n_repeat_pairs,
           CAST(FLOOR(SUM(r.has_repeat) * 10000 / COUNT(*)) AS BIGINT)
               AS repeat_share_bp
    FROM rep r JOIN customer c ON c.c_custkey = r.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_customer_reorder_affinity(spark, sf_dir):
    """Repeat-purchase affinity: for every customer's consecutive
    order pair (by order date), did the later order repeat ANY part
    from the earlier one — the re-order rate per market segment that
    separates replenishment segments from one-off buyers (feeds the
    same recommendation surface as part_recommendations).

    Scale shape: the consecutive-pair window is PARTITIONED BY
    customer; the part-overlap check never builds the quadratic
    orders-sharing-a-part join — baskets collect once at order grain
    (arrays bounded by lines-per-order), each pair picks up its two
    baskets via order-key equi-joins, and the overlap test is a
    map-side ``arrays_overlap``. Measured 2.4x faster than the
    exploded (pair, part) equi-join form at sf0.1 AND shuffles
    strictly fewer rows (order-grain arrays, no per-part fan-out, no
    second aggregation).
    """
    t = load_tables(spark, sf_dir)
    seq = t["orders"].select(
        "o_custkey",
        "o_orderkey",
        F.expr(
            "LAG(o_orderkey) OVER (PARTITION BY o_custkey"
            " ORDER BY o_orderdate, o_orderkey)"
        ).alias("prev_key"),
    )
    pairs = seq.filter(F.col("prev_key").isNotNull()).select(
        "o_custkey", "prev_key", F.col("o_orderkey").alias("curr_key")
    )
    baskets = (
        ensure_parallelism(t["lineitem"])
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
    )
    bp = baskets.select(
        F.col("l_orderkey").alias("prev_key"),
        F.col("parts").alias("prev_parts"),
    )
    bc = baskets.select(
        F.col("l_orderkey").alias("curr_key"),
        F.col("parts").alias("curr_parts"),
    )
    # orders with no line items join to null arrays; arrays_overlap
    # yields NULL there, folded to no-repeat by otherwise(0) —
    # identical to the oracle's LEFT-JOIN null semantics
    rep = (
        pairs.join(bp, "prev_key", "left")
        .join(bc, "curr_key", "left")
        .select(
            "o_custkey",
            F.when(F.arrays_overlap("prev_parts", "curr_parts"), 1)
            .otherwise(0)
            .alias("has_repeat"),
        )
    )
    return (
        rep.join(
            F.broadcast(t["customer"].select("c_custkey", "c_mktsegment")),
            rep["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_order_pairs"),
            F.sum("has_repeat").cast("bigint").alias("n_repeat_pairs"),
        )
        .withColumn(
            "repeat_share_bp",
            F.expr("CAST(n_repeat_pairs * 10000 DIV n_order_pairs AS BIGINT)"),
        )
    )
