"""LLM-data operator behavior tests: multimodal mapInPandas plumbing,
LSH recall vs brute force, minhash pipeline sanity."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from event_driven_data_pipeline_for_e_commerce_spark.llmdata.multimodal import (
    MEDIA_SCHEMA,
    decode_image_features,
    sample_frames,
)
from event_driven_data_pipeline_for_e_commerce_spark.llmdata.similarity import (
    brute_force_topk,
    hyperplanes,
    lsh_topk,
)


def _media(spark):
    rows = [
        (1, "image", bytearray(b"\x89PNG fake payload"), 64, 64, None),
        (2, "image", bytearray(b"\xff\xd8 jpeg-ish"), 32, 32, None),
        (3, "video", bytearray(b"\x00\x00vid"), 640, 480, 3500),
        (4, "audio", None, None, None, 2000),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _encode_png(pixels, filters):
    """Minimal PNG encoder (test-side ground truth): applies the
    requested PNG filter per scanline, deflates, and frames the chunk
    stream — so the decoder under test must reconstruct through every
    filter type it claims to support."""
    import struct
    import zlib

    import numpy as np

    h, w, c = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    stride = w * c
    flat = pixels.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        row = flat[y]
        f = filters[y % len(filters)]
        if f == 0:
            enc = row
        elif f == 1:
            left = np.concatenate([np.zeros(c, np.int32), row[:-c]])
            enc = row - left
        elif f == 2:
            enc = row - prev
        elif f == 3:
            left = np.concatenate([np.zeros(c, np.int32), row[:-c]])
            enc = row - ((left + prev) >> 1)
        else:  # paeth
            enc = np.empty(stride, np.int32)
            for x in range(stride):
                a = int(row[x - c]) if x >= c else 0
                b = int(prev[x])
                cc = int(prev[x - c]) if x >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                enc[x] = row[x] - pred
        raw.append(f)
        raw.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = row

    def chunk(ctype, data):
        body = ctype + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    comp = zlib.compress(bytes(raw))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        # split IDAT to exercise concatenated-chunk handling
        + chunk(b"IDAT", comp[: len(comp) // 2])
        + chunk(b"IDAT", comp[len(comp) // 2 :])
        + chunk(b"IEND", b"")
    )


def test_png_decoder_roundtrip_all_filters():
    """decode_png must reconstruct exact pixels through every PNG
    filter type (None/Sub/Up/Average/Paeth) for RGB, RGBA, and
    greyscale, across concatenated IDAT chunks."""
    import numpy as np

    from event_driven_data_pipeline_for_e_commerce_spark.llmdata.multimodal import (
        decode_png,
    )

    rng = np.random.default_rng(42)
    for channels in (1, 2, 3, 4):
        px = rng.integers(0, 256, size=(11, 7, channels), dtype=np.uint8)
        buf = _encode_png(px, filters=[0, 1, 2, 3, 4])
        out = decode_png(buf)
        assert out.shape == px.shape, channels
        assert (out == px).all(), f"filter reconstruction broke c={channels}"


def test_multimodal_real_decode_png_payload(spark):
    """Production path (fake=False): a REAL PNG byte payload decodes to
    pixel statistics; undecodable payloads quarantine as n_bytes=-1
    instead of failing the Arrow batch (VERDICT r4 #5)."""
    import numpy as np

    px = np.full((4, 5, 3), 200, dtype=np.uint8)
    px[:, :, 1] = 100  # G channel differs: mean = (200+100+200)/3
    rows = [
        (1, "image", bytearray(_encode_png(px, filters=[0, 1, 2])), 5, 4, None),
        (2, "image", bytearray(b"\xff\xd8 not-a-png"), 32, 32, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in decode_image_features(media, fake=False).collect()}
    assert got[1]["n_bytes"] == 4 * 5 * 3
    assert got[1]["byte_mean"] == pytest.approx((200 + 100 + 200) / 3)
    assert got[1]["head_hash"] != ""
    assert got[2]["n_bytes"] == -1 and got[2]["head_hash"] == ""


def test_multimodal_fake_decode_schema_and_values(spark):
    out = decode_image_features(_media(spark), fake=True)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "media_type", "n_bytes", "byte_mean", "head_hash",
    ]
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["n_bytes"] == 17
    assert rows[4]["n_bytes"] == 0  # NULL payload handled
    # deterministic: rerun produces identical hashes
    again = {r["media_id"]: r["head_hash"] for r in decode_image_features(_media(spark), fake=True).collect()}
    assert again == {k: v["head_hash"] for k, v in rows.items()}


def test_frame_sampling_grid(spark):
    frames = sample_frames(_media(spark), every_ms=1000).collect()
    got = sorted((r["media_id"], r["frame_ms"]) for r in frames)
    assert got == [(3, 0), (3, 1000), (3, 2000), (3, 3000)]


def test_lsh_recall_vs_brute_force(spark, sf_dir):
    from event_driven_data_pipeline_for_e_commerce_spark.plans.tables import load_tables

    emb = load_tables(spark, sf_dir)["embeddings"]
    queries = emb.filter(F.col("vec_id") < 20)
    exact = brute_force_topk(emb, queries, k=5)
    approx = lsh_topk(emb, queries, hyperplanes(64, 4, 4), k=5, n_tables=4)
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    # multi-table LSH (4 tables × 4 planes) should recover a decent
    # share of true neighbors even on unclustered random vectors
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall > 0.2, f"LSH recall collapsed: {recall}"
    # and every approx neighbor must be a real vector with valid sim
    for r in approx.collect():
        assert -1.0 <= r["cos_sim"] <= 1.0


def test_lsh_bucket_cap_bounds_degenerate_corpus(spark):
    """A mass-duplicated corpus (10k copies of one boilerplate text →
    one giant LSH bucket) must complete with a BOUNDED per-task pair
    unfold: the max_bucket cap keeps the bucket to its K smallest ids,
    so the candidate count is K·(K-1)/2, not 10k²/2 ≈ 50M in one row."""
    from event_driven_data_pipeline_for_e_commerce_spark.llmdata.dedup import (
        lsh_bucket_overflow,
        lsh_candidate_pairs,
    )

    n, cap = 10_000, 100
    band_keys = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit(1).alias("band"),
        F.lit("boilerplate").alias("band_key"),
    )
    pairs = lsh_candidate_pairs(band_keys, "doc_id", max_bucket=cap)
    assert pairs.count() == cap * (cap - 1) // 2
    # kept ids are the cap smallest — deterministic truncation
    assert pairs.agg(F.max("doc_b")).collect()[0][0] == cap - 1
    # the audit frame reports exactly the truncated bucket and its size
    over = lsh_bucket_overflow(band_keys, "doc_id", max_bucket=cap).collect()
    assert [(r["band"], r["bucket_size"]) for r in over] == [(1, n)]


def test_lsh_candidate_pairs_dedups_input_rows(spark):
    """Duplicate (id, band, band_key) rows must not emit (a, a)
    self-pairs — the collected bucket is array_distinct'ed."""
    from event_driven_data_pipeline_for_e_commerce_spark.llmdata.dedup import (
        lsh_candidate_pairs,
        lsh_candidate_pairs_join,
    )

    rows = [(1, 0, "k"), (1, 0, "k"), (2, 0, "k"), (3, 0, "k")]
    band_keys = spark.createDataFrame(
        rows, "doc_id long, band int, band_key string"
    )
    want = {(1, 2), (1, 3), (2, 3)}
    got = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(band_keys, "doc_id").collect()
    }
    assert got == want
    # the self-join variant (low-entropy-band path) agrees exactly
    got_join = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs_join(band_keys, "doc_id").collect()
    }
    assert got_join == want


def test_duplicate_clusters_chain_transitivity(spark):
    """a~b and b~c (but never a~c directly) must land in ONE cluster —
    the property pairwise keep-one dedup gets wrong."""
    import pyspark.sql.functions as F
    from event_driven_data_pipeline_for_e_commerce_spark.llmdata.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (30, 11)], "doc_a long, doc_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 30, 99]], "doc_id long")
    out = {r["doc_id"]: (r["cluster_id"], r["is_canonical"])
           for r in duplicate_clusters(pairs, nodes).collect()}
    assert out == {
        1: (1, True), 2: (1, False), 3: (1, False),
        10: (10, True), 11: (10, False), 30: (10, False),
        99: (99, True),
    }


def test_minhash_pipeline_survives_mass_duplicated_corpus(spark):
    """End-to-end minhash near-dup on a corpus that is ONE text copied
    2000 times (the web-crawl boilerplate catastrophe): every document
    lands in the same bucket in every band, and without the bucket cap
    a single task would unfold ~2M pairs. With the cap the pipeline
    completes, emits only capped-bucket pairs, and every surfaced pair
    verifies at Jaccard 1.0."""
    import pyspark.sql.functions as F
    from event_driven_data_pipeline_for_e_commerce_spark.llmdata.dedup import (
        minhash_near_duplicates,
    )

    n, cap = 2000, 1000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text repeated on every mirror page").alias(
            "text"
        ),
    )
    pairs = minhash_near_duplicates(
        docs, "text", "doc_id", n=2, num_hashes=12, rows_per_band=3,
        threshold=0.4,
    )
    rows = pairs.collect()
    assert len(rows) == cap * (cap - 1) // 2  # capped, not n*(n-1)/2
    assert all(r["jaccard"] == 1.0 for r in rows[:100])


def test_cosine_seed_helpers_reject_degenerate_seeds(spark):
    """A zero-norm / NaN / null seed is rejected at COLLECTION time
    (ADVICE r6): the -inf clamp ranked it last on the Spark side, but
    an unguarded SQL oracle's ``ORDER BY csim DESC`` ranks NaN FIRST
    (both engines sort NaN above all doubles) — failing fast is the
    only behavior both sides can agree on."""
    import pyspark.sql.functions as F
    import pytest

    from event_driven_data_pipeline_for_e_commerce_spark.llmdata.similarity import (
        nearest_seed_cosine,
        top_seeds_cosine,
    )

    zero = [(0, [0.0, 0.0]), (1, [1.0, 0.0])]
    nan = [(0, [float("nan"), 1.0]), (1, [1.0, 0.0])]
    null = [(0, None), (1, [1.0, 0.0])]
    for bad, msg in ((zero, "zero norm"), (nan, "null/NaN"), (null, "null/NaN")):
        with pytest.raises(ValueError, match=msg):
            top_seeds_cosine(F.col("v"), bad, 2, id_field="list_id")
        with pytest.raises(ValueError, match=msg):
            nearest_seed_cosine(F.col("v"), bad)


def test_cosine_seed_ranking_clamps_degenerate_vector(spark):
    """The -inf clamp still guards the ROW side (a zero-norm data
    vector is not rejectable driver-side): every cosine is NaN, the
    clamp maps them all to -inf, and the id tie-break picks the
    LOWEST seed id deterministically — the same row an oracle's
    ``ORDER BY csim DESC, id`` picks when every csim is NaN."""
    import pyspark.sql.functions as F

    from event_driven_data_pipeline_for_e_commerce_spark.llmdata.similarity import (
        nearest_seed_cosine,
        top_seeds_cosine,
    )

    seeds = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(
        [(10, [3.0, 4.0]), (11, [0.0, 0.0])], "vec_id INT, v ARRAY<DOUBLE>"
    )
    rows = {
        r["vec_id"]: (r["b"], r["r"])
        for r in df.select(
            "vec_id",
            nearest_seed_cosine(F.col("v"), seeds).alias("b"),
            top_seeds_cosine(F.col("v"), seeds, 2, id_field="list_id").alias(
                "r"
            ),
        ).collect()
    }
    assert rows[10][0]["list_id"] == 2  # cos 0.8 beats 0.6
    assert [e["list_id"] for e in rows[10][1]] == [2, 1]
    # degenerate vector: all-NaN cosines clamp, lowest id wins the tie
    assert rows[11][0]["list_id"] == 1
    assert [e["list_id"] for e in rows[11][1]] == [1, 2]


def test_semdedup_prune_exact_under_cap_and_capped_above(spark):
    """Under the cap the capped plan must be EXACTLY the uncapped
    all-pairs-within-cluster semantics (nsub=1 ⇒ join key degenerates
    to the cluster id) — that's what lets the registered query keep
    the uncapped oracle."""
    import pyspark.sql.functions as F

    from event_driven_data_pipeline_for_e_commerce_spark.llmdata.dedup import (
        semdedup_prune,
    )

    # two clusters; 0/1/2 mutually near-identical in cluster A, 3 far
    rows = [
        (0, [1.0, 0.0, 0.0], 100),
        (1, [0.999, 0.001, 0.0], 100),
        (2, [0.998, 0.002, 0.0], 100),
        (3, [0.0, 1.0, 0.0], 100),
        (4, [0.0, 0.0, 1.0], 200),
        (5, [0.0, 0.001, 0.9999], 200),
    ]
    df = spark.createDataFrame(
        rows, "vec_id INT, v ARRAY<DOUBLE>, cluster_id INT"
    )
    capped = semdedup_prune(df, threshold=0.97, max_cluster=10)
    uncapped = semdedup_prune(df, threshold=0.97, max_cluster=None)
    got = sorted((r["cluster_id"], r["vec_id"]) for r in capped.collect())
    assert got == sorted(
        (r["cluster_id"], r["vec_id"]) for r in uncapped.collect()
    )
    # keep-lowest: 1 and 2 drop (0 survives); 5 drops (4 survives)
    assert got == [(100, 1), (100, 2), (200, 5)]


def test_semdedup_cap_bounds_degenerate_corpus(spark):
    """VERDICT r6: a mass-duplicated corpus (10k copies of one vector
    in ONE cluster) must complete under the cap with bounded
    per-task quadratics — uncapped this is a 50M-pair self-join.
    Asserts every (cluster, sub-bucket) pairing group stays ~cap-sized
    and the overflow audit reports the oversized cluster."""
    import pyspark.sql.functions as F

    from event_driven_data_pipeline_for_e_commerce_spark.llmdata.dedup import (
        semdedup_cluster_overflow,
        semdedup_prune,
    )

    n, cap = 10_000, 500
    df = spark.range(n).select(
        F.col("id").cast("int").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("v"),
        F.lit(0).alias("cluster_id"),
    )
    # completes: every copy except one-per-sub-bucket survivor drops
    dropped = semdedup_prune(df, threshold=0.97, max_cluster=cap)
    n_sub = -(-n // cap)  # 20 sub-buckets
    n_dropped = dropped.count()
    # each sub-bucket keeps exactly its lowest id: n - n_sub dropped
    assert n_dropped == n - n_sub
    # sub-bucket sizes stay near cap (hash-balanced, hard ceiling 2x)
    sizes = (
        df.select(
            F.pmod(F.hash("vec_id"), F.lit(n_sub)).alias("sub")
        )
        .groupBy("sub")
        .count()
        .agg(F.max("count").alias("mx"))
        .collect()[0]["mx"]
    )
    assert sizes <= 2 * cap
    audit = semdedup_cluster_overflow(df, max_cluster=cap).collect()
    assert len(audit) == 1
    assert audit[0]["cluster_size"] == n
    assert audit[0]["n_subbuckets"] == n_sub


def test_mmr_diversified_topk_greedy_optimality(spark, sf_dir):
    """MMR property check against an independent numpy re-derivation:
    rank-1 is the plain cosine argmax, picks are distinct per query,
    and every pick's MMR objective is within float tolerance of the
    numpy-greedy optimum at that step (exact id equality is not
    asserted because numpy's SIMD dot association differs from the
    engine's fold in the last ulp)."""
    import numpy as np

    from event_driven_data_pipeline_for_e_commerce_spark.plans.corpus import QUERIES

    rows = QUERIES["emb_mmr_diversified_topk"](spark, sf_dir).collect()
    assert len(rows) == 9
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], {})[r["rank"]] = (
            r["neighbor_id"], r["mmr_score"]
        )
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    unit = {k: v / np.linalg.norm(v) for k, v in emb.items()}
    lam, mu = 0.7, 0.3
    for qid in (0, 1, 2):
        picks = [got[qid][k][0] for k in (1, 2, 3)]
        assert len(set(picks)) == 3 and qid not in picks
        cands = [i for i in emb if i != qid]
        qsim = {i: float(unit[i] @ unit[qid]) for i in cands}
        # rank-1 == cosine argmax (ties broken by id in the engine)
        best1 = max(cands, key=lambda i: (qsim[i], -i))
        assert abs(qsim[picks[0]] - qsim[best1]) < 1e-9
        sel = [picks[0]]
        for step in (2, 3):
            def objective(i):
                pen = max(float(unit[i] @ unit[s]) for s in sel)
                return lam * qsim[i] - mu * pen
            remaining = [i for i in cands if i not in sel]
            np_best = max(objective(i) for i in remaining)
            assert objective(got[qid][step][0]) > np_best - 1e-9
            sel.append(got[qid][step][0])
