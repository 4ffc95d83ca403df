"""Document deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the whole point of these ops):

- exact: one hash-groupBy on md5(text) — a single shuffle on the hash,
  map-side partial agg keeps it small.
- MinHash+LSH: shingles are a map-side projection, signatures are one
  map-side-combined groupBy (num_hashes+1 longs per doc — the ONLY
  persisted frame), candidates come from the one (band, band_key)
  equi-join that replaces the O(n²) cross join, and exact-Jaccard
  verification re-joins ONLY candidate pairs against the shingle
  projection. Nothing corpus-sized is ever persisted or carried
  through a shuffle. This is the standard web-scale near-dedup shape
  (the C4/RefinedWeb recipe) with every per-document stage kept
  map-side.
- SimHash: distinct tokens explode map-side, each token's md5 hex
  digits project once, and one codegen groupBy with ``bits``
  conditional sums emits the fingerprint (shuffle carries ``bits``
  longs per doc, map-side combined); Hamming-radius search then runs
  at FINGERPRINT-VALUE grain (band self-join + bit_count verify over
  distinct fingerprints only), and doc pairs re-attach through the
  slim (fingerprint, id) membership frame — output-bound joins.

Hash functions are md5-string based (lexicographic MIN over hex
strings as the permutation proxy) — deliberately: md5 is the one hash
both Spark and any ANSI oracle compute identically, making every one
of these operators hash-checkable against a SQL oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from ..operators.partitioning import ensure_parallelism
from ..operators.pinning import pin


def shingle_array(text_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of ``text_col`` as one per-row
    array — pure projection, no shuffle. Documents with < n tokens get
    an empty array.

    Construction cost matters: higher-order lambdas run interpreted,
    so the body must be O(tokens), not O(tokens·n) with per-element
    ``slice`` re-scans. n=2 (the near-dup config) uses one zip_with of
    two offset slices; general n uses element_at probes (O(1) each)
    instead of slice."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    if n == 2:
        shingles = F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    else:
        shingles = F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        )
    guarded = F.when(F.size(toks) >= n, shingles).otherwise(
        F.array().cast("array<string>")
    )
    return F.array_distinct(guarded)


def ngram_shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id_col, shingle).

    ``array_distinct`` dedups within the row BEFORE the explode, so
    this is projection-only — no data shuffle beyond the parallelism
    bump on small scans. Documents with < n tokens produce no shingles.
    """
    src = ensure_parallelism(df.select(F.col(id_col), F.col(text_col)))
    return src.select(
        F.col(id_col), F.explode(shingle_array(text_col, n)).alias("shingle")
    )


# MinHash permutation family: h_i(x) = ((2i+1)·x + 1000003·i) mod P over
# a 31-bit base hash of the shingle. P Mersenne prime 2^31-1; any odd
# multiplier gives a universal-family member. All arithmetic stays
# well under 2^63.
MINHASH_P = 2_147_483_647


def _shingle_base(s: Column) -> Column:
    """31-bit integer hash of a shingle: first 8 hex chars of md5 as an
    int, mod P — md5 keeps Spark/oracle byte-parity; ONE digest per
    shingle total (the permutations are arithmetic on top)."""
    return F.conv(F.md5(s).substr(1, 8), 16, 10).cast("bigint") % MINHASH_P


def _perm(base: Column, i: int) -> Column:
    """Permutation i applied to a base hash — plain codegen arithmetic."""
    return (F.lit(2 * i + 1) * base + F.lit(1_000_003 * i)) % MINHASH_P


def shingle_hash_frame(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id_col, base) rows: the DISTINCT 31-bit shingle hashes of each
    document — the minhash pipeline's shingle identity.

    Hash-identity (standard in web-scale MinHash pipelines) keeps the
    verify joins on 8-byte ints instead of shingle strings, and the
    distinct-hash set is computed map-side inside the array (one
    interpreted pass doing the md5s; no shuffle). Within-doc hash
    collisions (~2^-31 per shingle pair) fold two shingles into one —
    both engines fold identically, so oracle parity is exact.
    """
    src = ensure_parallelism(df.select(F.col(id_col), F.col(text_col)))
    hash_arr = F.array_distinct(
        F.transform(shingle_array(text_col, n), lambda s: _shingle_base(s))
    )
    return src.select(F.col(id_col), F.explode(hash_arr).alias("base"))


def _minhash_agg_hashed(hashes: DataFrame, id_col: str, num_hashes: int) -> DataFrame:
    """(id, base) → one row per doc: distinct-shingle count + MIN per
    permutation. Input rows are already distinct per doc, so the single
    groupBy gets map-side partial MIN combine and the shuffle carries
    ≤ num_hashes+1 longs per doc."""
    return hashes.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_sh"),
        *[
            F.min(_perm(F.col("base"), i)).alias(f"s{i}")
            for i in range(1, num_hashes + 1)
        ],
    )


def _minhash_agg(shingles: DataFrame, id_col: str, num_hashes: int) -> DataFrame:
    """(id, shingle) → one row per doc with the shingle count and MIN
    per permutation. Exploded rows + plain column arithmetic keep the
    whole stage inside whole-stage codegen (interpreted higher-order
    lambdas are ~6x slower here), and the single groupBy gets map-side
    partial MIN combine — the shuffle carries ≤ num_hashes+1 longs per
    doc, never the shingle strings themselves (row width is bounded, so
    the frame stays persistable at any corpus size)."""
    base = _shingle_base(F.col("shingle"))
    return (
        shingles.withColumn("base", base)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            *[F.min(_perm(F.col("base"), i)).alias(f"s{i}") for i in range(1, num_hashes + 1)],
        )
    )


def minhash_signatures(
    shingles: DataFrame, id_col: str, num_hashes: int = 9
) -> DataFrame:
    """MinHash signature per document from a (id_col, shingle) frame.
    Output: (id_col, hi, sig)."""
    agg = _minhash_agg(shingles, id_col, num_hashes)
    return agg.select(
        id_col,
        F.posexplode(
            F.array(*[F.col(f"s{i}") for i in range(1, num_hashes + 1)])
        ).alias("pos", "sig"),
    ).select(id_col, (F.col("pos") + 1).alias("hi"), "sig")


def lsh_candidate_pairs(
    band_keys: DataFrame, id_col: str, max_bucket: int = 1000
) -> DataFrame:
    """Distinct candidate pairs sharing any band bucket. Input:
    (id_col, band, band_key). REQUIRES high-entropy band keys (MinHash
    signatures, hyperplane sketches) — for low-cardinality keys (e.g.
    a 5-bit SimHash band, where every bucket holds a corpus fraction)
    use :func:`lsh_candidate_pairs_join`, which distributes the
    quadratic unfold across tasks instead of one row's array.

    Pair generation is bucket-collect, not self-join: one groupBy on
    (band, band_key) gathers each bucket's ids, and the within-bucket
    pairs unfold map-side (ids distinct-sorted, so doc_a < doc_b by
    construction and duplicate (id, band, band_key) input rows cannot
    emit (a, a) self-pairs). That's one exchange instead of a
    self-join's two, and bucket sizes are small by LSH design — a
    bucket is only large when its members really are near-identical.

    ``max_bucket`` bounds the degenerate case (mass-duplicated
    boilerplate collapsing into one giant bucket — common in web
    crawls): buckets keep only their ``max_bucket`` smallest ids, so a
    single task never unfolds more than max_bucket²/2 pairs. True
    duplicate classes above the cap should be collapsed by the
    :func:`exact_dedup` pre-pass before LSH; use
    :func:`lsh_bucket_overflow` to audit how many buckets (if any)
    were truncated. Pass ``max_bucket=None`` to disable."""
    ids = F.array_distinct(F.sort_array(F.collect_list(id_col)))
    if max_bucket is not None:
        ids = F.slice(ids, 1, max_bucket)
    buckets = (
        band_keys.groupBy("band", "band_key")
        .agg(ids.alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pair_expr = (
        "flatten(transform(ids, (a, i) -> "
        "transform(slice(ids, i + 2, size(ids)), "
        "b -> struct(a AS doc_a, b AS doc_b))))"
    )
    return (
        buckets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .dropDuplicates()
    )


def lsh_candidate_pairs_join(band_keys: DataFrame, id_col: str) -> DataFrame:
    """Distinct candidate pairs sharing any band bucket, generated by
    a shuffle equi-self-join on (band, band_key) — the right shape when
    band keys have LOW entropy (e.g. SimHash pigeonhole bands: a 16-bit
    fingerprint over 3 bands gives 5-6-bit keys, so every bucket holds
    ~1/32 of the corpus). The pair count is the same as the
    bucket-collect path, but the quadratic unfold is distributed across
    the join's tasks instead of materializing a corpus-fraction id
    array in a single row. doc_a < doc_b structurally excludes
    self-pairs even under duplicate input rows."""
    a = band_keys.select(
        "band", "band_key", F.col(id_col).alias("doc_a")
    ).dropDuplicates()
    b = band_keys.select(
        "band", "band_key", F.col(id_col).alias("doc_b")
    ).dropDuplicates()
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates()
    )


def lsh_bucket_overflow(
    band_keys: DataFrame, id_col: str, max_bucket: int = 1000
) -> DataFrame:
    """Audit frame for the ``max_bucket`` cap in
    :func:`lsh_candidate_pairs`: one row per truncated bucket with its
    true size. Empty result == no candidate pair was dropped. Run (or
    sink) alongside the dedup job when the corpus may contain
    mass-duplicated boilerplate."""
    return (
        band_keys.groupBy("band", "band_key")
        .agg(F.count_distinct(F.col(id_col)).alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket)
    )


def minhash_band_keys(
    sigs: DataFrame, id_col: str, num_hashes: int, rows_per_band: int
) -> DataFrame:
    """(id, band, band_key) rows from a signature frame (columns
    ``s1..s{num_hashes}`` as produced by the MinHash aggregation).
    Band j covers hash indices (j-1)*r+1 .. j*r; the key is the band's
    sig values joined '|' in hash order (uniform width — no re-hash
    needed for the join key)."""
    num_bands = (num_hashes + rows_per_band - 1) // rows_per_band
    band_structs = F.array(*[
        F.struct(
            F.lit(j).alias("band"),
            F.concat_ws(
                "|",
                *[
                    F.col(f"s{i}").cast("string")
                    for i in range(
                        (j - 1) * rows_per_band + 1,
                        min(j * rows_per_band, num_hashes) + 1,
                    )
                ],
            ).alias("band_key"),
        )
        for j in range(1, num_bands + 1)
    ])
    return sigs.select(id_col, F.explode(band_structs).alias("bk")).select(
        id_col, "bk.band", "bk.band_key"
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 9,
    rows_per_band: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle → sign → band →
    candidate join → exact-Jaccard verify on candidates only.

    Scale contract (what survives a 100 TB corpus):

    - The only persisted frames are the signature table —
      ``num_hashes+1`` longs per document, never shingle text — and the
      candidate-bounded shingle-hash slice. Everything corpus-sized
      (the (doc, shingle-hash) relation) is a recomputable map-side
      projection off the parquet scan, never materialized whole.
    - Exact Jaccard is computed for CANDIDATE PAIRS only, over 31-bit
      shingle HASHES (never strings): the candidate list (small —
      LSH's entire purpose) re-joins the hash projection per side, so
      the verify shuffle carries 8-byte ints for candidate documents
      only (AQE broadcasts the candidate frame, making the first
      attach map-side). Jaccard over the distinct-hash sets equals
      string Jaccard except on ~2^-31 within-doc collisions, which
      both engines fold identically.

    Recall s-curve (probability a pair at true Jaccard s becomes a
    candidate) = 1-(1-s^r)^b with r=``rows_per_band``, b=#bands. At the
    default 12 hashes / 4 bands of 3: s=0.2 → 3%, s=0.5 → 41%,
    s=0.8 → 94%, s=0.9 → 99.6%. The ``threshold`` filter is exact but
    applies only to surfaced candidates — pairs near the low threshold
    are sampled, not exhaustively enumerated (raise b or lower r for
    more recall at the cost of more candidates to verify).
    """
    shingle_hashes = shingle_hash_frame(df, text_col, id_col, n)
    sigs = pin(_minhash_agg_hashed(shingle_hashes, id_col, num_hashes))
    bands = minhash_band_keys(sigs, id_col, num_hashes, rows_per_band)
    # cands feeds both the candidate-doc filter and the verify join;
    # persisting it avoids re-running the LSH self-join (it is small —
    # that's LSH's entire point)
    cands = pin(lsh_candidate_pairs(bands, id_col))
    # candidate-only verify: restrict the (recomputable, never-persisted
    # corpus-sized) per-doc hash ARRAY projection to documents appearing
    # in some candidate pair (AQE broadcasts the small doc-id list, so
    # the corpus side never shuffles), persist that candidate-bounded
    # slice, and compute exact Jaccard map-side with array_intersect —
    # no per-hash explode, no groupBy, no size joins.
    cand_docs = (
        cands.select(F.explode(F.array("doc_a", "doc_b")).alias(id_col)).distinct()
    )
    src = ensure_parallelism(df.select(F.col(id_col), F.col(text_col)))
    hash_arr = F.array_distinct(
        F.transform(shingle_array(text_col, n), lambda s: _shingle_base(s))
    )
    arr = src.select(F.col(id_col), hash_arr.alias("sh_arr"))
    cand_arr = pin(arr.join(cand_docs, id_col, "left_semi"))
    a = cand_arr.select(F.col(id_col).alias("doc_a"), F.col("sh_arr").alias("arr_a"))
    b = cand_arr.select(F.col(id_col).alias("doc_b"), F.col("sh_arr").alias("arr_b"))
    n_common = F.size(F.array_intersect(F.col("arr_a"), F.col("arr_b")))
    jac = F.col("n_common") / (
        F.size("arr_a") + F.size("arr_b") - F.col("n_common")
    )
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("n_common", n_common)
        .withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def winnow_fingerprint_frame(
    df: DataFrame, text_col: str, id_col: str, k: int = 8, w: int = 4
) -> DataFrame:
    """(id, fp) rows: winnowed document fingerprints — the MOSS
    selection scheme (Schleimer/Wilkerson/Aiken, SIGMOD'03). Text is
    normalized to its [a-z0-9] skeleton, every char ``k``-gram gets a
    31-bit md5 hash, and each window of ``w`` consecutive hashes
    contributes its MINIMUM — guaranteeing any shared substring of
    length >= k + w - 1 shares at least one selected fingerprint while
    storing only ~2/(w+1) of all k-gram hashes.

    Wholly map-side: normalization, the per-position hash array, the
    window minima, and the distinct-set all evaluate inside one
    projection; the only rows that leave the task are the selected
    (id, fp) pairs. Docs shorter than k + w - 1 normalized chars yield
    no fingerprints (no guaranteed-match window exists). Hash identity
    is the same 31-bit md5 scheme as the shingle pipeline, so the SQL
    oracle reproduces every value bit-for-bit."""
    src = ensure_parallelism(df.select(F.col(id_col), F.col(text_col)))
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    with_norm = src.select(id_col, norm.alias("__nm")).filter(
        F.length("__nm") >= k + w - 1
    )
    hashes = F.transform(
        F.sequence(F.lit(1), F.length("__nm") - (k - 1)),
        lambda i: _shingle_base(F.col("__nm").substr(i, F.lit(k))),
    )
    mins = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("__h") - (w - 1)),
            lambda j: F.array_min(F.slice(F.col("__h"), j, w)),
        )
    )
    return (
        with_norm.select(id_col, hashes.alias("__h"))
        .select(id_col, F.explode(mins).alias("fp"))
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup by content hash: one survivor (min id) per distinct
    text. Output: (text_hash, keeper_doc_id, copies)."""
    return df.groupBy(F.md5(F.col(text_col)).alias("text_hash")).agg(
        F.min(id_col).alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("copies"),
    )


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 16) -> DataFrame:
    """SimHash fingerprint over distinct tokens.

    Bit b of md5(token)'s leading hex digits contributes ±1; the sign
    of the per-bit sum sets the fingerprint bit. Output: (id_col,
    simhash long).

    Shape: explode distinct tokens → project the 8 hex digits of each
    token's md5 ONCE → ``bits`` conditional-sum aggregates per
    document. Everything stays in whole-stage codegen (a nested
    transform/aggregate higher-order formulation runs interpreted and
    re-scans the token array per bit — measured ~O(bits) slower), and
    the groupBy gets map-side partial combine: the shuffle carries
    ``bits`` longs per document per map task, never token rows."""
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    src = ensure_parallelism(df.select(F.col(id_col), F.col(text_col)))
    n_digits = (bits + 3) // 4
    # digest aliased before the per-digit projections reference it —
    # inlining re-evaluates the md5 once per digit column (no CSE
    # across projection fields; the cms_cells lesson)
    tok = (
        src.select(F.col(id_col), F.explode(toks).alias("tok"))
        .select(F.col(id_col), F.md5(F.col("tok")).alias("__h"))
        .select(
            F.col(id_col),
            *[
                F.conv(F.col("__h").substr(d + 1, 1), 16, 10)
                .cast("int")
                .alias(f"d{d}")
                for d in range(n_digits)
            ],
        )
    )
    contribs = [
        F.sum(
            F.when(
                F.shiftright(F.col(f"d{b // 4}"), b % 4) % 2 == 1, F.lit(1)
            ).otherwise(F.lit(-1))
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    per_doc = tok.groupBy(id_col).agg(*contribs)
    fingerprint = None
    for b in range(bits):
        term = F.when(
            F.col(f"s{b}") > 0, F.lit(1 << b).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
        fingerprint = term if fingerprint is None else fingerprint + term
    return per_doc.select(F.col(id_col), fingerprint.alias("simhash"))


def duplicate_clusters(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph: every
    node gets ``cluster_id`` = the smallest id reachable through pair
    edges (singletons label themselves), plus ``is_canonical`` marking
    the cluster representative. This is the step a dedup pipeline runs
    AFTER pair generation — near-dup relations are not transitive-
    closed, so keep-one-per-pair under-deletes chains (a~b, b~c).

    Algorithm: min-label propagation with pointer jumping. Each round
    (1) every node takes the min of its own and its neighbors' labels
    — one equi-join on the edge list; (2) labels compress by one hop
    (label := label's label) — one self-join. Jumping makes
    convergence O(log diameter) rounds, the same contraction idea as
    the large-star/small-star map-reduce CC algorithm; each round is
    two shuffles on (node) and the edge frame is persisted once.
    Convergence is detected by the monotone label sum reaching a
    fixpoint (labels only ever decrease); ``localCheckpoint``
    truncates the growing lineage every round.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionAll(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
    )
    edges = pin(edges)
    labels = nodes.select(F.col(id_col).alias("node"), F.col(id_col).alias("label"))
    prev_sum = None
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = (
            labels.join(nbr_min, "node", "left")
            .select("node", F.least("label", "nbr_label").alias("label"))
        )
        # pointer jump: follow the label one hop (label's own label)
        hop = labels.select(
            F.col("node").alias("label"), F.col("label").alias("jump_label")
        )
        labels_new = (
            stepped.join(hop, "label", "left")
            .select("node", F.least("label", "jump_label").alias("label"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels_new.agg(F.sum("label")).collect()[0][0]
        labels = labels_new
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    edges.unpersist()
    return labels.select(
        F.col("node").alias(id_col),
        F.col("label").alias("cluster_id"),
        (F.col("label") == F.col("node")).alias("is_canonical"),
    )


def _fp_band_structs(bits: int, max_hamming: int, col: str = "simhash") -> Column:
    """Pigeonhole band array for a ``bits``-wide fingerprint column:
    ``max_hamming + 1`` equal-width bit-groups (last band absorbs the
    remainder). Any pair within the Hamming radius agrees exactly on
    at least one band.

    Band keys are extracted with an UNSIGNED shift + bitmask — safe for
    the full 64-bit fingerprint width (ADVICE r11): an arithmetic
    ``shiftright`` on a sign-bit-set fingerprint smears 1s into the
    high bits, and ``% 2**width`` at width 64 overflows the long
    literal and yields negative remainders — either would break
    band-key agreement (missed pairs). Current call sites are 16/32
    bits with non-negative fingerprints, where both forms agree
    bit-for-bit; the mask form is also correct at bits=64."""
    n_bands = max_hamming + 1
    base_width = bits // n_bands
    structs = []
    lo = 0
    for b in range(n_bands):
        width = base_width if b < n_bands - 1 else bits - lo
        mask = F.lit(-1 if width >= 64 else (1 << width) - 1).cast("long")
        structs.append(
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col(col), lo)
                .bitwiseAND(mask)
                .cast("long")
                .alias("band_key"),
            )
        )
        lo += width
    return F.array(*structs)


def simhash_fp_pairs(fp: DataFrame, bits: int, max_hamming: int) -> DataFrame:
    """Distinct FINGERPRINT-VALUE pairs (fa < fb, hamming) within the
    Hamming radius, from any frame carrying a ``simhash`` column.

    The whole radius search runs at fingerprint grain: the distinct
    fingerprint set is banded (pigeonhole: radius-``max_hamming``
    pairs agree on >= 1 of the ``max_hamming + 1`` bands), the band
    self-join emits value pairs, and ``bit_count(xor)`` verifies
    BEFORE the dedup so the distinct runs over surviving pairs only.
    On a mass-near-duplicated corpus this is the scale lever: every
    class of documents sharing one fingerprint collapses to a single
    row before the quadratic step (sf0.1 testdata: 5,000 docs hold
    2,949 distinct 32-bit fingerprints, and the doc-grain band join
    emitted 4.2M candidate rows vs ~15k verified fp-grain pairs)."""
    fpd = fp.select("simhash").distinct()
    bands = fpd.select(
        "simhash", F.explode(_fp_band_structs(bits, max_hamming)).alias("bk")
    ).select("simhash", "bk.band", "bk.band_key")
    a = bands.select("band", "band_key", F.col("simhash").alias("fa"))
    b = bands.select("band", "band_key", F.col("simhash").alias("fb"))
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("fa") < F.col("fb"))
        .withColumn("hamming", F.expr("bit_count(fa ^ fb)").cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("fa", "fb", "hamming")
        .dropDuplicates()
    )


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 16,
    max_hamming: int = 2,
) -> DataFrame:
    """SimHash near-duplicate pairs: documents whose fingerprints are
    within ``max_hamming`` bits. Candidates come from banding the
    fingerprint into ``max_hamming + 1`` bit-groups — by pigeonhole,
    any pair within the radius agrees exactly on at least one band, so
    the search is an equi-join on (band, band_value), never all-pairs.

    Output: (doc_a, doc_b, hamming), doc_a < doc_b. Hamming search
    over fingerprints is the cheap sibling of MinHash: no shingle
    state at all — one long per document — at the cost of coarser
    similarity resolution (16-32 bits here; production uses 64).

    The radius search runs at FINGERPRINT grain (r11 rewrite,
    guide §8 "decide with small rows"): documents sharing a
    fingerprint are interchangeable for the Hamming test, so the band
    self-join + bit_count verify touch only DISTINCT fingerprint
    values (:func:`simhash_fp_pairs`), and doc pairs re-attach
    afterwards through the slim (fingerprint, id) membership frame —
    two output-bound equi-joins for cross-fingerprint pairs plus one
    membership self-join for the hamming-0 pairs inside each
    fingerprint class. Exact equivalence with the former doc-grain
    band join: hamming(a,b) <= max_hamming implies a shared pigeonhole
    band, so BOTH forms output precisely the Hamming ball; each doc
    pair maps to exactly one fingerprint pair, so the expansion emits
    each pair once (verified value-equal at sf0.001/0.01/0.1 — 777,152
    pairs at sf0.1 where the doc-grain join carried 4.2M candidates).
    The output is still quadratic in true near-dup class sizes — run
    exact_dedup first to collapse identical texts when that shape is
    expected."""
    fp = pin(simhash(df, text_col, id_col, bits))
    fpp = simhash_fp_pairs(fp, bits, max_hamming)
    mem_a = fp.select(F.col("simhash").alias("fa"), F.col(id_col).alias("__da"))
    mem_b = fp.select(F.col("simhash").alias("fb"), F.col(id_col).alias("__db"))
    cross = (
        fpp.join(mem_a, "fa")
        .join(mem_b, "fb")
        .select(
            F.least("__da", "__db").alias("doc_a"),
            F.greatest("__da", "__db").alias("doc_b"),
            "hamming",
        )
    )
    same = (
        mem_a.join(mem_b, F.col("fa") == F.col("fb"))
        .filter(F.col("__da") < F.col("__db"))
        .select(
            F.col("__da").alias("doc_a"),
            F.col("__db").alias("doc_b"),
            F.lit(0).cast("long").alias("hamming"),
        )
    )
    return cross.unionByName(same)


def semdedup_prune(
    assigned: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    cluster_col: str = "cluster_id",
    threshold: float = 0.97,
    max_cluster: int | None = 1000,
    bucket_fn=None,
) -> DataFrame:
    """SemDeDup pruning (Abbas et al. 2023): within each cluster of
    ``assigned`` (one row per vector: id, vector, cluster id — e.g.
    the output of a k-means assignment), mark every vector that has a
    LOWER-id neighbor with cosine >= ``threshold`` as dropped
    (keep-lowest survivor rule). Returns the DROPPED rows as
    ``(cluster_col, id_col)``, distinct.

    Scale shape — the capped-bucket treatment
    :func:`lsh_candidate_pairs` uses, adapted to low-entropy keys
    (VERDICT r6): a cluster id is a corpus-fraction bucket (k buckets
    total), so an uncapped within-cluster self-join is O(N²/k) — an
    all-pairs scale-killer. ``max_cluster`` bounds it: clusters larger
    than the cap are sub-bucketed deterministically
    (``pmod(hash(id), ceil(n/max_cluster))``) and pairs unfold only
    within a (cluster, sub-bucket), so no task's quadratic exceeds
    ~max_cluster²/2. Sub-bucketing is exact when every cluster fits
    the cap (nsub=1 ⇒ the join key degenerates to the cluster id) and
    a documented recall trade above it (a near-dup pair split across
    sub-buckets goes unseen — audit with
    :func:`semdedup_cluster_overflow`, or raise k upstream so
    clusters shrink below the cap, the SemDeDup paper's own knob).
    Candidate pairs shuffle BARE ids; vectors re-attach from the slim
    per-vector frame after the unfold (the candidate-pair rule).
    Pass ``max_cluster=None`` to disable the cap (oracle/audit runs).

    ``bucket_fn(id_col_expr, nsub_expr) -> Column`` overrides the
    sub-bucket assignment (default ``pmod(hash(id), nsub)``). An
    oracle-portable caller with numeric ids passes
    ``lambda i, n: F.pmod(i, n)`` so a plain-SQL twin (``id % nsub``)
    reproduces the capped semantics bit-for-bit at every SF
    (ADVICE r7: the hash-based default cannot be mirrored in DuckDB,
    so oracle equality used to hold only while every cluster fit the
    cap).
    """
    from .similarity import dot

    slim = assigned.select(F.col(cluster_col), F.col(id_col))
    if max_cluster is not None:
        sizes = assigned.groupBy(cluster_col).agg(
            F.count(F.lit(1)).alias("__n")
        )
        nsub = F.greatest(
            F.lit(1).cast("long"), F.ceil(F.col("__n") / F.lit(max_cluster))
        )
        bucket = bucket_fn or (lambda i, n: F.pmod(F.hash(i), n))
        keyed = slim.join(F.broadcast(sizes), cluster_col).select(
            cluster_col,
            id_col,
            bucket(F.col(id_col), nsub).cast("int").alias("__sub"),
        )
    else:
        keyed = slim.withColumn("__sub", F.lit(0))
    x = keyed.select(
        cluster_col, "__sub", F.col(id_col).alias("id_lo")
    )
    y = keyed.select(
        cluster_col, "__sub", F.col(id_col).alias("id_hi")
    )
    cand = (
        x.join(y, [cluster_col, "__sub"])
        .filter(F.col("id_lo") < F.col("id_hi"))
        .select(cluster_col, "id_lo", "id_hi")
    )
    vecs = assigned.select(F.col(id_col), F.col(vec_col))
    with_vecs = cand.join(
        vecs.select(
            F.col(id_col).alias("id_lo"), F.col(vec_col).alias("__v_lo")
        ),
        "id_lo",
    ).join(
        vecs.select(
            F.col(id_col).alias("id_hi"), F.col(vec_col).alias("__v_hi")
        ),
        "id_hi",
    )
    cos = dot(F.col("__v_lo"), F.col("__v_hi")) / (
        F.sqrt(dot(F.col("__v_lo"), F.col("__v_lo")))
        * F.sqrt(dot(F.col("__v_hi"), F.col("__v_hi")))
    )
    return (
        with_vecs.withColumn("__cos", cos)
        .filter(F.col("__cos") >= F.lit(threshold))
        .select(F.col(cluster_col), F.col("id_hi").alias(id_col))
        .dropDuplicates()
    )


def semdedup_cluster_overflow(
    assigned: DataFrame,
    cluster_col: str = "cluster_id",
    max_cluster: int = 1000,
) -> DataFrame:
    """Audit frame for :func:`semdedup_prune`'s ``max_cluster`` cap:
    one row per oversized cluster with its true size and the number of
    sub-buckets its pairing was split into. Empty result == the prune
    was exact (no candidate pair crossed a sub-bucket boundary)."""
    return (
        assigned.groupBy(cluster_col)
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .filter(F.col("cluster_size") > max_cluster)
        .select(
            cluster_col,
            "cluster_size",
            F.ceil(F.col("cluster_size") / F.lit(max_cluster))
            .cast("long")
            .alias("n_subbuckets"),
        )
    )
