"""Document deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the whole point of these ops):

- exact: one hash-groupBy on md5(text) — a single shuffle on the hash,
  map-side partial agg keeps it small.
- MinHash+LSH: signature computation is per-document (explode shingles
  → groupBy doc — one shuffle on doc_id); candidate generation is ONE
  equi-join on (band, band_key) instead of the O(n²) cross join; only
  candidates pay the exact-Jaccard verification join. This is the
  standard web-scale near-dedup shape (e.g. the C4/RefinedWeb recipe).
- SimHash: per-document bit aggregation (explode token×bit → groupBy),
  emitting a compact integer fingerprint; Hamming-radius search then
  works over fingerprints only.

Hash functions are md5-string based (lexicographic MIN over hex
strings as the permutation proxy) — deliberately: md5 is the one hash
both Spark and any ANSI oracle compute identically, making every one
of these operators hash-checkable against a SQL oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def ngram_shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id_col, shingle).

    Per-row projection + explode; no shuffle until the consumer
    aggregates. Documents with < n tokens produce no shingles.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    shingles = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array())
    return (
        df.select(F.col(id_col), F.explode(shingles).alias("shingle"))
        .dropDuplicates([id_col, "shingle"])
    )


def minhash_signatures(
    shingles: DataFrame, id_col: str, num_hashes: int = 9
) -> DataFrame:
    """MinHash signature per document: for hash i, MIN over shingles of
    md5(i ':' shingle) — the lexicographic min over hex strings stands
    in for a random permutation. Output: (id_col, hi, sig)."""
    h = shingles.select(
        id_col,
        "shingle",
        F.explode(F.sequence(F.lit(1), F.lit(num_hashes))).alias("hi"),
    ).withColumn(
        "hv", F.md5(F.concat(F.col("hi").cast("string"), F.lit(":"), F.col("shingle")))
    )
    return h.groupBy(id_col, "hi").agg(F.min("hv").alias("sig"))


def lsh_band_keys(signatures: DataFrame, id_col: str, rows_per_band: int = 3) -> DataFrame:
    """Band the signature: band key = md5 of the band's sigs joined in
    hash order. Output: (id_col, band, band_key)."""
    banded = signatures.withColumn(
        "band", F.ceil(F.col("hi") / F.lit(float(rows_per_band))).cast("int")
    )
    return banded.groupBy(id_col, "band").agg(
        F.md5(
            F.concat_ws(
                "|",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("hi", "sig"))),
                    lambda s: s["sig"],
                ),
            )
        ).alias("band_key")
    )


def lsh_candidate_pairs(band_keys: DataFrame, id_col: str) -> DataFrame:
    """Distinct candidate pairs sharing any band bucket — the one
    equi-join that replaces the O(n²) comparison."""
    a = band_keys.select(
        F.col(id_col).alias("doc_a"), F.col("band").alias("b1"), F.col("band_key").alias("k1")
    )
    b = band_keys.select(
        F.col(id_col).alias("doc_b"), F.col("band").alias("b2"), F.col("band_key").alias("k2")
    )
    return (
        a.join(b, (F.col("k1") == F.col("k2")) & (F.col("b1") == F.col("b2"))
               & (F.col("doc_a") < F.col("doc_b")))
        .select("doc_a", "doc_b")
        .dropDuplicates()
    )


def jaccard_verify(
    pairs: DataFrame, shingles: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs only. Output:
    (doc_a, doc_b, jaccard) for pairs ≥ threshold, rounded 4dp."""
    s1 = shingles.select(F.col(id_col).alias("doc_a"), F.col("shingle").alias("sh_a"))
    s2 = shingles.select(F.col(id_col).alias("__b"), F.col("shingle").alias("sh_b"))
    inter = (
        pairs.join(s1, "doc_a")
        .join(s2, (F.col("doc_b") == F.col("__b")) & (F.col("sh_a") == F.col("sh_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
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
    candidate join → exact-Jaccard verify."""
    sh = ngram_shingles(df, text_col, id_col, n)
    sig = minhash_signatures(sh, id_col, num_hashes)
    bands = lsh_band_keys(sig, id_col, rows_per_band)
    cands = lsh_candidate_pairs(bands, id_col)
    return jaccard_verify(cands, sh, id_col, threshold)


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
    of the per-bit sum sets the fingerprint bit. Uses only hex-digit
    string arithmetic (strpos/substr) so a SQL oracle matches exactly.
    Output: (id_col, simhash long).
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    tok = (
        df.select(F.col(id_col), F.explode(toks).alias("tok"))
        .dropDuplicates([id_col, "tok"])
        .withColumn("h", F.md5("tok"))
    )
    tb = tok.select(
        id_col, "h", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b")
    )
    digit = F.expr("instr('0123456789abcdef', substr(h, cast(b div 4 as int) + 1, 1)) - 1")
    bit_weight = F.expr("cast(pow(2, b % 4) as bigint)")
    bit_val = (digit / bit_weight).cast("bigint") % 2
    contrib = F.when(bit_val == 1, F.lit(1)).otherwise(F.lit(-1))
    per_bit = tb.withColumn("contrib", contrib).groupBy(id_col, "b").agg(
        F.sum("contrib").alias("s")
    )
    return per_bit.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("cast(pow(2, b) as bigint)")).otherwise(F.lit(0))
        ).alias("simhash")
    )
