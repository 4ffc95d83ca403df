"""Large-scale training-data pipeline operators (SURVEY.md §7.2 M7;
BASELINE.json north star).

Everything here is built from native Catalyst expressions (arrays,
higher-order functions, md5) — no Python UDFs on the hot path — so the
same code scales from the 500-row test table to a 100 TB corpus:
shingling/minhashing are per-row projections (no shuffle), LSH
candidate generation is one equi-join on band keys, and verification
joins are bounded by candidate count, not corpus size.
"""

from .dedup import exact_dedup, minhash_signatures, ngram_shingles  # noqa: F401
from .similarity import brute_force_topk, lsh_bucket  # noqa: F401
from .text import (  # noqa: F401
    bpe_ish_token_count,
    document_fingerprints,
    language_guess,
    quality_features,
    tokens_col,
)
