"""Constant-bound oracle guards (ADVICE-r9).

Seven corpus oracles replace a computed-bound series with a constant-
bound ``range(a, b) t(i)`` (the two-engine portability lever —
neither engine allows subqueries inside TVF arguments):

* ``video_frame_grid``            — ``range(0, 64)``   frames
* ``doc_repetition_ratio``        — ``range(1, 512)``  word bigrams
* ``doc_contamination_overlap``   — ``range(1, 512)``  word 5-grams
* ``doc_char_ngram_entropy_curve``— ``range(1, 1024)`` char n-grams
* ``doc_compressibility_proxy``   — ``range(1, 1024)`` char 4-grams
* ``doc_sentence_dedup_rate``     — ``range(1, 32)``   sentences
* ``doc_boilerplate_sentences``   — ``range(1, 32)``   sentences

The Spark side uses TRUE length-derived sequences, so if the document
generator's ~600-char cap ever grows past a bound, the ORACLE silently
truncates and parity breaks with no assertion at the source. These
tests fail LOUDLY first: they measure the actual per-document maxima
at every generated SF and assert each stays under 80% of its bound —
and they pin the ``range(...)`` literal inside the registered oracle
text, so editing a bound in the SQL without updating the guard (or
vice versa) also fails.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

from event_driven_data_pipeline_for_e_commerce_spark.plans import corpus

# Mirrors of the constant bounds embedded in the oracle SQL. The
# *_pins_oracle_literal tests keep these in lockstep with the text.
FRAME_BOUND = 64  # video_frame_grid: range(0, 64), i = frame index
WORD_SERIES_BOUND = 512  # repetition/contamination: range(1, 512)
CHAR_SERIES_BOUND = 1024  # entropy curve / compressibility: range(1, 1024)
SENT_SERIES_BOUND = 32  # sentence dedup/boilerplate: range(1, 32)
HEADROOM = 0.8  # fail when the observed max passes 80% of a bound

_SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))


def _doc_maxima(sf_dir: str) -> dict[str, int]:
    con = duckdb.connect()
    path = os.path.join(sf_dir, "documents.parquet")
    row = con.execute(
        f"""
        SELECT MAX(n_chars) AS max_n_chars,
               MAX(length(text) - length(replace(text, ' ', '')) + 1)
                   AS max_n_toks,
               MAX(length(lower(trim(text)))) AS max_len,
               MAX((length(text) - length(replace(text, '. ', ''))) / 2 + 1)
                   AS max_n_sents
        FROM read_parquet('{path}')
        """
    ).fetchone()
    con.close()
    return {
        "max_n_chars": row[0],
        "max_n_toks": row[1],
        "max_len": row[2],
        "max_n_sents": int(row[3]),
    }


@pytest.fixture(scope="module", params=_SF_DIRS)
def maxima(request):
    return _doc_maxima(request.param)


def test_video_frame_grid_bound_headroom(maxima):
    # oracle emits i while i*1000 <= n_chars*10 → max needed index is
    # floor(n_chars / 100); range(0, 64) covers i = 0..63.
    need = maxima["max_n_chars"] // 100
    assert need <= HEADROOM * (FRAME_BOUND - 1), (
        f"video_frame_grid oracle needs frame index {need} but "
        f"range(0, {FRAME_BOUND}) caps at {FRAME_BOUND - 1}; raise the "
        "bound in plans/llm_queries.py AND this guard together"
    )


def test_word_series_bound_headroom(maxima):
    # repetition needs i up to n_toks-1, contamination up to n_toks-4;
    # range(1, 512) covers i = 1..511. Guard the larger requirement.
    need = maxima["max_n_toks"] - 1
    assert need <= HEADROOM * (WORD_SERIES_BOUND - 1), (
        f"doc_repetition_ratio/doc_contamination_overlap oracles need "
        f"series index {need} but range(1, {WORD_SERIES_BOUND}) caps at "
        f"{WORD_SERIES_BOUND - 1}; raise the bound AND this guard"
    )


def test_char_series_bound_headroom(maxima):
    # entropy curve needs i up to len(text) (n=1 grams),
    # compressibility up to len-3; range(1, 1024) covers 1..1023.
    need = maxima["max_len"]
    assert need <= HEADROOM * (CHAR_SERIES_BOUND - 1), (
        f"doc_char_ngram_entropy_curve/doc_compressibility_proxy "
        f"oracles need series index {need} but range(1, "
        f"{CHAR_SERIES_BOUND}) caps at {CHAR_SERIES_BOUND - 1}; raise "
        "the bound AND this guard"
    )


def test_sentence_series_bound_headroom(maxima):
    # sentence dedup/boilerplate need i up to the per-doc sentence
    # count; range(1, 32) covers i = 1..31.
    need = maxima["max_n_sents"]
    assert need <= HEADROOM * (SENT_SERIES_BOUND - 1), (
        f"doc_sentence_dedup_rate/doc_boilerplate_sentences oracles "
        f"need series index {need} but range(1, {SENT_SERIES_BOUND}) "
        f"caps at {SENT_SERIES_BOUND - 1}; raise the bound AND this "
        "guard"
    )


def test_guard_pins_oracle_literals():
    """Editing a bound in the oracle SQL without updating this guard
    (or vice versa) must fail here, not silently drift."""
    o = corpus.ORACLES
    assert f"range(0, {FRAME_BOUND})" in o["video_frame_grid"]
    assert f"range(1, {WORD_SERIES_BOUND})" in o["doc_repetition_ratio"]
    assert f"range(1, {WORD_SERIES_BOUND})" in o["doc_contamination_overlap"]
    assert f"range(1, {CHAR_SERIES_BOUND})" in o["doc_char_ngram_entropy_curve"]
    assert f"range(1, {CHAR_SERIES_BOUND})" in o["doc_compressibility_proxy"]
    assert f"range(1, {SENT_SERIES_BOUND})" in o["doc_sentence_dedup_rate"]
    assert f"range(1, {SENT_SERIES_BOUND})" in o["doc_boilerplate_sentences"]
