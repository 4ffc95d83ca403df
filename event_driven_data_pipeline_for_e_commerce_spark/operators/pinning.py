"""Bounded registry for persisted ("pinned") DataFrames.

Several operators persist an intermediate frame because TWO jobs must
observe identical nondeterministic content — the counts job and the
key-assignment job in ``surrogate_keys`` (pinned partition contents),
the counts job and the window job in ``cumulative`` (pinned sampled
range boundaries), the candidate-generation and verify passes of the
MinHash/SimHash dedup family. Left unreleased, a long batch session
(the corpus driver runs 200+ queries in one SparkSession) accumulates
one cached frame per query invocation (ADVICE r4).

``pin`` caps the footprint with a FIFO: when a NEW pin arrives beyond
the cap, the oldest is unpersisted. That is safe in the batch pattern
— queries are constructed AND materialized one at a time, so by the
time a later query's pin evicts an earlier one, the earlier query's
result has been collected and its two-pass consistency can no longer
be broken. Callers holding a helper result across many subsequent
queries should materialize it first (or raise the cap).

``release_pinned`` drops everything tracked — the between-batches
hook for harnesses that want a clean cache.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_PINNED: list[DataFrame] = []
# Sized for the deepest composed query (near-dup consensus pins the
# minhash trio + simhash + CC edges in one construction) with 2×
# headroom; still O(1) per session vs the former one-pin-per-query.
_PIN_CAP = 12


def pin(df: DataFrame) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK — never recompute, spill over
    memory pressure) and track it; evict the oldest pin beyond the
    cap. Returns the persisted frame."""
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _PINNED.append(df)
    while len(_PINNED) > _PIN_CAP:
        _PINNED.pop(0).unpersist(False)
    return df


def release_pinned(blocking: bool = False) -> int:
    """Unpersist every tracked pinned frame (e.g. between driver
    batches) and return how many were released. Only call once the
    DataFrames returned by pin-using helpers have been materialized —
    their plans depend on the pinned cache for two-pass consistency."""
    n = len(_PINNED)
    while _PINNED:
        _PINNED.pop().unpersist(blocking)
    return n
