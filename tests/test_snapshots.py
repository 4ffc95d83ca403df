"""Versioned-snapshot / time-travel tests (operators/snapshots.py) —
the plain-Parquet stand-in for BigQuery's FOR SYSTEM_TIME AS OF."""

from __future__ import annotations

import time

import pyspark.sql.functions as F
import pytest

from event_driven_data_pipeline_for_e_commerce_spark.operators.snapshots import (
    expire_versions,
    list_versions,
    read_snapshot,
    rollback,
    write_snapshot,
)
from event_driven_data_pipeline_for_e_commerce_spark.plans.tables import load_tables


@pytest.fixture
def table(spark, sf_dir, tmp_path):
    tdir = str(tmp_path / "versioned_nation")
    nation = load_tables(spark, sf_dir)["nation"]
    v1 = write_snapshot(nation, tdir)
    t_after_v1 = time.time()
    time.sleep(0.05)
    v2 = write_snapshot(nation.filter(F.col("n_regionkey") == 0), tdir)
    time.sleep(0.05)
    v3 = write_snapshot(nation.limit(3), tdir)
    return tdir, nation, (v1, v2, v3), t_after_v1


def test_versions_commit_log_and_reads(spark, table):
    tdir, nation, (v1, v2, v3), _ = table
    log = list_versions(tdir)
    assert [e["version"] for e in log] == [v1, v2, v3] == [1, 2, 3]
    assert log[0]["n_rows"] == nation.count()
    # current == latest
    assert read_snapshot(spark, tdir).count() == 3
    # explicit version
    assert read_snapshot(spark, tdir, version=1).count() == nation.count()
    assert (
        read_snapshot(spark, tdir, version=2)
        .filter(F.col("n_regionkey") != 0)
        .count()
        == 0
    )


def test_as_of_time_travel(spark, table):
    tdir, nation, _, t_after_v1 = table
    assert (
        read_snapshot(spark, tdir, as_of=t_after_v1).count() == nation.count()
    )
    assert read_snapshot(spark, tdir, as_of=time.time()).count() == 3
    with pytest.raises(ValueError):
        read_snapshot(spark, tdir, as_of=t_after_v1 - 1e6)


def test_rollback_is_metadata_only_and_expire_respects_it(spark, table):
    tdir, nation, _, _ = table
    rollback(tdir, 1)
    assert read_snapshot(spark, tdir).count() == nation.count()
    # expire keeps the rolled-back current even though it's oldest
    expired = expire_versions(tdir, keep_last=1)
    assert 1 not in expired and 2 in expired
    assert read_snapshot(spark, tdir).count() == nation.count()
    assert read_snapshot(spark, tdir, version=3).count() == 3
    with pytest.raises(ValueError):
        read_snapshot(spark, tdir, version=2)


def test_unknown_version_raises(spark, table):
    tdir, *_ = table
    with pytest.raises(ValueError):
        read_snapshot(spark, tdir, version=99)


def test_concurrent_writers_claim_distinct_versions(spark, sf_dir, tmp_path):
    """Two simultaneous writers must never share a version directory
    or lose each other's manifest entry (ADVICE r4): the mkdir claim
    is atomic create-or-fail and the manifest read-modify-write is
    lock-serialized, so both commits land with distinct versions and
    'current' points at the max."""
    import threading

    tdir = str(tmp_path / "concurrent_nation")
    nation = load_tables(spark, sf_dir)["nation"]
    results, errors = [], []

    def writer(df):
        try:
            results.append(write_snapshot(df, tdir))
        except Exception as e:  # pragma: no cover - failure detail
            errors.append(e)

    threads = [
        threading.Thread(target=writer, args=(nation,)),
        threading.Thread(target=writer, args=(nation.limit(5),)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert sorted(results) == [1, 2]
    log = list_versions(tdir)
    assert [e["version"] for e in log] == [1, 2]  # neither entry lost
    counts = {e["version"]: e["n_rows"] for e in log}
    assert sorted(counts.values()) == sorted([nation.count(), 5])
    # current = max committed, and an orphan claim dir never leaks in
    assert read_snapshot(spark, tdir).count() in (nation.count(), 5)


def test_orphan_version_dir_is_skipped_not_reused(spark, sf_dir, tmp_path):
    """A crashed writer leaves a claimed-but-uncommitted vdir; the
    next writer must claim the NEXT number, not clobber the orphan."""
    import os

    tdir = str(tmp_path / "orphan_nation")
    nation = load_tables(spark, sf_dir)["nation"]
    assert write_snapshot(nation, tdir) == 1
    os.mkdir(os.path.join(tdir, "v00002"))  # simulated crashed claim
    assert write_snapshot(nation.limit(3), tdir) == 3
    assert read_snapshot(spark, tdir).count() == 3
    assert [e["version"] for e in list_versions(tdir)] == [1, 3]


def test_version_numbers_never_reused_after_rollback_and_expire(
    spark, sf_dir, tmp_path
):
    """Version allocation comes from the manifest's high-water mark:
    after rollback(2) + expire (which deletes expired versions' dirs
    and claims), the next write must take a NUMBER ABOVE EVERYTHING
    EVER COMMITTED — re-claiming an expired number would let stale
    higher-numbered snapshots shadow the fresh commit in as-of reads."""
    tdir = str(tmp_path / "hwm_nation")
    nation = load_tables(spark, sf_dir)["nation"]
    for i in range(4):
        write_snapshot(nation.limit(i + 1), tdir)
    rollback(tdir, 2)
    expire_versions(tdir, keep_last=1, orphan_grace=0)
    # survivors: v4 (newest) + v2 (current); v1, v3 reclaimed
    assert sorted(e["version"] for e in list_versions(tdir)) == [2, 4]
    v = write_snapshot(nation.limit(5), tdir)
    assert v == 5  # not 3: above the high-water mark
    assert read_snapshot(spark, tdir).count() == 5
    assert read_snapshot(spark, tdir, as_of=time.time()).count() == 5


def test_claim_marker_survives_data_overwrite(spark, sf_dir, tmp_path):
    """The version-number claim must outlive Spark's overwrite of the
    data dir (ADVICE r5): after a commit, the claim marker for that
    version still exists under _claims/, so no window existed in which
    a racing writer could have re-claimed the number."""
    import os

    tdir = str(tmp_path / "claim_nation")
    nation = load_tables(spark, sf_dir)["nation"]
    v = write_snapshot(nation, tdir)
    assert os.path.exists(os.path.join(tdir, "_claims", f"v{v:05d}"))


def test_expire_reclaims_stale_orphans_but_spares_recent(
    spark, sf_dir, tmp_path
):
    """expire_versions deletes claimed-but-uncommitted dirs/claims
    older than the grace window (ADVICE r5: they previously
    accumulated forever) while leaving recent ones — a possibly
    in-flight writer — untouched."""
    import os

    tdir = str(tmp_path / "stale_nation")
    nation = load_tables(spark, sf_dir)["nation"]
    write_snapshot(nation, tdir)
    write_snapshot(nation.limit(3), tdir)
    # Simulate a crashed writer: claim + partial dir for v3, old mtime.
    stale_dir = os.path.join(tdir, "v00003")
    stale_claim = os.path.join(tdir, "_claims", "v00003")
    os.mkdir(stale_dir)
    open(stale_claim, "w").close()
    old = time.time() - 7200
    os.utime(stale_dir, (old, old))
    os.utime(stale_claim, (old, old))
    # And a fresh in-flight claim for v4 (recent mtime — must survive).
    fresh_claim = os.path.join(tdir, "_claims", "v00004")
    open(fresh_claim, "w").close()

    expired = expire_versions(tdir, keep_last=2, orphan_grace=3600)
    assert expired == []  # both manifest versions kept
    assert not os.path.exists(stale_dir)
    assert not os.path.exists(stale_claim)
    assert os.path.exists(fresh_claim)
    # Committed versions and their claims are untouched.
    assert [e["version"] for e in list_versions(tdir)] == [1, 2]
    assert read_snapshot(spark, tdir).count() == 3
