"""Versioned table snapshots with time travel on plain Parquet.

The reference's warehouse is BigQuery, whose tables have built-in
time travel (``FOR SYSTEM_TIME AS OF``) and snapshot rollback. On a
plain-Parquet lake that capability has to be provided by the table
layout; this module implements the minimal immutable-snapshot form of
what Iceberg/Delta do, with no library dependency:

    table_dir/
        _manifest.json        <- versions: [{version, ts_utc, path,
                                             n_rows}], current: N
        _claims/v00001        <- empty marker files: version-number
        _claims/v00002           claims (exclusive-create, survive
                                  the data overwrite below)
        v00001/ ... parquet
        v00002/ ... parquet

Writes create a NEW immutable version directory, then atomically
replace the manifest (write-temp + ``os.replace``, which POSIX
guarantees atomic) — readers either see the old manifest or the new
one, never a torn state, and never a half-written snapshot (the data
is fully on disk before the manifest points at it). Reads resolve a
version (latest, explicit, or as-of-timestamp) through the manifest
and scan exactly one snapshot directory.

Scale notes: the manifest is O(#versions) metadata, not data; a
snapshot write is one normal distributed Parquet write (same cost as
any overwrite); time-travel reads cost the same as reading the live
table. Old versions are reclaimed explicitly (``expire_versions``),
mirroring Iceberg's snapshot expiration — nothing is deleted on
write, so concurrent readers of an old version are never broken.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_manifest.json"


def _manifest_path(table_dir: str) -> str:
    return os.path.join(table_dir, MANIFEST)


def _load_manifest(table_dir: str) -> dict:
    p = _manifest_path(table_dir)
    if not os.path.exists(p):
        return {"versions": [], "current": 0}
    with open(p) as f:
        return json.load(f)


def _store_manifest(table_dir: str, manifest: dict) -> None:
    tmp = _manifest_path(table_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(table_dir))  # atomic on POSIX


class _ManifestLock:
    """Poor-man's mutex via ``os.mkdir`` (atomic create-or-fail on
    POSIX) around the manifest read-modify-write. Local-filesystem
    scope only — matches this module's no-library-lake contract; a
    shared object store would swap this for a conditional PUT."""

    def __init__(self, table_dir: str, timeout: float = 30.0):
        self._dir = os.path.join(table_dir, "_manifest.lock")
        self._timeout = timeout

    def __enter__(self):
        deadline = time.time() + self._timeout
        while True:
            try:
                os.mkdir(self._dir)
                return self
            except FileExistsError:
                if time.time() > deadline:
                    raise TimeoutError(
                        f"manifest lock held > {self._timeout}s: {self._dir}"
                    )
                time.sleep(0.05)

    def __exit__(self, *exc):
        os.rmdir(self._dir)
        return False


def _claim_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, "_claims", f"v{version:05d}")


def write_snapshot(df: DataFrame, table_dir: str) -> int:
    """Write ``df`` as the table's next immutable version and make it
    current. Returns the new version number. The version directory is
    fully written BEFORE the manifest swap, so a crash mid-write
    leaves the table at the previous version with an orphan claim (and
    possibly a partial dir), both reclaimed by ``expire_versions``
    after a grace period — never a torn state.

    Concurrent writers are safe (optimistic concurrency, the Iceberg
    commit shape): each writer CLAIMS a version NUMBER by exclusively
    creating a marker file under ``_claims/`` (``O_CREAT|O_EXCL`` —
    atomic create-or-fail; a loser simply claims the next number).
    The marker deliberately lives OUTSIDE the version directory:
    Spark's ``mode("overwrite")`` deletes and recreates the data dir
    at job start, so a claim expressed as the dir itself would vanish
    for a window and a racing writer could double-claim the number.
    The manifest read-modify-write is serialized by a lock, with
    ``current`` advancing monotonically (max of committed versions)
    so commit order cannot regress the table. Pre-existing version
    dirs with no claim (e.g. left by an older layout) are skipped,
    never reused."""
    os.makedirs(os.path.join(table_dir, "_claims"), exist_ok=True)
    manifest = _load_manifest(table_dir)
    # Allocate ABOVE the high-water mark, never above 'current': after
    # a rollback, current sits below already-committed versions, and
    # after expire_versions has reclaimed those versions' dirs/claims
    # nothing on disk would stop current+1 from re-claiming a
    # previously-committed number — a fresh commit would then be
    # shadowed by stale higher-numbered snapshots in as-of resolution.
    version = max(
        manifest["current"],
        manifest.get("max_version", 0),
        max((e["version"] for e in manifest["versions"]), default=0),
    )
    while True:
        version += 1
        vdir = os.path.join(table_dir, f"v{version:05d}")
        if os.path.exists(vdir):  # orphan/legacy dir: skip, never reuse
            continue
        try:
            fd = os.open(
                _claim_path(table_dir, version),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
            os.close(fd)  # atomic claim: loser of a race moves on
            break
        except FileExistsError:
            continue
    # Refresh the claim at write start: the marker's mtime is the
    # writer's liveness signal to expire_versions' orphan reclaim, and
    # anything slow between claiming and writing (manifest contention,
    # upstream plan materialization) must not age it past the grace
    # window while the writer is still alive.
    os.utime(_claim_path(table_dir, version))
    df.write.mode("overwrite").parquet(vdir)
    n_rows = df.sparkSession.read.parquet(vdir).count()
    with _ManifestLock(table_dir):
        manifest = _load_manifest(table_dir)
        manifest["versions"].append(
            {
                "version": version,
                "ts_utc": time.time(),
                "path": f"v{version:05d}",
                "n_rows": int(n_rows),
            }
        )
        manifest["versions"].sort(key=lambda e: e["version"])
        manifest["current"] = max(manifest["current"], version)
        # the never-reused ledger: survives rollback AND expiration
        manifest["max_version"] = max(
            manifest.get("max_version", 0), version
        )
        _store_manifest(table_dir, manifest)
    return version


def _resolve(manifest: dict, version: int | None, as_of: float | None) -> dict:
    entries = manifest["versions"]
    if not entries:
        raise FileNotFoundError("table has no snapshots")
    live = {e["version"]: e for e in entries}
    if version is not None:
        if version not in live:
            raise ValueError(
                f"version {version} not found (have {sorted(live)})"
            )
        return live[version]
    if as_of is not None:
        eligible = [e for e in entries if e["ts_utc"] <= as_of]
        if not eligible:
            raise ValueError("no snapshot at or before the requested time")
        return max(eligible, key=lambda e: e["version"])
    return live[manifest["current"]]


def read_snapshot(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    as_of: float | None = None,
) -> DataFrame:
    """Read the current version (default), an explicit ``version``, or
    the newest version whose commit time is <= ``as_of`` (epoch
    seconds) — BigQuery's ``FOR SYSTEM_TIME AS OF`` on Parquet."""
    entry = _resolve(_load_manifest(table_dir), version, as_of)
    return spark.read.parquet(os.path.join(table_dir, entry["path"]))


def list_versions(table_dir: str) -> list[dict]:
    """Commit log: [{version, ts_utc, path, n_rows}] ascending."""
    return list(_load_manifest(table_dir)["versions"])


def rollback(table_dir: str, version: int) -> None:
    """Point 'current' back at an existing version (metadata-only —
    instant at any table size, exactly like Iceberg rollback). Later
    versions stay on disk and readable until expired. The manifest
    read-modify-write is lock-serialized so a rollback racing a
    concurrent commit cannot store a stale manifest and drop the
    writer's just-appended version entry."""
    with _ManifestLock(table_dir):
        manifest = _load_manifest(table_dir)
        _resolve(manifest, version, None)  # validates existence
        manifest["current"] = version
        _store_manifest(table_dir, manifest)


def expire_versions(
    table_dir: str, keep_last: int = 2, orphan_grace: float = 3600.0
) -> list[int]:
    """Reclaim old snapshot directories, keeping the newest
    ``keep_last`` versions plus the current one (rollback may have
    moved current backwards). Returns the expired version numbers.

    Also reclaims ORPHANS: claim markers and on-disk ``vNNNNN`` dirs
    absent from the manifest (a crashed writer claimed a number but
    never committed) whose mtime is older than ``orphan_grace``
    seconds — the grace window protects an in-flight writer that has
    claimed but not yet committed. Lock-serialized like
    ``write_snapshot`` so an expire racing a commit cannot lose the
    writer's manifest entry."""
    import shutil

    expired = []
    with _ManifestLock(table_dir):
        manifest = _load_manifest(table_dir)
        entries = sorted(manifest["versions"], key=lambda e: e["version"])
        keep = {e["version"] for e in entries[-keep_last:]}
        keep.add(manifest["current"])
        survivors = []
        for e in entries:
            if e["version"] in keep:
                survivors.append(e)
            else:
                shutil.rmtree(
                    os.path.join(table_dir, e["path"]), ignore_errors=True
                )
                try:
                    os.unlink(_claim_path(table_dir, e["version"]))
                except OSError:
                    pass
                expired.append(e["version"])
        manifest["versions"] = survivors
        _store_manifest(table_dir, manifest)

        # Orphan reclamation: anything claimed or on disk that the
        # manifest does not list and that is older than the grace
        # window was left by a crashed writer — remove it.
        listed = {e["version"] for e in survivors}
        cutoff = time.time() - orphan_grace
        claims_dir = os.path.join(table_dir, "_claims")
        stale_claims = []
        if os.path.isdir(claims_dir):
            stale_claims = [
                os.path.join(claims_dir, n) for n in os.listdir(claims_dir)
            ]
        stale_dirs = [
            os.path.join(table_dir, n)
            for n in os.listdir(table_dir)
            if n.startswith("v") and n[1:].isdigit()
        ]
        def _freshest_mtime(version: int) -> float:
            """Newest liveness evidence for a claimed-but-uncommitted
            version: the claim marker's mtime OR the data dir's (a
            long Spark write keeps adding part files — the dir stays
            fresh even while the claim marker ages), whichever is
            newer. Keying the grace check on the freshest of the two
            means a writer stalled between claim and first write, or
            one mid-way through a multi-hour write, never loses its
            claim to a concurrent expire."""
            newest = 0.0
            for p in (
                _claim_path(table_dir, version),
                os.path.join(table_dir, f"v{version:05d}"),
            ):
                try:
                    newest = max(newest, os.stat(p).st_mtime)
                except OSError:
                    pass
            return newest

        for path in stale_claims + stale_dirs:
            name = os.path.basename(path)
            if not (name.startswith("v") and name[1:].isdigit()):
                continue
            if int(name[1:]) in listed:
                continue
            try:
                if _freshest_mtime(int(name[1:])) > cutoff:
                    continue  # possibly an in-flight writer
                if os.path.isdir(path):
                    shutil.rmtree(path, ignore_errors=True)
                else:
                    os.unlink(path)
            except OSError:
                pass
    return expired
