"""Log-backed versioned table (minimal Delta/Iceberg-shaped sink).

``upsert_table`` / ``compact_table`` in ``io.py`` rewrite the table
root in place; that loses history and relies on a directory swap. This
module adds the missing piece — an append-only **snapshot log**:

- a table is a directory with immutable parquet data files under
  ``data/`` and JSON manifests under ``_log/v{N}.json``;
- every manifest lists the *complete* set of data files visible at
  that version (no log replay needed to read), plus the operation and
  parent version;
- a commit is one atomic ``os.rename`` of a temp manifest into its
  version slot — if the slot is taken, a concurrent writer won, and
  the commit retries against the new head (optimistic concurrency);
- readers resolve a manifest once and read exactly its files, so a
  reader pinned to version N is untouched by later commits
  (snapshot isolation), and ``version=`` gives time travel.

Scale notes: commits are O(1) metadata regardless of table size —
appending 1 TB to a 100 TB table writes the new files plus one JSON.
On an object store the rename becomes a conditional PUT
(if-none-match), which is exactly how log-backed formats commit.
Manifests list files, never rows; at very large file counts the
file list itself would be sharded (Iceberg's manifest lists) — out of
scope here, noted for parity. Data files are immutable; history is
reclaimed explicitly with ``snapshot_expire``, never as a side effect
of a write.

The reference has no table format (its state lives in memory and a
JSON admin view, ``CrossAZBlockPlacementPolicyPlugin.java:221-262``);
this is engine-side infrastructure a 100 TB pipeline needs for
restatement-safe sinks.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG = "_log"
_DATA = "data"


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, _LOG, f"v{version:06d}.json")


def snapshot_versions(path: str) -> list[int]:
    """Committed versions, ascending. Empty list = no table yet."""
    log_dir = os.path.join(path, _LOG)
    if not os.path.isdir(log_dir):
        return []
    return sorted(
        int(f[1:-5])
        for f in os.listdir(log_dir)
        if f.startswith("v") and f.endswith(".json")
    )


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as fh:
        return json.load(fh)


def _current_version(path: str) -> int | None:
    versions = snapshot_versions(path)
    return versions[-1] if versions else None


def snapshot_write(
    df: DataFrame, path: str, mode: str = "append", max_retries: int = 10
) -> int:
    """Commit ``df`` as a new table version; returns the version.

    ``append`` keeps the parent's files and adds the new ones;
    ``overwrite`` starts the file list fresh (old files stay on disk
    for time travel until ``snapshot_expire``). Data lands first in a
    unique subdir (never visible until the manifest commits), then the
    manifest claims the next version slot by atomic rename.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    os.makedirs(os.path.join(path, _LOG), exist_ok=True)
    batch = uuid.uuid4().hex[:12]
    data_dir = os.path.join(path, _DATA, batch)
    df.write.mode("errorifexists").parquet(data_dir)
    new_files = [
        os.path.join(_DATA, batch, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    ]
    for _ in range(max_retries):
        parent = _current_version(path)
        files = list(new_files)
        if mode == "append" and parent is not None:
            parent_manifest = _read_manifest(path, parent)
            if parent_manifest["schema"] != df.schema.json():
                raise ValueError(
                    f"append schema mismatch at {path} v{parent}: "
                    "appends must match the table schema exactly "
                    "(overwrite to restate)"
                )
            files = parent_manifest["files"] + files
        version = 0 if parent is None else parent + 1
        manifest = {
            "version": version,
            "parent": parent,
            "operation": mode,
            "files": sorted(files),
            "schema": df.schema.json(),
        }
        tmp = os.path.join(path, _LOG, f".tmp_{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        target = _manifest_path(path, version)
        try:
            # atomic claim of the version slot: link fails with EEXIST
            # if a concurrent writer committed this version first.
            os.link(tmp, target)
            os.unlink(tmp)
            return version
        except FileExistsError:
            os.unlink(tmp)  # lost the race — recompute against new head
    raise RuntimeError(f"commit contention: {max_retries} retries exhausted")


def snapshot_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a committed version (default: latest). The file list is
    resolved once, driver-side; the scan itself is a plain parquet
    multi-file read (vectorized, pushdown-capable)."""
    if version is None:
        version = _current_version(path)
        if version is None:
            raise FileNotFoundError(f"no snapshot log at {path}")
    manifest = _read_manifest(path, version)
    files = [os.path.join(path, f) for f in manifest["files"]]
    if not files:
        from pyspark.sql.types import StructType

        return spark.createDataFrame([], StructType.fromJson(json.loads(manifest["schema"])))
    return spark.read.parquet(*files)


def snapshot_compact(
    spark: SparkSession, path: str, target_file_mb: int = 128
) -> int:
    """Rewrite the head version's files into ~``target_file_mb``
    outputs and commit as an overwrite version. History (and pinned
    readers) keep the old files; only the head sees the compact set."""
    df = snapshot_read(spark, path)
    size = sum(
        os.path.getsize(os.path.join(path, f))
        for f in _read_manifest(path, _current_version(path))["files"]
    )
    n = max(1, round(size / (target_file_mb * 1024 * 1024)))
    return snapshot_write(df.coalesce(n), path, mode="overwrite")


def snapshot_expire(path: str, keep_last: int = 1) -> int:
    """Drop all but the last ``keep_last`` versions and delete data
    files no remaining version references. Returns files deleted.
    The only operation that removes data — writes never do."""
    versions = snapshot_versions(path)
    if len(versions) <= keep_last:
        return 0
    keep, drop = versions[-keep_last:], versions[:-keep_last]
    referenced = set()
    for v in keep:
        referenced.update(_read_manifest(path, v)["files"])
    deleted = 0
    for v in drop:
        for f in _read_manifest(path, v)["files"]:
            if f not in referenced:
                full = os.path.join(path, f)
                if os.path.exists(full):
                    os.unlink(full)
                    deleted += 1
        os.unlink(_manifest_path(path, v))
    return deleted
