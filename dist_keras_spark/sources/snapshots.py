"""Manifest-based snapshot versioning over plain parquet (A-family).

The lakehouse time-travel primitive reduced to its essence: every
commit writes its data files to an immutable staging dir, then
atomically publishes a JSON manifest listing the COMPLETE file set of
that version (previous files + new ones). Readers never list
directories — they read exactly the manifest's files — so

  - a reader pinned to version N sees a consistent snapshot no matter
    how many commits land meanwhile (snapshot isolation);
  - commits are atomic: the manifest rename is the only publish step,
    so a crashed writer leaves garbage files but never a torn table;
  - time travel is a METADATA operation — choosing v1 vs v42 changes
    which file list is read, not how much data is scanned per file.

This is the same design Iceberg/Delta use on object stores (where
directory rename is non-atomic and listing is both slow and
eventually consistent at 100 TB); os.rename stands in for the catalog
swap. Deletes/compaction would add manifest entries that REPLACE
files — out of scope here, covered conceptually by sinks.compact_parquet.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession


def _manifest_paths(path: str) -> list[str]:
    return sorted(glob.glob(f"{path}/_manifests/v*.json"))


def write_snapshot(df: DataFrame, path: str) -> int:
    """Commit `df` as the next version (APPEND semantics: the new
    manifest lists every prior file plus this commit's). Returns the
    published version number."""
    os.makedirs(f"{path}/_manifests", exist_ok=True)
    existing = _manifest_paths(path)
    prev_files: list[str] = (
        json.load(open(existing[-1]))["files"] if existing else []
    )
    version = len(existing) + 1
    staging = f"{path}/data/v{version:05d}"
    df.write.mode("overwrite").parquet(staging)
    files = sorted(glob.glob(f"{staging}/*.parquet"))
    manifest = {"version": version, "files": prev_files + files}
    tmp = f"{path}/_manifests/.v{version:05d}.json.tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    # the atomic publish: readers either see the old latest or the new
    os.rename(tmp, f"{path}/_manifests/v{version:05d}.json")
    return version


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the table AS OF `version` (latest when None) — exactly the
    manifest's file list, never a directory listing."""
    manifests = _manifest_paths(path)
    if not manifests:
        raise FileNotFoundError(f"no snapshots at {path}")
    pick = (
        f"{path}/_manifests/v{version:05d}.json"
        if version is not None
        else manifests[-1]
    )
    files = json.load(open(pick))["files"]
    return spark.read.parquet(*files)


def rollback_snapshot(path: str, to_version: int) -> int:
    """ROLL-FORWARD restore: publish a NEW version whose file list is
    exactly `to_version`'s — history is never rewritten (readers
    pinned to intermediate versions keep their snapshot; the bad
    version stays inspectable), which is how Iceberg/Delta implement
    rollback on object stores where deleting published metadata races
    with readers. Returns the new version number."""
    src = f"{path}/_manifests/v{to_version:05d}.json"
    if not os.path.exists(src):
        raise FileNotFoundError(f"no version {to_version} at {path}")
    files = json.load(open(src))["files"]
    version = len(_manifest_paths(path)) + 1
    tmp = f"{path}/_manifests/.v{version:05d}.json.tmp"
    with open(tmp, "w") as fh:
        json.dump(
            {"version": version, "restored_from": to_version, "files": files},
            fh,
        )
    os.rename(tmp, f"{path}/_manifests/v{version:05d}.json")
    return version
