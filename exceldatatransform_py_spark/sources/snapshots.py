"""Versioned snapshot tables: time travel / rollback on plain parquet.

The lightweight transactional layout every table format (Delta,
Iceberg, Hudi) formalizes, reduced to its primitives so it runs on any
filesystem with nothing but parquet and one JSON manifest per commit:

    table/
      _versions/v00000.json   {"version": 0, "data_dir": "d00000", ...}
      _versions/v00001.json
      d00000/*.parquet        immutable data of version 0
      d00001/*.parquet        immutable data of version 1

* Writers NEVER mutate existing data: each commit writes a fresh data
  directory, then publishes it by writing the next manifest. The
  manifest write is the commit point (a single small-file create —
  atomic enough for a single-writer pipeline; real formats add a
  log-store/CAS for concurrent writers, which is exactly the piece
  this module does not claim).
* Readers resolve the manifest FIRST, then read only that version's
  data directory — a reader never sees a half-written commit, and
  old versions stay readable until vacuumed (snapshot isolation).
* ``overwrite`` and ``merge_update`` are the two commit kinds the
  reference pipeline needs (full rewrite / S5 update-only merge,
  ``timesheet_transform.py:105-138``); both go through the same
  commit path.

At 100 TB: data directories are written by the cluster with normal
parallelism (this module adds no driver-side data movement); only the
KB-sized manifest is driver-written. Version history is O(commits)
small files; ``vacuum`` drops data directories older than a retention
horizon exactly like Delta's VACUUM.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from exceldatatransform_py_spark.operators.merge import merge_update

_VDIR = "_versions"


def _version_path(table: str, v: int) -> str:
    return os.path.join(table, _VDIR, f"v{v:05d}.json")


def _manifests(table: str) -> list[dict]:
    vdir = os.path.join(table, _VDIR)
    if not os.path.isdir(vdir):
        return []
    out = []
    for name in sorted(os.listdir(vdir)):
        if name.startswith("v") and name.endswith(".json"):
            with open(os.path.join(vdir, name)) as f:
                out.append(json.load(f))
    return out


def latest_version(table: str) -> int | None:
    ms = _manifests(table)
    return ms[-1]["version"] if ms else None


def _commit(
    table: str, df: DataFrame, kind: str, parent: int | None
) -> int:
    v = 0 if parent is None else parent + 1
    data_dir = f"d{v:05d}"
    df.write.mode("errorifexists").parquet(os.path.join(table, data_dir))
    os.makedirs(os.path.join(table, _VDIR), exist_ok=True)
    manifest = {
        "version": v,
        "data_dir": data_dir,
        "kind": kind,
        "parent": parent,
        "schema": df.schema.jsonValue(),
    }
    # Publish: write-then-rename so the manifest appears atomically.
    tmp = _version_path(table, v) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _version_path(table, v))
    return v


def snapshot_write(table: str, df: DataFrame) -> int:
    """Commit ``df`` as the next full version of ``table`` (the
    overwrite commit). Returns the new version number."""
    return _commit(table, df, "overwrite", latest_version(table))


def snapshot_read(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Read ``table`` at ``version`` (default: latest). Time travel is
    just manifest resolution — no data is ever rewritten or copied."""
    ms = _manifests(table)
    if not ms:
        raise FileNotFoundError(f"no versions in {table}")
    by_v = {m["version"]: m for m in ms}
    v = ms[-1]["version"] if version is None else version
    if v not in by_v:
        raise ValueError(f"version {v} not in {sorted(by_v)}")
    return spark.read.parquet(os.path.join(table, by_v[v]["data_dir"]))


def snapshot_merge_update(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    on: Sequence[str],
    update_cols: Sequence[str],
) -> int:
    """S5 as a snapshot commit: update-only merge of ``updates`` into
    the latest version, committed as a NEW version — the previous
    version stays readable (audit/rollback), unlike the in-place
    rewrite sink. Returns the new version number."""
    current = snapshot_read(spark, table)
    merged = merge_update(current, updates, on=on, update_cols=update_cols)
    return _commit(table, merged, "merge_update", latest_version(table))


def rollback(table: str, version: int) -> int:
    """Make ``version`` current again by committing it as a new
    version pointing at the SAME data directory (metadata-only, like
    Delta's RESTORE — no data copy). Returns the new version."""
    ms = _manifests(table)
    by_v = {m["version"]: m for m in ms}
    if version not in by_v:
        raise ValueError(f"version {version} not in {sorted(by_v)}")
    parent = ms[-1]["version"]
    v = parent + 1
    manifest = dict(by_v[version], version=v, kind="rollback", parent=parent)
    os.makedirs(os.path.join(table, _VDIR), exist_ok=True)
    tmp = _version_path(table, v) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _version_path(table, v))
    return v


def vacuum(table: str, keep_last: int = 2) -> list[int]:
    """Drop data directories only referenced by versions older than
    the last ``keep_last`` — bounded storage growth, the VACUUM
    analogue. Directories shared with retained versions (rollback
    commits) are kept. Returns the vacuumed version numbers."""
    ms = _manifests(table)
    if len(ms) <= keep_last:
        return []
    keep = {m["data_dir"] for m in ms[-keep_last:]}
    dropped = []
    for m in ms[:-keep_last]:
        if m["data_dir"] not in keep:
            shutil.rmtree(os.path.join(table, m["data_dir"]), ignore_errors=True)
            dropped.append(m["version"])
    return dropped
