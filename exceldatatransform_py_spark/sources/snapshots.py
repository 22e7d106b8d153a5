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
  manifest write is the commit point, and it is put-if-absent:
  concurrent writers racing for the same version see exactly one
  winner, and the loser gets ``SnapshotConflictError`` instead of
  silently clobbering — the same optimistic-concurrency protocol
  Delta runs on its log store (put-if-absent on the next log entry).
  HOW put-if-absent is achieved is pluggable (``CommitProtocol``):
  ``PosixCommitProtocol`` (default) uses create-exclusive hardlinks +
  atomic directory rename — right for local disk/HDFS;
  ``ConditionalPutCommitProtocol`` never renames or links anything
  (unique data-dir names + conditional PUT of the manifest object) —
  the shape object stores need, where rename is copy+delete and not
  atomic. Read-modify-write
  commits (``snapshot_merge_update``) capture the version they read
  and commit conditionally on it, so lost updates are impossible;
  ``max_retries`` re-runs the read-merge-commit loop on conflict.
* Readers resolve the manifest FIRST, then read only that version's
  data directory — a reader never sees a half-written commit, and
  old versions stay readable until vacuumed (snapshot isolation).
* ``overwrite`` and ``merge_update`` are the two commit kinds the
  reference pipeline needs (full rewrite / S5 update-only merge,
  ``timesheet_transform.py:105-138``); both go through the same
  commit path. The merge commit carries the FULL MERGE clause
  surface (``operators.merge.merge_full``): WHEN MATCHED UPDATE
  always, optional WHEN NOT MATCHED INSERT and WHEN NOT MATCHED BY
  SOURCE DELETE; the file-pruned variant supports INSERT too.

* Deletes come in two physical flavors, like Delta/Iceberg v2:
  copy-on-write (``snapshot_delete_range`` — rewrite overlapping
  files) and merge-on-read (``snapshot_delete_dv`` — record deleted
  row positions in a parquet sidecar, rewrite NOTHING; readers
  subtract them, COUNT(*) subtracts cached cardinalities, and
  compaction/merges materialize them away).

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
import uuid
from contextlib import contextmanager
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from exceldatatransform_py_spark.operators.merge import merge_update
from exceldatatransform_py_spark.sources.snapshot_common import (
    LAYOUT_ONLY_KINDS as _LAYOUT_ONLY_KINDS,
    SCHEMA_ONLY_KINDS as _SCHEMA_ONLY_KINDS,
    SnapshotRetentionError,
)

_VDIR = "_versions"
_DVDIR = "_dv"

#: a version's total deleted-position count below this is broadcast
#: into the read-side anti-join (DVs are usually tiny vs data).
_DV_BROADCAST_MAX = 2_000_000


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


def _latest_manifest(table: str) -> dict | None:
    """Parse ONLY the newest manifest file — the per-commit hot paths
    (CDC replication applies one commit per source version) must not
    re-parse the whole history per commit (the quadratic-in-versions
    trap ``last_field_id`` closed for the id floor)."""
    vdir = os.path.join(table, _VDIR)
    if not os.path.isdir(vdir):
        return None
    names = sorted(
        n for n in os.listdir(vdir)
        if n.startswith("v") and n.endswith(".json")
    )
    if not names:
        return None
    with open(os.path.join(vdir, names[-1])) as f:
        return json.load(f)


def _stat_encode(v):
    """Footer min/max value → JSON-safe form (type-tagged for the
    temporal types JSON cannot carry natively)."""
    import datetime

    if isinstance(v, datetime.datetime):
        return {"__ts": v.isoformat()}
    if isinstance(v, datetime.date):
        return {"__date": v.isoformat()}
    if isinstance(v, (int, float, str, bool)):
        return v
    return None  # unsupported stat type → treat as no stats


def _stat_decode(v):
    import datetime

    if isinstance(v, dict):
        if "__ts" in v:
            return datetime.datetime.fromisoformat(v["__ts"])
        if "__date" in v:
            return datetime.date.fromisoformat(v["__date"])
    return v


def _collect_stats(
    table: str, rel_files: list[str], cols: Sequence[str]
) -> dict:
    """{relative file: {col: [min, max]}} from parquet footers —
    computed once at COMMIT time so later pruned merges never reopen
    data files (what Delta/Iceberg store in the log)."""
    out: dict = {}
    for rel in rel_files:
        per_col = {}
        for c in cols:
            path = os.path.join(table, rel)
            mm = _footer_minmax(path, c)
            if mm is not None:
                lo, hi = _stat_encode(mm[0]), _stat_encode(mm[1])
                if lo is not None and hi is not None:
                    # third element: NULL count (may be JSON null when
                    # the footer doesn't report one) — lets NULL-keyed
                    # merges prune to NULL-carrying files only.
                    # Pre-upgrade manifests hold 2-element [lo, hi].
                    per_col[c] = [lo, hi, _footer_nullcount(path, c)]
        if per_col:
            out[rel] = per_col
    return out


def _footer_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def _footer_nullcount(path: str, col: str) -> int | None:
    """Total NULL count of ``col`` across a file's row groups, or
    ``None`` when any group doesn't report one (callers must then
    treat the file as possibly NULL-carrying)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = None
    for i in range(md.num_columns):
        if md.schema.column(i).name == col:
            idx = i
            break
    if idx is None:
        return None
    total = 0
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or st.null_count is None:
            return None
        total += st.null_count
    return total


def _collect_rows(table: str, rel_files: list[str]) -> dict:
    """{relative file: row count} from parquet footers, cached in the
    manifest at COMMIT time so ``snapshot_count`` answers COUNT(*)
    from metadata alone — the aggregate pushdown every table format's
    log provides."""
    return {rel: _footer_rows(os.path.join(table, rel)) for rel in rel_files}


# ---------------------------------------------------------------------------
# Per-file bloom filters: min/max stats cannot prune POINT lookups on
# a high-cardinality column that isn't clustered — every file's range
# covers every key, so a one-key merge rewrites the whole table. A
# small per-file bloom (m bits, k seeded hashes) cached in the
# manifest answers "can this file contain key x?" probabilistically:
# false positives only cost an unnecessary rewrite-unchanged; false
# negatives are impossible, so pruning stays sound. This is the
# bloom-filter index Delta/Iceberg/Hudi attach to data files.
# ---------------------------------------------------------------------------

#: bloom geometry: 4096 bits / 2 seeded xxhash64 probes ⇒ ~0.2% FP at
#: 100 distinct keys per file, ~5% at 500; saturated blooms degrade to
#: "maybe" (never unsound). 1 KiB hex per (file, col) in the manifest.
_BLOOM_M = 4096
_BLOOM_SEEDS = (177, 331)
#: point-probe key sets larger than this skip bloom consultation (the
#: driver-side distinct-collect would dominate; range pruning already
#: handles bulk merges).
_BLOOM_PROBE_CAP = 10_000


def _bloom_bit(seed: int, col: str):
    return F.pmod(
        F.xxhash64(F.lit(seed), F.col(col)), F.lit(_BLOOM_M)
    ).cast("int")


def _collect_blooms(
    spark: SparkSession, table: str, rel_files: list[str], cols: Sequence[str]
) -> dict:
    """{rel file: {col: hex bitmap}} in ONE distributed scan of the
    newly committed files (grouped by the reader's ``_metadata`` file
    path) — the cluster computes the blooms, the driver only packs
    ≤ m distinct bit positions per (file, col) into a hex string."""
    if not rel_files or not cols:
        return {}
    scan = spark.read.parquet(*[os.path.join(table, r) for r in rel_files])
    aggs = []
    for c in cols:
        for si, s in enumerate(_BLOOM_SEEDS):
            aggs.append(
                F.collect_set(_bloom_bit(s, c)).alias(f"__b_{c}_{si}")
            )
    rows = (
        scan.withColumn("__rel", _rel_file_expr())
        .groupBy("__rel")
        .agg(*aggs)
        .collect()
    )
    out: dict = {}
    for r in rows:
        ent = {}
        for c in cols:
            bits = 0
            for si in range(len(_BLOOM_SEEDS)):
                for b in r[f"__b_{c}_{si}"] or []:
                    bits |= 1 << int(b)
            ent[c] = f"{bits:x}"
        out[r["__rel"]] = ent
    return out


def _bloom_may_contain(hexmap: str, pairs: list[tuple]) -> bool:
    """True iff the bloom cannot rule out EVERY probed key (a key is
    possible when all of its k bit positions are set)."""
    bits = int(hexmap, 16)
    return any(
        all((bits >> b) & 1 for b in pair) for pair in pairs
    )


def _bloom_probe_pairs(
    keys: DataFrame, col: str, cap: int = _BLOOM_PROBE_CAP
) -> list[tuple] | None:
    """The distinct non-NULL probe keys' bloom bit tuples, or None
    when the key set exceeds ``cap`` (bulk merge — bloom consultation
    would cost more than it saves; range pruning still applies)."""
    rows = (
        keys.filter(F.col(col).isNotNull())
        .select(
            *[
                _bloom_bit(s, col).alias(f"b{i}")
                for i, s in enumerate(_BLOOM_SEEDS)
            ]
        )
        .distinct()
        .limit(cap + 1)
        .collect()
    )
    if len(rows) > cap:
        return None
    return [
        tuple(int(r[f"b{i}"]) for i in range(len(_BLOOM_SEEDS)))
        for r in rows
    ]


def _literal_probe_frame(spark: SparkSession, manifest: dict, col: str, values):
    """One-row-per-value frame of probe literals CAST to the table
    column's committed type — xxhash64 is type-sensitive, so probing
    an int column with a Python int defaulting to long would miss.
    Returns None for non-primitive column types."""
    typ = next(
        (
            f.get("type")
            for f in manifest.get("schema", {}).get("fields", [])
            if f.get("name") == col
        ),
        None,
    )
    if not isinstance(typ, str) or not values:
        return None
    return spark.createDataFrame(
        [(str(v),) for v in values], "v string"
    ).select(F.col("v").cast(typ).alias(col))


def snapshot_count(table: str, version: int | None = None) -> int:
    """COUNT(*) of a version WITHOUT any Spark job or data read:
    summed from per-file row counts cached in the manifest at commit
    time; files a pre-upgrade manifest didn't count fall back to one
    footer read each (still metadata-only)."""
    ms = _manifests(table)
    if not ms:
        raise FileNotFoundError(f"no versions in {table}")
    by_v = {m["version"]: m for m in ms}
    v = ms[-1]["version"] if version is None else version
    if v not in by_v:
        raise ValueError(f"version {v} not in {sorted(by_v)}")
    m = by_v[v]
    rows = m.get("rows", {})
    files = _manifest_files(table, m)
    total = sum(
        rows[rel] if rel in rows
        else _footer_rows(os.path.join(table, rel))
        for rel in files
    )
    # deletion vectors: per-file deleted-position cardinalities are
    # cached in the manifest, so COUNT(*) stays metadata-only even on
    # merge-on-read tables.
    fset = set(files)
    return total - sum(
        int(e.get("count", 0))
        for rel, e in m.get("dv", {}).items()
        if rel in fset
    )


class SnapshotConflictError(RuntimeError):
    """Optimistic-concurrency loser: another writer published this
    version first. The commit was NOT applied and left no trace —
    re-read the table and retry the transaction."""

    def __init__(self, table: str, version: int):
        super().__init__(
            f"snapshot commit conflict: {table} v{version} already published"
        )
        self.table = table
        self.version = version


class CommitProtocol:
    """The two primitives the snapshot log's atomicity rests on,
    abstracted so the commit point is pluggable per storage system —
    the split Delta formalizes as its LogStore interface. Everything
    ABOVE this class (merge logic, manifests, pruning, time travel,
    vacuum) is storage-agnostic; only these two operations decide
    which writer wins a race:

    * ``stage_data_dir(table, df, version) -> rel_dir`` — make the
      version's parquet files durable under ``table`` and return the
      directory name the manifest should reference. Losers of a
      version race must either be unable to collide here (unique
      names) or fail cleanly with ``SnapshotConflictError``.
    * ``publish(table, manifest)`` — the COMMIT POINT: make the
      manifest for ``manifest['version']`` visible iff no other
      writer published that version first (put-if-absent), else
      raise ``SnapshotConflictError`` leaving no trace.
    """

    name = "abstract"

    def stage_data_dir(
        self, table: str, df: DataFrame, version: int
    ) -> str:
        raise NotImplementedError

    def publish(self, table: str, manifest: dict) -> None:
        raise NotImplementedError


class PosixCommitProtocol(CommitProtocol):
    """Default protocol for POSIX-rename filesystems (local disk,
    HDFS, NFS): data dirs keep their pretty ``d00007`` names via an
    atomic directory rename, and the manifest publish is
    CREATE-EXCLUSIVE (unique temp + ``os.link``): the link makes the
    full content appear atomically AND fails with ``FileExistsError``
    if any other writer published this version first (unlike
    ``os.replace``, which would silently clobber the winner)."""

    name = "posix"

    def stage_data_dir(
        self, table: str, df: DataFrame, version: int
    ) -> str:
        data_dir = f"d{version:05d}"
        stage = os.path.join(
            table, f"{data_dir}.stage-{uuid.uuid4().hex[:8]}"
        )
        df.write.mode("errorifexists").parquet(stage)
        try:
            os.rename(stage, os.path.join(table, data_dir))
        except OSError as e:
            shutil.rmtree(stage, ignore_errors=True)
            raise SnapshotConflictError(table, version) from e
        return data_dir

    def publish(self, table: str, manifest: dict) -> None:
        v = manifest["version"]
        os.makedirs(os.path.join(table, _VDIR), exist_ok=True)
        final = _version_path(table, v)
        tmp = final + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        try:
            os.link(tmp, final)
        except FileExistsError:
            raise SnapshotConflictError(table, v) from None
        finally:
            os.unlink(tmp)


class ConditionalPutCommitProtocol(CommitProtocol):
    """Object-store-safe protocol: uses ONLY operations object stores
    actually provide — PUT of a whole immutable object conditional on
    its absence (S3 ``If-None-Match: *`` / GCS ``ifGenerationMatch=0``
    / Azure ``If-None-Match``), GET, LIST. NO ``os.rename`` and NO
    ``os.link`` anywhere on the commit path, because on object stores
    "rename" is a non-atomic copy+delete and hardlinks don't exist:

    * data directories get a GLOBALLY UNIQUE name
      (``d00007-3fa9c1d2``) and are written directly in place — two
      writers racing for the same version can never collide on a
      name, so the promote-by-rename step (whose atomicity the POSIX
      protocol leans on) doesn't exist at all; a loser just deletes
      its own never-referenced directory.
    * the manifest object is the sole commit point, published through
      ``_put_if_absent`` — the one method to override for a real
      store (conditional PUT, or a DynamoDB-style commit table when
      the store lacks conditional writes). The local implementation
      simulates the store's internally-atomic conditional PUT by
      serializing writers through a per-table advisory ``flock``
      while checking absence and writing the full payload; the lock
      stands in for the store's own serialization and is NOT part of
      the protocol.

    Note on the parquet job itself: ``df.write`` runs under Spark's
    Hadoop output committer, whose task-commit renames are a separate,
    public concern (object-store deployments use the S3A
    magic/directory committers); this class makes the SNAPSHOT LAYER's
    own commit protocol rename-free."""

    name = "conditional_put"

    def stage_data_dir(
        self, table: str, df: DataFrame, version: int
    ) -> str:
        data_dir = f"d{version:05d}-{uuid.uuid4().hex[:8]}"
        df.write.mode("errorifexists").parquet(
            os.path.join(table, data_dir)
        )
        return data_dir

    def publish(self, table: str, manifest: dict) -> None:
        v = manifest["version"]
        os.makedirs(os.path.join(table, _VDIR), exist_ok=True)
        payload = json.dumps(manifest).encode()
        if not self._put_if_absent(table, _version_path(table, v), payload):
            raise SnapshotConflictError(table, v)

    def _put_if_absent(self, table: str, key: str, payload: bytes) -> bool:
        """Atomically create ``key`` with ``payload`` iff it does not
        exist; True on success. Override point for a real store."""
        import fcntl

        lock_path = os.path.join(table, _VDIR, ".putlock")
        fd = os.open(lock_path, os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            if os.path.exists(key):
                return False
            with open(key, "wb") as f:
                f.write(payload)
                f.flush()
                os.fsync(f.fileno())
            return True
        finally:
            os.close(fd)  # releases the flock


_active_protocol: CommitProtocol = PosixCommitProtocol()


def get_commit_protocol() -> CommitProtocol:
    return _active_protocol


def set_commit_protocol(protocol: CommitProtocol) -> CommitProtocol:
    """Install ``protocol`` as the active commit protocol for all
    snapshot commits; returns the previous one (restore it when
    done, or use ``use_commit_protocol``)."""
    global _active_protocol
    prev = _active_protocol
    _active_protocol = protocol
    return prev


@contextmanager
def use_commit_protocol(protocol: CommitProtocol):
    prev = set_commit_protocol(protocol)
    try:
        yield protocol
    finally:
        set_commit_protocol(prev)


def _publish(table: str, manifest: dict) -> None:
    """Publish via the ACTIVE commit protocol (put-if-absent of the
    version manifest — the optimistic-concurrency commit point)."""
    _active_protocol.publish(table, manifest)


class SnapshotConstraintError(ValueError):
    """A commit's rows violate a table CHECK constraint: the commit
    was rejected BEFORE any data was staged — the table is untouched."""

    def __init__(self, name: str, cond: str, n_violations: int):
        super().__init__(
            f"CHECK constraint {name!r} ({cond}) violated by "
            f"{n_violations} row(s); commit rejected"
        )
        self.name = name
        self.cond = cond
        self.n_violations = n_violations


def _validate_constraints(df: DataFrame, constraints: dict) -> None:
    """Enforce CHECK constraints with SQL semantics (NULL passes —
    only rows where the condition is FALSE violate), all constraints
    in ONE aggregation pass over the commit's rows."""
    if not constraints:
        return
    items = list(constraints.items())
    aggs = [
        F.sum(
            (~F.coalesce(F.expr(cond), F.lit(True))).cast("long")
        ).alias(f"__c{i}")
        for i, (_, cond) in enumerate(items)
    ]
    row = df.agg(*aggs).first()
    for i, (name, cond) in enumerate(items):
        bad = row[f"__c{i}"] or 0
        if bad:
            raise SnapshotConstraintError(name, cond, int(bad))


def _parent_constraints(table: str, parent: int | None) -> dict:
    if parent is None:
        return {}
    for m in _manifests(table):
        if m["version"] == parent:
            return m.get("constraints", {})
    return {}


def last_committed_txn(table: str, app_id: str) -> int | None:
    """Highest ``batch_id`` any version of ``table`` recorded for
    writer ``app_id`` (manifest-only — the idempotence ledger for
    exactly-once streaming commits), or None if the app never
    committed."""
    batches = [
        m["txn"]["batch"]
        for m in _manifests(table)
        if m.get("txn", {}).get("app") == app_id
    ]
    return max(batches) if batches else None


def _txn_already_applied(
    table: str, txn: tuple[str, int] | None
) -> int | None:
    """If ``txn`` (app_id, batch_id) was already committed, return the
    CURRENT latest version (the replay is a no-op); else None. A
    replayed micro-batch must compare with ``<=`` max: retries can
    arrive after later batches already landed."""
    if txn is None:
        return None
    app_id, batch_id = txn
    last = last_committed_txn(table, app_id)
    if last is not None and batch_id <= last:
        return latest_version(table)
    return None


def _commit(
    table: str,
    df: DataFrame,
    kind: str,
    parent: int | None,
    stats_cols: Sequence[str] = (),
    constraints: dict | None = None,
    txn: tuple[str, int] | None = None,
    bloom_cols: Sequence[str] = (),
) -> int:
    import time

    v = 0 if parent is None else parent + 1
    # CHECK constraints persist across commits (Delta's ADD CONSTRAINT
    # contract): None inherits the parent's; a dict replaces them
    # ({} drops all). Validation runs BEFORE staging, so a rejected
    # commit leaves no trace.
    effective = (
        _parent_constraints(table, parent)
        if constraints is None
        else dict(constraints)
    )
    _validate_constraints(df, effective)
    # stable field IDs (rename-safe schema evolution): inherited by
    # name from the parent, fresh 1..n on a new table
    parent_manifest = None
    if parent is not None:
        parent_manifest = next(
            (m for m in _manifests(table) if m["version"] == parent), None
        )
    floor = _last_field_id(table, parent_manifest)
    df = _attach_field_ids(df, parent_manifest, floor=floor)
    data_dir = _active_protocol.stage_data_dir(table, df, v)
    manifest = {
        "version": v,
        "data_dir": data_dir,
        "kind": kind,
        "parent": parent,
        "ts": time.time(),
        "schema": df.schema.jsonValue(),
    }
    _record_last_field_id(manifest, floor)
    if effective:
        manifest["constraints"] = effective
    if txn is not None:
        manifest["txn"] = {"app": txn[0], "batch": int(txn[1])}
    rel_files = sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(os.path.join(table, data_dir))
        if f.endswith(".parquet")
    )
    manifest["rows"] = _collect_rows(table, rel_files)
    if stats_cols:
        manifest["stats"] = _collect_stats(table, rel_files, stats_cols)
    if bloom_cols:
        manifest["blooms"] = _collect_blooms(
            df.sparkSession, table, rel_files, bloom_cols
        )
    try:
        _publish(table, manifest)
    except SnapshotConflictError:
        # a writer that never staged data (rollback is metadata-only)
        # may have taken this version: withdraw our unreferenced dir.
        shutil.rmtree(os.path.join(table, data_dir), ignore_errors=True)
        raise
    return v


def snapshot_write(
    table: str,
    df: DataFrame,
    stats_cols: Sequence[str] = (),
    constraints: dict | None = None,
    txn: tuple[str, int] | None = None,
    bloom_cols: Sequence[str] = (),
) -> int:
    """Commit ``df`` as the next full version of ``table`` (the
    overwrite commit). ``stats_cols`` caches per-file min/max in the
    manifest at commit time, so pruned merges on those columns never
    reopen data-file footers. ``bloom_cols`` additionally caches a
    small per-file bloom filter per column — the index that lets
    POINT lookups (merge/delete/read on a handful of keys) skip files
    min/max provably cannot prune on an unclustered high-cardinality
    key. ``constraints`` maps name → SQL boolean
    (CHECK semantics: NULL passes); they persist in the manifest and
    every later commit — merges included — validates against them
    before staging (pass ``{}`` to drop them). Returns the new
    version number.

    ``txn=(app_id, batch_id)`` makes the commit idempotent for
    exactly-once streaming sinks (Delta's txnAppId/txnVersion
    pattern): the pair is recorded in the manifest, and a replay of an
    already-committed batch (``batch_id`` ≤ the app's last recorded
    batch) is a no-op returning the current version — a foreachBatch
    retry after a driver crash cannot double-apply."""
    done = _txn_already_applied(table, txn)
    if done is not None:
        return done
    return _commit(
        table, df, "overwrite", latest_version(table),
        stats_cols=stats_cols, constraints=constraints, txn=txn,
        bloom_cols=bloom_cols,
    )


def _commit_layout_rewrite(
    spark: SparkSession,
    table: str,
    base: dict,
    df: DataFrame,
    kind: str,
    touched: list[str],
    stats_cols: Sequence[str],
    bloom_cols: Sequence[str],
    rebase: bool,
    max_rebase: int,
) -> int:
    """Commit a LAYOUT-ONLY rewrite (compact / zorder): ``df`` holds
    exactly the live rows of ``touched`` (DVs already applied by the
    DV-aware read), staged under a unique dir and committed as a
    file-level manifest that replaces ``touched`` and inherits every
    other file from the commit parent.

    Disjoint-commit resolution: a layout rewrite changes NO rows, so
    replaying it onto a winner is sound whenever the winner left every
    touched file intact — bytes and DV entry (a winner-grown DV would
    be materialized back to life by our rewrite) — regardless of what
    the winner ADDED (new files are simply inherited; a layout commit
    has no key range to collide with). That is ``_pruned_rebase_ok``
    with the added-file check disabled (update_empty=True). At 100 TB
    this is the difference between nightly OPTIMIZE succeeding under
    continuous ingest and throwing away its whole rewrite on every
    race."""
    import time as _t

    touched_set = set(touched)
    data_dir, _ = _stage_unique(table, df, base["version"] + 1, parent=base)
    new_files = sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(os.path.join(table, data_dir))
        if f.endswith(".parquet")
    )
    new_stats = (
        _collect_stats(table, new_files, stats_cols) if stats_cols else {}
    )
    new_blooms = (
        _collect_blooms(spark, table, new_files, bloom_cols)
        if bloom_cols
        else {}
    )
    new_rows = _collect_rows(table, new_files)

    def build_manifest(cur: dict, attempts: int) -> dict:
        inherited_cur = [
            r for r in _manifest_files(table, cur) if r not in touched_set
        ]
        iset = set(inherited_cur)
        cur_rows = cur.get("rows", {})
        cur_stats = cur.get("stats", {})
        cur_dv = cur.get("dv", {})
        cur_blooms = cur.get("blooms", {})
        stats_out = {
            r: cur_stats[r] for r in inherited_cur if r in cur_stats
        }
        stats_out.update(new_stats)
        blooms_out = {
            r: cur_blooms[r] for r in inherited_cur if r in cur_blooms
        }
        blooms_out.update(new_blooms)
        return {
            "version": cur["version"] + 1,
            "data_dir": data_dir,
            "files": new_files + inherited_cur,
            "rows": {
                **{r: cur_rows[r] for r in inherited_cur if r in cur_rows},
                **new_rows,
            },
            "kind": kind,
            "parent": cur["version"],
            "ts": _t.time(),
            "schema": cur["schema"],
            **({"stats": stats_out} if stats_out else {}),
            **({"blooms": blooms_out} if blooms_out else {}),
            **(
                {"dv": {r: e for r, e in cur_dv.items() if r in iset}}
                if any(r in iset for r in cur_dv)
                else {}
            ),
            **(
                {"constraints": cur["constraints"]}
                if cur.get("constraints")
                else {}
            ),
            "pruning": {
                "rewritten_files": len(touched),
                "inherited_files": len(inherited_cur),
                **({"rebased": attempts} if attempts else {}),
            },
        }

    def cleanup():
        shutil.rmtree(os.path.join(table, data_dir), ignore_errors=True)

    return _publish_with_rebase(
        table, base, build_manifest,
        rebase_ok=lambda nxt: _pruned_rebase_ok(
            table, base, nxt, touched_set, None,
            None, None, False, True,
        ),
        cleanup=cleanup, rebase=rebase, max_rebase=max_rebase,
    )


def snapshot_compact(
    spark: SparkSession,
    table: str,
    target_rows_per_file: int,
    stats_cols: Sequence[str] = (),
    bloom_cols: Sequence[str] = (),
    rebase: bool = True,
    max_rebase: int = 5,
) -> int:
    """OPTIMIZE analogue: commit a compacted rewrite of the latest
    version (small files from merges/streaming folded into
    evenly-sized ones) as a NEW version — rows identical, history
    intact, old versions readable until vacuumed. ``coalesce`` when
    shrinking (narrow, no shuffle); ``repartition`` only when growing
    the file count (oversized files are being rewritten anyway).

    Concurrency: the rewrite replays onto a winner that left every
    file of this version intact (e.g. an insert-only merge landing
    mid-compaction — its new files are inherited); a winner that
    rewrote or DV-deleted any file conflicts deterministically. For
    compaction that stays disjoint from FILE-REWRITING traffic, use
    ``snapshot_compact_small_files`` (touches only the small-file
    subset)."""
    ms = _manifests(table)
    if not ms:
        raise FileNotFoundError(f"no versions in {table}")
    latest = ms[-1]
    df = snapshot_read(spark, table, version=latest["version"])
    n_rows = df.count()
    n_files = max(1, -(-n_rows // target_rows_per_file))
    n_parts = df.rdd.getNumPartitions()
    if n_files < n_parts:
        df = df.coalesce(n_files)
    elif n_files > n_parts:
        df = df.repartition(n_files)
    return _commit_layout_rewrite(
        spark, table, latest, df, "compact",
        _manifest_files(table, latest), stats_cols, bloom_cols,
        rebase, max_rebase,
    )


def snapshot_compact_small_files(
    spark: SparkSession,
    table: str,
    target_rows_per_file: int,
    stats_cols: Sequence[str] = (),
    bloom_cols: Sequence[str] = (),
    rebase: bool = True,
    max_rebase: int = 5,
) -> int:
    """Incremental OPTIMIZE: fold ONLY the files smaller than
    ``target_rows_per_file`` (by the manifest's cached per-file row
    counts — no footer reads) into evenly-sized ones; every
    full-sized file is inherited by reference, untouched. Returns the
    current version unchanged when fewer than two small files exist
    (nothing to fold).

    This is the OPTIMIZE a 100 TB table actually runs: streaming
    ingest and pruned merges leave a trickle of small files behind,
    and folding just those keeps the rewrite (and therefore the
    conflict FOOTPRINT) proportional to the trickle, not the table —
    a concurrent merge that rewrites a big hot file races DISJOINTLY
    with this commit and both land (the rebase rule in
    ``_commit_layout_rewrite``)."""
    ms = _manifests(table)
    if not ms:
        raise FileNotFoundError(f"no versions in {table}")
    latest = ms[-1]
    files = _manifest_files(table, latest)
    rows_map = latest.get("rows", {})
    dv = latest.get("dv", {})

    def live_rows(rel: str) -> int:
        n = rows_map.get(rel)
        if n is None:
            n = _footer_rows(os.path.join(table, rel))
        return n - dv.get(rel, {}).get("count", 0)

    small = [r for r in files if live_rows(r) < target_rows_per_file]
    if len(small) < 2:
        return latest["version"]
    sset = set(small)
    df = _scan_minus_dv(
        spark,
        table,
        [os.path.join(table, r) for r in small],
        {r: e for r, e in dv.items() if r in sset},
        schema=_schema_for_read(spark, latest),
    )
    n_rows = sum(live_rows(r) for r in small)
    n_files = max(1, -(-n_rows // target_rows_per_file))
    n_parts = df.rdd.getNumPartitions()
    if n_files < n_parts:
        df = df.coalesce(n_files)
    elif n_files > n_parts:
        df = df.repartition(n_files)
    return _commit_layout_rewrite(
        spark, table, latest, df, "compact",
        small, stats_cols, bloom_cols, rebase, max_rebase,
    )


def snapshot_optimize_zorder(
    spark: SparkSession,
    table: str,
    col_a: str,
    col_b: str,
    num_files: int,
    stats_cols: Sequence[str] = (),
    bloom_cols: Sequence[str] = (),
    rebase: bool = True,
    max_rebase: int = 5,
) -> int:
    """OPTIMIZE ZORDER BY as a snapshot commit: rewrite the latest
    version clustered on the Morton interleave of two columns and
    commit it as a NEW version — rows identical, history intact, and
    the manifest caches per-file min/max for BOTH z-columns (plus any
    extra ``stats_cols``), so subsequent pruned merges on EITHER
    column skip files without reopening footers. This is the layout-
    maintenance commit a 100 TB fact table runs periodically so that
    two independent predicate dimensions both data-skip. Races with
    writers that leave this version's files intact (insert-only
    merges) rebase instead of conflicting."""
    from exceldatatransform_py_spark.sources.writers import zorder_frame

    ms = _manifests(table)
    if not ms:
        raise FileNotFoundError(f"no versions in {table}")
    latest = ms[-1]
    df = snapshot_read(spark, table, version=latest["version"])
    zed = zorder_frame(df, col_a, col_b, num_files)
    cols = list(dict.fromkeys([col_a, col_b, *stats_cols]))
    return _commit_layout_rewrite(
        spark, table, latest, zed, "zorder",
        _manifest_files(table, latest), cols, bloom_cols,
        rebase, max_rebase,
    )


def _manifest_files(table: str, manifest: dict) -> list[str]:
    """Data files of one version, as paths relative to the table root.
    File-level manifests (pruned merges) list them explicitly;
    directory-level manifests own every parquet in their data_dir."""
    if "files" in manifest:
        return list(manifest["files"])
    data_dir = os.path.join(table, manifest["data_dir"])
    return sorted(
        os.path.join(manifest["data_dir"], f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )


# ---------------------------------------------------------------------------
# Deletion vectors (merge-on-read deletes): a manifest may carry
# ``"dv": {rel_file: {"dir": "<_dv/v00007-xxxxxxxx>", "count": n}}`` —
# per-file deleted ROW POSITIONS stored in a parquet sidecar instead
# of rewriting the file. Readers subtract them with a position
# anti-join; COUNT(*) subtracts the cached cardinalities;
# compact/merge rewrites materialize them away. This is the Delta/
# Iceberg v2 position-delete design: at 100 TB a one-row delete in a
# hot file writes a KB-sized sidecar instead of rewriting gigabytes.
# ---------------------------------------------------------------------------


def _rel_file_expr():
    """Relative ``data_dir/file.parquet`` path of the scanned row's
    file — manifests always reference files exactly one directory
    below the table root, so the last two path segments ARE the rel
    key used throughout the manifest."""
    return F.regexp_extract(
        F.col("_metadata.file_path"), r"([^/]+/[^/]+)$", 1
    )


def _dv_rows(spark: SparkSession, table: str, dv: dict) -> DataFrame | None:
    """(rel, pos) union of every sidecar directory ``dv`` references,
    broadcast when the manifest's cached cardinalities say it's small.
    Rows for files absent from the current scan are harmless — the
    anti-join key includes the rel path, and rel paths are never
    reused across versions."""
    dirs = sorted({e["dir"] for e in dv.values()})
    if not dirs:
        return None
    rows = spark.read.parquet(
        *[os.path.join(table, d) for d in dirs]
    ).select("rel", "pos")
    total = sum(int(e.get("count", 0)) for e in dv.values())
    return F.broadcast(rows) if total <= _DV_BROADCAST_MAX else rows


def _scan_minus_dv(
    spark: SparkSession, table: str, files: list[str], dv: dict,
    schema=None,
) -> DataFrame:
    """Scan ``files`` (absolute paths) with the deletion vectors of
    ``dv`` subtracted: tag each row with its (rel file, row position)
    from the parquet reader's ``_metadata`` and anti-join the sidecar
    positions. Column set/order of the plain scan is preserved.
    ``schema`` (a StructType carrying ``parquet.field.id`` metadata)
    makes the scan resolve columns BY FIELD ID — files written before
    a column rename read under the current name."""
    reader = spark.read.schema(schema) if schema is not None else spark.read
    scan = reader.parquet(*files)
    rows = _dv_rows(spark, table, dv)
    if rows is None:
        return scan
    cols = scan.columns
    return (
        scan.withColumn("__dv_rel", _rel_file_expr())
        .withColumn("__dv_pos", F.col("_metadata.row_index"))
        .join(
            rows,
            (F.col("__dv_rel") == F.col("rel"))
            & (F.col("__dv_pos") == F.col("pos")),
            "left_anti",
        )
        .select(*cols)
    )


def _point_prune_files(
    spark: SparkSession, table: str, m: dict, rel_files: list[str],
    col: str, values: list,
) -> list[str]:
    """Files of manifest ``m`` that MAY contain a row with ``col`` in
    ``values`` — min/max range test first, then the per-file bloom
    (both sound: false positives scan extra bytes, never wrong rows)."""
    stats = m.get("stats", {})
    blooms = m.get("blooms", {})
    pairs = None
    if any(col in e for e in blooms.values()):
        pf = _literal_probe_frame(spark, m, col, list(values))
        if pf is not None:
            pairs = _bloom_probe_pairs(pf, col)
    out = []
    for rel in rel_files:
        may = True
        cached = stats.get(rel, {}).get(col)
        if cached is not None:
            fmin = _stat_decode(cached[0])
            fmax = _stat_decode(cached[1])
            try:
                may = any(
                    v is not None and fmin <= v <= fmax for v in values
                )
            except TypeError:  # incomparable literal: stay conservative
                may = True
        if may and pairs is not None:
            hexmap = blooms.get(rel, {}).get(col)
            if hexmap is not None and not _bloom_may_contain(hexmap, pairs):
                may = False
        if may:
            out.append(rel)
    return out


def snapshot_read(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    as_of_ts: float | None = None,
    point_filter: tuple[str, list] | None = None,
) -> DataFrame:
    """Read ``table`` at ``version`` (default: latest), or AS OF a
    wall-clock epoch with ``as_of_ts`` — the latest version whose
    commit timestamp is ≤ the given instant (Delta's ``TIMESTAMP AS
    OF``). Time travel is just manifest resolution — no data is ever
    rewritten or copied. Pre-timestamp manifests (older layouts)
    count as ts 0, i.e. visible at any as-of instant.

    ``point_filter=(col, values)`` returns only rows with ``col IN
    values`` (SQL equality: NULL never matches) AND file-skips via
    the manifest's cached min/max stats and per-file blooms — a point
    lookup on a bloom-indexed key reads only the files that may hold
    it, not the table. The filter itself is always applied, so
    results never depend on pruning."""
    ms = _manifests(table)
    if not ms:
        raise FileNotFoundError(f"no versions in {table}")
    by_v = {m["version"]: m for m in ms}
    if version is not None and as_of_ts is not None:
        raise ValueError("pass either version or as_of_ts, not both")
    if as_of_ts is not None:
        eligible = [m["version"] for m in ms if m.get("ts", 0) <= as_of_ts]
        if not eligible:
            raise ValueError(
                f"no version of {table} existed at ts {as_of_ts}"
            )
        v = max(eligible)
    else:
        v = ms[-1]["version"] if version is None else version
    if v not in by_v:
        raise ValueError(f"version {v} not in {sorted(by_v)}")
    m = by_v[v]
    dv = m.get("dv", {})
    # field-id read schema: the version's manifest schema resolves
    # columns by stable id, so files written before a RENAME read
    # under this version's names (and time travel to a pre-rename
    # version reads post-rename files under the OLD names)
    rs = _schema_for_read(spark, m)

    def _plain(files):
        reader = spark.read.schema(rs) if rs is not None else spark.read
        return reader.parquet(*files)

    if point_filter is not None:
        col, values = point_filter
        rels = _point_prune_files(
            spark, table, m, _manifest_files(table, m), col, list(values)
        )
        files = [os.path.join(table, r) for r in rels]
        if not files:
            return spark.createDataFrame(
                [], T.StructType.fromJson(m["schema"])
            )
        scan = (
            _scan_minus_dv(spark, table, files, dv, schema=rs)
            if dv
            else _plain(files)
        )
        return scan.filter(F.col(col).isin(list(values)))
    if "files" not in m:
        files = [os.path.join(table, m["data_dir"])]
    else:
        files = [os.path.join(table, f) for f in m["files"]]
    if not files:  # a merge that touched nothing on an empty table
        return spark.createDataFrame(
            [], T.StructType.fromJson(m["schema"])
        )
    if dv:
        return _scan_minus_dv(spark, table, files, dv, schema=rs)
    return _plain(files)


def snapshot_merge_update(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    on: Sequence[str],
    update_cols: Sequence[str],
    max_retries: int = 0,
    when_not_matched_insert: bool = False,
    when_not_matched_by_source_delete: bool = False,
    evolve_schema: bool = False,
    txn: tuple[str, int] | None = None,
) -> int:
    """MERGE INTO as a snapshot commit: merge ``updates`` into the
    latest version and commit the result as a NEW version — the
    previous version stays readable (audit/rollback), unlike the
    in-place rewrite sink. Returns the new version number.

    Clause surface (``operators.merge.merge_full``): WHEN MATCHED THEN
    UPDATE always runs — the reference's update-only S5 contract
    (``timesheet_transform_v3.py:105`` "we don't create new rows") is
    the default; ``when_not_matched_insert`` adds WHEN NOT MATCHED
    THEN INSERT (unmatched update rows appended, non-merge columns
    NULL) and ``when_not_matched_by_source_delete`` adds WHEN NOT
    MATCHED BY SOURCE THEN DELETE (unmatched target rows dropped) —
    the full three-clause MERGE a general engine needs.

    Optimistic concurrency: the merge reads version P and commits
    P+1 conditionally on P still being latest (create-exclusive
    manifest publish). If another writer got there first the commit
    raises ``SnapshotConflictError`` — no clobber, no lost update —
    and with ``max_retries > 0`` the read-merge-commit is re-run
    against the new latest version (CAS loop); the re-run re-reads the
    winner's rows, so insert/delete decisions are re-taken against the
    state that actually committed.

    ``txn=(app_id, batch_id)`` makes the merge idempotent for
    exactly-once streaming CDC sinks: a replayed micro-batch whose
    (app, batch) the manifest log already records is a no-op — the
    check re-runs inside the CAS loop, so a retry racing its own
    duplicate still applies exactly once."""
    from exceldatatransform_py_spark.operators.merge import merge_full

    for attempt in range(max_retries + 1):
        done = _txn_already_applied(table, txn)
        if done is not None:
            return done
        parent = latest_version(table)
        if parent is None:
            raise FileNotFoundError(f"no versions in {table}")
        current = snapshot_read(spark, table, version=parent)
        merged = merge_full(
            current, updates, on=on, update_cols=update_cols,
            insert=when_not_matched_insert,
            delete_unmatched_target=when_not_matched_by_source_delete,
            evolve_schema=evolve_schema,
        )
        try:
            return _commit(table, merged, "merge_update", parent, txn=txn)
        except SnapshotConflictError:
            if attempt == max_retries:
                raise
    raise AssertionError("unreachable")


def _footer_minmax(path: str, col: str):
    """(min, max) of ``col`` across a parquet file's row groups, read
    from footer statistics — None when any group lacks stats (the
    caller must then treat the file as touched). The footer read is
    the FALLBACK: commits made with ``stats_cols`` cache these in the
    manifest (``_collect_stats``), exactly where Delta/Iceberg keep
    per-file stats, and pruned merges consult the manifest first."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = None
    for i in range(md.num_columns):
        if md.schema.column(i).name == col:
            idx = i
            break
    if idx is None:
        return None
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return None if lo is None else (lo, hi)


#: StructField metadata key Spark's parquet writer/reader use for
#: field-ID matching (``spark.sql.parquet.fieldId.*``).
_FIELD_ID_KEY = "parquet.field.id"


def _schema_field_ids(schema_json: dict) -> dict:
    """{column name: field id or None} from a manifest schema."""
    return {
        f["name"]: (f.get("metadata") or {}).get(_FIELD_ID_KEY)
        for f in schema_json.get("fields", [])
    }


def _max_field_id(table: str) -> int:
    """Highest field id EVER assigned in any version of ``table`` —
    the Iceberg last-column-id: a dropped column's id must never be
    reused (a re-added name with a recycled id would resurrect the
    dropped values from old files). Manifests survive vacuum (only
    data dirs are swept), so the scan is durable.

    This full-history scan is the FALLBACK for pre-r10 manifests:
    commits record ``last_field_id`` (Iceberg's last-column-id field)
    so ``_last_field_id`` reads only the parent's value — without it,
    every commit re-parses every version manifest (rows/stats/bloom
    maps included) and long-lived tables go quadratic in commits."""
    out = 0
    for m in _manifests(table):
        for v in _schema_field_ids(m["schema"]).values():
            if v is not None and v > out:
                out = v
    return out


def _last_field_id(table: str, parent: dict | None = None) -> int:
    """The id floor for new columns: the parent manifest's recorded
    ``last_field_id`` (O(1) — one already-parsed manifest), falling
    back to the full history scan once for tables whose latest commit
    predates the field (the next commit records it)."""
    if parent is None:
        ms = _manifests(table)
        parent = ms[-1] if ms else None
    if parent is None:
        return 0
    lf = parent.get("last_field_id")
    if lf is not None:
        return int(lf)
    return _max_field_id(table)


def _record_last_field_id(manifest: dict, floor: int) -> None:
    """Stamp ``last_field_id`` = max(parent floor, ids in this
    manifest's schema) — monotone across commits, so retired ids are
    never reused even after the column leaves the schema."""
    ids = [
        v for v in _schema_field_ids(manifest["schema"]).values()
        if v is not None
    ]
    manifest["last_field_id"] = max([int(floor), *map(int, ids)])


def _attach_field_ids(
    df: DataFrame, parent: dict | None, floor: int = 0
) -> DataFrame:
    """Attach Iceberg-style stable field IDs to ``df``'s columns as
    ``parquet.field.id`` metadata (Spark writes them into the parquet
    schema; readers with ``fieldId.read.enabled`` then match columns
    BY ID, which is what makes column RENAME a metadata-only commit
    that old files survive).

    IDs are inherited from the parent manifest BY NAME; brand-new
    columns get the next unused id; a brand-new table numbers 1..n. A
    LEGACY parent without ids leaves the frame untouched — its files
    carry no ids, so claiming ids in the manifest would make id-based
    reads of inherited files fail; legacy tables stay name-matched
    end-to-end."""
    if parent is not None:
        pids = _schema_field_ids(parent["schema"])
        if not any(v is not None for v in pids.values()):
            return df
    else:
        pids = {}
    used = [v for v in pids.values() if v is not None]
    nxt = max(max(used, default=0), floor) + 1
    out = []
    for c in df.columns:
        fid = pids.get(c)
        if fid is None:
            fid = nxt
            nxt += 1
        out.append(F.col(c).alias(c, metadata={_FIELD_ID_KEY: int(fid)}))
    df.sparkSession.conf.set(
        "spark.sql.parquet.fieldId.write.enabled", "true"
    )
    return df.select(*out)


def _schema_for_read(spark: SparkSession, m: dict):
    """The explicit read schema for a manifest, or None for legacy
    (name-matched) tables. When ids exist, enable id-based parquet
    column resolution on the session (a no-op for scans whose
    requested schema carries no ids)."""
    st = T.StructType.fromJson(m["schema"])
    if not any(
        f.metadata and f.metadata.get(_FIELD_ID_KEY) is not None
        for f in st.fields
    ):
        return None
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    return st


def _stage_unique(
    table: str, df: DataFrame, version: int, parent: dict | None = None
) -> tuple[str, dict]:
    """Stage a file-level commit's rewritten files under a globally
    UNIQUE directory name — protocol-agnostic (no rename/link:
    object-store-safe) and collision-free under any concurrency, so a
    conflicted file-level commit can REBASE onto the new latest
    without re-staging its parquet. Field IDs are attached from
    ``parent`` (default: the table's latest manifest) before the
    write. Returns ``(data_dir, schema_json)`` — the schema as staged,
    ids included. The manifest's explicit "files" list is
    authoritative; ``vacuum`` sweeps never-published unique dirs past
    the retention horizon."""
    if parent is None:
        ms = _manifests(table)
        parent = ms[-1] if ms else None
    df = _attach_field_ids(df, parent, floor=_last_field_id(table, parent))
    data_dir = f"d{version:05d}-{uuid.uuid4().hex[:8]}"
    df.write.mode("errorifexists").parquet(os.path.join(table, data_dir))
    return data_dir, df.schema.jsonValue()


def _pruned_rebase_ok(
    table: str,
    base: dict,
    cur: dict,
    touched_set: set,
    prune_col: str,
    lo,
    hi,
    nulls_in_updates: bool,
    update_empty: bool,
) -> bool:
    """True iff a pruned commit computed against manifest ``base`` can
    be replayed verbatim onto ``cur`` (a later version that won the
    race) — the disjoint-writer rebase real table formats run instead
    of failing every concurrent commit. Sound conditions:

    * same schema and same CHECK constraints (else semantics changed);
    * every file we rewrote still exists in ``cur`` with identical
      deletion vectors (the winner did not touch our write set);
    * no file the winner ADDED can hold a key matching our updates
      (same stats superset-test as pruning itself — a winner-inserted
      row inside our key range would have needed our update). Files
      the winner merely REMOVED are fine: they drop out of the
      inherited list, and files that survived from ``base`` were
      already proven non-matching by our own pruning pass.
    """
    def sig(m):  # nullability may legally drift across merge commits
        return [
            (f.get("name"), f.get("type"))
            for f in m.get("schema", {}).get("fields", [])
        ]

    if sig(cur) != sig(base):
        return False
    if cur.get("constraints", {}) != base.get("constraints", {}):
        return False
    cur_files = set(_manifest_files(table, cur))
    if not touched_set <= cur_files:
        return False
    bdv, cdv = base.get("dv", {}), cur.get("dv", {})
    if any(bdv.get(r) != cdv.get(r) for r in touched_set):
        return False
    if update_empty:
        return True
    base_files = set(_manifest_files(table, base))
    cur_stats = cur.get("stats", {})
    for rel in cur_files - base_files:
        cached = cur_stats.get(rel, {}).get(prune_col)
        if cached is not None:
            mm = (_stat_decode(cached[0]), _stat_decode(cached[1]))
            nc = cached[2] if len(cached) >= 3 else None
        else:
            mm = _footer_minmax(os.path.join(table, rel), prune_col)
            nc = _footer_nullcount(os.path.join(table, rel), prune_col)
        may_nonnull = lo is not None and (
            mm is None or not (mm[1] < lo or mm[0] > hi)
        )
        may_null = nulls_in_updates and (nc is None or nc > 0)
        if may_nonnull or may_null:
            return False
    return True


def _publish_with_rebase(
    table: str,
    base: dict,
    build_manifest,
    rebase_ok,
    cleanup,
    rebase: bool = True,
    max_rebase: int = 5,
) -> int:
    """Optimistic-concurrency publish loop shared by every file-level
    commit (pruned merge, range/DV delete, compact, zorder): build the
    manifest against ``cur`` (initially ``base``), publish; on a
    version race, if ``rebase_ok(winner)`` proves the winner's commit
    did not interact with ours, rebuild against the winner and retry
    with the SAME staged bytes — else run ``cleanup`` and re-raise.
    ``build_manifest(cur, attempts)`` must derive everything that
    depends on the parent (inherited files, rows, stats, blooms, DVs,
    constraints) from ``cur``, not from ``base``."""
    cur = base
    attempts = 0
    while True:
        manifest = build_manifest(cur, attempts)
        # file-level commits never mint ids, so the parent's recorded
        # last_field_id carries forward (stamped here once for every
        # file-level commit kind rather than in each build_manifest)
        if "last_field_id" not in manifest:
            _record_last_field_id(manifest, _last_field_id(table, cur))
        try:
            _publish(table, manifest)
            return manifest["version"]
        except SnapshotConflictError:
            nxt = _manifests(table)[-1]
            if rebase and attempts < max_rebase and rebase_ok(nxt):
                attempts += 1
                cur = nxt
                continue
            cleanup()
            raise


def snapshot_merge_update_pruned(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    on: Sequence[str],
    update_cols: Sequence[str],
    prune_col: str | None = None,
    when_not_matched_insert: bool = False,
    rebase: bool = True,
    max_rebase: int = 5,
) -> int:
    """File-pruned update-only merge: rewrite ONLY the target files
    whose ``prune_col`` min/max range can overlap the update keys;
    every other file is carried into the new version BY REFERENCE
    (byte-identical, never read, never copied).

    This is the MERGE INTO upgrade path SURVEY §2.1 documents, built
    on the snapshot layer's immutable files: at 100 TB a merge that
    touches one day of a range-clustered fact table
    (``writers.write_range_clustered``) rewrites that day's files and
    commits a manifest, instead of rewriting the table. Pruning is a
    SUPERSET test on footer stats (files overlapping the update-key
    bounds may still contain no matches — they rewrite unchanged;
    files outside the bounds provably cannot match, since equality on
    ``prune_col`` — default: the first merge key — is necessary for a
    row to match). Files without usable stats are conservatively
    rewritten.

    Semantics are identical to ``snapshot_merge_update`` (J2/J3:
    matched rows get ``update_cols`` overwritten, unmatched target
    rows untouched, unmatched updates discarded); only the physical
    rewrite set differs. Row order within the table may differ — the
    table contract is set-of-rows, as for any Spark parquet write.
    NULL merge keys are handled NULL-safely like the full-read merge
    (eqNullSafe: NULL matches NULL) — min/max stats are blind to
    NULLs, so when the update side carries NULL ``prune_col`` values
    the NULL-carrying files are found through the per-file NULL COUNT
    the manifest caches next to min/max ([lo, hi, null_count]): a file
    is rewritten iff it overlaps the non-NULL bounds OR may hold NULL
    keys (null_count > 0, or unknown — pre-upgrade 2-element stats and
    stat-less footers stay conservatively safe).

    ``when_not_matched_insert`` adds the INSERT clause and stays
    file-pruned: an update row that matches ANY target row must match
    inside a touched file (its prune value sits in that file's
    min/max range, so the file overlaps the update bounds), hence
    updates unmatched against the touched subset are provably
    unmatched against the whole table and land as insert rows in the
    new files. WHEN NOT MATCHED BY SOURCE DELETE is deliberately NOT
    offered here: deciding "matches no update row" requires inspecting
    every target row, so every file is touched and pruning degenerates
    — use ``snapshot_merge_update`` (full read) for deletes.

    Concurrency: with ``rebase`` (default), a commit that loses the
    version race is REPLAYED onto the winner's version when the two
    commits provably did not interact — same schema/constraints, the
    winner didn't touch any file this merge rewrote, and no
    winner-added file can hold a matching key (``_pruned_rebase_ok``)
    — so disjoint-key writers all succeed without re-running the
    merge, the resolution real table formats run. Interacting writers
    still get ``SnapshotConflictError`` deterministically (re-run the
    merge to retry against the new state). ``max_rebase`` bounds the
    replay attempts under a commit storm.
    """
    prune_col = prune_col or on[0]
    if prune_col not in on:
        raise ValueError(
            f"prune_col {prune_col!r} must be one of the merge keys {on}"
        )
    ms = _manifests(table)
    if not ms:
        raise FileNotFoundError(f"no versions in {table}")
    latest = ms[-1]
    files = _manifest_files(table, latest)
    bounds = updates.agg(
        F.min(prune_col).alias("lo"),
        F.max(prune_col).alias("hi"),
        F.count(F.lit(1)).alias("n"),
        F.count(prune_col).alias("n_nonnull"),
    ).first()
    lo, hi = bounds["lo"], bounds["hi"]
    update_empty = bounds["n"] == 0
    # min/max ignore NULLs, but merge_full/merge_update join with
    # eqNullSafe (NULL keys MATCH NULL keys). A NULL-keyed update row
    # is invisible to min/max pruning, so when any exist every file
    # must be treated as potentially matched — pruning soundly
    # degenerates to the full-read merge instead of silently dropping
    # the NULL-keyed updates (or re-inserting them as duplicates).
    nulls_in_updates = bounds["n"] > bounds["n_nonnull"]

    cached_stats = latest.get("stats", {})
    blooms = latest.get("blooms", {})
    # per-file bloom consultation for point-ish key sets: only pay
    # the probe-key collection when at least one file carries a bloom
    # on the prune column
    probe_pairs = None
    if not update_empty and any(prune_col in e for e in blooms.values()):
        probe_pairs = _bloom_probe_pairs(updates, prune_col)

    def file_minmax(rel: str):
        cached = cached_stats.get(rel, {}).get(prune_col)
        if cached is not None:
            return _stat_decode(cached[0]), _stat_decode(cached[1])
        return _footer_minmax(os.path.join(table, rel), prune_col)

    def file_nullcount(rel: str) -> int | None:
        cached = cached_stats.get(rel, {}).get(prune_col)
        if cached is not None and len(cached) >= 3:
            return cached[2]  # may be None (unknown at commit time)
        return _footer_nullcount(os.path.join(table, rel), prune_col)

    touched: list[str] = []
    inherited: list[str] = []
    file_stats: dict = {}
    for rel in files:
        mm = file_minmax(rel)
        nc = file_nullcount(rel)
        if mm is not None:
            lo_e, hi_e = _stat_encode(mm[0]), _stat_encode(mm[1])
            if lo_e is not None and hi_e is not None:
                file_stats[rel] = dict(
                    cached_stats.get(rel, {}),
                    **{prune_col: [lo_e, hi_e, nc]},
                )
        if update_empty:  # empty update set: nothing can match
            inherited.append(rel)
            continue
        # a file must be rewritten iff it MAY hold a matching row:
        # (a) a non-NULL key inside the updates' non-NULL bounds —
        #     unknown ranges (mm is None) count as possible; or
        # (b) a NULL key while NULL-keyed updates exist (eqNullSafe
        #     matches NULL to NULL; min/max never sees NULLs) —
        #     unknown null counts (nc is None) count as possible.
        may_match_nonnull = lo is not None and (
            mm is None or not (mm[1] < lo or mm[0] > hi)
        )
        # bloom refinement: a file inside the range bounds may still
        # provably hold NONE of the probed keys (false negatives are
        # impossible, so skipping it is sound)
        if may_match_nonnull and probe_pairs is not None:
            hexmap = blooms.get(rel, {}).get(prune_col)
            if hexmap is not None and not _bloom_may_contain(
                hexmap, probe_pairs
            ):
                may_match_nonnull = False
        may_match_null = nulls_in_updates and (nc is None or nc > 0)
        if may_match_nonnull or may_match_null:
            touched.append(rel)
        else:
            inherited.append(rel)

    data_dir: str | None = None
    new_files: list[str] = []
    # A write is needed when files must be rewritten, or when INSERT
    # has unmatched rows to land (explicit emptiness check — `lo is
    # None` also holds for a NON-empty all-NULL-key update set, which
    # absolutely must be merged).
    need_write = bool(touched) or (when_not_matched_insert and not update_empty)
    parent_dv = latest.get("dv", {})
    if need_write:
        if touched:
            # deletion vectors on touched files apply BEFORE the merge
            # (a DV-deleted row is not in the table, so it must not
            # match) — the rewrite then materializes them away.
            tset = set(touched)
            target = _scan_minus_dv(
                spark,
                table,
                [os.path.join(table, r) for r in touched],
                {r: e for r, e in parent_dv.items() if r in tset},
                schema=_schema_for_read(spark, latest),
            )
        else:  # insert-only commit: nothing matched, nothing rewritten
            target = spark.createDataFrame(
                [], T.StructType.fromJson(latest["schema"])
            )
        if when_not_matched_insert:
            from exceldatatransform_py_spark.operators.merge import merge_full

            merged = merge_full(
                target, updates, on=on, update_cols=update_cols, insert=True
            )
        else:
            merged = merge_update(
                target, updates, on=on, update_cols=update_cols
            )
        # inherited CHECK constraints guard the rewritten rows (the
        # inherited files were validated at their own commits)
        _validate_constraints(merged, latest.get("constraints", {}))
        # unique staging: collision-free under concurrency, so a
        # rebase replays the SAME staged files at a later version
        data_dir, staged_schema = _stage_unique(
            table, merged, latest["version"] + 1, parent=latest
        )
        new_files = sorted(
            os.path.join(data_dir, f)
            for f in os.listdir(os.path.join(table, data_dir))
            if f.endswith(".parquet")
        )
        # fresh stats for the rewritten files, so the NEXT merge on
        # this column prunes from the manifest alone
        file_stats.update(_collect_stats(table, new_files, [prune_col]))
        for rel in touched:
            file_stats.pop(rel, None)  # no longer part of the table
    schema = staged_schema if need_write else latest["schema"]
    import time as _t

    new_rows = _collect_rows(table, new_files)
    # keep the bloom index live across merges: rewritten files get
    # fresh blooms whenever the parent carried any on this column
    fresh_blooms = (
        _collect_blooms(spark, table, new_files, [prune_col])
        if new_files and any(prune_col in e for e in blooms.values())
        else {}
    )
    touched_set = set(touched)

    def build_manifest(cur: dict, attempts: int) -> dict:
        v = cur["version"] + 1
        inherited_cur = [
            r for r in _manifest_files(table, cur) if r not in touched_set
        ]
        iset = set(inherited_cur)
        cur_rows = cur.get("rows", {})
        cur_stats = cur.get("stats", {})
        cur_dv = cur.get("dv", {})
        cur_blooms = cur.get("blooms", {})
        blooms_out = {
            r: cur_blooms[r] for r in inherited_cur if r in cur_blooms
        }
        blooms_out.update(fresh_blooms)
        # per-file stats: the winner's refreshed entries merged with
        # the ones this merge computed (bytes are immutable, so both
        # are valid; union per column)
        stats_out: dict = {}
        for r in inherited_cur:
            st = dict(cur_stats.get(r, {}), **file_stats.get(r, {}))
            if st:
                stats_out[r] = st
        for r in new_files:
            if r in file_stats:
                stats_out[r] = file_stats[r]
        manifest = {
            "version": v,
            # metadata-only commits (nothing rewritten) reference the
            # parent's dir — the "files" list is authoritative anyway
            "data_dir": data_dir if data_dir is not None else cur["data_dir"],
            "files": new_files + inherited_cur,
            "rows": {
                **{r: cur_rows[r] for r in inherited_cur if r in cur_rows},
                **new_rows,
            },
            "kind": "merge_update_pruned",
            "parent": cur["version"],
            "ts": _t.time(),
            "schema": schema,
            "stats": stats_out,
            **({"blooms": blooms_out} if blooms_out else {}),
            # inherited files keep their deletion vectors; touched
            # files' DVs were applied during the read and are gone
            **(
                {"dv": {r: e for r, e in cur_dv.items() if r in iset}}
                if any(r in iset for r in cur_dv)
                else {}
            ),
            **(
                {"constraints": cur["constraints"]}
                if cur.get("constraints")
                else {}
            ),
            "pruning": {
                "col": prune_col,
                "rewritten_files": len(touched),
                "inherited_files": len(inherited_cur),
                **({"rebased": attempts} if attempts else {}),
            },
        }
        return manifest

    def cleanup():
        if need_write:
            shutil.rmtree(os.path.join(table, data_dir), ignore_errors=True)

    # disjoint-commit resolution: a writer that loses the version race
    # replays the SAME staged files onto the winner when the winner's
    # commit provably didn't interact with ours (_pruned_rebase_ok).
    return _publish_with_rebase(
        table, latest, build_manifest,
        rebase_ok=lambda nxt: _pruned_rebase_ok(
            table, latest, nxt, touched_set, prune_col,
            lo, hi, nulls_in_updates, update_empty,
        ),
        cleanup=cleanup, rebase=rebase, max_rebase=max_rebase,
    )


def snapshot_delete_range(
    spark: SparkSession,
    table: str,
    col: str,
    lo,
    hi,
    extra_predicate: str | None = None,
    rebase: bool = True,
    max_rebase: int = 5,
) -> int:
    """File-pruned DELETE FROM: remove rows with ``col BETWEEN lo AND
    hi`` (optionally further narrowed by ``extra_predicate``, a SQL
    boolean) by rewriting ONLY the files whose ``col`` min/max range
    overlaps [lo, hi]; every other file is inherited by reference —
    the GDPR-purge / partition-retire commit. NULL ``col`` values
    never match a BETWEEN, so NULL-carrying rows are only ever
    RETAINED and min/max pruning (NULL-blind) stays sound — unlike
    the pruned merge, no NULL fallback is needed.

    At 100 TB: deleting one day from a range-clustered fact table
    rewrites that day's files (minus the deleted rows — a file left
    empty simply drops out) and commits a manifest. Rows that survive
    in rewritten files are preserved byte-exactly as data, and the
    commit inherits/enforces CHECK constraints like every other."""
    ms = _manifests(table)
    if not ms:
        raise FileNotFoundError(f"no versions in {table}")
    latest = ms[-1]
    files = _manifest_files(table, latest)
    cached_stats = latest.get("stats", {})
    blooms = latest.get("blooms", {})
    # a POINT delete (lo == hi) consults per-file blooms: on an
    # unclustered key every file's min/max range covers the key, but
    # the bloom rules out files that provably don't hold it
    probe_pairs = None
    if lo == hi and any(col in e for e in blooms.values()):
        pf = _literal_probe_frame(spark, latest, col, [lo])
        if pf is not None:
            probe_pairs = _bloom_probe_pairs(pf, col)

    def file_minmax(rel: str):
        cached = cached_stats.get(rel, {}).get(col)
        if cached is not None:
            return _stat_decode(cached[0]), _stat_decode(cached[1])
        return _footer_minmax(os.path.join(table, rel), col)

    touched: list[str] = []
    inherited: list[str] = []
    file_stats: dict = {}
    for rel in files:
        mm = file_minmax(rel)
        if mm is not None:
            lo_e, hi_e = _stat_encode(mm[0]), _stat_encode(mm[1])
            if lo_e is not None and hi_e is not None:
                cached = cached_stats.get(rel, {}).get(col)
                nc = (
                    cached[2] if cached is not None and len(cached) >= 3
                    else _footer_nullcount(os.path.join(table, rel), col)
                )
                file_stats[rel] = dict(
                    cached_stats.get(rel, {}), **{col: [lo_e, hi_e, nc]}
                )
        if mm is None:  # no stats: may hold matches — rewrite
            may = True
        else:
            fmin, fmax = mm
            may = not (fmax < lo or fmin > hi)
        if may and probe_pairs is not None:
            hexmap = blooms.get(rel, {}).get(col)
            if hexmap is not None and not _bloom_may_contain(
                hexmap, probe_pairs
            ):
                may = False
        (touched if may else inherited).append(rel)

    parent_dv = latest.get("dv", {})
    data_dir: str | None = None
    new_files: list[str] = []
    if touched:
        # rows already DV-deleted must not re-enter the rewrite
        tset = set(touched)
        target = _scan_minus_dv(
            spark,
            table,
            [os.path.join(table, r) for r in touched],
            {r: e for r, e in parent_dv.items() if r in tset},
            schema=_schema_for_read(spark, latest),
        )
        doomed = F.col(col).between(F.lit(lo), F.lit(hi))
        if extra_predicate is not None:
            doomed = doomed & F.coalesce(
                F.expr(extra_predicate), F.lit(False)
            )
        kept = target.filter(~F.coalesce(doomed, F.lit(False)))
        _validate_constraints(kept, latest.get("constraints", {}))
        # unique staging: collision-free under concurrency, so a
        # conflicted delete can rebase its staged files verbatim
        data_dir, _ = _stage_unique(
            table, kept, latest["version"] + 1, parent=latest
        )
        new_files = sorted(
            os.path.join(data_dir, f)
            for f in os.listdir(os.path.join(table, data_dir))
            if f.endswith(".parquet")
        )
        file_stats.update(_collect_stats(table, new_files, [col]))
        for rel in touched:
            file_stats.pop(rel, None)
    import time as _t

    fresh_blooms = (
        _collect_blooms(spark, table, new_files, [col])
        if new_files and any(col in e for e in blooms.values())
        else {}
    )
    new_rows = _collect_rows(table, new_files)
    touched_set = set(touched)

    def build_manifest(cur: dict, attempts: int) -> dict:
        inherited_cur = [
            r for r in _manifest_files(table, cur) if r not in touched_set
        ]
        iset = set(inherited_cur)
        cur_rows = cur.get("rows", {})
        cur_stats = cur.get("stats", {})
        cur_dv = cur.get("dv", {})
        cur_blooms = cur.get("blooms", {})
        blooms_out = {
            r: cur_blooms[r] for r in inherited_cur if r in cur_blooms
        }
        blooms_out.update(fresh_blooms)
        stats_out: dict = {}
        for r in inherited_cur:
            st = dict(cur_stats.get(r, {}), **file_stats.get(r, {}))
            if st:
                stats_out[r] = st
        for r in new_files:
            if r in file_stats:
                stats_out[r] = file_stats[r]
        return {
            "version": cur["version"] + 1,
            "data_dir": (
                data_dir if data_dir is not None else cur["data_dir"]
            ),
            "files": new_files + inherited_cur,
            "rows": {
                **{r: cur_rows[r] for r in inherited_cur if r in cur_rows},
                **new_rows,
            },
            **({"blooms": blooms_out} if blooms_out else {}),
            "kind": "delete_range",
            "parent": cur["version"],
            "ts": _t.time(),
            "schema": cur["schema"],
            "stats": stats_out,
            **(
                {"dv": {r: e for r, e in cur_dv.items() if r in iset}}
                if any(r in iset for r in cur_dv)
                else {}
            ),
            "pruning": {
                "col": col,
                "rewritten_files": len(touched),
                "inherited_files": len(inherited_cur),
                **({"rebased": attempts} if attempts else {}),
            },
            **(
                {"constraints": cur["constraints"]}
                if cur.get("constraints")
                else {}
            ),
        }

    def cleanup():
        if data_dir is not None:
            shutil.rmtree(os.path.join(table, data_dir), ignore_errors=True)

    # disjoint-commit resolution: the delete replays onto a winner
    # that (a) left every file it rewrote intact with identical DVs
    # and (b) added no file that may hold keys in [lo, hi] — a
    # winner-inserted row in the delete range would have needed this
    # delete, so that race conflicts deterministically. NULL keys
    # never match a BETWEEN, so the NULL-side test is moot
    # (nulls_in_updates=False); update_empty=False keeps the
    # winner-added-file check live even for a no-op delete.
    return _publish_with_rebase(
        table, latest, build_manifest,
        rebase_ok=lambda nxt: _pruned_rebase_ok(
            table, latest, nxt, touched_set, col,
            lo, hi, False, False,
        ),
        cleanup=cleanup, rebase=rebase, max_rebase=max_rebase,
    )


def snapshot_delete_dv(
    spark: SparkSession,
    table: str,
    col: str,
    lo,
    hi,
    extra_predicate: str | None = None,
    rebase: bool = True,
    max_rebase: int = 5,
) -> int:
    """Merge-on-read DELETE FROM via deletion vectors: remove rows
    with ``col BETWEEN lo AND hi`` (optionally narrowed by
    ``extra_predicate``) by recording their (file, row-position)
    pairs in a parquet sidecar — **zero data files are rewritten**.
    Readers (``snapshot_read``) subtract the positions with an
    anti-join; ``snapshot_count`` subtracts the cached cardinalities
    (still no Spark job); a later ``snapshot_compact`` / full merge
    materializes the deletes away because its rewrite reads through
    the DV-aware path.

    The rewrite-amplification fix for the copy-on-write
    ``snapshot_delete_range``: at 100 TB, a one-row GDPR delete in a
    hot file writes a KB-sized sidecar instead of rewriting
    gigabytes. Min/max pruning narrows the position SCAN to
    overlapping files exactly as the copy-on-write path does (NULL
    keys never match a BETWEEN, so the NULL-blind stats stay sound);
    CHECK constraints need no re-validation — a delete only removes
    rows, and every surviving row was validated at its own commit.

    Consolidation: touched files that already carry deletion vectors
    get ONE fresh sidecar holding old ∪ new positions (exact
    cardinalities, no double counting); untouched files inherit their
    parent entries by reference."""
    ms = _manifests(table)
    if not ms:
        raise FileNotFoundError(f"no versions in {table}")
    latest = ms[-1]
    files = _manifest_files(table, latest)
    cached_stats = latest.get("stats", {})
    parent_dv = latest.get("dv", {})
    blooms = latest.get("blooms", {})
    probe_pairs = None
    if lo == hi and any(col in e for e in blooms.values()):
        pf = _literal_probe_frame(spark, latest, col, [lo])
        if pf is not None:
            probe_pairs = _bloom_probe_pairs(pf, col)

    def file_minmax(rel: str):
        cached = cached_stats.get(rel, {}).get(col)
        if cached is not None:
            return _stat_decode(cached[0]), _stat_decode(cached[1])
        return _footer_minmax(os.path.join(table, rel), col)

    touched: list[str] = []
    file_stats: dict = dict(cached_stats)
    for rel in files:
        mm = file_minmax(rel)
        if mm is not None and col not in cached_stats.get(rel, {}):
            lo_e, hi_e = _stat_encode(mm[0]), _stat_encode(mm[1])
            if lo_e is not None and hi_e is not None:
                nc = _footer_nullcount(os.path.join(table, rel), col)
                file_stats[rel] = dict(
                    cached_stats.get(rel, {}), **{col: [lo_e, hi_e, nc]}
                )
        may = mm is None or not (mm[1] < lo or mm[0] > hi)
        if may and probe_pairs is not None:
            hexmap = blooms.get(rel, {}).get(col)
            if hexmap is not None and not _bloom_may_contain(
                hexmap, probe_pairs
            ):
                may = False
        if may:
            touched.append(rel)

    v = latest["version"] + 1
    import time as _t

    new_dv = dict(parent_dv)
    dv_dir: str | None = None
    n_dv_files = 0
    if touched:
        # positions to delete, computed ONLY over overlapping files;
        # parent DV rows for those files are folded in (union) so the
        # fresh sidecar is each touched file's COMPLETE deletion
        # vector and cardinalities never double-count.
        doomed = F.col(col).between(F.lit(lo), F.lit(hi))
        if extra_predicate is not None:
            doomed = doomed & F.coalesce(
                F.expr(extra_predicate), F.lit(False)
            )
        _rs = _schema_for_read(spark, latest)
        scan = (
            spark.read.schema(_rs) if _rs is not None else spark.read
        ).parquet(*[os.path.join(table, r) for r in touched])
        hits = (
            scan.withColumn("rel", _rel_file_expr())
            .withColumn("pos", F.col("_metadata.row_index"))
            .filter(F.coalesce(doomed, F.lit(False)))
            .select("rel", "pos")
        )
        old = {r: e for r, e in parent_dv.items() if r in set(touched)}
        old_rows = _dv_rows(spark, table, old)
        if old_rows is not None:
            tset = list(old)
            prior = old_rows.filter(F.col("rel").isin(tset))
            merged = hits.join(
                prior, ["rel", "pos"], "left_anti"
            ).unionByName(prior)
        else:
            merged = hits
        counts = {
            r["rel"]: int(r["n"])
            for r in merged.groupBy("rel")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        total = sum(counts.values())
        if counts:
            dv_dir = os.path.join(
                _DVDIR, f"v{v:05d}-{uuid.uuid4().hex[:8]}"
            )
            n_out = max(1, total // 4_000_000)
            merged.repartition(n_out, "rel").write.mode(
                "errorifexists"
            ).parquet(os.path.join(table, dv_dir))
            for rel in touched:
                if rel in counts:
                    new_dv[rel] = {"dir": dv_dir, "count": counts[rel]}
                else:
                    new_dv.pop(rel, None)
            n_dv_files = sum(1 for rel in touched if rel in counts)

    # per-touched-file DV outcome (None = entry removed): applied on
    # top of whichever parent the commit finally lands on — sound
    # because the rebase check requires the winner to have left every
    # touched file's bytes AND its DV entry exactly as we read them.
    touched_set = set(touched)
    dv_touched = {rel: new_dv.get(rel) for rel in touched}

    def build_manifest(cur: dict, attempts: int) -> dict:
        cur_files = _manifest_files(table, cur)
        cur_rows = cur.get("rows", {})
        cur_stats = cur.get("stats", {})
        cur_blooms = cur.get("blooms", {})
        dv_out = dict(cur.get("dv", {}))
        for rel, entry in dv_touched.items():
            if entry is None:
                dv_out.pop(rel, None)
            else:
                dv_out[rel] = entry
        stats_out = {
            r: dict(cur_stats.get(r, {}), **file_stats.get(r, {}))
            for r in cur_files
            if cur_stats.get(r) or file_stats.get(r)
        }
        manifest = {
            "version": cur["version"] + 1,
            "data_dir": cur["data_dir"],
            "files": list(cur_files),
            "rows": {
                r: cur_rows[r]
                if r in cur_rows
                else _footer_rows(os.path.join(table, r))
                for r in cur_files
            },
            "kind": "delete_dv",
            "parent": cur["version"],
            "ts": _t.time(),
            "schema": cur["schema"],
            "stats": stats_out,
            # blooms stay valid as supersets after a merge-on-read
            # delete
            **({"blooms": cur_blooms} if cur_blooms else {}),
            "pruning": {
                "col": col,
                "rewritten_files": 0,
                "dv_files": n_dv_files,
                "scanned_files": len(touched),
                "inherited_files": len(cur_files) - len(touched),
                **({"rebased": attempts} if attempts else {}),
            },
            **(
                {"constraints": cur["constraints"]}
                if cur.get("constraints")
                else {}
            ),
        }
        if dv_out:
            manifest["dv"] = dv_out
        return manifest

    def cleanup():
        if dv_dir is not None:
            shutil.rmtree(os.path.join(table, dv_dir), ignore_errors=True)

    # disjoint-commit resolution: two concurrent DV deletes (or a DV
    # delete racing a pruned merge) both commit when the winner (a)
    # kept every file this delete scanned, bytes and DV entry intact
    # — our fresh sidecar consolidates old ∪ new positions, so a
    # winner-modified DV on a touched file would be silently dropped
    # — and (b) added no file that may hold keys in [lo, hi] (a
    # winner-inserted row in the delete range would have needed this
    # delete). Files the winner touched that we only INHERIT are fine:
    # dv_out starts from the winner's map.
    return _publish_with_rebase(
        table, latest, build_manifest,
        rebase_ok=lambda nxt: _pruned_rebase_ok(
            table, latest, nxt, touched_set, col,
            lo, hi, False, False,
        ),
        cleanup=cleanup, rebase=rebase, max_rebase=max_rebase,
    )


def _schema_commit_sig(m: dict):
    """(schema fields incl. ids, constraints) — what a metadata-only
    commit's validity depends on. A winner with the SAME signature
    provably didn't interact with a rename/drop, so the loser replays
    onto it instead of aborting."""
    return (
        [
            (
                f.get("name"),
                f.get("type"),
                (f.get("metadata") or {}).get(_FIELD_ID_KEY),
            )
            for f in m.get("schema", {}).get("fields", [])
        ],
        m.get("constraints", {}),
    )


def _metadata_commit(
    table: str,
    latest: dict,
    mutate,
    kind: str,
    txn: tuple[str, int] | None,
    rebase: bool,
    max_rebase: int,
) -> int:
    """Shared publish loop for metadata-only commits (rename / drop):
    build the manifest from whichever parent the commit finally lands
    on, replaying onto winners whose schema and constraints are
    unchanged (a disjoint pruned merge / DV delete / compact racing a
    rename is file-level traffic the rename provably doesn't interact
    with — aborting it was the r9 gap). A winner that itself changed
    the schema or constraints conflicts deterministically — UNLESS
    the winner was a concurrent replay of the SAME ``txn`` (two
    drains replaying one source rename both pass the upfront ledger
    check; the loser's rebase_ok fails because the winner changed the
    schema): the loser re-checks the ledger and returns the winner's
    version instead of surfacing a spurious conflict."""
    import copy
    import time as _t

    def build_manifest(cur: dict, attempts: int) -> dict:
        manifest = copy.deepcopy(cur)
        # a deepcopied parent drags along commit-specific keys that
        # would lie about THIS commit (the parent's txn would corrupt
        # the idempotence ledger; its pruning/rename/drop describe
        # the parent's work)
        for k in ("txn", "pruning", "rename", "drop", "rebased"):
            manifest.pop(k, None)
        mutate(manifest)
        manifest.update(
            version=cur["version"] + 1,
            kind=kind,
            parent=cur["version"],
            ts=_t.time(),
        )
        if txn is not None:
            manifest["txn"] = {"app": txn[0], "batch": int(txn[1])}
        if attempts:
            manifest["rebased"] = attempts
        _record_last_field_id(manifest, _last_field_id(table, cur))
        return manifest

    try:
        return _publish_with_rebase(
            table, latest, build_manifest,
            rebase_ok=lambda nxt: (
                _schema_commit_sig(nxt) == _schema_commit_sig(latest)
            ),
            cleanup=lambda: None, rebase=rebase, max_rebase=max_rebase,
        )
    except SnapshotConflictError:
        done = _txn_already_applied(table, txn)
        if done is not None:
            return done
        raise


def snapshot_rename_column(
    table: str,
    old: str,
    new: str,
    txn: tuple[str, int] | None = None,
    rebase: bool = True,
    max_rebase: int = 5,
) -> int:
    """RENAME COLUMN as a metadata-only commit (Delta/Iceberg
    semantics, backed by stable field IDs): the manifest's schema
    field changes NAME but keeps its ``parquet.field.id``, the file
    set / deletion vectors / row counts are untouched, and the
    per-file stats and bloom entries are re-keyed to the new name so
    pruning keeps working. Readers resolve parquet columns by id
    (``_schema_for_read``), so every pre-rename file reads under the
    new name; time travel to a pre-rename version still shows the old
    name (each version owns its schema); the change feed across the
    rename is empty (no rows changed) and later steps emit the
    current names.

    Requires a field-id table (any table created by this engine);
    legacy id-less tables cannot rename safely — their files only
    match by name — and get a clear error instead of silent NULLs.

    Concurrency: a rename losing the version race to a writer that
    did NOT change the schema or constraints (pruned merge, DV
    delete, compaction — file-level traffic) REBASES onto the winner
    (re-keying the winner's stats/blooms) instead of aborting; a
    winner that widened/renamed/dropped conflicts deterministically.
    ``txn`` makes the commit idempotent for replication ledgers, like
    every data commit."""
    import re as _re

    done = _txn_already_applied(table, txn)
    if done is not None:
        return done
    ms = _manifests(table)
    if not ms:
        raise FileNotFoundError(f"no versions in {table}")
    latest = ms[-1]
    names = [f["name"] for f in latest["schema"]["fields"]]
    if old not in names:
        raise ValueError(f"column {old!r} not in {names}")
    if new in names:
        raise ValueError(f"column {new!r} already exists")
    ids = _schema_field_ids(latest["schema"])
    if ids.get(old) is None:
        raise ValueError(
            f"table {table} has no field ids on {old!r} — a legacy "
            "id-less table cannot rename columns safely (its files "
            "match by name only)"
        )
    for cname, cond in (latest.get("constraints") or {}).items():
        if _re.search(rf"\b{_re.escape(old)}\b", cond):
            raise ValueError(
                f"CHECK constraint {cname!r} ({cond!r}) references "
                f"{old!r}; drop it (constraints={{}}) and re-add it "
                "under the new name before renaming"
            )

    def mutate(manifest: dict) -> None:
        for f in manifest["schema"]["fields"]:
            if f["name"] == old:
                f["name"] = new
        for per_file in (
            manifest.get("stats", {}), manifest.get("blooms", {})
        ):
            for entry in per_file.values():
                if old in entry:
                    entry[new] = entry.pop(old)
        manifest["rename"] = {"from": old, "to": new}

    return _metadata_commit(
        table, latest, mutate, "rename_column", txn, rebase, max_rebase
    )


def snapshot_drop_column(
    table: str,
    col: str,
    txn: tuple[str, int] | None = None,
    rebase: bool = True,
    max_rebase: int = 5,
) -> int:
    """DROP COLUMN as a metadata-only commit (the rename's companion,
    same stable-field-id foundation): the column leaves the manifest
    schema — zero data bytes rewritten; readers project it away
    because every scan requests the manifest schema explicitly — and
    its per-file stats/bloom entries are dropped. The physical bytes
    linger in existing files until the next rewrite/compaction, like
    Delta/Iceberg drops.

    The id mechanism gives the Iceberg resurrection guarantee for
    free: a LATER column with the same name gets a FRESH field id
    (``_attach_field_ids`` inherits by name from the parent, and the
    parent no longer has the name), so id-based reads NULL-fill old
    files instead of resurrecting the dropped values.

    Guards mirror the rename's: the last column cannot be dropped,
    CHECK constraints referencing the column must be dropped first,
    and legacy id-less tables refuse (their name-matched readers
    WOULD resurrect a re-added name). Concurrency and ``txn`` follow
    the rename's contract (rebase onto schema-preserving winners)."""
    import re as _re

    done = _txn_already_applied(table, txn)
    if done is not None:
        return done
    ms = _manifests(table)
    if not ms:
        raise FileNotFoundError(f"no versions in {table}")
    latest = ms[-1]
    names = [f["name"] for f in latest["schema"]["fields"]]
    if col not in names:
        raise ValueError(f"column {col!r} not in {names}")
    if len(names) == 1:
        raise ValueError("cannot drop the last column")
    if _schema_field_ids(latest["schema"]).get(col) is None:
        raise ValueError(
            f"table {table} has no field ids on {col!r} — a legacy "
            "id-less table cannot drop columns safely (a re-added "
            "name would resurrect the old values)"
        )
    for cname, cond in (latest.get("constraints") or {}).items():
        if _re.search(rf"\b{_re.escape(col)}\b", cond):
            raise ValueError(
                f"CHECK constraint {cname!r} ({cond!r}) references "
                f"{col!r}; drop it (constraints={{}}) before dropping "
                "the column"
            )
    def mutate(manifest: dict) -> None:
        manifest["schema"]["fields"] = [
            f for f in manifest["schema"]["fields"] if f["name"] != col
        ]
        for per_file in (
            manifest.get("stats", {}), manifest.get("blooms", {})
        ):
            for entry in per_file.values():
                entry.pop(col, None)
        manifest["drop"] = {"column": col}

    return _metadata_commit(
        table, latest, mutate, "drop_column", txn, rebase, max_rebase
    )


def snapshot_set_constraints(
    spark: SparkSession,
    table: str,
    constraints: dict,
    validate: bool = True,
    max_retries: int = 0,
    txn: tuple[str, int] | None = None,
) -> int:
    """ALTER TABLE ADD/DROP CONSTRAINT as a METADATA-ONLY commit
    (Delta's contract): the new constraint set replaces the manifest's
    (``{}`` drops all), existing data is validated against it with ONE
    scan of the current version (exactly what Delta's ADD CONSTRAINT
    pays) and ZERO data files are rewritten — the previous path was a
    full-table ``snapshot_write`` re-commit. Every later commit
    (merges included) then validates against the new set before
    staging, and a pruned commit racing this one conflicts
    deterministically (``_pruned_rebase_ok`` compares constraint
    sets — its rows were never validated against the new rules).

    Concurrency: losing the version race re-reads, RE-VALIDATES the
    winner's rows (a winner may have inserted rows the new constraint
    forbids — replaying without re-validation would corrupt the
    guarantee, so this is a CAS retry, not a blind rebase), and
    retries up to ``max_retries`` times. ``validate=False`` skips the
    scan — for CDC replication replaying a set already proven on
    row-identical data. ``txn`` gives the commit an idempotence
    ledger entry like every other replicated commit."""
    import copy
    import time as _t

    constraints = dict(constraints)
    for attempt in range(max_retries + 1):
        done = _txn_already_applied(table, txn)
        if done is not None:
            return done
        latest = _latest_manifest(table)
        if latest is None:
            raise FileNotFoundError(f"no versions in {table}")
        if validate and constraints:
            _validate_constraints(
                snapshot_read(spark, table, version=latest["version"]),
                constraints,
            )
        manifest = copy.deepcopy(latest)
        for k in ("txn", "pruning", "rename", "drop", "rebased",
                  "constraints"):
            manifest.pop(k, None)
        if constraints:
            manifest["constraints"] = constraints
        manifest.update(
            version=latest["version"] + 1,
            kind="set_constraints",
            parent=latest["version"],
            ts=_t.time(),
        )
        if txn is not None:
            manifest["txn"] = {"app": txn[0], "batch": int(txn[1])}
        _record_last_field_id(manifest, _last_field_id(table, latest))
        try:
            _publish(table, manifest)
            return manifest["version"]
        except SnapshotConflictError:
            # the winner may be a concurrent replay of the SAME txn
            # (two replication drains replaying one source commit) —
            # that is success, not a conflict
            done = _txn_already_applied(table, txn)
            if done is not None:
                return done
            if attempt == max_retries:
                raise
    raise AssertionError("unreachable")


def rollback(table: str, version: int) -> int:
    """Make ``version`` current again by committing it as a new
    version pointing at the SAME data directory (metadata-only, like
    Delta's RESTORE — no data copy). Returns the new version."""
    ms = _manifests(table)
    by_v = {m["version"]: m for m in ms}
    if version not in by_v:
        raise ValueError(f"version {version} not in {sorted(by_v)}")
    import time

    parent = ms[-1]["version"]
    v = parent + 1
    manifest = dict(
        by_v[version], version=v, kind="rollback", parent=parent,
        ts=time.time(),
    )
    # the restored manifest's snapshot of last_field_id may predate
    # ids minted since — the floor must stay monotone over the FULL
    # history or a post-rollback ADD could recycle a retired id
    manifest.pop("txn", None)
    _record_last_field_id(
        manifest,
        max(
            _last_field_id(table, by_v[version]),
            _last_field_id(table, ms[-1]),
        ),
    )
    _publish(table, manifest)
    return v


def _fully_retained(table: str, m: dict) -> bool:
    """True iff every data file and DV sidecar dir of manifest ``m``
    still exists on disk (vacuum has not touched this version)."""
    if "files" not in m and not os.path.isdir(
        os.path.join(table, m["data_dir"])
    ):
        return False
    for rel in _manifest_files(table, m):
        if not os.path.exists(os.path.join(table, rel)):
            return False
    for e in m.get("dv", {}).values():
        if not os.path.isdir(os.path.join(table, e["dir"])):
            return False
    return True


def _retention_horizon(table: str, ms: list[dict]) -> int | None:
    """Oldest version from which every version through latest is
    still fully retained — the resume point named by
    ``SnapshotRetentionError``."""
    horizon = None
    for m in reversed(ms):
        if not _fully_retained(table, m):
            break
        horizon = m["version"]
    return horizon


def _require_retained(
    table: str, version: int, rels: list[str], ms: list[dict]
) -> None:
    """Raise ``SnapshotRetentionError`` (instead of a raw downstream
    file-not-found, or — worse — an empty scan) when any file a feed
    step must read was vacuumed."""
    for rel in rels:
        if not os.path.exists(os.path.join(table, rel)):
            raise SnapshotRetentionError(
                table, version, _retention_horizon(table, ms), rel
            )


def snapshot_changes(
    spark: SparkSession,
    table: str,
    from_version: int,
    to_version: int | None = None,
    manifests: list[dict] | None = None,
) -> DataFrame:
    """Change data feed (Delta CDF analogue): the row-level inserts
    and deletes between two committed versions, reconstructed from
    manifests alone — no per-commit change files are ever written.

    Per commit step, the diff is three manifest-derived pieces:

    * rows of files ADDED by the commit (minus any deletion vectors
      the commit itself carries on them) → ``insert``;
    * rows of files the commit REMOVED, as they were live at the
      parent (minus the parent's DVs) → ``delete``;
    * rows newly covered by DELETION VECTORS on carried files — the
      current sidecar positions anti-joined against the parent's →
      ``delete`` (merge-on-read deletes produce a feed without any
      file-set change).

    Layout-only commits (``compact``, ``zorder``) rewrite every file
    without changing a row; they are skipped outright (Delta's
    ``dataChange=false``), so OPTIMIZE never floods the feed. An
    UPDATE appears as its delete/insert row pair, exactly like
    Delta's CDF without the optional preimage tracking.

    Output: the table's data columns (latest-schema superset; rows
    from pre-evolution files carry NULLs in added columns) plus
    ``_change_type`` (``insert`` | ``delete``) and
    ``_commit_version``. Invariant (pinned in tests):
    ``rows(from) + inserts − deletes == rows(to)`` as multisets.

    Scale shape: each step scans ONLY the files that changed hands
    (added/removed/DV'd) — a small commit's feed reads a small number
    of files regardless of table size; nothing is collected.
    ``manifests`` lets a caller that already parsed the version
    history (the replication loop reads it once per drain, then asks
    for one version's feed at a time) skip the per-call re-parse."""
    from pyspark.sql import types as T

    ms = {
        m["version"]: m
        for m in (_manifests(table) if manifests is None else manifests)
    }
    if to_version is None:
        to_version = max(ms)
    if from_version not in ms or to_version not in ms:
        raise ValueError(
            f"versions {from_version}..{to_version} not all in "
            f"{sorted(ms)}"
        )

    def tag(df: DataFrame, change: str, v: int) -> DataFrame:
        return df.select(
            "*",
            F.lit(change).alias("_change_type"),
            F.lit(v).cast("int").alias("_commit_version"),
        )

    # every step's scan reads under the TO-version schema resolved by
    # field id — the feed stays coherent across column renames (rows
    # from pre-rename files come out under the current names instead
    # of NULL-filling a second column set in the union)
    rs = _schema_for_read(spark, ms[to_version])
    all_ms = [ms[v] for v in sorted(ms)]
    pieces: list[DataFrame] = []
    for v in range(from_version + 1, to_version + 1):
        m_cur, m_prev = ms[v], ms[v - 1]
        if m_cur.get("kind") in _LAYOUT_ONLY_KINDS:
            continue
        # a vacuumed DIRECTORY-level manifest can't even list its
        # files — surface the typed retention error, not the listdir
        for m in (m_prev, m_cur):
            dd = os.path.join(table, m["data_dir"])
            if "files" not in m and not os.path.isdir(dd):
                raise SnapshotRetentionError(
                    table, v, _retention_horizon(table, all_ms),
                    m["data_dir"],
                )
        prev_files = set(_manifest_files(table, m_prev))
        cur_files = set(_manifest_files(table, m_cur))
        dv_prev = m_prev.get("dv", {})
        dv_cur = m_cur.get("dv", {})

        added = sorted(cur_files - prev_files)
        removed = sorted(prev_files - cur_files)
        grown = sorted(
            r for r in (cur_files & prev_files)
            if r in dv_cur and dv_cur[r].get("dir") != (
                dv_prev.get(r) or {}
            ).get("dir")
        )
        # vacuum-horizon guard: this step reconstructs deletes from
        # files live at the PARENT version — files vacuum may already
        # have dropped. Fail with a typed retention error naming the
        # resume point instead of a raw file-not-found mid-scan (or,
        # worse, a silently empty one). Only what the step actually
        # reads is demanded: the changed files and their sidecars.
        needed_dv = {
            dv_cur[r]["dir"] for r in added + grown if r in dv_cur
        } | {
            dv_prev[r]["dir"] for r in removed + grown if r in dv_prev
        }
        _require_retained(
            table, v, added + removed + grown + sorted(needed_dv), all_ms
        )
        if added:
            pieces.append(tag(_scan_minus_dv(
                spark, table,
                [os.path.join(table, r) for r in added],
                {r: dv_cur[r] for r in added if r in dv_cur},
                schema=rs,
            ), "insert", v))
        if removed:
            pieces.append(tag(_scan_minus_dv(
                spark, table,
                [os.path.join(table, r) for r in removed],
                {r: dv_prev[r] for r in removed if r in dv_prev},
                schema=rs,
            ), "delete", v))
        # carried files whose DV grew: the freshly-deleted positions
        if grown:
            cur_pos = _dv_rows(
                spark, table, {r: dv_cur[r] for r in grown}
            ).filter(F.col("rel").isin(grown))
            prev_entries = {r: dv_prev[r] for r in grown if r in dv_prev}
            if prev_entries:
                prev_pos = _dv_rows(spark, table, prev_entries).filter(
                    F.col("rel").isin(list(prev_entries))
                )
                cur_pos = cur_pos.join(prev_pos, ["rel", "pos"], "left_anti")
            reader = (
                spark.read.schema(rs) if rs is not None else spark.read
            )
            scan = reader.parquet(
                *[os.path.join(table, r) for r in grown]
            )
            cols = scan.columns
            newly_deleted = (
                scan.withColumn("__cdf_rel", _rel_file_expr())
                .withColumn("__cdf_pos", F.col("_metadata.row_index"))
                .join(
                    cur_pos,
                    (F.col("__cdf_rel") == F.col("rel"))
                    & (F.col("__cdf_pos") == F.col("pos")),
                    "left_semi",
                )
                .select(*cols)
            )
            pieces.append(tag(newly_deleted, "delete", v))

    if not pieces:
        schema = T.StructType.fromJson(ms[to_version]["schema"]).add(
            "_change_type", T.StringType()
        ).add("_commit_version", T.IntegerType())
        return spark.createDataFrame([], schema)
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def _apply_cdc_version(
    spark: SparkSession,
    table: str,
    dels: DataFrame | None,
    ins: DataFrame | None,
    keys: Sequence[str],
    txn: tuple[str, int],
    max_retries: int = 5,
) -> int:
    """Apply ONE source version's change feed to a replica as ONE
    commit (kind ``cdc_apply``) whose physical cost is O(changed
    rows), never O(replica):

    * ``dels`` (distinct key tuples) land as DELETION VECTORS on only
      the files whose cached min/max stats / blooms say they may hold
      a matching key — zero data files rewritten, every file inherited
      by reference (the r9 loop full-rewrote the replica per source
      version: O(replica × versions) at 100 TB). Pruning intersects
      exclusions across ALL replication keys that have cached stats
      (a composite-key replica skips every file ANY key's min/max or
      bloom provably excludes — not just the first key's);
    * ``ins`` lands as appended files (``_stage_unique``); a widened
      source schema widens the replica here — new columns mint fresh
      field ids and pre-widen files NULL-fill, exactly like a local
      widening commit;
    * one manifest = one source version = one ``txn`` ledger entry,
      so the exactly-once cursor contract is unchanged (a crash
      between two half-applied commits cannot exist).

    Concurrency: a concurrent writer on the REPLICA (local append,
    delete, compaction) losing/winning the version race no longer
    aborts the whole drain — on conflict the application re-checks
    the txn ledger (a racing drain of the same version already landed
    it) and otherwise RETRIES from the new latest: re-prune, re-stage,
    re-publish, up to ``max_retries`` times. The retry is sound
    because applying a version's keyed deletes + inserts is a pure
    function of (new parent state, feed) and the ledger keeps it
    exactly-once.

    Delete semantics match the rewrite path it replaces: key equality
    is NULL-safe (a NULL-keyed delete removes NULL-keyed rows)."""
    for attempt in range(max_retries + 1):
        try:
            return _apply_cdc_version_once(
                spark, table, dels, ins, keys, txn
            )
        except SnapshotConflictError:
            done = _txn_already_applied(table, txn)
            if done is not None:
                return done
            if attempt == max_retries:
                raise
    raise AssertionError("unreachable")


def _apply_cdc_version_once(
    spark: SparkSession,
    table: str,
    dels: DataFrame | None,
    ins: DataFrame | None,
    keys: Sequence[str],
    txn: tuple[str, int],
) -> int:
    """One publish attempt of ``_apply_cdc_version`` against the
    current latest manifest (see there for semantics)."""
    import time as _t

    latest = _latest_manifest(table)
    if latest is None:
        raise FileNotFoundError(f"no versions in {table}")
    files = _manifest_files(table, latest)
    parent_dv = latest.get("dv", {})
    cached_stats = latest.get("stats", {})
    blooms = latest.get("blooms", {})
    prune_col = keys[0]

    # ---- deletes → consolidated deletion vectors on pruned files ----
    new_dv = dict(parent_dv)
    dv_dir: str | None = None
    n_dv_files = 0
    touched: list[str] = []
    if dels is not None:
        # one aggregation pass over the delete keys: min/max/non-null
        # count for EVERY key, so per-file exclusion can intersect
        # across keys
        aggs = [F.count(F.lit(1)).alias("n")]
        for j, k in enumerate(keys):
            aggs += [
                F.min(k).alias(f"lo{j}"),
                F.max(k).alias(f"hi{j}"),
                F.count(k).alias(f"nn{j}"),
            ]
        bounds = dels.agg(*aggs).first()
        probe_pairs = {}
        for k in keys:
            if any(k in e for e in blooms.values()):
                pp = _bloom_probe_pairs(dels, k)
                if pp is not None:  # None = over cap, range-only
                    probe_pairs[k] = pp
        for rel in files:
            may = True
            for j, k in enumerate(keys):
                cached = cached_stats.get(rel, {}).get(k)
                if cached is not None:
                    mm = (_stat_decode(cached[0]), _stat_decode(cached[1]))
                    nc = cached[2] if len(cached) >= 3 else None
                elif j == 0:
                    # only the primary key pays a footer read when the
                    # manifest has no cached stats; a secondary key
                    # without cached stats simply cannot exclude
                    mm = _footer_minmax(os.path.join(table, rel), k)
                    nc = _footer_nullcount(os.path.join(table, rel), k)
                else:
                    continue
                lo, hi = bounds[f"lo{j}"], bounds[f"hi{j}"]
                nulls_k = bounds["n"] > bounds[f"nn{j}"]
                may_nonnull = lo is not None and (
                    mm is None or not (mm[1] < lo or mm[0] > hi)
                )
                if may_nonnull and k in probe_pairs:
                    hexmap = blooms.get(rel, {}).get(k)
                    if hexmap is not None and not _bloom_may_contain(
                        hexmap, probe_pairs[k]
                    ):
                        may_nonnull = False
                may_null = nulls_k and (nc is None or nc > 0)
                if not (may_nonnull or may_null):
                    may = False
                    break
            if may:
                touched.append(rel)
    if touched:
        _rs = _schema_for_read(spark, latest)
        scan = (
            spark.read.schema(_rs) if _rs is not None else spark.read
        ).parquet(*[os.path.join(table, r) for r in touched])
        d = dels.select(
            *[F.col(k).alias(f"__del_{k}") for k in keys]
        ).dropDuplicates()
        cond = None
        for k in keys:
            c = F.col(k).eqNullSafe(F.col(f"__del_{k}"))
            cond = c if cond is None else cond & c
        hits = (
            scan.withColumn("rel", _rel_file_expr())
            .withColumn("pos", F.col("_metadata.row_index"))
            .join(d, cond, "left_semi")
            .select("rel", "pos")
        )
        # fold in prior positions so each touched file's fresh sidecar
        # is its COMPLETE deletion vector (no double counting)
        old = {r: e for r, e in parent_dv.items() if r in set(touched)}
        old_rows = _dv_rows(spark, table, old)
        if old_rows is not None:
            prior = old_rows.filter(F.col("rel").isin(list(old)))
            merged = hits.join(
                prior, ["rel", "pos"], "left_anti"
            ).unionByName(prior)
        else:
            merged = hits
        counts = {
            r["rel"]: int(r["n"])
            for r in merged.groupBy("rel")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        if counts:
            dv_dir = os.path.join(
                _DVDIR, f"v{latest['version'] + 1:05d}-{uuid.uuid4().hex[:8]}"
            )
            n_out = max(1, sum(counts.values()) // 4_000_000)
            merged.repartition(n_out, "rel").write.mode(
                "errorifexists"
            ).parquet(os.path.join(table, dv_dir))
            for rel in touched:
                if rel in counts:
                    new_dv[rel] = {"dir": dv_dir, "count": counts[rel]}
                else:
                    new_dv.pop(rel, None)
            n_dv_files = sum(1 for rel in touched if rel in counts)

    # ---- inserts → appended files (schema may widen) ----
    data_dir: str | None = None
    new_files: list[str] = []
    schema = latest["schema"]
    if ins is not None:
        _validate_constraints(ins, latest.get("constraints", {}))
        data_dir, schema = _stage_unique(
            table, ins, latest["version"] + 1, parent=latest
        )
        new_files = sorted(
            os.path.join(data_dir, f)
            for f in os.listdir(os.path.join(table, data_dir))
            if f.endswith(".parquet")
        )

    stats_out = dict(cached_stats)
    if new_files:
        # stats for EVERY replication key, so later drains can
        # intersect exclusions across the composite key
        stats_out.update(_collect_stats(table, new_files, list(keys)))
    blooms_out = dict(blooms)
    bloom_keys = [
        k for k in keys if any(k in e for e in blooms.values())
    ]
    if new_files and bloom_keys:
        blooms_out.update(
            _collect_blooms(spark, table, new_files, bloom_keys)
        )
    rows_map = latest.get("rows", {})
    manifest = {
        "version": latest["version"] + 1,
        "data_dir": data_dir if data_dir is not None else latest["data_dir"],
        "files": new_files + list(files),
        "rows": {
            **{
                r: rows_map[r]
                if r in rows_map
                else _footer_rows(os.path.join(table, r))
                for r in files
            },
            **_collect_rows(table, new_files),
        },
        "kind": "cdc_apply",
        "parent": latest["version"],
        "ts": _t.time(),
        "schema": schema,
        "stats": stats_out,
        **({"blooms": blooms_out} if blooms_out else {}),
        "txn": {"app": txn[0], "batch": int(txn[1])},
        "pruning": {
            "col": prune_col,
            "cols": list(keys),
            "rewritten_files": 0,
            "appended_files": len(new_files),
            "dv_files": n_dv_files,
            "scanned_files": len(touched),
            "inherited_files": len(files),
        },
        **(
            {"constraints": latest["constraints"]}
            if latest.get("constraints")
            else {}
        ),
    }
    if new_dv:
        manifest["dv"] = new_dv
    _record_last_field_id(manifest, _last_field_id(table, latest))
    try:
        _publish(table, manifest)
    except SnapshotConflictError:
        if data_dir is not None:
            shutil.rmtree(os.path.join(table, data_dir), ignore_errors=True)
        if dv_dir is not None:
            shutil.rmtree(os.path.join(table, dv_dir), ignore_errors=True)
        raise
    return manifest["version"]


def replicate_snapshot_changes(
    spark: SparkSession,
    src_table: str,
    dst_table: str,
    keys: Sequence[str],
    app_id: str = "cdf-replica",
    max_versions: int | None = None,
    fold_versions: int | None = 64,
) -> int:
    """Advance a replica table by CONSUMING the source's change feed —
    the incremental CDC-replication loop, exactly-once:

    * the cursor is the existing transaction ledger: each applied
      source version commits to the replica with ``txn=(app_id,
      src_version)``, so ``last_committed_txn`` IS the resume point —
      no side files, and a crashed/replayed application of an
      already-applied version is a no-op by the ledger's ``<= max``
      rule;
    * versions apply ONE AT A TIME as ONE ``cdc_apply`` commit each
      (``_apply_cdc_version``): deletes become deletion vectors on
      the pruned files, inserts become appended files, every other
      file is inherited BY REFERENCE — O(changed rows) per source
      version, never a replica rewrite. A key updated in two
      consecutive source versions still sees its delete/insert pairs
      in order, because versions are never folded;
    * SCHEMA commits replay as schema commits: a source
      ``rename_column``/``drop_column`` runs the same metadata-only
      commit on the replica (the feed is empty — without the replay,
      later inserts under the new name would silently fork the
      column); a rename of a replication KEY re-keys the loop's own
      join keys mid-drain; dropping a key column fails fast;
    * layout-only source commits advance the cursor with a
      metadata-only ``cdc_noop`` commit (nothing re-written);
    * ``fold_versions=N`` (DEFAULT 64; pass ``None`` or ``1`` for the
      strict one-commit-per-source-version drain) drains runs of up
      to N consecutive ROW-CHANGE source versions as ONE
      ``cdc_apply`` commit — a replica catching up over thousands of
      small commits stops paying per-version Spark-job + manifest
      overhead (at this harness's bench scale a 2-version drain costs
      ~12 Spark jobs per version in feed reconstruction + apply; the
      fold pays that once per window). The fold sequences the
      combined feed correctly for multisets: deletes are the union of
      all deleted keys in the window (a later feed insert adds a NEW
      row, never resurrects the old one), and an insert survives
      unless a STRICTLY LATER version deletes its key (the
      delete/insert pair inside one version keeps its delete-first
      order). ``latest_changes`` is NOT reused here — its
      one-row-per-key contract would drop multi-row appends under a
      shared key. A fold stops at any schema / constraint / rollback
      commit (those replay individually, and a schema-reverting
      rollback still fails fast) AND at any commit whose schema
      signature differs from the window's first version (a widening
      merge, say) — fold windows are schema-constant by construction,
      so the combined feed never mixes column sets;
      ``txn=(app_id, last folded version)`` keeps exactly-once — a
      crash between folds resumes from the ledger cursor;
    * a replica that does not exist yet is bootstrapped from source
      version 0 (``txn=(app_id, 0)``) with min/max stats on the keys,
      so the delete-side file pruning works from the first applied
      version.

    Run it in a loop (or from ``foreachBatch`` of any trigger stream)
    while the source keeps committing: each call drains versions that
    exist at call time and returns how many it applied — concurrent
    source commits are picked up by the next call.
    """
    src_latest = latest_version(src_table)
    if src_latest is None:
        raise FileNotFoundError(f"no versions in {src_table}")
    src_ms = {m["version"]: m for m in _manifests(src_table)}
    applied = 0
    if latest_version(dst_table) is None:
        src_v0 = src_ms[0]
        # a vacuumed v0 must surface as the typed retention error the
        # rest of the feed raises, not a raw parquet file-not-found
        if "files" not in src_v0 and not os.path.isdir(
            os.path.join(src_table, src_v0["data_dir"])
        ):
            _require_retained(
                src_table, 0, [src_v0["data_dir"]], list(src_ms.values())
            )
        _require_retained(
            src_table, 0, _manifest_files(src_table, src_v0),
            list(src_ms.values()),
        )
        # carry v0's CHECK constraints: without them the replica's
        # manifests lack enforcement until a later set_constraints
        # commit happens to replay
        snapshot_write(
            dst_table,
            snapshot_read(spark, src_table, version=0),
            stats_cols=list(keys),
            constraints=src_v0.get("constraints"),
            txn=(app_id, 0),
        )
        applied += 1
    cursor = last_committed_txn(dst_table, app_id)
    if cursor is None:
        raise RuntimeError(
            f"replica {dst_table} exists but has no txn ledger for "
            f"app {app_id!r} — it was not bootstrapped by this loop"
        )
    # source renames committed BEFORE the cursor already re-keyed the
    # replica; bring the caller's key names up to the cursor's epoch
    keys = list(keys)
    for v in sorted(src_ms):
        if v <= cursor and src_ms[v].get("kind") == "rename_column":
            r = src_ms[v]["rename"]
            keys = [r["to"] if k == r["from"] else k for k in keys]
    fold_stop_kinds = _SCHEMA_ONLY_KINDS | {"set_constraints", "rollback"}
    v = cursor + 1
    while v <= src_latest:
        if max_versions is not None and applied >= max_versions:
            break
        m = src_ms[v]
        kind = m.get("kind")
        if kind == "rollback" and _schema_commit_sig(m) != _schema_commit_sig(
            src_ms[v - 1]
        ):
            # a rollback that REVERTS schema evolution (rename/drop/
            # widen undone in one commit) cannot be replayed as a row
            # diff — the feed's columns no longer line up with the
            # replica's, and silently continuing would fork columns
            # exactly like the pre-r10 rename bug. Fail fast; the
            # operator re-bootstraps the replica from a fresh app_id.
            raise ValueError(
                f"source {src_table} version {v} is a rollback that "
                "reverts a schema change; replicate cannot replay it "
                "— re-bootstrap the replica from the current source"
            )
        if kind in _SCHEMA_ONLY_KINDS:
            # dispatch driven off the shared constant so a new
            # schema-only kind cannot silently skip its replay arm
            if kind == "rename_column":
                r = m["rename"]
                snapshot_rename_column(
                    dst_table, r["from"], r["to"], txn=(app_id, v)
                )
                keys = [r["to"] if k == r["from"] else k for k in keys]
            elif kind == "drop_column":
                col = m["drop"]["column"]
                if col in keys:
                    raise ValueError(
                        f"source {src_table} dropped replication key "
                        f"{col!r} at version {v}; the replica cannot "
                        "apply keyed deletes without it"
                    )
                snapshot_drop_column(dst_table, col, txn=(app_id, v))
            else:  # pragma: no cover — drift guard
                raise AssertionError(
                    f"schema-only kind {kind!r} has no replication "
                    "replay arm"
                )
        elif kind == "set_constraints":
            # replay the constraint change on the replica — the rows
            # are identical (already validated on the source), so the
            # validation scan is skipped
            snapshot_set_constraints(
                spark, dst_table, m.get("constraints", {}),
                validate=False, txn=(app_id, v),
            )
        elif kind in _LAYOUT_ONLY_KINDS:
            # empty feed by definition: advance the ledger only
            _metadata_commit(
                dst_table, _latest_manifest(dst_table),
                lambda mf: None, "cdc_noop", (app_id, v),
                rebase=True, max_rebase=5,
            )
        else:
            # extend a fold window over consecutive row-change /
            # layout-only versions (their feeds compose; schema,
            # constraint, and rollback commits end the window)
            end = v
            if fold_versions is not None and fold_versions > 1 and (
                kind != "rollback"
            ):
                budget = fold_versions
                if max_versions is not None:
                    budget = min(budget, max_versions - applied)
                sig0 = _schema_commit_sig(m)
                while (end - v + 1) < budget and end + 1 <= src_latest:
                    nxt = src_ms[end + 1]
                    if nxt.get("kind") in fold_stop_kinds:
                        break
                    # schema-constant windows only: a widening merge
                    # (row-change kind, schema changes) replays as its
                    # own commit so the folded feed never mixes
                    # column sets
                    if _schema_commit_sig(nxt) != sig0:
                        break
                    end += 1
            feed = snapshot_changes(
                spark, src_table, v - 1, end,
                manifests=list(src_ms.values()),
            ).persist()
            try:
                n_by = {
                    r["_change_type"]: int(r["n"])
                    for r in feed.groupBy("_change_type")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                }
                dels = (
                    feed.filter(F.col("_change_type") == "delete")
                    .select(*keys)
                    if n_by.get("delete")
                    else None
                )
                ins = (
                    feed.filter(F.col("_change_type") == "insert")
                    if n_by.get("insert")
                    else None
                )
                if ins is not None and dels is not None and end > v:
                    # sequence the folded feed: an insert survives
                    # unless a STRICTLY LATER version deletes its key
                    # (same-version delete/insert keeps delete-first
                    # order); NULL-safe on the keys like the apply
                    last_del = (
                        feed.filter(F.col("_change_type") == "delete")
                        .groupBy(*keys)
                        .agg(F.max("_commit_version").alias("__ldv"))
                        .select(
                            *[F.col(k).alias(f"__dk_{k}") for k in keys],
                            "__ldv",
                        )
                    )
                    cond = None
                    for k in keys:
                        c = F.col(k).eqNullSafe(F.col(f"__dk_{k}"))
                        cond = c if cond is None else cond & c
                    ins = (
                        ins.join(last_del, cond, "left")
                        .filter(
                            F.col("__ldv").isNull()
                            | (F.col("_commit_version") >= F.col("__ldv"))
                        )
                        .drop("__ldv", *[f"__dk_{k}" for k in keys])
                    )
                    if ins.isEmpty():  # every insert superseded
                        ins = None
                if ins is not None:
                    ins = ins.drop("_change_type", "_commit_version")
                if dels is None and ins is None:
                    _metadata_commit(
                        dst_table, _latest_manifest(dst_table),
                        lambda mf: None, "cdc_noop", (app_id, end),
                        rebase=True, max_rebase=5,
                    )
                else:
                    _apply_cdc_version(
                        spark, dst_table, dels, ins, keys, (app_id, end)
                    )
            finally:
                feed.unpersist()
            applied += end - v + 1
            v = end + 1
            continue
        applied += 1
        v += 1
    return applied


def vacuum(
    table: str, keep_last: int = 2, stage_retention_sec: float = 3600.0
) -> list[int]:
    """Drop data directories only referenced by versions older than
    the last ``keep_last`` — bounded storage growth, the VACUUM
    analogue. Directories shared with retained versions — rollback
    commits, and files INHERITED across pruned merges — are kept.
    Also sweeps orphaned ``*.stage-*`` directories, but ONLY those
    older than ``stage_retention_sec`` (mtime of the directory): a
    completed commit or a detected conflict removes its own staging,
    so an old stage dir means a crashed writer — but a YOUNG one may
    belong to an in-flight concurrent writer mid-parquet-job, and
    deleting it would fail that commit non-atomically (same reason
    Delta's VACUUM has a retention horizon). Returns the vacuumed
    version numbers."""
    import re
    import time as _time

    ms = _manifests(table)
    # every dir ANY manifest references, including pruned-merge
    # inherited files and deletion-vector sidecars — a conditional-put
    # data dir becomes sweepable only if its version was never
    # published (crashed writer)
    referenced = {m["data_dir"] for m in ms}
    for m in ms:
        for f in m.get("files", []):
            referenced.add(os.path.dirname(f))
        for e in m.get("dv", {}).values():
            referenced.add(e["dir"])
    now = _time.time()
    for entry in os.listdir(table):
        # orphans: POSIX staging dirs, and conditional-put unique dirs
        # (d00007-3fa9c1d2) no manifest ever published — both only
        # past the retention age, since a young one may belong to an
        # in-flight writer mid-parquet-job
        orphan = ".stage-" in entry or (
            re.fullmatch(r"d\d{5}-[0-9a-f]{8}", entry)
            and entry not in referenced
        )
        if orphan:
            p = os.path.join(table, entry)
            try:
                age = now - os.path.getmtime(p)
            except OSError:
                continue  # racing writer renamed/removed it — alive
            if age >= stage_retention_sec:
                shutil.rmtree(p, ignore_errors=True)
    # deletion-vector sidecars a crashed writer staged but never
    # published — same retention discipline as data-dir orphans
    dv_root = os.path.join(table, _DVDIR)
    if os.path.isdir(dv_root):
        for entry in os.listdir(dv_root):
            rel = os.path.join(_DVDIR, entry)
            if (
                re.fullmatch(r"v\d{5}-[0-9a-f]{8}", entry)
                and rel not in referenced
            ):
                p = os.path.join(dv_root, entry)
                try:
                    age = now - os.path.getmtime(p)
                except OSError:
                    continue
                if age >= stage_retention_sec:
                    shutil.rmtree(p, ignore_errors=True)
    if len(ms) <= keep_last:
        return []
    keep = {m["data_dir"] for m in ms[-keep_last:]}
    for m in ms[-keep_last:]:
        for f in m.get("files", []):
            keep.add(os.path.dirname(f))
        for e in m.get("dv", {}).values():
            keep.add(e["dir"])
    dropped = []
    for m in ms[:-keep_last]:
        refs = (
            {m["data_dir"]}
            | {os.path.dirname(f) for f in m.get("files", [])}
            | {e["dir"] for e in m.get("dv", {}).values()}
        )
        if refs & keep:
            continue
        for d in refs:
            shutil.rmtree(os.path.join(table, d), ignore_errors=True)
        dropped.append(m["version"])
    return dropped


def snapshot_history(table: str) -> list[dict]:
    """The audit log (DESCRIBE HISTORY analogue): one entry per
    version — kind, parent, file count, whether stats are cached —
    from manifests only (no data reads)."""
    out = []
    for m in _manifests(table):
        out.append(
            {
                "version": m["version"],
                "kind": m["kind"],
                "parent": m["parent"],
                "ts": m.get("ts"),
                "n_files": len(_manifest_files(table, m)),
                "has_stats": bool(m.get("stats")),
                "n_dv_files": len(m.get("dv", {})),
            }
        )
    return out
