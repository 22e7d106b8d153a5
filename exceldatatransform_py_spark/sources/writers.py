"""Sinks (SURVEY.md §2.1, S4/S5).

S4 — the reference writes one Excel sheet per SURNAME group, dropping
the partition column from each sheet and truncating the sheet name to
31 chars (``timesheet_transform_v1.py:92-100``). The exact Spark
analogue is a ``partitionBy`` parquet write: one directory per key,
partition column removed from data files, partition values sanitized.

S5 — the reference's in-place workbook update
(``timesheet_transform.py:105-138``) is MERGE-INTO semantics with only
a WHEN MATCHED clause: matched target rows get two columns
overwritten, unmatched target rows are untouched, unmatched *source*
rows are discarded. Core Spark has no transactional in-place update,
so this is restated as join + coalesce + full rewrite (the Delta Lake
upgrade path is ``MERGE INTO ... WHEN MATCHED THEN UPDATE``). The
relational core lives in ``operators.merge.merge_update`` so it can
be oracle-checked without filesystem effects.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_by_key(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
    sanitize_len: int | None = None,
) -> None:
    """One-directory-per-group sink (S4).

    ``sanitize_len`` mirrors the reference's 31-char Excel sheet-name
    cap (``timesheet_transform_v1.py:99`` ``str(surname)[:31]``) as
    partition-value truncation.

    Scale note: the write is a single distributed job; to avoid a
    many-small-files explosion at high key cardinality, callers can
    pre-``repartition(*partition_cols)`` so each key lands in one
    task's output (we do not force it here because low-cardinality
    keys benefit from parallel writers per key).
    """
    out = df
    if sanitize_len is not None:
        for c in partition_cols:
            out = out.withColumn(c, F.substring(F.col(c).cast("string"), 1, sanitize_len))
    out.write.partitionBy(*partition_cols).format(fmt).mode(mode).save(path)


def merge_update_write(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    on: Sequence[str],
    update_cols: Sequence[str],
    fmt: str = "parquet",
) -> None:
    """Update-only merge into a stored table (S5): read target, apply
    ``operators.merge.merge_update``, rewrite.

    Plain-parquet approximation of Delta's
    ``whenMatchedUpdate`` — a full rewrite is required because parquet
    files are immutable. With Delta/Iceberg this becomes a metadata
    + touched-file-only commit; the relational semantics are
    identical.
    """
    from exceldatatransform_py_spark.operators.merge import merge_update

    target = spark.read.format(fmt).load(target_path)
    merged = merge_update(target, updates, on=on, update_cols=update_cols)
    # Materialize before overwriting the files we read from.
    merged_local = merged.localCheckpoint(eager=True)
    merged_local.write.format(fmt).mode("overwrite").save(target_path)


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    num_files: int,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Range-clustered sink: co-locate rows by sort order so scans can
    skip whole files/row groups.

    ``repartitionByRange`` samples the cluster key to build
    range-disjoint partitions, ``sortWithinPartitions`` orders rows
    inside each, so every output file covers a narrow, non-overlapping
    key range and its parquet min/max statistics become selective:
    a predicate on the cluster key prunes most files without reading
    them. This is the single-dimension form of what Delta/Iceberg call
    Z-ordering or liquid clustering — at 100 TB, clustering the fact
    table on its dominant filter column (e.g. ship date) turns
    full-table scans into touched-range scans, the same win partition
    pruning gives but without a directory per value.

    ``num_files`` sizes the layout: target ~128 MB-1 GB per file at
    scale (here: small numbers for tests). The range exchange is one
    extra shuffle at write time, amortized over every later read.
    """
    (
        df.repartitionByRange(num_files, *[F.col(c) for c in cluster_cols])
        .sortWithinPartitions(*cluster_cols)
        .write.format(fmt)
        .mode(mode)
        .save(path)
    )


def compact_files(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int,
    fmt: str = "parquet",
) -> int:
    """Small-files compaction: rewrite a table directory into
    ``ceil(rows / target_rows_per_file)`` files and return that count.

    The operational fix for the small-files problem streaming and
    per-key sinks create: thousands of KB-sized files make listing,
    scheduling, and row-group overhead dominate scans. Compaction uses
    ``coalesce`` (narrow — folds existing partitions without a
    shuffle) when shrinking; ``coalesce`` cannot grow a partition
    count, so when the target exceeds the scan's partition count the
    rewrite uses ``repartition`` (one round-robin exchange — the data
    is being rewritten anyway, and compaction-to-MORE-files only
    happens when existing files are oversized, where even sizing is
    the point). At 100 TB this runs per-partition-directory behind the
    table format's transaction (Delta OPTIMIZE / Iceberg
    rewrite_data_files are this exact operation with a metadata
    commit). Returns the actual file count written.
    """
    df = spark.read.format(fmt).load(path)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // target_rows_per_file))
    n_parts = df.rdd.getNumPartitions()  # metadata only — no job
    if n_files < n_parts:
        compacted = df.coalesce(n_files)
    elif n_files > n_parts:
        compacted = df.repartition(n_files)
    else:
        compacted = df
    compacted = compacted.localCheckpoint(eager=True)
    compacted.write.format(fmt).mode("overwrite").save(path)
    return n_files
