"""OPTIMIZE for index tables: compact append-accumulated small files.

Every streaming-ingest loop in this engine (LSH / IVF / IVF-SQ8 /
MinHash / SimHash / BM25 appends) adds one file per partition or
bucket per batch — correct, but a year of batches serves from
thousands of tiny files: scan planning, footer reads, and task
scheduling all degrade with file count long before data size matters.
``compact_table`` is the maintenance commit that folds them back to
one file per partition/bucket WITHOUT changing a single row or the
table's layout contract:

* the layout (partition columns, bucket spec + sort columns,
  location) is INTROSPECTED from the catalog, so compaction cannot
  drift from what the index's serve path planned against — bucketed
  tables are rewritten through the same ``write_bucketed`` used at
  build time (one file per bucket, ``sortBy`` order re-established,
  which is exactly the state Spark requires to elide downstream
  sorts), and partitioned tables are repartitioned by their partition
  columns so each partition value lands in one task → one file.
* rows are snapshotted with an eager ``localCheckpoint`` before the
  overwrite, cutting the plan's lineage back to the table being
  replaced (Spark otherwise refuses to overwrite a path it reads).
  This makes the rewrite a read-then-replace, not transactional —
  the documented upgrade path for a 100 TB deployment is to write to
  a fresh directory and publish it through the snapshot layer's
  ``CommitProtocol`` (``sources.snapshots``), exactly how
  ``snapshot_compact`` commits; the sizing/one-file-per-unit logic
  is identical here.

Scale posture: compaction is one shuffle of the index (partitioned by
exactly the columns the index already clusters on) — never of the
corpus — and runs offline like Delta's OPTIMIZE.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def table_layout(spark: SparkSession, table: str) -> dict:
    """Catalog introspection: partition columns, bucket spec, sort
    columns, and filesystem location of a saved table."""
    pcols = [c.name for c in spark.catalog.listColumns(table) if c.isPartition]
    bcols = [c.name for c in spark.catalog.listColumns(table) if c.isBucket]
    n_buckets, sort_cols, location = 0, [], None
    for row in spark.sql(f"DESCRIBE FORMATTED {table}").collect():
        key = (row.col_name or "").strip()
        val = (row.data_type or "").strip()
        if key == "Num Buckets":
            n_buckets = int(val)
        elif key == "Sort Columns":
            sort_cols = [
                c.strip(" `") for c in val.strip("[]").split(",") if c.strip()
            ]
        elif key == "Location":
            location = val
    return {
        "partition_cols": pcols,
        "bucket_cols": bcols,
        "n_buckets": n_buckets,
        "sort_cols": sort_cols,
        "location": location,
    }


def _count_data_files(location: str) -> int:
    path = location.removeprefix("file:")
    n = 0
    for _, _, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def compact_table(spark: SparkSession, table: str) -> dict:
    """Rewrite ``table`` with one file per partition value (or per
    bucket), preserving its introspected layout; rows are unchanged.
    Returns ``{"files_before": int, "files_after": int}``."""
    from exceldatatransform_py_spark.sources.bucketing import write_bucketed

    lay = table_layout(spark, table)
    before = _count_data_files(lay["location"]) if lay["location"] else -1
    # eager snapshot: the rewrite must not read the files it replaces
    rows = spark.table(table).localCheckpoint(eager=True)
    if lay["bucket_cols"]:
        write_bucketed(
            rows,
            table,
            lay["bucket_cols"],
            lay["n_buckets"],
            sort_cols=lay["sort_cols"] or None,
            path=lay["location"],
            mode="overwrite",
        )
    elif lay["partition_cols"]:
        (
            rows.repartition(*[rows[c] for c in lay["partition_cols"]])
            .write.mode("overwrite")
            .partitionBy(*lay["partition_cols"])
            .option("path", lay["location"])
            .saveAsTable(table)
        )
    else:
        (
            rows.coalesce(1)
            .write.mode("overwrite")
            .option("path", lay["location"])
            .saveAsTable(table)
        )
    rows.unpersist()
    after = _count_data_files(lay["location"]) if lay["location"] else -1
    return {"files_before": before, "files_after": after}


#: data-bearing tables of each index family, as <prefix>_<suffix>;
#: control-plane one-row tables (planes/centroids/codebook/stats) are
#: deliberately left alone — they never accumulate append files.
INDEX_FAMILY_TABLES = {
    "lsh": ["buckets"],
    "ivf": ["cells"],
    "ivf_sq8": ["cells"],
    "ivf_pq": ["cells"],
    "dedup": ["bands", "shingles"],
    "simhash": ["simbands"],
    "phash": ["simbands"],  # image fingerprints share the banded layout
    "audio": ["simbands"],  # ... as do audio energy-delta fingerprints
    "video": ["simbands"],  # ... and keyframe video fingerprints
    "bm25": ["postings", "df", "doclen"],
}


def compact_index(
    spark: SparkSession, table_prefix: str, kind: str
) -> dict:
    """OPTIMIZE an index family's data tables (see
    ``INDEX_FAMILY_TABLES``); returns per-table before/after file
    counts. Serve results are byte-identical afterwards — compaction
    changes layout economics, never content."""
    if kind not in INDEX_FAMILY_TABLES:
        raise ValueError(
            f"unknown index kind {kind!r}; one of "
            f"{sorted(INDEX_FAMILY_TABLES)}"
        )
    return {
        suffix: compact_table(spark, f"{table_prefix}_{suffix}")
        for suffix in INDEX_FAMILY_TABLES[kind]
    }
