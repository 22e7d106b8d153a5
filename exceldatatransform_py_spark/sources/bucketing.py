"""Bucketed tables: shuffle-free co-located joins and aggregations.

The 100 TB join problem is the shuffle: a fact-fact sort-merge join
re-hashes BOTH inputs over the network every query. Bucketing is the
Spark-native fix — write each side hash-partitioned (and optionally
sorted) by the join key into N buckets ONCE at ingest; every later
equi-join or groupBy on that key reads the co-located buckets and
skips the exchange (and, with ``sortBy``, the sort) entirely.

The reference has no analogue (single in-memory workbook); this is
pure scale posture: at 1000 executors, bucketing a 100 TB fact table
on its join key turns every downstream join from a full network
shuffle into a local merge. Pick N buckets ≈ total cluster cores ×
small integer, and keep it IDENTICAL on both sides — mismatched
bucket counts fall back to a shuffle on one side.

Two knobs matter at read time: bucketing itself
(``spark.sql.sources.bucketing.enabled``, on by default) elides the
Exchange; eliding the per-partition *Sort* as well additionally needs
``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` (since
Spark 3.0 the scan reports output partitioning but not ordering,
because proving order requires a planning-time file listing).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (+ sorted) catalog table.

    Bucketed layout only survives through the catalog (``saveAsTable``
    — a bare ``save(path)`` silently drops bucket metadata, which is
    why this helper exists). ``path`` makes it an external table.

    The pre-write ``repartition(n_buckets, bucket_cols)`` uses the
    same murmur3-mod hash as the bucket spec, so each task holds
    exactly one bucket → one file per bucket. That matters twice:
    without it, W write tasks × N buckets emit W·N small files, and
    Spark only *trusts* ``sortBy`` order (eliding the downstream
    Sort) when a bucket is a single file.
    """
    writer = (
        df.repartition(n_buckets, *bucket_cols)
        .write.format(fmt)
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact."""
    return spark.table(table)
