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


def compact_table(
    spark: SparkSession, table: str, minus: tuple | None = None
) -> dict:
    """Rewrite ``table`` with one file per partition value (or per
    bucket), preserving its introspected layout; rows are unchanged —
    unless ``minus=(ids_df, id_col)`` is given, in which case rows
    matching the ids are PURGED during the rewrite (the tombstone
    materialization step of ``purge_index_deletes``).
    Returns ``{"files_before": int, "files_after": int}``."""
    from pyspark.sql import functions as F

    from exceldatatransform_py_spark.sources.bucketing import write_bucketed

    lay = table_layout(spark, table)
    before = _count_data_files(lay["location"]) if lay["location"] else -1
    src = spark.table(table)
    if minus is not None:
        ids_df, idc = minus
        src = src.join(F.broadcast(ids_df.select(idc)), idc, "left_anti")
    # eager snapshot: the rewrite must not read the files it replaces
    rows = src.localCheckpoint(eager=True)
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
    changes layout economics, never content: tombstoned ids recorded
    by ``delete_from_index`` are PURGED physically here, but probes
    were already subtracting them logically."""
    if kind not in INDEX_FAMILY_TABLES:
        raise ValueError(
            f"unknown index kind {kind!r}; one of "
            f"{sorted(INDEX_FAMILY_TABLES)}"
        )
    purged = purge_index_deletes(spark, table_prefix, kind)
    if purged:
        return purged
    return {
        suffix: compact_table(spark, f"{table_prefix}_{suffix}")
        for suffix in INDEX_FAMILY_TABLES[kind]
    }


#: stored id column of each data-bearing table, for tombstone
#: anti-joins and physical purges. ``None`` = introspect: the banded
#: fingerprint table keeps the caller's id column name, which is the
#: only column outside the fixed (simhash, band, bv) layout.
INDEX_FAMILY_ID_COLS = {
    "lsh": {"buckets": "neighbor_id"},
    "ivf": {"cells": "neighbor_id"},
    "ivf_sq8": {"cells": "neighbor_id"},
    "ivf_pq": {"cells": "neighbor_id"},
    "dedup": {"bands": "doc", "shingles": "doc"},
    "simhash": {"simbands": None},
    "phash": {"simbands": None},
    "audio": {"simbands": None},
    "video": {"simbands": None},
    "bm25": {"postings": "doc_id", "doclen": "doc_id"},
}

_SIMBAND_LAYOUT_COLS = {"simhash", "band", "bv"}


def _table_id_col(spark: SparkSession, table: str, declared: str | None) -> str:
    if declared is not None:
        return declared
    extra = [
        c for c in spark.table(table).columns
        if c not in _SIMBAND_LAYOUT_COLS
    ]
    if len(extra) != 1:
        raise ValueError(
            f"cannot introspect the id column of {table}: "
            f"non-layout columns {extra}"
        )
    return extra[0]


def index_tombstones(spark: SparkSession, table_prefix: str):
    """The index's deleted-ids table (one ``id`` column), or None when
    no delete was ever recorded. Consulted by every probe/serve path —
    the retrieval layer must not resurrect what the storage layer
    deleted."""
    t = f"{table_prefix}_deleted"
    if not spark.catalog.tableExists(t):
        return None
    return spark.table(t)


def delete_from_index(
    spark: SparkSession,
    table_prefix: str,
    kind: str,
    ids,
    id_col: str,
) -> int:
    """Evict documents/vectors from a persisted index family —
    DV-style: the ids land in a ``<prefix>_deleted`` tombstone table
    that every probe anti-joins (O(batch) write, zero index rows
    touched), and the next ``compact_index`` purges them physically.
    This is the retrieval-layer twin of the snapshot layer's deletion
    vectors: a curation loop that admits AND evicts documents
    continuously needs the indexes to stop returning dead ids the
    moment the delete commits, without a rebuild.

    ``ids`` is any DataFrame carrying ``id_col``; duplicates and
    already-deleted ids collapse. For ``bm25`` the per-token df
    removals and the deleted docs' length stats are computed ONCE here
    (one scan of the postings index — index bytes, not corpus bytes)
    into ``<prefix>_deldf``, so serves can correct df/avgdl without
    re-scanning. Returns the number of NEW tombstones recorded."""
    if kind not in INDEX_FAMILY_TABLES:
        raise ValueError(
            f"unknown index kind {kind!r}; one of "
            f"{sorted(INDEX_FAMILY_TABLES)}"
        )
    from pyspark.sql import functions as F

    new = ids.select(F.col(id_col).alias("id")).dropDuplicates()
    t = f"{table_prefix}_deleted"
    existing = index_tombstones(spark, table_prefix)
    if existing is not None:
        new = new.join(existing, "id", "left_anti")
    new = new.localCheckpoint(eager=True)  # pin before any overwrite
    n_new = new.count()
    if not n_new:
        return 0
    if existing is None:
        # external table sited next to the family's data tables, so
        # the whole index stays one relocatable directory
        first_suffix = INDEX_FAMILY_TABLES[kind][0]
        lay = table_layout(spark, f"{table_prefix}_{first_suffix}")
        root = os.path.dirname(lay["location"].removeprefix("file:"))
        (
            new.coalesce(1).write.mode("overwrite")
            .option("path", os.path.join(root, "deleted"))
            .saveAsTable(t)
        )
    else:
        new.coalesce(1).write.mode("append").insertInto(t)

    if kind == "bm25":
        _record_bm25_delete_corrections(spark, table_prefix, new)
    return n_new


def _record_bm25_delete_corrections(
    spark: SparkSession, table_prefix: str, new_ids
) -> None:
    """Per-token df removals for a NEW tombstone batch, appended to
    ``<prefix>_deldf`` (vocab-sized at most). Serves subtract it from
    the stored df; doc-length corrections come straight from
    ``doclen`` ⋈ tombstones at serve time (doclen is bucketed by
    doc_id, the join is co-located)."""
    from pyspark.sql import functions as F

    postings = spark.table(f"{table_prefix}_postings")
    dfrm = (
        postings.join(
            F.broadcast(new_ids.withColumnRenamed("id", "doc_id")),
            "doc_id",
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("dfrm"))
        .localCheckpoint(eager=True)
    )
    t = f"{table_prefix}_deldf"
    if spark.catalog.tableExists(t):
        dfrm.write.mode("append").insertInto(t)
    else:
        lay = table_layout(spark, f"{table_prefix}_postings")
        root = os.path.dirname(lay["location"].removeprefix("file:"))
        (
            dfrm.coalesce(1).write.mode("overwrite")
            .option("path", os.path.join(root, "deldf"))
            .saveAsTable(t)
        )


def purge_index_deletes(
    spark: SparkSession, table_prefix: str, kind: str
) -> dict:
    """Physically remove tombstoned rows from every data table of the
    family (rewrite preserving the introspected layout — the purge
    half of ``compact_index``), then truncate the tombstone (and, for
    bm25, rewrite df/stats from the purged tables and truncate the
    correction table). Serve results are IDENTICAL before and after:
    probes already subtracted the tombstones logically."""
    from pyspark.sql import functions as F

    tomb = index_tombstones(spark, table_prefix)
    if tomb is None:
        return {}
    tomb = tomb.localCheckpoint(eager=True)  # survives the truncation
    stats = {}
    for suffix in INDEX_FAMILY_TABLES[kind]:
        table = f"{table_prefix}_{suffix}"
        if suffix not in INDEX_FAMILY_ID_COLS[kind]:
            # aggregate tables with no per-doc rows (bm25's df) are
            # rewritten from the purged tables below, not anti-joined
            stats[suffix] = compact_table(spark, table)
            continue
        idc = _table_id_col(
            spark, table, INDEX_FAMILY_ID_COLS[kind][suffix]
        )
        stats[suffix] = compact_table(
            spark, table,
            minus=(tomb.withColumnRenamed("id", idc), idc),
        )
    if kind == "bm25":
        _rewrite_bm25_aggregates(spark, table_prefix)
        _truncate_index_table(spark, f"{table_prefix}_deldf")
    _truncate_index_table(spark, f"{table_prefix}_deleted")
    return stats


def _truncate_index_table(spark: SparkSession, table: str) -> None:
    if not spark.catalog.tableExists(table):
        return
    lay = table_layout(spark, table)
    empty = spark.table(table).filter("1 = 0").localCheckpoint(eager=True)
    (
        empty.coalesce(1).write.mode("overwrite")
        .option("path", lay["location"]).saveAsTable(table)
    )


def _rewrite_bm25_aggregates(spark: SparkSession, table_prefix: str) -> None:
    """Recompute df and stats as pure functions of the PURGED postings
    / doclen tables — exact integers, so serve scores land bit-equal
    to the logically-corrected pre-purge serve."""
    from pyspark.sql import functions as F

    df_tbl = f"{table_prefix}_df"
    lay = table_layout(spark, df_tbl)
    from exceldatatransform_py_spark.sources.bucketing import write_bucketed

    merged = (
        spark.table(f"{table_prefix}_postings")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .localCheckpoint(eager=True)
    )
    write_bucketed(
        merged, df_tbl, lay["bucket_cols"], lay["n_buckets"],
        sort_cols=lay["sort_cols"] or None, path=lay["location"],
        mode="overwrite",
    )
    doclen = spark.table(f"{table_prefix}_doclen")
    agg = doclen.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").cast("bigint").alias("s"),
    ).first()
    n_docs, sum_dl = int(agg["n"] or 0), int(agg["s"] or 0)
    stats_lay = table_layout(spark, f"{table_prefix}_stats")
    (
        spark.createDataFrame(
            [(n_docs, sum_dl, (sum_dl / n_docs) if n_docs else 0.0)],
            "n_docs bigint, sum_dl bigint, avgdl double",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .option("path", stats_lay["location"])
        .saveAsTable(f"{table_prefix}_stats")
    )


def minus_tombstones(
    spark: SparkSession, table_prefix: str, df, id_col: str
):
    """Anti-join ``df`` against the index's tombstones on ``id_col``
    (a no-op when no delete was ever recorded). The one consultation
    point every probe/serve path routes through — tombstones are
    delete-batch-sized, so the anti-join broadcasts."""
    tomb = index_tombstones(spark, table_prefix)
    if tomb is None:
        return df
    from pyspark.sql import functions as F

    return df.join(
        F.broadcast(tomb.withColumnRenamed("id", id_col)),
        id_col, "left_anti",
    )
