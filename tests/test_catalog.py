"""Catalog / managed-table surface: the SQL-DDL lifecycle a warehouse
user expects — partitioned managed tables, INSERT INTO, partition
enumeration, partition-pruned scans, and clean teardown. Partition
pruning on a catalog table is the table-format analogue of the DPP
plan test: the scan must touch only the partitions the predicate
names (at 100 TB, the difference between one partition and all of
them)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F


def test_partitioned_managed_table_lifecycle(spark):
    spark.sql("DROP TABLE IF EXISTS edt_orders_by_status")
    try:
        spark.sql(
            """
            CREATE TABLE edt_orders_by_status (
              o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING
            ) USING parquet PARTITIONED BY (o_orderstatus)
            """
        )
        src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        (
            src.select("o_orderkey", "o_totalprice", "o_orderstatus")
            .write.mode("append")
            .insertInto("edt_orders_by_status")
        )

        parts = {
            r[0] for r in spark.sql(
                "SHOW PARTITIONS edt_orders_by_status"
            ).collect()
        }
        statuses = {r[0] for r in src.select("o_orderstatus").distinct().collect()}
        assert parts == {f"o_orderstatus={s}" for s in statuses}

        # partition-pruned read: the predicate must land in the scan's
        # PartitionFilters, not a post-scan Filter over all partitions.
        q = spark.table("edt_orders_by_status").filter(
            F.col("o_orderstatus") == "F"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            q.explain("formatted")
        plan = buf.getvalue()
        assert "PartitionFilters" in plan
        pf_line = plan.split("PartitionFilters")[1].splitlines()[0]
        assert "o_orderstatus" in pf_line
        assert q.count() == src.filter(F.col("o_orderstatus") == "F").count()

        # INSERT INTO appends; counts must accumulate per partition.
        one = src.filter(F.col("o_orderstatus") == "F").limit(1).select(
            "o_orderkey", "o_totalprice", "o_orderstatus"
        )
        one.write.mode("append").insertInto("edt_orders_by_status")
        assert (
            spark.table("edt_orders_by_status")
            .filter(F.col("o_orderstatus") == "F")
            .count()
            == src.filter(F.col("o_orderstatus") == "F").count() + 1
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS edt_orders_by_status")
    assert not spark.catalog.tableExists("edt_orders_by_status")


def test_observation_metrics_without_second_scan(spark):
    """DataFrame.observe: pipeline health metrics (row counts, sums,
    null counts) ride along the SAME action — no second scan of a
    100 TB input just to count rows. The observed values must match a
    direct computation."""
    from pyspark.sql import Observation

    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    obs = Observation("ingest_stats")
    df = src.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("total"),
        F.sum(F.col("o_custkey").isNull().cast("int")).alias("null_keys"),
    )
    n_out = df.filter(F.col("o_totalprice") > 0).count()  # the real action
    got = obs.get
    assert got["n_rows"] == src.count()
    assert got["null_keys"] == 0
    assert n_out <= got["n_rows"]
    direct = src.agg(
        F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
    ).collect()[0][0]
    assert got["total"] == direct


def test_dynamic_partition_overwrite_replaces_only_touched(spark, tmp_path):
    """partitionOverwriteMode=dynamic: an overwrite that produces rows
    for ONE partition must replace only that partition and leave the
    rest intact — the idempotent daily-backfill write at 100 TB
    (static mode would wipe every partition first)."""
    import os

    d = os.path.join(str(tmp_path), "dynpart")
    base = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B")], "id long, part string"
    )
    base.write.partitionBy("part").mode("overwrite").parquet(d)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        redo_a = spark.createDataFrame([(9, "A")], "id long, part string")
        redo_a.write.partitionBy("part").mode("overwrite").parquet(d)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    got = {(r["id"], r["part"]) for r in spark.read.parquet(d).collect()}
    assert got == {(9, "A"), (3, "B")}  # B untouched, A replaced


def test_metadata_column_file_lineage(spark, tmp_path):
    """The hidden `_metadata` column gives file-level lineage on any
    parquet scan — per-file row counts without a custom reader, the
    provenance a 100 TB multi-source lake needs for blame/rollback."""
    import os

    d = os.path.join(str(tmp_path), "lineage")
    spark.range(0, 10).coalesce(1).write.mode("append").parquet(d)
    spark.range(10, 30).coalesce(1).write.mode("append").parquet(d)

    per_file = (
        spark.read.parquet(d)
        .select("id", F.col("_metadata.file_name").alias("src_file"))
        .groupBy("src_file")
        .count()
    )
    rows = per_file.collect()
    assert {r["count"] for r in rows} == {10, 20}
    assert all(r["src_file"].endswith(".parquet") for r in rows)


def test_analyze_table_statistics_visible(spark):
    """ANALYZE TABLE must land row/size statistics in the catalog —
    the input the cost-based optimizer uses for join ordering and
    broadcast decisions on tables too big to inspect at plan time."""
    spark.sql("DROP TABLE IF EXISTS edt_stats_demo")
    try:
        spark.read.parquet("/root/testdata/sf0.001/customer.parquet") \
            .write.saveAsTable("edt_stats_demo")
        spark.sql(
            "ANALYZE TABLE edt_stats_demo COMPUTE STATISTICS FOR COLUMNS c_custkey"
        )
        detail = {
            r["col_name"]: r["data_type"]
            for r in spark.sql("DESCRIBE EXTENDED edt_stats_demo").collect()
        }
        assert "Statistics" in detail and "rows" in detail["Statistics"]
        col = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(
                "DESCRIBE EXTENDED edt_stats_demo c_custkey"
            ).collect()
        }
        assert col.get("distinct_count") not in (None, "NULL")
    finally:
        spark.sql("DROP TABLE IF EXISTS edt_stats_demo")
