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
