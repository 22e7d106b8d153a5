"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (the reference pipeline restated on
testdata — SURVEY.md §7) at sf0.001. ``queries``/``oracle_sql``
expose the full registry in
``exceldatatransform_py_spark.plans.queries``; every SQL-expressible
operator has a DuckDB oracle twin with matching column aliases.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from exceldatatransform_py_spark.plans.queries import ORACLE, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["flagship_daily_segment_ledger"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins (same column aliases as the Spark plans)."""
    return dict(ORACLE)
