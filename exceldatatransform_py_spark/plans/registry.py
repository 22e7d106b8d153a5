"""The driver-scored query registry.

``QUERIES`` maps a name to a ``(spark, sf_dir) -> DataFrame`` plan;
``ORACLE`` holds the DuckDB twin for every SQL-expressible query
(same column names/types — the driver sorts columns by name and
hash-compares values). Query modules register themselves via the
``register`` decorator; ``plans.queries`` imports them all.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
