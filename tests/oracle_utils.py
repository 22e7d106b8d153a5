"""Local mirror of the driver's correctness gate: run a registered
Spark query and its DuckDB oracle twin on the same parquet tables and
compare row count, column names, and an order-insensitive cell-exact
canonicalization."""

from __future__ import annotations

import datetime
import math
import os

import duckdb

from exceldatatransform_py_spark.sources.readers import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    """Column-name-sorted, row-sorted canonical form."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        tuple(_canon_cell(row[i]) for i in order) for row in rows
    )


def compare_with_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    sp_rows = [tuple(r) for r in spark_df.collect()]
    sp_cols = list(spark_df.columns)

    con = duck_connection(sf_dir)
    cur = con.execute(oracle_sql)
    du_cols = [d[0] for d in cur.description]
    du_rows = cur.fetchall()

    assert sorted(sp_cols) == sorted(du_cols), (
        f"column mismatch: spark={sorted(sp_cols)} duckdb={sorted(du_cols)}"
    )
    assert len(sp_rows) == len(du_rows), (
        f"row count mismatch: spark={len(sp_rows)} duckdb={len(du_rows)}"
    )
    sp_canon = canon_rows(sp_cols, sp_rows)
    du_canon = canon_rows(du_cols, du_rows)
    if sp_canon != du_canon:
        diffs = [
            (a, b) for a, b in zip(sp_canon, du_canon) if a != b
        ][:5]
        raise AssertionError(f"value mismatch; first diffs: {diffs}")
