"""The reference pipeline, restated as two lazy Spark plans.

Phase 1 (``build_daily_ledger``) ≙ ``build_records_from_timesheet``
(``timesheet_transform.py:10-96``): multi-sheet union → week parse →
lookup with passthrough → surname extraction → weekday unpivot →
daily aggregation.

Phase 2 (``merge_ledger_into_target``) ≙ ``update_strategie_in_place``
(``timesheet_transform.py:98-138``): update-only merge on
(lower(surname), date).

The pandas reference walks rows one at a time (``iterrows``,
``:43``) on a single thread; here the same semantics compile to one
Catalyst plan per phase — scan → Expand (unpivot) → filter →
broadcast join → partial+final hash aggregate — that parallelizes
over arbitrarily many partitions.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from exceldatatransform_py_spark.functions.columns import (
    dec_sum,
    distinct_sorted_concat,
    last_token_lower,
    week_start_date,
)
from exceldatatransform_py_spark.operators.lookup import lookup_with_default
from exceldatatransform_py_spark.operators.merge import merge_update
from exceldatatransform_py_spark.operators.unpivot import unpivot_weekdays
from exceldatatransform_py_spark.sources.readers import scan_sheets_with_lineage


def build_daily_ledger(
    sheets: Mapping[str, DataFrame] | DataFrame,
    mapping: DataFrame,
    week_range_col: str = "WeekRange",
    code_col: str = "Codice Commessa",
    author_col: str = "Autore",
) -> DataFrame:
    """Weekly wide timesheets → daily long ledger.

    Output schema: ``(data date, surname string, commessa string,
    ore double)`` where ``commessa`` is the "; "-joined sorted
    distinct code list and ``ore`` the summed hours — exactly the
    aggregate at ``timesheet_transform.py:90-93``.
    """
    if isinstance(sheets, DataFrame):
        df = sheets
    else:
        df = scan_sheets_with_lineage(sheets, synthesize_col=code_col)

    df = (
        df.withColumn("week_start", week_start_date(F.col(week_range_col)))
        # P3/P6: malformed WeekRange rows are skipped (":45-52").
        .filter(F.col("week_start").isNotNull())
        .withColumn("surname", last_token_lower(F.col(author_col)))
    )
    # J1: unmatched codes pass through unchanged (":56").
    df = lookup_with_default(df, mapping, key_col=code_col, out_col="commessa")

    long = unpivot_weekdays(
        df,
        week_start_col="week_start",
        ids=["surname", "commessa"],
        date_col="data",
        hours_col="ore",
    )
    # A2: per (date, surname) — distinct-sorted code concat + hour sum.
    return long.groupBy("data", "surname").agg(
        distinct_sorted_concat("commessa").alias("commessa"),
        dec_sum("ore").alias("ore"),
    )


def merge_ledger_into_target(target: DataFrame, ledger: DataFrame) -> DataFrame:
    """Update-only merge of the daily ledger into a per-person target
    table ``(surname, data, commessa, ore, ...)``.

    Surname matching is case-insensitive (``timesheet_transform.py:109``)
    and dates compare at day granularity (``:127``): both sides are
    normalized before the join; the target's original surname casing
    is preserved in the output.
    """
    t = target.withColumn("__key_surname", F.lower(F.col("surname"))).withColumn(
        "__key_data", F.to_date(F.col("data"))
    )
    u = (
        ledger.withColumn("__key_surname", F.lower(F.col("surname")))
        .withColumn("__key_data", F.to_date(F.col("data")))
        # J3: one row per key before the merge.
        .groupBy("__key_surname", "__key_data")
        .agg(
            distinct_sorted_concat("commessa").alias("commessa"),
            dec_sum("ore").alias("ore"),
        )
    )
    merged = merge_update(
        t,
        u,
        on=["__key_surname", "__key_data"],
        update_cols=["commessa", "ore"],
    )
    return merged.drop("__key_surname", "__key_data")
