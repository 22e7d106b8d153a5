"""U1 — wide→long unpivot (the reference's signature operator).

Reference: ``timesheet_transform.py:63-82`` — an inner Python loop
emits one record per nonzero weekday cell, computing
``DATA = week_start + timedelta(days=offset)`` from a hardcoded
Italian weekday→offset dict (``:32-40``) and dropping NULL/zero cells
(``:75``).

Spark restatement: ``DataFrame.unpivot`` (codegen'd ``Expand`` node —
one pass over the input, no shuffle), offsets resolved via a literal
``map`` column (constant-folded), date computed with ``date_add``.
Scale note: Expand multiplies rows 7× *before* the filter; Catalyst
pushes the null/zero filter directly on top of the generator, so the
blow-up never hits a shuffle boundary.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from itertools import chain

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from exceldatatransform_py_spark.functions.columns import clean_numeric

#: timesheet_transform.py:32-40 — Italian weekday → day offset.
ITALIAN_DAY_OFFSETS: dict[str, int] = {
    "Lunedì": 0,
    "Martedì": 1,
    "Mercoledì": 2,
    "Giovedì": 3,
    "Venerdì": 4,
    "Sabato": 5,
    "Domenica": 6,
}


def unpivot_measures(
    df: DataFrame,
    ids: Sequence[str],
    values: Sequence[str],
    var_col: str = "measure",
    value_col: str = "value",
) -> DataFrame:
    """Generic wide→long melt over same-typed value columns.

    Equivalent SQL: one ``SELECT ids, 'c' AS var, c AS value`` per
    value column, UNION ALL'd — but executed as a single-scan Expand.
    """
    return df.unpivot(list(ids), list(values), var_col, value_col)


def unpivot_weekdays(
    df: DataFrame,
    week_start_col: str,
    day_offsets: Mapping[str, int] | None = None,
    ids: Sequence[str] = (),
    date_col: str = "data",
    hours_col: str = "ore",
) -> DataFrame:
    """Melt weekday columns into ``(date_col, hours_col)`` rows.

    Semantics pinned to the reference:
      * a cell that is NULL is dropped (``pd.notna``, ``:75``);
      * a cell whose cleaned value is 0 or unparseable is dropped
        (``float()`` fail → 0.0 → ``!= 0.0``, ``:70-75``);
      * the emitted date is ``week_start + offset`` where offset is
        the weekday column's ordinal (``:76``).

    ``week_start_col`` must already be a date column (see
    ``functions.week_start_date`` for the U2 parse); rows with a NULL
    week start were already "skipped" upstream.
    """
    offsets = dict(day_offsets or ITALIAN_DAY_OFFSETS)
    day_cols = [c for c in offsets if c in df.columns]
    if not day_cols:
        raise ValueError("unpivot_weekdays: no weekday columns present")

    # Value columns must share one type for unpivot: go through string,
    # then apply the reference's dirty-numeric cleaning per cell.
    prepared = df.select(
        *[F.col(c) for c in ids],
        F.col(week_start_col),
        *[F.col(c).cast("string").alias(c) for c in day_cols],
    )
    long = prepared.unpivot(
        [*ids, week_start_col], day_cols, "weekday", "raw_hours"
    )

    offset_map = F.create_map(
        *list(chain.from_iterable((F.lit(d), F.lit(o)) for d, o in offsets.items()))
    )
    hours = clean_numeric(F.col("raw_hours"), default=0.0)
    return (
        long.withColumn(hours_col, hours)
        .filter(F.col("raw_hours").isNotNull() & (F.col(hours_col) != 0.0))
        .withColumn(
            date_col,
            F.date_add(
                F.col(week_start_col), F.element_at(offset_map, F.col("weekday"))
            ),
        )
        .select(*ids, date_col, hours_col)
    )
