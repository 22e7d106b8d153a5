"""J5 — as-of (point-in-time) join.

For each left row, attach the most recent right row with the same key
whose timestamp is ≤ the left timestamp. The classic implementations
are per-key sorted merges; the Spark-native restatement used here is
the union + last-non-null-window trick:

1. tag right rows 0 and left rows 1 (at equal timestamps the right
   row must sort FIRST so the left row can see it — "at or before");
2. union by name over (key, ts, tag, payload columns);
3. one window per key ordered by (ts, tag):
   ``last(value, ignorenulls=True)`` over unbounded-preceding rows
   carries the latest right payload forward;
4. keep only left rows.

Cost model: ONE shuffle of |L|+|R| rows on the key (same as any
shuffle join) and a per-partition sort — no per-key explosion, no
range multiplication, no driver loop; skewed keys are handled by AQE
like any other shuffle. This scales to arbitrarily many rows per key,
unlike an interval self-join which multiplies candidates.

DuckDB oracle twin: native ``ASOF LEFT JOIN`` (right side must be
unique per (key, ts) for determinism — pre-aggregate it).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Left as-of join: every left row, plus the latest ``value_cols``
    from the right row at-or-before its timestamp (NULLs when none).

    ``right`` must be unique per (key, ts) — callers pre-aggregate;
    a duplicate would make "the" latest row ambiguous.
    """
    l_payload = [c for c in left.columns]
    l = left.select(
        F.col(left_key).alias("__key"),
        F.col(left_ts).cast("timestamp_ntz").alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in l_payload],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    r = right.select(
        F.col(right_key).alias("__key"),
        F.col(right_ts).cast("timestamp_ntz").alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_payload],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = l.unionByName(r)
    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__is_left",
        *l_payload,
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    return carried.filter(F.col("__is_left") == 1).drop("__is_left")
