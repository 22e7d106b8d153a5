"""Top-K per group (SURVEY.md §2.7 — sorts/limits/top-K).

The reference only ever sorts inside an aggregate
(``sorted(set(x))``, ``timesheet_transform.py:91``); the engine
exposes the general ranked-selection operator.

Scale note: ``row_number`` over (partition, order) does one shuffle
on the partition keys and keeps only K rows per group per partition
after the filter — no global sort. For K=1, ``max_by``-style
aggregation would avoid the window sort entirely; the window form is
kept for generality (ranks, ties, K>1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column | str],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the top ``k`` rows of each group under ``order_cols``.

    Pass fully deterministic ``order_cols`` (include a tiebreaker
    key) — otherwise the selected rows are run-dependent.
    ``rank_col`` optionally keeps the 1-based rank in the output.
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    name = rank_col or "__rank"
    ranked = df.withColumn(name, F.row_number().over(w)).filter(F.col(name) <= k)
    return ranked if rank_col else ranked.drop(name)
