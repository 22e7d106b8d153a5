"""Skew mitigation: salting (manual two-phase repartitioning).

AQE's skew-join splitting handles most skew automatically; salting is
the explicit tool for the cases AQE can't re-plan — hot keys in
aggregations feeding a single reducer, or joins where one key holds a
double-digit percent of all rows. Both transforms here are
semantics-preserving (their oracle twin is the plain GROUP BY / JOIN)
because the aggregates used are associative.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    sum_col: str,
    salt_buckets: int = 16,
    sum_alias: str = "sum_value",
    count_alias: str = "n_rows",
    precision: int = 12,
    scale: int = 2,
) -> DataFrame:
    """Two-phase salted aggregation: ``groupBy(keys + salt)`` partials
    (spreads each hot key over ``salt_buckets`` reducers) then
    ``groupBy(keys)`` finals over the tiny partial table.

    The salt is a deterministic hash of the row's whole content
    (``spark_partition_id`` would break retry-determinism; random
    would break replay). Decimal sums keep the two-phase result
    bit-identical to a single-phase GROUP BY.

    Note Spark's own hash aggregate already does partial+final combine
    per partition — salting matters when the DATA layout (e.g. one key
    = 30% of rows after an upstream join) makes even the combined
    partials skew; it buys even reducer fan-in at the cost of one
    extra (cheap) shuffle over the partial rows.
    """
    salt = (F.abs(F.hash(*[F.col(c) for c in df.columns])) % salt_buckets).alias(
        "__salt"
    )
    partial = (
        df.select(*df.columns, salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.sum(F.col(sum_col).cast(f"decimal({precision},{scale})")).alias("__ps"),
            F.count(F.lit(1)).alias("__pc"),
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("__ps").cast("double").alias(sum_alias),
        F.sum("__pc").alias(count_alias),
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Skewed-key equi-join: salt the (big, skewed) left side into
    ``salt_buckets`` sub-keys and EXPLODE the right side once per salt
    value, so a hot key's rows spread over ``salt_buckets`` tasks
    instead of one straggler.

    Right-side replication costs |R| × salt_buckets rows — use only
    when R is much smaller than the skewed L (the classic recipe).
    Results are row-identical to the plain join.
    """
    salt_l = (F.abs(F.hash(*[F.col(c) for c in left.columns])) % salt_buckets).alias(
        "__salt"
    )
    l = left.select(*left.columns, salt_l)
    r = right.select(
        *right.columns,
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("__salt"),
    )
    return l.join(r, [*on, "__salt"], how).drop("__salt")
