"""J1 — broadcast lookup join with unmatched-key passthrough.

Reference: ``timesheet_transform.py:56`` —
``commessa_map.get(codice, codice)``: a per-row Python dict probe
where a key absent from the mapping keeps its *original value* (not
NULL, not dropped).

Spark restatement: left join against the (broadcast) mapping dim +
``coalesce(mapped, original)``. At scale the dict-probe becomes a
broadcast hash join: the mapping ships once per executor, the fact
side streams through with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lookup_with_default(
    df: DataFrame,
    mapping: DataFrame,
    key_col: str,
    map_key: str | None = None,
    map_value: str | None = None,
    out_col: str | None = None,
    broadcast: bool = True,
) -> DataFrame:
    """Replace ``df[key_col]`` by its mapped value, keeping the
    original for unmatched keys.

    ``map_key``/``map_value`` default to the mapping's first two
    columns (the reference reads exactly ``df_map.iloc[:, 0/1]``,
    ``timesheet_transform.py:17-18``). The mapping must be unique per
    key — a Python dict collapses duplicate keys; callers with dups
    should pre-aggregate (e.g. keep an arbitrary or latest value),
    otherwise the join would multiply fact rows.

    Set ``broadcast=False`` only if the mapping is too large to
    broadcast; AQE may still pick a broadcast join from observed size.
    """
    map_key = map_key or mapping.columns[0]
    map_value = map_value or mapping.columns[1]
    out_col = out_col or key_col

    m = mapping.select(
        F.col(map_key).alias("__lookup_key"), F.col(map_value).alias("__lookup_val")
    )
    if broadcast:
        m = F.broadcast(m)

    # dict.get(k, k) is heterogeneously typed in Python; relationally the
    # fallback key must be cast to the mapping-value type (ANSI coercion
    # would otherwise pick a numeric common type and fail on real labels).
    val_type = m.schema["__lookup_val"].dataType
    key_type = df.schema[key_col].dataType
    fallback = df[key_col] if key_type == val_type else df[key_col].cast(val_type)

    joined = df.join(m, df[key_col] == F.col("__lookup_key"), "left")
    replaced = joined.withColumn(
        out_col, F.coalesce(F.col("__lookup_val"), fallback)
    )
    return replaced.drop("__lookup_key", "__lookup_val")
