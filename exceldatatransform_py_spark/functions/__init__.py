"""Column-expression helpers (SURVEY.md §2.2, §2.5, §2.6)."""

from exceldatatransform_py_spark.functions.columns import (
    clean_numeric,
    dec_avg,
    dec_sum,
    distinct_sorted_concat,
    last_token_lower,
    week_start_date,
)

__all__ = [
    "clean_numeric",
    "last_token_lower",
    "week_start_date",
    "distinct_sorted_concat",
    "dec_sum",
    "dec_avg",
]
