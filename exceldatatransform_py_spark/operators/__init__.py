"""Composable DataFrame→DataFrame operators (SURVEY.md §2)."""

from exceldatatransform_py_spark.operators.lookup import lookup_with_default
from exceldatatransform_py_spark.operators.merge import (
    apply_changes,
    latest_changes,
    merge_full,
    merge_update,
)
from exceldatatransform_py_spark.operators.topk import top_k_per_group
from exceldatatransform_py_spark.operators.unpivot import (
    ITALIAN_DAY_OFFSETS,
    unpivot_measures,
    unpivot_weekdays,
)

__all__ = [
    "ITALIAN_DAY_OFFSETS",
    "unpivot_measures",
    "unpivot_weekdays",
    "lookup_with_default",
    "apply_changes",
    "latest_changes",
    "merge_full",
    "merge_update",
    "top_k_per_group",
]
