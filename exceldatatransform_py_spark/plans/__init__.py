"""End-to-end plans: the restated reference pipeline and the
driver-scored query registry."""

from exceldatatransform_py_spark.plans.pipeline import (
    build_daily_ledger,
    merge_ledger_into_target,
)
from exceldatatransform_py_spark.plans.queries import ORACLE, QUERIES

__all__ = [
    "build_daily_ledger",
    "merge_ledger_into_target",
    "QUERIES",
    "ORACLE",
]
