"""exceldatatransform_py_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first restatement of the operator surface of
``FrancescoSodano/ExcelDataTransform.py`` (a pandas/openpyxl Excel
timesheet-ETL tool; see SURVEY.md), generalized to lazy, columnar
DataFrame/SQL plans and extended with window functions, set
operations, Structured Streaming, and LLM-data-pipeline operators
(dedup, similarity search, text analysis).

Layout:
    session    — tuned SparkSession builder (AQE, Arrow, UTC)
    sources    — readers/writers (S1–S7 in SURVEY.md §2.1)
    functions  — column-expression helpers (P2/P6/U2, §2.2/§2.6)
    operators  — composable DataFrame→DataFrame transforms
                 (unpivot, lookup-with-default, merge-update, top-k,
                 dedup, similarity, text ops)
    plans      — end-to-end query plans (reference pipeline + the
                 registered query set scored by the driver)
    streaming  — Structured Streaming windows/watermark/stateful ops
"""

from exceldatatransform_py_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
