"""Streaming sinks: continuous MERGE-INTO ingestion (S5 × S7).

The reference's in-place workbook update (``timesheet_transform.py:
105-138``) applied once per manual run; the streaming restatement is
the same update-only merge applied continuously to a stored table as
micro-batches of updates arrive — the standard CDC/upsert ingestion
pattern of a warehouse pipeline.

Structured Streaming has no built-in merge sink, so this uses
``foreachBatch``: each micro-batch is a normal DataFrame handed to the
relational merge (``operators.merge.merge_update``) + rewrite. On
Delta/Iceberg the body of the batch function becomes
``MERGE INTO target USING batch WHEN MATCHED THEN UPDATE`` and the
full-table rewrite disappears (touched-file commits only); the
semantics here are identical.

Idempotency at scale: update-only merges are naturally idempotent
(re-applying the same update batch after a retry converges to the
same table state), so failure/replay of a micro-batch is safe without
transactional coordination — which is exactly why update-only MERGE is
the recommended shape for streaming upserts on object storage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter
from pyspark.sql.types import StructType

from exceldatatransform_py_spark.sources.writers import merge_update_write


def stream_merge_into(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    target_path: str,
    on: Sequence[str],
    update_cols: Sequence[str],
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    version_col: str | None = None,
) -> DataStreamWriter:
    """File-source update stream → update-only merge into ``target_path``.

    Per micro-batch: matched target rows get ``update_cols``
    overwritten from the batch, unmatched target rows are untouched,
    unmatched batch rows are discarded (the reference's "we don't
    create new rows", ``timesheet_transform_v3.py:105``). If a batch
    carries several updates for one key they are first collapsed to
    one row per key (J3's collapse-before-join, so one batch can
    never fan out target rows). With ``version_col`` (an event-time /
    sequence column) the collapse is latest-wins CDC: every update
    column comes from the single newest update row
    (``max_by(col, version)``). Without it the collapse falls back to
    independent per-column MAX — deterministic regardless of
    file/partition order, but a key updated twice in one batch can
    yield a row mixing columns from different updates; pass
    ``version_col`` whenever the source carries one.

    Returns the un-started ``DataStreamWriter``; the caller sets the
    checkpoint location and trigger, then ``.start()``s it.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        if version_col is not None:
            # struct-max = max_by(c, version) with a deterministic
            # tie-break on the value itself when versions collide.
            collapsed = batch_df.groupBy(*on).agg(
                *[
                    F.max(F.struct(version_col, c)).getField(c).alias(c)
                    for c in update_cols
                ]
            )
        else:
            collapsed = batch_df.groupBy(*on).agg(
                *[F.max(c).alias(c) for c in update_cols]
            )
        merge_update_write(
            batch_df.sparkSession,
            target_path,
            collapsed,
            on=on,
            update_cols=update_cols,
            fmt=fmt,
        )

    return stream.writeStream.foreachBatch(_apply)
