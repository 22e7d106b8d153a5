"""Custom connector via the Python Data Source API (Spark 4).

The reference's input is a *workbook*: a container of named sheets
(``timesheet_transform.py:21-29`` reads every sheet and tags rows with
their origin). ``SheetDirDataSource`` is that container as a
first-class Spark source: a directory of ``*.csv`` "sheets" readable
with ``spark.read.format("sheetdir")``, one **input partition per
sheet** — so a 10k-sheet workbook ingests with 10k-way parallelism,
scheduled by Spark like any other scan, with sheet lineage built into
the rows (no driver-side loop over files, unlike the ``read_sheets``
CLI helper which unions per-file DataFrames in the driver).

Rows come out raw — ``(sheet, line_no, line)`` — because sheets are
schemaless by nature (the reference tolerates missing/extra columns
per sheet); downstream parsing composes with ``F.from_csv`` against
whatever schema the pipeline expects, keeping the error-tolerant
typing rules (P6) in one place.

This is the engine's template for ANY custom connector: implement
``DataSource.reader`` → ``partitions()``/``read()``, register once per
session, and the source participates in normal query planning. The
read path is executor-side Python yielding tuples; for throughput-
critical connectors return Arrow ``RecordBatch``es instead — same API.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class _SheetPartition(InputPartition):
    def __init__(self, path: str, sheet: str) -> None:
        self.path = path
        self.sheet = sheet


class SheetDirReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("sheetdir source requires option 'path'")
        self.dir = path
        self.skip_header = options.get("header", "true").lower() == "true"

    def partitions(self) -> list[InputPartition]:
        # one partition per sheet: the planner schedules sheets across
        # executors; a huge workbook parallelizes for free.
        return [
            _SheetPartition(os.path.join(self.dir, f), os.path.splitext(f)[0])
            for f in sorted(os.listdir(self.dir))
            if f.endswith(".csv")
        ]

    def read(self, partition: _SheetPartition) -> Iterator[tuple]:
        start = 1 if self.skip_header else 0
        with open(partition.path, encoding="utf-8") as fh:
            for i, line in enumerate(fh):
                if i < start:
                    continue
                yield (partition.sheet, i, line.rstrip("\n"))


class SheetDirStreamReader(SimpleDataSourceStreamReader):
    """Streaming flavor: sheets dropped into the directory AFTER the
    stream starts arrive as micro-batches. The offset is the sorted
    list of sheet files already emitted — replayable
    (``readBetweenOffsets`` re-reads exactly the files between two
    offsets), so checkpoint recovery gives the same exactly-once
    contract as the built-in file source."""

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("sheetdir source requires option 'path'")
        self.dir = path
        self.skip_header = options.get("header", "true").lower() == "true"

    def _sheets(self) -> list[str]:
        return sorted(
            f for f in os.listdir(self.dir) if f.endswith(".csv")
        )

    def _emit(self, files: list[str]) -> Iterator[tuple]:
        start = 1 if self.skip_header else 0
        for f in files:
            sheet = os.path.splitext(f)[0]
            with open(os.path.join(self.dir, f), encoding="utf-8") as fh:
                for i, line in enumerate(fh):
                    if i >= start:
                        yield (sheet, i, line.rstrip("\n"))

    def initialOffset(self) -> dict:
        return {"seen": []}

    def read(self, start: dict) -> tuple[list[tuple], dict]:
        # the simple stream API prefetches records driver-side and
        # PICKLES them to executors — return a materialized list, not
        # a generator. Right for control-plane-sized batches (new
        # sheets per trigger); a data-plane-scale streaming connector
        # uses the partition-planning DataSourceStreamReader instead.
        seen = set(start["seen"])
        now = self._sheets()
        new = [f for f in now if f not in seen]
        return iter(list(self._emit(new))), {"seen": now}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        seen = set(start["seen"])
        return iter(list(self._emit([f for f in end["seen"] if f not in seen])))

    def commit(self, end: dict) -> None:
        pass


class SheetDirDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sheetdir"

    def schema(self) -> str:
        return "sheet string, line_no int, line string"

    def reader(self, schema) -> SheetDirReader:
        return SheetDirReader(self.options)

    def simpleStreamReader(self, schema) -> SheetDirStreamReader:
        return SheetDirStreamReader(self.options)


def register(spark) -> None:
    """Register the connector on a session (idempotent)."""
    spark.dataSource.register(SheetDirDataSource)
