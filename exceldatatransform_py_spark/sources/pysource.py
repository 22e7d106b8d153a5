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

import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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


@dataclass
class _SheetCommit(WriterCommitMessage):
    files: list  # [(tmp_path, final_name)] staged by one task


class SheetDirWriter(DataSourceWriter):
    """Transactional sheet-per-key sink — the reference's one-sheet-
    per-surname output (S4) as a custom connector with the full
    two-phase commit protocol: every task stages its rows into
    uniquely-named temp files and reports them in its commit message;
    only the DRIVER's ``commit`` publishes them (atomic renames), and
    ``abort`` removes the staged files — a failed or speculative task
    can never leave a partial sheet visible. Rows must carry
    ``(sheet, line)``; one output CSV per sheet value per task, so
    pre-``repartition(sheet)`` for exactly one file per sheet."""

    def __init__(self, options: dict, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("sheetdir sink requires option 'path'")
        self.dir = path
        self.overwrite = overwrite
        self.stage = os.path.join(path, "_staging")

    def write(self, rows) -> _SheetCommit:
        os.makedirs(self.stage, exist_ok=True)
        handles: dict = {}
        task = uuid.uuid4().hex[:12]
        staged = []
        for r in rows:
            sheet = r["sheet"]
            if sheet not in handles:
                tmp = os.path.join(self.stage, f"{sheet}-{task}.csv.tmp")
                handles[sheet] = open(tmp, "w", encoding="utf-8")
                staged.append((tmp, f"{sheet}.csv"))
            handles[sheet].write(r["line"] + "\n")
        for h in handles.values():
            h.close()
        return _SheetCommit(files=staged)

    def commit(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            for tmp, final in m.files:
                os.replace(tmp, os.path.join(self.dir, final))
        shutil.rmtree(self.stage, ignore_errors=True)

    def abort(self, messages) -> None:
        shutil.rmtree(self.stage, ignore_errors=True)


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

    def writer(self, schema, overwrite: bool) -> SheetDirWriter:
        return SheetDirWriter(self.options, overwrite)


def register(spark) -> None:
    """Register the connector on a session (idempotent)."""
    spark.dataSource.register(SheetDirDataSource)
