"""Empty-input robustness: every registered query must execute on
EMPTY tables (same schemas, zero rows) without raising — the
empty-delta / empty-partition case every production pipeline
eventually feeds. Queries may legitimately return rows on empty input
(e.g. the constraint audit reports zero violations); the contract is
no crash, no hang."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from exceldatatransform_py_spark.plans.queries import QUERIES
from exceldatatransform_py_spark.sources.readers import TABLES, read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf_dir(spark):
    d = tempfile.mkdtemp(prefix="empty_sf_")
    for t in TABLES:
        src = os.path.join(SF, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        # limit(0) keeps the exact schema, drops every row; single
        # parquet FILE (not dir) to mirror the testdata layout.
        import pyarrow.parquet as pq

        tbl = pq.read_table(src).slice(0, 0)
        pq.write_table(tbl, os.path.join(d, f"{t}.parquet"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_empty_input(spark, empty_sf_dir, name):
    df = QUERIES[name](spark, empty_sf_dir)
    df.count()  # any result is fine; raising is the failure
