"""Unit tests pinning the reference's quirky semantics on tiny
literal DataFrames (FIXTURES.md layer A).

Each test names the reference behavior it pins
(``timesheet_transform.py`` line refs in the operator docstrings).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from exceldatatransform_py_spark.functions.columns import (
    clean_numeric,
    last_token_lower,
    week_start_date,
)
from exceldatatransform_py_spark.operators.lookup import lookup_with_default
from exceldatatransform_py_spark.operators.merge import merge_update
from exceldatatransform_py_spark.operators.unpivot import unpivot_weekdays
from exceldatatransform_py_spark.plans.pipeline import (
    build_daily_ledger,
    merge_ledger_into_target,
)
from exceldatatransform_py_spark.sources.readers import scan_sheets_with_lineage

D = datetime.date


@pytest.fixture(scope="module")
def timesheet(spark):
    """A1 fixture: one good week, one malformed WeekRange, dirty
    numeric cells, an empty author, a code missing from the mapping."""
    rows = [
        # Pietro Fava: Mon 8h, Tue dirty-string 4h, Wed 0 (dropped),
        # Thu NULL (dropped), mapped code.
        ("03/03/2025 al 09/03/2025", "I112", "Pietro Fava",
         "8", "4\xa0", "0", None, None, None, None),
        # Anna De Rossi: surname = last token only; unmapped code
        # passes through; Sunday cell exercises offset 6.
        ("03/03/2025 al 09/03/2025", "ZZZ9", "Anna De Rossi",
         None, None, None, None, None, None, "2.5"),
        # malformed WeekRange (no ' al ') → whole row skipped.
        ("bad-week", "I112", "Pietro Fava",
         "8", "8", "8", "8", "8", "8", "8"),
        # unparseable left date → skipped.
        ("99/99/2025 al 09/03/2025", "I112", "Pietro Fava",
         "8", None, None, None, None, None, None),
        # empty author → surname 'unknown'.
        ("03/03/2025 al 09/03/2025", "I112", "  ",
         None, "1", None, None, None, None, None),
    ]
    cols = ["WeekRange", "Codice Commessa", "Autore",
            "Lunedì", "Martedì", "Mercoledì", "Giovedì",
            "Venerdì", "Sabato", "Domenica"]
    return spark.createDataFrame(rows, cols)


@pytest.fixture(scope="module")
def mapping(spark):
    return spark.createDataFrame(
        [("I112", "23WP030 Sa-Rc")], ["codice", "label"]
    )


def test_week_start_date_semantics(spark):
    df = spark.createDataFrame(
        [("03/03/2025 al 09/03/2025",), ("bad",), ("99/99/2025 al x",),
         (" 3/3/2025 al 9/3/2025 ",), (None,)],
        ["wr"],
    )
    got = [r[0] for r in df.select(week_start_date("wr")).collect()]
    assert got == [D(2025, 3, 3), None, None, D(2025, 3, 3), None]


def test_last_token_lower(spark):
    df = spark.createDataFrame(
        [("Pietro Fava",), ("Anna De Rossi",), ("  ",), (None,), ("Solo",)],
        ["autore"],
    )
    got = [r[0] for r in df.select(last_token_lower("autore")).collect()]
    assert got == ["fava", "rossi", "unknown", "unknown", "solo"]


def test_clean_numeric_dirty_cells(spark):
    df = spark.createDataFrame(
        [("8\xa0",), (" 4.5 ",), ("x",), ("",), (None,)], ["v"]
    )
    got = [r[0] for r in df.select(clean_numeric("v")).collect()]
    assert got == [8.0, 4.5, 0.0, 0.0, 0.0]
    got_null = [r[0] for r in df.select(clean_numeric("v", default=None)).collect()]
    assert got_null == [8.0, 4.5, None, None, None]


def test_lookup_passthrough(spark, mapping):
    df = spark.createDataFrame([("I112",), ("ZZZ9",), (None,)], ["code"])
    out = lookup_with_default(df, mapping, key_col="code")
    got = sorted(r[0] for r in out.collect() if r[0] is not None)
    # matched → label; unmatched → original; NULL key → NULL (dict.get
    # on NaN never matches and the original value is NaN/NULL).
    assert got == ["23WP030 Sa-Rc", "ZZZ9"]


def test_unpivot_weekdays_drops_null_and_zero(spark):
    df = spark.createDataFrame(
        [(D(2025, 3, 3), "8", "0", None, "x", None, None, "2.5")],
        "ws date, `Lunedì` string, `Martedì` string, `Mercoledì` string, "
        "`Giovedì` string, `Venerdì` string, `Sabato` string, `Domenica` string",
    )
    out = unpivot_weekdays(df, week_start_col="ws").orderBy("data")
    got = [(r["data"], r["ore"]) for r in out.collect()]
    # Mon 8h kept; Tue 0 dropped; Wed NULL dropped; Thu unparseable →
    # 0.0 → dropped; Sun 2.5h at offset 6.
    assert got == [(D(2025, 3, 3), 8.0), (D(2025, 3, 9), 2.5)]


def test_sheet_union_synthesizes_code_from_name(spark):
    s1 = spark.createDataFrame([("a", 1.0)], ["Autore", "Lunedì"])
    s2 = spark.createDataFrame(
        [("b", 2.0, "K001")], ["Autore", "Lunedì", "Codice Commessa"]
    )
    out = scan_sheets_with_lineage(
        {"SheetX": s1, "SheetY": s2}, synthesize_col="Codice Commessa"
    )
    got = {r["Autore"]: (r["Codice Commessa"], r["source_sheet"])
           for r in out.collect()}
    assert got == {"a": ("SheetX", "SheetX"), "b": ("K001", "SheetY")}


def test_build_daily_ledger_golden(spark, timesheet, mapping):
    ledger = build_daily_ledger(timesheet, mapping)
    got = {
        (r["data"], r["surname"]): (r["commessa"], r["ore"])
        for r in ledger.collect()
    }
    assert got == {
        # Pietro Fava, Monday: 8h mapped code.
        (D(2025, 3, 3), "fava"): ("23WP030 Sa-Rc", 8.0),
        # Pietro Fava, Tuesday: dirty '4\xa0' cleaned.
        (D(2025, 3, 4), "fava"): ("23WP030 Sa-Rc", 4.0),
        # empty author, Tuesday.
        (D(2025, 3, 4), "unknown"): ("23WP030 Sa-Rc", 1.0),
        # Anna De Rossi, Sunday: unmapped code passes through.
        (D(2025, 3, 9), "rossi"): ("ZZZ9", 2.5),
    }


def test_merge_update_only_touches_matches(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["k", "label", "val"],
    )
    updates = spark.createDataFrame(
        [(2, "B!", 99.0), (4, "D!", 44.0)], ["k", "label", "val"]
    )
    out = merge_update(target, updates, on=["k"], update_cols=["label", "val"])
    got = {r["k"]: (r["label"], r["val"]) for r in out.collect()}
    # matched row overwritten; unmatched target rows untouched;
    # unmatched source row (k=4) discarded — never inserted.
    assert got == {1: ("a", 10.0), 2: ("B!", 99.0), 3: ("c", 30.0)}


def test_merge_ledger_case_insensitive_day_granularity(spark):
    target = spark.createDataFrame(
        [("FAVA", datetime.datetime(2025, 3, 3, 9, 30), "old", 1.0),
         ("FAVA", datetime.datetime(2025, 3, 8, 0, 0), "keep", 2.0)],
        ["surname", "data", "commessa", "ore"],
    )
    ledger = spark.createDataFrame(
        [("fava", D(2025, 3, 3), "X1", 5.0),
         ("fava", D(2025, 3, 3), "X2", 3.0),
         ("fava", D(2025, 3, 20), "X3", 9.0)],
        ["surname", "data", "commessa", "ore"],
    )
    out = merge_ledger_into_target(target, ledger)
    got = {r["data"].date() if isinstance(r["data"], datetime.datetime)
           else r["data"]: (r["surname"], r["commessa"], r["ore"])
           for r in out.collect()}
    # 2025-03-03: surname matches case-insensitively at day
    # granularity; the two ledger rows re-aggregate (J3) to
    # 'X1; X2' / 8h; target's original casing is preserved.
    assert got[D(2025, 3, 3)] == ("FAVA", "X1; X2", 8.0)
    # 2025-03-08: no source match → untouched.
    assert got[D(2025, 3, 8)] == ("FAVA", "keep", 2.0)
    # ledger's 2025-03-20 row: discarded, no new target row.
    assert len(got) == 2


def test_salted_join_matches_plain_join(spark):
    from exceldatatransform_py_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(i % 3, i) for i in range(200)], "k int, v int"
    )
    right = spark.createDataFrame([(0, "x"), (1, "y"), (5, "z")], "k int, lab string")
    plain = {(r["k"], r["v"], r["lab"])
             for r in left.join(right, ["k"]).collect()}
    salted = {(r["k"], r["v"], r["lab"])
              for r in salted_join(left, right, on=["k"]).collect()}
    assert salted == plain and len(plain) == 134
