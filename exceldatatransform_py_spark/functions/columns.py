"""Scalar / aggregate expression helpers.

Everything here is a pure Column expression built from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd, no
Python UDFs — restating the reference's per-row Python string/number
munging (SURVEY.md §2.6) as vectorized expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# P6 — error-tolerant numeric cleaning.
# Reference: timesheet_transform.py:66-73 — strip non-breaking spaces
# ('\xa0') and whitespace from string cells, float() with bad → 0.0.
# ---------------------------------------------------------------------------


def clean_numeric(col: Column | str, default: float | None = 0.0) -> Column:
    """Dirty-string → double with a default for unparseable values.

    ``try_cast`` keeps the expression ANSI-safe (no job-failing cast
    errors at scale); ``default=None`` yields NULL for bad values so
    callers can route a bad-row side channel via ``isNull``.
    """
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.trim(F.regexp_replace(c.cast("string"), "[\\s\\u00a0\\u2007\\u202f]+", ""))
    casted = cleaned.try_cast("double")
    if default is None:
        return casted
    return F.coalesce(casted, F.lit(float(default)))


# ---------------------------------------------------------------------------
# P2 — surname extraction.
# Reference: timesheet_transform.py:59-60 —
#   autore.split()[-1].lower() if autore else "unknown"
# ---------------------------------------------------------------------------


def last_token_lower(col: Column | str, default: str = "unknown") -> Column:
    """Last whitespace-separated token, lowercased; ``default`` when
    the trimmed input is empty or NULL."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c.cast("string"))
    token = F.lower(F.element_at(F.split(trimmed, r"\s+"), -1))
    return F.when(trimmed.isNull() | (trimmed == ""), F.lit(default)).otherwise(token)


# ---------------------------------------------------------------------------
# U2 — week-range string → start date.
# Reference: timesheet_transform.py:44-52 — "DD/MM/YYYY al DD/MM/YYYY",
# dayfirst parse of the left half; malformed rows are skipped.
# ---------------------------------------------------------------------------


def week_start_date(col: Column | str, separator: str = " al ") -> Column:
    """Parse the start date out of a dayfirst compound range string.

    Returns NULL for strings without the separator or with an
    unparseable left half — callers filter ``isNotNull`` to get the
    reference's skip-the-row semantics (P3 + P6).
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.trim(c.cast("string"))
    # Keep this tree SMALL. Catalyst pushes an isNotNull filter on the
    # result below the projection and inlines the whole tree into the
    # Filter condition — once per field reference — so a large parse
    # expression gets re-evaluated many times per row (measured 20x+
    # wall-clock blowup at sf0.1 with a hand-rolled field parser).
    # substring_index is a plain byte search; try_to_date's per-pattern
    # java.time DateFormatter is cached statically, so the parse is a
    # single cheap call. 'd/M/yyyy' = dayfirst, 1-2 digit day/month,
    # strict 4-digit year; invalid dates (30/02) and garbage → NULL.
    start_str = F.trim(F.substring_index(s, separator, 1))
    parsed = F.try_to_date(start_str, "d/M/yyyy")
    # P3: rows whose string lacks the separator must yield NULL even if
    # the left half alone would parse.
    return F.when(s.contains(separator), parsed)


# ---------------------------------------------------------------------------
# A2 — distinct-sorted string concat aggregate.
# Reference: timesheet_transform.py:91 — "; ".join(sorted(set(x))).
# ---------------------------------------------------------------------------


def distinct_sorted_concat(col: Column | str, sep: str = "; ") -> Column:
    """``collect_set → array_sort → array_join`` — the reference's only
    custom aggregate, as built-ins (partial-aggregatable, no UDAF).

    Matches SQL ``string_agg(DISTINCT x, sep ORDER BY x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(F.array_sort(F.collect_set(c)), sep)


# ---------------------------------------------------------------------------
# Deterministic float aggregation.
# Double summation is order-dependent; under Spark's partial+final
# aggregation the partition order is not fixed, so SUM(double) is not
# bit-reproducible (nor oracle-comparable). Summing exact decimals is
# associative; casting the exact result back to double is then
# deterministic and engine-independent.
# ---------------------------------------------------------------------------


def dec_sum(col: Column | str, precision: int = 12, scale: int = 2) -> Column:
    """Order-independent SUM over a double column: cast each value to
    DECIMAL(precision, scale), sum exactly, cast back to double.

    Oracle-SQL twin: ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def dec_avg(col: Column | str, precision: int = 12, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum / count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double") / F.count(c)


# ---------------------------------------------------------------------------
# Pushdown-friendly day-granularity predicates over timestamp columns.
# ``to_date(ts) >= DATE 'd'`` wraps the COLUMN in a cast, so the
# predicate never reaches the parquet scan (no PushedFilters, no
# row-group/page skipping — fatal at 100 TB where date ranges are THE
# partition-elimination axis). For any time-of-day,
#   to_date(ts) >= d  ⇔  ts >= midnight(d)
#   to_date(ts) <  d  ⇔  ts <  midnight(d)
# so the same filter restated on the raw timestamp column is exactly
# equivalent AND pushable. Oracle twins keep the CAST(x AS DATE) form;
# results are identical by construction.
# ---------------------------------------------------------------------------


def _midnight(day: str) -> Column:
    return F.lit(f"{day} 00:00:00").cast("timestamp")


def _next_day(day: str) -> str:
    import datetime

    return (datetime.date.fromisoformat(day) + datetime.timedelta(days=1)).isoformat()


def day_ge(col: Column | str, day: str) -> Column:
    """``to_date(col) >= day`` as a pushable timestamp predicate."""
    c = F.col(col) if isinstance(col, str) else col
    return c >= _midnight(day)


def day_lt(col: Column | str, day: str) -> Column:
    """``to_date(col) < day`` as a pushable timestamp predicate."""
    c = F.col(col) if isinstance(col, str) else col
    return c < _midnight(day)


def day_le(col: Column | str, day: str) -> Column:
    """``to_date(col) <= day`` as a pushable timestamp predicate."""
    c = F.col(col) if isinstance(col, str) else col
    return c < _midnight(_next_day(day))


def day_gt(col: Column | str, day: str) -> Column:
    """``to_date(col) > day`` as a pushable timestamp predicate."""
    c = F.col(col) if isinstance(col, str) else col
    return c >= _midnight(_next_day(day))


def day_between(col: Column | str, start: str, end_exclusive: str) -> Column:
    """``start <= to_date(col) < end_exclusive``, pushable."""
    return day_ge(col, start) & day_lt(col, end_exclusive)
