"""Data-quality / warehouse-operations batch.

The reference tool's whole reason to exist is keeping a ledger
trustworthy (clean dirty cells, update-don't-insert merges —
``timesheet_transform.py``); these queries generalize that into the
operations a warehouse team runs against the same tables:

* single-pass-per-column profiling (null/distinct counts) — the scan
  shape you want at 100 TB: one *column-pruned* parquet scan per
  profiled column, partial aggregation map-side, a tiny shuffle each,
* a declarative constraint audit (PK uniqueness, FK integrity, range
  and not-null expectations) — the dbt-test / Delta-constraints
  analogue, each check a broadcast anti-join or a map-side filter agg,
* a snapshot CDC diff (insert/update/delete classification between
  two table versions via one key-co-partitioned full outer join),
* exact fixed-point rolling z-score anomaly detection over an event
  stream (trailing-window mean/variance in integer arithmetic so the
  DuckDB twin is bit-identical — no cross-engine double drift),
* grouped-map ``applyInPandas`` robust statistics (exact integer
  median + MAD — the Arrow-batched UDAF surface, oracle-checked).

Every query is an oracle-twinned ``register`` entry; integer math
follows the repo-wide fixed-point idiom (see NOTES.md on the 2^53
decimal/double boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from exceldatatransform_py_spark.plans.registry import register
from exceldatatransform_py_spark.sources.readers import read_table

# ---------------------------------------------------------------------------
# Column profiling: for each orders column, row/null/distinct counts.
#
# Shape: one aggregate per column over a scan that reads ONLY that
# column (parquet column pruning — verified in test_plan_shapes), with
# the distinct count computed as a two-level aggregate (groupBy col →
# count rows) instead of COUNT(DISTINCT): a registry-wide lesson
# (NOTES.md) — mixed distinct aggregates plan an Expand that
# duplicates every input row. At 100 TB each per-column job is an
# independent, embarrassingly-parallel pruned scan; nothing shuffles
# more than the distinct groups themselves.
# ---------------------------------------------------------------------------

_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def _profile_one(orders: DataFrame, col: str) -> DataFrame:
    by_val = orders.select(col).groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
    return by_val.agg(
        F.sum("cnt").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col(col).isNull(), F.col("cnt"))), F.lit(0).cast("long")
        ).alias("n_nulls"),
        F.sum(F.when(F.col(col).isNotNull(), 1).otherwise(0)).alias("n_distinct"),
    ).select(F.lit(col).alias("col_name"), "n_rows", "n_nulls", "n_distinct")


_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
        COUNT(*) - COUNT({c}) AS n_nulls,
        COUNT(DISTINCT {c}) AS n_distinct FROM orders"""
    for c in _PROFILE_COLS
)


@register("column_profile_orders", oracle=_PROFILE_ORACLE)
def column_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    out = _profile_one(orders, _PROFILE_COLS[0])
    for c in _PROFILE_COLS[1:]:
        out = out.unionByName(_profile_one(orders, c))
    return out


# ---------------------------------------------------------------------------
# Constraint audit: declarative expectations evaluated in one job.
# PK uniqueness is the same Expand-free two-level distinct; the FK
# check is a broadcast anti-join against the (small) customer key set;
# range/not-null checks are map-side conditional counts that share one
# scan. NULL handling is explicit: a NULL price/date cannot prove the
# row in-range, so it counts as a violation of the range check too.
# ---------------------------------------------------------------------------

_DATE_LO, _DATE_HI = "1992-01-01", "1998-12-31"


@register(
    "constraint_audit_orders",
    oracle=f"""
    SELECT 'pk_unique_o_orderkey' AS constraint_name,
           COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_violations,
           COUNT(*) - COUNT(DISTINCT o_orderkey) = 0 AS passed
    FROM orders
    UNION ALL
    SELECT 'fk_o_custkey_customer',
           COUNT(*) FILTER (WHERE NOT EXISTS
             (SELECT 1 FROM customer WHERE c_custkey = o_custkey)),
           COUNT(*) FILTER (WHERE NOT EXISTS
             (SELECT 1 FROM customer WHERE c_custkey = o_custkey)) = 0
    FROM orders
    UNION ALL
    SELECT 'ck_totalprice_positive',
           COUNT(*) FILTER (WHERE o_totalprice IS NULL OR o_totalprice <= 0),
           COUNT(*) FILTER (WHERE o_totalprice IS NULL OR o_totalprice <= 0) = 0
    FROM orders
    UNION ALL
    SELECT 'ck_orderdate_in_range',
           COUNT(*) FILTER (WHERE o_orderdate IS NULL
             OR o_orderdate < TIMESTAMP '{_DATE_LO} 00:00:00'
             OR o_orderdate > TIMESTAMP '{_DATE_HI} 00:00:00'),
           COUNT(*) FILTER (WHERE o_orderdate IS NULL
             OR o_orderdate < TIMESTAMP '{_DATE_LO} 00:00:00'
             OR o_orderdate > TIMESTAMP '{_DATE_HI} 00:00:00') = 0
    FROM orders
    UNION ALL
    SELECT 'nn_o_orderstatus',
           COUNT(*) FILTER (WHERE o_orderstatus IS NULL),
           COUNT(*) FILTER (WHERE o_orderstatus IS NULL) = 0
    FROM orders
    """,
)
def constraint_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")

    def check(name: str, n: DataFrame) -> DataFrame:
        return n.select(
            F.lit(name).alias("constraint_name"),
            F.col("n_violations"),
            (F.col("n_violations") == 0).alias("passed"),
        )

    pk = check(
        "pk_unique_o_orderkey",
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg((F.sum("cnt") - F.count(F.lit(1))).alias("n_violations")),
    )
    fk = check(
        "fk_o_custkey_customer",
        orders.join(
            F.broadcast(customer.select(F.col("c_custkey").alias("o_custkey"))),
            "o_custkey",
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("n_violations")),
    )
    viol = {
        "ck_totalprice_positive": F.col("o_totalprice").isNull()
        | (F.col("o_totalprice") <= 0),
        "ck_orderdate_in_range": F.col("o_orderdate").isNull()
        | (F.col("o_orderdate") < F.lit(f"{_DATE_LO} 00:00:00").cast("timestamp"))
        | (F.col("o_orderdate") > F.lit(f"{_DATE_HI} 00:00:00").cast("timestamp")),
        "nn_o_orderstatus": F.col("o_orderstatus").isNull(),
    }
    # The three row-local expectations share ONE scan + one aggregate.
    shared = orders.agg(
        *[
            F.sum(F.when(cond, 1).otherwise(0)).alias(name)
            for name, cond in viol.items()
        ]
    )
    out = pk.unionByName(fk)
    for name in viol:
        out = out.unionByName(
            check(name, shared.select(F.col(name).alias("n_violations")))
        )
    return out


# ---------------------------------------------------------------------------
# Snapshot CDC diff: classify every key as insert / update / delete
# between version 0 (orders as stored) and a deterministically derived
# version 1 (drop keys %97, restate status on keys %89, append
# key-shifted copies of keys %101). One full outer join on the
# snapshot key — both sides hash-partition on o_orderkey, so at scale
# this is a co-partitioned (bucketable) merge with zero extra
# exchanges — then null-safe column comparison picks out real updates.
# Unchanged rows are dropped before the tiny per-op aggregate.
# ---------------------------------------------------------------------------

_V1_SQL = """
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderkey % 89 = 0 THEN 'X' ELSE o_orderstatus END
             AS o_orderstatus,
           o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 97 <> 0
    UNION ALL
    SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
           o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 101 = 0
"""

_CMP_COLS = ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
             "o_orderpriority"]


@register(
    "snapshot_diff_orders",
    oracle=f"""
    WITH v1 AS ({_V1_SQL}),
    diff AS (
      SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS k,
             CASE
               WHEN a.o_orderkey IS NULL THEN 'insert'
               WHEN b.o_orderkey IS NULL THEN 'delete'
               WHEN {" OR ".join(f"a.{c} IS DISTINCT FROM b.{c}" for c in _CMP_COLS)}
                 THEN 'update'
             END AS op
      FROM orders a FULL OUTER JOIN v1 b ON a.o_orderkey = b.o_orderkey
    )
    SELECT op, COUNT(*) AS n_rows, MIN(k) AS min_key, MAX(k) AS max_key
    FROM diff WHERE op IS NOT NULL GROUP BY op
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    v0 = read_table(spark, sf_dir, "orders")
    kept = v0.filter(F.col("o_orderkey") % 97 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 89 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    inserted = v0.filter(F.col("o_orderkey") % 101 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(100000000)
    )
    v1 = kept.unionByName(inserted)

    a = v0.alias("a")
    b = v1.alias("b")
    changed = None
    for c in _CMP_COLS:
        ne = ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
        changed = ne if changed is None else (changed | ne)
    diff = (
        a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
        .select(
            F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("k"),
            F.when(F.col("a.o_orderkey").isNull(), F.lit("insert"))
            .when(F.col("b.o_orderkey").isNull(), F.lit("delete"))
            .when(changed, F.lit("update"))
            .alias("op"),
        )
        .filter(F.col("op").isNotNull())
    )
    return diff.groupBy("op").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("k").alias("min_key"),
        F.max("k").alias("max_key"),
    )


# ---------------------------------------------------------------------------
# Rolling z-score anomaly detection, exact: per user, compare each
# event's value against the trailing 20 events' mean/variance —
# entirely in int64 on centi-units, so |z| > 3 is the integer
# inequality (n-1)·(n·x−S)² > 9·n·(n·Q−S²) (sample variance, both
# sides multiplied through by n²(n−1)) and the DuckDB twin matches
# bit-for-bit. Magnitude audit: cents ≤ ~3.3e4 (events.value ≤ 330),
# so n·Q ≤ 20·20·(3.3e4)² ≈ 4.4e11 and both sides stay ≤ ~8e13 —
# five orders of magnitude inside int64. One window = one shuffle on
# user_id; the anomaly filter then drops ~99% of rows before output.
# ---------------------------------------------------------------------------


@register(
    "rolling_zscore_events",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    w AS (
      SELECT user_id, event_id, cents,
             COUNT(cents) OVER win AS n,
             SUM(cents)   OVER win AS s,
             SUM(cents * cents) OVER win AS q
      FROM c
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, cents AS value_cents, n AS n_baseline
    FROM w
    WHERE n >= 8
      AND (n - 1) * (n * cents - s) * (n * cents - s)
          > 9 * n * (n * q - s * s)
    """,
)
def rolling_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    w = events.select(
        "user_id",
        "event_id",
        "ts",
        cents.alias("cents"),
    ).select(
        "user_id",
        "event_id",
        "cents",
        F.count("cents").over(win).alias("n"),
        F.sum("cents").over(win).alias("s"),
        F.sum(F.col("cents") * F.col("cents")).over(win).alias("q"),
    )
    n, s, q, x = F.col("n"), F.col("s"), F.col("q"), F.col("cents")
    return w.filter(
        (n >= 8)
        & ((n - 1) * (n * x - s) * (n * x - s) > 9 * n * (n * q - s * s))
    ).select(
        "user_id",
        "event_id",
        F.col("cents").alias("value_cents"),
        F.col("n").alias("n_baseline"),
    )


# ---------------------------------------------------------------------------
# Robust statistics per group via grouped-map applyInPandas — the
# Arrow-batched UDAF surface in a *scored* query. Median and MAD
# (median absolute deviation) are rank statistics a hash aggregate
# can't stream, so each group's values land in one numpy array
# (Arrow transfer, C sort). To keep the DuckDB twin bit-identical the
# statistics stay in integers: values quantized to cents, the median
# reported as the SUM of the two middle values (×2 for odd n), MAD as
# the same construction over |2·x − med2| — no float interpolation,
# no cross-engine rounding. Scale: one shuffle on the group key;
# per-task memory is the largest group (5 priority groups here; for
# high-cardinality keys this shape is exactly right, for a handful of
# mega-groups prefer the built-in approx_percentile path —
# `quantile_profile_by_priority` — which this query deliberately
# complements, not replaces).
# ---------------------------------------------------------------------------


@register(
    "robust_stats_by_priority",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority AS p,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x
      FROM orders
    ),
    g AS (SELECT p, COUNT(*) AS n, list_sort(list(x)) AS l FROM c GROUP BY p),
    m AS (
      SELECT p, n,
             CASE WHEN n % 2 = 1 THEN 2 * l[(n + 1) // 2]
                  ELSE l[n // 2] + l[n // 2 + 1] END AS med2,
             l
      FROM g
    ),
    d AS (
      SELECT p, n, med2,
             list_sort(list_transform(l, v -> abs(2 * v - med2))) AS ld
      FROM m
    )
    SELECT p AS priority, n AS n_orders, med2 AS median_x2_cents,
           CASE WHEN n % 2 = 1 THEN 2 * ld[(n + 1) // 2]
                ELSE ld[n // 2] + ld[n // 2 + 1] END AS mad_x4_cents
    FROM d
    """,
)
def robust_stats_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    orders = read_table(spark, sf_dir, "orders")

    def two_middle_sum(sorted_vals: "np.ndarray") -> int:
        n = len(sorted_vals)
        if n % 2 == 1:
            return int(2 * sorted_vals[(n - 1) // 2])
        return int(sorted_vals[n // 2 - 1] + sorted_vals[n // 2])

    def stats(pdf: "pd.DataFrame") -> "pd.DataFrame":
        x = np.sort(pdf["x"].to_numpy())
        med2 = two_middle_sum(x)
        dev = np.sort(np.abs(2 * x - med2))
        return pd.DataFrame(
            {
                "priority": [pdf["p"].iloc[0]],
                "n_orders": [len(x)],
                "median_x2_cents": [med2],
                "mad_x4_cents": [two_middle_sum(dev)],
            }
        )

    cents = orders.select(
        F.col("o_orderpriority").alias("p"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x"),
    )
    return cents.groupBy("p").applyInPandas(
        stats,
        schema="priority string, n_orders long, median_x2_cents long, "
        "mad_x4_cents long",
    )


# ---------------------------------------------------------------------------
# Schema-wide referential-integrity audit: every FK edge of the star
# schema in one result (child rows + orphan count per edge). Extends
# the per-table constraint audit to the full graph. Each edge is one
# left join + tiny agg; dimension parents broadcast, the one big-big
# edge (lineitem -> orders) shuffles on the key. The spec list below
# feeds BOTH the Spark plan and the generated oracle SQL, so the two
# sides cannot drift.
# ---------------------------------------------------------------------------

_FK_RELS: tuple[tuple[str, str, str, str], ...] = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)

#: parents small enough to broadcast at any realistic SF (bounded
#: dimensions); orders is data-sized and must shuffle.
_FK_BROADCAST = {"part", "supplier", "customer", "nation", "region"}


def _fk_audit_oracle() -> str:
    parts = []
    for child, fk, parent, pk in _FK_RELS:
        parts.append(
            f"""
    SELECT '{child}.{fk}->{parent}' AS relationship,
           COUNT(*) AS n_rows,
           COALESCE(CAST(SUM(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END)
                         AS BIGINT), 0) AS n_orphans
    FROM {child} c LEFT JOIN {parent} p ON c.{fk} = p.{pk}"""
        )
    return "\n    UNION ALL".join(parts)


@register("fk_orphan_audit", oracle=_fk_audit_oracle())
def fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for child, fk, parent, pk in _FK_RELS:
        c = read_table(spark, sf_dir, child).select(fk)
        p = read_table(spark, sf_dir, parent).select(pk)
        if parent in _FK_BROADCAST:
            p = F.broadcast(p)
        row = (
            c.join(p, F.col(fk) == F.col(pk), "left")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.coalesce(
                    F.sum(F.col(pk).isNull().cast("bigint")), F.lit(0)
                ).alias("n_orphans"),
            )
            .select(
                F.lit(f"{child}.{fk}->{parent}").alias("relationship"),
                "n_rows",
                "n_orphans",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out
