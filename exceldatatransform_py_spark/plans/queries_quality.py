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


# ---------------------------------------------------------------------------
# Statistical testing / distribution-drift batch.
#
# Three audits a warehouse team schedules against a living table:
# independence of two categorical columns (chi-square residuals),
# conformance of a numeric column to Benford's law (fraud/entry-error
# screen), and distribution drift of a measure between two time
# periods (the PSI/KS slot on an ML-ops dashboard, expressed as total
# variation distance so the statistic is *exact integer arithmetic* —
# PSI's logs would hash-drift across engines; see NOTES.md on libm).
#
# Determinism rules used below (repo-wide idiom):
# * per-cell doubles come from ONE fixed-shape expression over
#   integers — identical bit patterns on both engines;
# * cross-row double sums are NEVER left to aggregate order: the
#   chi-square total folds a sorted array (F.aggregate / list_reduce
#   over list(... ORDER BY ...)) so both engines add in the same
#   sequence; the TVD total is an integer sum with one final division.
# ---------------------------------------------------------------------------


@register(
    "chi_square_type_dow",
    oracle="""
    WITH obs AS (
      SELECT event_type, CAST(isodow(ts) AS INTEGER) AS dow_iso,
             COUNT(*) AS obs
      FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, CAST(SUM(obs) AS BIGINT) AS row_tot
           FROM obs GROUP BY 1),
    ct AS (SELECT dow_iso, CAST(SUM(obs) AS BIGINT) AS col_tot
           FROM obs GROUP BY 1),
    n AS (SELECT CAST(SUM(obs) AS BIGINT) AS n_total,
                 COUNT(DISTINCT event_type) AS n_rows_d,
                 COUNT(DISTINCT dow_iso) AS n_cols_d
          FROM obs),
    cells AS (
      SELECT o.event_type, o.dow_iso, o.obs,
             CAST(rt.row_tot AS DOUBLE) * CAST(ct.col_tot AS DOUBLE)
               / CAST(n.n_total AS DOUBLE) AS expected
      FROM obs o JOIN rt USING (event_type) JOIN ct USING (dow_iso)
      CROSS JOIN n
    ),
    scored AS (
      SELECT event_type, dow_iso, obs, expected,
             (CAST(obs AS DOUBLE) - expected)
               * (CAST(obs AS DOUBLE) - expected) / expected AS contrib
      FROM cells
    ),
    tot AS (
      SELECT list_reduce(list(contrib ORDER BY event_type, dow_iso),
                         (x, y) -> x + y) AS chi2_total
      FROM scored
    )
    SELECT s.event_type, s.dow_iso, s.obs, s.expected, s.contrib,
           t.chi2_total,
           CAST((n.n_rows_d - 1) * (n.n_cols_d - 1) AS INTEGER) AS dof
    FROM scored s CROSS JOIN tot t CROSS JOIN n
    """,
)
def chi_square_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence audit of event_type × ISO weekday.

    One groupBy builds the contingency table; row/column margins
    re-aggregate the (tiny) cell table, never the fact — at 100 TB
    the only data-sized operation is the first partial-aggregated
    groupBy, everything after runs on ≤ |types|·7 rows, and the
    margins broadcast back onto the cells. The chi-square total is a
    sorted-array fold (both engines add ~35 doubles in the identical
    sequence) rather than a SUM whose accumulation order neither
    engine pins down.
    """
    ev = read_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type",
        (F.weekday(F.col("ts")) + F.lit(1)).cast("int").alias("dow_iso"),
    ).agg(F.count(F.lit(1)).alias("obs"))
    obs = obs.persist()  # margins + cells + distinct counts all reuse it
    rt = obs.groupBy("event_type").agg(F.sum("obs").alias("row_tot"))
    ct = obs.groupBy("dow_iso").agg(F.sum("obs").alias("col_tot"))
    n = obs.agg(
        F.sum("obs").alias("n_total"),
        F.countDistinct("event_type").alias("n_rows_d"),
        F.countDistinct("dow_iso").alias("n_cols_d"),
    )
    expected = (
        F.col("row_tot").cast("double")
        * F.col("col_tot").cast("double")
        / F.col("n_total").cast("double")
    )
    cells = (
        obs.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow_iso")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "dow_iso",
            "obs",
            expected.alias("expected"),
            "n_rows_d",
            "n_cols_d",
        )
    )
    d = F.col("obs").cast("double") - F.col("expected")
    scored = cells.withColumn("contrib", d * d / F.col("expected"))
    tot = scored.agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct("event_type", "dow_iso", "contrib")
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        ).alias("chi2_total")
    )
    return (
        scored.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "dow_iso",
            "obs",
            "expected",
            "contrib",
            "chi2_total",
            ((F.col("n_rows_d") - 1) * (F.col("n_cols_d") - 1))
            .cast("int")
            .alias("dof"),
        )
    )


# Benford expected first-digit shares log10(1 + 1/d), inlined as
# 17-significant-digit literals so BOTH engines parse the identical
# nearest-double — no runtime log10 call to drift by an ulp.
_BENFORD = {
    1: "0.30102999566398120",
    2: "0.17609125905568124",
    3: "0.12493873660829993",
    4: "0.09691001300805642",
    5: "0.07918124604762482",
    6: "0.06694678963061322",
    7: "0.05799194697768673",
    8: "0.05115252244738129",
    9: "0.04575749056067514",
}

# The WHEN values go through CAST('…' AS DOUBLE) — a bare numeric
# literal parses as DECIMAL(18,17) in DuckDB, and that decimal's
# scaled integer exceeds 2^53, so its conversion to double can differ
# from the correctly-rounded strtod parse by an ulp (NOTES.md). The
# string cast is strtod on both engines and bit-matches Spark's
# F.lit(float(...)).
_BENFORD_SQL_CASE = "CASE first_digit " + " ".join(
    f"WHEN {d} THEN CAST('{v}' AS DOUBLE)" for d, v in _BENFORD.items()
) + " END"


@register(
    "benford_price_audit",
    oracle=f"""
    WITH fd AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INTEGER) AS first_digit
      FROM orders WHERE o_totalprice >= 1
    ),
    agg AS (
      SELECT first_digit, COUNT(*) AS n_orders FROM fd GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS n_total FROM agg)
    SELECT first_digit, n_orders,
           CAST(n_orders AS DOUBLE) / CAST(n_total AS DOUBLE) AS obs_share,
           {_BENFORD_SQL_CASE} AS benford_share,
           CAST(n_orders AS DOUBLE) / CAST(n_total AS DOUBLE)
             - {_BENFORD_SQL_CASE} AS deviation
    FROM agg CROSS JOIN tot
    """,
)
def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law conformance of order totals' first significant
    digit — the classic entry-error / synthetic-data screen.

    Map-side digit extraction (string head of the integer part, no
    logs), one 9-group aggregate, the grand total broadcast back.
    The expected shares are compile-time literals, so the only
    doubles are two fixed-shape divisions per output row. Scale: the
    aggregate is algebraic over 9 groups; nothing else exists.
    """
    orders = read_table(spark, sf_dir, "orders")
    fd = orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("first_digit")
    )
    agg = fd.groupBy("first_digit").agg(F.count(F.lit(1)).alias("n_orders"))
    tot = agg.agg(F.sum("n_orders").alias("n_total"))
    benford = F.element_at(
        F.create_map(
            *[x for d, v in _BENFORD.items() for x in (F.lit(d), F.lit(float(v)))]
        ),
        F.col("first_digit"),
    )
    obs = F.col("n_orders").cast("double") / F.col("n_total").cast("double")
    return agg.crossJoin(F.broadcast(tot)).select(
        "first_digit",
        "n_orders",
        obs.alias("obs_share"),
        benford.alias("benford_share"),
        (obs - benford).alias("deviation"),
    )


@register(
    "value_drift_tvd",
    oracle="""
    WITH b AS (
      SELECT CAST(min(epoch_us(ts)) AS BIGINT) AS u0,
             CAST(max(epoch_us(ts)) AS BIGINT) AS u1
      FROM events
    ),
    bucketed AS (
      SELECT CAST(least(floor(e.value / 20), 30) AS BIGINT) AS bucket,
             CASE WHEN epoch_us(e.ts) < b.u0 + (b.u1 - b.u0) // 2
                  THEN 1 ELSE 0 END AS is_early
      FROM events e CROSS JOIN b
    ),
    cells AS (
      SELECT bucket,
             CAST(SUM(is_early) AS BIGINT) AS n_early,
             CAST(SUM(1 - is_early) AS BIGINT) AS n_late
      FROM bucketed GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n_early) AS BIGINT) AS tot_early,
             CAST(SUM(n_late) AS BIGINT) AS tot_late,
             CAST(SUM(abs(n_early * (SELECT SUM(n_late) FROM cells)
                          - n_late * (SELECT SUM(n_early) FROM cells)))
                  AS BIGINT) AS tvd_num
      FROM cells
    )
    SELECT c.bucket, c.n_early, c.n_late,
           CAST(c.n_early AS DOUBLE) / CAST(t.tot_early AS DOUBLE)
             AS share_early,
           CAST(c.n_late AS DOUBLE) / CAST(t.tot_late AS DOUBLE)
             AS share_late,
           CAST(t.tvd_num AS DOUBLE)
             / CAST(2 * t.tot_early * t.tot_late AS DOUBLE) AS tvd_total
    FROM cells c CROSS JOIN tot t
    """,
)
def value_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift of `value` between the first and second half
    of the event stream, as total variation distance.

    The drift-monitoring slot PSI usually fills — restated so the
    statistic is EXACT: per-bucket counts are integers, the TVD
    numerator Σ|n_early·T_late − n_late·T_early| is an integer sum
    (bucket counts × totals stay ≪ 2^63 up to ~10^9 rows per side;
    segment or go DECIMAL(38) beyond), and the only doubles are one
    division per output cell. PSI's Σ(p−q)·ln(p/q) would cross libm
    and hash-differently per engine. Plan: one pruned scan, the time
    midpoint broadcast, one 31-group aggregate, margins broadcast
    back — nothing data-sized after the first groupBy.
    """
    ev = read_table(spark, sf_dir, "events")
    # read_table normalizes events.ts to TIMESTAMP_NTZ; unix_micros
    # needs TIMESTAMP. The NTZ→TZ cast applies the session zone — UTC
    # on both harnesses (NOTES.md), so the micros are unambiguous.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    b = ev.agg(F.min(us).alias("u0"), F.max(us).alias("u1"))
    # Exact integer-microsecond midpoint — a double/interval midpoint
    # can land 1 µs off per engine and flip boundary events.
    umid = F.col("u0") + F.floor(
        (F.col("u1") - F.col("u0")) / F.lit(2)
    ).cast("bigint")
    bucketed = ev.crossJoin(F.broadcast(b)).select(
        F.least(F.floor(F.col("value") / 20), F.lit(30))
        .cast("bigint")
        .alias("bucket"),
        (us < umid).cast("bigint").alias("is_early"),
    )
    cells = bucketed.groupBy("bucket").agg(
        F.sum("is_early").alias("n_early"),
        F.sum(F.lit(1) - F.col("is_early")).alias("n_late"),
    )
    cells = cells.persist()  # margins, numerator, and output reuse it
    tot = cells.agg(
        F.sum("n_early").alias("tot_early"),
        F.sum("n_late").alias("tot_late"),
    )
    with_tot = cells.crossJoin(F.broadcast(tot))
    num = with_tot.agg(
        F.sum(
            F.abs(
                F.col("n_early") * F.col("tot_late")
                - F.col("n_late") * F.col("tot_early")
            )
        ).alias("tvd_num")
    )
    return (
        with_tot.crossJoin(F.broadcast(num))
        .select(
            "bucket",
            "n_early",
            "n_late",
            (
                F.col("n_early").cast("double")
                / F.col("tot_early").cast("double")
            ).alias("share_early"),
            (
                F.col("n_late").cast("double")
                / F.col("tot_late").cast("double")
            ).alias("share_late"),
            (
                F.col("tvd_num").cast("double")
                / (2 * F.col("tot_early") * F.col("tot_late")).cast("double")
            ).alias("tvd_total"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental aggregate refresh — materialized-view maintenance: the
# MV (orders by status: count + exact cents sum) is refreshed from
# (old MV) ⊕ (CDC delta) ONLY, never by rescanning the new table
# version. THE 100 TB pattern: a full MV rebuild rescans the world,
# the incremental plan touches O(|delta|) + O(|MV|) rows. Updates
# that MOVE a row between groups (status → 'X') contribute a retract
# to the old group and an insert to the new one — the general
# dataflow retract/accumulate rule, not a same-group shortcut. The
# oracle aggregates the v1 table directly, so the hash match PROVES
# incremental ≡ full refresh. (Here the delta comes from a v0⋈v1
# diff because the fixture derives v1 in-plan; in production it
# comes from the CDC log / snapshot layer — see snapshot_diff_orders
# and sources/snapshots.py.)
# ---------------------------------------------------------------------------


@register(
    "incremental_agg_refresh",
    oracle=f"""
    WITH v1 AS ({_V1_SQL})
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM v1 GROUP BY 1
    """,
)
def incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    v0 = read_table(spark, sf_dir, "orders")
    cents = lambda c: F.round(F.col(c) * 100).cast("bigint")  # noqa: E731

    # The deterministic v1 mutation (same fixture as
    # snapshot_diff_orders): ~1% deleted, ~1% status→'X', ~1% inserted.
    kept = v0.filter(F.col("o_orderkey") % 97 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 89 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    inserted = v0.filter(F.col("o_orderkey") % 101 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(100000000)
    )

    # Old MV: the v0 aggregate (in production: the stored MV).
    old_mv = v0.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents("o_totalprice")).alias("sum_cents"),
    )

    # CDC delta in retract/accumulate form, WITHOUT scanning v1:
    # every contribution is derivable from v0 predicates alone.
    deletes = v0.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderstatus",
        F.lit(-1).cast("bigint").alias("dn"),
        (-cents("o_totalprice")).alias("dc"),
    )
    moved = v0.filter(
        (F.col("o_orderkey") % 97 != 0) & (F.col("o_orderkey") % 89 == 0)
    )
    retracts = moved.select(
        "o_orderstatus",
        F.lit(-1).cast("bigint").alias("dn"),
        (-cents("o_totalprice")).alias("dc"),
    )
    accumulates = moved.select(
        F.lit("X").alias("o_orderstatus"),
        F.lit(1).cast("bigint").alias("dn"),
        cents("o_totalprice").alias("dc"),
    )
    ins = inserted.select(
        "o_orderstatus",
        F.lit(1).cast("bigint").alias("dn"),
        cents("o_totalprice").alias("dc"),
    )
    delta = (
        deletes.unionByName(retracts)
        .unionByName(accumulates)
        .unionByName(ins)
        .groupBy("o_orderstatus")
        .agg(F.sum("dn").alias("dn"), F.sum("dc").alias("dc"))
    )

    merged = old_mv.join(delta, "o_orderstatus", "full_outer").select(
        "o_orderstatus",
        (
            F.coalesce(F.col("n_orders"), F.lit(0))
            + F.coalesce(F.col("dn"), F.lit(0))
        ).alias("n_orders"),
        (
            F.coalesce(F.col("sum_cents"), F.lit(0))
            + F.coalesce(F.col("dc"), F.lit(0))
        ).alias("sum_cents"),
    )
    # Groups whose count reaches 0 leave the MV (none do in this
    # fixture, but the rule is part of the operator's contract).
    return merged.filter(F.col("n_orders") > 0)


# ---------------------------------------------------------------------------
# Kolmogorov-Smirnov two-sample test — the canonical distribution-
# comparison statistic, computed EXACTLY: D = max_x |F1(x) − F2(x)|
# over the empirical CDFs ≡ max over distinct values of
# |cum1·n2 − cum2·n1| / (n1·n2) — an integer maximum with one final
# division (same restatement discipline as TVD/AUC; a double-ECDF
# subtraction per row would be fine too, but the integer form needs
# no care at all). The prefix sums run over the bounded distinct-
# cents domain, not events (the rank_auc posture); cum·n products
# stay inside int64 to ~3·10^9 rows per side (then DECIMAL(38) or
# per-segment KS — documented upgrade, same shape).
# ---------------------------------------------------------------------------


@register(
    "ks_two_sample_value",
    oracle="""
    WITH kb AS (
      SELECT CAST(min(epoch_us(ts)) AS BIGINT) AS u0,
             CAST(max(epoch_us(ts)) AS BIGINT) AS u1
      FROM events
    ),
    kc AS (
      SELECT CAST(round(e.value * 100) AS BIGINT) AS cents,
             CASE WHEN epoch_us(e.ts) < b.u0 + (b.u1 - b.u0) // 2
                  THEN 1 ELSE 0 END AS is_early
      FROM events e CROSS JOIN kb b
    ),
    kg AS (
      SELECT cents, CAST(SUM(is_early) AS BIGINT) AS ne,
             CAST(SUM(1 - is_early) AS BIGINT) AS nl
      FROM kc GROUP BY 1
    ),
    kt AS (
      SELECT CAST(SUM(ne) AS BIGINT) AS n1, CAST(SUM(nl) AS BIGINT) AS n2
      FROM kg
    ),
    kw AS (
      SELECT CAST(SUM(ne) OVER (ORDER BY cents) AS BIGINT) AS c1,
             CAST(SUM(nl) OVER (ORDER BY cents) AS BIGINT) AS c2
      FROM kg
    )
    SELECT t.n1, t.n2,
           CAST(MAX(abs(c1 * t.n2 - c2 * t.n1)) AS BIGINT) AS ks_num,
           CAST(MAX(abs(c1 * t.n2 - c2 * t.n1)) AS DOUBLE)
             / CAST(t.n1 * t.n2 AS DOUBLE) AS ks
    FROM kw CROSS JOIN kt t GROUP BY t.n1, t.n2
    """,
)
def ks_two_sample_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    b = ev.agg(F.min(us).alias("u0"), F.max(us).alias("u1"))
    umid = F.col("u0") + F.floor(
        (F.col("u1") - F.col("u0")) / F.lit(2)
    ).cast("bigint")
    kc = ev.crossJoin(F.broadcast(b)).select(
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        (us < umid).cast("bigint").alias("is_early"),
    )
    kg = kc.groupBy("cents").agg(
        F.sum("is_early").alias("ne"),
        F.sum(F.lit(1) - F.col("is_early")).alias("nl"),
    )
    kg = kg.persist()  # totals + the ECDF window both consume it
    kt = kg.agg(F.sum("ne").alias("n1"), F.sum("nl").alias("n2"))
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    kw = kg.select(
        F.sum("ne").over(w).alias("c1"), F.sum("nl").over(w).alias("c2")
    )
    diff = F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
    return (
        kw.crossJoin(F.broadcast(kt))
        .groupBy("n1", "n2")
        .agg(F.max(diff).alias("ks_num"))
        .select(
            "n1",
            "n2",
            "ks_num",
            (
                F.col("ks_num").cast("double")
                / (F.col("n1") * F.col("n2")).cast("double")
            ).alias("ks"),
        )
    )


# ---------------------------------------------------------------------------
# Privacy release audit: k-anonymity of a quasi-identifier tuple.
# Before a customer extract leaves the warehouse, every QI
# combination (segment × nation × coarse balance band) must be shared
# by ≥ k people — groups below k re-identify individuals. One
# partial-aggregated groupBy; the k-anonymity level and violation
# count are minima/counts over the (tiny) group table joined back as
# a broadcast scalar. All integers — nothing to drift.
# ---------------------------------------------------------------------------

_KANON_K = 5


@register(
    "k_anonymity_audit",
    oracle=f"""
    WITH kag AS (
      SELECT c_mktsegment,
             c_nationkey,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             COUNT(*) AS n_rows
      FROM customer GROUP BY 1, 2, 3
    ),
    kas AS (
      SELECT CAST(min(n_rows) AS BIGINT) AS k_anonymity,
             CAST(SUM(CASE WHEN n_rows < {_KANON_K} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_violating_groups,
             CAST(SUM(CASE WHEN n_rows < {_KANON_K} THEN n_rows ELSE 0 END)
                  AS BIGINT) AS n_exposed_rows
      FROM kag
    )
    SELECT g.c_mktsegment, g.c_nationkey, g.bal_band, g.n_rows,
           g.n_rows < {_KANON_K} AS below_k,
           s.k_anonymity, s.n_violating_groups, s.n_exposed_rows
    FROM kag g CROSS JOIN kas s
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    groups = cust.groupBy(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    groups = groups.persist()  # summary + output rows reuse it
    summary = groups.agg(
        F.min("n_rows").alias("k_anonymity"),
        F.sum((F.col("n_rows") < _KANON_K).cast("bigint")).alias(
            "n_violating_groups"
        ),
        F.sum(
            F.when(F.col("n_rows") < _KANON_K, F.col("n_rows")).otherwise(0)
        ).alias("n_exposed_rows"),
    )
    return groups.crossJoin(F.broadcast(summary)).select(
        "c_mktsegment",
        "c_nationkey",
        "bal_band",
        "n_rows",
        (F.col("n_rows") < _KANON_K).alias("below_k"),
        "k_anonymity",
        "n_violating_groups",
        "n_exposed_rows",
    )


# ---------------------------------------------------------------------------
# Cross-table reconciliation: does orders.o_totalprice equal the sum
# of its lineitems' extendedprice·(1−discount)·(1+tax)? The classic
# ledger-vs-detail consistency audit (the reference tool's whole
# domain — a trustworthy ledger — at warehouse scale). Both sides in
# exact cents (decimal quantization, then integer compare with a
# cent tolerance); ONE co-partitioned join of two aggregates; output
# is the per-status mismatch profile, not the row stream.
# ---------------------------------------------------------------------------


@register(
    "order_total_consistency_audit",
    oracle="""
    WITH otl AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(round(
               CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))
               * (1 + CAST(l_tax AS DECIMAL(18,2))) * 100) AS BIGINT))
               AS BIGINT) AS detail_cents,
             COUNT(*) AS n_items
      FROM lineitem GROUP BY 1
    ),
    oto AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(round(o_totalprice * 100) AS BIGINT) AS header_cents
      FROM orders
    ),
    otj AS (
      SELECT o.o_orderstatus,
             CASE
               WHEN l.l_orderkey IS NULL THEN 'no_lineitems'
               WHEN abs(o.header_cents - l.detail_cents) <= 1
                 THEN 'consistent'
               ELSE 'mismatch'
             END AS verdict,
             CASE WHEN l.l_orderkey IS NOT NULL
                  THEN abs(o.header_cents - l.detail_cents)
                  ELSE 0 END AS abs_diff_cents
      FROM oto o LEFT JOIN otl l ON o.o_orderkey = l.l_orderkey
    )
    SELECT o_orderstatus, verdict,
           COUNT(*) AS n_orders,
           CAST(MAX(abs_diff_cents) AS BIGINT) AS max_abs_diff_cents
    FROM otj GROUP BY 1, 2
    """,
)
def order_total_consistency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    net = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        * (F.lit(1) + F.col("l_tax").cast("decimal(18,2)"))
    )
    otl = li.groupBy("l_orderkey").agg(
        F.sum(F.round(net * 100).cast("bigint")).alias("detail_cents"),
        F.count(F.lit(1)).alias("n_items"),
    )
    oto = orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("header_cents"),
    )
    joined = oto.join(
        otl, oto.o_orderkey == otl.l_orderkey, "left"
    ).select(
        "o_orderstatus",
        F.when(F.col("l_orderkey").isNull(), F.lit("no_lineitems"))
        .when(
            F.abs(F.col("header_cents") - F.col("detail_cents")) <= 1,
            F.lit("consistent"),
        )
        .otherwise(F.lit("mismatch"))
        .alias("verdict"),
        F.when(
            F.col("l_orderkey").isNotNull(),
            F.abs(F.col("header_cents") - F.col("detail_cents")),
        )
        .otherwise(F.lit(0))
        .alias("abs_diff_cents"),
    )
    return joined.groupBy("o_orderstatus", "verdict").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.max("abs_diff_cents").alias("max_abs_diff_cents"),
    )


# ---------------------------------------------------------------------------
# Revenue concentration: Lorenz deciles + Gini coefficient of
# per-customer revenue — the concentration audit behind "what share
# of revenue depends on the top decile". Exact posture: revenue in
# cents, ranks from a deterministic (revenue, custkey) ordering, the
# Gini numerator Σ(2i−n−1)·x_i as an integer sum (≤ ~2^51 at 10^6
# customers × $10^5; DECIMAL(38) beyond), shares as one fixed-shape
# division per cell. The rank window runs over the per-customer
# aggregate (dimension-sized), never the fact.
# ---------------------------------------------------------------------------


@register(
    "revenue_concentration_gini",
    oracle="""
    WITH rcr AS (
      SELECT o_custkey,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1
    ),
    rck AS (
      SELECT rev_cents,
             CAST(row_number() OVER (ORDER BY rev_cents, o_custkey)
                  AS BIGINT) AS i,
             CAST(ntile(10) OVER (ORDER BY rev_cents, o_custkey)
                  AS INTEGER) AS decile
      FROM rcr
    ),
    rcn AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rev_cents) AS BIGINT) AS tot
      FROM rck
    ),
    rct AS (
      SELECT n.n, n.tot,
             CAST(SUM((2 * k.i - n.n - 1) * k.rev_cents) AS BIGINT)
               AS gini_num
      FROM rck k CROSS JOIN rcn n GROUP BY n.n, n.tot
    ),
    rcd AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_cust,
             CAST(SUM(rev_cents) AS BIGINT) AS rev_cents
      FROM rck GROUP BY 1
    )
    SELECT d.decile, d.n_cust, d.rev_cents,
           CAST(d.rev_cents AS DOUBLE) / CAST(t.tot AS DOUBLE) AS rev_share,
           CAST(SUM(d.rev_cents) OVER (ORDER BY d.decile) AS DOUBLE)
             / CAST(t.tot AS DOUBLE) AS cum_share,
           CAST(t.gini_num AS DOUBLE)
             / CAST(t.n * t.tot AS DOUBLE) AS gini
    FROM rcd d CROSS JOIN rct t
    """,
)
def revenue_concentration_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    rcr = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "rev_cents"
        )
    )
    wo = Window.orderBy("rev_cents", "o_custkey")
    rck = rcr.select(
        "rev_cents",
        F.row_number().over(wo).cast("bigint").alias("i"),
        F.ntile(10).over(wo).cast("int").alias("decile"),
    )
    rck = rck.persist()  # totals + gini numerator + deciles consume it
    rcn = rck.agg(
        F.count(F.lit(1)).alias("n"), F.sum("rev_cents").alias("tot")
    )
    rct = (
        rck.crossJoin(F.broadcast(rcn))
        .groupBy("n", "tot")
        .agg(
            F.sum(
                (2 * F.col("i") - F.col("n") - 1) * F.col("rev_cents")
            ).alias("gini_num")
        )
    )
    rcd = rck.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum("rev_cents").alias("rev_cents"),
    )
    wcum = Window.orderBy("decile").rangeBetween(Window.unboundedPreceding, 0)
    return rcd.crossJoin(F.broadcast(rct)).select(
        "decile",
        "n_cust",
        "rev_cents",
        (F.col("rev_cents").cast("double") / F.col("tot").cast("double")).alias(
            "rev_share"
        ),
        (
            F.sum("rev_cents").over(wcum).cast("double")
            / F.col("tot").cast("double")
        ).alias("cum_share"),
        (
            F.col("gini_num").cast("double")
            / (F.col("n") * F.col("tot")).cast("double")
        ).alias("gini"),
    )
