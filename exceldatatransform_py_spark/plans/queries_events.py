"""Driver-scored queries: event-time windows, temporal joins, and the
remaining relational surface (semi/anti joins, pivot, cube, lag).

The window queries run the SAME transforms Structured Streaming uses
(``streaming.windows``) in batch mode — Spark defines streaming
results as "what the batch query would produce on the data so far",
so these oracles check the streaming operators' semantics too; the
pytest streaming test drains the actual ``readStream`` twin and
compares against the batch result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from exceldatatransform_py_spark.functions.columns import dec_sum
from exceldatatransform_py_spark.operators.asof import asof_join
from exceldatatransform_py_spark.plans.registry import register
from exceldatatransform_py_spark.sources.readers import read_table
from exceldatatransform_py_spark.streaming.windows import (
    session_windows,
    sliding_counts,
    tumbling_counts,
)

_DECSUM_VALUE = "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)"


# ---------------------------------------------------------------------------
# Tumbling window (5 min) per event_type.
# ---------------------------------------------------------------------------


@register(
    "events_tumbling",
    oracle=f"""
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
           time_bucket(INTERVAL '5 minutes', ts) + INTERVAL 5 MINUTE AS window_end,
           event_type,
           count(*) AS n_events,
           {_DECSUM_VALUE} AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return tumbling_counts(ev, duration="5 minutes", keys=("event_type",))


# ---------------------------------------------------------------------------
# Sliding window (10 min window, 5 min slide): each event belongs to 2
# windows; the oracle phase-shifts two tumbling bucketings.
# ---------------------------------------------------------------------------


@register(
    "events_sliding",
    oracle=f"""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws, event_type, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL 5 MINUTE, event_type, value FROM events
    )
    SELECT ws AS window_start,
           ws + INTERVAL 10 MINUTE AS window_end,
           event_type,
           count(*) AS n_events,
           {_DECSUM_VALUE} AS sum_value
    FROM assigned
    GROUP BY 1, 2, 3
    """,
)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return sliding_counts(
        ev, duration="10 minutes", slide="5 minutes", keys=("event_type",)
    )


# ---------------------------------------------------------------------------
# Session windows (10 min gap) per user: the oracle is the classic
# gaps-and-islands restatement (lag → new-session flag → cumulative
# session id → group). Spark's session end = last event + gap.
# ---------------------------------------------------------------------------


@register(
    "events_session",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 10 MINUTE AS session_end,
           count(*) AS n_events,
           {_DECSUM_VALUE} AS sum_value
    FROM sessions
    GROUP BY user_id, sid
    """,
)
def events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return session_windows(ev, gap="10 minutes", keys=("user_id",))


# ---------------------------------------------------------------------------
# J5 — as-of join: latest order at or before each event's timestamp,
# per user. Orders are pre-deduped to one row per (custkey, ts) so the
# match is deterministic; DuckDB's native ASOF JOIN is the oracle.
# ---------------------------------------------------------------------------


@register(
    "asof_latest_order",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      FROM orders GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id, o.o_orderkey AS last_orderkey
    FROM events e
    ASOF LEFT JOIN o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    joined = asof_join(
        ev,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        value_cols=["o_orderkey"],
    )
    return joined.select(
        "event_id", "user_id", F.col("o_orderkey").alias("last_orderkey")
    )


# ---------------------------------------------------------------------------
# J5 — range join: map each event's value into a literal tier table
# via a broadcast non-equi join (BroadcastNestedLoopJoin — the right
# physical plan for tiny range dims).
# ---------------------------------------------------------------------------

_TIERS: list[tuple[str, float, float]] = [
    ("low", 0.0, 3.0),
    ("mid", 3.0, 7.0),
    ("high", 7.0, 1e9),
]


@register(
    "range_join_value_tiers",
    oracle="""
    SELECT e.event_id, t.tier
    FROM events e
    JOIN (VALUES ('low', 0.0, 3.0), ('mid', 3.0, 7.0), ('high', 7.0, 1e9))
         AS t(tier, lo, hi)
      ON e.value >= t.lo AND e.value < t.hi
    """,
)
def range_join_value_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    tiers_df = spark.createDataFrame(
        _TIERS, schema="tier string, lo double, hi double"
    )
    return ev.join(
        F.broadcast(tiers_df),
        (ev.value >= tiers_df.lo) & (ev.value < tiers_df.hi),
        "inner",
    ).select("event_id", "tier")


# ---------------------------------------------------------------------------
# J4 — semi / anti equi-joins.
# ---------------------------------------------------------------------------


@register(
    "semi_customers_with_urgent_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def semi_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    urgent = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
    )


@register(
    "anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = read_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    )


# ---------------------------------------------------------------------------
# Pivot (long→wide — the inverse of the reference's unpivot) with an
# explicit value list so the plan needs no extra distinct-scan pass.
# ---------------------------------------------------------------------------


@register(
    "pivot_returnflag_qty",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN l_returnflag = 'A'
                    THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_A,
           CAST(SUM(CASE WHEN l_returnflag = 'N'
                    THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_N,
           CAST(SUM(CASE WHEN l_returnflag = 'R'
                    THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_R
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def pivot_returnflag_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(dec_sum("l_quantity"))
    )
    return pivoted.select(
        "l_linestatus",
        F.col("A").alias("qty_A"),
        F.col("N").alias("qty_N"),
        F.col("R").alias("qty_R"),
    )


# ---------------------------------------------------------------------------
# A6 — full cube (all grouping-set combinations).
# ---------------------------------------------------------------------------


@register(
    "cube_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    # Pre-aggregate to the finest grouping FIRST, then cube the tiny
    # partial table: the cube's Expand multiplies its input 4x, and
    # both aggregates are algebraic (decimal sums re-sum exactly), so
    # expanding 6 partial rows instead of the whole fact is identical
    # — at 100 TB this is the difference between a 4x fact blowup and
    # a no-op. Partial sums STAY decimal until the final cast.
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("__psum"),
        F.count(F.lit(1)).alias("__pn"),
    )
    return base.cube("l_returnflag", "l_linestatus").agg(
        F.sum("__psum").cast("double").alias("sum_qty"),
        F.sum("__pn").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# §2.7 — lag/lead analytics: per-supplier quantity deltas.
# ---------------------------------------------------------------------------


@register(
    "lag_qty_delta",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           l_quantity - lag(l_quantity) OVER w AS qty_delta,
           lead(l_quantity) OVER w - l_quantity AS qty_delta_next
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber)
    """,
)
def lag_qty_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity") - F.lag("l_quantity").over(w)).alias("qty_delta"),
        (F.lead("l_quantity").over(w) - F.col("l_quantity")).alias("qty_delta_next"),
    )


# ---------------------------------------------------------------------------
# §2.6 — JSON extraction (events.props is a JSON string payload).
# from_json with an explicit schema: typed, vectorized, no UDF.
# ---------------------------------------------------------------------------


@register(
    "json_extract_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           count(*) OVER (PARTITION BY CAST(json_extract(props, '$.k') AS BIGINT) % 10) AS k_bucket_n
    FROM events
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    k = F.from_json("props", "k bigint").getField("k")
    staged = ev.select("event_id", k.alias("k"))
    w = Window.partitionBy(F.col("k") % 10)
    return staged.select("event_id", "k", F.count(F.lit(1)).over(w).alias("k_bucket_n"))


# ---------------------------------------------------------------------------
# A6 — explicit GROUPING SETS (rollup/cube's general form).
# ---------------------------------------------------------------------------


@register(
    "grouping_sets_flag_priority",
    oracle="""
    SELECT l_returnflag, o_orderpriority,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY GROUPING SETS ((l_returnflag), (o_orderpriority))
    """,
)
def grouping_sets_flag_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    li.join(orders, li.l_orderkey == orders.o_orderkey).createOrReplaceTempView(
        "__gs_join"
    )
    # pre-aggregate the join to (flag, priority) partials, then run
    # the grouping sets over ~15 rows — the Expand never touches the
    # joined fact (same algebraic rewrite as cube_flag_status).
    return spark.sql(
        """
        WITH base AS (
          SELECT l_returnflag, o_orderpriority,
                 SUM(CAST(l_quantity AS DECIMAL(12,2))) AS psum
          FROM __gs_join GROUP BY l_returnflag, o_orderpriority
        )
        SELECT l_returnflag, o_orderpriority,
               CAST(SUM(psum) AS DOUBLE) AS sum_qty
        FROM base
        GROUP BY GROUPING SETS ((l_returnflag), (o_orderpriority))
        """
    )


# ---------------------------------------------------------------------------
# §2.7 — global sort + limit (TopK): Spark plans orderBy+limit as
# TakeOrderedAndProject — no full sort materialization, per-partition
# heaps + a single driver-side merge of k rows.
# ---------------------------------------------------------------------------


@register(
    "top20_orders_global",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def top20_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# §2.7 — scalar subquery: customers with above-average account balance.
# ---------------------------------------------------------------------------


@register(
    "above_avg_balance_customers",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE)
                              / COUNT(*) FROM customer)
    """,
)
def above_avg_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    read_table(spark, sf_dir, "customer").createOrReplaceTempView("__cust_sq")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM __cust_sq
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE)
                                  / COUNT(*) FROM __cust_sq)
        """
    )


# ---------------------------------------------------------------------------
# A5 — approximate distinct counting (HyperLogLog++). HLL estimates
# differ across engines by design, so the estimate itself can't be
# hash-compared; instead the query emits the exact count plus a
# Spark-computed boolean `within_rsd` (estimate within 3x the 2%
# configured rsd of the exact count). The DuckDB twin computes the
# exact count and literal TRUE — hash-comparable, and a wrong/absent
# HLL estimate flips the boolean and fails the hash.
# ---------------------------------------------------------------------------


@register(
    "approx_distinct_parts",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS within_rsd
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HLL and exact distinct are computed in SEPARATE aggregates and
    # joined on the tiny group key: mixing countDistinct with another
    # aggregate makes Catalyst plan an Expand (one duplicated input
    # row per aggregate class) and push the HLL buffers through the
    # distinct shuffle — measured 3x slower than two clean
    # partial-aggregatable passes plus a 3-row join.
    li = read_table(spark, sf_dir, "lineitem")
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("_approx")
    )
    exact = (
        li.groupBy("l_returnflag", "l_partkey")
        .agg(F.lit(1))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_parts"))
    )
    return approx.join(exact, "l_returnflag").select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("_approx") - F.col("exact_parts"))
            <= F.greatest(0.06 * F.col("exact_parts"), F.lit(2.0))
        ).alias("within_rsd"),
    )


# ---------------------------------------------------------------------------
# Interval join (purchase→click attribution): the batch face of the
# stream-stream join in streaming.windows (pytest drains the stream
# twin and compares). Time-bounded equi-join → hash join on user_id
# with a residual range filter; the bound is also what makes the
# streaming state finite.
# ---------------------------------------------------------------------------

from exceldatatransform_py_spark.streaming.windows import (  # noqa: E402
    purchase_attribution_join,
)


@register(
    "purchase_attribution",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(c.ts AS TIMESTAMP) AS click_ts,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts,
           p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL 1 HOUR
    """,
)
def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return purchase_attribution_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        attribution_window="1 hour",
    )


# ---------------------------------------------------------------------------
# Cohort retention — users bucketed by first-seen week × activity week;
# week_number = weeks since cohort. Two aggregates over one events
# scan, joined on user_id (classic event-analytics rollup).
# ---------------------------------------------------------------------------


@register(
    "events_weekly_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY 1
    ),
    act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week
      FROM events
    )
    SELECT f.cohort_week, a.activity_week,
           CAST(date_diff('day', f.cohort_week, a.activity_week) // 7
                AS INTEGER) AS week_number,
           count(*) AS n_active_users
    FROM act a JOIN first_seen f USING (user_id)
    GROUP BY 1, 2, 3
    """,
)
def events_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    # to_date: DuckDB's date_trunc('week') yields DATE while Spark's
    # yields TIMESTAMP — align on DATE (week starts are midnight).
    first_seen = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    act = ev.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("activity_week")
    ).distinct()
    week_no = (
        F.datediff(F.to_date("activity_week"), F.to_date("cohort_week")) / 7
    ).cast("int")
    return (
        act.join(first_seen, "user_id")
        .groupBy("cohort_week", "activity_week", week_no.alias("week_number"))
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


# ---------------------------------------------------------------------------
# Funnel — first 'view' vs first 'purchase' per user; converted =
# purchased at/after the first view. Conditional min aggregates in ONE
# scan (no per-step rescans), then a pure projection.
# ---------------------------------------------------------------------------


@register(
    "events_funnel_view_purchase",
    oracle="""
    WITH f AS (
      SELECT user_id,
             min(ts) FILTER (WHERE event_type = 'view') AS first_view,
             min(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase
      FROM events GROUP BY 1
    )
    SELECT user_id, first_view, first_purchase,
           first_view IS NOT NULL AND first_purchase IS NOT NULL
             AND first_purchase >= first_view AS converted
    FROM f
    WHERE first_view IS NOT NULL OR first_purchase IS NOT NULL
    """,
)
def events_funnel_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    return f.filter(
        F.col("first_view").isNotNull() | F.col("first_purchase").isNotNull()
    ).select(
        "user_id",
        "first_view",
        "first_purchase",
        (
            F.col("first_view").isNotNull()
            & F.col("first_purchase").isNotNull()
            & (F.col("first_purchase") >= F.col("first_view"))
        ).alias("converted"),
    )


# ---------------------------------------------------------------------------
# Mergeable sketches (Spark 4 DataSketches surface) — the property that
# matters at 100 TB is RE-AGGREGATABILITY: a plain countDistinct/
# approx_count_distinct RESULT cannot be rolled up further, but theta/
# HLL sketches union losslessly across partitions, days, or tables.
# Oracle pattern as approx_distinct_parts: emit the exact value (hash-
# matched) plus a Spark-computed within-tolerance boolean the DuckDB
# twin asserts as literal TRUE — a wrong/absent estimate flips it.
# ---------------------------------------------------------------------------


@register(
    "theta_sketch_repeat_customers",
    oracle="""
    WITH a AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderdate >= DATE '1994-01-01'
                 AND o_orderdate < DATE '1995-01-01'),
    b AS (SELECT DISTINCT o_custkey FROM orders
          WHERE o_orderdate >= DATE '1995-01-01'
            AND o_orderdate < DATE '1996-01-01')
    SELECT (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b))
             AS exact_both,
           TRUE AS within_tol
    """,
)
def theta_sketch_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers active in BOTH 1994 and 1995, estimated by
    intersecting two theta sketches built independently per year —
    the set-operation capability HLL lacks. Each year's sketch is one
    partial-aggregatable pass; the intersection and estimate are a
    broadcast-scalar join of two 1-row frames."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("od")
    )
    y94 = o.filter((F.col("od") >= "1994-01-01") & (F.col("od") < "1995-01-01"))
    y95 = o.filter((F.col("od") >= "1995-01-01") & (F.col("od") < "1996-01-01"))
    sk94 = y94.agg(F.theta_sketch_agg("o_custkey").alias("sk_a"))
    sk95 = y95.agg(F.theta_sketch_agg("o_custkey").alias("sk_b"))
    est = sk94.crossJoin(F.broadcast(sk95)).select(
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("sk_a"), F.col("sk_b"))
        ).alias("est_both")
    )
    exact = (
        y94.select("o_custkey")
        .distinct()
        .join(y95.select("o_custkey").distinct(), "o_custkey", "left_semi")
        .agg(F.count(F.lit(1)).alias("exact_both"))
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_both",
        (
            F.abs(F.col("est_both") - F.col("exact_both"))
            <= F.greatest(0.05 * F.col("exact_both"), F.lit(8.0))
        ).alias("within_tol"),
    )


@register(
    "hll_union_rollup_parts",
    oracle="""
    SELECT COUNT(DISTINCT l_returnflag) AS n_groups,
           COUNT(DISTINCT l_partkey) AS exact_global,
           TRUE AS within_rsd
    FROM lineitem
    """,
)
def hll_union_rollup_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct parts per returnflag as HLL SKETCHES, then rolled up to
    the global distinct by unioning the sketches — the two-level
    re-aggregation a stored approx_count_distinct NUMBER cannot do
    (max/sum of per-group distincts is simply wrong under overlap).
    This is how a 100 TB pipeline keeps per-partition distinct stats
    that remain mergeable into any coarser rollup."""
    li = read_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey").alias("sk")
    )
    rolled = per.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sk"))).alias("est_global"),
    )
    exact = (
        li.groupBy("l_partkey")
        .agg(F.lit(1))
        .agg(F.count(F.lit(1)).alias("exact_global"))
    )
    return exact.crossJoin(F.broadcast(rolled)).select(
        "n_groups",
        "exact_global",
        (
            F.abs(F.col("est_global") - F.col("exact_global"))
            <= F.greatest(0.06 * F.col("exact_global"), F.lit(8.0))
        ).alias("within_rsd"),
    )


# ---------------------------------------------------------------------------
# Markov transition matrix over the event stream: per (prev_type →
# type) pair, the transition count and probability conditioned on the
# from-state. One lag window on the user's timeline (same single
# shuffle as every sequence query here) plus two hash aggregates; the
# per-from-state total arrives via a broadcast join of an O(types)
# aggregate, never a second pass over events. The probability is ONE
# double division of exact BIGINTs, so it is engine-identical.
# ---------------------------------------------------------------------------


@register(
    "event_type_transitions",
    oracle="""
    WITH seq AS (
      SELECT LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type,
             event_type
      FROM events
    ),
    cnt AS (
      SELECT prev_type, event_type, COUNT(*) AS n_transitions
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ),
    tot AS (
      SELECT prev_type, SUM(n_transitions) AS n_from FROM cnt
      GROUP BY prev_type
    )
    SELECT c.prev_type, c.event_type, c.n_transitions,
           CAST(c.n_transitions AS DOUBLE) / t.n_from AS p_transition
    FROM cnt c JOIN tot t USING (prev_type)
    """,
)
def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.lag("event_type").over(w).alias("prev_type"), "event_type"
    ).filter(F.col("prev_type").isNotNull())
    cnt = seq.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    tot = cnt.groupBy("prev_type").agg(F.sum("n_transitions").alias("n_from"))
    return cnt.join(F.broadcast(tot), "prev_type").select(
        "prev_type",
        "event_type",
        "n_transitions",
        (F.col("n_transitions").cast("double") / F.col("n_from")).alias(
            "p_transition"
        ),
    )


# ---------------------------------------------------------------------------
# Hierarchical time rollup — the OLAP cube-maintenance pattern: the
# monthly aggregate is computed FROM the hourly partial table, never
# from raw events, and must equal the direct computation (which is
# what the DuckDB twin does). This is the algebraic-reaggregation
# guarantee that lets a 100 TB pipeline keep only hourly partials and
# serve every coarser grain from them: decimal sums stay DECIMAL
# through both levels (associative, exact) and only the final SELECT
# casts to double. Plan: two hash aggregates, the second over the
# tiny partial table.
# ---------------------------------------------------------------------------


@register(
    "monthly_rollup_from_hourly",
    oracle="""
    SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def monthly_rollup_from_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_part"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("s_part"),
    )
    return (
        hourly.groupBy(
            F.date_trunc("month", F.col("hour")).cast("date").alias("month"),
            "event_type",
        )
        .agg(
            F.sum("n_part").alias("n_events"),
            F.sum("s_part").cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Session path analysis: the most common opening event sequences
# (first 3 event types) across gap-30min sessions — the product-
# analytics "top paths" report. Ordering inside a session must be
# total and portable, so the path is built by sorting an array of
# (ts, event_id, type) structs (array_sort compares fields in
# declaration order; event_id breaks ts ties) — never by relying on
# collect_list's arrival order, which is partitioning-dependent. The
# top-20 is fully tie-broken (count desc, path asc) so both engines
# select the same rows. Per-session arrays are bounded by session
# length; the final rank is a tiny aggregate.
# ---------------------------------------------------------------------------


@register(
    "top_session_paths",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ),
    paths AS (
      SELECT user_id, session_id,
             array_to_string(
               (list(event_type ORDER BY ts, event_id))[1:3], '>'
             ) AS path
      FROM sess GROUP BY user_id, session_id
    )
    SELECT path, COUNT(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path ASC
    LIMIT 20
    """,
)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = (
        prev.isNull() | (F.col("ts") - prev > F.expr("INTERVAL 30 MINUTES"))
    ).cast("int")
    sess = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_id"),
    )
    paths = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
                1,
                3,
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Inter-event gap distribution: histogram of the wait between a
# user's consecutive events, bucketed in 5-minute integer bins capped
# at bucket 12 (1h+ tail). Pure integer arithmetic on epoch seconds —
# lag on the per-user timeline (single shuffle), then one hash
# aggregate over (type, bucket); the histogram is O(types × 13) rows
# whatever the event volume.
# ---------------------------------------------------------------------------


@register(
    "inter_event_gap_histogram",
    oracle="""
    WITH sec AS (
      -- floor to whole seconds: Spark's unix_timestamp truncates the
      -- sub-second part, DuckDB's epoch() keeps it as a fraction.
      SELECT user_id, event_id, ts, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS es
      FROM events
    ),
    gaps AS (
      SELECT event_type,
             es - LAG(es) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS gap_s
      FROM sec
    )
    SELECT event_type,
           CAST(LEAST(gap_s // 300, 12) AS BIGINT) AS gap_bucket,
           COUNT(*) AS n_gaps
    FROM gaps WHERE gap_s IS NOT NULL
    GROUP BY 1, 2
    """,
)
def inter_event_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp(F.col("ts"))
    gaps = events.select(
        "event_type", (epoch - F.lag(epoch).over(w)).alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    bucket = F.least(F.floor(F.col("gap_s") / 300), F.lit(12)).cast("bigint")
    return gaps.groupBy("event_type", bucket.alias("gap_bucket")).agg(
        F.count(F.lit(1)).alias("n_gaps")
    )


# ---------------------------------------------------------------------------
# CUSUM drift detection: per user, the running sum of deviations from
# the GLOBAL mean value, and where it peaks — the classic changepoint
# signal (a user whose values drift high accumulates a rising CUSUM).
# Exactness trick: instead of x−μ in floats, accumulate N·x−S (the
# deviation scaled by the global count) — all BIGINT, so the running
# sums, the per-user peak, and its argmax event are engine-identical.
# Magnitude audit at sf0.1: |N·x−S| ≤ 1.5e5·3.3e4 ≈ 5e9 per event,
# ×O(1e3) events/user ≈ 5e12 — three orders inside int64. Shape: one
# global aggregate broadcast as a 1×1 scalar, one window shuffle on
# user_id, one tiny argmax aggregate.
# ---------------------------------------------------------------------------


@register(
    "cusum_drift_per_user",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    g AS (SELECT COUNT(*) AS n, SUM(cents) AS s FROM c),
    r AS (
      SELECT c.user_id, c.event_id,
             SUM(g.n * c.cents - g.s) OVER (PARTITION BY c.user_id
                                            ORDER BY c.ts, c.event_id
                                            ROWS UNBOUNDED PRECEDING)
               AS cusum_scaled
      FROM c, g
    )
    SELECT user_id,
           CAST(MAX(ABS(cusum_scaled)) AS BIGINT) AS max_abs_cusum,
           MIN(event_id) FILTER (WHERE ABS(cusum_scaled) = mx)
             AS at_event_id
    FROM (SELECT *, MAX(ABS(cusum_scaled)) OVER (PARTITION BY user_id)
                      AS mx FROM r)
    GROUP BY user_id
    """,
)
def cusum_drift_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    c = events.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    g = c.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    # broadcast-scalar cross join (1 row), the repo's share-of-total
    # idiom — never a data-sized cartesian.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = c.crossJoin(F.broadcast(g)).select(
        "user_id",
        "event_id",
        F.sum(F.col("n") * F.col("cents") - F.col("s")).over(w).alias(
            "cusum_scaled"
        ),
    )
    return r.groupBy("user_id").agg(
        F.max(F.abs("cusum_scaled")).alias("max_abs_cusum"),
        (-F.max(
            F.struct(
                F.abs("cusum_scaled").alias("a"),
                (-F.col("event_id")).alias("neg_id"),
            )
        )["neg_id"]).alias("at_event_id"),
    )


# ---------------------------------------------------------------------------
# Multi-measure pivot: one pivoted aggregate carrying BOTH a sum and a
# count per pivoted value (Spark emits `<value>_<agg>` columns; the
# twin states the same cells as FILTERed aggregates). Pre-pivot
# column pruning keeps the scan at three columns; the pivot values
# are declared literally so the plan is static (no values-discovery
# job at 100 TB).
# ---------------------------------------------------------------------------


@register(
    "pivot_multi_measure_status",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
             FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS F_sum_qty,
           COUNT(*) FILTER (WHERE l_linestatus = 'F') AS F_n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
             FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS O_sum_qty,
           COUNT(*) FILTER (WHERE l_linestatus = 'O') AS O_n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_multi_measure_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity"
    )
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Forward-fill imputation (LOCF — last observation carried forward):
# carry each user's most recent purchase value onto every subsequent
# event until the next purchase — the standard time-series feature
# imputation. `last(..., ignorenulls)` over an unbounded-preceding
# frame is the single-window spelling (one shuffle on user_id); the
# DuckDB twin is the same window with IGNORE NULLS. Cents quantization
# keeps the carried value engine-exact.
# ---------------------------------------------------------------------------


@register(
    "forward_fill_purchase_value",
    oracle="""
    WITH base AS (
      SELECT user_id, event_id, ts,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(ROUND(value * 100) AS BIGINT) END AS pv
      FROM events
    )
    SELECT user_id, event_id, pv AS purchase_cents,
           LAST_VALUE(pv IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING
           ) AS filled_cents
    FROM base
    """,
)
def forward_fill_purchase_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    pv = F.when(
        F.col("event_type") == "purchase",
        F.round(F.col("value") * 100).cast("long"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        pv.alias("purchase_cents"),
        F.last(pv, ignorenulls=True).over(w).alias("filled_cents"),
    )


# ---------------------------------------------------------------------------
# Time-to-next-event labels: for every event, seconds until the
# user's NEXT purchase — the label-generation pass for conversion /
# churn models (NULL = censored, no purchase follows). Mirror of the
# LOCF query with a forward frame (1 FOLLOWING → ∞) and
# first_value ignore-nulls; integer epoch seconds keep it exact.
# ---------------------------------------------------------------------------


@register(
    "time_to_next_purchase",
    oracle="""
    WITH base AS (
      SELECT user_id, event_id, ts,
             CAST(floor(epoch(ts)) AS BIGINT) AS es,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(floor(epoch(ts)) AS BIGINT) END AS pes
      FROM events
    )
    SELECT user_id, event_id,
           FIRST_VALUE(pes IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
           ) - es AS secs_to_next_purchase
    FROM base
    """,
)
def time_to_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    es = F.unix_timestamp(F.col("ts"))
    pes = F.when(F.col("event_type") == "purchase", es)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    return events.select(
        "user_id",
        "event_id",
        (F.first(pes, ignorenulls=True).over(w) - es).alias(
            "secs_to_next_purchase"
        ),
    )


# ---------------------------------------------------------------------------
# Activity ratios (DAU / MAU and stickiness): distinct active users
# per day joined to the distinct actives of the surrounding month —
# the product-health metric. Each distinct count is the Expand-free
# two-level aggregate (groupBy key+user → count), and the month side
# broadcasts (O(months) rows) onto the day side; stickiness is one
# double division of exact BIGINTs.
# ---------------------------------------------------------------------------


@register(
    "dau_mau_stickiness",
    oracle="""
    WITH dau AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(DISTINCT user_id) AS dau
      FROM events GROUP BY 1
    ),
    mau AS (
      SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
             COUNT(DISTINCT user_id) AS mau
      FROM events GROUP BY 1
    )
    SELECT d.day, d.dau, m.mau,
           CAST(d.dau AS DOUBLE) / m.mau AS stickiness
    FROM dau d JOIN mau m
      ON CAST(date_trunc('month', d.day) AS DATE) = m.month
    """,
)
def dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")

    def distinct_users(grain: str, alias: str) -> DataFrame:
        key = F.date_trunc(grain, F.col("ts")).cast("date").alias(grain)
        return (
            events.select(key, "user_id")
            .groupBy(grain, "user_id")
            .agg(F.count(F.lit(1)).alias("__n"))
            .groupBy(grain)
            .agg(F.count(F.lit(1)).alias(alias))
        )

    dau = distinct_users("day", "dau")
    mau = distinct_users("month", "mau")
    return (
        dau.withColumn("month", F.date_trunc("month", F.col("day")).cast("date"))
        .join(F.broadcast(mau), "month")
        .select(
            "day",
            "dau",
            "mau",
            (F.col("dau").cast("double") / F.col("mau")).alias("stickiness"),
        )
    )


# ---------------------------------------------------------------------------
# Cohort LTV curve: revenue per signup-week cohort by weeks-since-
# signup — the growth-accounting view (how value accrues as cohorts
# age). Cohort assignment is a per-user min (one aggregate) broadcast
# back onto events; revenue accumulates in exact cents; the age axis
# is integer week arithmetic on epoch days. Output is O(weeks²).
# ---------------------------------------------------------------------------


@register(
    "cohort_ltv_weekly",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week,
                          CAST(date_trunc('week', e.ts) AS DATE)) // 7
                AS BIGINT) AS age_weeks,
           COUNT(DISTINCT e.user_id) AS n_active,
           CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM events e JOIN firsts f USING (user_id)
    WHERE e.event_type = 'purchase'
    GROUP BY 1, 2
    """,
)
def cohort_ltv_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    week = lambda c: F.date_trunc("week", c).cast("date")  # noqa: E731
    firsts = events.groupBy("user_id").agg(
        F.min(week(F.col("ts"))).alias("cohort_week")
    )
    purchases = events.filter(F.col("event_type") == "purchase")
    joined = purchases.join(F.broadcast(firsts), "user_id").select(
        "user_id",
        "cohort_week",
        (
            F.floor(
                F.datediff(week(F.col("ts")), F.col("cohort_week")) / 7
            )
        ).cast("bigint").alias("age_weeks"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    # distinct actives via the Expand-free two-level idiom, revenue in
    # the same pass one level down.
    per_user = joined.groupBy("cohort_week", "age_weeks", "user_id").agg(
        F.sum("cents").alias("user_cents")
    )
    return per_user.groupBy("cohort_week", "age_weeks").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum("user_cents").alias("revenue_cents"),
    )


# ---------------------------------------------------------------------------
# Seasonality profile: event volume by ISO weekday × hour-of-day with
# each cell's share of its weekday — the load-shape heatmap behind
# capacity planning and anomaly baselines. Counts are exact; the
# share is one double division; weekday numbering is pinned to ISO
# (Spark weekday()+1 == DuckDB isodow, see datetime_function_gallery).
# ---------------------------------------------------------------------------


@register(
    "hourly_seasonality_profile",
    oracle="""
    WITH c AS (
      SELECT CAST(isodow(ts) AS INTEGER) AS dow_iso,
             CAST(hour(ts) AS INTEGER) AS hour_of_day,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT dow_iso, hour_of_day, n_events,
           CAST(n_events AS DOUBLE)
             / SUM(n_events) OVER (PARTITION BY dow_iso) AS share_of_day
    FROM c
    """,
)
def hourly_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    c = events.groupBy(
        (F.weekday(F.col("ts")) + F.lit(1)).cast("int").alias("dow_iso"),
        F.hour(F.col("ts")).cast("int").alias("hour_of_day"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("dow_iso")
    return c.select(
        "dow_iso",
        "hour_of_day",
        "n_events",
        (F.col("n_events").cast("double") / F.sum("n_events").over(w)).alias(
            "share_of_day"
        ),
    )


# ---------------------------------------------------------------------------
# Trailing-7-day distinct actives per day. Window-DISTINCT is not a
# thing in Spark windows, and per-day HLL merge would be approximate;
# the exact distributed form is cover-set expansion: each distinct
# (day, user) pair covers the 7 report days it can count toward
# (map-side x7 fan-out of fixed-width rows), then one distinct-agg
# shuffle on (day, user). Report days are the days present in the
# data (broadcast — at most a few thousand rows for years of data).
# ---------------------------------------------------------------------------


@register(
    "active_users_trailing_7d",
    oracle="""
    WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
    cover AS (
      SELECT d + CAST(t.range AS INTEGER) AS day, user_id
      FROM du, range(7) t
    ),
    days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
    SELECT day, count(DISTINCT user_id) AS active_users_7d
    FROM cover JOIN days USING (day)
    GROUP BY day
    """,
)
def active_users_trailing_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    cover = du.select(
        "d", "user_id", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i")
    ).select(F.date_add("d", F.col("i")).alias("day"), "user_id")
    days = ev.select(F.to_date("ts").alias("day")).distinct()
    return (
        cover.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("active_users_7d"))
    )


# ---------------------------------------------------------------------------
# EWMA of purchase value per user (alpha = 0.5). A recursive
# definition (ewma = a*x + (1-a)*prev) is not expressible as a window
# aggregate; the distributed form is one grouped collect of the
# user's ordered values + a left fold. alpha = 0.5 keeps every step
# exact-IEEE (multiply by 0.5 is exact, one correctly-rounded add),
# and both engines fold the same ordered list left — bit-identical.
# Per-group state is the user's purchase history (bounded in
# practice; same contract as the other collect_list queries).
# ---------------------------------------------------------------------------


@register(
    "ewma_value_per_user",
    oracle="""
    WITH ew AS (
      SELECT user_id,
             list(value ORDER BY ts, event_id) AS vs,
             COUNT(*) AS n_purchases
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT user_id, n_purchases,
           list_reduce(vs, (acc, x) -> 0.5 * x + 0.5 * acc) AS ewma_value
    FROM ew
    """,
)
def ewma_value_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.struct("ts", "event_id", "value").alias("s"))
    )
    g = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list("s")).alias("ss"),
        F.count(F.lit(1)).alias("n_purchases"),
    )
    vals = F.col("ss").getField("value")
    staged = g.select("user_id", "n_purchases", vals.alias("vs"))
    ewma = F.aggregate(
        F.slice(
            F.col("vs"), F.lit(2), F.greatest(F.size("vs") - 1, F.lit(0))
        ),
        F.element_at(F.col("vs"), 1),
        lambda acc, x: F.lit(0.5) * x + F.lit(0.5) * acc,
    )
    return staged.select("user_id", "n_purchases", ewma.alias("ewma_value"))


# ---------------------------------------------------------------------------
# Model-eval ops at warehouse scale — the queries that score a
# trained quality/propensity model's output without leaving the
# engine. Both are exact: rank statistics in integer arithmetic, one
# double division at the end (the repo-wide fixed-point idiom).
# ---------------------------------------------------------------------------


@register(
    "rank_auc_purchase_score",
    oracle="""
    WITH au AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS sl,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS lab
      FROM events
    ),
    aug AS (
      SELECT sl, COUNT(*) AS cnt, CAST(SUM(lab) AS BIGINT) AS pos
      FROM au GROUP BY sl
    ),
    auw AS (
      SELECT sl, cnt, pos,
             CAST(COALESCE(SUM(cnt) OVER (ORDER BY sl
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS cum
      FROM aug
    ),
    aus AS (
      SELECT CAST(SUM(pos * (2 * cum + cnt + 1)) AS BIGINT) AS s2,
             CAST(SUM(pos) AS BIGINT) AS n_pos,
             CAST(SUM(cnt - pos) AS BIGINT) AS n_neg
      FROM auw
    )
    SELECT n_pos, n_neg,
           CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE)
             / CAST(2 * n_pos * n_neg AS DOUBLE) AS auc
    FROM aus
    """,
)
def rank_auc_purchase_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of `value` as a purchase predictor, via the
    Mann-Whitney rank statistic with tie-averaged ranks. Scores are
    quantized to exact integer cents, so the rank table groups on a
    BOUNDED distinct-value domain (like the skyline's distinct
    prices) — the prefix-sum window never sees data-sized input. All
    arithmetic is int64 until the final division; rank sums stay
    under 2^63 up to ~10^9 rows per evaluated segment (segment or
    sample beyond that)."""
    ev = read_table(spark, sf_dir, "events")
    au = ev.select(
        F.round(F.col("value") * 100).cast("bigint").alias("sl"),
        (F.col("event_type") == "purchase").cast("bigint").alias("lab"),
    )
    aug = au.groupBy("sl").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("lab").alias("pos")
    )
    w = Window.orderBy("sl").rowsBetween(Window.unboundedPreceding, -1)
    auw = aug.withColumn("cum", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
    aus = auw.agg(
        F.sum(
            F.col("pos") * (2 * F.col("cum") + F.col("cnt") + 1)
        ).alias("s2"),
        F.sum("pos").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos")).alias("n_neg"),
    )
    np_, nn = F.col("n_pos"), F.col("n_neg")
    return aus.select(
        "n_pos",
        "n_neg",
        (
            (F.col("s2") - np_ * (np_ + 1)).cast("double")
            / (2 * np_ * nn).cast("double")
        ).alias("auc"),
    )


@register(
    "decile_gain_table",
    oracle="""
    WITH dg AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS clicks,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS purchases
      FROM events GROUP BY user_id
    ),
    dgn AS (
      SELECT *, CAST(ntile(10) OVER (ORDER BY clicks DESC, user_id)
                     AS INTEGER) AS decile
      FROM dg
    ),
    dga AS (
      SELECT decile, COUNT(*) AS n_users,
             CAST(SUM(purchases) AS BIGINT) AS n_purchases
      FROM dgn GROUP BY decile
    ),
    dgt AS (
      SELECT CAST(SUM(n_purchases) AS BIGINT) AS tot_p,
             CAST(SUM(n_users) AS BIGINT) AS tot_u
      FROM dga
    )
    SELECT decile, n_users, n_purchases,
           CAST(n_purchases AS DOUBLE) / CAST(tot_p AS DOUBLE)
             AS purchases_share,
           CAST(SUM(n_purchases) OVER (ORDER BY decile) AS DOUBLE)
             / CAST(tot_p AS DOUBLE) AS cum_gain,
           (CAST(n_purchases AS DOUBLE) / CAST(tot_p AS DOUBLE))
             / (CAST(n_users AS DOUBLE) / CAST(tot_u AS DOUBLE)) AS lift
    FROM dga CROSS JOIN dgt
    """,
)
def decile_gain_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gain/lift table: users ranked by engagement (clicks), split
    into deciles, each decile scored by its share of purchases and
    lift over uniform. The ntile runs over one aggregated row per
    user (same posture as rfm_customer_segments); shares are integer
    counts with one double division per output cell."""
    ev = read_table(spark, sf_dir, "events")
    dg = ev.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "click").cast("bigint")).alias("clicks"),
        F.sum((F.col("event_type") == "purchase").cast("bigint")).alias(
            "purchases"
        ),
    )
    dgn = dg.withColumn(
        "decile",
        F.ntile(10).over(Window.orderBy(F.desc("clicks"), F.asc("user_id"))),
    )
    dga = dgn.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("purchases").alias("n_purchases"),
    )
    dgt = dga.agg(
        F.sum("n_purchases").alias("tot_p"), F.sum("n_users").alias("tot_u")
    )
    joined = dga.crossJoin(F.broadcast(dgt))
    wcum = Window.orderBy("decile").rangeBetween(Window.unboundedPreceding, 0)
    share = F.col("n_purchases").cast("double") / F.col("tot_p").cast("double")
    return joined.select(
        "decile",
        "n_users",
        "n_purchases",
        share.alias("purchases_share"),
        (
            F.sum("n_purchases").over(wcum).cast("double")
            / F.col("tot_p").cast("double")
        ).alias("cum_gain"),
        (
            share
            / (F.col("n_users").cast("double") / F.col("tot_u").cast("double"))
        ).alias("lift"),
    )


# ---------------------------------------------------------------------------
# Windowed drift curve — the drift-dashboard time series: per 6-hour
# event-time window, total-variation distance between the window's
# value-bucket distribution and the whole-corpus distribution. The
# aggregation shape is EXACTLY streaming.windows.windowed_value_
# histogram (whose streaming twin is equivalence-tested in
# test_streaming); this query is the batch consumer that turns those
# histograms into the alert statistic. Same exactness posture as
# value_drift_tvd: the TVD numerator is an integer sum, one double
# division per window.
# ---------------------------------------------------------------------------

from exceldatatransform_py_spark.streaming.windows import (  # noqa: E402
    windowed_value_histogram,
)


@register(
    "windowed_drift_curve",
    oracle="""
    WITH wdh AS (
      SELECT time_bucket(INTERVAL '6 hours', ts) AS ws,
             CAST(least(floor(value / 20), 30) AS BIGINT) AS bucket,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    wdb AS (SELECT bucket, CAST(SUM(n) AS BIGINT) AS n_b FROM wdh GROUP BY 1),
    wdt AS (SELECT CAST(SUM(n_b) AS BIGINT) AS t_tot FROM wdb),
    wdw AS (SELECT ws, CAST(SUM(n) AS BIGINT) AS t_w FROM wdh GROUP BY 1),
    wdc AS (
      SELECT w.ws, w.t_w, b.bucket, b.n_b,
             CAST(COALESCE(h.n, 0) AS BIGINT) AS n_wb
      FROM wdw w CROSS JOIN wdb b
      LEFT JOIN wdh h ON h.ws = w.ws AND h.bucket = b.bucket
    ),
    wdn AS (
      SELECT ws, t_w, t.t_tot,
             CAST(SUM(abs(n_wb * t.t_tot - n_b * t_w)) AS BIGINT) AS tvd_num
      FROM wdc CROSS JOIN wdt t GROUP BY 1, 2, 3
    )
    SELECT ws AS window_start, ws + INTERVAL 6 HOUR AS window_end,
           t_w AS n_window_events,
           CAST(tvd_num AS DOUBLE) / CAST(2 * t_w * t_tot AS DOUBLE) AS tvd
    FROM wdn
    """,
)
def windowed_drift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    # The per-(window, bucket) histogram feeds three consumers (corpus
    # margins, window totals, cells) — persist the ~windows×31-row
    # frame so the event scan runs once.
    hist = windowed_value_histogram(ev, duration="6 hours").persist()
    corpus_b = hist.groupBy("bucket").agg(F.sum("n_events").alias("n_b"))
    tot = corpus_b.agg(F.sum("n_b").alias("t_tot"))
    win_t = hist.groupBy("window_start", "window_end").agg(
        F.sum("n_events").alias("t_w")
    )
    cells = (
        win_t.crossJoin(F.broadcast(corpus_b))
        .join(hist, ["window_start", "window_end", "bucket"], "left")
        .select(
            "window_start",
            "window_end",
            "t_w",
            "n_b",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_wb"),
        )
    )
    num = (
        cells.crossJoin(F.broadcast(tot))
        .groupBy("window_start", "window_end", "t_w", "t_tot")
        .agg(
            F.sum(
                F.abs(
                    F.col("n_wb") * F.col("t_tot")
                    - F.col("n_b") * F.col("t_w")
                )
            ).alias("tvd_num")
        )
    )
    return num.select(
        "window_start",
        "window_end",
        F.col("t_w").alias("n_window_events"),
        (
            F.col("tvd_num").cast("double")
            / (2 * F.col("t_w") * F.col("t_tot")).cast("double")
        ).alias("tvd"),
    )
