"""Relational-coverage batch 2: the §2 inventory rows not yet scored.

Covers J4's full-outer leg, S2's union-by-name lineage semantics
(the reference's multi-sheet concat, `timesheet_transform.py:21-29`),
correlated EXISTS (Q4-shape), global top-k join (Q3-shape),
first/last/nth window navigation, exact median without
percentile-interpolation drift, decimal-exact averages, a salted
skew join scored against its plain-join twin, array aggregation, and
a scalar-function gallery (SURVEY.md §2.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from exceldatatransform_py_spark.functions.columns import day_gt, day_lt
from exceldatatransform_py_spark.operators.skew import salted_join
from exceldatatransform_py_spark.plans.registry import register
from exceldatatransform_py_spark.sources.readers import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# J4 full outer — daily order counts vs daily ship counts for 1995:
# dates with orders but no shipments (and vice versa) survive with
# NULLs on the absent side; the join key is coalesced out.
# ---------------------------------------------------------------------------


@register(
    "full_outer_daily_activity",
    oracle="""
    WITH o AS (
      SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders
      FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995 GROUP BY 1
    ),
    s AS (
      SELECT CAST(l_shipdate AS DATE) AS d, COUNT(*) AS n_ships
      FROM lineitem WHERE year(CAST(l_shipdate AS DATE)) = 1995 GROUP BY 1
    )
    SELECT COALESCE(o.d, s.d) AS activity_date, o.n_orders, s.n_ships
    FROM o FULL OUTER JOIN s ON o.d = s.d
    """,
)
def full_outer_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    o = (
        orders.select(F.to_date("o_orderdate").alias("d"))
        .filter(F.year("d") == 1995)
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    s = (
        li.select(F.to_date("l_shipdate").alias("d"))
        .filter(F.year("d") == 1995)
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n_ships"))
    )
    j = o.join(s, o["d"] == s["d"], "full_outer")
    return j.select(
        F.coalesce(o["d"], s["d"]).alias("activity_date"), "n_orders", "n_ships"
    )


# ---------------------------------------------------------------------------
# S2 — multi-sheet union with lineage: sources with *different*
# columns are unioned by name, missing columns NULL-filled, each row
# tagged with its origin (the reference injects the sheet name the
# same way, timesheet_transform.py:24-29).
# ---------------------------------------------------------------------------


@register(
    "union_sheets_lineage",
    oracle="""
    SELECT n_nationkey AS entity_key, n_name AS entity_name,
           n_regionkey AS regionkey, 'nation' AS source
    FROM nation
    UNION ALL
    SELECT r_regionkey, r_name, NULL, 'region' FROM region
    """,
)
def union_sheets_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("entity_key"),
        F.col("n_name").alias("entity_name"),
        F.col("n_regionkey").alias("regionkey"),
        F.lit("nation").alias("source"),
    )
    region = _t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("entity_key"),
        F.col("r_name").alias("entity_name"),
        F.lit("region").alias("source"),
    )
    return nation.unionByName(region, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# Correlated EXISTS (TPC-H Q4 shape): orders with at least one line
# shipped >75 days after the order date. Spark: LEFT SEMI join with a
# mixed equi + theta condition — the equi part keys the shuffle, the
# theta part filters post-match, so this stays a hash join, not BNLJ.
# ---------------------------------------------------------------------------


@register(
    "q4_late_ship_orders",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS late_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + INTERVAL 75 DAY
    )
    GROUP BY o.o_orderpriority
    """,
)
def q4_late_ship_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cond = (li["l_orderkey"] == o["o_orderkey"]) & (
        F.to_date(li["l_shipdate"]) > F.date_add(F.to_date(o["o_orderdate"]), 75)
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("late_orders"))
    )


# ---------------------------------------------------------------------------
# Q3 shape — top-10 open orders by revenue in one segment. The global
# top-k compiles to TakeOrderedAndProject (per-partition heaps + a
# k-row driver merge), never a full sort. Revenue sums in DECIMAL so
# the DESC ordering is identical across engines; o_orderkey breaks
# ties.
# ---------------------------------------------------------------------------


@register(
    "q3_top_open_orders",
    oracle="""
    WITH r AS (
      SELECT o.o_orderkey,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue,
             CAST(o.o_orderdate AS DATE) AS order_date
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND CAST(o.o_orderdate AS DATE) < DATE '1995-03-15'
        AND CAST(l.l_shipdate AS DATE) > DATE '1995-03-15'
      GROUP BY o.o_orderkey, o.o_orderdate
    )
    SELECT * FROM r ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
)
def q3_top_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        day_lt("o_orderdate", "1995-03-15")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        day_gt("l_shipdate", "1995-03-15")
    )
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(8,2)")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("order_date"))
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
        .select("o_orderkey", "revenue", "order_date")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# §2.7 — window navigation: first/last/nth order price per customer.
# Frame is the whole partition (UNBOUNDED..UNBOUNDED) so last/nth see
# every row; pure element selection, no arithmetic to drift.
# ---------------------------------------------------------------------------


@register(
    "window_first_last_nth",
    oracle="""
    SELECT o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER w AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.to_date("o_orderdate"), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


# ---------------------------------------------------------------------------
# Exact median as deterministic element selection (row floor((n+1)/2)
# in (price, key) order) — sidesteps percentile interpolation, whose
# float rounding differs between engines.
# ---------------------------------------------------------------------------


@register(
    "median_price_by_priority",
    oracle="""
    WITH w AS (
      SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    SELECT o_orderpriority, o_totalprice AS median_price
    FROM w WHERE rn = (n + 1) // 2
    """,
)
def median_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    wo = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wn = Window.partitionBy("o_orderpriority")
    return (
        orders.select(
            "o_orderpriority",
            "o_totalprice",
            F.row_number().over(wo).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("o_orderpriority", F.col("o_totalprice").alias("median_price"))
    )


# ---------------------------------------------------------------------------
# A5 variant — multi-stat profile: min/max (element-exact), average
# via decimal sum → double ÷ double count (both engines do the same
# two IEEE ops on identical operands), distinct customers.
# ---------------------------------------------------------------------------


@register(
    "price_stats_by_priority",
    oracle="""
    SELECT o_orderpriority,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           COUNT(DISTINCT o_custkey) AS n_custs
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def price_stats_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        (
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_price"),
        F.countDistinct("o_custkey").alias("n_custs"),
    )


# ---------------------------------------------------------------------------
# Skew join scored end-to-end: fact salted into 8 sub-keys, the tiny
# derived dim exploded 8×. Oracle is the PLAIN join — salting must be
# row-invisible. (l_returnflag: 3 hot keys over the whole fact.)
# ---------------------------------------------------------------------------


@register(
    "salted_join_returnflag",
    oracle="""
    WITH dim AS (
      SELECT l_returnflag, COUNT(*) AS flag_rows FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, d.flag_rows
    FROM lineitem l JOIN dim d USING (l_returnflag)
    """,
)
def salted_join_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    fact = li.select("l_orderkey", "l_linenumber", "l_returnflag")
    dim = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("flag_rows"))
    joined = salted_join(fact, dim, on=["l_returnflag"])
    return joined.select("l_orderkey", "l_linenumber", "l_returnflag", "flag_rows")


# ---------------------------------------------------------------------------
# A2 generalized to arrays: per-nation sorted distinct segment list
# (ArrayType survives the driver compare element-wise).
# ---------------------------------------------------------------------------


@register(
    "segments_per_nation",
    oracle="""
    SELECT c_nationkey,
           list_sort(array_agg(DISTINCT c_mktsegment)) AS segments,
           CAST(len(array_agg(DISTINCT c_mktsegment)) AS INTEGER) AS n_segments
    FROM customer
    GROUP BY c_nationkey
    """,
)
def segments_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    return customer.groupBy("c_nationkey").agg(
        F.array_sort(F.collect_set("c_mktsegment")).alias("segments"),
        F.size(F.collect_set("c_mktsegment")).alias("n_segments"),
    )


# ---------------------------------------------------------------------------
# §2.6 scalar gallery — the reference's string/date function surface
# generalized: regexp extraction, case/pad/slice/length, month
# truncation, calendar parts, day offsets (the reference's
# timedelta-add, timesheet_transform.py:76), month end.
# ---------------------------------------------------------------------------


@register(
    "scalar_function_gallery",
    oracle="""
    SELECT o.o_orderkey,
           CAST(regexp_extract(c.c_name, '([0-9]+)', 1) AS BIGINT) AS cust_num,
           upper(c.c_mktsegment) AS seg_upper,
           substr(c.c_name, 1, 8) AS name_prefix,
           CAST(length(c.c_name) AS INTEGER) AS name_len,
           lpad(CAST(o.o_orderkey AS VARCHAR), 12, '0') AS padded_key,
           CAST(date_trunc('month', CAST(o.o_orderdate AS DATE)) AS DATE) AS order_month,
           CAST(year(CAST(o.o_orderdate AS DATE)) AS INTEGER) AS y,
           CAST(month(CAST(o.o_orderdate AS DATE)) AS INTEGER) AS m,
           CAST(CAST(o.o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
           last_day(CAST(o.o_orderdate AS DATE)) AS month_end
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def scalar_function_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    od = F.to_date("o_orderdate")
    return o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        "o_orderkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).cast("bigint").alias("cust_num"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("padded_key"),
        F.trunc(od, "month").alias("order_month"),
        F.year(od).alias("y"),
        F.month(od).alias("m"),
        F.date_add(od, 30).alias("due_date"),
        F.last_day(od).alias("month_end"),
    )


# ---------------------------------------------------------------------------
# §2.6 — numeric / conditional gallery. Only functions whose results
# are bit-identical across engines: abs/sign/floor/ceil (exact),
# sqrt (IEEE correctly-rounded), integer modulo, greatest/least
# (element selection), nullif/coalesce/CASE (control flow).
# Transcendentals (ln, exp, sin) are deliberately absent — IEEE does
# not require correctly-rounded results, so engines may differ in the
# last ulp and break the value-hash gate.
# ---------------------------------------------------------------------------


@register(
    "numeric_conditional_gallery",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25.0) AS dev_from_25,
           CAST(sign(l_quantity - 25.0) AS DOUBLE) AS dev_sign,
           floor(l_extendedprice) AS price_floor,
           ceil(l_extendedprice) AS price_ceil,
           sqrt(l_quantity) AS qty_sqrt,
           l_orderkey % 7 AS key_mod7,
           greatest(l_tax, l_discount) AS max_rate,
           least(l_tax, l_discount) AS min_rate,
           nullif(l_discount, 0.0) AS discount_or_null,
           coalesce(nullif(l_discount, 0.0), -1.0) AS discount_defaulted,
           CASE WHEN l_quantity < 10 THEN 'small'
                WHEN l_quantity < 40 THEN 'mid'
                ELSE 'large' END AS qty_band
    FROM lineitem
    """,
)
def numeric_conditional_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity")
    disc = F.col("l_discount")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(qty - 25.0).alias("dev_from_25"),
        F.signum(qty - 25.0).alias("dev_sign"),
        F.floor("l_extendedprice").cast("double").alias("price_floor"),
        F.ceil("l_extendedprice").cast("double").alias("price_ceil"),
        F.sqrt(qty).alias("qty_sqrt"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.nullif(disc, F.lit(0.0)).alias("discount_or_null"),
        F.coalesce(F.nullif(disc, F.lit(0.0)), F.lit(-1.0)).alias(
            "discount_defaulted"
        ),
        F.when(qty < 10, "small")
        .when(qty < 40, "mid")
        .otherwise("large")
        .alias("qty_band"),
    )


# ---------------------------------------------------------------------------
# Join-skew audit — the diagnostic that DECIDES when to salt: for a
# planned equi-join (events.user_id = orders.o_custkey), the per-key
# output contribution is |A_k| · |B_k|; the top keys' share of the
# total tells you whether one reducer will own the join. Two
# map-side-combined counts + a small key-level join — the audit runs
# at key cardinality, never at join-output size (you run it INSTEAD
# of discovering the skew by OOM).
# ---------------------------------------------------------------------------

_SKEW_TOP = 10


@register(
    "join_skew_audit",
    oracle=f"""
    WITH a AS (SELECT user_id AS k, count(*) AS n_a FROM events GROUP BY 1),
    b AS (SELECT o_custkey AS k, count(*) AS n_b FROM orders GROUP BY 1),
    m AS (
      SELECT a.k, n_a, n_b, n_a * n_b AS pairs FROM a JOIN b USING (k)
    ),
    tot AS (SELECT sum(pairs) AS total_pairs FROM m)
    SELECT k AS join_key,
           CAST(n_a AS BIGINT) AS left_rows,
           CAST(n_b AS BIGINT) AS right_rows,
           CAST(pairs AS BIGINT) AS output_pairs,
           CAST(pairs AS DOUBLE) / CAST(total_pairs AS DOUBLE) AS pair_share,
           CAST(row_number() OVER (ORDER BY pairs DESC, k) AS INTEGER) AS rk
    FROM m, tot
    QUALIFY rk <= {_SKEW_TOP}
    """,
)
def join_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").groupBy(
        F.col("user_id").alias("join_key")
    ).agg(F.count(F.lit(1)).alias("left_rows"))
    orders = _t(spark, sf_dir, "orders").groupBy(
        F.col("o_custkey").alias("join_key")
    ).agg(F.count(F.lit(1)).alias("right_rows"))
    m = ev.join(orders, "join_key").select(
        "join_key",
        F.col("left_rows").cast("bigint").alias("left_rows"),
        F.col("right_rows").cast("bigint").alias("right_rows"),
        (F.col("left_rows") * F.col("right_rows"))
        .cast("bigint")
        .alias("output_pairs"),
    )
    # total as a broadcast scalar over the (small) matched-key frame;
    # global top-10 via orderBy+limit (TakeOrdered — per-partition
    # heaps, never one reducer holding every key), then the rank
    # window runs over just the 10 survivors.
    m = m.persist()
    tot = m.groupBy().agg(F.sum("output_pairs").alias("__total"))
    top = (
        m.join(F.broadcast(tot))
        .withColumn(
            "pair_share",
            F.col("output_pairs").cast("double") / F.col("__total").cast("double"),
        )
        .orderBy(F.col("output_pairs").desc(), F.col("join_key"))
        .limit(_SKEW_TOP)
    )
    w = Window.orderBy(F.col("output_pairs").desc(), F.col("join_key"))
    return top.withColumn("rk", F.row_number().over(w).cast("int")).select(
        "join_key", "left_rows", "right_rows", "output_pairs",
        "pair_share", "rk",
    )
