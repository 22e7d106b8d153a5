"""Third SQL-coverage batch: the REMAINING TPC-H queries (q2, q7, q8,
q9, q11, q13, q15, q16, q17, q20, q21, q22) restated on the reduced
testdata star schema (no partsupp / commitdate / receiptdate / phone
columns exist — see TESTDATA.md), preserving each query's defining
shape: correlated-min subqueries, nation-pair volume joins, market
share, having-over-scalar-subquery, left-join distributions,
argmax-by-scalar, NOT-IN anti joins, correlated-avg filters,
share-of-total semi joins, EXISTS/NOT-EXISTS multi-correlation, and
anti-join + scalar-subquery combos.

Scale posture (100 TB): correlated subqueries become either a
single-pass window aggregate over the correlation key (q2, q17, q20 —
one shuffle, no self-join recompute of the probe subtree) or a
pre-aggregated join (q13, q21 — aggregate BEFORE the join, J3
discipline). Scalar subqueries (q11, q15, q22) reduce to a one-row
aggregate cross-joined in (broadcast, no shuffle). Fixed-cardinality
dims (nation, region) and heavily-filtered part subsets are broadcast;
customer/supplier/orders/lineitem joins stay shuffle joins and AQE
converts them when a side is small at runtime.

Exactness contract: identical column aliases in Spark and DuckDB; all
double SUMs accumulate in DECIMAL (order-independent) and cast back;
doubles only flow through identical-operand IEEE ops (+,-,*,/,
comparisons), so every value hash-matches the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from exceldatatransform_py_spark.functions.columns import day_between
from exceldatatransform_py_spark.plans.registry import register
from exceldatatransform_py_spark.sources.readers import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _disc_price() -> F.Column:
    """Exact-decimal l_extendedprice * (1 - l_discount)."""
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(8,2)")
    )


_DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (1 - CAST(l_discount AS DECIMAL(8,2)))"
)


# ---------------------------------------------------------------------------
# TPC-H Q2 — minimum-cost supplier. No partsupp table exists, so the
# "supply cost" is restated as the unit price (l_extendedprice /
# l_quantity) observed on lineitem. The defining shape — a correlated
# MIN subquery per part over suppliers of one region — is kept, as a
# single-pass window MIN over p_partkey (one shuffle; no self-join
# recompute of the scan+join subtree).
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH eu AS (
      SELECT p.p_partkey, p.p_name, s.s_name, s.s_acctbal,
             n.n_name AS nation,
             l.l_extendedprice / l.l_quantity AS unit_price
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
        AND p.p_type = 'LARGE' AND p.p_size BETWEEN 10 AND 20
    ), ranked AS (
      SELECT *, MIN(unit_price) OVER (PARTITION BY p_partkey) AS min_unit
      FROM eu
    )
    SELECT DISTINCT s_acctbal, s_name, nation, p_partkey, p_name, min_unit
    FROM ranked WHERE unit_price = min_unit
    ORDER BY s_acctbal DESC, nation, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    ).select("p_partkey", "p_name")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .withColumn("unit_price", F.col("l_extendedprice") / F.col("l_quantity"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("min_unit", F.min("unit_price").over(w))
        .filter(F.col("unit_price") == F.col("min_unit"))
        .select("s_acctbal", "s_name", "nation", "p_partkey", "p_name", "min_unit")
        .distinct()
        .orderBy(F.desc("s_acctbal"), "nation", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-H Q7 — volume shipping between a nation pair. Nation dims are
# broadcast; lineitem⨝orders is the one genuine big-big shuffle join
# (on l_orderkey, TPC-H's natural co-location key — bucketed layouts
# make it shuffle-free, see sources/bucketing.py).
# ---------------------------------------------------------------------------


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM CAST(l.l_shipdate AS DATE)) AS INT) AS l_year,
           CAST(SUM({_DISC_PRICE_SQL.replace('l_', 'l.l_')}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1998-01-01'
      AND ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_8')
        OR (sn.n_name = 'NATION_8' AND cn.n_name = 'NATION_3'))
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_8")
    ).select("n_nationkey", "n_name")
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    o = _t(spark, sf_dir, "orders").join(
        c, F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "cust_nation")
    li = _t(spark, sf_dir, "lineitem").filter(
        day_between("l_shipdate", "1996-01-01", "1998-01-01")
    )
    return (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8"))
            | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.to_date("l_shipdate")).alias("l_year"),
        )
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 — national market share inside one region's market for one
# part type: share = NATION_8's discounted volume / all volume, per
# order year. Ratio of two exact-decimal sums, divided in double.
# ---------------------------------------------------------------------------


@register(
    "q8_market_share",
    oracle=f"""
    WITH vol AS (
      SELECT CAST(EXTRACT(YEAR FROM CAST(o.o_orderdate AS DATE)) AS INT) AS o_year,
             {_DISC_PRICE_SQL.replace('l_', 'l.l_')} AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN region r ON cn.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO'
        AND CAST(o.o_orderdate AS DATE) >= DATE '1995-01-01'
        AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_8' THEN volume
                         ELSE CAST(0 AS DECIMAL(20,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_8' THEN volume
                         ELSE CAST(0 AS DECIMAL(20,4)) END) AS DOUBLE) AS nation_volume,
           CAST(SUM(volume) AS DOUBLE) AS total_volume
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cn = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("cn_key")
    )
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key")
    ).select("c_custkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            day_between("o_orderdate", "1995-01-01", "1997-01-01")
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", F.year(F.to_date("o_orderdate")).alias("o_year"))
    )
    sn = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    li = _t(spark, sf_dir, "lineitem")
    vol = (
        li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .join(sn, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("volume", _disc_price())
    )
    nation_vol = F.when(
        F.col("supp_nation") == "NATION_8", F.col("volume")
    ).otherwise(F.lit(0).cast("decimal(20,4)"))
    return (
        vol.groupBy("o_year")
        .agg(
            F.sum(nation_vol).cast("double").alias("nation_volume"),
            F.sum("volume").cast("double").alias("total_volume"),
        )
        .select(
            "o_year",
            (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
            "nation_volume",
            "total_volume",
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# TPC-H Q9 — product-type profit by nation and year. No ps_supplycost
# exists; cost is restated as half the part's retail price per unit
# (0.5 * p_retailprice * l_quantity), keeping the profit = revenue −
# cost shape with every term accumulated in exact decimal.
# ---------------------------------------------------------------------------


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT sn.n_name AS nation,
           CAST(EXTRACT(YEAR FROM CAST(o.o_orderdate AS DATE)) AS INT) AS o_year,
           CAST(SUM({_DISC_PRICE_SQL.replace('l_', 'l.l_')}
                    - CAST(0.5 AS DECIMAL(2,1))
                      * CAST(p.p_retailprice AS DECIMAL(12,2))
                      * CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_profit,
           COUNT(*) AS n_rows
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year(F.to_date("o_orderdate")).alias("o_year")
    )
    li = _t(spark, sf_dir, "lineitem")
    profit = _disc_price() - (
        F.lit(0.5).cast("decimal(2,1)")
        * F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", "o_year")
        .agg(
            F.sum(profit).cast("double").alias("sum_profit"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q11 — important parts: per-part value vs a fraction of the
# grand total (scalar subquery + HAVING). No partsupp; value = the
# part's discounted lineitem revenue from ASIA-region suppliers. The
# per-part aggregate is computed ONCE; the grand total re-aggregates
# the (small) per-part result, and the threshold arrives by broadcast
# cross join — the big scan runs a single time. Comparison is done in
# exact decimal on both engines.
# ---------------------------------------------------------------------------


@register(
    "q11_important_parts",
    oracle=f"""
    WITH per_part AS (
      SELECT l.l_partkey AS p_partkey,
             SUM({_DISC_PRICE_SQL.replace('l_', 'l.l_')}) AS value_dec
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
      GROUP BY l.l_partkey
    )
    SELECT p_partkey, CAST(value_dec AS DOUBLE) AS part_value
    FROM per_part
    WHERE value_dec > (SELECT SUM(value_dec) * CAST(0.001 AS DECIMAL(4,3))
                       FROM per_part)
    ORDER BY part_value DESC, p_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    per_part = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(_disc_price()).alias("value_dec"))
    )
    total = per_part.agg(
        (F.sum("value_dec") * F.lit(0.001).cast("decimal(4,3)")).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_dec") > F.col("threshold"))
        .select("p_partkey", F.col("value_dec").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "p_partkey")
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 — customer order-count distribution. Orders are aggregated
# to per-customer counts BEFORE the (right-outer-shaped) join with
# customer — J3 discipline — then the counts histogram. Customers with
# no qualifying orders land in the c_count = 0 bucket via coalesce.
# ---------------------------------------------------------------------------


@register(
    "q13_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        c.join(per_cust, c.c_custkey == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("n_orders"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 — top supplier(s): revenue per supplier over one quarter,
# keep those equal to the maximum. The max is a one-row aggregate of
# the (already small) per-supplier rollup, broadcast back — never a
# global single-partition window. Equality is exact (decimal).
# ---------------------------------------------------------------------------


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM({_DISC_PRICE_SQL}) AS total_revenue_dec
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue_dec AS DOUBLE) AS total_revenue
    FROM revenue r
    JOIN supplier s ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue_dec = (SELECT MAX(total_revenue_dec) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        day_between("l_shipdate", "1996-01-01", "1996-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).alias("total_revenue_dec")
    )
    best = revenue.agg(F.max("total_revenue_dec").alias("max_revenue"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(best))
        .filter(F.col("total_revenue_dec") == F.col("max_revenue"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# TPC-H Q16 — supplier count per part attribute triple, excluding a
# supplier blacklist (NOT IN → broadcast anti join; negative-balance
# suppliers stand in for the reference's complaint filter).
# ---------------------------------------------------------------------------


@register(
    "q16_parts_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q16_parts_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 — small-quantity-order revenue: rows with quantity below
# 20% of their part's average quantity. The correlated AVG subquery is
# a single-pass window aggregate over p_partkey (Spark computes the
# per-part average and probes it in one shuffle — no second scan, no
# self-join). The average divides an exact decimal sum by a count, in
# double, identically on both engines.
# ---------------------------------------------------------------------------


@register(
    "q17_small_qty_revenue",
    oracle="""
    WITH brand AS (
      SELECT l.l_quantity, l.l_extendedprice,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2)))
                    OVER (PARTITION BY l.l_partkey) AS DOUBLE)
               / COUNT(l.l_quantity) OVER (PARTITION BY l.l_partkey) AS avg_qty
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_brand = 'Brand#3'
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
             AS avg_yearly,
           COUNT(*) AS n_rows
    FROM brand WHERE l_quantity < 0.2 * avg_qty
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3").select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).over(w).cast("double")
        / F.count("l_quantity").over(w)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q20 — dominant shippers: suppliers who shipped more than half
# of a part's total 1996 volume, restricted to one region. Share-of-
# total per correlation key = pre-aggregate to (part, supplier), then
# a window SUM over the part — both shuffles run on the already-
# reduced aggregate, not raw lineitem. Decimal compare is exact.
# ---------------------------------------------------------------------------


@register(
    "q20_dominant_shippers",
    oracle="""
    WITH ps AS (
      SELECT l.l_partkey, l.l_suppkey,
             SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS qty_ps
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_name LIKE '%blue%'
        AND CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
      GROUP BY l.l_partkey, l.l_suppkey
    ), dominant AS (
      SELECT DISTINCT l_suppkey FROM (
        SELECT l_suppkey, qty_ps,
               SUM(qty_ps) OVER (PARTITION BY l_partkey) AS qty_part
        FROM ps
      ) t WHERE qty_ps > CAST(0.5 AS DECIMAL(2,1)) * qty_part
    )
    SELECT s.s_name, n.n_name AS nation
    FROM dominant d
    JOIN supplier s ON d.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'AFRICA'
    ORDER BY s.s_name
    """,
)
def q20_dominant_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%")).select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        day_between("l_shipdate", "1996-01-01", "1997-01-01")
    )
    ps = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qty_ps"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        ps.withColumn("qty_part", F.sum("qty_ps").over(w))
        .filter(F.col("qty_ps") > F.lit(0.5).cast("decimal(2,1)") * F.col("qty_part"))
        .select("l_suppkey")
        .distinct()
    )
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )
    return (
        dominant.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "nation")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 — suppliers who kept orders waiting. No receipt/commit
# dates exist; a supplier "failed" an order if its line came back with
# l_returnflag = 'R'. The EXISTS (another supplier participated) /
# NOT EXISTS (no other supplier failed) pair is restated as a two-
# level aggregate: per (order, supplier) → per order, keeping orders
# with ≥2 suppliers of which exactly one failed — the correlated
# double-subquery collapses into one shuffle on l_orderkey instead of
# two self-joins of lineitem.
# ---------------------------------------------------------------------------


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH failed AS (
      SELECT DISTINCT l1.l_suppkey, l1.l_orderkey
      FROM lineitem l1
      JOIN orders o ON l1.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM failed f JOIN supplier s ON f.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    per_supp = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.col("l_returnflag") == "R").alias("failed"))
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.col("failed").cast("int")).alias("n_failed"),
        F.max(F.when(F.col("failed"), F.col("l_suppkey"))).alias("failed_supp"),
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_failed") == 1))
        .groupBy("failed_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(s, F.col("failed_supp") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 — idle high-balance customers: balance above the average
# positive balance (scalar subquery → one-row broadcast) and no orders
# at all (anti join), grouped by nation (no phone column exists; the
# nation dim replaces the phone-prefix bucketing).
# ---------------------------------------------------------------------------


@register(
    "q22_idle_rich_customers",
    oracle="""
    SELECT n.n_name AS nation, COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                 / COUNT(c_acctbal)
        FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY nation
    ORDER BY nation
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double")
            / F.count("c_acctbal")
        ).alias("avg_bal")
    )
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("nation")
    )
