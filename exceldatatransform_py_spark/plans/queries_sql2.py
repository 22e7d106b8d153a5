"""Second SQL-coverage batch: classic TPC-H-style plans (q6/q10/q12/
q14/q18/q19 restated on the available columns), min_by/max_by,
FILTER-clause aggregates, histogram bucketing, higher-order array
functions, regexp/string galleries, positional explode, time-series
gap fill, and deterministic hash-based dataset splits.

Same conventions as `plans.queries`: every computed column aliased
identically in Spark and oracle SQL; double sums through exact
DECIMAL accumulation (`dec_sum`); window/top-k orderings carry a
unique tiebreaker; no transcendentals (only IEEE correctly-rounded
ops: +,-,*,/ on identical inputs), so every value hash-matches DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from exceldatatransform_py_spark.functions.columns import day_between, dec_sum
from exceldatatransform_py_spark.functions.text import md5_hash32, ws_tokens
from exceldatatransform_py_spark.plans.registry import register
from exceldatatransform_py_spark.sources.readers import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


_TOKS = r"list_filter(string_split_regex(trim(text), '\s+'), t -> t != '')"


# ---------------------------------------------------------------------------
# TPC-H Q6 — the pushdown showcase: tight scan-filter-aggregate with
# every predicate reaching the parquet reader; single-row result.
# ---------------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(8,2)")
    return (
        li.filter(
            day_between("l_shipdate", "1996-01-01", "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(price * disc).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 — returned-item revenue ranking: 3-way join + broadcast
# dim, group, global deterministic top-20 (TakeOrderedAndProject —
# per-partition heaps, no full sort).
# ---------------------------------------------------------------------------


@register(
    "q10_returned_item_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND CAST(o.o_orderdate AS DATE) >= DATE '1995-10-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1996-01-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        day_between("o_orderdate", "1995-10-01", "1996-01-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(8,2)")
    df = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
    )
    # revenue is an exact-decimal double (identical in both engines), so
    # (revenue DESC, custkey) is a total, engine-independent order.
    return df.orderBy(F.desc("revenue"), "c_custkey").limit(20)


# ---------------------------------------------------------------------------
# TPC-H Q12 (adapted to available columns) — CASE-based conditional
# aggregation: high/low-priority order counts per return flag.
# ---------------------------------------------------------------------------


@register(
    "q12_priority_by_returnflag",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
    GROUP BY 1
    """,
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        day_between("l_shipdate", "1996-01-01", "1997-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 — promo revenue share: broadcast part join + two
# conditional decimal sums; the ratio is a single double division of
# engine-identical doubles.
# ---------------------------------------------------------------------------


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT 100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(8,2)))
                    ELSE CAST(0 AS DECIMAL(20,4)) END) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(8,2)))) AS DOUBLE)
             AS promo_pct,
           CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(8,2)))
                    ELSE CAST(0 AS DECIMAL(20,4)) END) AS DOUBLE) AS promo_revenue,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS total_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-03-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1996-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        day_between("l_shipdate", "1996-03-01", "1996-04-01")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc_price = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(8,2)")
    )
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(
        F.lit(0).cast("decimal(20,4)")
    )
    agg = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.sum(promo).cast("double").alias("promo_revenue"),
        F.sum(disc_price).cast("double").alias("total_revenue"),
    )
    return agg.select(
        (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
            "promo_pct"
        ),
        "promo_revenue",
        "total_revenue",
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 — large-volume orders: HAVING on an exact-decimal sum,
# then join the qualifying keys back to orders + customer. The
# having-subquery is pre-aggregated (J3 discipline: aggregate before
# the join, never after).
# ---------------------------------------------------------------------------


@register(
    "q18_large_volume_orders",
    oracle="""
    SELECT c.c_name, o.o_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date, o.o_totalprice,
           CAST(q.sum_qty_dec AS DOUBLE) AS sum_qty
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty_dec
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300
    ) q ON o.o_orderkey = q.l_orderkey
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 300)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            "o_totalprice",
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 — disjunctive bracket predicates: OR-of-ANDs over
# (brand, size, quantity) pushed into a broadcast part join.
# ---------------------------------------------------------------------------


@register(
    "q19_bracket_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty, size, brand = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((brand == "Brand#12") & size.between(1, 5) & qty.between(1, 11))
        | ((brand == "Brand#23") & size.between(1, 10) & qty.between(10, 20))
        | ((brand == "Brand#34") & size.between(1, 15) & qty.between(20, 30))
    )
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(8,2)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# min_by / max_by — "value at the extremum of another column" without
# a self-join or window; the ordering column (o_orderkey) is unique
# per group, so results are deterministic.
# ---------------------------------------------------------------------------


@register(
    "minmax_by_customer",
    oracle="""
    SELECT o_custkey,
           arg_max(o_totalprice, o_orderkey) AS latest_order_price,
           arg_min(o_totalprice, o_orderkey) AS first_order_price,
           max(o_orderkey) AS latest_orderkey,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
)
def minmax_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_totalprice", "o_orderkey").alias("latest_order_price"),
        F.min_by("o_totalprice", "o_orderkey").alias("first_order_price"),
        F.max("o_orderkey").alias("latest_orderkey"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Filtered aggregates — SQL FILTER clause ≡ Spark sum(CASE)/count(CASE)
# in one hash-aggregate pass (no per-predicate rescans).
# ---------------------------------------------------------------------------


@register(
    "filtered_aggs_by_nation",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS n_customers,
           COUNT(*) FILTER (WHERE c_acctbal > 5000) AS n_rich,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)))
                FILTER (WHERE c_acctbal > 5000) AS DOUBLE) AS rich_balance,
           COUNT(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS n_building
    FROM customer
    GROUP BY c_nationkey
    """,
)
def filtered_aggs_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    rich = F.col("c_acctbal") > 5000
    return c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.count(F.when(rich, 1)).alias("n_rich"),
        F.sum(F.when(rich, F.col("c_acctbal").cast("decimal(12,2)")))
        .cast("double")
        .alias("rich_balance"),
        F.count(F.when(F.col("c_mktsegment") == "BUILDING", 1)).alias("n_building"),
    )


# ---------------------------------------------------------------------------
# Histogram — fixed-width bucketing via floor division (IEEE division
# is correctly rounded, so bucket boundaries are engine-identical).
# ---------------------------------------------------------------------------


@register(
    "price_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY 1
    """,
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(
        F.floor(F.col("o_totalprice") / 50000.0).cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum("o_totalprice").alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# Higher-order array functions — ordered array_agg then
# transform/filter/aggregate/exists/forall/zip_with/slice, all
# JVM-side lambda expressions (no UDFs). Quantities are integral
# doubles (1..50), cast to BIGINT so every fold is exact.
# ---------------------------------------------------------------------------


@register(
    "array_hof_gallery",
    oracle="""
    WITH t AS (
      SELECT l_orderkey,
             -- (l_orderkey, l_linenumber) is NOT unique in this data;
             -- the quantity tiebreaker mirrors Spark's struct sort so
             -- both engines build the identical array.
             list(CAST(l_quantity AS BIGINT)
                  ORDER BY l_linenumber, CAST(l_quantity AS BIGINT)) AS qs
      FROM lineitem
      GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           qs,
           len(qs) AS n_items,
           CAST(list_sum(qs) AS BIGINT) AS total_qty,
           list_transform(qs, x -> x * 2) AS doubled,
           list_filter(qs, x -> x >= 25) AS big_items,
           len(list_filter(qs, x -> x >= 40)) > 0 AS any_ge_40,
           len(list_filter(qs, x -> x > 0)) = len(qs) AS all_positive,
           qs[1] AS first_qty,
           qs[-1] AS last_qty,
           list_reverse(list_sort(qs))[1:3] AS top3,
           list_transform(qs, x -> x * 3) AS zipped3
    FROM t
    """,
)
def array_hof_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pairs = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("l_linenumber").alias("ln"),
                F.col("l_quantity").cast("bigint").alias("q"),
            )
        )
    )
    t = li.groupBy("l_orderkey").agg(
        F.transform(pairs, lambda s: s["q"]).alias("qs")
    )
    qs = F.col("qs")
    doubled = F.transform(qs, lambda x: x * 2)
    return t.select(
        "l_orderkey",
        "qs",
        F.size(qs).alias("n_items"),
        F.aggregate(qs, F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias(
            "total_qty"
        ),
        doubled.alias("doubled"),
        F.filter(qs, lambda x: x >= 25).alias("big_items"),
        F.exists(qs, lambda x: x >= 40).alias("any_ge_40"),
        F.forall(qs, lambda x: x > 0).alias("all_positive"),
        F.element_at(qs, 1).alias("first_qty"),
        F.element_at(qs, -1).alias("last_qty"),
        F.slice(F.reverse(F.array_sort(qs)), 1, 3).alias("top3"),
        F.zip_with(qs, doubled, lambda x, y: x + y).alias("zipped3"),
    )


# ---------------------------------------------------------------------------
# Regexp + string function gallery — RE2/Java-regex-portable patterns
# only (literal classes, no backrefs/lookarounds).
# ---------------------------------------------------------------------------


@register(
    "regexp_string_gallery",
    oracle="""
    SELECT c_custkey,
           CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS cust_num,
           regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS seg_masked,
           regexp_matches(c_name, '^Customer#0000000') AS low_key,
           lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nation_padded,
           rpad(c_mktsegment, 12, '.') AS seg_padded,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lowvowel,
           reverse(c_mktsegment) AS seg_rev,
           repeat(substr(c_mktsegment, 1, 2), 2) AS seg_rep,
           strpos(c_name, '#') AS hash_pos,
           ascii(c_mktsegment) AS seg_ascii,
           substr(c_name, 1, 8) AS name_prefix
    FROM customer
    """,
)
def regexp_string_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    seg = F.col("c_mktsegment")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", "([0-9]+)", 1).cast("bigint").alias("cust_num"),
        F.regexp_replace(seg, "[AEIOU]", "_").alias("seg_masked"),
        F.col("c_name").rlike("^Customer#0000000").alias("low_key"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nation_padded"),
        F.rpad(seg, 12, ".").alias("seg_padded"),
        F.translate(seg, "AEIOU", "aeiou").alias("seg_lowvowel"),
        F.reverse(seg).alias("seg_rev"),
        F.repeat(F.substring(seg, 1, 2), 2).alias("seg_rep"),
        F.instr("c_name", "#").alias("hash_pos"),
        F.ascii(seg).alias("seg_ascii"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
    )


# ---------------------------------------------------------------------------
# Positional explode — generator with ordinal (posexplode ≡ zipped
# unnest(range(len), toks) in DuckDB; both 0-based).
# ---------------------------------------------------------------------------


@register(
    "posexplode_doc_tokens",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(unnest(range(len(toks))) AS INTEGER) AS pos,
           unnest(toks) AS tok
    FROM t
    """,
)
def posexplode_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: single-row-group scan; the generator multiplies rows
    # ~100x, so the map stage must parallelize before it.
    docs = read_table(spark, sf_dir, "documents", fan_out=True)
    return docs.select(
        "doc_id", F.posexplode(ws_tokens("text")).alias("pos", "tok")
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms — tokenize → per-(doc,term) tf → doc-frequency join
# → rational score tf*N/df (exact integer ratio in double: no logs, so
# engine-identical) → deterministic top-3 per doc.
# ---------------------------------------------------------------------------


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ),
    df AS (
      SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok, tf.tf, df.df,
             CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score
      FROM tf JOIN df USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok, tf, df, score, rk FROM (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY doc_id ORDER BY score DESC, tok) AS INTEGER) AS rk
      FROM scored
    ) WHERE rk <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents", fan_out=True)
    toks = docs.select("doc_id", F.explode(ws_tokens("text")).alias("tok"))
    # tf feeds BOTH join sides (tf ⋈ df(tf)); Catalyst does not dedupe
    # self-join subtrees, so persist or the tokenize+agg runs twice.
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf")).persist()
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "tok")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "tok", "tf", "df", "score", "rk")
    )


# ---------------------------------------------------------------------------
# Time-series gap fill — hourly spine (sequence + explode) × event
# types, left-joined against the observed hourly aggregate; missing
# hours surface as explicit zero rows. The spine is tiny (hours ×
# types) regardless of fact size, so it broadcasts.
# ---------------------------------------------------------------------------


@register(
    "events_gap_fill_hourly",
    oracle="""
    WITH b AS (
      SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_ts FROM b
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    agg AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_ts,
             COUNT(*) AS n_obs,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2
    )
    SELECT t.event_type, s.hour_ts,
           COALESCE(a.n_obs, 0) AS n_events,
           COALESCE(a.sum_value, 0.0) AS sum_value
    FROM spine s
    CROSS JOIN types t
    LEFT JOIN agg a ON a.event_type = t.event_type AND a.hour_ts = s.hour_ts
    """,
)
def events_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    bounds = ev.agg(
        F.min(hour).alias("h0"), F.max(hour).alias("h1")
    )
    spine = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour_ts")
    )
    types = ev.select("event_type").distinct()
    agg = ev.groupBy(
        "event_type", hour.alias("hour_ts")
    ).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sv"),
    )
    return (
        spine.crossJoin(types)
        .join(agg, ["event_type", "hour_ts"], "left")
        .select(
            "event_type",
            "hour_ts",
            F.coalesce("n_obs", F.lit(0)).alias("n_events"),
            F.coalesce("sv", F.lit(0.0)).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic dataset split — train/val/test by a portable content
# hash of the key (md5-derived, seed 7): reproducible across engines,
# runs, and partitionings; no RNG, no sampleBy. The split column is a
# pure expression, so the assignment also survives re-partitioning at
# 100 TB (unlike rand()-based sampling).
# ---------------------------------------------------------------------------

_SPLIT_H = (
    "CAST(concat('0x', substr(md5(concat('7:', CAST(doc_id AS VARCHAR))), 1, 8)) "
    "AS BIGINT) % 100"
)


@register(
    "hash_split_documents",
    oracle=f"""
    WITH t AS (
      SELECT lang, n_chars,
             CASE WHEN {_SPLIT_H} < 80 THEN 'train'
                  WHEN {_SPLIT_H} < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM t GROUP BY 1, 2
    """,
)
def hash_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    bucket = md5_hash32(F.col("doc_id"), seed=7) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select("lang", "n_chars", split.alias("split"))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# SQL front-end — the same engine through spark.sql() over registered
# views (CTE + window share-of-total). The window SUM re-casts the
# exact-decimal double back to DECIMAL so the partition total is
# order-independent (a raw SUM(double) OVER w would not be
# reproducible across partitionings).
# ---------------------------------------------------------------------------


@register(
    "sql_api_priority_share",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, o_orderpriority AS prio,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1, 2
    )
    SELECT d, prio, rev,
           rev / CAST(SUM(CAST(rev AS DECIMAL(18,2))) OVER (PARTITION BY d)
                      AS DOUBLE) AS share
    FROM daily
    """,
)
def sql_api_priority_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        WITH daily AS (
          SELECT to_date(o_orderdate) AS d, o_orderpriority AS prio,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS rev
          FROM v_orders GROUP BY 1, 2
        )
        SELECT d, prio, rev,
               rev / CAST(SUM(CAST(rev AS DECIMAL(18,2))) OVER (PARTITION BY d)
                          AS DOUBLE) AS share
        FROM daily
        """
    )


# ---------------------------------------------------------------------------
# Exact distinct counting via mergeable roaring-style bitmaps
# (bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg —
# Spark 3.5+). This is the scale answer when EXACT distincts must be
# re-aggregable (per-partition partials merged with bitmap_or_agg,
# e.g. daily partials → monthly exact rollup) where HLL sketches give
# only estimates and COUNT(DISTINCT) can't merge. Two-level shape: one
# partial-aggregatable groupBy builds per-(group, bucket) bitmaps, a
# second sums their popcounts — no Expand, no row duplication. The
# '*' row merges the per-type bitmaps with bitmap_or_agg BEFORE
# counting: re-aggregating already-aggregated bitmaps is the whole
# point, and its count hash-matches the flat COUNT(DISTINCT).
# ---------------------------------------------------------------------------


@register(
    "bitmap_distinct_users",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users FROM events
    GROUP BY event_type
    UNION ALL
    SELECT '*' AS event_type, COUNT(DISTINCT user_id) AS n_users FROM events
    """,
)
def bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    buckets = (
        events.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    per_type = buckets.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_users")
    )
    merged = (
        buckets.groupBy("bkt")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n_users"))
        .select(F.lit("*").alias("event_type"), "n_users")
    )
    return per_type.unionByName(merged)


# ---------------------------------------------------------------------------
# VARIANT shredding (Spark 4 semi-structured type): parse the events
# JSON props column once into VARIANT, extract typed fields with
# variant_get, and aggregate. Against plain from_json this keeps
# open-schema data queryable without a declared struct — the modern
# lakehouse ingestion shape for logs. try_variant_get on an absent
# path must yield NULL (not error): the n_missing column pins that.
# ---------------------------------------------------------------------------


@register(
    "variant_shred_props",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(props ->> 'k' AS BIGINT)) AS min_k,
           MAX(CAST(props ->> 'k' AS BIGINT)) AS max_k,
           COUNT(*) FILTER (WHERE props ->> 'absent' IS NULL) AS n_missing
    FROM events GROUP BY event_type
    """,
)
def variant_shred_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    v = events.select(
        "event_type", F.expr("parse_json(props)").alias("vp")
    ).select(
        "event_type",
        F.expr("variant_get(vp, '$.k', 'bigint')").alias("k"),
        F.expr("try_variant_get(vp, '$.absent', 'string')").alias("absent"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.sum(F.when(F.col("absent").isNull(), 1).otherwise(0)).alias("n_missing"),
    )


# ---------------------------------------------------------------------------
# MapType function surface: build a priority→count map per customer
# (map_from_entries over sorted struct entries — deterministic key
# order) and consume it with map_keys / map_values / element_at /
# map_filter / aggregate. The emitted columns are plain scalars, so
# the DuckDB twin states the same semantics as conditional aggregates
# — the oracle checks MEANING, the Spark plan exercises the map
# operators. Map construction is one partial-aggregatable groupBy
# (bounded by the 5-value priority domain per customer); everything
# downstream is map-side expression work.
# ---------------------------------------------------------------------------


@register(
    "map_function_gallery",
    oracle="""
    SELECT o_custkey AS custkey,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           MIN(o_orderpriority) AS min_priority,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT')
             AS urgent_orders,
           COUNT(*) AS total_orders,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority IN
                  ('1-URGENT', '2-HIGH')) AS DOUBLE) / COUNT(*)
             AS high_share
    FROM orders GROUP BY o_custkey
    """,
)
def map_function_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    counts = orders.groupBy(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("p"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    m = counts.groupBy("custkey").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("p", "cnt")))
        ).alias("pm")
    )
    total = F.aggregate(
        F.map_values(F.col("pm")), F.lit(0).cast("long"), lambda a, x: a + x
    )
    high = F.aggregate(
        F.map_values(
            F.map_filter(
                F.col("pm"), lambda k, v: k.isin("1-URGENT", "2-HIGH")
            )
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return m.select(
        "custkey",
        F.size(F.map_keys(F.col("pm"))).cast("long").alias("n_priorities"),
        F.array_min(F.map_keys(F.col("pm"))).alias("min_priority"),
        F.coalesce(F.element_at(F.col("pm"), F.lit("1-URGENT")), F.lit(0))
        .cast("long")
        .alias("urgent_orders"),
        total.alias("total_orders"),
        (high.cast("double") / total).alias("high_share"),
    )


# ---------------------------------------------------------------------------
# Temporal scalar surface: the calendar functions a ledger pipeline
# leans on, restated with their exact DuckDB twins (the mappings are
# the point — e.g. Spark's weekday() is 0=Monday while DuckDB's
# isodow is 1=Monday; Spark add_months and DuckDB '+ INTERVAL'
# both clamp to month end). Map-only, engine-exact.
# ---------------------------------------------------------------------------


@register(
    "datetime_function_gallery",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS od,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
           CAST(isodow(o_orderdate) AS INTEGER) AS dow_iso,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
             AS plus_3_months,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
             AS days_to_eoy98
    FROM orders
    """,
)
def datetime_function_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders", fan_out=True)
    od = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        od.alias("od"),
        F.quarter(od).alias("qtr"),
        F.weekofyear(od).alias("iso_week"),
        (F.weekday(od) + F.lit(1)).cast("int").alias("dow_iso"),
        F.last_day(od).alias("month_end"),
        F.add_months(od, 3).alias("plus_3_months"),
        F.datediff(F.lit("1998-12-31").cast("date"), od).cast("bigint")
        .alias("days_to_eoy98"),
    )


# ---------------------------------------------------------------------------
# Year-over-year growth: monthly revenue with a 12-row lag on the
# month spine per priority — revenue exact (decimal sums), growth one
# double division. One window shuffle over the tiny aggregate table.
# ---------------------------------------------------------------------------


@register(
    "monthly_revenue_yoy",
    oracle="""
    WITH m AS (
      SELECT o_orderpriority AS priority,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1, 2
    )
    SELECT priority, month, revenue,
           revenue / LAG(revenue, 12) OVER (PARTITION BY priority
                                            ORDER BY month) - 1
             AS yoy_growth
    FROM m
    """,
)
def monthly_revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
        .cast("double")
        .alias("revenue")
    )
    w = Window.partitionBy("priority").orderBy("month")
    return m.select(
        "priority",
        "month",
        "revenue",
        (F.col("revenue") / F.lag("revenue", 12).over(w) - 1).alias("yoy_growth"),
    )


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4.1): generate the 1992-1998 month spine
# recursively and zero-fill monthly order counts against it — the
# date-dimension pattern without a stored calendar table. UNION ALL
# recursion on an acyclic generator terminates fine (NOTES.md records
# why cyclic transitive closure must NOT use this). The DuckDB twin is
# the same WITH RECURSIVE, letter for letter apart from the interval
# cast. The spine is 84 rows — the recursion runs driver-cheap, and
# the fact-side aggregate stays one hash aggregate.
# ---------------------------------------------------------------------------

_SPINE_SQL = """
    WITH RECURSIVE spine AS (
      SELECT DATE '1992-01-01' AS month
      UNION ALL
      SELECT CAST(month + INTERVAL 1 MONTH AS DATE) FROM spine
      WHERE month < DATE '1998-12-01'
    ),
    m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             COUNT(*) AS n
      FROM {orders} GROUP BY 1
    )
    SELECT s.month, CAST(COALESCE(m.n, 0) AS BIGINT) AS n_orders
    FROM spine s LEFT JOIN m ON s.month = m.month
"""


@register(
    "recursive_month_spine",
    oracle=_SPINE_SQL.format(orders="orders"),
)
def recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    read_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "v_orders_spine"
    )
    return spark.sql(_SPINE_SQL.format(orders="v_orders_spine"))


# ---------------------------------------------------------------------------
# LATERAL correlated subquery (Spark 4 SQL surface): each customer's
# single most expensive order via a correlated ORDER BY … LIMIT 1 —
# the SQL spelling of top-1-per-group. Catalyst decorrelates this to
# a windowed rank (no per-row re-execution), so the physical plan is
# the same single-shuffle shape as `topk_orders_per_segment`; the
# LATERAL form is what analysts write, and it must not regress into a
# nested-loop re-scan. Fully tie-broken (price desc, orderkey asc).
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM {customer} c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM {orders}
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
    ) o
"""


@register(
    "lateral_top_order_per_customer",
    oracle=_LATERAL_SQL.format(customer="customer", orders="orders"),
)
def lateral_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    read_table(spark, sf_dir, "customer").createOrReplaceTempView("v_lat_cust")
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("v_lat_ord")
    return spark.sql(
        _LATERAL_SQL.format(customer="v_lat_cust", orders="v_lat_ord")
    )


# ---------------------------------------------------------------------------
# Array SET operations (intersect/union/except/overlap) — per order,
# the set of high-quantity parts vs the set of discounted parts.
# Outputs are sorted and deduplicated on BOTH engines (Spark's
# array_* set functions dedup; DuckDB's list_intersect does too but
# aggregate FILTER yields NULL on empty where Spark's collect_set
# yields [] — the COALESCE in the twin pins that mapping). Shape: one
# grouped aggregate building both sets in one pass, set ops map-side.
# ---------------------------------------------------------------------------


@register(
    "array_setop_gallery",
    oracle="""
    WITH s AS (
      SELECT l_orderkey,
             COALESCE(list_sort(list(DISTINCT l_partkey)
               FILTER (WHERE l_quantity >= 25)), []) AS hi_qty,
             COALESCE(list_sort(list(DISTINCT l_partkey)
               FILTER (WHERE l_discount > 0.05)), []) AS discounted
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey, hi_qty, discounted,
           list_sort(list_intersect(hi_qty, discounted)) AS both_sets,
           list_sort(list_distinct(list_concat(hi_qty, discounted)))
             AS either_set,
           list_sort(list_filter(hi_qty,
             x -> NOT list_contains(discounted, x))) AS only_hi,
           list_has_any(hi_qty, discounted) AS overlaps
    FROM s
    """,
)
def array_setop_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_set(F.when(F.col("l_quantity") >= 25, F.col("l_partkey")))
        ).alias("hi_qty"),
        F.sort_array(
            F.collect_set(F.when(F.col("l_discount") > 0.05, F.col("l_partkey")))
        ).alias("discounted"),
    )
    return s.select(
        "l_orderkey",
        "hi_qty",
        "discounted",
        F.sort_array(F.array_intersect("hi_qty", "discounted")).alias("both_sets"),
        F.sort_array(F.array_union("hi_qty", "discounted")).alias("either_set"),
        F.sort_array(F.array_except("hi_qty", "discounted")).alias("only_hi"),
        F.arrays_overlap("hi_qty", "discounted").alias("overlaps"),
    )


# ---------------------------------------------------------------------------
# Null-safe equi-join (<=> / IS NOT DISTINCT FROM): dimension rows may
# legitimately key on NULL ("status not yet assigned"), and a plain
# '=' join silently drops every NULL-keyed fact row — the classic
# silent-data-loss bug this query pins. The NULL bucket here is the
# biggest one (NULLIF maps 'O' to NULL), so '=' would lose most of
# the table. Broadcast dim, single hash aggregate.
# ---------------------------------------------------------------------------


@register(
    "nullsafe_join_status_labels",
    oracle="""
    WITH o AS (SELECT NULLIF(o_orderstatus, 'O') AS k FROM orders),
    d(k, label) AS (VALUES (NULL, 'open-or-missing'),
                           ('F', 'finished'), ('P', 'partial'))
    SELECT d.label, COUNT(*) AS n_orders
    FROM o JOIN d ON o.k IS NOT DISTINCT FROM d.k
    GROUP BY d.label
    """,
)
def nullsafe_join_status_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    o = orders.select(F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("k"))
    dim = spark.createDataFrame(
        [(None, "open-or-missing"), ("F", "finished"), ("P", "partial")],
        "k string, label string",
    )
    return (
        o.join(F.broadcast(dim), o["k"].eqNullSafe(dim["k"]))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Fulfillment latency (SLA view): order→ship lag in whole days per
# priority — count, spread, exact mean (integer day sum, one double
# division) and the share beyond a 90-day SLA. One join on orderkey
# (fact⋈fact equi-join, runtime-filterable) and one hash aggregate.
# ---------------------------------------------------------------------------


@register(
    "ship_latency_by_priority",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           COUNT(*) AS n_lines,
           MIN(date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE))) AS min_days,
           MAX(date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE))) AS max_days,
           CAST(SUM(date_diff('day', CAST(o.o_orderdate AS DATE),
                              CAST(l.l_shipdate AS DATE))) AS DOUBLE)
             / COUNT(*) AS mean_days,
           CAST(COUNT(*) FILTER (WHERE date_diff('day',
                  CAST(o.o_orderdate AS DATE),
                  CAST(l.l_shipdate AS DATE)) > 90) AS DOUBLE) / COUNT(*)
             AS late_share
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def ship_latency_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("od")
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("sd")
    )
    days = F.datediff(F.col("sd"), F.col("od")).cast("bigint")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.min(days).alias("min_days"),
            F.max(days).alias("max_days"),
            (F.sum(days).cast("double") / F.count(F.lit(1))).alias("mean_days"),
            (
                F.sum(F.when(days > 90, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            ).alias("late_share"),
        )
    )
