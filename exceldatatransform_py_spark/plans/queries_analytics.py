"""Interval/sessionization/sampling analytics batch.

Classic warehouse patterns not yet scored, each restated as one lazy
DataFrame plan with a DuckDB oracle twin:

* gaps-and-islands → validity intervals (the general form of the
  reference's "update an existing ledger over time" semantics and of
  SCD-type-2 history construction),
* batch sessionization by inactivity gap (lag + cumulative sum — the
  batch twin of ``F.session_window``, which is already scored in
  ``queries_events``),
* deterministic stratified sampling (per-stratum rates keyed on a
  portable content hash — reproducible train/eval subsets at 100 TB,
  no RNG state, unlike ``df.sampleBy`` whose sample depends on
  partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from exceldatatransform_py_spark.functions.columns import dec_sum
from exceldatatransform_py_spark.functions.text import md5_hash32
from exceldatatransform_py_spark.plans.registry import register
from exceldatatransform_py_spark.sources.readers import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Gaps-and-islands: per customer, collapse consecutive orders (in
# order-date order) that share an o_orderpriority into one validity
# interval [valid_from, valid_to]. The island key is the difference of
# two row_numbers — the standard trick; everything after it is one
# hash aggregate. Ties on o_orderdate are broken by o_orderkey so both
# engines see the same total order. Two windows with different
# partition keys → exactly two shuffles, then the groupBy reuses the
# second window's partitioning.
# ---------------------------------------------------------------------------


@register(
    "priority_runs_per_customer",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderpriority,
             CAST(o_orderdate AS DATE) AS od,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey)
             - ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderpriority
                                  ORDER BY o_orderdate, o_orderkey) AS grp
      FROM orders
    )
    SELECT o_custkey AS custkey, o_orderpriority AS priority,
           MIN(od) AS valid_from, MAX(od) AS valid_to,
           COUNT(*) AS n_orders
    FROM seq GROUP BY o_custkey, o_orderpriority, grp
    """,
)
def priority_runs_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w_all = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_pri = Window.partitionBy("o_custkey", "o_orderpriority").orderBy(
        "o_orderdate", "o_orderkey"
    )
    seq = orders.select(
        "o_custkey",
        "o_orderpriority",
        F.to_date("o_orderdate").alias("od"),
        (F.row_number().over(w_all) - F.row_number().over(w_pri)).alias("grp"),
    )
    return seq.groupBy("o_custkey", "o_orderpriority", "grp").agg(
        F.min("od").alias("valid_from"),
        F.max("od").alias("valid_to"),
        F.count(F.lit(1)).alias("n_orders"),
    ).select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        "valid_from",
        "valid_to",
        "n_orders",
    )


# ---------------------------------------------------------------------------
# Batch sessionization: a session breaks after >30 min of inactivity.
# lag → flag → running sum = session index; both windows share one
# (user_id)-partitioned sort, so the whole query is a single shuffle
# plus one aggregate. This is the batch restatement of the streaming
# session_window query (events_session) with an explicit, portable
# session id.
# ---------------------------------------------------------------------------


@register(
    "event_sessions_gap30",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM sess GROUP BY user_id, session_id
    """,
)
def event_sessions_gap30(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = (
        prev.isNull() | (F.col("ts") - prev > F.expr("INTERVAL 30 MINUTES"))
    ).cast("int")
    sess = events.select(
        "user_id",
        "ts",
        "value",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("session_id"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value", 18, 6).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling: per-segment keep-rates applied by
# comparing a portable content hash of the key against the rate. Fully
# map-side (no shuffle, no RNG): the sample is a pure function of the
# data, so it is identical across engines, runs, partitionings, and
# cluster sizes — which is what makes sampled evals reproducible at
# 100 TB (``df.sample``/``sampleBy`` cannot promise that).
# ---------------------------------------------------------------------------

_STRATA_RATES: dict[str, int] = {"BUILDING": 20, "AUTOMOBILE": 10}
_DEFAULT_RATE = 5  # percent


@register(
    "stratified_sample_customers",
    oracle=f"""
    SELECT c_custkey, c_mktsegment, c_acctbal
    FROM customer
    WHERE CAST(concat('0x', substr(md5(concat('7:', CAST(c_custkey AS VARCHAR))), 1, 8)) AS BIGINT) % 100
          < CASE c_mktsegment WHEN 'BUILDING' THEN {_STRATA_RATES["BUILDING"]}
                              WHEN 'AUTOMOBILE' THEN {_STRATA_RATES["AUTOMOBILE"]}
                              ELSE {_DEFAULT_RATE} END
    """,
)
def stratified_sample_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    rate = F.when(
        F.col("c_mktsegment") == "BUILDING", F.lit(_STRATA_RATES["BUILDING"])
    ).when(
        F.col("c_mktsegment") == "AUTOMOBILE", F.lit(_STRATA_RATES["AUTOMOBILE"])
    ).otherwise(F.lit(_DEFAULT_RATE))
    keep = md5_hash32(F.col("c_custkey"), seed=7) % 100 < rate
    return cust.filter(keep).select("c_custkey", "c_mktsegment", "c_acctbal")


# ---------------------------------------------------------------------------
# Exact multi-quantile profile without interpolation drift: one ranked
# window per group, then each requested quantile picks the lower order
# statistic rn = floor((n-1)*p) + 1. Cross-engine-exact (selected
# values are actual data cells, never interpolated doubles) and one
# shuffle; the quantile spec is a tiny exploded literal array, so
# adding quantiles costs nothing. approx_percentile remains the
# sketch-based 100 TB default (price_stats_by_priority); this is the
# exact-answer variant, same trade as exact median.
# ---------------------------------------------------------------------------

_QUANTILES: tuple[tuple[str, float], ...] = (
    ("p25", 0.25),
    ("p50", 0.50),
    ("p75", 0.75),
    ("p90", 0.90),
)


@register(
    "quantile_profile_by_priority",
    oracle=f"""
    WITH w AS (
      SELECT o_orderpriority, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    ),
    spec(q, p) AS (VALUES {", ".join(f"('{q}', {p})" for q, p in _QUANTILES)})
    SELECT w.o_orderpriority, spec.q AS quantile,
           w.o_totalprice AS price
    FROM w JOIN spec ON w.rn = CAST(floor((w.n - 1) * spec.p) AS BIGINT) + 1
    """,
)
def quantile_profile_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    wo = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wn = Window.partitionBy("o_orderpriority")
    ranked = orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    spec = F.explode(
        F.array(
            *[
                F.struct(F.lit(q).alias("q"), F.lit(p).alias("p"))
                for q, p in _QUANTILES
            ]
        )
    )
    return (
        ranked.select("*", spec.alias("s"))
        .filter(
            F.col("rn")
            == F.floor((F.col("n") - 1) * F.col("s.p")).cast("bigint") + 1
        )
        .select(
            "o_orderpriority",
            F.col("s.q").alias("quantile"),
            F.col("o_totalprice").alias("price"),
        )
    )


# ---------------------------------------------------------------------------
# CDC keep-latest compaction: collapse an append-only change stream to
# the newest record per key — the read-side of log-structured upserts
# (and the batch twin of the streaming merge sink). One ranked window,
# WindowGroupLimit pushes the rank-1 filter into the sort, so
# partitions drop superseded versions before the window buffers.
# ---------------------------------------------------------------------------


@register(
    "latest_event_per_user",
    oracle="""
    WITH r AS (
      SELECT user_id, ts, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, ts AS last_ts, event_type AS last_type, value AS last_value
    FROM r WHERE rn = 1
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.select(
            "user_id", "ts", "event_type", "value",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
        )
    )


# ---------------------------------------------------------------------------
# Time-weighted average: each observation holds until the next one, so
# its weight is the seconds until the successor (last event carries no
# weight). The standard downsampling aggregate for irregular
# time-series (sensor/price data). Determinism: weights are integer
# seconds, weighted sums accumulate in DECIMAL (associative), and the
# final division is one IEEE double op on identical operands in both
# engines. The weighted sum must survive a decimal->double cast
# BIT-IDENTICALLY in both engines, which only holds while the scaled
# integer stays below 2^53 (above that, Spark's correctly-rounded
# BigDecimal conversion and DuckDB's int/10^scale double division can
# differ in the last ulp — observed). So: values quantized to 2
# decimals, weights in whole SECONDS (floored micro diffs — DuckDB's
# epoch() returns fractional doubles, so integer micros are the
# common ground), keeping per-user scaled sums ~1e13 << 2^53, exactly
# double-representable. One user_id shuffle end-to-end.
# ---------------------------------------------------------------------------


@register(
    "time_weighted_value_per_user",
    oracle="""
    WITH seq AS (
      SELECT user_id, value,
             epoch_us(ts) AS ep,
             epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id)) AS ep_next
      FROM events
    ),
    agg AS (
      SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(12,2))
                      * CAST((ep_next - ep) // 1000000 AS DECIMAL(15,0))) AS DOUBLE) AS num,
             CAST((MAX(ep) - MIN(ep)) // 1000000 AS BIGINT) AS obs_seconds
      FROM seq GROUP BY user_id
    )
    SELECT user_id, obs_seconds,
           num / CAST(obs_seconds AS DOUBLE) AS twa_value
    FROM agg WHERE obs_seconds > 0
    """,
)
def time_weighted_value_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = events.select(
        "user_id",
        "value",
        ep.alias("ep"),
        F.lead(ep).over(w).alias("ep_next"),
    )
    dur_s = F.expr("(ep_next - ep) div 1000000").cast("decimal(15,0)")
    agg = seq.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(12,2)") * dur_s)
        .cast("double")
        .alias("num"),
        (F.max("ep") - F.min("ep")).alias("obs_us"),
    )
    agg = agg.select(
        "user_id", "num", F.expr("obs_us div 1000000").cast("bigint").alias("obs_seconds")
    )
    return agg.filter(F.col("obs_seconds") > 0).select(
        "user_id",
        "obs_seconds",
        (F.col("num") / F.col("obs_seconds").cast("double")).alias("twa_value"),
    )


# ---------------------------------------------------------------------------
# Moment statistics, cross-engine-exact: built-in stddev/corr sum
# doubles in partition order (nondeterministic), so both are restated
# from DECIMAL power sums — associative, partition-order-independent —
# with the final variance/correlation formulas as identical IEEE
# double expressions in both engines. Scaled sums stay < 2^53 (see
# NOTES.md), so every decimal->double cast is exact.
# ---------------------------------------------------------------------------


@register(
    "value_stats_by_event_type",
    oracle="""
    WITH m AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sx,
             SUM(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT)) / 10000.0 AS sxx
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           sx / CAST(n AS DOUBLE) AS mean_value,
           (sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS var_value,
           sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)) AS stddev_value
    FROM m WHERE n > 1
    """,
)
def value_stats_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fixed-point moments: quantize to integer cents, sum LONGS (exact,
    # associative, and tiny codegen — the decimal-sum variant JIT'd so
    # slowly its first sf0.1 pass ran 15s interpreted), divide once at
    # the end. Scaled sums stay < 2^53 so the long->double conversions
    # are exact in both engines.
    events = _t(spark, sf_dir, "events")
    vl = F.round(F.col("value") * 100).cast("bigint")
    staged = events.select("event_type", vl.alias("vl"))
    m = staged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("vl") / 100.0).alias("sx"),
        (F.sum(F.col("vl") * F.col("vl")) / 10000.0).alias("sxx"),
    )
    n = F.col("n").cast("double")
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (F.col("n") - 1).cast(
        "double"
    )
    return m.filter(F.col("n") > 1).select(
        "event_type",
        "n",
        (F.col("sx") / n).alias("mean_value"),
        var.alias("var_value"),
        F.sqrt(var).alias("stddev_value"),
    )


@register(
    "discount_quantity_corr_by_flag",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(round(l_discount * 10000) AS BIGINT) AS xl,
             CAST(round(l_quantity * 100) AS BIGINT) AS yl
      FROM lineitem
    ),
    m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(xl) / 10000.0 AS sx,
             SUM(yl) / 100.0 AS sy,
             SUM(xl * yl) / 1000000.0 AS sxy,
             SUM(xl * xl) / 100000000.0 AS sxx,
             SUM(yl * yl) / 10000.0 AS syy
      FROM s GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (CAST(n AS DOUBLE) * sxy - sx * sy)
           / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) * (CAST(n AS DOUBLE) * syy - sy * sy))
           AS corr_discount_qty
    FROM m WHERE n > 1
    """,
)
def discount_quantity_corr_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    staged = li.select(
        "l_returnflag",
        F.round(F.col("l_discount") * 10000).cast("bigint").alias("xl"),
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("yl"),
    )
    m = staged.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("xl") / 10000.0).alias("sx"),
        (F.sum("yl") / 100.0).alias("sy"),
        (F.sum(F.col("xl") * F.col("yl")) / 1000000.0).alias("sxy"),
        (F.sum(F.col("xl") * F.col("xl")) / 100000000.0).alias("sxx"),
        (F.sum(F.col("yl") * F.col("yl")) / 10000.0).alias("syy"),
    )
    n = F.col("n").cast("double")
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.filter(F.col("n") > 1).select(
        "l_returnflag", "n", corr.alias("corr_discount_qty")
    )


# ---------------------------------------------------------------------------
# Co-occurrence / market-basket: part pairs ordered together more
# often than chance. Pair generation groups each order's distinct
# parts into ONE sorted array (single shuffle) and expands the
# ordered pairs MAP-SIDE with array built-ins — work is O(items² per
# order) with order size bounded (≤7 lineitems), and unlike the
# orderkey self-join formulation it shuffles lineitem once instead of
# staging both join sides (measured ~2× on the family: lift /
# triangles / pagerank all start from this subtree). Support/lift are
# integer-count ratios, so the only doubles are single divisions on
# identical operands. The same plan shape is the inner loop of
# co-occurrence embedding training (PMI matrices) at corpus scale.
# ---------------------------------------------------------------------------

_MIN_PAIR_SUPPORT = 3

#: per-order ordered pairs (pa < pb follows from sort_array):
#: element i pairs with every later element — slice is 1-based, so the
#: tail after index i (0-based) starts at position i + 2.
_PAIR_EXPR = (
    "flatten(transform(parts, (x, i) -> "
    "transform(slice(parts, i + 2, size(parts)), y -> struct(x AS pa, y AS pb))))"
)


def _order_part_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per order: sorted array of its distinct parts — the
    shared subtree of the co-occurrence family (lift / triangles /
    pagerank), built with a single hash-aggregate shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )


def _part_pairs(ords: DataFrame, min_support: int) -> DataFrame:
    """Pair supports from the per-order part arrays: map-side pair
    expansion (bounded by order size), one aggregate shuffle on the
    32-bit pair key."""
    return (
        ords.select(F.explode(F.expr(_PAIR_EXPR)).alias("p"))
        .select("p.pa", "p.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_support)
    )


@register(
    "part_cooccurrence_lift",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS total FROM items),
    part_cnt AS (
      SELECT l_partkey, COUNT(*) AS n_ord FROM items GROUP BY l_partkey
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_pair
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    )
    SELECT p.part_a, p.part_b, p.n_pair,
           CAST(p.n_pair AS DOUBLE) * CAST(n_orders.total AS DOUBLE)
           / (CAST(ca.n_ord AS DOUBLE) * CAST(cb.n_ord AS DOUBLE)) AS lift
    FROM pairs p
    JOIN part_cnt ca ON p.part_a = ca.l_partkey
    JOIN part_cnt cb ON p.part_b = cb.l_partkey
    CROSS JOIN n_orders
    WHERE p.n_pair >= {_MIN_PAIR_SUPPORT}
    """,
)
def part_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # persisted: the grouped arrays are a full shuffle over lineitem
    # and three consumers (order total, part counts, pair expansion)
    # would each re-run it — Catalyst does not dedupe repeated subtrees.
    ords = _order_part_sets(spark, sf_dir).persist()
    total = ords.select(F.count(F.lit(1)).alias("total"))
    part_cnt = (
        ords.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_ord"))
    )
    pairs = _part_pairs(ords, _MIN_PAIR_SUPPORT).select(
        F.col("pa").alias("part_a"),
        F.col("pb").alias("part_b"),
        F.col("n").alias("n_pair"),
    )
    ca = part_cnt.select(
        F.col("l_partkey").alias("part_a"), F.col("n_ord").alias("n_a")
    )
    cb = part_cnt.select(
        F.col("l_partkey").alias("part_b"), F.col("n_ord").alias("n_b")
    )
    out = (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .crossJoin(F.broadcast(total))
    )
    lift = (
        F.col("n_pair").cast("double") * F.col("total").cast("double")
    ) / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    return out.select("part_a", "part_b", "n_pair", lift.alias("lift"))


# ---------------------------------------------------------------------------
# Graph analytics beyond connected components: triangle enumeration
# over the co-occurrence graph. Edges are ORIENTED (a < b), so each
# triangle is emitted exactly once as (a<b<c) and the two-hop join
# never doubles back — the standard distributed triangle algorithm
# (wedge join + closing-edge semi-check). Work is O(sum of deg² )
# wedges, bounded here by the support threshold; at web scale the same
# plan runs with the edge list hash-partitioned on the join vertex.
# ---------------------------------------------------------------------------

_TRI_SUPPORT = 2


@register(
    "cooccurrence_triangles",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ),
    e AS (SELECT pa, pb FROM pairs WHERE n >= {_TRI_SUPPORT})
    SELECT e1.pa AS part_a, e1.pb AS part_b, e2.pb AS part_c
    FROM e e1
    JOIN e e2 ON e1.pb = e2.pa
    JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    """,
)
def cooccurrence_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the (tiny) edge list `e` feeds all three triangle roles — without
    # the persist the grouped-array + pair pipeline runs three times.
    e = (
        _part_pairs(_order_part_sets(spark, sf_dir), _TRI_SUPPORT)
        .select("pa", "pb")
        .persist()
    )
    e1 = e.select(F.col("pa").alias("part_a"), F.col("pb").alias("part_b"))
    e2 = e.select(F.col("pa").alias("part_b"), F.col("pb").alias("part_c"))
    e3 = e.select(F.col("pa").alias("part_a"), F.col("pb").alias("part_c"))
    wedges = e1.join(e2, "part_b")
    return wedges.join(e3, ["part_a", "part_c"]).select(
        "part_a", "part_b", "part_c"
    )


# ---------------------------------------------------------------------------
# Blocked fuzzy matching: near-identical part names by edit distance
# within a brand. The r4 review flagged the old shape — row-level
# self-join blocked on brand alone — as the repo's one scale-killer:
# brand has constant cardinality (~25), so in-block ROW pairs grow
# quadratically with table size (8.0M at sf0.1 → ~10¹¹ at sf10).
#
# Fix: run the quadratic edit-distance work on DISTINCT NAMES, not
# rows. Levenshtein is a function of the two strings, so the
# name-pair table (every ordered pair of distinct names within
# _FUZZY_MAX_DIST, self-pairs included at dist 0) is complete and the
# row-level answer is a pure equi-join expansion of it — candidate
# cost scales with distinct-value cardinality (64 names at sf0.1 →
# 4.1k name-pair candidates vs 8.0M row pairs, ~2000×; see SCALE.md),
# while the expansion joins shuffle on (name) / (brand, name) and
# only ever materialize output-sized data.
#
# The name-level self-join is itself blocked on a LOSSLESS
# length-bucket key: |len(a) − len(b)| ≤ levenshtein(a, b), so with
# bucket width W = _FUZZY_MAX_DIST the two sides' floor(len/W) differ
# by at most 1, and a probe side exploded into bucket ±1 meets every
# qualifying pair in exactly one bucket. On corpora where names are
# near-unique (distinct ≈ n) this bucket bound is what keeps the
# name-level join from degenerating to all-pairs.
# ---------------------------------------------------------------------------

_FUZZY_MAX_DIST = 2
_FUZZY_BUCKET_W = _FUZZY_MAX_DIST  # ΔL ≤ max_dist ⇒ Δbucket ≤ 1


def fuzzy_name_pairs(names: DataFrame, name_col: str, max_dist: int) -> DataFrame:
    """All ORDERED pairs of distinct names within ``max_dist`` edits.

    Input must be distinct on ``name_col``. Output columns
    (nx, ny, edit_dist) include self-pairs (nx = ny, dist 0) and both
    orderings of every unequal pair, so a downstream row expansion
    can dedup with a plain key inequality. Blocked on a lossless
    length bucket — see the module comment for the proof.
    """
    w = max(max_dist, 1)
    bucket = F.floor(F.length(name_col) / w)
    na = names.select(
        F.col(name_col).alias("nx"), bucket.alias("len_bucket")
    )
    # probe side lands in its own bucket and both neighbors, so every
    # qualifying pair meets in exactly one bucket (no dup candidates:
    # the three probe buckets are distinct, the build side has one).
    nb = names.select(
        F.col(name_col).alias("ny"),
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("len_bucket"),
    )
    # Thresholded levenshtein (Spark 3.5+): the banded DP early-exits
    # once the distance provably exceeds the bound — O(len·k) per pair
    # instead of O(len²) — and still returns the EXACT distance when
    # within it (−1 otherwise), so results are identical.
    dist = F.levenshtein("nx", "ny", max_dist)
    # result-preserving prefilter: edit distance >= |length diff|, and
    # the length check is ~free while even banded levenshtein isn't —
    # the conjunct order matters, codegen short-circuits left to right.
    len_ok = F.abs(F.length("nx") - F.length("ny")) <= max_dist
    return (
        na.join(nb, "len_bucket")
        .filter(len_ok & (dist >= 0))
        .select("nx", "ny", dist.alias("edit_dist"))
    )


@register(
    "fuzzy_part_name_pairs",
    oracle=f"""
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE abs(length(a.p_name) - length(b.p_name)) <= {_FUZZY_MAX_DIST}
      AND levenshtein(a.p_name, b.p_name) <= {_FUZZY_MAX_DIST}
    """,
)
def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    # quadratic work on DISTINCT names only (map-side-combined agg);
    # the row-level joins below are pure equi expansions of it.
    name_pairs = fuzzy_name_pairs(
        part.select("p_name").distinct(), "p_name", _FUZZY_MAX_DIST
    )
    a = part.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("part_a"),
        F.col("p_name").alias("name_a"),
    )
    b = part.select(
        F.col("p_brand").alias("brand_b"),
        F.col("p_partkey").alias("part_b"),
        F.col("p_name").alias("name_b"),
    )
    return (
        a.join(name_pairs, F.col("name_a") == F.col("nx"))
        .join(
            b,
            (F.col("brand") == F.col("brand_b"))
            & (F.col("name_b") == F.col("ny"))
            & (F.col("part_a") < F.col("part_b")),
        )
        .select("part_a", "part_b", "name_a", "name_b", "edit_dist")
    )


# ---------------------------------------------------------------------------
# Point-in-time join with staleness tolerance — the feature-store
# rule: serve the latest feature at-or-before the observation time,
# but only if it is fresh enough (here ≤90 days), else NULL. Same
# single-shuffle as-of machinery (operators.asof), with the matched
# timestamp carried through so freshness is a plain post-projection —
# no second join, no interval explosion.
# ---------------------------------------------------------------------------

_MAX_STALENESS_DAYS = 90


@register(
    "asof_latest_order_fresh",
    oracle=f"""
    WITH o AS (
      SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      FROM orders GROUP BY 1, 2
    ),
    m AS (
      SELECT e.event_id, e.user_id,
             date_diff('day', CAST(o.o_orderdate AS DATE), CAST(e.ts AS DATE)) AS staleness_days,
             o.o_orderkey
      FROM events e
      ASOF LEFT JOIN o
        ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    )
    SELECT event_id, user_id,
           CASE WHEN staleness_days <= {_MAX_STALENESS_DAYS} THEN o_orderkey END AS fresh_orderkey,
           CASE WHEN staleness_days <= {_MAX_STALENESS_DAYS} THEN CAST(staleness_days AS BIGINT) END AS staleness_days
    FROM m
    """,
)
def asof_latest_order_fresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from exceldatatransform_py_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        _t(spark, sf_dir, "orders")
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
        value_cols=["o_orderkey", "o_orderdate"],
    )
    staleness = F.datediff(F.to_date("ts"), F.to_date("o_orderdate"))
    fresh = staleness <= _MAX_STALENESS_DAYS
    return joined.select(
        "event_id",
        "user_id",
        F.when(fresh, F.col("o_orderkey")).alias("fresh_orderkey"),
        F.when(fresh, staleness.cast("bigint")).alias("staleness_days"),
    )


# ---------------------------------------------------------------------------
# KLL quantile sketches (the third DataSketches family next to theta/
# HLL in queries_events): per-group streaming quantiles with a PROVEN
# normalized-rank-error bound, mergeable across partitions/days — what
# a 100 TB pipeline stores instead of raw values when it needs
# percentiles later. Verified by the strongest checkable property: the
# exact RANK of each estimated quantile must sit within ±5% of the
# target rank (KLL's k=200 default guarantees ~1.65%); the boolean is
# oracle-asserted TRUE, the exact quantiles hash-match as values.
# ---------------------------------------------------------------------------

_KLL_RANK_TOL = 0.05


@register(
    "kll_quantiles_by_priority",
    oracle="""
    WITH w AS (
      SELECT o_orderpriority, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    SELECT o_orderpriority,
           MIN(CASE WHEN rn = CAST(floor((n - 1) * 0.5) AS BIGINT) + 1
                    THEN o_totalprice END) AS exact_p50,
           MIN(CASE WHEN rn = CAST(floor((n - 1) * 0.9) AS BIGINT) + 1
                    THEN o_totalprice END) AS exact_p90,
           TRUE AS p50_rank_ok,
           TRUE AS p90_rank_ok
    FROM w GROUP BY o_orderpriority
    """,
)
def kll_quantiles_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderkey"
    )
    sk = o.groupBy("o_orderpriority").agg(
        F.kll_sketch_agg_double("o_totalprice").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    est = sk.select(
        "o_orderpriority",
        "n",
        F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.5)).alias("q50"),
        F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.9)).alias("q90"),
    )
    # exact rank of each estimate: one more pass over the group
    ranks = (
        o.join(F.broadcast(est), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.sum((F.col("o_totalprice") <= F.col("q50")).cast("long")).alias("r50"),
            F.sum((F.col("o_totalprice") <= F.col("q90")).cast("long")).alias("r90"),
        )
    )
    wo = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wn = Window.partitionBy("o_orderpriority")
    exact = (
        o.select(
            "o_orderpriority",
            "o_totalprice",
            F.row_number().over(wo).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n_"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.min(
                F.when(
                    F.col("rn")
                    == F.floor((F.col("n_") - 1) * 0.5).cast("bigint") + 1,
                    F.col("o_totalprice"),
                )
            ).alias("exact_p50"),
            F.min(
                F.when(
                    F.col("rn")
                    == F.floor((F.col("n_") - 1) * 0.9).cast("bigint") + 1,
                    F.col("o_totalprice"),
                )
            ).alias("exact_p90"),
        )
    )
    tol = F.lit(_KLL_RANK_TOL)
    return (
        exact.join(ranks, "o_orderpriority")
        .join(est.select("o_orderpriority", "n"), "o_orderpriority")
        .select(
            "o_orderpriority",
            "exact_p50",
            "exact_p90",
            (
                F.abs(F.col("r50").cast("double") / F.col("n") - 0.5) <= tol
            ).alias("p50_rank_ok"),
            (
                F.abs(F.col("r90").cast("double") / F.col("n") - 0.9) <= tol
            ).alias("p90_rank_ok"),
        )
    )


# ---------------------------------------------------------------------------
# PageRank over the part co-occurrence graph — the second iterative
# graph algorithm next to connected components, and like k-means it is
# fully value-checkable: ranks live as fixed-point BIGINTs (scale 1e9)
# and every per-edge contribution is an integer floor-division, so the
# per-node sums are exact integer arithmetic (associative — partition
# order cannot change them) and the DuckDB twin simply unrolls the
# power iterations as CTEs. Standard damping 0.85 expressed as
# (r * 85) div (100 * outdeg); teleport term floor(0.15 * 1e9).
# At 100 TB: each iteration is one co-partitioned join + aggregate
# over the edge list, exactly the connected-components round shape.
# ---------------------------------------------------------------------------

_PR_SCALE = 1_000_000_000
_PR_ITERS = 3
_PR_TELEPORT = 150_000_000  # floor(0.15 * scale)


def _pagerank_oracle(iters: int = _PR_ITERS) -> str:
    parts = [f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    prs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ),
    e AS (SELECT pa, pb FROM prs WHERE n >= {_TRI_SUPPORT}),
    sym AS (SELECT pa AS s, pb AS d FROM e UNION ALL SELECT pb, pa FROM e),
    deg AS (SELECT s, COUNT(*) AS dg FROM sym GROUP BY s),
    r0 AS (SELECT s AS v, CAST({_PR_SCALE} AS BIGINT) AS r FROM deg)"""]
    for t in range(1, iters + 1):
        parts.append(f""",
    c{t} AS (
      SELECT sym.d AS v, SUM((r.r * 85) // (100 * deg.dg)) AS contrib
      FROM sym JOIN r{t - 1} r ON sym.s = r.v JOIN deg ON sym.s = deg.s
      GROUP BY sym.d
    ),
    r{t} AS (
      SELECT r{t - 1}.v,
             CAST({_PR_TELEPORT} + COALESCE(c{t}.contrib, 0) AS BIGINT) AS r
      FROM r{t - 1} LEFT JOIN c{t} ON r{t - 1}.v = c{t}.v
    )""")
    parts.append(f"""
    SELECT v AS part_key, r AS rank_scaled,
           CAST(r AS DOUBLE) / {_PR_SCALE}.0 AS pagerank
    FROM r{iters}""")
    return "".join(parts)


@register("pagerank_cooccurrence", oracle=_pagerank_oracle())
def pagerank_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _part_pairs(_order_part_sets(spark, sf_dir), _TRI_SUPPORT).select(
        "pa", "pb"
    )
    sym = e.select(F.col("pa").alias("s"), F.col("pb").alias("d")).union(
        e.select(F.col("pb").alias("s"), F.col("pa").alias("d"))
    ).persist()
    deg = sym.groupBy("s").agg(F.count(F.lit(1)).alias("dg")).persist()
    ranks = deg.select(
        F.col("s").alias("v"), F.lit(_PR_SCALE).cast("bigint").alias("r")
    )
    for _ in range(_PR_ITERS):
        contrib = (
            sym.join(ranks, sym.s == ranks.v)
            .join(deg, "s")
            .groupBy(F.col("d").alias("cv"))
            .agg(
                F.sum(
                    F.expr("(r * 85) div (100 * dg)")
                ).alias("contrib")
            )
        )
        # checkpoint per round: ranks feeds BOTH sides of the next
        # round (contribution join + teleport left join), so a lazy
        # chain doubles the subtree per iteration (CC learned the
        # same lesson); the checkpointed frame is O(nodes) tiny.
        ranks = (
            ranks.join(contrib, ranks.v == contrib.cv, "left")
            .select(
                "v",
                (
                    F.lit(_PR_TELEPORT) + F.coalesce("contrib", F.lit(0))
                ).cast("bigint").alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        F.col("v").alias("part_key"),
        F.col("r").alias("rank_scaled"),
        (F.col("r").cast("double") / F.lit(float(_PR_SCALE))).alias("pagerank"),
    )


# ---------------------------------------------------------------------------
# SCD type-2 dimension build from a change log: treat each order as a
# change event for (customer, priority) and emit the versioned
# dimension rows a warehouse keeps — effective_from / effective_to
# (closed by the NEXT change, NULL while current) and is_current.
# Differs from gaps-and-islands (priority_runs_per_customer): the
# canonical SCD2 construction is lag-filter (keep only rows where the
# attribute CHANGED) then a second window to close intervals — two
# same-key windows, one shuffle, the second sort reused.
# ---------------------------------------------------------------------------


@register(
    "scd2_customer_priority",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderpriority,
             CAST(o_orderdate AS DATE) AS od, o_orderkey,
             LAG(o_orderpriority) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey)
               AS prev_p
      FROM orders
    ),
    changes AS (
      SELECT o_custkey, o_orderpriority, od, o_orderkey FROM seq
      WHERE prev_p IS NULL OR prev_p <> o_orderpriority
    )
    SELECT o_custkey AS custkey, o_orderpriority AS priority,
           od AS effective_from,
           LEAD(od) OVER (PARTITION BY o_custkey ORDER BY od, o_orderkey)
             - 1 AS effective_to,
           LEAD(od) OVER (PARTITION BY o_custkey ORDER BY od, o_orderkey)
             IS NULL AS is_current
    FROM changes
    """,
)
def scd2_customer_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    seq = orders.select(
        "o_custkey",
        "o_orderpriority",
        F.to_date("o_orderdate").alias("od"),
        "o_orderkey",
    ).withColumn("prev_p", F.lag("o_orderpriority").over(w))
    changes = seq.filter(
        F.col("prev_p").isNull() | (F.col("prev_p") != F.col("o_orderpriority"))
    )
    nxt = F.lead("od").over(w)
    return changes.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("od").alias("effective_from"),
        F.date_sub(nxt, 1).alias("effective_to"),
        nxt.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Winsorized mean: the outlier-robust aggregate — clamp each group's
# values at the exact p05/p95 order statistics, then take the mean of
# the clamped values. Everything stays in integers until one final
# division: values quantize to cents, the percentile INDEX is computed
# with integer arithmetic (ceil(n·p) as (n·5+99) div 100 — no float
# index math to drift cross-engine), and the threshold is the exact
# idx-th smallest value. Shape: one ranked window per group (same
# single shuffle as the quantile profile), thresholds collapse to one
# row per group and broadcast back onto the fact — at 100 TB the
# second pass is a map-side clamp + hash aggregate, and per-key window
# state is bounded by the hottest group.
# ---------------------------------------------------------------------------


@register(
    "winsorized_mean_by_priority",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority AS p,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x
      FROM orders
    ),
    r AS (
      SELECT p, x,
             ROW_NUMBER() OVER (PARTITION BY p ORDER BY x) AS rn,
             COUNT(*) OVER (PARTITION BY p) AS n
      FROM c
    ),
    th AS (
      SELECT p,
             MIN(CASE WHEN rn = (n * 5 + 99) // 100 THEN x END) AS lo,
             MIN(CASE WHEN rn = (n * 95 + 99) // 100 THEN x END) AS hi
      FROM r GROUP BY p
    )
    SELECT c.p AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(LEAST(GREATEST(c.x, th.lo), th.hi)) AS BIGINT)
             AS sum_wins_cents,
           CAST(SUM(LEAST(GREATEST(c.x, th.lo), th.hi)) AS DOUBLE) / COUNT(*)
             AS mean_wins_cents,
           COUNT(*) FILTER (WHERE c.x < th.lo) AS n_clamped_low,
           COUNT(*) FILTER (WHERE c.x > th.hi) AS n_clamped_high
    FROM c JOIN th USING (p)
    GROUP BY c.p
    """,
)
def winsorized_mean_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    c = orders.select(
        F.col("o_orderpriority").alias("p"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x"),
    )
    wp = Window.partitionBy("p")
    r = c.select(
        "p",
        "x",
        F.row_number().over(wp.orderBy("x")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    th = r.groupBy("p").agg(
        F.min(F.when(F.col("rn") == F.expr("(n * 5 + 99) div 100"), F.col("x"))).alias(
            "lo"
        ),
        F.min(
            F.when(F.col("rn") == F.expr("(n * 95 + 99) div 100"), F.col("x"))
        ).alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("x"), F.col("lo")), F.col("hi"))
    return (
        c.join(F.broadcast(th), "p")
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(clamped).alias("sum_wins_cents"),
            (F.sum(clamped).cast("double") / F.count(F.lit(1))).alias(
                "mean_wins_cents"
            ),
            F.sum(F.when(F.col("x") < F.col("lo"), 1).otherwise(0)).alias(
                "n_clamped_low"
            ),
            F.sum(F.when(F.col("x") > F.col("hi"), 1).otherwise(0)).alias(
                "n_clamped_high"
            ),
        )
        .withColumnRenamed("p", "priority")
    )


# ---------------------------------------------------------------------------
# RFM segmentation — the classic customer scoring: recency (days
# since last order), frequency (order count), monetary (exact cents),
# each quintiled with fully tie-broken ntile windows so both engines
# assign identical buckets. The per-customer aggregate is fact-sized
# work; the scoring windows run over the CUSTOMER dimension (global
# ntile = one sorted task of dimension-sized input — fine for dims;
# for a billion-customer dim switch to the winsorized-mean pattern:
# integer order-stat thresholds broadcast back as a map-side join).
# ---------------------------------------------------------------------------


@register(
    "rfm_customer_segments",
    oracle="""
    WITH agg AS (
      SELECT o_custkey AS custkey,
             date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                       DATE '1998-12-31') AS recency_days,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders GROUP BY o_custkey
    )
    SELECT custkey, recency_days, frequency, monetary_cents,
           NTILE(5) OVER (ORDER BY recency_days ASC, custkey) AS r_quintile,
           NTILE(5) OVER (ORDER BY frequency DESC, custkey) AS f_quintile,
           NTILE(5) OVER (ORDER BY monetary_cents DESC, custkey) AS m_quintile
    FROM agg
    """,
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    agg = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(
            F.lit("1998-12-31").cast("date"), F.max(F.to_date("o_orderdate"))
        ).cast("bigint").alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "monetary_cents"
        ),
    )
    return agg.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        F.ntile(5)
        .over(Window.orderBy(F.col("recency_days").asc(), F.col("custkey")))
        .alias("r_quintile"),
        F.ntile(5)
        .over(Window.orderBy(F.col("frequency").desc(), F.col("custkey")))
        .alias("f_quintile"),
        F.ntile(5)
        .over(Window.orderBy(F.col("monetary_cents").desc(), F.col("custkey")))
        .alias("m_quintile"),
    )


# ---------------------------------------------------------------------------
# Equi-DEPTH histogram (equal-count deciles) — the complement of the
# equal-WIDTH price histogram: bucket edges are order statistics, so
# every bucket holds the same row count and the edges trace the
# distribution. Exact-cents + fully tie-broken ntile keeps both
# engines assigning identical buckets (the rfm pattern). The global
# ntile is one sorted pass — fine for dimension-scale inputs; a
# billion-row fact switches to the winsorized-mean pattern (integer
# order-stat edges from a ranked window per partition, merged).
# ---------------------------------------------------------------------------


@register(
    "equi_depth_price_deciles",
    oracle="""
    WITH edc AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
      FROM orders
    ),
    edt AS (
      SELECT cents,
             CAST(NTILE(10) OVER (ORDER BY cents, o_orderkey) AS INTEGER)
               AS decile
      FROM edc
    )
    SELECT decile, COUNT(*) AS n_orders,
           MIN(cents) AS lo_cents, MAX(cents) AS hi_cents
    FROM edt GROUP BY decile
    """,
)
def equi_depth_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    c = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        "o_orderkey",
    )
    t = c.select(
        "cents",
        F.ntile(10)
        .over(Window.orderBy("cents", "o_orderkey"))
        .alias("decile"),
    )
    return t.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("cents").alias("lo_cents"),
        F.max("cents").alias("hi_cents"),
    )


# ---------------------------------------------------------------------------
# Banded interval self-join: pairs of a supplier's shipments that were
# IN TRANSIT simultaneously ([shipdate, receiptdate] ranges overlap).
# The J5 family's interval-overlap shape, done the scalable way: each
# interval lands in every month bucket it spans (explode — intervals
# are ≤ ~6 weeks, so ≤3 buckets), candidates meet through an EQUI join
# on (supplier, bucket), and each overlapping pair is counted exactly
# once by keeping only the bucket that contains the later of the two
# start dates. Work is Σ per-(supplier, month) C(n,2) — the banding
# bounds the quadratic the way brand-blocking bounds fuzzy matching;
# a naive supplier-only theta join would be O(per-supplier²) on the
# whole history. High-quantity shipments only, to keep the scored
# result human-sized.
# ---------------------------------------------------------------------------

_OVL_MIN_QTY = 48


@register(
    "overlapping_shipments_per_supplier",
    oracle=f"""
    WITH ovl AS (
      -- the reduced schema carries no l_receiptdate; transit time is
      -- synthesized deterministically (7-27 days) from the line's keys
      SELECT l_suppkey, l_orderkey, l_linenumber,
             CAST(l_shipdate AS DATE) AS ship,
             CAST(l_shipdate AS DATE)
               + CAST((l_orderkey + l_linenumber) % 21 + 7 AS INTEGER)
               AS receipt
      FROM lineitem WHERE l_quantity >= {_OVL_MIN_QTY}
    ),
    banded AS (
      SELECT o.*, unnest(generate_series(
               (year(ship) - 1992) * 12 + month(ship) - 1,
               (year(receipt) - 1992) * 12 + month(receipt) - 1)) AS bucket
      FROM ovl o
    )
    SELECT a.l_suppkey AS suppkey,
           a.l_orderkey AS orderkey_a, a.l_linenumber AS linenumber_a,
           b.l_orderkey AS orderkey_b, b.l_linenumber AS linenumber_b,
           CAST(date_diff('day',
                          greatest(a.ship, b.ship),
                          least(a.receipt, b.receipt)) + 1 AS BIGINT)
             AS overlap_days
    FROM banded a JOIN banded b
      ON a.l_suppkey = b.l_suppkey AND a.bucket = b.bucket
     AND (a.l_orderkey < b.l_orderkey
          OR (a.l_orderkey = b.l_orderkey
              AND a.l_linenumber < b.l_linenumber))
     AND a.ship <= b.receipt AND b.ship <= a.receipt
    WHERE a.bucket = (year(greatest(a.ship, b.ship)) - 1992) * 12
                     + month(greatest(a.ship, b.ship)) - 1
    """,
)
def overlapping_shipments_per_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    transit = ((F.col("l_orderkey") + F.col("l_linenumber")) % 21 + 7).cast(
        "int"
    )
    ovl = li.filter(F.col("l_quantity") >= _OVL_MIN_QTY).select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.to_date("l_shipdate").alias("ship"),
        F.date_add(F.to_date("l_shipdate"), transit).alias("receipt"),
    )

    def month_bucket(d) -> Column:
        return (F.year(d) - 1992) * 12 + F.month(d) - 1

    banded = ovl.select(
        "*",
        F.explode(
            F.sequence(month_bucket(F.col("ship")), month_bucket(F.col("receipt")))
        ).alias("bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pair_lt = (F.col("a.l_orderkey") < F.col("b.l_orderkey")) | (
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") < F.col("b.l_linenumber"))
    )
    later_start = F.greatest(F.col("a.ship"), F.col("b.ship"))
    return (
        a.join(
            b,
            (F.col("a.l_suppkey") == F.col("b.l_suppkey"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & pair_lt
            & (F.col("a.ship") <= F.col("b.receipt"))
            & (F.col("b.ship") <= F.col("a.receipt")),
        )
        .filter(F.col("a.bucket") == month_bucket(later_start))
        .select(
            F.col("a.l_suppkey").alias("suppkey"),
            F.col("a.l_orderkey").alias("orderkey_a"),
            F.col("a.l_linenumber").alias("linenumber_a"),
            F.col("b.l_orderkey").alias("orderkey_b"),
            F.col("b.l_linenumber").alias("linenumber_b"),
            (
                F.datediff(
                    F.least(F.col("a.receipt"), F.col("b.receipt")), later_start
                )
                + 1
            )
            .cast("bigint")
            .alias("overlap_days"),
        )
    )


# ---------------------------------------------------------------------------
# 2-D skyline (Pareto frontier): parts no other part dominates on
# (cheaper price, larger size). The O(n^2) NOT-EXISTS formulation is
# restated as aggregate + prefix-max: collapse to one row per
# distinct price (max size), running max over strictly-cheaper
# prices, join back. The window runs over DISTINCT PRICES of a
# catalog dimension (bounded), not the fact table; at larger
# dimensions, range-partition the price axis, take per-range
# skylines, and merge — noted here, not needed at this cardinality.
# ---------------------------------------------------------------------------


@register(
    "pareto_frontier_parts",
    oracle="""
    WITH pfd AS (
      SELECT p_retailprice AS price, max(p_size) AS m_eq
      FROM part GROUP BY 1
    ),
    pfw AS (
      SELECT price, m_eq,
             max(m_eq) OVER (ORDER BY price
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS m_lt
      FROM pfd
    )
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p JOIN pfw w ON p.p_retailprice = w.price
    WHERE (w.m_lt IS NULL OR w.m_lt < p.p_size) AND p.p_size >= w.m_eq
    """,
)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    d = part.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.max("p_size").alias("m_eq")
    )
    w = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, -1)
    pfw = d.withColumn("m_lt", F.max("m_eq").over(w))
    return (
        part.join(pfw, part.p_retailprice == pfw.price)
        .filter(
            (F.col("m_lt").isNull() | (F.col("m_lt") < F.col("p_size")))
            & (F.col("p_size") >= F.col("m_eq"))
        )
        .select("p_partkey", "p_retailprice", "p_size")
    )


# ---------------------------------------------------------------------------
# Per-group simple OLS (price ~ quantity): slope / intercept / r2 via
# the same fixed-point power sums the corr query uses — quantize to
# integer units, sum LONGS (exact, fast-JIT), form the normal
# equations in doubles once per group. Unit (not cent) quantization
# keeps SUM(y*y) under the 2^53 long->double exactness bound at
# bench SFs (see NOTES.md).
# ---------------------------------------------------------------------------


@register(
    "regression_price_qty_by_flag",
    oracle="""
    WITH rg AS (
      SELECT l_returnflag,
             CAST(round(l_quantity) AS BIGINT) AS xl,
             CAST(round(l_extendedprice) AS BIGINT) AS yl
      FROM lineitem
    ),
    rm AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(xl) AS DOUBLE) AS sx,
             CAST(SUM(yl) AS DOUBLE) AS sy,
             CAST(SUM(xl * yl) AS DOUBLE) AS sxy,
             CAST(SUM(xl * xl) AS DOUBLE) AS sxx,
             CAST(SUM(yl * yl) AS DOUBLE) AS syy
      FROM rg GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (CAST(n AS DOUBLE) * sxy - sx * sy)
             / (CAST(n AS DOUBLE) * sxx - sx * sx) AS slope,
           (sy - (CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n AS DOUBLE) * sxx - sx * sx) * sx)
             / CAST(n AS DOUBLE) AS intercept,
           ((CAST(n AS DOUBLE) * sxy - sx * sy)
            * (CAST(n AS DOUBLE) * sxy - sx * sy))
             / ((CAST(n AS DOUBLE) * sxx - sx * sx)
                * (CAST(n AS DOUBLE) * syy - sy * sy)) AS r2
    FROM rm WHERE n > 1
    """,
)
def regression_price_qty_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    staged = li.select(
        "l_returnflag",
        F.round("l_quantity").cast("bigint").alias("xl"),
        F.round("l_extendedprice").cast("bigint").alias("yl"),
    )
    m = staged.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xl").cast("double").alias("sx"),
        F.sum("yl").cast("double").alias("sy"),
        F.sum(F.col("xl") * F.col("yl")).cast("double").alias("sxy"),
        F.sum(F.col("xl") * F.col("xl")).cast("double").alias("sxx"),
        F.sum(F.col("yl") * F.col("yl")).cast("double").alias("syy"),
    )
    n = F.col("n").cast("double")
    cov_n = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx_n = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary_n = n * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov_n / varx_n
    return m.filter(F.col("n") > 1).select(
        "l_returnflag",
        "n",
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / n).alias("intercept"),
        ((cov_n * cov_n) / (varx_n * vary_n)).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Bounded BFS over the co-occurrence graph: min-hop distance (<= 2)
# from the seed parts. The driver controls the (fixed) hop count, so
# the whole traversal is ONE lazy Catalyst plan — no per-round
# actions; the edge list (a shuffle subtree with three consumers) is
# persisted like the rest of the co-occurrence family. The oracle is
# a recursive CTE (UNION ALL + hop bound, so cycles terminate).
# ---------------------------------------------------------------------------

_KHOP_SEED_MAX = 5
_KHOP_HOPS = 2


@register(
    "khop_parts_from_seeds",
    oracle=f"""
    WITH RECURSIVE khit AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    khe AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM khit a JOIN khit b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
    ),
    khseed AS (
      SELECT DISTINCT l_partkey AS node FROM lineitem
      WHERE l_partkey < {_KHOP_SEED_MAX}
    ),
    khr AS (
      SELECT node, 0 AS hop FROM khseed
      UNION ALL
      SELECT e.dst AS node, r.hop + 1
      FROM khr r JOIN khe e ON e.src = r.node
      WHERE r.hop < {_KHOP_HOPS}
    )
    SELECT node AS p_partkey, CAST(min(hop) AS INTEGER) AS hops
    FROM khr GROUP BY node
    """,
)
def khop_parts_from_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ords = _order_part_sets(spark, sf_dir)
    pairs = (
        ords.select(F.explode(F.expr(_PAIR_EXPR)).alias("p"))
        .select("p.pa", "p.pb")
        .distinct()
    )
    edges = pairs.union(pairs.select("pb", "pa")).toDF("src", "dst").persist()
    li = _t(spark, sf_dir, "lineitem")
    seeds = (
        li.filter(F.col("l_partkey") < _KHOP_SEED_MAX)
        .select(F.col("l_partkey").alias("node"))
        .distinct()
    )
    reached = seeds.select("node", F.lit(0).alias("hop"))
    frontier = seeds
    for h in range(1, _KHOP_HOPS + 1):
        f = frontier.select(F.col("node").alias("fnode"))
        frontier = (
            f.join(edges, f.fnode == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        reached = reached.unionByName(
            frontier.select("node", F.lit(h).alias("hop"))
        )
    return (
        reached.groupBy("node")
        .agg(F.min("hop").cast("int").alias("hops"))
        .select(F.col("node").alias("p_partkey"), "hops")
    )


# ---------------------------------------------------------------------------
# Point-in-time (PIT) join against an SCD2 dimension: for each fact
# row, pick the dimension VERSION whose validity interval covers the
# fact's event date — the canonical warehouse pattern for joining
# facts to slowly-changing dimensions without leaking future attribute
# values. Differs from as-of (asof_latest_order: latest-before on a
# single timeline) by joining into closed [from, to] version intervals
# with an open current version. Shape: the SCD2 build is the two
# windows of scd2_customer_priority; the PIT join itself is an
# equi-join on custkey with the interval predicate evaluated inside
# the join — never a cartesian, and at 100 TB the version side is tiny
# relative to facts (versions ≪ facts) and co-shuffles on the same
# key.
# ---------------------------------------------------------------------------


@register(
    "pit_join_scd2_priority",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderpriority,
             CAST(o_orderdate AS DATE) AS od, o_orderkey,
             LAG(o_orderpriority) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey)
               AS prev_p
      FROM orders
    ),
    changes AS (
      SELECT o_custkey, o_orderpriority, od, o_orderkey FROM seq
      WHERE prev_p IS NULL OR prev_p <> o_orderpriority
    ),
    dim AS (
      SELECT o_custkey AS custkey, o_orderpriority AS priority,
             od AS effective_from,
             LEAD(od) OVER (PARTITION BY o_custkey ORDER BY od, o_orderkey)
               - 1 AS effective_to
      FROM changes
    )
    SELECT d.priority AS dim_priority,
           o.o_orderpriority AS order_priority,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    JOIN dim d
      ON o.o_custkey = d.custkey
     AND CAST(o.o_orderdate AS DATE) >= d.effective_from
     AND (d.effective_to IS NULL
          OR CAST(o.o_orderdate AS DATE) <= d.effective_to)
    GROUP BY 1, 2
    """,
)
def pit_join_scd2_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = scd2_customer_priority(spark, sf_dir)
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderpriority",
        F.to_date("o_orderdate").alias("od"),
    )
    joined = orders.join(
        dim,
        (orders["o_custkey"] == dim["custkey"])
        & (orders["od"] >= dim["effective_from"])
        & (dim["effective_to"].isNull() | (orders["od"] <= dim["effective_to"])),
    )
    return joined.groupBy(
        dim["priority"].alias("dim_priority"),
        orders["o_orderpriority"].alias("order_priority"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
