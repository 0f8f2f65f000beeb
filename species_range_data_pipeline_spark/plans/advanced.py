"""Advanced relational surface: as-of / range / salted joins, cube and
grouping sets, exact percentiles, correlated subqueries, unpivot, and the
wider TPC-H-shaped query set (SURVEY.md §2.1: joins / aggregations / window
functions are absent in the reference, so the engine supplies the standard
surface; every plan here is DuckDB-oracle-checked).

Scale notes per family:
- as-of join: implemented as ONE window pass over a tagged union — no join
  at all, so no shuffle beyond the partitionBy(user).  The classic
  alternative (range join + argmax) shuffles twice and explodes on skew.
- range join: the band side is a literal broadcast; Catalyst plans
  BroadcastNestedLoopJoin, which at 1000 executors is a map-only stage.
- skew: the two-phase salted aggregate bounds any single reducer's input to
  |partition|/n_salts rows on a pathologically hot key (5-value event_type
  column here); same result as the direct groupBy, checked by the oracle.
- cube/grouping sets/percentiles/windows: stock Catalyst operators
  (Expand + HashAggregate, exact `percentile`); no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

_FMT = "yyyy-MM-dd HH:mm:ss"
_DUCK_FMT = "%Y-%m-%d %H:%M:%S"


# ---------------------------------------------------------------------------
# join family: as-of, range-band, salted two-phase
# ---------------------------------------------------------------------------

def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every click, the latest view at-or-before it (per
    user).  Spark lacks ASOF JOIN; the idiomatic distributed form is a
    single running-window pass over the tagged event stream — one shuffle on
    user_id, zero joins, immune to time-skew (a range-join rewrite degrades
    quadratically on users with many events).

    Views sort before clicks at equal ts so `ts_view <= ts_click` matches
    DuckDB's ASOF semantics (oracle states it as correlated aggregates).
    """
    events = load_table(spark, sf_dir, "events")
    ev = events.where(F.col("event_type").isin("view", "click")).select(
        "event_id",
        "user_id",
        "ts",
        (F.col("event_type") == "click").cast("int").alias("is_click"),
        F.when(F.col("event_type") == "view", F.col("ts")).alias("view_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_click", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ev.withColumn("last_view_ts", F.max("view_ts").over(w))
        .withColumn("n_prior_views", F.count("view_ts").over(w))
        .where(F.col("is_click") == 1)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", _FMT).alias("click_ts"),
            F.date_format("last_view_ts", _FMT).alias("last_view_ts"),
            F.col("n_prior_views").cast("long").alias("n_prior_views"),
        )
        .orderBy("event_id")
    )


JOIN_ASOF_ORACLE = f"""
SELECT c.event_id,
       c.user_id,
       strftime(c.ts, '{_DUCK_FMT}') AS click_ts,
       strftime((SELECT max(v.ts) FROM events v
                 WHERE v.user_id = c.user_id AND v.event_type = 'view'
                   AND v.ts <= c.ts), '{_DUCK_FMT}') AS last_view_ts,
       (SELECT count(*) FROM events v
        WHERE v.user_id = c.user_id AND v.event_type = 'view'
          AND v.ts <= c.ts) AS n_prior_views
FROM events c
WHERE c.event_type = 'click'
ORDER BY c.event_id
"""


_BANDS = [
    ("00_low", 0.0, 100_000.0),
    ("01_mid", 100_000.0, 200_000.0),
    ("02_high", 200_000.0, 300_000.0),
    ("03_premium", 300_000.0, 400_000.0),
    ("04_top", 400_000.0, 500_000.0),
]


def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: orders against a literal price-band table on
    lo <= price < hi.  The band side is broadcast, so the inequality join is
    a map-only BroadcastNestedLoopJoin — the only scalable plan for a
    non-equi join with a small build side."""
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(_BANDS, ["band", "lo", "hi"])
    return (
        orders.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo"))
            & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("band")
    )


JOIN_RANGE_ORACLE = """
SELECT band, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
FROM orders
JOIN (VALUES ('00_low', 0.0, 100000.0), ('01_mid', 100000.0, 200000.0),
             ('02_high', 200000.0, 300000.0), ('03_premium', 300000.0, 400000.0),
             ('04_top', 400000.0, 500000.0)) AS b(band, lo, hi)
  ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
ORDER BY band
"""


_N_SALTS = 32


def agg_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigating two-phase aggregate: event_type has 5 values over the
    whole table (pathological key skew), so phase 1 groups on
    (key, salt=hash%32) — bounding any reducer to 1/32 of a hot key — and
    phase 2 merges the 5x32 partials.  Result identical to a direct groupBy
    (the oracle is the direct form)."""
    events = load_table(spark, sf_dir, "events")
    salted = events.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(_N_SALTS))
    )
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum("value").alias("psum"),
        F.max("value").alias("pmax"),
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n_events"),
            F.round(F.sum("psum"), 2).alias("total_value"),
            F.round(F.max("pmax"), 2).alias("max_value"),
        )
        .orderBy("event_type")
    )


AGG_SALTED_ORACLE = """
SELECT event_type, count(*) AS n_events,
       round(sum(value), 2) AS total_value,
       round(max(value), 2) AS max_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# aggregation family: cube, grouping sets, exact percentiles, approx-distinct
# ---------------------------------------------------------------------------

def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 2^2 grouping combinations in
    one Expand+HashAggregate pass (vs 4 separate scans)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


AGG_CUBE_ORACLE = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL surface (the engine registers the
    fixture tables as views; see catalog.load_tables)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY status, priority
        """
    )


AGG_GROUPING_SETS_ORACLE = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY status, priority
"""


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    quantile_cont) per group — the distribution-profile aggregate a data
    pipeline gates on.  At 100 TB swap `percentile` for
    `approx_percentile` (t-digest, mergeable partials); the exact form here
    is what the oracle can check."""
    li = load_table(spark, sf_dir, "lineitem")
    pct = F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.element_at(pct, 1), 2).alias("p25"),
            F.round(F.element_at(pct, 2), 2).alias("p50"),
            F.round(F.element_at(pct, 3), 2).alias("p75"),
            F.round(F.avg("l_extendedprice"), 2).alias("mean"),
        )
        .orderBy("l_returnflag")
    )


AGG_PERCENTILES_ORACLE = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 2) AS p25,
       round(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 2) AS p75,
       round(avg(l_extendedprice), 2) AS mean
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count per event_type, validated against the
    exact count (approx_ok = within 5%).  The oracle can't run Spark's HLL,
    so it checks the exact count and asserts the accuracy flag — which is
    deterministic because HLL++ on fixed input is."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", 0.02).alias("approx"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx") - F.col("exact_users"))
                / F.col("exact_users")
                <= 0.05
            ).alias("approx_ok"),
        )
        .orderBy("event_type")
    )


AGG_APPROX_DISTINCT_ORACLE = """
SELECT event_type, count(DISTINCT user_id) AS exact_users, TRUE AS approx_ok
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# window family: ntile, first/last/nth value
# ---------------------------------------------------------------------------

def window_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) wealth quartiles per nation; output is the per-bucket
    profile.  Tie-broken on (acctbal, custkey) so assignment is total-order
    deterministic in both engines."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return (
        cust.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("c_nationkey", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
        .orderBy("c_nationkey", "quartile")
    )


WINDOW_NTILE_ORACLE = """
WITH q AS (
    SELECT c_nationkey, c_acctbal,
           ntile(4) OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal, c_custkey) AS quartile
    FROM customer
)
SELECT c_nationkey, quartile, count(*) AS n_customers,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal
FROM q
GROUP BY c_nationkey, quartile
ORDER BY c_nationkey, quartile
"""


def window_value_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value with an explicit full-partition
    frame (the default frame stops at CURRENT ROW — the classic last_value
    trap) over suppliers per nation."""
    supp = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        supp.select(
            "s_suppkey",
            "s_nationkey",
            F.round("s_acctbal", 2).alias("acctbal"),
            F.round(F.first("s_acctbal").over(wf), 2).alias("poorest"),
            F.round(F.last("s_acctbal").over(wf), 2).alias("richest"),
            # single-supplier nations have no 2nd value; -1 sentinel keeps
            # the column non-null (engines render SQL NULL differently)
            F.coalesce(
                F.round(F.nth_value("s_acctbal", 2).over(wf), 2), F.lit(-1.0)
            ).alias("second"),
            F.row_number().over(w).alias("rank_in_nation"),
        )
        .orderBy("s_nationkey", "rank_in_nation")
    )


WINDOW_VALUE_FRAMES_ORACLE = """
SELECT s_suppkey, s_nationkey, round(s_acctbal, 2) AS acctbal,
       round(first_value(s_acctbal) OVER f, 2) AS poorest,
       round(last_value(s_acctbal) OVER f, 2) AS richest,
       coalesce(round(nth_value(s_acctbal, 2) OVER f, 2), -1.0) AS second,
       row_number() OVER (PARTITION BY s_nationkey
                          ORDER BY s_acctbal, s_suppkey) AS rank_in_nation
FROM supplier
WINDOW f AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY s_nationkey, rank_in_nation
"""


# ---------------------------------------------------------------------------
# subquery family: EXISTS semi-join, correlated scalar
# ---------------------------------------------------------------------------

def window_trailing_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: each order with the customer's trailing
    30-day order count and spend.  rangeBetween on the epoch-seconds value
    (intervals expressed in seconds) — the time-windowed-feature shape
    (\"spend in the last N days\") that rows-frames can't express."""
    orders = load_table(spark, sf_dir, "orders")
    secs = F.unix_timestamp("o_orderdate")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(secs)
        .rangeBetween(-30 * 86400, 0)
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", _FMT).alias("orderdate"),
            F.count(F.lit(1)).over(w).alias("orders_30d"),
            F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
        )
        .orderBy("o_orderkey")
    )


WINDOW_TRAILING_RANGE_ORACLE = f"""
SELECT o_orderkey, o_custkey,
       strftime(o_orderdate, '{_DUCK_FMT}') AS orderdate,
       count(*) OVER w AS orders_30d,
       round(sum(o_totalprice) OVER w, 2) AS spend_30d
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
ORDER BY o_orderkey
"""


def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT rolling median over a trailing 5-row frame per user — the
    robust-smoothing window that mean-based frames can't give you (one
    outlier shifts a mean for 5 rows; the median shrugs).

    Spark has no exact percentile window, so this is the window+array
    hybrid: ``collect_list`` over the frame -> ``array_sort`` -> middle
    elements, all JVM expressions.  The interpolation is written as
    ``lo + (hi - lo)/2`` to be bit-identical with the oracle's
    ``quantile_cont``.  Frame membership is made deterministic under ts
    ties by ordering on (ts, event_id).  At 100 TB the frame is O(1) per
    row, so this costs one sort per user partition — same as any window.
    """
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    s = F.array_sort(F.collect_list("value").over(w))
    n = F.size(s)
    lo = F.element_at(s, ((n + 1) / 2).cast("int"))  # (n+1) div 2
    hi = F.element_at(s, (n / 2).cast("int") + 1)  # n div 2 + 1
    return (
        events.select(
            "event_id",
            "user_id",
            F.round(lo + (hi - lo) / 2, 4).alias("median_5"),
        )
        .orderBy("event_id")
    )


WINDOW_ROLLING_MEDIAN_ORACLE = """
SELECT event_id, user_id,
       round(quantile_cont(value, 0.5) OVER w, 4) AS median_5
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def window_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly flag: each event scored against the
    mean/stddev of its user's previous 10-row frame — the streaming-style
    outlier gate expressed as a batch window (windowed STDDEV is the one
    moment the frame family hadn't exercised; `dq_outliers_iqr` is the
    global-quantile sibling).

    Determinism: z is rounded to 3 decimals in BOTH engines and the flag
    is derived from the ROUNDED value, so a cross-engine stddev ulp can't
    flip the boolean without also changing the printed z.  Frames shorter
    than 3 rows emit NULL-free zeros (no stable estimate -> not anomalous).
    """
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, -1)
    )
    mu = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    n = F.count(F.lit(1)).over(w)
    # `+ 0.0` collapses IEEE -0.0 to +0.0 (round can emit -0.0 for tiny
    # negative z; DuckDB and Spark disagree on the sign, and the driver
    # stringifies before hashing, so -0.0 vs 0.0 is a hash mismatch even
    # though the values compare equal).  Same normalization in the oracle.
    z = F.when(
        (n >= 3) & (sd > 0), F.round((F.col("value") - mu) / sd, 3) + F.lit(0.0)
    ).otherwise(F.lit(0.0))
    return (
        events.select(
            "event_id",
            "user_id",
            F.round("value", 2).alias("value"),
            z.alias("z_score"),
            (F.abs(z) > 3).alias("anomaly"),
        )
        .orderBy("event_id")
    )


WINDOW_ANOMALY_ORACLE = """
WITH scored AS (
    SELECT event_id, user_id, value,
           CASE WHEN count(*) OVER w >= 3 AND stddev_samp(value) OVER w > 0
                THEN round((value - avg(value) OVER w)
                           / stddev_samp(value) OVER w, 3) + 0.0
                ELSE 0.0 END AS z_score
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, round(value, 2) AS value, z_score,
       abs(z_score) > 3 AS anomaly
FROM scored
ORDER BY event_id
"""


def array_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/map surface over the embedding column: slice, reverse-order
    element, clipped transform sum, and a (min,max) map — all JVM
    higher-order functions (no Python)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return (
        emb.where(F.col("vec_id") < 50)
        .select(
            "vec_id",
            F.round(
                F.aggregate(F.slice(v, 1, 8), F.lit(0.0), lambda a, x: a + x), 6
            ).alias("head8_sum"),
            F.round(F.element_at(v, -1), 6).alias("last_elem"),
            F.round(
                F.aggregate(
                    F.transform(v, lambda x: F.greatest(x, F.lit(0.0))),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
                6,
            ).alias("relu_sum"),
            F.round(F.array_min(v), 6).alias("v_min"),
            F.round(F.array_max(v), 6).alias("v_max"),
            F.size(F.filter(v, lambda x: x > 0)).cast("long").alias("n_positive"),
        )
        .orderBy("vec_id")
    )


ARRAY_MAP_FUNCS_ORACLE = """
SELECT vec_id,
       round(list_sum(e[1:8]), 6) AS head8_sum,
       round(e[-1], 6) AS last_elem,
       round(list_sum(list_transform(e, x -> greatest(x, 0.0))), 6) AS relu_sum,
       round(list_min(e), 6) AS v_min,
       round(list_max(e), 6) AS v_max,
       CAST(len(list_filter(e, x -> x > 0)) AS BIGINT) AS n_positive
FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
WHERE vec_id < 50
ORDER BY vec_id
"""


def subq_exists_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders having at least one line shipped >30 days
    after order date, counted per priority.  EXISTS == left-semi join with a
    non-equi conjunct; the equi key still drives the shuffle so the
    inequality is evaluated post-match (no nested loop)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


SUBQ_EXISTS_ORACLE = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def subq_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-scalar shape: customers above their nation's average
    balance.  Decorrelated the way Catalyst (and every MPP planner) does it:
    aggregate once per nation, broadcast the 25-row result back — the
    correlated form would be a per-row subquery."""
    cust = load_table(spark, sf_dir, "customer")
    nation_avg = cust.groupBy("c_nationkey").agg(
        F.avg("c_acctbal").alias("nation_avg")
    )
    return (
        cust.join(F.broadcast(nation_avg), "c_nationkey")
        .where(F.col("c_acctbal") > F.col("nation_avg"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            F.round(F.avg(F.col("c_acctbal") - F.col("nation_avg")), 2).alias(
                "avg_excess"
            ),
        )
        .orderBy("c_nationkey")
    )


SUBQ_ABOVE_AVG_ORACLE = """
SELECT c_nationkey, count(*) AS n_above,
       round(avg(c_acctbal - nation_avg), 2) AS avg_excess
FROM (
    SELECT c_nationkey, c_acctbal,
           (SELECT avg(c2.c_acctbal) FROM customer c2
            WHERE c2.c_nationkey = c.c_nationkey) AS nation_avg
    FROM customer c
)
WHERE c_acctbal > nation_avg
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# ---------------------------------------------------------------------------
# TPC-H-shaped: Q6, Q10, Q14, Q18
# ---------------------------------------------------------------------------

def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: forecasted revenue change — pure scan+filter+agg,
    the pushdown showcase (all three predicates reach the parquet reader)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q6_ORACLE = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top 20 customers by revenue lost to returns.
    customer and nation broadcast; the only shuffle is the per-customer
    aggregate of the filtered fact."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        # customer is SF-proportional — no forced hint (rule 59)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(rev, 2).alias("lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), "c_custkey")
        .limit(20)
    )


Q10_ORACLE = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS lost_revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_revenue DESC, c_custkey
LIMIT 20
"""


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: monthly revenue share of PROMO parts through 1996.
    part is broadcast; conditional aggregation avoids a second pass."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))  # rule 59
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("month"))
        .agg(
            F.round(
                100
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0))
                / F.sum(rev),
                4,
            ).alias("promo_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("month")
    )


Q14_ORACLE = """
SELECT strftime(l_shipdate, '%Y-%m') AS month,
       round(100 * sum(CASE WHEN p_type = 'PROMO'
                            THEN l_extendedprice * (1 - l_discount)
                            ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1
ORDER BY month
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds 250, with the
    customer.  The HAVING aggregate runs on the fact first (smallest
    intermediate), then the pre-shrunk result joins the broadcast dims."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))  # rule 59
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", _FMT).alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("sum_qty").desc(), "o_orderkey")
    )


Q18_ORACLE = f"""
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '{_DUCK_FMT}') AS orderdate,
       round(o_totalprice, 2) AS totalprice, sum_qty
FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY sum_qty DESC, o_orderkey
"""


def sample_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~1/16 sample via hash bucketing: md5(doc_id) first hex
    digit == '0'.  THE distributed sampling pattern — reproducible across
    runs/engines/cluster sizes (unlike rand()-based sampling), composable
    (same bucket function → same docs everywhere), and a plain pushed-down
    filter at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.where(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


SAMPLE_HASH_ORACLE = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
ORDER BY doc_id
"""


def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked AFTER the first view,
    then purchased AFTER that click.  Per-user min-ts chaining — one
    aggregation, conditional on the previous stage's timestamp; no joins,
    no self-unions (the naive N-stage self-join funnel shuffles N times).

    r18 (guide §1.2/§2.4): the stage chain used to be three per-user
    aggregates bridged by two joins — SIX events scans and three user
    shuffles in the r17 plan.  One scan and one user exchange suffice
    because the chaining condition only compares each event to
    aggregates of the SAME user.

    r19 (guide §5, VERDICT r18 #5): the r18 single-aggregate form
    ``collect_list``-ed every click/purchase timestamp per user —
    aggregation buffers do not spill mid-group, so one hot user (a
    bot with 10⁷ events) is an executor OOM at scale.  The stage mins
    now chain as three stacked window expressions over
    ``PARTITION BY user_id`` (t_view = min view ts; t_click = min click
    ts after t_view; t_purchase = min purchase ts after t_click):
    WindowExec buffers each user's rows in a spillable array, so a hot
    key degrades to disk instead of OOM.  Still one scan (type-pruned
    at the parquet footer) and ONE user exchange — the three windows
    and the per-user dedup aggregate all reuse the same partitioning —
    plus the global rollup.  Identical three counts.
    """
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    is_type = lambda t: F.col("event_type") == t  # noqa: E731
    staged = (
        events.where(
            F.col("event_type").isin("view", "click", "purchase")
        )
        .select("user_id", "event_type", "ts")
        .withColumn(
            "t_view", F.min(F.when(is_type("view"), F.col("ts"))).over(w)
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    is_type("click") & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    is_type("purchase") & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.min("t_view").alias("t_view"),
        F.min("t_click").alias("t_click"),
        F.min("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count(F.when(F.col("t_view").isNotNull(), 1)).alias("n_viewed"),
        F.count(F.when(F.col("t_click").isNotNull(), 1)).alias("n_clicked"),
        F.count(
            F.when(F.col("t_purchase").isNotNull(), 1)
        ).alias("n_purchased"),
    )


EV_FUNNEL_ORACLE = """
WITH v AS (
    SELECT user_id, min(ts) AS t_view FROM events
    WHERE event_type = 'view' GROUP BY user_id
), c AS (
    SELECT e.user_id, min(e.ts) AS t_click
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND e.ts > v.t_view
    GROUP BY e.user_id
), p AS (
    SELECT e.user_id, min(e.ts) AS t_purchase
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.t_click
    GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS n_viewed,
       (SELECT count(*) FROM c) AS n_clicked,
       (SELECT count(*) FROM p) AS n_purchased
"""


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between supplier-nation and
    customer-nation pairs, by year.  Both nation lookups broadcast against
    the one fact-fact shuffle (lineitem ⋈ orders)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        # customer/supplier are SF-proportional — no forced hint (rule
        # 59); the two nation views stay hinted (25 rows)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            # revenue terms have exactly 4 decimals (2dp price x 2dp
            # discount): accumulate exact integer ten-thousandths so the sum
            # is order-independent — 368 output groups means float-order
            # rounding WILL flip a .xx5 boundary somewhere otherwise
            F.round(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                    ).cast("long")
                )
                / 10000.0,
                2,
            ).alias("volume"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .where(F.col("n_lines") >= 20)
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


Q7_ORACLE = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
             / 10000.0, 2) AS volume,
       count(*) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name < n2.n_name
GROUP BY 1, 2, 3
HAVING count(*) >= 20
ORDER BY supp_nation, cust_nation, ship_year
"""


def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three (brand, size, quantity)
    conjunct bundles.  Catalyst extracts the common `l_partkey = p_partkey`
    equi-key and pushes the brand/size disjunction to the part scan; the OR
    itself evaluates post-join — one partkey-equi join (auto-broadcast
    at fixture scale, shuffle beyond — rule 59), one scan each side."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))  # rule 59
    bundle = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(1, 25))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(1, 35))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return joined.where(bundle).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q19_ORACLE = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# reshaping: unpivot
# ---------------------------------------------------------------------------

def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide->long) of per-flag measure sums via DataFrame.unpivot —
    melt is a zero-shuffle Expand on the already-aggregated 3-row input."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("price"),
        F.round(F.sum("l_discount"), 2).alias("discount"),
    )
    return (
        wide.unpivot(
            ["l_returnflag"], ["qty", "price", "discount"], "measure", "value"
        )
        .orderBy("l_returnflag", "measure")
    )


UNPIVOT_ORACLE = """
WITH wide AS (
    SELECT l_returnflag,
           round(sum(l_quantity), 2) AS qty,
           round(sum(l_extendedprice), 2) AS price,
           round(sum(l_discount), 2) AS discount
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, measure, value
FROM (
    SELECT l_returnflag, 'qty' AS measure, qty AS value FROM wide
    UNION ALL SELECT l_returnflag, 'price', price FROM wide
    UNION ALL SELECT l_returnflag, 'discount', discount FROM wide
)
ORDER BY l_returnflag, measure
"""


def pivot_wide_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long->wide), the inverse of ``unpivot_measures``: order count
    and revenue per priority, one column pair per order status.

    The scale-critical detail is the EXPLICIT pivot value list: without
    it, ``DataFrame.pivot`` first runs a separate distinct-collect job
    over the pivot column to discover the columns — an extra full scan
    plus a driver round-trip, and unbounded output width if the column is
    dirty.  With the list pinned, the whole pivot is ONE groupBy with
    conditional aggregates (exactly what the oracle writes by hand) — a
    single shuffle on the group key.  Revenue uses the integer-cents sum
    (the q7 trick) so both engines agg the same exact integers in any
    order.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    wide = (
        orders.withColumn("cents", cents)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("cents") / 100.0, 2).alias("rev"),
        )
    )
    return wide.select(
        "o_orderpriority",
        *[
            c
            for s in ("F", "O", "P")
            for c in (
                F.coalesce(F.col(f"{s}_n"), F.lit(0)).alias(f"{s.lower()}_n"),
                F.coalesce(F.col(f"{s}_rev"), F.lit(0.0)).alias(f"{s.lower()}_rev"),
            )
        ],
    ).orderBy("o_orderpriority")


PIVOT_WIDE_STATUS_ORACLE = """
SELECT o_orderpriority,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS f_n,
       coalesce(round(sum(CASE WHEN o_orderstatus = 'F'
           THEN CAST(round(o_totalprice * 100) AS BIGINT) END) / 100.0, 2),
           0.0) AS f_rev,
       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS o_n,
       coalesce(round(sum(CASE WHEN o_orderstatus = 'O'
           THEN CAST(round(o_totalprice * 100) AS BIGINT) END) / 100.0, 2),
           0.0) AS o_rev,
       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS p_n,
       coalesce(round(sum(CASE WHEN o_orderstatus = 'P'
           THEN CAST(round(o_totalprice * 100) AS BIGINT) END) / 100.0, 2),
           0.0) AS p_rev
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted shuffle join: the skew-mitigation pattern, result-identical.

    When one join key carries a disproportionate share of the fact rows, a
    plain shuffle join lands the whole hot key in one task.  The salt
    spreads it: the dim side is exploded ×SALT (tiny side — cheap), the
    fact side derives a deterministic salt from another column, and the
    join key becomes (key, salt) — every hot key now spans SALT tasks.
    Forced to a shuffle join via hint (Spark would otherwise broadcast the
    small fixture dim and hide the pattern); AQE's skewJoin handles mild
    skew automatically — explicit salting is for the pathological keys AQE
    splitting can't fix (single-key > executor memory).  The oracle is the
    UNSALTED join: salting must not change results.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    n_salt = 8
    salted_dim = supplier.select(
        "s_suppkey",
        "s_acctbal",
        F.explode(F.array(*[F.lit(i) for i in range(n_salt)])).alias("salt"),
    )
    salted_fact = lineitem.select(
        "l_suppkey",
        "l_extendedprice",
        (F.col("l_orderkey") % n_salt).cast("int").alias("salt"),
    )
    return (
        salted_fact.hint("merge")
        .join(
            salted_dim,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (salted_fact["salt"] == salted_dim["salt"]),
            "inner",
        )
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")) / 100.0,
                2,
            ).alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), "s_suppkey")
        .limit(25)
    )


JOIN_SKEW_SALTED_ORACLE = """
SELECT s_suppkey,
       count(*) AS n_lines,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 2)
           AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey
ORDER BY revenue DESC, s_suppkey
LIMIT 25
"""


def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (SQL:2016 LISTAGG, Spark 4 native): the
    per-region roster of nation names, comma-joined in alphabetical order.
    WITHIN GROUP ordering makes the result deterministic — unordered
    listagg/string_agg is run-to-run nondeterministic under parallel
    aggregation and would never hash-match an oracle.  Scale: partial
    collect_list-style buffers merge per group; group count (regions) is
    tiny while inputs stream, the shape that matters at 100 TB is bounded
    output per group, which a roster-of-dimension-values aggregation is."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("r_name")
        .agg(
            F.expr(
                "listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)"
            ).alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .orderBy("r_name")
    )


AGG_LISTAGG_ORACLE = """
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       count(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


def join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): match
    order-priority buckets where the bucket key is NULL for low-value
    orders — NULL must match NULL, which a plain equi-join silently drops.
    Catalyst treats ``<=>`` as an equi-join key, so this stays a hash
    join (broadcast here; sort-merge at scale), NOT a nested loop — the
    property that makes null-safe joins usable on large tables."""
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 100000.0, F.col("o_orderpriority"))
        .alias("prio_bucket"),
    )
    buckets = keyed.groupBy(
        F.col("prio_bucket").alias("b_bucket")
    ).agg(F.count(F.lit(1)).alias("bucket_n"))
    return (
        keyed.join(
            F.broadcast(buckets),
            F.col("prio_bucket").eqNullSafe(F.col("b_bucket")),
        )
        .groupBy("prio_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.max("bucket_n").alias("bucket_n"),
        )
        .orderBy(F.col("prio_bucket").asc_nulls_first())
    )


JOIN_NULLSAFE_ORACLE = """
WITH keyed AS (
  SELECT o_orderkey,
         CASE WHEN o_totalprice >= 100000.0 THEN o_orderpriority END
             AS prio_bucket
  FROM orders
), buckets AS (
  SELECT prio_bucket, count(*) AS bucket_n FROM keyed GROUP BY prio_bucket
)
SELECT k.prio_bucket,
       count(*) AS n_orders,
       max(b.bucket_n) AS bucket_n
FROM keyed k JOIN buckets b
  ON k.prio_bucket IS NOT DISTINCT FROM b.prio_bucket
GROUP BY k.prio_bucket
ORDER BY k.prio_bucket ASC NULLS FIRST
"""


QUERIES = {
    "window_rolling_median": window_rolling_median,
    "window_anomaly_zscore": window_anomaly_zscore,
    "join_asof": join_asof,
    "join_range_bands": join_range_bands,
    "agg_salted_twophase": agg_salted_twophase,
    "agg_cube": agg_cube,
    "agg_grouping_sets": agg_grouping_sets,
    "agg_percentiles": agg_percentiles,
    "join_skew_salted": join_skew_salted,
    "agg_approx_distinct": agg_approx_distinct,
    "window_ntile_buckets": window_ntile_buckets,
    "window_value_frames": window_value_frames,
    "window_trailing_range": window_trailing_range,
    "array_map_funcs": array_map_funcs,
    "subq_exists_late_lines": subq_exists_late_lines,
    "subq_above_nation_avg": subq_above_nation_avg,
    "q6_revenue_delta": q6_revenue_delta,
    "q10_returned_revenue": q10_returned_revenue,
    "q14_promo_share": q14_promo_share,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive_predicates": q19_disjunctive_predicates,
    "unpivot_measures": unpivot_measures,
    "pivot_wide_status": pivot_wide_status,
    "sample_hash_bucket": sample_hash_bucket,
    "ev_funnel": ev_funnel,
    "q7_nation_volume": q7_nation_volume,
    "agg_listagg": agg_listagg,
    "join_nullsafe": join_nullsafe,
}

ORACLES = {
    "window_rolling_median": WINDOW_ROLLING_MEDIAN_ORACLE,
    "window_anomaly_zscore": WINDOW_ANOMALY_ORACLE,
    "join_asof": JOIN_ASOF_ORACLE,
    "join_range_bands": JOIN_RANGE_ORACLE,
    "agg_salted_twophase": AGG_SALTED_ORACLE,
    "agg_cube": AGG_CUBE_ORACLE,
    "agg_grouping_sets": AGG_GROUPING_SETS_ORACLE,
    "agg_percentiles": AGG_PERCENTILES_ORACLE,
    "join_skew_salted": JOIN_SKEW_SALTED_ORACLE,
    "agg_approx_distinct": AGG_APPROX_DISTINCT_ORACLE,
    "window_ntile_buckets": WINDOW_NTILE_ORACLE,
    "window_value_frames": WINDOW_VALUE_FRAMES_ORACLE,
    "window_trailing_range": WINDOW_TRAILING_RANGE_ORACLE,
    "array_map_funcs": ARRAY_MAP_FUNCS_ORACLE,
    "subq_exists_late_lines": SUBQ_EXISTS_ORACLE,
    "subq_above_nation_avg": SUBQ_ABOVE_AVG_ORACLE,
    "q6_revenue_delta": Q6_ORACLE,
    "q10_returned_revenue": Q10_ORACLE,
    "q14_promo_share": Q14_ORACLE,
    "q18_large_orders": Q18_ORACLE,
    "q19_disjunctive_predicates": Q19_ORACLE,
    "unpivot_measures": UNPIVOT_ORACLE,
    "pivot_wide_status": PIVOT_WIDE_STATUS_ORACLE,
    "sample_hash_bucket": SAMPLE_HASH_ORACLE,
    "ev_funnel": EV_FUNNEL_ORACLE,
    "q7_nation_volume": Q7_ORACLE,
    "agg_listagg": AGG_LISTAGG_ORACLE,
    "join_nullsafe": JOIN_NULLSAFE_ORACLE,
}
