"""Data-mining / warehouse-modeling operator family (SURVEY.md §2.1
north-star surface; no reference counterpart — the reference has no joins
or aggregates beyond the dissolve, ``species_range_etl.py:205``).

Five shapes a 100 TB training-data warehouse needs beyond plain TPC-H:

- market-basket co-occurrence (self-join within a basket key)
- fixed-width histogram binning (arithmetic bucketing, no UDF)
- correlation / covariance matrix over measure columns
- SCD Type-2 dimension history (windowed effective-dating)
- consecutive event-sequence pattern match (MATCH_RECOGNIZE-lite)

Scale notes: the basket self-join shuffles once on the basket key and the
pair explosion is bounded by per-basket distinct-item count (quadratic in
items-per-order, not table size); histogram/corr are single-pass partial
aggregates with tiny output; SCD2 and the pattern match shuffle once on
their partition key and stream through window frames — all AQE-safe, no
driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

_FMT = "yyyy-MM-dd HH:mm:ss"
_DUCK_FMT = "%Y-%m-%d %H:%M:%S"


def basket_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent brand pairs co-purchased in one order (market basket).

    NOT a self-join: the naive ``order_brand JOIN order_brand ON orderkey``
    recomputes the whole dedup lineage for both sides and shuffles four
    times.  Instead collect the (sorted, distinct) brand set per order —
    ONE shuffle, with map-side partial collect_set — and emit the C(k,2)
    pairs locally with nested array transforms, exactly like the LSH
    bucket-pair generation in plans/text.py.  Pair cardinality is bounded
    by per-order basket width, not table size; the final pair groupBy is a
    tiny-domain shuffle.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    baskets = (
        lineitem.join(
            part.select("p_partkey", "p_brand"),  # SF-proportional: no hint (rule 59)
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("brands"))
    )
    pairs = F.flatten(
        F.transform(
            F.col("brands"),
            lambda x, i: F.transform(
                F.slice(F.col("brands"), i + 2, F.size(F.col("brands"))),
                lambda y: F.struct(x.alias("brand_a"), y.alias("brand_b")),
            ),
        )
    )
    return (
        baskets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.brand_a").alias("brand_a"), F.col("p.brand_b").alias("brand_b"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 20)
        .orderBy(F.col("n_orders").desc(), "brand_a", "brand_b")
    )


BASKET_ORACLE = """
WITH ob AS (
    SELECT DISTINCT l_orderkey, p_brand
    FROM lineitem JOIN part ON l_partkey = p_partkey)
SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS n_orders
FROM ob a JOIN ob b
  ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
GROUP BY 1, 2
HAVING count(*) >= 20
ORDER BY n_orders DESC, brand_a, brand_b
"""


def hist_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals: 10 × 50k buckets.

    Pure column arithmetic (no UDF, no width_bucket dependency) so the
    binning expression is identical in both engines; single partial-agg
    pass, 10-row output.
    """
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000.0), F.lit(9)).cast("long")
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .withColumn("lo", (F.col("bucket") * 50000).cast("long"))
        .select("bucket", "lo", "n_orders", "total_price")
        .orderBy("bucket")
    )


HIST_ORACLE = """
SELECT CAST(least(floor(o_totalprice / 50000.0), 9) AS BIGINT) AS bucket,
       CAST(least(floor(o_totalprice / 50000.0), 9) * 50000 AS BIGINT) AS lo,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY 1, 2
ORDER BY bucket
"""


def corr_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation + sample covariance of lineitem measures.

    One single-pass aggregate computes the full (pair, corr, covar) set via
    co-moment accumulators — no per-pair rescans.  Rounded to 4 decimals:
    both engines accumulate in IEEE doubles over identical inputs, so the
    disagreement is ~1e-12 relative, far inside the rounding slack.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    pairs = [
        ("l_quantity", "l_extendedprice"),
        ("l_quantity", "l_discount"),
        ("l_extendedprice", "l_discount"),
        ("l_extendedprice", "l_tax"),
    ]
    aggs = []
    for a, b in pairs:
        aggs.append(F.round(F.corr(a, b), 4).alias(f"corr_{a}_{b}"))
        aggs.append(F.round(F.covar_samp(a, b), 4).alias(f"covar_{a}_{b}"))
    wide = lineitem.agg(*aggs)
    # long format (pair, corr, covar) so the result is schema-stable as
    # pairs are added
    structs = F.array(
        *[
            F.struct(
                F.lit(f"{a}~{b}").alias("pair"),
                F.col(f"corr_{a}_{b}").alias("corr"),
                F.col(f"covar_{a}_{b}").alias("covar"),
            )
            for a, b in pairs
        ]
    )
    return (
        wide.select(F.explode(structs).alias("s"))
        .select("s.pair", "s.corr", "s.covar")
        .orderBy("pair")
    )


CORR_ORACLE = """
WITH w AS (
    SELECT round(corr(l_quantity, l_extendedprice), 4) AS c1,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS v1,
           round(corr(l_quantity, l_discount), 4) AS c2,
           round(covar_samp(l_quantity, l_discount), 4) AS v2,
           round(corr(l_extendedprice, l_discount), 4) AS c3,
           round(covar_samp(l_extendedprice, l_discount), 4) AS v3,
           round(corr(l_extendedprice, l_tax), 4) AS c4,
           round(covar_samp(l_extendedprice, l_tax), 4) AS v4
    FROM lineitem)
SELECT 'l_quantity~l_extendedprice' AS pair, c1 AS corr, v1 AS covar FROM w
UNION ALL
SELECT 'l_quantity~l_discount', c2, v2 FROM w
UNION ALL
SELECT 'l_extendedprice~l_discount', c3, v3 FROM w
UNION ALL
SELECT 'l_extendedprice~l_tax', c4, v4 FROM w
ORDER BY pair
"""


def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 effective-dated history built from an ordered change log.

    Each order is a 'version' of its customer: effective_from is the order
    date, effective_to is the NEXT order's date (open-ended for the current
    version), version_n is the change ordinal.  This is the warehouse
    dimension-history build: one shuffle on the dimension key, then lead()
    over an explicit (date, orderkey) order — the orderkey tie-break makes
    same-day versions deterministic.  Output restricted to a 1-in-50 key
    stripe to keep the verified result driver-sized; the plan shape is
    cardinality-independent.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.where(F.col("o_custkey") % 50 == 0)
        .withColumn("version_n", F.row_number().over(w))
        .withColumn("next_from", F.lead("o_orderdate").over(w))
        .select(
            F.col("o_custkey").alias("custkey"),
            "version_n",
            F.date_format("o_orderdate", _FMT).alias("effective_from"),
            F.coalesce(
                F.date_format("next_from", _FMT), F.lit("9999-12-31 00:00:00")
            ).alias("effective_to"),
            F.col("next_from").isNull().cast("int").alias("is_current"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )
        .orderBy("custkey", "version_n")
    )


SCD2_ORACLE = f"""
SELECT o_custkey AS custkey,
       CAST(row_number() OVER w AS INT) AS version_n,
       strftime(o_orderdate, '{_DUCK_FMT}') AS effective_from,
       coalesce(strftime(lead(o_orderdate) OVER w, '{_DUCK_FMT}'),
                '9999-12-31 00:00:00') AS effective_to,
       CAST(lead(o_orderdate) OVER w IS NULL AS INT) AS is_current,
       round(o_totalprice, 2) AS totalprice
FROM orders
WHERE o_custkey % 50 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY custkey, version_n
"""


def ev_pattern_consecutive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite: strictly-consecutive view→click→purchase runs.

    Per user in event-time order (event_id tie-break), match rows whose
    next two events are exactly 'click' then 'purchase' — the strict-
    contiguity pattern a funnel (ev_funnel, arbitrary gaps) cannot express.
    Window lead()s avoid any self-join: one shuffle on user_id, two frame
    reads per row.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("t1", F.lead("event_type", 1).over(w))
        .withColumn("t2", F.lead("event_type", 2).over(w))
        .where(
            (F.col("event_type") == "view")
            & (F.col("t1") == "click")
            & (F.col("t2") == "purchase")
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .orderBy(F.col("n_matches").desc(), "user_id")
    )


PATTERN_ORACLE = """
WITH seq AS (
    SELECT user_id, event_type,
           lead(event_type, 1) OVER w AS t1,
           lead(event_type, 2) OVER w AS t2
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, count(*) AS n_matches
FROM seq
WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
GROUP BY user_id
ORDER BY n_matches DESC, user_id
"""


def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) curve values — the multi-dimensional data-layout key.

    Sorting / range-partitioning a 100 TB table by the bit-interleaved
    (custkey, suppkey) Z-value clusters rows so BOTH single-dimension
    predicates prune row groups (the Delta/Iceberg OPTIMIZE ZORDER
    technique); the curve value itself is pure bit arithmetic, identical in
    any engine.  This query computes the 16-bit Z-value over the two join
    dimensions and returns per-Z-bucket row counts + per-bucket key ranges
    — the locality evidence: each bucket spans a narrow range of BOTH keys.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    a = F.col("o_custkey") % 256
    b = F.col("l_suppkey") % 256
    z = None
    for i in range(8):
        bit_a = F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        bit_b = F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        z = bit_a if z is None else z.bitwiseOR(bit_a)
        z = z.bitwiseOR(bit_b)
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(z.alias("zval"), "o_custkey", "l_suppkey")
        .groupBy((F.col("zval") / 4096).cast("long").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_custkey").alias("cust_lo"),
            F.max("o_custkey").alias("cust_hi"),
            F.min("l_suppkey").alias("supp_lo"),
            F.max("l_suppkey").alias("supp_hi"),
        )
        .orderBy("z_bucket")
    )


LAYOUT_ZORDER_ORACLE = """
WITH z AS (
    SELECT o_custkey, l_suppkey,
           ((((o_custkey % 256) >> 0) & 1) << 0)
         | ((((l_suppkey % 256) >> 0) & 1) << 1)
         | ((((o_custkey % 256) >> 1) & 1) << 2)
         | ((((l_suppkey % 256) >> 1) & 1) << 3)
         | ((((o_custkey % 256) >> 2) & 1) << 4)
         | ((((l_suppkey % 256) >> 2) & 1) << 5)
         | ((((o_custkey % 256) >> 3) & 1) << 6)
         | ((((l_suppkey % 256) >> 3) & 1) << 7)
         | ((((o_custkey % 256) >> 4) & 1) << 8)
         | ((((l_suppkey % 256) >> 4) & 1) << 9)
         | ((((o_custkey % 256) >> 5) & 1) << 10)
         | ((((l_suppkey % 256) >> 5) & 1) << 11)
         | ((((o_custkey % 256) >> 6) & 1) << 12)
         | ((((l_suppkey % 256) >> 6) & 1) << 13)
         | ((((o_custkey % 256) >> 7) & 1) << 14)
         | ((((l_suppkey % 256) >> 7) & 1) << 15) AS zval
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
SELECT CAST(zval // 4096 AS BIGINT) AS z_bucket,
       count(*) AS n_rows,
       min(o_custkey) AS cust_lo,
       max(o_custkey) AS cust_hi,
       min(l_suppkey) AS supp_lo,
       max(l_suppkey) AS supp_hi
FROM z
GROUP BY 1
ORDER BY z_bucket
"""


def sky_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto front): parts where no other part is both
    cheaper-or-equal AND larger-or-equal (strict in at least one).

    The window formulation replaces the quadratic NOT-EXISTS with one sort:
    over distinct (price, size) points ordered by price, a point is
    dominated iff (a) some strictly-cheaper point has size >= it — the
    running max over the dense-rank range frame — or (b) an equal-price
    point has strictly larger size — the per-price max.  Both windows
    share the same sort order, so Catalyst plans a single global sort.

    Scale notes (100 TB): the skyline operates on the DEDUPLICATED value
    domain (distinct price×size pairs — bounded by value cardinality, not
    row count), so the global-order window is safe; for high-cardinality
    domains use the classic two-phase skyline — partition-local fronts via
    the same window inside applyInPandas, then this global pass over the
    survivors (each local front is tiny: dominance is transitive).

    The DuckDB oracle is the independent quadratic NOT-EXISTS definition —
    the strongest kind of cross-check: different algorithm, same answer.
    """
    part = load_table(spark, sf_dir, "part")
    pts = part.select(
        F.round("p_retailprice", 2).alias("price"),
        F.col("p_size").cast("long").alias("psize"),
    ).distinct()
    w_rank = Window.orderBy("price")
    w_lower = Window.orderBy("pr").rangeBetween(Window.unboundedPreceding, -1)
    w_same = Window.partitionBy("price")
    return (
        pts.withColumn("pr", F.dense_rank().over(w_rank))
        .withColumn("m_lower", F.max("psize").over(w_lower))
        .withColumn("m_same", F.max("psize").over(w_same))
        .where(
            (F.col("m_lower").isNull() | (F.col("m_lower") < F.col("psize")))
            & (F.col("m_same") == F.col("psize"))
        )
        .select("price", "psize")
        .orderBy("price", "psize")
    )


SKY_PARETO_ORACLE = """
WITH pts AS (
    SELECT DISTINCT round(p_retailprice, 2) AS price,
                    CAST(p_size AS BIGINT) AS psize
    FROM part
)
SELECT price, psize
FROM pts p
WHERE NOT EXISTS (
    SELECT 1 FROM pts q
    WHERE q.price <= p.price AND q.psize >= p.psize
      AND (q.price < p.price OR q.psize > p.psize)
)
ORDER BY price, psize
"""


QUERIES = {
    "basket_brand_pairs": basket_brand_pairs,
    "sky_pareto_front": sky_pareto_front,
    "layout_zorder": layout_zorder,
    "hist_price_buckets": hist_price_buckets,
    "corr_measures": corr_measures,
    "scd2_customer_history": scd2_customer_history,
    "ev_pattern_consecutive": ev_pattern_consecutive,
}

ORACLES = {
    "basket_brand_pairs": BASKET_ORACLE,
    "sky_pareto_front": SKY_PARETO_ORACLE,
    "layout_zorder": LAYOUT_ZORDER_ORACLE,
    "hist_price_buckets": HIST_ORACLE,
    "corr_measures": CORR_ORACLE,
    "scd2_customer_history": SCD2_ORACLE,
    "ev_pattern_consecutive": PATTERN_ORACLE,
}
