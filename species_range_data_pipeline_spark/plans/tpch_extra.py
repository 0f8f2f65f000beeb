"""Remaining TPC-H query shapes, adapted to the fixture schema.

The fixtures lack ``partsupp``, ``l_commitdate``/``l_receiptdate``, and
``c_phone``, so the classic Q2/Q4/Q8/Q11/Q12/Q13/Q15/Q17/Q20/Q21/Q22 are
re-expressed over the columns that exist while keeping each query's PLAN
SHAPE — that is what these exist to exercise:

- correlated scalar subqueries decorrelated into aggregate+join (Q2, Q15, Q17)
- EXISTS / NOT EXISTS chains as semi/anti joins with non-equi residuals
  (Q4, Q21, Q22)
- conditional aggregation and ratio-of-aggregates (Q8, Q12)
- two-level aggregation / count distributions (Q13)
- HAVING against a scalar subquery (Q11)
- nested aggregate feeding a semi join (Q20)

The reference pipeline has no joins beyond a literal cross product
(``species_range_etl.py:101-127``); this whole module is §2.1 standard
surface.

Scale notes: every aggregate-derived side (per-nation max, per-part
threshold, global sum) is dimension-sized after aggregation, so it is
explicitly broadcast — at 100 TB the fact-side scan dominates and none of
these plans add a second fact shuffle beyond the one their group key needs.
Lateness predicates (``l_shipdate > o_orderdate + INTERVAL``) ride on the
orderkey equi-join as residual conditions, not nested-loop joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.materialize import materialize_once


def q2_top_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: correlated max-per-group subquery decorrelated.

    Classic Q2 picks the min-cost supplier per part; without partsupp the
    same shape is 'the top-acctbal supplier(s) per EUROPE nation'.  The
    correlated ``s_acctbal = (SELECT max ... WHERE same nation)`` becomes a
    per-nation aggregate broadcast-joined back on (nationkey, acctbal) —
    max is a selection (no arithmetic), so float equality is exact.
    """
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    euro_nations = (
        nation.join(
            F.broadcast(region.where(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    nat_max = supplier.groupBy(
        F.col("s_nationkey").alias("mx_nationkey")
    ).agg(F.max("s_acctbal").alias("max_acctbal"))
    return (
        supplier.join(
            F.broadcast(nat_max),
            (F.col("s_nationkey") == F.col("mx_nationkey"))
            & (F.col("s_acctbal") == F.col("max_acctbal")),
        )
        .join(F.broadcast(euro_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("n_name", "s_name")
    )


Q2_ORACLE = """
SELECT n_name, s_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2
                   WHERE s2.s_nationkey = supplier.s_nationkey)
ORDER BY n_name, s_name
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS -> left-semi join with a non-equi residual.

    Orders in 1996H1 that had at least one line shipped after the order
    date plus 30 days (the fixtures' stand-in for commit/receipt lateness),
    counted per priority.  The semi join is hash on orderkey; the lateness
    predicate rides as a residual condition.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    in_window = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    return (
        in_window.join(
            lineitem,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: ratio of conditional aggregates per year.

    NATION_5's share of supplier revenue into ASIA customers, by order
    year.  One fact shuffle (groupBy year); both nation lookups broadcast.
    share = sum(CASE)/sum — rounded AFTER the division, once.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    asia_cust_nations = nation.join(
        F.broadcast(region.where(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select(F.col("n_nationkey").alias("cust_nationkey"))
    supp_nation = nation.select(
        F.col("n_nationkey").alias("supp_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        # customer/supplier are SF-proportional — no forced hint (rule
        # 59); the nation-derived frames stay hinted (<=25 rows)
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(asia_cust_nations),
            F.col("c_nationkey") == F.col("cust_nationkey"),
            "left_semi",
        )
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("supp_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_ORACLE = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       round(sum(CASE WHEN sn.n_name = 'NATION_5'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                      JOIN region ON n_regionkey = r_regionkey
                      WHERE r_name = 'ASIA')
GROUP BY 1
ORDER BY 1
"""


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: multi-way star join + profit expression, by nation and year.

    Classic Q9 computes profit from partsupp's supplycost; the fixtures lack
    partsupp, so supply cost is modeled as 50% of ``p_retailprice``.  Parts
    are selected by a name substring ('blue'; classic Q9 uses 'green', absent from the fixture vocabulary).  Plan:
    part filter pushed to the part scan, part+supplier+nation broadcast, the
    one fact-fact shuffle is lineitem ⋈ orders on orderkey, then one
    groupBy (nation, year).

    Float parity: ep×(1-disc) has exactly 4 decimals and 0.5×rp×qty has
    exactly 3 (integer quantities, 2dp prices), so per-row profit is exact
    in integer ten-thousandths — accumulated as BIGINT like q7 so the sum
    is order-independent across ~175 output groups.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    blue = part.where(F.col("p_name").contains("blue")).select("p_partkey")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * 0.5 * F.col("l_quantity")
    )
    return (
        # part/supplier frames are SF-proportional — no forced hint
        # (rule 59); nation below stays hinted
        lineitem.join(blue, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            part.select(F.col("p_partkey").alias("pp"), "p_retailprice"),
            F.col("l_partkey") == F.col("pp"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(F.round(amount * 10000).cast("long")) / 10000.0, 2
            ).alias("sum_profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_ORACLE = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(CAST(round((l_extendedprice * (1 - l_discount)
                             - p_retailprice * 0.5 * l_quantity) * 10000) AS BIGINT))
             / 10000.0, 2) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%blue%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


def q16_supplier_part_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: COUNT(DISTINCT) over an excluded-supplier anti join.

    Classic Q16 counts suppliers per (brand, type, size) from partsupp,
    excluding one brand, a type prefix, and complaint suppliers.  Without
    partsupp, the observed (l_partkey, l_suppkey) pairs in lineitem are the
    part-supplier relation; 'complaints' is modeled as negative account
    balance.  Plan: the exclusion side is supplier-cardinality -> broadcast
    anti join; part attributes broadcast; one shuffle for the distinct-pair
    reduction, one for the final groupBy (count distinct is exact).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    kept_parts = part.where(
        (F.col("p_brand") != "Brand#3")
        & (~F.col("p_type").startswith("PROMO"))
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    complaint_supp = supplier.where(F.col("s_acctbal") < 0.0).select("s_suppkey")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(
            # supplier/part fractions are SF-proportional — no forced
            # hint (rule 59)
            complaint_supp,
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(kept_parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#3'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q11_important_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: HAVING against a scalar subquery (fraction of global sum).

    Nations holding more than 4.5% of global supplier account balance.  The
    global total is a 1-row aggregate broadcast into the post-agg filter —
    two aggregates, zero extra fact shuffles.
    """
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    per_nation = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum("s_acctbal").alias("nation_bal"))
    )
    total = supplier.agg(F.sum("s_acctbal").alias("total_bal"))
    return (
        per_nation.join(F.broadcast(total))
        .where(F.col("nation_bal") > F.col("total_bal") * 0.045)
        .select("n_name", F.round("nation_bal", 2).alias("nation_bal"))
        .orderBy(F.col("nation_bal").desc(), "n_name")
    )


Q11_ORACLE = """
SELECT n_name, round(sum(s_acctbal), 2) AS nation_bal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
HAVING sum(s_acctbal) > (SELECT sum(s_acctbal) FROM supplier) * 0.045
ORDER BY nation_bal DESC, n_name
"""


def q12_late_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional aggregation (CASE inside SUM) over a join.

    Lines shipped >60 days after the order date in 1997, counted per
    linestatus (the fixtures' shipmode stand-in), split by whether the
    order was urgent/high priority.  Counts are exact integers — no float
    parity risk.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
            & (F.year("l_shipdate") == 1997)
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_ORACLE = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND year(l_shipdate) = 1997
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: left outer join + two-level aggregation (count distribution).

    Orders-per-customer histogram, excluding urgent orders, KEEPING
    zero-order customers (that is what the left join is for).  First
    groupBy shuffles on custkey, second on the tiny count domain.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    non_urgent = orders.where(F.col("o_orderpriority") != "1-URGENT")
    return (
        customer.join(
            non_urgent, F.col("c_custkey") == F.col("o_custkey"), "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: aggregate view + scalar max subquery join-back.

    Top revenue supplier(s) for 1996Q1.  Revenue is rounded to cents
    BEFORE the max comparison in both engines so the equality is on
    identical rounded values, not raw float sums.

    r18 (guide §2.4): the revenue view fed both the scalar-max subquery
    and the join-back as two lineages — two full lineitem scans.  The
    supplier-cardinality aggregate is materialized once (lazy
    localCheckpoint) so the max and the join read the same rows.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    revenue = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
        .transform(materialize_once)
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        # supplier is SF-proportional — no forced hint (rule 59)
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey"),
            "s_name",
            "total_revenue",
        )
        .orderBy("s_suppkey")
    )


Q15_ORACLE = """
WITH revenue AS (
    SELECT l_suppkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM revenue
JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated AVG subquery decorrelated to a window.

    Average yearly revenue lost if small-quantity Brand#1 orders were not
    taken: lines with quantity below 20% of their part's average quantity.
    The per-part threshold is a window average over partkey (r18 — see
    the inline note; formerly an aggregate + join-back that scanned the
    brand lines twice); the brand filter semi-joins the fact FIRST so
    the threshold window only sees Brand#1 lines.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand_parts = part.where(F.col("p_brand") == "Brand#1").select("p_partkey")
    brand_lines = lineitem.join(
        # part fraction / per-part aggregate are SF-proportional — no
        # forced hint (rule 59); both joins are partkey-equi so the
        # optimizer shuffle-joins them co-partitioned beyond the
        # auto-broadcast threshold
        brand_parts,
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    # r18 (guide §2.4): the decorrelated aggregate+join-back referenced
    # brand_lines twice — two lineitem scans, each paying the brand
    # semi-join.  The per-part threshold is a WINDOW average over the
    # same partkey clustering the join would have shuffled for, so one
    # pass computes and applies it.  Exact-equivalence note: l_quantity
    # is integral, so sum/count (and therefore avg) are order-exact —
    # the window's accumulation order cannot flip the comparison.
    from pyspark.sql import Window

    wpart = Window.partitionBy("l_partkey")
    return (
        brand_lines.withColumn(
            "qty_threshold", F.avg("l_quantity").over(wpart) * 0.2
        )
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.coalesce(F.round(F.sum("l_extendedprice") / 7.0, 2), F.lit(0.0)).alias(
                "avg_yearly"
            )
        )
    )


Q17_ORACLE = """
SELECT coalesce(round(sum(l_extendedprice) / 7.0, 2), 0.0) AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
"""


def q20_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested aggregate feeding a semi-join chain.

    Suppliers who shipped more than 45 units of some 'red' part during
    1996 — part-name IN-list, per-(supplier, part) HAVING aggregate,
    supplier semi join.  The HAVING aggregate output is supplier-
    cardinality (SF-proportional), so the semi join carries no forced
    hint (rule 59) — small at fixture scale, shuffle-semi beyond it.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    red_parts = part.where(F.col("p_name").startswith("red")).select("p_partkey")
    heavy = (
        lineitem.where(F.year("l_shipdate") == 1996)
        .join(red_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")  # rule 59
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 45.0)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(
            # per-supplier aggregate is SF-proportional — no hint (rule 59)
            heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_suppkey")
    )


Q20_ORACLE = """
SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE year(l_shipdate) = 1996
      AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > 45.0)
ORDER BY s_suppkey
"""


def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: EXISTS + NOT EXISTS chain, realized as ONE aggregation.

    For finished ('F') orders: NATION_3 suppliers whose line shipped late
    (>30 days after order date), where the order had another supplier's
    line, but NO other supplier shipped late — the sole blame case.

    r18 rewrite (guide §1.2/§2.4): the r17 semi+anti form scanned
    lineitem THREE times and ran two lineitem-wide joins (broadcast at
    fixture scale — over the 8 GB relation cap at 100 TB, where both
    would degrade to full orderkey shuffles of the fact table).  The
    EXISTS/NOT-EXISTS pair is a per-order property, so it folds into
    per-(order, supplier) late-line counts plus two window counts over
    the aggregated frame:

      EXISTS other-supplier line      ⟺  n_supp >= 2
      NOT EXISTS other late supplier  ⟺  n_late_supp == 1 (l1 is late)

    and numwait contributes the blamed supplier's late_cnt (one per l1
    row, exactly the old count).  One lineitem scan, ONE orderkey-keyed
    exchange (the explicit repartition that both the groupBy — orderkey
    is a prefix of its keys — and the windows reuse); everything after
    is (order, supplier)-aggregated.  Equivalence: oracle unchanged,
    parity-pinned at sf0.01/sf0.001.
    """
    from pyspark.sql import Window

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n3_supp = supplier.join(
        F.broadcast(nation.where(F.col("n_name") == "NATION_3")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    lines = lineitem.join(
        orders.where(F.col("o_orderstatus") == "F"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        ).alias("late"),
    )
    per_supp = (
        lines.repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.sum(F.when(F.col("late"), 1).otherwise(0)).alias("late_cnt")
        )
    )
    wo = Window.partitionBy("l_orderkey")
    blamed = per_supp.select(
        "l_suppkey",
        "late_cnt",
        F.count(F.lit(1)).over(wo).alias("n_supp"),
        F.sum(F.when(F.col("late_cnt") > 0, 1).otherwise(0))
        .over(wo)
        .alias("n_late_supp"),
    ).where(
        (F.col("late_cnt") > 0)
        & (F.col("n_supp") >= 2)
        & (F.col("n_late_supp") == 1)
    )
    return (
        blamed.join(n3_supp, F.col("l_suppkey") == F.col("s_suppkey"))  # supplier fraction: no hint (rule 59)
        .groupBy("s_name")
        .agg(F.sum("late_cnt").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


Q21_ORACLE = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND n_name = 'NATION_3'
  AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: scalar AVG subquery + NOT EXISTS anti join.

    'Country code' is the last two digits of c_name (the fixtures have no
    c_phone).  Customers in selected codes with above-average positive
    balance and no orders since mid-2000 (every fixture customer has SOME
    order, so 'dormant' replaces 'orderless'), aggregated per code.  The
    average is a 1-row broadcast; the NOT EXISTS is an anti join on
    custkey with the recency predicate pushed into the anti side.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    codes = ["01", "13", "25", "31", "42", "57", "86"]
    coded = customer.withColumn("cntrycode", F.expr("right(c_name, 2)")).where(
        F.col("cntrycode").isin(codes)
    )
    avg_bal = coded.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        coded.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.where(
                F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp")
            ),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


Q22_ORACLE = """
SELECT right(c_name, 2) AS cntrycode,
       count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE right(c_name, 2) IN ('01', '13', '25', '31', '42', '57', '86')
  AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                   WHERE c_acctbal > 0.0
                     AND right(c_name, 2) IN
                         ('01', '13', '25', '31', '42', '57', '86'))
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-06-01')
GROUP BY cntrycode
ORDER BY cntrycode
"""


QUERIES = {
    "q2_top_supplier_per_nation": q2_top_supplier_per_nation,
    "q4_order_priority": q4_order_priority,
    "q8_market_share": q8_market_share,
    "q9_product_type_profit": q9_product_type_profit,
    "q16_supplier_part_relationship": q16_supplier_part_relationship,
    "q11_important_balance": q11_important_balance,
    "q12_late_priority_lines": q12_late_priority_lines,
    "q13_customer_distribution": q13_customer_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q20_excess_shipments": q20_excess_shipments,
    "q21_suppliers_kept_waiting": q21_suppliers_kept_waiting,
    "q22_dormant_customers": q22_dormant_customers,
}

ORACLES = {
    "q2_top_supplier_per_nation": Q2_ORACLE,
    "q4_order_priority": Q4_ORACLE,
    "q8_market_share": Q8_ORACLE,
    "q9_product_type_profit": Q9_ORACLE,
    "q16_supplier_part_relationship": Q16_ORACLE,
    "q11_important_balance": Q11_ORACLE,
    "q12_late_priority_lines": Q12_ORACLE,
    "q13_customer_distribution": Q13_ORACLE,
    "q15_top_supplier": Q15_ORACLE,
    "q17_small_quantity_revenue": Q17_ORACLE,
    "q20_excess_shipments": Q20_ORACLE,
    "q21_suppliers_kept_waiting": Q21_ORACLE,
    "q22_dormant_customers": Q22_ORACLE,
}
