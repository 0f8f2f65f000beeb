"""Scalar-function surface: strings (T2/T6/F1/F2), dates (C2), JSON, math,
and the errors-as-data routing that replaces the reference's swallowed
exceptions (O1 hazard, ``species_range_etl.py:172-173,254-255``).

Everything here is a pure column expression — JVM-side, whole-stage-codegen
friendly, no Python UDFs.  At 100 TB these run inside the scan stage at
memory bandwidth; that is the point of keeping them out of Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

# --------------------------------------------------------------------------
# T6 — the filename -> attribute parser, the reference's most bug-prone logic
# --------------------------------------------------------------------------

# Reference semantics (species_range_etl.py:188-198): strip ".shp", split on
# "_".  2 tokens (threshold, "current") => source="vtech", scenario="current",
# year="2020"; 4 tokens (threshold, source, scenario, "yYYYY") => year strips
# the leading "y".  All outputs stay strings — reference fidelity (the year
# to_datetime cast is commented out at species_range_etl.py:226).


def _synth_filenames(part: DataFrame) -> DataFrame:
    """Deterministic scenario filenames synthesized from the part table, so
    the parser can be oracle-checked without the reference's scraped files."""
    thr = (F.lit(25) + (F.col("p_partkey") % 3) * 25).cast("string")
    current = F.concat_ws("_", thr, F.lit("current"))
    future = F.concat_ws(
        "_",
        thr,
        F.concat(F.lit("model"), (F.col("p_partkey") % 5).cast("string")),
        F.concat(F.lit("rcp"), (F.col("p_partkey") % 9).cast("string")),
        F.concat(F.lit("y"), (F.lit(2000) + F.col("p_partkey") % 100).cast("string")),
    )
    fname = F.concat(
        F.when(F.col("p_partkey") % 2 == 0, current).otherwise(future), F.lit(".shp")
    )
    return part.select("p_partkey", fname.alias("fname"))


def filename_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator T6 as a reusable column expression (split + when + substring)."""
    part = load_table(spark, sf_dir, "part")
    named = _synth_filenames(part)
    base = F.regexp_replace(F.col("fname"), r"\.shp$", "")
    toks = F.split(base, "_")
    two = F.size(toks) == 2
    return (
        named.select(
            "p_partkey",
            "fname",
            toks.getItem(0).alias("threshold"),
            F.when(two, F.lit("vtech")).otherwise(toks.getItem(1)).alias("source"),
            F.when(two, F.lit("current")).otherwise(toks.getItem(2)).alias("scenario"),
            F.when(two, F.lit("2020"))
            .otherwise(F.expr("substring(element_at(split(regexp_replace(fname, '\\\\.shp$', ''), '_'), 4), 2)"))
            .alias("year"),
        )
        .orderBy("p_partkey")
    )


FILENAME_PARSE_ORACLE = """
WITH named AS (
    SELECT p_partkey,
           (CASE WHEN p_partkey % 2 = 0
                 THEN CAST(25 + (p_partkey % 3) * 25 AS VARCHAR) || '_current'
                 ELSE CAST(25 + (p_partkey % 3) * 25 AS VARCHAR)
                      || '_model' || CAST(p_partkey % 5 AS VARCHAR)
                      || '_rcp' || CAST(p_partkey % 9 AS VARCHAR)
                      || '_y' || CAST(2000 + p_partkey % 100 AS VARCHAR)
            END) || '.shp' AS fname
    FROM part
), toks AS (
    SELECT p_partkey, fname,
           string_split(regexp_replace(fname, '\\.shp$', ''), '_') AS t
    FROM named
)
SELECT p_partkey, fname,
       t[1] AS threshold,
       CASE WHEN len(t) = 2 THEN 'vtech' ELSE t[2] END AS source,
       CASE WHEN len(t) = 2 THEN 'current' ELSE t[3] END AS scenario,
       CASE WHEN len(t) = 2 THEN '2020' ELSE substring(t[4], 2) END AS year
FROM toks
ORDER BY p_partkey
"""


def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2-family string ops: regex rename, case, substring, split, predicates."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            # T2: the .txt -> .asc regex rename shape (species_range_etl.py:63)
            F.regexp_replace(F.col("p_type"), "^ECONOMY", "BUDGET").alias("retyped"),
            F.upper("p_name").alias("name_upper"),
            F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
            F.substring(F.col("p_brand"), 7, 2).alias("brand_num"),
            F.length("p_name").cast("long").alias("name_len"),
            F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
            # F1/F2-family predicates as boolean columns
            F.col("p_name").endswith("widget").alias("is_widget"),
            F.col("p_type").contains("ECONO").alias("is_economy"),
        )
        .orderBy("p_partkey")
    )


STR_FUNCS_ORACLE = """
SELECT p_partkey,
       regexp_replace(p_type, '^ECONOMY', 'BUDGET') AS retyped,
       upper(p_name) AS name_upper,
       string_split(p_name, ' ')[1] AS first_word,
       substring(p_brand, 7, 2) AS brand_num,
       CAST(length(p_name) AS BIGINT) AS name_len,
       p_brand || '/' || p_type AS brand_type,
       suffix(p_name, 'widget') AS is_widget,
       contains(p_type, 'ECONO') AS is_economy
FROM part
ORDER BY p_partkey
"""


def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/timestamp surface incl. C2, the reference's latent year cast
    (``species_range_etl.py:226``): year-string -> timestamp -> parts."""
    orders = load_table(spark, sf_dir, "orders")
    year_str = F.year("o_orderdate").cast("string")
    return (
        orders.select(
            "o_orderkey",
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
            F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
            # C2: to_timestamp(year, "yyyy"), rendered as a string for hashing
            F.date_format(F.to_timestamp(year_str, "yyyy"), "yyyy-MM-dd HH:mm:ss").alias(
                "year_ts"
            ),
            F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
            .cast("long")
            .alias("days_to_cutoff"),
            F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
        )
        .orderBy("o_orderkey")
    )


DATE_FUNCS_ORACLE = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_month,
       CAST(day(o_orderdate) AS INTEGER) AS order_day,
       strftime(strptime(CAST(year(o_orderdate) AS VARCHAR), '%Y'),
                '%Y-%m-%d %H:%M:%S') AS year_ts,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT)
           AS days_to_cutoff,
       strftime(o_orderdate, '%Y-%m') AS order_ym
FROM orders
ORDER BY o_orderkey
"""


def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON access over events.props (SURVEY.md §2.1 scalar-functions row)."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
            F.round(F.avg(k), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


JSON_FUNCS_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
       round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def json_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT surface (Spark 4): parse once, extract typed.

    ``parse_json`` materializes props into the binary VARIANT encoding in
    the scan stage; every later ``variant_get`` is a cheap typed probe of
    that encoding instead of a re-parse of the JSON text — at 100 TB the
    parse-once/probe-many split is the difference between one and N full
    text parses (and Parquet can store the variant column shredded).  The
    rollup: per event_type, k extracted as LONG via variant_get, plus a
    defensive try_variant_get probe of a missing path (NULL -> counted,
    never thrown).
    """
    events = load_table(spark, sf_dir, "events")
    v = events.select("event_type", F.parse_json("props").alias("pv"))
    k = F.variant_get("pv", "$.k", "long")
    missing = F.try_variant_get("pv", "$.absent", "long")
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.count_distinct(k).alias("n_distinct_k"),
            F.count(missing).alias("n_absent_hits"),
        )
        .orderBy("event_type")
    )


def xml_roundtrip_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML parse surface (Spark 4 from_xml/to_xml) — the S3 scrape shape.

    The reference's scrape stage parses markup into typed rows
    (``species_range_etl.py:142-154``, BeautifulSoup over HTML).  The
    engine-side equivalent is schema-declared XML parsing as a column
    expression: here each supplier row is rendered to an XML document and
    parsed back (``from_xml`` with an explicit schema — no inference scan),
    then filtered with an availability-style predicate (F1,
    ``species_range_etl.py:148-150``) BEFORE any downstream work, keeping
    the filter ahead of expensive stages exactly as SURVEY §4 requires.
    The roundtrip makes the op oracle-checkable: parsed output must equal
    the original columns, which DuckDB reads directly.
    """
    supplier = load_table(spark, sf_dir, "supplier")
    xml = supplier.select(
        F.to_xml(F.struct("s_suppkey", "s_name", "s_acctbal")).alias("page")
    )
    parsed = xml.select(
        F.from_xml(
            "page", "s_suppkey long, s_name string, s_acctbal double"
        ).alias("s"),
        "page",
    )
    return (
        parsed.where(~F.col("page").contains("<s_name>UNAVAILABLE</s_name>"))
        .select(
            F.col("s.s_suppkey").alias("suppkey"),
            F.col("s.s_name").alias("name"),
            F.round("s.s_acctbal", 2).alias("acctbal"),
        )
        .where(F.col("acctbal") > 0)
        .orderBy("suppkey")
    )


XML_ROUNDTRIP_ORACLE = """
SELECT s_suppkey AS suppkey,
       s_name AS name,
       round(s_acctbal, 2) AS acctbal
FROM supplier
WHERE s_name != 'UNAVAILABLE' AND round(s_acctbal, 2) > 0
ORDER BY suppkey
"""


JSON_VARIANT_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_distinct_k,
       count(CAST(json_extract_string(props, '$.absent') AS BIGINT)) AS n_absent_hits
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar surface over lineitem, fixed-scale rounded for hashing."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.abs(F.col("l_extendedprice") - 30000.0), 2).alias("abs_dev"),
            F.ceil("l_quantity").cast("long").alias("qty_ceil"),
            F.floor(F.col("l_extendedprice") / 1000.0).cast("long").alias("price_k"),
            F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
            F.round(F.log(F.col("l_extendedprice") + 1.0), 4).alias("price_ln"),
            F.round(F.pow(F.col("l_discount") + 1.0, 2.0), 4).alias("disc_sq"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


MATH_FUNCS_ORACLE = """
SELECT l_orderkey,
       l_linenumber,
       round(abs(l_extendedprice - 30000.0), 2) AS abs_dev,
       CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
       CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_k,
       round(sqrt(l_extendedprice), 4) AS price_sqrt,
       round(ln(l_extendedprice + 1.0), 4) AS price_ln,
       round(pow(l_discount + 1.0, 2.0), 4) AS disc_sq
FROM lineitem
ORDER BY l_orderkey, l_linenumber
"""


def error_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Errors-as-DataFrame side channel (fixes the reference's O1 hazard).

    The reference silently drops worker exceptions because ``executor.map``
    results are never iterated (``species_range_etl.py:254-255``).  Here,
    rows are routed to ok/warn/error channels with CASE and every channel is
    counted — nothing vanishes.
    """
    events = load_table(spark, sf_dir, "events")
    channel = (
        F.when(F.col("event_type") == "error", F.lit("error"))
        .when(F.col("value") > 190.0, F.lit("warn"))
        .otherwise(F.lit("ok"))
    )
    return (
        events.groupBy(channel.alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("channel")
    )


ERROR_ROUTING_ORACLE = """
SELECT CASE WHEN event_type = 'error' THEN 'error'
            WHEN value > 190.0 THEN 'warn'
            ELSE 'ok' END AS channel,
       count(*) AS n_rows,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1
ORDER BY channel
"""


def null_cond_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling + conditional scalar surface: nullif / coalesce /
    least / greatest / conditional count — the SQL-completeness slice the
    other scalar queries don't touch.  (The fixtures are fully non-null, so
    nullif MANUFACTURES the nulls this query then handles.)"""
    cust = load_table(spark, sf_dir, "customer")
    # negative balances become NULL, then are counted/coalesced/floored
    pos_bal = F.when(F.col("c_acctbal") >= 0, F.col("c_acctbal"))
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.count(pos_bal).alias("n_nonneg"),
            F.round(F.sum(F.coalesce(pos_bal, F.lit(0.0))), 2).alias(
                "sum_nonneg"
            ),
            F.round(
                F.avg(F.coalesce(pos_bal, F.lit(0.0))), 4
            ).alias("avg_floored"),
            F.round(
                F.max(F.greatest(F.col("c_acctbal"), F.lit(0.0))), 2
            ).alias("max_pos"),
            F.round(
                F.min(F.least(F.col("c_acctbal"), F.lit(0.0))), 2
            ).alias("min_neg"),
        )
        .orderBy("c_mktsegment")
    )


NULL_COND_ORACLE = """
SELECT c_mktsegment,
       count(*) AS n_cust,
       count(CASE WHEN c_acctbal >= 0 THEN c_acctbal END) AS n_nonneg,
       round(sum(coalesce(CASE WHEN c_acctbal >= 0 THEN c_acctbal END, 0.0)), 2)
           AS sum_nonneg,
       round(avg(coalesce(CASE WHEN c_acctbal >= 0 THEN c_acctbal END, 0.0)), 4)
           AS avg_floored,
       round(max(greatest(c_acctbal, 0.0)), 2) AS max_pos,
       round(min(least(c_acctbal, 0.0)), 2) AS min_neg
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type surface: build a map from columns, access by key, and
    aggregate over its entries — rendered to sorted strings because map
    iteration order is engine-defined."""
    part = load_table(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"),
        F.lit("type"), F.col("p_type"),
    )
    return (
        part.where(F.col("p_partkey") < 200)
        .select(
            "p_partkey",
            F.element_at(m, "brand").alias("brand_val"),
            F.size(m).cast("long").alias("n_keys"),
            F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
            F.array_join(F.array_sort(F.map_values(m)), ",").alias("vals_sorted"),
        )
        .orderBy("p_partkey")
    )


MAP_FUNCS_ORACLE = """
SELECT p_partkey,
       p_brand AS brand_val,
       CAST(cardinality(MAP(['brand','type'], [p_brand, p_type])) AS BIGINT)
           AS n_keys,
       array_to_string(list_sort(map_keys(MAP(['brand','type'],
           [p_brand, p_type]))), ',') AS keys_sorted,
       array_to_string(list_sort(map_values(MAP(['brand','type'],
           [p_brand, p_type]))), ',') AS vals_sorted
FROM part
WHERE p_partkey < 200
ORDER BY p_partkey
"""


def regexp_group_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-group extraction: pull the numeric suffix and word stem out
    of p_brand ('Brand#NN') with one regexp_extract per group."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.where(F.col("p_partkey") < 300)
        .select(
            "p_partkey",
            F.regexp_extract("p_brand", r"^([A-Za-z]+)#(\d+)$", 1).alias("brand_word"),
            F.regexp_extract("p_brand", r"^([A-Za-z]+)#(\d+)$", 2)
            .cast("int")
            .alias("brand_num"),
            F.regexp_extract("p_name", r"(\w+)$", 1).alias("last_word"),
        )
        .orderBy("p_partkey")
    )


REGEXP_GROUP_ORACLE = r"""
SELECT p_partkey,
       regexp_extract(p_brand, '^([A-Za-z]+)#(\d+)$', 1) AS brand_word,
       CAST(regexp_extract(p_brand, '^([A-Za-z]+)#(\d+)$', 2) AS INTEGER)
           AS brand_num,
       regexp_extract(p_name, '(\w+)$', 1) AS last_word
FROM part
WHERE p_partkey < 300
ORDER BY p_partkey
"""


def str_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching: near-identical part names within a
    type (blocking key), levenshtein <= 3.

    The p_type equi-join is the blocking strategy — at scale fuzzy match
    is always 'block then score', never all-pairs: the quadratic term is
    bounded per block, the join shuffles on the block key only.
    """
    part = load_table(spark, sf_dir, "part")
    a = part.select(
        F.col("p_type").alias("ptype"),
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
    )
    b = part.select(
        F.col("p_type").alias("ptype"),
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
    )
    return (
        a.join(b, "ptype")
        .where(F.col("key_a") < F.col("key_b"))
        .where(F.col("name_a") != F.col("name_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b").cast("long"))
        .where(F.col("edit_dist") <= 3)
        .groupBy("ptype", "edit_dist")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("ptype", "edit_dist")
    )


STR_FUZZY_ORACLE = """
SELECT a.p_type AS ptype,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist,
       count(*) AS n_pairs
FROM part a
JOIN part b ON a.p_type = b.p_type
WHERE a.p_partkey < b.p_partkey
  AND a.p_name <> b.p_name
  AND levenshtein(a.p_name, b.p_name) <= 3
GROUP BY 1, 2
ORDER BY 1, 2
"""


def json_udtf_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze``): the output schema is
    computed at plan time from the literal key-list argument — one column
    per requested JSON key — instead of being declared statically like
    ``text_chunk_udtf``'s.  This is the UDTF capability the fixed-schema
    form can't show: the same function extracts any key set, and Catalyst
    sees real named columns (prunable, filterable) rather than a map.

    eval is plain stdlib-json per row, but ``useArrow=True`` ships the
    rows as Arrow record batches (the HOT path for JSON stays
    ``json_funcs``/``json_variant_funcs``' JVM expressions).  The rollup
    (count + avg of the extracted value per event_type) is the
    oracle-checkable observable.
    """
    import json as _json

    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType

    @udtf(useArrow=True)
    class JsonFields:
        @staticmethod
        def analyze(props, keys):
            from pyspark.sql.udtf import AnalyzeResult

            if keys.value is None:  # non-literal: no value at analyze time
                raise ValueError("keys must be a literal csv string")
            return AnalyzeResult(
                StructType(
                    [
                        StructField(k.strip(), StringType())
                        for k in str(keys.value).split(",")
                    ]
                )
            )

        def __init__(self, analyze_result=None):
            self._keys = (
                [f.name for f in analyze_result.schema.fields]
                if analyze_result is not None
                else []
            )

        def eval(self, props, keys):
            try:
                d = _json.loads(props) if props is not None else {}
            except ValueError:
                d = {}
            if not isinstance(d, dict):  # valid JSON, not an object
                d = {}
            yield tuple(
                None if d.get(k) is None else str(d[k]) for k in self._keys
            )

    events = load_table(spark, sf_dir, "events")
    extracted = events.select("event_type", "props").lateralJoin(
        JsonFields(F.col("props").outer(), F.lit("k"))
    )
    return (
        extracted.groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.round(F.avg(F.col("k").cast("double")), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


JSON_UDTF_DYNAMIC_ORACLE = """
SELECT event_type,
       count(json_extract_string(props, '$.k')) AS n_with_k,
       round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4)
           AS avg_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


QUERIES = {
    "json_udtf_dynamic": json_udtf_dynamic,
    "str_fuzzy_match": str_fuzzy_match,
    "filename_parse": filename_parse,
    "str_funcs": str_funcs,
    "date_funcs": date_funcs,
    "json_funcs": json_funcs,
    "json_variant_funcs": json_variant_funcs,
    "xml_roundtrip_parse": xml_roundtrip_parse,
    "math_funcs": math_funcs,
    "null_cond_funcs": null_cond_funcs,
    "map_funcs": map_funcs,
    "regexp_group_funcs": regexp_group_funcs,
    "error_routing": error_routing,
}

ORACLES = {
    "json_udtf_dynamic": JSON_UDTF_DYNAMIC_ORACLE,
    "str_fuzzy_match": STR_FUZZY_ORACLE,
    "filename_parse": FILENAME_PARSE_ORACLE,
    "str_funcs": STR_FUNCS_ORACLE,
    "date_funcs": DATE_FUNCS_ORACLE,
    "json_funcs": JSON_FUNCS_ORACLE,
    "json_variant_funcs": JSON_VARIANT_ORACLE,
    "xml_roundtrip_parse": XML_ROUNDTRIP_ORACLE,
    "math_funcs": MATH_FUNCS_ORACLE,
    "null_cond_funcs": NULL_COND_ORACLE,
    "map_funcs": MAP_FUNCS_ORACLE,
    "regexp_group_funcs": REGEXP_GROUP_ORACLE,
    "error_routing": ERROR_ROUTING_ORACLE,
}
