"""Scalar-function plans (SURVEY.md section 2.8, F1-F16).

The reference's scalar surface is trim/upper, casts, to_timestamp/to_date,
round, date arithmetic (F1-F14); F16 notes the JSON/regex/math functions it
lacks but the driver's ``events.props`` fixture exercises.  Each family gets
one wide projection query so every function is value-checked against DuckDB.

All outputs are exact types (strings, ints, dates, truncated timestamps) or
libm results rounded to 6dp -- no per-row float knife-edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import read_events, register, table_path


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


@register(
    "scalar_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
           CAST(MONTH(o_orderdate) AS BIGINT) AS order_month,
           CAST(DAYOFMONTH(o_orderdate) AS BIGINT) AS order_dom,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS BIGINT)
             AS days_to_cutoff
    FROM orders
    """,
)
def q_scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3-F5, F12-F13: to_date, extract fields, date_trunc, date_add,
    datediff (`Silver_tranformation.py:88-89`, `starschema.py:88`,
    `pastapi.py:210` semantics)."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.to_date(d).alias("order_date"),
        F.year(d).cast("long").alias("order_year"),
        F.month(d).cast("long").alias("order_month"),
        F.dayofmonth(d).cast("long").alias("order_dom"),
        F.trunc(d, "month").alias("month_start"),
        F.date_add(F.to_date(d), 30).alias("due_date"),
        F.datediff(F.lit("1998-12-01").cast("date"), F.to_date(d)).cast("long").alias(
            "days_to_cutoff"
        ),
    )


@register(
    "scalar_strings",
    oracle="""
    SELECT c_custkey,
           UPPER(TRIM(c_name)) AS name_norm,
           CAST(LENGTH(c_name) AS BIGINT) AS name_len,
           SUBSTR(c_name, 1, 8) AS name_prefix,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS name_digits,
           CONCAT_WS('|', c_mktsegment, c_name) AS seg_name,
           REPLACE(c_name, 'Customer', 'Cust') AS name_short,
           LPAD(CAST(c_custkey AS VARCHAR), 12, '0') AS key_padded,
           CAST(STRPOS(c_name, '#') AS BIGINT) AS hash_pos
    FROM customer
    """,
)
def q_scalar_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F14/F15 + the standard string set the reference lacks (F16):
    normalize, length, substring, regexp_extract, concat_ws, replace,
    lpad, instr."""
    c = _t(spark, sf_dir, "customer")
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.upper(F.trim(name)).alias("name_norm"),
        F.length(name).cast("long").alias("name_len"),
        F.substring(name, 1, 8).alias("name_prefix"),
        F.regexp_extract(name, r"([0-9]+)", 1).alias("name_digits"),
        F.concat_ws("|", F.col("c_mktsegment"), name).alias("seg_name"),
        F.replace(name, F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("key_padded"),
        F.instr(name, "#").cast("long").alias("hash_pos"),
    )


@register(
    "scalar_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
           CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) >= 50
                THEN 'high' ELSE 'low' END AS k_band
    FROM events
    """,
)
def q_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16: JSON scalar extraction over ``events.props``
    (`get_json_object` string path + typed `from_json`)."""
    e = read_events(spark, sf_dir)
    k_int = F.from_json(F.col("props"), "k BIGINT").getField("k")
    return e.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").alias("k_str"),
        k_int.alias("k_int"),
        F.when(k_int >= 50, "high").otherwise("low").alias("k_band"),
    )


@register(
    "scalar_variant_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
           CAST(NULL AS VARCHAR) AS missing_str,
           CAST(CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS BIGINT) AS is_valid
    FROM events
    """,
)
def q_scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType over ``events.props``: ``parse_json`` into the
    binary Variant encoding (parse ONCE, extract many -- at 100 TB this
    replaces per-access string re-parsing, the reason Variant exists),
    then typed ``variant_get`` path extraction, the null-safe
    ``try_variant_get`` for absent paths, and a ``try_parse_json``
    validity probe.  Output is plain typed columns (Variant itself never
    crosses the driver canonicalizer)."""
    e = read_events(spark, sf_dir)
    v = F.parse_json(F.col("props"))
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_int"),
        F.try_variant_get(v, "$.missing", "string").alias("missing_str"),
        F.try_parse_json(F.col("props")).isNotNull().cast("long").alias("is_valid"),
    )


@register(
    "scalar_map_json",
    oracle="""
    SELECT event_id,
           array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CAST(len(json_keys(props)) AS BIGINT) AS n_keys
    FROM events
    """,
)
def q_scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface (SURVEY 1.2: the reference never uses maps):
    from_json to map<string,bigint>, map_keys, element access.

    ``prop_keys`` is serialized to a sorted comma-joined STRING on both
    sides: the driver's canonicalizer hashes cell values via pandas and
    dies on array-typed cells (r1 'unhashable type: list'), and sorting
    removes JSON-document key-order dependence."""
    e = read_events(spark, sf_dir)
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return e.select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("prop_keys"),
        F.element_at(m, "k").alias("k_val"),
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
    )


@register(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_extendedprice - 30000) AS abs_delta,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           l_orderkey % 7 AS key_mod,
           GREATEST(l_discount, l_tax) AS max_rate,
           LEAST(l_discount, l_tax) AS min_rate,
           ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,
           ROUND(LN(l_extendedprice), 6) AS price_ln,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem
    """,
)
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16 math set: abs/ceil/floor/mod/greatest/least/sqrt/ln/sign.
    libm outputs rounded to 6dp; the rest are exact."""
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(price - 30000).alias("abs_delta"),
        F.ceil(price).alias("price_ceil"),
        F.floor(price).alias("price_floor"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.round(F.sqrt(price), 6).alias("price_sqrt"),
        F.round(F.log(price), 6).alias("price_ln"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@register(
    "scalar_strings2",
    oracle="""
    SELECT c_custkey,
           TRANSLATE(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
           SPLIT_PART(c_name, '#', 2) AS name_after_hash,
           REVERSE(c_mktsegment) AS seg_rev,
           REPEAT(LEFT(c_mktsegment, 2), 2) AS seg_rep,
           LEFT(c_name, 4) AS name_l4,
           RIGHT(c_name, 3) AS name_r3,
           CAST(ASCII(c_mktsegment) AS BIGINT) AS seg_ascii,
           CHR(CAST(65 + c_custkey % 26 AS INT)) AS key_chr
    FROM customer
    """,
)
def q_scalar_strings2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string batch: translate, split_part, reverse, repeat,
    left/right, ascii/chr."""
    c = _t(spark, sf_dir, "customer")
    seg, name = F.col("c_mktsegment"), F.col("c_name")
    return c.select(
        "c_custkey",
        F.translate(seg, "AEIOU", "aeiou").alias("seg_translated"),
        F.split_part(name, F.lit("#"), F.lit(2)).alias("name_after_hash"),
        F.reverse(seg).alias("seg_rev"),
        F.repeat(F.substring(seg, 1, 2), 2).alias("seg_rep"),
        F.substring(name, 1, 4).alias("name_l4"),
        F.substring(name, -3, 3).alias("name_r3"),
        F.ascii(seg).cast("long").alias("seg_ascii"),
        F.chr(65 + F.col("c_custkey") % 26).alias("key_chr"),
    )


@register(
    "scalar_datetime2",
    oracle="""
    SELECT o_orderkey,
           LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(QUARTER(o_orderdate) AS BIGINT) AS order_quarter,
           CAST(WEEKOFYEAR(o_orderdate) AS BIGINT) AS order_week,
           CAST(DAYOFWEEK(o_orderdate) + 1 AS BIGINT) AS order_dow,
           CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS plus_3mo,
           CAST(DATE_DIFF('month', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS BIGINT)
             AS months_to_cutoff
    FROM orders
    """,
)
def q_scalar_datetime2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second datetime batch: last_day, quarter, weekofyear, dayofweek,
    add_months, whole-month difference.

    Cross-engine pins: DuckDB DATE + INTERVAL MONTH returns a timestamp
    (cast Spark's date to match); Spark DAYOFWEEK is 1=Sunday while
    DuckDB's is 0=Sunday (+1 in the oracle); whole-month difference is
    computed from year/month fields so both engines count calendar
    boundaries."""
    o = _t(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.last_day(d).alias("month_end"),
        F.quarter(d).cast("long").alias("order_quarter"),
        F.weekofyear(d).cast("long").alias("order_week"),
        F.dayofweek(d).cast("long").alias("order_dow"),
        F.add_months(d, 3).cast("timestamp").alias("plus_3mo"),
        (
            (F.year(F.lit("1998-12-01").cast("date")) - F.year(d)) * 12
            + (F.month(F.lit("1998-12-01").cast("date")) - F.month(d))
        ).cast("long").alias("months_to_cutoff"),
    )


@register(
    "scalar_conditionals",
    oracle="""
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN_MASKED') AS status_masked,
           CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              ELSE 'partial' END AS status_label,
           IF(o_totalprice > 200000, 'big', 'small') AS size_band
    FROM orders
    """,
)
def q_scalar_conditionals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8/P9 conditional family: coalesce/nullif, multi-branch CASE,
    2-branch IF."""
    o = _t(spark, sf_dir, "orders")
    s = F.col("o_orderstatus")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif(s, F.lit("O")), F.lit("OPEN_MASKED")).alias("status_masked"),
        F.when(s == "F", "finished").when(s == "O", "open").otherwise("partial").alias(
            "status_label"
        ),
        F.when(F.col("o_totalprice") > 200000, "big").otherwise("small").alias("size_band"),
    )
