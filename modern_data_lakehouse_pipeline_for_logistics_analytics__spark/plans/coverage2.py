"""Round-2 coverage additions (SURVEY.md section 2 gaps found in review):
unpivot/melt, ordered string aggregation, numeric histogram bucketing,
regexp_extract_all, first/last/nth window values, exact discrete
percentiles, bitwise aggregates.

Oracle pins (see tests/oracle_harness + memory float playbook): integer
aggregates CAST back to BIGINT (DuckDB SUM/bit_* over integers widen to
HUGEINT -> pandas float64 -> driver hash mismatch); arrays serialize to
joined strings; ordered string_agg uses a unique sort key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, table_path


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


@register(
    "unpivot_lineitem_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide measures -> long): the inverse of the pivot
    cross-tab.  ``DataFrame.unpivot`` is one narrow projection (no
    shuffle, no UNION re-scan -- the oracle's 3x scan is the naive
    formulation unpivot replaces)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="val",
    ).withColumn(
        "measure", F.regexp_replace(F.col("measure"), "^l_", "")
    )


@register(
    "string_agg_names_per_segment",
    oracle="""
    SELECT c_mktsegment,
           string_agg(c_name, '|' ORDER BY c_name) AS names,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer
    WHERE c_custkey % 100 = 0
    GROUP BY c_mktsegment
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg): deterministic only with an
    explicit unique sort key -- bare collect_list order is
    partition-dependent and must never be hash-compared."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 100 == 0)
    return c.groupBy("c_mktsegment").agg(
        F.array_join(F.array_sort(F.collect_list("c_name")), "|").alias("names"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "histogram_price_buckets",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 30000) + 1 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders GROUP BY 1
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via ``width_bucket`` -- the distributed
    profile/quality-report primitive (one map-side-combinable groupBy;
    bucket count is fixed, so the shuffle moves <=21 rows per task)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(
        F.width_bucket(F.col("o_totalprice"), F.lit(0.0), F.lit(630000.0), F.lit(21))
        .cast("long")
        .alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@register(
    "regexp_extract_all_digits",
    oracle="""
    SELECT c_custkey,
           array_to_string(regexp_extract_all(c_name, '[0-9]+'), ',') AS digit_runs,
           CAST(len(regexp_extract_all(c_name, '[0-9]+')) AS BIGINT) AS n_runs
    FROM customer
    """,
)
def q_regexp_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all (F16): every digit run, serialized to a joined
    string (driver canonicalizer cannot hash array cells)."""
    c = _t(spark, sf_dir, "customer")
    runs = F.regexp_extract_all(F.col("c_name"), F.lit("([0-9]+)"), 1)
    return c.select(
        "c_custkey",
        F.array_join(runs, ",").alias("digit_runs"),
        F.size(runs).cast("long").alias("n_runs"),
    )


@register(
    "window_first_last_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey) OVER w AS last_order,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value over the full-partition frame (W0 completion:
    the frame must be UNBOUNDED FOLLOWING or last_value degenerates to
    the current row)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


@register(
    "percentile_disc_prices",
    oracle="""
    SELECT o_orderpriority,
           quantile_disc(o_totalprice, 0.25) AS p25_price,
           quantile_disc(o_totalprice, 0.75) AS p75_price,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (always an actual data value -> exact across
    engines, no interpolation ulps; contrast agg_median_stddev's
    continuous variants)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.expr(
                "percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias("p25_price"),
            F.expr(
                "percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias("p75_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "profile_orders_columns",
    oracle="""
    SELECT 'o_totalprice' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS n_distinct,
           CAST(ROUND(MIN(o_totalprice), 2) AS VARCHAR) AS min_val,
           CAST(ROUND(MAX(o_totalprice), 2) AS VARCHAR) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    """,
)
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profiling (the data-quality report a training pipeline
    runs before ingest): count / nulls / exact distinct / min / max per
    column, emitted as one row per column.  ONE pass over the table --
    all three columns' aggregates compute in a single HashAggregate and
    the per-column rows are exploded from an inline array (the oracle's
    UNION ALL formulation is the naive 3-scan version)."""
    o = _t(spark, sf_dir, "orders")
    agg = o.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            a
            for c in ("o_totalprice", "o_orderpriority", "o_custkey")
            for a in (
                F.count(c).alias(f"nn_{c}"),
                F.countDistinct(c).alias(f"nd_{c}"),
                F.min(c).alias(f"mn_{c}"),
                F.max(c).alias(f"mx_{c}"),
            )
        ],
    )

    def entry(c: str, mn: F.Column, mx: F.Column) -> F.Column:
        return F.struct(
            F.lit(c).alias("col_name"),
            F.col("n").alias("n"),
            (F.col("n") - F.col(f"nn_{c}")).alias("n_null"),
            F.col(f"nd_{c}").alias("n_distinct"),
            mn.alias("min_val"),
            mx.alias("max_val"),
        )

    rows = F.array(
        entry(
            "o_totalprice",
            F.round(F.col("mn_o_totalprice"), 2).cast("string"),
            F.round(F.col("mx_o_totalprice"), 2).cast("string"),
        ),
        entry(
            "o_orderpriority",
            F.col("mn_o_orderpriority"),
            F.col("mx_o_orderpriority"),
        ),
        entry(
            "o_custkey",
            F.col("mn_o_custkey").cast("string"),
            F.col("mx_o_custkey").cast("string"),
        ),
    )
    return agg.select(F.explode(rows).alias("p")).select("p.*")


@register(
    "sample_deterministic_split",
    oracle="""
    SELECT doc_id,
           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
                THEN 'holdout' ELSE 'train' END AS split
    FROM documents
    """,
)
def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/holdout split by content-free key hash -- the
    reproducible-sampling primitive a training pipeline needs (same doc
    lands in the same split on every run, every engine, any partitioning;
    ``df.sample`` is seed-AND-partitioning dependent and can never be
    cross-engine verified).  2/16 of the md5 hex space -> 12.5% holdout."""
    d = _t(spark, sf_dir, "documents")
    shard = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return d.select(
        "doc_id",
        shard.alias("shard"),
        F.when(shard.isin("0", "1"), "holdout").otherwise("train").alias("split"),
    )


@register(
    "bitwise_line_flags",
    oracle="""
    SELECT l_orderkey,
           CAST(bit_or(CAST(1 AS BIGINT) << l_linenumber) AS BIGINT) AS line_mask,
           CAST(bit_and(CAST(1 AS BIGINT) << l_linenumber) AS BIGINT) AS line_and,
           CAST(bit_xor(l_linenumber) AS BIGINT) AS line_xor,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem GROUP BY l_orderkey
    """,
)
def q_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (flag-mask building: which line numbers exist
    per order as one BIGINT)."""
    li = _t(spark, sf_dir, "lineitem")
    # F.shiftleft only takes a literal shift amount; the SQL form shifts
    # by a column.
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(l_linenumber AS INT))")
    return li.groupBy("l_orderkey").agg(
        F.bit_or(mask).alias("line_mask"),
        F.bit_and(mask).alias("line_and"),
        F.bit_xor(F.col("l_linenumber").cast("long")).alias("line_xor"),
        F.count(F.lit(1)).alias("n_lines"),
    )
