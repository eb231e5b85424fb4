"""Correlated-subquery SQL plans (SURVEY.md section 4: subquery
decorrelation is free once the engine exposes spark.sql)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import register, table_path


def _view(spark: SparkSession, sf_dir: str, name: str) -> None:
    spark.read.parquet(table_path(sf_dir, name)).createOrReplaceTempView(f"{name}_v")


@register(
    "sql_exists_correlated",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_late
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS -- Catalyst decorrelates to a
    left-semi join (verify: .explain shows LeftSemi, no per-row subquery)."""
    _view(spark, sf_dir, "orders")
    _view(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_late
        FROM orders_v o
        WHERE EXISTS (SELECT 1 FROM lineitem_v l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        """
    )


@register(
    "sql_scalar_correlated",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal
    FROM customer c
    WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def q_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (above-nation-average customers) --
    decorrelates to an aggregate + join."""
    _view(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer_v c
        WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer_v c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


@register(
    "sql_in_subquery",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_parts
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_discount >= 0.08)
    GROUP BY p_brand
    """,
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated IN subquery -> semi join."""
    _view(spark, sf_dir, "part")
    _view(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT p_brand, COUNT(*) AS n_parts
        FROM part_v
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem_v WHERE l_discount >= 0.08)
        GROUP BY p_brand
        """
    )
