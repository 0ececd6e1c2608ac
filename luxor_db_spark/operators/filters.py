"""§2.2 Projection / filter / predicates (SURVEY.md).

Reference status: absent (reference ``Main.java:1-7`` only). Target surface
defined here, Spark-first: every key is a pure Catalyst expression tree, so
predicates push into the Parquet scan and stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from luxor_db_spark.catalog import load_table
from luxor_db_spark.registry import query


@query(
    "project_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    """,
)
def project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row float arithmetic stays RAW (no round): identical expression
    shape → bit-identical IEEE doubles in both engines (functions/exact.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        (net * (1 + F.col("l_tax"))).alias("charge"),
    )


@query(
    "filter_compare",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_quantity >= 30.0 AND l_discount < 0.05
      AND l_tax != 0.02 AND l_linenumber <= 3
    """,
)
def filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") >= 30.0)
        & (F.col("l_discount") < 0.05)
        & (F.col("l_tax") != 0.02)
        & (F.col("l_linenumber") <= 3)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@query(
    "filter_between_in",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_totalprice BETWEEN 100000.0 AND 200000.0
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def filter_between_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_totalprice").between(100000.0, 200000.0)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")


@query(
    "filter_null",
    oracle="""
    SELECT o_orderkey, st, (NULLIF(o_orderstatus, 'P') IS NOT NULL) AS not_p
    FROM (SELECT o_orderkey, o_orderstatus, NULLIF(o_orderstatus, 'O') AS st
          FROM orders)
    WHERE st IS NOT NULL
    """,
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL — fixtures are null-free, so nulls come from NULLIF."""
    o = load_table(spark, sf_dir, "orders")
    st = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return (
        o.select(
            "o_orderkey",
            st.alias("st"),
            F.nullif(F.col("o_orderstatus"), F.lit("P")).isNotNull().alias("not_p"),
        )
        .filter(F.col("st").isNotNull())
    )


@query(
    "filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE (p_name LIKE '%gear%' OR p_name LIKE 'red %' OR p_name LIKE '%bolt')
      AND p_type LIKE '%M%'
    """,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        (
            F.col("p_name").like("%gear%")
            | F.col("p_name").startswith("red ")
            | F.col("p_name").endswith("bolt")
        )
        & F.col("p_type").like("%M%")
    ).select("p_partkey", "p_name", "p_type")


@query(
    "filter_bool",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
    FROM lineitem
    WHERE (l_returnflag = 'A' OR l_returnflag = 'R')
      AND NOT (l_linestatus = 'O')
      AND (l_quantity < 10.0 OR l_discount > 0.08)
    """,
)
def filter_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        ((F.col("l_returnflag") == "A") | (F.col("l_returnflag") == "R"))
        & ~(F.col("l_linestatus") == "O")
        & ((F.col("l_quantity") < 10.0) | (F.col("l_discount") > 0.08))
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")


@query(
    "project_case",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'high' END AS qty_tier,
           CASE WHEN l_extendedprice * (1 - l_discount) > 50000 THEN 'premium'
                ELSE 'standard' END AS price_band
    FROM lineitem
    """,
)
def project_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("high")
        .alias("qty_tier"),
        F.when(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) > 50000, "premium"
        )
        .otherwise("standard")
        .alias("price_band"),
    )


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = hash aggregate on all projected columns (map-side partial)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()
