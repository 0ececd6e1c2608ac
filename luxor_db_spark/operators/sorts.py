"""§2.6 Sorts / limits / top-k (SURVEY.md).

Reference status: absent (reference ``Main.java:1-7`` only).

Determinism contract: every total order ends in a unique key so LIMIT/OFFSET
select the same row *set* in both engines (the driver's hash is
order-insensitive, but the selected set must match).

Scale notes: global ORDER BY is a range-exchange (sampled range partitioning)
— fine for report-sized output; ORDER BY+LIMIT k is rewritten by Catalyst to
TakeOrderedAndProject (per-partition top-k, then k-way merge on the driver),
which never materializes a full sort at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from luxor_db_spark.catalog import load_table
from luxor_db_spark.registry import query


@query(
    "sort_multi",
    oracle="""
    SELECT c_custkey, seg, c_acctbal
    FROM (SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg, c_acctbal
          FROM customer)
    ORDER BY seg ASC NULLS LAST, c_acctbal DESC, c_custkey ASC
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit NULLS LAST (Spark's ASC default is
    NULLS FIRST, DuckDB's is NULLS LAST — §4c.1)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
        "c_acctbal",
    ).orderBy(
        F.col("seg").asc_nulls_last(),
        F.col("c_acctbal").desc(),
        F.col("c_custkey").asc(),
    )


@query(
    "limit_n",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
    """,
)
def limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


@query(
    "topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC LIMIT 10
    """,
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (no full sort; verify in plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(10)
    )


@query(
    "offset_page",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
    ORDER BY o_orderkey ASC LIMIT 25 OFFSET 100
    """,
)
def offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pagination: total order on the unique key, then
    offset+limit (Spark 4 supports DataFrame.offset)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy(F.col("o_orderkey").asc())
        .offset(100)
        .limit(25)
    )
