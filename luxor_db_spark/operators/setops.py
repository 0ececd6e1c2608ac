"""§2.7 Set operations (SURVEY.md).

Reference status: absent (reference ``Main.java:1-7`` only).

The two input multisets: supplier keys of high-quantity 'A'-returned vs
'R'-returned lineitems — genuinely bag-valued (suppliers repeat), so the
ALL variants exercise real multiplicity arithmetic.

Scale notes: UNION ALL is a zero-shuffle concatenation; the distinct/
INTERSECT/EXCEPT family hash-shuffles on the full row — at 100 TB prefer
pre-aggregated forms (count-by-key + join) when rows are wide; these keys
keep rows narrow (one bigint) by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from luxor_db_spark.catalog import load_table
from luxor_db_spark.registry import query

_A_SQL = "SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A' AND l_quantity > 40.0"
_R_SQL = "SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 40.0"


def _sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter((F.col("l_returnflag") == "A") & (F.col("l_quantity") > 40.0))
    r = li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 40.0))
    return a.select("l_suppkey"), r.select("l_suppkey")


@query("set_union_all", oracle=f"{_A_SQL} UNION ALL {_R_SQL}")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, r = _sides(spark, sf_dir)
    return a.unionAll(r)


@query("set_union", oracle=f"{_A_SQL} UNION {_R_SQL}")
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, r = _sides(spark, sf_dir)
    return a.union(r).distinct()


@query("set_intersect", oracle=f"{_A_SQL} INTERSECT {_R_SQL}")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, r = _sides(spark, sf_dir)
    return a.intersect(r)


@query("set_except", oracle=f"{_A_SQL} EXCEPT {_R_SQL}")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, r = _sides(spark, sf_dir)
    return a.subtract(r)


@query("set_intersect_all", oracle=f"{_A_SQL} INTERSECT ALL {_R_SQL}")
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection: multiplicity = min(count_A, count_R) per value."""
    a, r = _sides(spark, sf_dir)
    return a.intersectAll(r)


@query("set_except_all", oracle=f"{_A_SQL} EXCEPT ALL {_R_SQL}")
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference: multiplicity = max(0, count_A - count_R) per value."""
    a, r = _sides(spark, sf_dir)
    return a.exceptAll(r)


@query(
    "set_union_by_name",
    oracle="""
    SELECT c_custkey AS id, c_name AS name, c_acctbal AS bal, NULL AS region
    FROM customer WHERE c_custkey < 100
    UNION ALL
    SELECT s_suppkey AS id, s_name AS name, NULL AS bal, 'from_supplier' AS region
    FROM supplier
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: unionByName(allowMissingColumns=True) aligns
    by column NAME and null-fills what either side lacks — how batches
    with drifting schemas append into one table (positional unionAll would
    silently mis-align)."""
    from luxor_db_spark.catalog import load_table

    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 100)
        .select(
            F.col("c_custkey").alias("id"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("bal"),
        )
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"),
        F.col("s_name").alias("name"),
        F.lit("from_supplier").alias("region"),
    )
    return c.unionByName(s, allowMissingColumns=True)
