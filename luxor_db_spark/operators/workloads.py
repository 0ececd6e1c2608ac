"""Composite analytical workloads (TPC-H-shaped, adapted to the fixture
schema) — end-to-end compositions of scan/filter/join/agg/window/sort that
exercise the operator families together the way real reports do.

Reference status: absent (reference ``Main.java:1-7`` only); shapes follow
the public TPC-H specification's query intents (Q3 shipping priority,
Q10 returned-item revenue, Q18 large-volume customers), simplified to the
fixture columns (FIXTURES.md).

Scale shape of all three: lineitem joins orders on the shuffle; customer
joins the orders side (smaller after filters); aggregates are
partial+final; the final ORDER BY + LIMIT is TakeOrdered (no global sort
materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from luxor_db_spark.catalog import tables
from luxor_db_spark.functions.exact import dsum, dsum_sql
from luxor_db_spark.registry import query

_REV = "l_extendedprice * (1 - l_discount)"


@query(
    "query_q3",
    oracle=f"""
    SELECT l_orderkey, {dsum_sql(_REV)} AS revenue, o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-01'
      AND l_shipdate > TIMESTAMP '1997-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def query_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping-priority shape: segment filter → 3-way join → revenue
    agg → top-10. Filters reach both Parquet scans before the join."""
    t = tables(spark, sf_dir, "customer", "orders", "lineitem")
    c = t.customer.filter(F.col("c_mktsegment") == "BUILDING")
    o = t.orders.filter(F.col("o_orderdate") < F.lit("1997-06-01").cast("timestamp"))
    li = t.lineitem.filter(
        F.col("l_shipdate") > F.lit("1997-06-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.expr(_REV)).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(
            F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey")
        )
        .limit(10)
    )


@query(
    "query_q10",
    oracle=f"""
    SELECT c_custkey, c_name, {dsum_sql(_REV)} AS revenue, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def query_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item revenue shape: who returned the most value in a
    half-year window. Nation broadcasts; returnflag filter prunes lineitem
    at the scan."""
    t = tables(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    o = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = t.lineitem.filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(t.customer, o.o_custkey == t.customer.c_custkey)
        .join(
            F.broadcast(t.nation),
            t.customer.c_nationkey == t.nation.n_nationkey,
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.expr(_REV)).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "query_q18",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
    FROM (
      SELECT l_orderkey, {dsum_sql('l_quantity')} AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING {dsum_sql('l_quantity')} > 150
    ) big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def query_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume-customer shape: pre-aggregate lineitem per order
    (HAVING prunes before any join — the aggregate-then-join order is the
    scale win: the join sees orders, not line items)."""
    t = tables(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(t.orders, big.l_orderkey == t.orders.o_orderkey)
        .join(t.customer, t.orders.o_custkey == t.customer.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "query_q7",
    oracle=f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
           {dsum_sql(_REV)} AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name IN ('CHINA', 'FRANCE') AND sn.n_name IN ('CHINA', 'FRANCE')
      AND cn.n_name <> sn.n_name
    GROUP BY cn.n_name, sn.n_name, ship_year
    """,
)
def query_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume-shipping shape: revenue between two nation pairs by year —
    the two independent dimension paths (customer-nation via orders,
    supplier-nation via lineitem) that force a plan to keep both lookup
    chains broadcast while the fact table shuffles once."""
    from pyspark.sql.functions import broadcast as bc

    t = tables(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    cn = t.nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("CHINA", "FRANCE"))
    sn = t.nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("CHINA", "FRANCE"))
    j = (
        t.lineitem.join(t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey)
        .join(t.customer, t.orders.o_custkey == t.customer.c_custkey)
        .join(bc(cn), t.customer.c_nationkey == F.col("cn_key"))
        .join(t.supplier, t.lineitem.l_suppkey == t.supplier.s_suppkey)
        .join(bc(sn), t.supplier.s_nationkey == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
    )
    return (
        j.groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(dsum(F.expr(_REV)).alias("volume"))
    )


@query(
    "query_q6",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def query_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecasting-revenue shape: the pure scan benchmark — every
    predicate pushes to Parquet (row-group min/max skipping does the heavy
    lifting), then a single global aggregate. The query whose runtime IS
    scan throughput."""
    t = tables(spark, sf_dir, "lineitem")
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )
