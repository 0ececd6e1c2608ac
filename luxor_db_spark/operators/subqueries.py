"""Subqueries & CTEs: the SQL-string entry point (SURVEY.md §3b entry 1).

Reference status: absent (reference ``Main.java:1-7`` only).

These keys deliberately go through ``spark.sql`` over registered views —
same Catalyst IR as the DataFrame keys — to exercise the rewrites that only
fire on subquery shapes: ``RewriteCorrelatedScalarSubquery`` turns the
correlated scalar into an aggregate + join (no per-row re-execution);
correlated EXISTS becomes a left-semi join; the recursive CTE (Spark 4)
executes as an iterative union with a fixed-point loop driver-side, each
iteration a distributed step.

The SQL text is dialect-shared: every statement here runs verbatim on both
Spark and DuckDB, so the oracle IS the query — zero translation risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from luxor_db_spark.catalog import register_views
from luxor_db_spark.registry import query

# Exact-average comparison: decimal-accumulated sum / count (see
# functions/exact.py) so the subquery boundary doesn't flip membership on a
# last-ulp AVG difference between engines.
_SUB_SCALAR_SQL = """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o
WHERE o.o_totalprice >
      1.5 * (SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*)
             FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
"""

_SUB_EXISTS_SQL = """
SELECT o.o_orderkey, o.o_orderpriority
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49.5)
"""

_CTE_RECURSIVE_SQL = """
WITH RECURSIVE fib(n, a, b) AS (
  SELECT 1, CAST(0 AS BIGINT), CAST(1 AS BIGINT)
  UNION ALL
  SELECT n + 1, b, a + b FROM fib WHERE n < 40
)
SELECT n, a AS fib_n FROM fib
"""


@query("sub_scalar", oracle=_SUB_SCALAR_SQL)
def sub_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders 1.5× above their customer's
    average. Catalyst decorrelates to one aggregate + one equi-join —
    verify: the plan contains a single HashAggregate over orders, never a
    per-row subquery loop."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(_SUB_SCALAR_SQL)


@query("sub_exists", oracle=_SUB_EXISTS_SQL)
def sub_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS → left-semi join after decorrelation (the SQL twin
    of `join_semi`, arriving via the subquery rewrite path instead)."""
    register_views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_SUB_EXISTS_SQL)


@query("cte_recursive", oracle=_CTE_RECURSIVE_SQL)
def cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 / DuckDB shared syntax): 40 Fibonacci steps.

    Each iteration is a distributed union step with a driver-side
    fixed-point check — bounded depth, bounded state, no driver data
    materialization beyond the stop condition.
    """
    register_views(spark, sf_dir)
    return spark.sql(_CTE_RECURSIVE_SQL)


_SUB_LATERAL_SQL = """
SELECT o.o_orderkey, o.o_totalprice, li.n_items, li.max_qty
FROM orders o, LATERAL (
  SELECT COUNT(*) AS n_items, MAX(l.l_quantity) AS max_qty
  FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
) li
WHERE o.o_orderkey < 1000
"""


@query("sub_lateral", oracle=_SUB_LATERAL_SQL)
def sub_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (shared Spark/DuckDB syntax): per-order
    lineitem stats as a derived table. Catalyst decorrelates to an
    aggregate + equi-join — same plan as writing the join by hand, but the
    query reads as 'for each row, compute...'"""
    register_views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_SUB_LATERAL_SQL)


# DuckDB side: native quantified comparisons. Spark side (below): Spark SQL
# has no ANY/ALL comparison subqueries, so the operator IS the standard
# rewrite — correlated `>= ALL` becomes a per-group MAX join, uncorrelated
# `= ANY` becomes IN. Same semantics, engine-appropriate plan.
_SUB_ANY_ALL_ORACLE = """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o
WHERE o.o_totalprice >= ALL (SELECT o2.o_totalprice FROM orders o2
                             WHERE o2.o_custkey = o.o_custkey)
  AND o.o_custkey = ANY (SELECT c.c_custkey FROM customer c
                         WHERE c.c_acctbal > 0)
"""

_SUB_ANY_ALL_SPARK = """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o
JOIN (SELECT o_custkey, MAX(o_totalprice) AS mx
      FROM orders GROUP BY o_custkey) m
  ON o.o_custkey = m.o_custkey AND o.o_totalprice >= m.mx
WHERE o.o_custkey IN (SELECT c.c_custkey FROM customer c
                      WHERE c.c_acctbal > 0)
"""


@query("sub_any_all", oracle=_SUB_ANY_ALL_ORACLE)
def sub_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparison subqueries (ANY/ALL): each positive-balance
    customer's maximal order(s). Spark SQL has no ANY/ALL syntax, so the
    implementation is the canonical rewrite — correlated `>= ALL` as a
    per-customer MAX aggregate joined back (one shuffle on the customer
    grain), `= ANY` as IN → left-semi join. The comparison is against the
    group's own MAX, so the float equality at the boundary is exact in both
    engines (the max is one of the compared values, bit-identical)."""
    register_views(spark, sf_dir, "orders", "customer")
    return spark.sql(_SUB_ANY_ALL_SPARK)


_NOT_IN_SQL = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
)
ORDER BY c_custkey
"""


@query("sub_not_in_nulls", oracle=_NOT_IN_SQL)
def sub_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with a subquery — the three-valued-logic landmine: if the
    subquery produced a NULL, standard SQL makes the whole NOT IN yield
    UNKNOWN (empty result). Both engines implement this via a null-aware
    anti-join (Spark: NULL-aware single-column NAAJ), NOT a plain
    anti-join; this key pins that semantic on shared SQL text, so a naive
    left_anti rewrite (which keeps rows a NULL should eliminate) would
    hash-mismatch.

    Scale shape: a null-aware anti-join broadcasts the build side's
    null-flag + key set; same cost class as a semi-join. When the build
    side is known null-free, prefer NOT EXISTS (plain anti-join,
    cheaper) — `sub_exists` shows that path.
    """
    register_views(spark, sf_dir, "orders", "customer")
    return spark.sql(_NOT_IN_SQL)
