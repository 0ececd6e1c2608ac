"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``luxor_db_spark`` (SURVEY.md §2 is the key
inventory; ``luxor_db_spark/registry.py`` holds the key → query/oracle
mapping).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from luxor_db_spark.driver_coverage import coverage_order
from luxor_db_spark.registry import ORACLES, load_all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7.2) on /root/testdata/sf0.001."""
    from luxor_db_spark.operators.aggregates import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator key from SURVEY.md §2.

    Ordered never-driver-checked-first (see ``driver_coverage``) so the
    driver's ~50-key-per-round correctness window rotates through the whole
    registry across rounds.
    """
    q = load_all_queries()
    return {k: q[k] for k in coverage_order(list(q))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-checkable key."""
    load_all_queries()
    return dict(ORACLES)
