"""luxor-db-spark: a PySpark-native analytics engine.

A from-scratch reimplementation of the *capability surface* of
houthacker/luxor-db (reference @ 2025-03-10 — an empty Gradle scaffold, see
SURVEY.md §0; the target surface is SURVEY.md §2) expressed Spark-first:
DataFrame/SQL plans optimized by Catalyst, Structured Streaming for streams,
Arrow-vectorized Pandas UDFs only where built-ins can't express semantics.

Public API:
    get_spark()            -- tuned local SparkSession factory
    load_table / tables    -- Parquet catalog over a scale-factor dir
    QUERIES / ORACLES      -- operator-key registry (SURVEY.md §2 contract)
"""

from luxor_db_spark.session import get_spark
from luxor_db_spark.catalog import TABLES, load_table, register_views, tables
from luxor_db_spark.registry import ORACLES, QUERIES, load_all_queries

__all__ = [
    "get_spark",
    "TABLES",
    "load_table",
    "tables",
    "register_views",
    "QUERIES",
    "ORACLES",
    "load_all_queries",
]

__version__ = "0.1.0"
