"""Parquet catalog: the 10 fixture tables over a scale-factor directory.

Tables (FIXTURES.md): region nation customer supplier part orders lineitem
events documents embeddings — one Parquet file each under ``{sf_dir}/``.

Every load goes through :func:`load_table`, which re-applies the
correctness-critical runtime confs (UTC timezone, AQE, Arrow) so queries are
correct even on a SparkSession the driver built itself.
"""

from __future__ import annotations

import os
from types import SimpleNamespace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType

from luxor_db_spark.session import configure

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Lazy: only the Parquet footer is touched."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    configure(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and isinstance(
        df.schema["ts"].dataType, LongType
    ):
        # Older fixture generations wrote ts as timestamp[ns], which the
        # nanosAsLong conf surfaces as raw nanos (LongType); truncate to µs
        # exactly like DuckDB's ns→µs read of the same file. Current
        # fixtures write timestamp[us] directly (TIMESTAMP_NTZ) — no
        # conversion needed. Schema-sniffing the footer keeps both
        # generations loadable.
        from pyspark.sql import functions as F

        # Integer `div` (not `/`): ns-since-epoch ≈ 1.7e18 exceeds double's
        # 2^53 exact-integer range, so float division would corrupt the µs.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def tables(spark: SparkSession, sf_dir: str, *names: str) -> SimpleNamespace:
    """Load several tables at once: ``t = tables(spark, sf, 'orders', ...)``."""
    wanted = names or TABLES
    return SimpleNamespace(**{n: load_table(spark, sf_dir, n) for n in wanted})


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views (used by SQL-entry queries, e.g. GROUPING SETS)."""
    for n in names or TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
