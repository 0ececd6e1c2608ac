"""Differential parity: every SQL-oracle key, Spark vs DuckDB (driver mirror)."""

from __future__ import annotations

import pytest

from luxor_db_spark.registry import ORACLES, load_all_queries
from tests.conftest import assert_parity

load_all_queries()
SQL_KEYS = sorted(ORACLES)


@pytest.mark.parametrize("key", SQL_KEYS)
def test_oracle_parity(key, spark, duck, sf_dir):
    from luxor_db_spark.registry import QUERIES

    sdf = QUERIES[key](spark, sf_dir)
    assert_parity(sdf, duck, ORACLES[key], key=key)


def test_rows_only_keys_run(spark, sf_dir):
    """Keys without an oracle must still execute and return a stable schema."""
    from luxor_db_spark.registry import QUERIES

    for key in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[key](spark, sf_dir)
        n = df.count()
        assert n >= 0, key
        assert df.columns, key
