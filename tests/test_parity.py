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


@pytest.mark.parametrize("key", ["llm_embed_norm", "llm_embed_quantize"])
def test_embed_keys_parity_at_sf01(key, spark):
    """Rounding/frame bugs can be invisible at sf0.001 (SURVEY §4c.10):
    llm_embed_norm hash-mismatched for three driver rounds on rounding
    ties the small fixture never hit. Pin both embed keys at sf0.1
    regardless of the suite's default scale factor."""
    import os

    import duckdb

    from luxor_db_spark.catalog import table_path
    from luxor_db_spark.registry import QUERIES
    from tests.conftest import SF_DIR

    # Sibling sf0.1 of whatever fixture root the suite is pointed at, so
    # a relocated LUXOR_TEST_SF_DIR still exercises the pin (and a truly
    # absent sf0.1 is a visible skip, not a silent one).
    sf01 = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.1")
    if not os.path.isdir(sf01):
        pytest.skip(f"sf0.1 fixtures not present at {sf01}")
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{table_path(sf01, 'embeddings')}')"
    )
    try:
        assert_parity(QUERIES[key](spark, sf01), con, ORACLES[key], key=key)
    finally:
        con.close()
