"""Driver-contract smoke tests for __spark_entry__."""

from __future__ import annotations

import importlib
import sys


def _entry_mod():
    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__spark_entry__")


def test_entry_flagship(spark):
    mod = _entry_mod()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base",
        "sum_disc",
        "sum_charge",
        "avg_qty",
        "n",
    }


def test_queries_oracle_keys_align():
    mod = _entry_mod()
    q = mod.queries()
    o = mod.oracle_sql()
    assert set(o) <= set(q), "every oracle key must have a query"
    assert len(q) > 0
