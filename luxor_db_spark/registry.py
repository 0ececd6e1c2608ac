"""Operator-key registry: the SURVEY.md §2 contract.

Each operator key registers a Spark callable ``fn(spark, sf_dir) -> DataFrame``
and, when the semantics are ANSI-SQL-expressible, the equivalent DuckDB oracle
SQL. ``__spark_entry__.queries()/oracle_sql()`` read these dicts verbatim, and
``tests/test_parity.py`` runs the same differential check locally that the
driver runs at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[[Any, str], Any]] = {}
ORACLES: dict[str, str] = {}

_LOADED = False


def query(key: str, oracle: str | None = None):
    """Decorator: register ``fn`` under ``key`` with optional oracle SQL.

    ``oracle=None`` marks a rows-only key (non-SQL-expressible semantics:
    sinks, approx sketches, streaming-only behavior — SURVEY.md §2 'rows').
    """

    def deco(fn):
        if key in QUERIES:
            raise ValueError(f"duplicate operator key {key!r}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = " ".join(oracle.split())
        fn.__query_key__ = key
        return fn

    return deco


def load_all_queries() -> dict[str, Callable]:
    """Import every operator module (side effect: registry population)."""
    global _LOADED
    if not _LOADED:
        # Import order mirrors SURVEY.md §2 categories.
        from luxor_db_spark.sources import multimodal, scans  # noqa: F401  (§2.1)
        from luxor_db_spark.operators import (  # noqa: F401
            filters,  # §2.2
            joins,  # §2.3
            aggregates,  # §2.4
            windows,  # §2.5
            timeseries,  # §2.5 extension: retention/streak/anomaly/interp
            sorts,  # §2.6
            setops,  # §2.7
            subqueries,  # §3b entry 1: SQL-path subqueries/CTEs
            udfs,  # §2.10
            llm,  # §2.11
            workloads,  # composite TPC-H-shaped reports
            graph,  # graph analytics derived from relational facts
        )
        from luxor_db_spark.functions import scalar  # noqa: F401  (§2.8)
        from luxor_db_spark.streaming import streams  # noqa: F401  (§2.9)

        _LOADED = True
    return QUERIES
