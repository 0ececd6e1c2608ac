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


# Canonical module order (mirrors SURVEY.md §2 categories). Registry
# dict order must NOT depend on who imported an operator module first:
# pytest collecting a test file that imports operators.llm at module
# level registers llm's keys before scans', silently reordering the
# driver-window rotation that `driver_coverage` derives from key order.
# `load_all_queries` therefore rebuilds QUERIES into this fixed order —
# identical to a fresh interpreter's natural registration order — no
# matter the import history of the current process.
_CANON_MODULES = (
    "luxor_db_spark.sources.multimodal",  # §2.1 (multimodal columns)
    "luxor_db_spark.sources.scans",  # §2.1
    "luxor_db_spark.operators.filters",  # §2.2
    "luxor_db_spark.operators.joins",  # §2.3
    "luxor_db_spark.operators.aggregates",  # §2.4
    "luxor_db_spark.operators.windows",  # §2.5
    "luxor_db_spark.operators.timeseries",  # §2.5 ext
    "luxor_db_spark.operators.sorts",  # §2.6
    "luxor_db_spark.operators.setops",  # §2.7
    "luxor_db_spark.operators.subqueries",  # §3b entry 1
    "luxor_db_spark.operators.udfs",  # §2.10
    "luxor_db_spark.operators.llm",  # §2.11
    "luxor_db_spark.operators.workloads",  # composite reports
    "luxor_db_spark.operators.graph",  # graph analytics
    "luxor_db_spark.functions.scalar",  # §2.8
    "luxor_db_spark.streaming.streams",  # §2.9
)


def load_all_queries() -> dict[str, Callable]:
    """Import every operator module (side effect: registry population),
    then return the registry in CANONICAL key order (import-history-
    invariant — see `_CANON_MODULES`)."""
    global _LOADED
    if not _LOADED:
        import importlib

        for mod in _CANON_MODULES:
            importlib.import_module(mod)
        # Within one module, decorator execution is top-to-bottom file
        # order regardless of WHEN the module was first imported, so a
        # stable sort on module rank alone reproduces the fresh-
        # interpreter order exactly.
        rank = {m: i for i, m in enumerate(_CANON_MODULES)}
        # Fail LOUDLY on a registration from outside _CANON_MODULES
        # (r12 ADVICE #4): the silent fallback rank would quietly sort
        # such a key to the tail, diverging from the documented
        # fresh-interpreter order the driver window depends on.
        strays = {
            key: fn.__module__
            for key, fn in QUERIES.items()
            if fn.__module__ not in rank
        }
        assert not strays, (
            f"queries registered from modules outside "
            f"registry._CANON_MODULES (add the module to the canonical "
            f"list so driver-window ordering stays deterministic): "
            f"{strays}"
        )
        ordered = sorted(
            QUERIES.items(),
            key=lambda kv: rank.get(kv[1].__module__, len(rank)),
        )
        QUERIES.clear()
        QUERIES.update(ordered)
        _LOADED = True
    return QUERIES
