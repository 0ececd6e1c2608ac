"""LuxorEngine facade: the user-switching surface."""

from __future__ import annotations

import pytest

from luxor_db_spark.engine import LuxorEngine


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return LuxorEngine(spark, sf_dir)


def test_sql_over_views(eng):
    n = eng.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0].n
    assert n > 0


def test_table_and_run(eng):
    assert eng.table("orders").count() > 0
    df = eng.run("agg_hash")
    assert df.count() > 0


def test_keys_and_oracles(eng):
    keys = eng.keys()
    assert "flagship_q1" in keys and len(keys) >= 110
    assert eng.oracle("agg_hash") is not None
    assert eng.oracle("sink_parquet") is None


def test_unknown_key_raises(eng):
    with pytest.raises(KeyError):
        eng.run("not_a_key")


def test_stream_events_is_streaming(eng):
    assert eng.stream_events().isStreaming


def test_schema_and_explain(eng):
    s = eng.schema("lineitem")
    assert "l_orderkey" in s.fieldNames()
    audit = eng.explain("scan_filtered")
    assert audit.pushed_filters, "explain() should surface pushed filters"


def test_no_oracle_key_emits_array_or_map(spark, sf_dir):
    """Driver-comparator contract: SQL-oracle keys must emit flat scalar
    columns only. The driver canonicalizes results via a pandas sort, and
    pandas cannot factorize numpy-array cells — r2's agg_approx_percentile
    and r3's llm_embed_norm/llm_embed_quantize both crashed the driver this
    way (`TypeError: unhashable type: 'numpy.ndarray'`). Explode arrays to
    long rows (llm_centroids pattern) or array_join to a string
    (agg_collect pattern) instead. Rows-only keys (no oracle) are exempt:
    the driver never canonicalizes them."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from luxor_db_spark.registry import ORACLES, load_all_queries

    queries = load_all_queries()
    offenders = []
    for key in sorted(ORACLES):
        df = queries[key](spark, sf_dir)  # lazy: schema only, no execution
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{key}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, (
        "SQL-oracle keys returning driver-unhashable column types "
        f"(explode to long form or array_join them): {offenders}"
    )


def test_doc_counts_match_registry():
    """README.md and SURVEY.md state registry totals ("N operator keys
    (M with ... SQL oracles)" / "N keys, M SQL oracles"); round-3 ADVICE
    flagged them drifting three ways. Pin both to registry.py so any growth
    in the registry forces the docs update in the same commit."""
    import re
    from pathlib import Path

    from luxor_db_spark.registry import ORACLES, load_all_queries

    n_keys = len(load_all_queries())
    n_oracles = len(ORACLES)
    root = Path(__file__).resolve().parent.parent

    readme = (root / "README.md").read_text()
    m = re.search(r"(\d+) operator keys \((\d+) with", readme)
    assert m, "README.md lost its registry-totals sentence"
    assert (int(m.group(1)), int(m.group(2))) == (n_keys, n_oracles), (
        f"README.md says {m.group(1)}/{m.group(2)} but registry has "
        f"{n_keys} keys / {n_oracles} oracles — update README.md"
    )

    survey = (root / "SURVEY.md").read_text()
    m = re.search(r"\*\*(\d+) keys, (\d+) SQL oracles\*\*", survey)
    assert m, "SURVEY.md lost its registry-totals sentence"
    assert (int(m.group(1)), int(m.group(2))) == (n_keys, n_oracles), (
        f"SURVEY.md says {m.group(1)}/{m.group(2)} but registry has "
        f"{n_keys} keys / {n_oracles} oracles — update SURVEY.md"
    )


def test_driver_window_prioritizes_oldest_unchecked_keys():
    """Never-driver-checked keys that have been waiting since earlier
    rounds must head the ~50-key driver window; keys added in the current
    round queue BEHIND them (otherwise each round's new operators would
    starve the oldest unchecked keys out of the window forever)."""
    from luxor_db_spark.driver_coverage import (
        _LATE_FRESH,
        DRIVER_CHECKED,
        coverage_order,
    )
    from luxor_db_spark.registry import load_all_queries

    keys = list(load_all_queries())
    ordered = coverage_order(keys)
    fresh = [k for k in ordered if k not in DRIVER_CHECKED]
    seen_late = False
    for k in fresh:
        if k in _LATE_FRESH:
            seen_late = True
        else:
            assert not seen_late, (
                f"old unchecked key {k!r} ordered after a current-round "
                f"addition — it would be pushed out of the driver window"
            )
    # Green keys still rotate to the back, staleness-first.
    checked = [k for k in ordered if k in DRIVER_CHECKED]
    assert ordered[: len(fresh)] == fresh and ordered[len(fresh):] == checked
