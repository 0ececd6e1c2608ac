"""Cross-engine result-type drift detection.

The driver's correctness gate canonicalizes both result sets through
pandas: DuckDB results via ``.df()`` (which converts DECIMAL/HUGEINT →
float64) and Spark rows via a collected frame (LongType → int64). A
Spark BIGINT ``69`` therefore renders ``'69'`` while a DuckDB
DECIMAL(38,0)/HUGEINT ``69`` renders ``'69.0'`` — a value hash mismatch
even though both engines computed the same number. DuckDB silently
widens integer aggregates (``SUM``/``list_aggregate('sum')`` over
INT/BIGINT → HUGEINT / DECIMAL(38,0)), so an oracle can look
value-identical locally yet fail at the driver — this shipped ``fn_map``
red in round 5.

The driver-fatal class is exactly INT-vs-(FLOAT|DECIMAL): one side
stays integer-rendered, the other becomes float-rendered.
DECIMAL-vs-DOUBLE is NOT fatal (both become float64 — ``udtf_python``
ran driver-green in r2 with a DECIMAL(7,1) oracle against a Spark
double), so it is not flagged.

Two complementary detectors (both needed):

- ``declared_class_drift`` compares the ENGINE-DECLARED column types
  (Spark schema vs the DuckDB result's Arrow schema). This is the
  load-bearing one: the Python ``fetchall()`` path converts HUGEINT back
  to ``int``, hiding the drift at the cell level, while Arrow faithfully
  reports ``decimal128(38, 0)``.
- ``numeric_class_drift`` compares Python cell classes on fetched rows —
  a belt-and-braces check for paths where values arrive as ``Decimal``
  objects.
"""

from __future__ import annotations

from decimal import Decimal

# Spark type-name prefixes → numeric class.
_SPARK_INT = ("byte", "short", "integer", "long")
_SPARK_FLOAT = ("float", "double")


def _fatal(a: set[str], b: set[str]) -> bool:
    """True iff one side is integer-class and the other float/decimal."""
    return ("i" in a and (b & {"f", "d"}) and "i" not in b) or (
        "i" in b and (a & {"f", "d"}) and "i" not in a
    )


def spark_type_classes(schema) -> dict[str, str]:
    """column -> 'i'/'f'/'d' for a pyspark StructType (top level only)."""
    out = {}
    for field in schema.fields:
        t = field.dataType.typeName()
        if t in _SPARK_INT:
            out[field.name] = "i"
        elif t in _SPARK_FLOAT:
            out[field.name] = "f"
        elif t.startswith("decimal"):
            out[field.name] = "d"
    return out


def arrow_type_classes(arrow_schema) -> dict[str, str]:
    """column -> 'i'/'f'/'d' for a pyarrow Schema (top level only)."""
    import pyarrow.types as pat

    out = {}
    for field in arrow_schema:
        t = field.type
        if pat.is_integer(t):
            out[field.name] = "i"
        elif pat.is_floating(t):
            out[field.name] = "f"
        elif pat.is_decimal(t):
            out[field.name] = "d"
    return out


def declared_class_drift(spark_schema, arrow_schema) -> list[str]:
    """Driver-fatal numeric type drift between the engines' DECLARED
    result schemas: integer on one side, float/decimal on the other.

    This sees what ``fetchall()`` hides: DuckDB reports HUGEINT /
    DECIMAL(38,0) through Arrow even though the Python cells arrive as
    plain ``int`` — and it is the declared type that decides the pandas
    dtype (hence the rendered text) at the driver.
    """
    s = spark_type_classes(spark_schema)
    d = arrow_type_classes(arrow_schema)
    bad = []
    for c in sorted(set(s) & set(d)):
        if _fatal({s[c]}, {d[c]}):
            bad.append(f"{c}: spark={s[c]} oracle={d[c]}")
    return bad


def _num_class(v) -> str | None:
    """Numeric class of one cell: 'i' int, 'f' float, 'd' Decimal.

    Bools are not ints here (both engines agree on bool); non-numerics
    return None and never participate in drift."""
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, int):
        return "i"
    if isinstance(v, float):
        return "f"
    if isinstance(v, Decimal):
        return "d"
    try:  # numpy scalars, if rows came through pandas
        import numpy as np

        if isinstance(v, np.integer):
            return "i"
        if isinstance(v, np.floating):
            return "f"
    except ImportError:  # pragma: no cover
        pass
    return None


def _col_classes(cols: list[str], rows: list[tuple], sample: int) -> dict:
    out: dict[str, set] = {c: set() for c in cols}
    for r in rows[:sample]:
        for c, v in zip(cols, r):
            k = _num_class(v)
            if k is not None:
                out[c].add(k)
    return out


def numeric_class_drift(
    s_cols: list[str],
    s_rows: list[tuple],
    d_cols: list[str],
    d_rows: list[tuple],
    sample: int = 200,
) -> list[str]:
    """Columns whose fetched CELLS are integer-class on one engine and
    float/decimal-class on the other — the rendered-text mismatch the
    driver's hash rejects. float-vs-Decimal is never drift (both render
    float at the driver); all-null/empty columns are never drift.
    """
    sc = _col_classes(s_cols, s_rows, sample)
    dc = _col_classes(d_cols, d_rows, sample)
    bad = []
    for c in sorted(set(sc) & set(dc)):
        a, b = sc[c], dc[c]
        if not a or not b:
            continue
        if _fatal(a, b):
            bad.append(f"{c}: spark={sorted(a)} oracle={sorted(b)}")
    return bad


# --- canonicalization shared by the CI comparator and the sweep tools ---
# Single source of truth: tests/conftest.assert_parity, tests/
# test_invariance.py, and tools/invariance_sweep.py all canonicalize
# through these, so "mismatch" means the same thing in CI and in the
# registry-wide sweeps (a drifted copy would let a clean sweep stop
# implying the CI invariant).


def canon_cell(v) -> str:
    """Canonical string form of one cell, robust to engine type quirks."""
    import math
    from datetime import date, datetime
    from decimal import Decimal

    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        # round to 6 decimals to absorb sub-round() representation noise;
        # queries themselves already ROUND(·,4) computed floats.
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, Decimal):
        return canon_cell(float(v))
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{" + ",".join(f"{k}:{canon_cell(x)}" for k, x in sorted(v.items())) + "}"
        )
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize cells, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


# Planner perturbations under which every result must be invariant
# (SURVEY §5b.6). tests/test_invariance.py runs all of them on the
# plan-sensitive key set per commit; tools/invariance_sweep.py runs the
# three cheap ones registry-wide.
PLANNER_PERTURBATIONS: dict[str, dict[str, str]] = {
    "aqe_off": {"spark.sql.adaptive.enabled": "false"},
    "no_autobroadcast": {"spark.sql.autoBroadcastJoinThreshold": "-1"},
    "npart_1": {"spark.sql.shuffle.partitions": "1"},
    "npart_3": {"spark.sql.shuffle.partitions": "3"},
    "npart_37": {"spark.sql.shuffle.partitions": "37"},
}
