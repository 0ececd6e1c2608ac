"""Exact, engine-portable float aggregation (hash-match contract).

Why: Spark's ``round()`` rounds the shortest-decimal repr HALF_UP (JVM
BigDecimal), DuckDB's ``ROUND`` multiplies by 10^s and rounds the *binary*
value — they disagree whenever the true value sits exactly on a rounding tie
(e.g. ``17947.60995`` → 17947.61 vs 17947.6099). Fixture money columns carry
2 decimals, so products carry ≤6 decimals and ties at ROUND(·,4) are common.

Portable rules used by every oracle-checked query:

1. **Per-row arithmetic: no rounding.** Identical expression shape → identical
   IEEE-754 doubles in both engines → identical hashes.
2. **SUM of fixed-decimal data: accumulate in DECIMAL(18,6), cast once to
   double.** Decimal addition is exact and order/partitioning-independent, so
   the final double is bit-identical regardless of parallelism — the property
   that also makes results stable between local[32] and a 1000-executor run.
3. **AVG: decimal sum ÷ count.** Avoids Spark/DuckDB AVG accumulation-order
   differences AND rounding ties (e.g. avg 123.45/8 = 15.43125 is a tie).
4. **Order-dependent statistics (stddev/corr/covar): ROUND(·,4).** True values
   are irrational-ish; tie probability is negligible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dsum(c: Column) -> Column:
    """Exact sum of a fixed-decimal-valued double column → double."""
    return F.sum(c.cast(DEC)).cast("double")


def davg(c: Column) -> Column:
    """Exact-sum average (null-skipping, like AVG) → double."""
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def dsum_sql(expr: str) -> str:
    """Oracle-side twin of :func:`dsum` (valid Spark SQL and DuckDB SQL)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    """Oracle-side twin of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) / COUNT({expr})"


def q4(c: Column) -> Column:
    """Tie-free 4-decimal report of a RATIONAL-valued double.

    ``ROUND(x, 4)`` diverges between engines whenever x's decimal repr
    sits on a rounding tie — and ratios of counts or 2-decimal money
    (n/total, Δv/v, Σrank·x/(n·Σx)) land on ties routinely because their
    denominators divide powers of 10 (llm_embed_norm hash-mismatched
    three driver rounds this way). ``FLOOR(x·10⁴ + 0.5)/10⁴`` is the
    identical IEEE-754 expression in both engines: same double in, same
    double out, no dialect-specific half-tie rule. Use for every
    hash-compared per-row ratio; plain ROUND stays fine for
    irrational-valued statistics (stddev/corr/log/sqrt outputs)."""
    return F.floor(c * 10000 + F.lit(0.5)) / 10000


def q4_sql(expr: str) -> str:
    """Oracle-side twin of :func:`q4` (valid Spark SQL and DuckDB SQL)."""
    return f"FLOOR(({expr}) * 10000 + 0.5) / 10000"
