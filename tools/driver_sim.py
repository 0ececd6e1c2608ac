#!/usr/bin/env python
"""Pre-flight simulator for the driver's CORRECTNESS check.

Reproduces the driver's environment as closely as its observed behavior
allows (CORRECTNESS_r01..r04 + error tracebacks):

- a VANILLA SparkSession (no engine tuning beyond what the driver itself
  would do) — ``__spark_entry__``'s own ``configure``-on-load must supply
  every correctness-critical conf, exactly as in a real round;
- sf0.01 fixtures, DuckDB views named after the tables;
- pandas-based canonicalization: results go through a DataFrame whose rows
  are sorted over ALL columns — this is what crashes on
  array/map/binary cells (r4: ``unhashable type: 'numpy.ndarray'``), so the
  sim fails on exactly the shapes the driver fails on;
- order-insensitive value compare with float quantization.

Usage:
    python tools/driver_sim.py key1 key2 ...   # specific keys
    python tools/driver_sim.py --window        # predicted ~50-key window
    python tools/driver_sim.py --all           # every registered key
    python tools/driver_sim.py --all --ledger r10   # + persist per-key secs

Prints one JSON line per key and a final summary line.

``--ledger LABEL`` (r9 verdict ask #7): the bench covers only ~50 headline
keys, so a regression on a non-headline key (like the r7→r9 five-key drift)
surfaces only if someone happens to look. This flag persists every key's
wall seconds into ``docs/registry_timings.json`` under LABEL (one column
per round) so ``tools/timing_diff.py`` can diff rounds over the FULL
registry automatically. Timings are sf0.01/vanilla-session — coarser than
bench but uniform across all 259 keys, which is what a drift tripwire
needs.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

SF_DIR = os.environ.get("LUXOR_SIM_SF_DIR", "/root/testdata/sf0.01")


def _vanilla_spark():
    """A session the DRIVER might build: no engine confs, default shuffle
    partitions. local[8] keeps the sim conservative (less parallelism than
    the engine's own tuned sessions)."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName("driver-sim")
        .master(os.environ.get("LUXOR_SIM_MASTER", "local[8]"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _canon_frame(cols: list[str], rows: list[tuple]) -> pd.DataFrame:
    """Driver-style canonicalization: pandas frame, columns sorted by name,
    rows sorted over all columns. Sorting (not hashing) — but pandas sort
    raises on unhashable/ambiguous cells the same way the driver's
    canonicalizer does, which is the crash class we must reproduce."""
    df = pd.DataFrame(rows, columns=cols)
    df = df[sorted(df.columns)]
    # The driver's traceback shows pandas factorize/_unique — exercised by
    # drop_duplicates; run it to trigger the unhashable-cell class.
    df.drop_duplicates()
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "∅"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v == 0.0:
            v = 0.0
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, Decimal):
        return _canon_cell(float(v))
    if isinstance(v, pd.Timestamp):
        # DuckDB's .df() renders DATE as midnight Timestamp; normalize both
        # engines to the same text (r5 pre-flight: ts_wow_change false alarm).
        v = v.to_pydatetime()
    if isinstance(v, datetime):
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    return str(v)


def check_key(key, fn, oracle_sql, spark, con) -> dict:
    t0 = time.monotonic()
    out: dict = {"key": key}
    try:
        sdf = fn(spark, SF_DIR)
        s_cols = list(sdf.columns)
        s_rows = [tuple(r) for r in sdf.collect()]
        out["spark_rows"] = len(s_rows)
        cs = _canon_frame(s_cols, s_rows)
        if oracle_sql is None:
            out["status"] = "rows_only_clean"
            return out
        d = con.execute(oracle_sql)
        d_cols = [c[0] for c in d.description]
        d_rows = d.fetchall()
        out["oracle_rows"] = len(d_rows)
        cd = _canon_frame(d_cols, d_rows)
        out["rows_match"] = len(s_rows) == len(d_rows)
        out["schema_match"] = sorted(s_cols) == sorted(d_cols)
        # Typed-drift mirror (r5 blind spot): the driver's pandas
        # canonicalization renders DuckDB DECIMAL/HUGEINT as float64 but
        # Spark BIGINT as int64, so int-vs-float/decimal drift fails there
        # even when the quantized strings below collapse (fn_map r5).
        # fetchall() hides HUGEINT (returns int), so the oracle's declared
        # Arrow schema is compared as well. Flag it FAIL.
        from luxor_db_spark.parity import (
            declared_class_drift,
            numeric_class_drift,
        )

        drift = numeric_class_drift(s_cols, s_rows, d_cols, d_rows)
        try:
            arrow_schema = con.execute(oracle_sql).arrow().schema
        except Exception:  # noqa: BLE001
            arrow_schema = None
        if arrow_schema is not None:
            drift += declared_class_drift(sdf.schema, arrow_schema)
        drift = sorted(set(drift))
        if drift:
            out["dtype_drift"] = drift
        sv = [tuple(_canon_cell(c) for c in r) for r in cs.itertuples(index=False)]
        dv = [tuple(_canon_cell(c) for c in r) for r in cd.itertuples(index=False)]
        sv.sort()
        dv.sort()
        # hash_match reports ONLY value-hash equality; dtype drift gates
        # the status separately (r6 ADVICE: conflating them made the audit
        # JSON show hash_match=false when the canonical strings matched,
        # hiding which gate actually failed — dtype_drift is its own key).
        out["hash_match"] = sv == dv
        if (
            out["rows_match"]
            and out["schema_match"]
            and out["hash_match"]
            and not drift
        ):
            out["status"] = "pass"
        else:
            out["status"] = "FAIL"
            only_s = [r for r in sv if r not in set(dv)][:3]
            only_d = [r for r in dv if r not in set(sv)][:3]
            out["diff"] = {"spark_only": only_s, "duck_only": only_d}
    except Exception as e:  # noqa: BLE001 — the sim's job is to report
        out["status"] = "ERROR"
        out["err"] = f"{type(e).__name__}: {e}"[:500]
    finally:
        out["sec"] = round(time.monotonic() - t0, 2)
    return out


def _update_ledger(label: str, results: list[dict]) -> str:
    """Merge this sweep's per-key seconds into docs/registry_timings.json
    under ``label``. Idempotent per label (a re-run overwrites its own
    column, never another round's)."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "registry_timings.json",
    )
    try:
        with open(path) as fh:
            ledger = json.load(fh)
    except (OSError, json.JSONDecodeError):
        ledger = {}
    for r in results:
        ledger.setdefault(r["key"], {})[label] = r["sec"]
    with open(path, "w") as fh:
        json.dump(ledger, fh, indent=1, sort_keys=True)
        fh.write("\n")
    return path


def main(argv: list[str]) -> int:
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    ledger_label = None
    if "--ledger" in argv:
        i = argv.index("--ledger")
        if i + 1 >= len(argv) or argv[i + 1].startswith("-"):
            print("--ledger needs a label (e.g. r10)", file=sys.stderr)
            return 2
        ledger_label = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if "--window" in argv:
        from luxor_db_spark.driver_coverage import expected_window

        keys = expected_window(list(qs))
    elif "--all" in argv:
        # FIXED alphabetical order (not the round-varying coverage
        # order): the timing ledger diffs per-key seconds across rounds,
        # and a key's position in the sequential sweep sets how warm the
        # session is when it runs — with coverage order, every rotation
        # reshuffled positions and minted phantom ±2-4x "drift" on
        # sub-second keys (r10: fn_string "+415%" was purely its move
        # from late-suite to slot 2). Same-position ⇒ comparable.
        keys = sorted(qs)
    else:
        keys = [a for a in argv if not a.startswith("-")]
        unknown = [k for k in keys if k not in qs]
        if unknown or not keys:
            print(f"unknown or missing keys: {unknown}", file=sys.stderr)
            return 2
    spark = _vanilla_spark()
    if ledger_label is not None:
        # Warm the JVM/footers before the first TIMED key so slot-1
        # doesn't absorb session startup into its ledger column.
        try:
            qs[keys[0]](spark, SF_DIR).count()
        except Exception:  # noqa: BLE001 — warm-up must never gate
            pass
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    from luxor_db_spark.catalog import TABLES, table_path

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(SF_DIR, t)}')"
        )
    results = []
    for k in keys:
        r = check_key(k, qs[k], oracles.get(k), spark, con)
        results.append(r)
        print(json.dumps(r, default=str), flush=True)
    if ledger_label is not None:
        path = _update_ledger(ledger_label, results)
        print(json.dumps({"ledger": path, "label": ledger_label}))
    n_bad = sum(r["status"] in ("FAIL", "ERROR") for r in results)
    print(
        json.dumps(
            {
                "summary": True,
                "n": len(results),
                "green": len(results) - n_bad,
                "bad": [r["key"] for r in results if r["status"] in ("FAIL", "ERROR")],
                "total_sec": round(sum(r["sec"] for r in results), 1),
                "slowest": sorted(
                    ((r["key"], r["sec"]) for r in results),
                    key=lambda x: -x[1],
                )[:5],
            }
        )
    )
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
