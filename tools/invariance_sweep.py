#!/usr/bin/env python
"""Registry-wide planner-invariance sweep.

tests/test_invariance.py pins 20 hand-picked plan-sensitive keys per
commit; this harness widens the net to EVERY registered key: each runs
once under the default session and once per perturbation (AQE off,
auto-broadcast disabled, shuffle.partitions=3), and any canonical-row
difference is reported. A hit means either a planner-mode-dependent
answer (the invariance bug class) or latent nondeterminism — both are
driver-fatal eventually, and neither is visible to oracle parity, which
runs both engines at one conf.

Usage:
    python tools/invariance_sweep.py                    # sf0.001, all keys
    python tools/invariance_sweep.py --sf <dir> k1 k2   # subset

Prints one JSON line per MISMATCH (quiet when green) and a summary line.
Exit 1 on any mismatch or error.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from luxor_db_spark.parity import (  # noqa: E402
    PLANNER_PERTURBATIONS,
    canonical_rows,
)

# Registry-wide we run the three cheap modes; tests/test_invariance.py
# additionally runs npart_1/npart_37 on the plan-sensitive key set. One
# shared ledger (parity.PLANNER_PERTURBATIONS) defines both.
PERTURBATIONS = {
    k: PLANNER_PERTURBATIONS[k]
    for k in ("aqe_off", "no_autobroadcast", "npart_3")
}


def canon(df) -> list[tuple]:
    return canonical_rows(list(df.columns), [tuple(r) for r in df.collect()])


def main(argv: list[str]) -> int:
    sf_dir = "/root/testdata/sf0.001"
    if "--sf" in argv:
        i = argv.index("--sf")
        if i + 1 >= len(argv):
            print("usage: --sf <dir>", file=sys.stderr)
            return 2
        sf_dir = argv[i + 1]
        del argv[i : i + 2]

    from luxor_db_spark.registry import load_all_queries
    from luxor_db_spark.session import get_spark

    queries = load_all_queries()
    keys = [a for a in argv if not a.startswith("-")] or sorted(queries)
    unknown = [k for k in keys if k not in queries]
    if unknown:
        print(f"unknown keys: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark(app_name="luxor-db-spark-invariance-sweep")
    t0 = time.perf_counter()
    bad: list[dict] = []
    errors: list[dict] = []
    for key in keys:
        try:
            base = canon(queries[key](spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            errors.append({"key": key, "mode": "baseline", "err": str(e)[:200]})
            continue
        for mode, confs in PERTURBATIONS.items():
            saved = {k: spark.conf.get(k) for k in confs}
            try:
                for k, v in confs.items():
                    spark.conf.set(k, v)
                got = canon(queries[key](spark, sf_dir))
            except Exception as e:  # noqa: BLE001
                errors.append({"key": key, "mode": mode, "err": str(e)[:200]})
                continue
            finally:
                for k, v in saved.items():
                    spark.conf.set(k, v)
            if got != base:
                g, b = set(got), set(base)
                row = {
                    "key": key,
                    "mode": mode,
                    "n_base": len(base),
                    "n_perturbed": len(got),
                    "perturbed_only": [r for r in got if r not in b][:3],
                    "base_only": [r for r in base if r not in g][:3],
                }
                bad.append(row)
                print(json.dumps(row, default=str), flush=True)
    print(
        json.dumps(
            {
                "summary": "invariance_sweep",
                "sf_dir": sf_dir,
                "n_keys": len(keys),
                "modes": sorted(PERTURBATIONS),
                "mismatches": len(bad),
                "errors": errors,
                "total_sec": round(time.perf_counter() - t0, 1),
            }
        )
    )
    return 1 if bad or errors else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
