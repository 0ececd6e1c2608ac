#!/usr/bin/env python
"""Capture .explain("formatted") for headline queries into plans/<tag>/.

Usage:
    python tools/capture_plans.py <tag> [key ...]

Writes plans/<tag>/<key>_<suffix>.txt for each key (suffix via
LUXOR_PLAN_SUFFIX, default "before"). Batch keys are captured lazily
(plan only, no execution). Streaming keys EXECUTE on construction (the
drain runs inside the query function); their returned frame is just a
memory-sink scan, so for those we capture the sink scan plan plus the
drain stats — the interesting structure (state cleanup predicates,
join strategy) is already pinned by tests/test_stream_invariance.py.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from luxor_db_spark.registry import load_all_queries  # noqa: E402
from luxor_db_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SUFFIX = os.environ.get("LUXOR_PLAN_SUFFIX", "before")


def main() -> None:
    tag = sys.argv[1]
    keys = sys.argv[2:]
    queries = load_all_queries()
    if not keys:
        from bench import HEADLINE

        keys = [k for k in HEADLINE if k in queries]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="luxor-plan-capture")
    for key in keys:
        spark.sparkContext.setJobDescription(f"plan-capture: {key}")
        try:
            df = queries[key](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # capture the failure, keep sweeping
            text = f"ERROR capturing {key}: {exc!r}\n"
        path = os.path.join(out_dir, f"{key}_{SUFFIX}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
