#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + drain) on a warm session,
median of 5 runs, matching BASELINE.md's measurement protocol. The output
carries the machine's 1-min load average sampled before and after the
suite plus the run count: the r4→r5 cross-round comparison burned two
diagnosis sessions on a +11% uniform drift that turned out to be machine
load, which this metadata makes visible at a glance.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from luxor_db_spark.registry import ORACLES, load_all_queries  # noqa: E402
from luxor_db_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("LUXOR_BENCH_RUNS", "5"))

# Headline set: one representative per SURVEY.md §2 category, weighted toward
# the expensive shapes (multiway join, windows, knn, dedup).
HEADLINE = [
    "flagship_q1",
    "scan_filtered",
    "join_multiway",
    "join_asof",
    "agg_hash",
    "agg_grouping_sets",
    "win_topk_group",
    "sort_multi",
    "set_except_all",
    "fn_array_hof",
    "udf_pandas",
    "llm_dedup_exact",
    "llm_dedup_near",
    "llm_minhash_lsh",
    "llm_tfidf_topterms",
    "llm_cosine_topk",
    "llm_knn_join",
    "llm_langid",
    "llm_corpus_clean",
    "join_skew_salted",
    "sub_scalar",
    "query_q3",
    "query_q18",
    "query_q21",
    "agg_approx_percentile",
    "stream_tumbling",
    "stream_stateful",
    "ts_sessionize",
    "ts_anomaly",
    "llm_bm25_search",
    # round 4 additions (append-only so cross-round totals stay comparable
    # on the shared prefix)
    "llm_dedup_fuzzy",
    "llm_winnow_fingerprint",
    "llm_chunk_overlap",
    "graph_pagerank",
    "agg_gini",
    "win_moving_median",
    # round 5 additions: the rest of the de-weakened event-grain window
    # family (bucket-with-halo / two-level prefix-sum rewrites)
    "win_bollinger",
    "ts_cusum_changepoint",
    "win_max_concurrent",
    # round-5 multi-pass-audit fixes (tools/plan_sweep.py): single-scan
    # sketch build, single-pass profiling, explode-free BM25, window-form
    # bigram LM
    "agg_countmin",
    "profile_table",
    "llm_bigram_lm_score",
    # round 7 addition: the sketch twin, so exact-vs-HLL profiling cost
    # stays visible side by side
    "profile_table_approx",
    # round 8 additions: the driver-visible simhash quality audit and the
    # real-pixel-path resize (decode + resample now do actual pixel work)
    "llm_simhash_eval",
    "mm_resize",
    # round 9 additions: the watermarked streaming near-dup join and the
    # real multi-frame decode path
    "stream_simhash_dedup",
    "mm_frame_sample",
    # round 10 addition: the deduped-STREAM composition (outer join
    # chained into a windowed agg — multi-stateful append mode)
    "stream_dedup_survivors",
    # round 12 swap (r11 verdict ask #2): the registry's two heaviest
    # keys had zero sf0.1 bench history. They replace the two redundant
    # sub-second keys fn_string (fn_array_hof still covers §2.8) and
    # set_intersect_all (set_except_all still covers §2.7), keeping the
    # set at 50 — the cross-round total is comparable on the shared
    # 48-key intersection.
    "stream_chunk_dedup",
    "stream_embed_dedup",
]


def drain(df) -> int:
    """Execute fully without driver-side materialization of values."""
    return df.write.format("noop").mode("overwrite").save() or 0


# Quiet-machine gate (r6 verdict #7, ENFORCED r12 per the r11 verdict):
# the r6 recorded bench ran at load 4.59 and produced 4 phantom
# regressions; r11's ran at load 1.83→26.89 and contaminated all 50
# numbers. The harness now (a) waits up to QUIESCE_WAIT_S for the 1-min
# load to drop under LOAD_MAX before measuring, and (b) if it HAD to
# start noisy, re-arms the gate after the pass and RE-RUNS the whole
# suite when the machine settles, publishing the quiet pass — a noisy
# artifact is published only when the machine never quiesced inside
# both bounded waits, and it stays self-flagged.
LOAD_MAX = float(os.environ.get("LUXOR_BENCH_LOAD_MAX", "1.5"))
QUIESCE_WAIT_S = int(os.environ.get("LUXOR_BENCH_QUIESCE_WAIT", "600"))
# Second-chance wait re-armed AFTER a noisy first pass. Shorter: the
# first pass itself took minutes, so transient load has had time to
# drain; this bound only covers the loadavg decay of our own run plus
# a little margin.
RETRY_WAIT_S = int(os.environ.get("LUXOR_BENCH_RETRY_WAIT", "300"))


def _await_quiet(budget_s: int) -> tuple[float, str]:
    """Wait up to ``budget_s`` for the 1-min load to drop under
    LOAD_MAX; return (load_at_start_of_suite, gate_status)."""
    load = os.getloadavg()[0]
    if load <= LOAD_MAX:
        return round(load, 2), "quiet"
    deadline = time.monotonic() + budget_s
    while time.monotonic() < deadline:
        # never sleep past the deadline, so the final sample below is
        # taken AT suite start, not up to one poll interval before it
        # (r7 ADVICE: the recorded load was ~10 s stale in the noisy path)
        time.sleep(min(10, max(0.0, deadline - time.monotonic())))
        load = os.getloadavg()[0]
        if load <= LOAD_MAX:
            return round(load, 2), "quiet_after_wait"
    return round(os.getloadavg()[0], 2), "noisy"


def _run_suite(spark, queries, keys: list[str]) -> dict[str, float]:
    timings: dict[str, float] = {}
    for key in keys:
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            df = queries[key](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[key] = round(statistics.median(samples), 3)
    return timings


def main() -> None:
    queries = load_all_queries()
    keys = [k for k in HEADLINE if k in queries]
    load_before, load_gate = _await_quiet(QUIESCE_WAIT_S)
    spark = get_spark(app_name="luxor-db-spark-bench")
    # Warm the JVM + parquet footers with the cheapest key.
    queries[keys[0]](spark, SF_DIR).count()

    passes = 1
    timings = _run_suite(spark, queries, keys)
    if load_gate == "noisy":
        # First pass ran on a loaded machine — every number in it is
        # suspect (r11). Re-arm the gate; if the machine settles inside
        # the bounded retry wait, the quiet second pass replaces the
        # noisy one wholesale (medians from different load regimes must
        # not be mixed).
        load_retry, gate_retry = _await_quiet(RETRY_WAIT_S)
        if gate_retry != "noisy":
            load_before, load_gate = load_retry, "quiet_retry"
            timings = _run_suite(spark, queries, keys)
            passes = 2

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "n_queries": len(timings),
                "n_registered": len(queries),
                "n_sql_oracles": len(ORACLES),
                # Measurement metadata (r5 VERDICT ask #8): cross-round
                # drift on unchanged keys is only signal if the machine
                # was comparably loaded and the sample count is known.
                "runs_per_query": RUNS,
                "load_avg_before": load_before,
                "load_avg_after": round(os.getloadavg()[0], 2),
                # "quiet" / "quiet_after_wait" / "quiet_retry" / "noisy":
                # whether the quiet-machine gate (load <=
                # LUXOR_BENCH_LOAD_MAX, waiting up to
                # LUXOR_BENCH_QUIESCE_WAIT s, with one bounded re-run
                # pass after a noisy start) held. "noisy" runs are NOT
                # comparable across rounds.
                "load_gate": load_gate,
                "bench_passes": passes,
                "n_cpus": os.cpu_count(),
            }
        )
    )


if __name__ == "__main__":
    main()
