"""Planner-mode invariance: plan-sensitive keys vs session perturbations.

The same key runs under three different physical-planning regimes and the
results must be identical to the default tuned session:

- ``aqe_off``  — ``spark.sql.adaptive.enabled=false``: no runtime re-plan,
  no AQE skew-join split, no broadcast demotion/promotion. The r5
  ``join_skew_salted`` incident (AQE silently broadcasting the
  salt-inflated build side) is exactly this class — the *result* stayed
  right then, but any key whose correctness leans on a physical artifact
  (``spark_partition_id``, persisted midpoints, range partitioning) must
  prove result-invariance when the planner changes its mind.
- ``npart_3`` / ``npart_37`` — ``spark.sql.shuffle.partitions`` far from
  the tuned value (8 in tests, 32 in prod, 200 in a vanilla driver
  session): ``two_level_cumsum``-family keys *read* this conf to size
  their range partitioning, the bucketed-halo family shuffles on derived
  buckets, and salting fans out by a constant — all must be
  partition-count-proof.

Why result-level and not plan-level: tests/test_plans.py already pins the
plan *shapes*; this suite pins the stronger contract that whatever plan
the session picks, the ANSWER cannot move. A key failing here would pass
every parity test (same conf both sides) and still be wrong on a real
cluster whose conf we don't control.

Scope: keys whose implementation touches physical-plan artifacts (listed
with the machinery that makes them sensitive). Streaming keys are covered
by their own layout/trigger tests and are too slow to triplicate here.
"""

from __future__ import annotations

import pytest

from luxor_db_spark.registry import load_all_queries
from tests.conftest import canonical_rows

QUERIES = load_all_queries()

# key -> the plan-sensitive machinery under test
KEYS = {
    # key-domain quantile buckets, pin-free (two_level_cumsum, r8)
    "win_ntile": "two_level_cumsum ntile closed form",
    "win_pareto": "two_level_cumsum running share",
    "agg_gini": "two_level_cumsum over (x, cust)",
    "agg_weighted_median": "two_level_cumsum pick row",
    # value-ledger rank rewrites (broadcast ledger joins)
    "win_rank_dense": "value-ledger rank formulas",
    "win_percent": "value-ledger percent_rank/cume_dist",
    "win_range_frame": "value-ledger range frame sums",
    # bucketed-halo window family (derived bucket + halo replication)
    "win_moving_median": "bucket+halo trailing median",
    "win_bollinger": "bucket+halo mean/stddev bands",
    "ts_cusum_changepoint": "bucket offsets two-level cumsum",
    "win_max_concurrent": "bucket offsets running sum",
    # pinned / salted join strategies
    "join_skew_salted": "salt fan-out + SHUFFLE_HASH pin",
    "join_dpp": "dynamic partition pruning scan",
    "join_broadcast": "broadcast hint",
    # broadcast constant-grain aggregates
    "win_percent_of_total": "broadcast group totals",
    "llm_dpo_pairs": "min/max-of-struct aggregation",
    # iterative fixpoints (localCheckpoint plan cuts)
    "llm_dedup_cluster": "star-contraction CC over near-dup edges",
    "graph_cc_two_phase": "star-contraction CC fixpoint",
    "graph_pagerank": "unrolled iteration reuse",
    # hash-partitioned window keep-lowest
    "llm_dedup_exact": "md5 hash-partition window",
}

# The shared ledger (luxor_db_spark.parity.PLANNER_PERTURBATIONS) is the
# single definition also used by tools/invariance_sweep.py: aqe_off,
# no_autobroadcast (joins fall back to sort-merge/shuffle-hash), and
# shuffle-partition counts including the npart_1 degenerate boundary
# (one range partition → a single-row offset table; the pid arithmetic
# must still close).
from luxor_db_spark.parity import PLANNER_PERTURBATIONS as PERTURBATIONS

# Baseline (default-conf) canonical results, computed once per key.
_BASELINE: dict[str, list[tuple]] = {}


def _run_canonical(spark, sf_dir: str, key: str) -> list[tuple]:
    df = QUERIES[key](spark, sf_dir)
    return canonical_rows(list(df.columns), [tuple(r) for r in df.collect()])


def _baseline(spark, sf_dir: str, key: str) -> list[tuple]:
    if key not in _BASELINE:
        _BASELINE[key] = _run_canonical(spark, sf_dir, key)
    return _BASELINE[key]


@pytest.mark.parametrize("mode", sorted(PERTURBATIONS))
@pytest.mark.parametrize("key", sorted(KEYS))
def test_result_invariant_under_planner_perturbation(spark, sf_dir, key, mode):
    base = _baseline(spark, sf_dir, key)
    confs = PERTURBATIONS[mode]
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        got = _run_canonical(spark, sf_dir, key)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    assert len(got) == len(base), (
        f"[{key}/{mode}] row count moved: {len(got)} vs baseline {len(base)}"
        f" — {KEYS[key]} is not invariant to this planner perturbation"
    )
    if got != base:
        gs, bs = set(got), set(base)
        raise AssertionError(
            f"[{key}/{mode}] values moved under {confs} — {KEYS[key]}\n"
            f"  perturbed-only: {[r for r in got if r not in bs][:5]}\n"
            f"  baseline-only:  {[r for r in base if r not in gs][:5]}"
        )
