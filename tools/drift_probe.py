#!/usr/bin/env python
"""Bisect the r7->r9 five-key bench drift (r9 verdict ask #4).

Five sub-second headline keys drifted +22-47% between the quiet r7 and
quiet r9 benches while the other 42 common keys' median moved -4.8%
(r8 values sit with r7, so the step is r8->r9). Two hypotheses:

  A. session-state / suite-order effect: the keys run late in bench.py's
     single shared session, and something in the r9 session (more
     registered plans, listener state, codegen cache pressure) slows
     late keys.
  B. real regression: an r9 code change (the `_docs_tokenized` refactor
     touched llm.py helpers these keys share) made the operators
     themselves slower.

This probe runs each key both ways at the bench's own SF:
  ISO   — a FRESH tuned session per key (subprocess), warm-up, then
          median of RUNS timed executions: no suite state at all.
  SUITE — one bench-identical session that executes every headline key
          preceding the target once (same order, same noop sink), then
          times the target median-of-RUNS: full suite state.

ISO ~= SUITE ~= r9 value  -> real regression (bisect commits next).
ISO ~= r7 value < SUITE   -> suite/session-state effect (name it, done).

Usage: python tools/drift_probe.py [--arm iso|suite] [key ...]
(no --arm: runs SUITE inline, then ISO via one subprocess per key).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("LUXOR_BENCH_RUNS", "5"))

DRIFT_KEYS = [
    "llm_bm25_search",
    "llm_winnow_fingerprint",
    "llm_chunk_overlap",
    "win_moving_median",
    "llm_dedup_fuzzy",
]


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _median_time(queries, key, spark) -> float:
    samples = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        _noop(queries[key](spark, SF_DIR))
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3)


def run_iso(keys: list[str]) -> dict[str, float]:
    """Each key in its own fresh tuned session (bench session recipe)."""
    out = {}
    for key in keys:
        code = (
            "import sys, json; sys.path.insert(0, %r)\n"
            "from tools.drift_probe import _median_time\n"
            "from luxor_db_spark.registry import load_all_queries\n"
            "from luxor_db_spark.session import get_spark\n"
            "q = load_all_queries()\n"
            "spark = get_spark(app_name='drift-iso')\n"
            "q['flagship_q1'](spark, %r).count()\n"  # bench-style warm-up
            "print('RESULT ' + json.dumps(_median_time(q, %r, spark)))\n"
        ) % (REPO, SF_DIR, key)
        p = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
        out[key] = json.loads(line[0][7:]) if line else None
        if not line:
            print(p.stderr[-800:], file=sys.stderr)
    return out


def run_suite(keys: list[str]) -> dict[str, float]:
    """bench.py's exact shape: one session, full headline order; targets
    get median-of-RUNS, everything else one execution."""
    from bench import HEADLINE
    from luxor_db_spark.registry import load_all_queries
    from luxor_db_spark.session import get_spark

    queries = load_all_queries()
    spark = get_spark(app_name="drift-suite")
    queries["flagship_q1"](spark, SF_DIR).count()
    out = {}
    targets = set(keys)
    for key in HEADLINE:
        if key not in queries:
            continue
        if key in targets:
            out[key] = _median_time(queries, key, spark)
        else:
            _noop(queries[key](spark, SF_DIR))
    return out


def _iso_time_in_tree(tree: str, key: str) -> float | None:
    """One fresh-session median-of-RUNS timing of ``key`` executed from
    the code at ``tree`` (subprocess so the import roots are that tree's).
    Self-contained — no import of tools.drift_probe — so the OLD worktree
    can predate this module."""
    code = (
        "import sys, json, time, statistics; sys.path.insert(0, %r)\n"
        "from luxor_db_spark.registry import load_all_queries\n"
        "from luxor_db_spark.session import get_spark\n"
        "q = load_all_queries()\n"
        "spark = get_spark(app_name='drift-ab')\n"
        "q['flagship_q1'](spark, %r).count()\n"
        "samples = []\n"
        "for _ in range(%d):\n"
        "    t0 = time.perf_counter()\n"
        "    q[%r](spark, %r).write.format('noop').mode('overwrite').save()\n"
        "    samples.append(time.perf_counter() - t0)\n"
        "print('RESULT ' + json.dumps(round(statistics.median(samples), 3)))\n"
    ) % (tree, SF_DIR, RUNS, key, SF_DIR)
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=tree,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": SF_DIR},
    )
    line = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
    if not line:
        print(p.stderr[-800:], file=sys.stderr)
        return None
    return json.loads(line[0][7:])


def run_ab(keys: list[str], old_ref: str, rounds: int = 4) -> int:
    """Alternating-worktree bisect (docs/TIMINGS.md calibration policy):
    time each key in a detached worktree at ``old_ref`` and in the live
    repo, ALTERNATING arms (old,new,new,old,...) so slow machine-state
    drift cancels instead of loading one arm. Each sample is its own
    fresh-session subprocess median-of-RUNS. Verdict per key: 'code' if
    the new arm lost every paired round AND the median ratio exceeds
    1.15; 'noise' otherwise."""
    wt = os.path.join(REPO, "tmp", f"abwt_{old_ref[:12].replace('/', '_')}")
    if not os.path.exists(
        os.path.join(wt, "luxor_db_spark", "registry.py")
    ):
        subprocess.run(
            ["git", "worktree", "add", "--detach", "--force", wt, old_ref],
            cwd=REPO, check=True,
        )
    # The worktree is a full self-copy of the package (~35k LoC on
    # disk); left behind it corrupts any LoC/audit sweep of the tree
    # (r11 verdict wrong #2). Remove it when the probe exits, however
    # it exits.
    import atexit

    def _cleanup_worktree(path=wt):
        subprocess.run(
            ["git", "worktree", "remove", "--force", path],
            cwd=REPO,
            check=False,
        )
        import shutil

        shutil.rmtree(path, ignore_errors=True)

    atexit.register(_cleanup_worktree)
    for key in keys:
        old_s, new_s = [], []
        for r in range(rounds):
            order = [("old", wt), ("new", REPO)]
            if r % 2:
                order.reverse()
            for arm, tree in order:
                t = _iso_time_in_tree(tree, key)
                (old_s if arm == "old" else new_s).append(t)
                print(
                    json.dumps({"key": key, "round": r, "arm": arm, "s": t}),
                    flush=True,
                )
        old_ok = [s for s in old_s if s is not None]
        new_ok = [s for s in new_s if s is not None]
        if not old_ok or not new_ok:
            print(json.dumps({"key": key, "verdict": "error"}))
            continue
        mo, mn = statistics.median(old_ok), statistics.median(new_ok)
        paired_losses = sum(
            1 for a, b in zip(old_s, new_s) if a is not None and b is not None and b > a
        )
        n_pairs = sum(1 for a, b in zip(old_s, new_s) if a is not None and b is not None)
        verdict = (
            "code" if paired_losses == n_pairs and mn / mo > 1.15 else "noise"
        )
        print(
            json.dumps(
                {
                    "summary": "ab",
                    "key": key,
                    "old_ref": old_ref,
                    "sf_dir": SF_DIR,
                    "median_old_s": mo,
                    "median_new_s": mn,
                    "ratio": round(mn / mo, 3),
                    "paired_new_losses": f"{paired_losses}/{n_pairs}",
                    "verdict": verdict,
                }
            ),
            flush=True,
        )
    return 0


def main(argv: list[str]) -> int:
    arm = None
    if "--arm" in argv:
        i = argv.index("--arm")
        arm = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if "--ab" in argv:
        i = argv.index("--ab")
        old_ref = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
        keys = [a for a in argv if not a.startswith("-")] or DRIFT_KEYS
        return run_ab(keys, old_ref)
    keys = [a for a in argv if not a.startswith("-")] or DRIFT_KEYS
    results = {}
    if arm in (None, "suite"):
        results["suite"] = run_suite(keys)
        print(json.dumps({"arm": "suite", **results["suite"]}), flush=True)
    if arm in (None, "iso"):
        results["iso"] = run_iso(keys)
        print(json.dumps({"arm": "iso", **results["iso"]}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
