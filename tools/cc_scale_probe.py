#!/usr/bin/env python
"""Strong-scale the star-contraction CC KERNEL at an amplified edge
grain (r12 verdict task 5).

The registered ``graph_cc_two_phase`` fixture graph is CONSTANT-SIZE by
construction (doc_id % 97 → ≤97 nodes at every SF), so its strong-scale
row is flat: per-round cost there is task scheduling, which cores cannot
speed up. That declaration needs a measurement of the kernel itself at a
grain where data work dominates — this probe builds a functional graph
whose node count scales WITH the corpus (every document seeds K edges,
u → 7u+3 mod N over N ≈ 2·K·|docs| ids: multiplicative orbits give long
chains and cycles, the worst case for propagation and the design case
for star contraction) and times ``cc.star_contract`` end-to-end in
fresh single-purpose sessions at each core count.

Usage:
    python tools/cc_scale_probe.py                 # cores 4,32 on tmp/scale/x16
    python tools/cc_scale_probe.py --cores 4,16,32 --dir /root/testdata/sf0.1

Prints one JSON line: {"edges": E, "nodes": N, "rounds_runs": R,
"times_s": {"4": ..., "32": ...}, "speedup": ...}. Record the result in
docs/strong_scale.json (hand-merge, per the --ledger clobber pitfall)
and docs/SCALE.md.
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

RUNS = int(os.environ.get("LUXOR_CC_PROBE_RUNS", "3"))
# Edges seeded per document: at the x16 fixture (80k docs) this yields a
# ~2M-edge / ~4M-id graph — big enough that a star round's
# groupBy/join/distinct is real shuffle work, not scheduling overhead.
EDGES_PER_DOC = int(os.environ.get("LUXOR_CC_PROBE_K", "25"))


def _build_edges(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from luxor_db_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n_docs = docs.count()
    n_ids = 2 * EDGES_PER_DOC * n_docs + 1
    edges = docs.select(
        F.explode(
            F.sequence(F.lit(0), F.lit(EDGES_PER_DOC - 1))
        ).alias("k"),
        F.col("doc_id"),
    ).select(
        ((F.col("doc_id") * EDGES_PER_DOC + F.col("k")) % n_ids).alias(
            "a"
        ),
        (
            ((F.col("doc_id") * EDGES_PER_DOC + F.col("k")) * 7 + 3)
            % n_ids
        ).alias("b"),
    )
    return edges, n_ids


def worker(master: str, sf_dir: str) -> int:
    from luxor_db_spark.operators.cc import star_contract
    from luxor_db_spark.session import get_spark

    cores = master.split("[")[1].rstrip("]")
    spark = get_spark(
        app_name=f"luxor-cc-scale-{cores}",
        master=master,
        shuffle_partitions=int(cores),
    )
    edges, n_ids = _build_edges(spark, sf_dir)
    n_edges = edges.count()  # warms the scan; edge build is O(|docs|)
    samples = []
    labels_n = 0
    for _ in range(RUNS):
        t0 = time.perf_counter()
        labels_n = star_contract(edges).count()
        samples.append(time.perf_counter() - t0)
    print(
        "WORKER_RESULT "
        + json.dumps(
            {
                "s": round(statistics.median(samples), 3),
                "edges": n_edges,
                "id_space": n_ids,
                "labels": labels_n,
            }
        ),
        flush=True,
    )
    return 0


def main(argv: list[str]) -> int:
    if "--worker" in argv:
        master = argv[argv.index("--master") + 1]
        sf_dir = argv[argv.index("--dir") + 1]
        return worker(master, sf_dir)

    cores = [4, 32]
    if "--cores" in argv:
        cores = sorted(
            {int(x) for x in argv[argv.index("--cores") + 1].split(",")}
        )
    sf_dir = os.path.join(REPO, "tmp", "scale", "x16")
    if "--dir" in argv:
        sf_dir = argv[argv.index("--dir") + 1]
    if not os.path.exists(sf_dir):
        print(
            f"fixture {sf_dir} missing — build it: python "
            f"tools/scale_curve.py --build 16",
            file=sys.stderr,
        )
        return 2

    out: dict = {"times_s": {}, "cores": cores, "runs": RUNS}
    for c in cores:
        # Fresh JVM per arm, same as tools/strong_scale.py: a shared
        # session would let the later arm ride the earlier arm's JIT.
        proc = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--worker",
                "--master",
                f"local[{c}]",
                "--dir",
                sf_dir,
            ],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        line = next(
            (
                ln
                for ln in proc.stdout.splitlines()
                if ln.startswith("WORKER_RESULT ")
            ),
            None,
        )
        if line is None:
            print(proc.stdout[-2000:], file=sys.stderr)
            print(proc.stderr[-2000:], file=sys.stderr)
            return 1
        row = json.loads(line[len("WORKER_RESULT ") :])
        out["times_s"][str(c)] = row["s"]
        out.update(
            {k: row[k] for k in ("edges", "id_space", "labels")}
        )
        print(f"local[{c}]: {row['s']} s", flush=True)
    lo, hi = str(cores[0]), str(cores[-1])
    out["speedup"] = round(out["times_s"][lo] / out["times_s"][hi], 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
