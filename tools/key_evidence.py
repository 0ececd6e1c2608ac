"""Driver-evidence staleness ledger: ties each driver-green key to the
SOURCE that was actually verified.

Problem (VERDICT r5 §What's-wrong #4): a key keeps its green driver row
forever, even after its implementation or oracle is rewritten —
``win_ntile`` carried an r2 green across an r5 rewrite the driver never
executed. This tool hashes, per key, the full ``@query(...)``-decorated
function source (decorators — hence the oracle SQL — plus body) at the
git snapshot each round's driver actually ran, and writes
``docs/driver_key_evidence.json``:

    {key: {"green_round": N, "hash_at_green": "sha1-12"}}

``luxor_db_spark.driver_coverage`` then re-queues any key whose CURRENT
hash (``luxor_db_spark.key_hash.hashes_from_tree``) differs from
``hash_at_green`` (stale evidence) behind fresh keys but ahead of the
normal least-recently-verified rotation.

Round → commit mapping: round N's driver executed the parent of the
``round N: verdict/advice/correctness/bench`` commit (verified for r4/r5
where an explicit ``end-of-round snapshot`` commit exists and equals that
parent).

Usage:
    python tools/key_evidence.py              # rebuild docs/driver_key_evidence.json
    python tools/key_evidence.py --stale      # print stale keys (exit 1 if any)
    python tools/key_evidence.py --predict 6  # save docs/predicted_window_r6.json
                                              # (run at snapshot time: the saved
                                              # list is what the post-round audit
                                              # compares CORRECTNESS_r6 against)
    python tools/key_evidence.py --assert-head
        # exit 1 unless the ledger's recorded HEAD equals the current HEAD
        # and the source tree is clean — the r11 verdict's cheap insurance
        # that the end-of-round evidence sweep actually ran at the round's
        # last source commit (a sweep followed by "one more fix" silently
        # invalidates the evidence it just wrote).
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from luxor_db_spark.key_hash import (  # noqa: E402
    hashes_from_tree,
    key_sources,
    source_hash,
)

EVIDENCE_PATH = REPO / "docs" / "driver_key_evidence.json"
PKG = "luxor_db_spark"


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", str(REPO), *args],
        check=True,
        capture_output=True,
        text=True,
    ).stdout


def hashes_at_commit(commit: str) -> dict[str, str]:
    """key -> source hash at a historical commit (git archaeology)."""
    files = [
        f
        for f in _git("ls-tree", "-r", "--name-only", commit).splitlines()
        if f.startswith(f"{PKG}/") and f.endswith(".py")
    ]
    out: dict[str, str] = {}
    for f in sorted(files):
        try:
            blob = _git("show", f"{commit}:{f}")
        except subprocess.CalledProcessError:
            continue
        for key, src in key_sources(blob).items():
            out[key] = source_hash(src)
    return out


def round_snapshot_commits() -> dict[int, str]:
    """round number -> commit the driver ran that round."""
    log = _git("log", "--format=%H %s")
    out: dict[int, str] = {}
    for line in log.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): verdict/advice/correctness/bench", subject)
        if m:
            out[int(m.group(1))] = sha + "^"
    return out


def build_evidence() -> dict[str, dict]:
    """Assemble {key: {green_round, hash_at_green}} from the CORRECTNESS
    ledgers plus git archaeology. Latest green round wins per key."""
    from luxor_db_spark.driver_coverage import _load_driver_checked

    last_green = _load_driver_checked()
    snapshots = round_snapshot_commits()
    per_round_hashes = {
        rnd: hashes_at_commit(commit) for rnd, commit in snapshots.items()
    }
    evidence: dict[str, dict] = {}
    for key, rnd in sorted(last_green.items()):
        h = per_round_hashes.get(rnd, {}).get(key)
        evidence[key] = {"green_round": rnd, "hash_at_green": h}
    return evidence


def stale_keys(evidence: dict[str, dict] | None = None) -> list[str]:
    if evidence is None:
        evidence = json.loads(EVIDENCE_PATH.read_text())
    current = hashes_from_tree(REPO)
    stale = []
    for key, row in sorted(evidence.items()):
        cur = current.get(key)
        # hash_at_green None => green row exists but its source could not be
        # located at the snapshot (module moved): treat as stale, the
        # cautious direction (re-verify rather than trust).
        if cur is not None and row.get("hash_at_green") != cur:
            stale.append(key)
    return stale


# Paths whose uncommitted changes invalidate an evidence sweep: anything
# that alters what the driver would execute or how keys hash.
_SOURCE_PATHS = (
    "luxor_db_spark",
    "__spark_entry__.py",
    "bench.py",
)


def _head_state() -> dict:
    head = _git("rev-parse", "HEAD").strip()
    dirty = bool(
        _git("status", "--porcelain", "--", *_SOURCE_PATHS).strip()
    )
    return {"head_sha": head, "source_dirty": dirty}


def assert_head() -> int:
    """Fail unless the round's last SOURCE state is the one the ledger
    was built at (r11 verdict ask #8). Artifact/docs commits after the
    sweep are fine — what invalidates the evidence is a change to any
    `_SOURCE_PATHS` path after the ledger's recorded commit, or a dirty
    source tree on either side of it."""
    evidence = json.loads(EVIDENCE_PATH.read_text())
    meta = evidence.get("_meta")
    if not meta:
        print("FAIL: ledger has no _meta block (rebuild it)", file=sys.stderr)
        return 1
    now = _head_state()
    problems = []
    ledger_sha = meta.get("head_sha", "")
    if ledger_sha != now["head_sha"]:
        try:
            moved = _git(
                "diff",
                "--name-only",
                ledger_sha,
                "HEAD",
                "--",
                *_SOURCE_PATHS,
            ).strip()
        except subprocess.CalledProcessError:
            moved = "<ledger commit unknown to this repo>"
        if moved:
            problems.append(
                f"source changed after the sweep at {ledger_sha[:12]}: "
                f"{moved.splitlines()[:5]}"
            )
    if meta.get("source_dirty"):
        problems.append("ledger was built with uncommitted source changes")
    if now["source_dirty"]:
        problems.append("source tree is dirty NOW — commit before asserting")
    if problems:
        for p in problems:
            print(f"FAIL: {p}", file=sys.stderr)
        return 1
    print(
        f"OK: no source change since the evidence sweep at "
        f"{ledger_sha[:12]} (HEAD {now['head_sha'][:12]})"
    )
    return 0


def main(argv: list[str]) -> int:
    if "--assert-head" in argv:
        return assert_head()
    if "--stale" in argv:
        s = stale_keys()
        print(json.dumps(s, indent=1))
        return 1 if s else 0
    if "--predict" in argv:
        i = argv.index("--predict")
        if i + 1 >= len(argv) or not argv[i + 1].isdigit():
            print("usage: key_evidence.py --predict <round>", file=sys.stderr)
            return 2
        rnd = int(argv[i + 1])
        from luxor_db_spark.driver_coverage import expected_window
        from luxor_db_spark.registry import load_all_queries

        window = expected_window(list(load_all_queries()))
        path = REPO / "docs" / f"predicted_window_r{rnd}.json"
        path.write_text(json.dumps(window, indent=1) + "\n")
        print(f"wrote {path} ({len(window)} keys)")
        return 0
    evidence = build_evidence()
    head = _head_state()
    if head["source_dirty"]:
        print(
            "WARNING: building evidence ledger with uncommitted source "
            "changes — --assert-head will fail until the sweep is re-run "
            "at a clean commit",
            file=sys.stderr,
        )
    evidence["_meta"] = head
    EVIDENCE_PATH.write_text(json.dumps(evidence, indent=1, sort_keys=True) + "\n")
    s = stale_keys(evidence)
    rows = {k: v for k, v in evidence.items() if k != "_meta"}
    print(
        f"wrote {EVIDENCE_PATH} ({len(rows)} keys, "
        f"{sum(1 for v in rows.values() if v['hash_at_green'] is None)} "
        f"unresolved hashes, {len(s)} currently stale, "
        f"head {head['head_sha'][:12]}"
        f"{' DIRTY' if head['source_dirty'] else ''})"
    )
    if s:
        print("stale:", " ".join(s))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
