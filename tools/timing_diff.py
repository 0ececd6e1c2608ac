#!/usr/bin/env python
"""Round-over-round full-registry timing diff (r9 verdict ask #7).

Reads ``docs/registry_timings.json`` (written by ``driver_sim --ledger``)
and renders ``docs/TIMINGS.md``: one row per registered key with the two
requested rounds' seconds and the delta, sorted by worst regression first,
plus a summary header. The bench covers ~50 headline keys; this ledger is
the tripwire for the other ~210 — the r7→r9 five-key drift went unnoticed
for two rounds because nothing diffed non-headline timings automatically.

Usage:
    python tools/timing_diff.py r9 r10          # render + print worst 10
    python tools/timing_diff.py r9 r10 --fail-pct 50   # exit 1 on worse
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(REPO, "docs", "registry_timings.json")
OUT = os.path.join(REPO, "docs", "TIMINGS.md")

# Keys under this many seconds in BOTH rounds are noise-dominated at
# sf0.01 (session scheduling jitter is ~0.1-0.3 s); they are listed but
# never counted as regressions.
NOISE_FLOOR_S = 1.0


def main(argv: list[str]) -> int:
    args = [a for a in argv if not a.startswith("-")]
    if len(args) != 2:
        print("usage: timing_diff.py OLD_LABEL NEW_LABEL", file=sys.stderr)
        return 2
    old, new = args
    fail_pct = None
    if "--fail-pct" in argv:
        fail_pct = float(argv[argv.index("--fail-pct") + 1])
    with open(LEDGER) as fh:
        ledger = json.load(fh)

    # Suite-median machine factor: the ledger is re-measured on whatever
    # the round's machine conditions are, and a busy round inflates EVERY
    # key (r11: median ratio 1.22 vs r10's 1.01). Per-key drift is only
    # meaningful RELATIVE to that global factor, so all deltas below are
    # computed on the deflated new value b / med_ratio.
    import statistics

    def _median_ratio(lo: str, hi: str) -> float:
        rats = [
            cols[hi] / cols[lo]
            for cols in ledger.values()
            if cols.get(lo) and cols.get(hi)
        ]
        return statistics.median(rats) if rats else 1.0

    med_ratio = _median_ratio(old, new)
    # The normalization has a blind spot (r11 ADVICE #4): a real code
    # regression that slows MOST keys uniformly (a shared helper like
    # load_table) is absorbed into med_ratio and reported as ~0% drift
    # per key. When the global factor itself is large, say so loudly and
    # point at the tool that CAN attribute it (the alternating-worktree
    # A/B probe re-times old code on the new machine).
    GLOBAL_SHIFT_WARN = 1.15
    global_shift_flagged = (
        med_ratio >= GLOBAL_SHIFT_WARN or med_ratio <= 1 / GLOBAL_SHIFT_WARN
    )
    rows = []
    for key, cols in sorted(ledger.items()):
        a, b = cols.get(old), cols.get(new)
        if a is None or b is None:
            rows.append((key, a, b, None))
            continue
        pct = (b / med_ratio - a) / a * 100 if a > 0 else 0.0
        rows.append((key, a, b, pct))
    diffed = [r for r in rows if r[3] is not None]
    loud = [
        r
        for r in diffed
        if max(r[1], r[2]) >= NOISE_FLOOR_S
    ]
    worst = sorted(loud, key=lambda r: -(r[3] or 0))
    lines = [
        "# Full-registry timing ledger",
        "",
        f"Per-key wall seconds from `driver_sim --all --ledger` "
        f"(sf0.01, vanilla local[8] session — uniform across all keys; "
        f"the bench's sf0.1 tuned numbers stay the headline metric). "
        f"Diff: `{old}` → `{new}`, {len(diffed)} keys in both columns, "
        f"noise floor {NOISE_FLOOR_S}s. Suite-median machine factor "
        f"{med_ratio:.3f}; every Δ% below is the key's drift AFTER "
        f"dividing the new value by it (a global slowdown is the "
        f"machine, not the code).",
        "",
        f"- RAW total (no normalization): "
        f"{sum(r[1] for r in diffed):.1f}s ({old}) → "
        f"{sum(r[2] for r in diffed):.1f}s ({new}), raw ratio "
        f"{sum(r[2] for r in diffed) / max(sum(r[1] for r in diffed), 1e-9):.3f}",
        f"- keys above noise floor: {len(loud)}",
        f"- worse by >25% net of machine factor (above floor): "
        f"{sum(1 for r in loud if r[3] > 25)}",
        f"- better by >25% net of machine factor (above floor): "
        f"{sum(1 for r in loud if r[3] < -25)}",
        "",
    ]
    if global_shift_flagged:
        lines += [
            f"**⚠ GLOBAL SHIFT: suite-median machine factor "
            f"{med_ratio:.3f} is outside "
            f"[{1 / GLOBAL_SHIFT_WARN:.2f}, {GLOBAL_SHIFT_WARN:.2f}].** "
            f"The per-key Δ% normalization CANNOT distinguish machine "
            f"load from a code change that slows most keys uniformly "
            f"(a shared helper). Attribute the shift before trusting "
            f"this table: `python tools/drift_probe.py --ab "
            f"<{old}-end-commit> <any-expensive-key>` re-times the old "
            f"code on today's machine — if the old code also runs "
            f"~{med_ratio:.2f}× its {old} number, it's the machine.",
            "",
        ]
    lines += [
        "Calibration (r10 drift probe, `tools/drift_probe.py`): same-code "
        "same-order quiet re-runs show ~±25-30% per-key spread at this "
        "scale, roughly symmetric. Read a SINGLE round's delta only as a "
        "tripwire; treat a key as regressed when its delta is large AND "
        "one-sided across two consecutive rounds (real regressions "
        "compound, noise reverses), then confirm with the probe's "
        "alternating-worktree bisect before touching code.",
        "",
        f"| key | {old} s | {new} s | Δ% |",
        "|---|---|---|---|",
    ]
    for key, a, b, pct in worst:
        lines.append(f"| {key} | {a} | {b} | {pct:+.0f}% |")
    quiet = [r for r in diffed if r not in loud]
    lines += [
        "",
        f"<details><summary>{len(quiet)} keys under the noise floor"
        "</summary>",
        "",
        f"| key | {old} s | {new} s | Δ% |",
        "|---|---|---|---|",
    ]
    for key, a, b, pct in sorted(quiet, key=lambda r: -(r[3] or 0)):
        lines.append(f"| {key} | {a} | {b} | {pct:+.0f}% |")
    lines += ["", "</details>", ""]
    # Probe queue (r10 verdict ask #8): a key one-sided above noise for
    # TWO consecutive rounds stops depending on judge attention — emit
    # the exact alternating-worktree probe invocation to run. "Two
    # consecutive rounds one-sided" = the NEW value exceeds BOTH prior
    # rounds' values by >25% (a reversal in either pair is noise by the
    # calibration policy above).
    def _rnum(label: str) -> int | None:
        import re as _re

        m = _re.fullmatch(r"r?(\d+)", label)
        return int(m.group(1)) if m else None

    queue = []
    n_old = _rnum(old)
    for key, a, b, pct in loud:
        if pct is None or pct <= 25:  # net of the machine factor
            continue
        prev_label = None
        if n_old is not None:
            cands = {
                _rnum(lbl): lbl
                for lbl in ledger.get(key, {})
                if _rnum(lbl) is not None and _rnum(lbl) < n_old
            }
            if cands:
                prev_label = cands[max(cands)]
        pp = ledger.get(key, {}).get(prev_label) if prev_label else None
        if pp is not None:
            ratio_pp = _median_ratio(prev_label, new)
            if b / ratio_pp <= pp * 1.25:
                continue  # reversal vs the round before: noise
        queue.append((key, pp, a, b))
    if queue:
        lines += [
            "## Probe queue (two-round one-sided regressions)",
            "",
            "Confirm-or-kill each with the alternating-worktree bisect "
            "before touching code; record the verdict in docs/SCALE.md:",
            "",
        ]
        for key, pp, a, b in queue:
            hist = (f"{pp}s → " if pp is not None else "") + f"{a}s → {b}s"
            lines.append(
                f"- `{key}` ({hist}): "
                f"`SPARK_GRAFT_SF_DIR=$SF python tools/drift_probe.py "
                f"--ab <{old}-end-commit> {key}`"
            )
        lines.append("")
    # Static cost-envelope notes: hand-measured floors for the keys whose
    # ledger seconds are dominated by fixed costs, so a reader doesn't
    # mistake them for data work (r12 verdict task 6). Rendered into
    # every regeneration of this file.
    lines += [
        "## Cost envelopes (fixed-cost keys)",
        "",
        "- `llm_ann_pq_parity` (~22-25 s cold / ~13 s warm at sf0.01, "
        "profiled r13): ≈10-13 s first-MLlib-use JIT/classload (paid "
        "once per session by whichever ANN key runs first — in the "
        "4-key sim the same build+serve ran 9.5 s warm), ≈7-9 s "
        "two-pass KMeans build (coarse fit ~3 s + 8 concurrent "
        "codebook fits ~4 s; train sample capped, so this term is "
        "N-independent past the cap), ≈5-7 s parity-wide serve plan "
        "(probe + ADC codegen over the m·k codebook literal + two "
        "windows + two broadcast joins — fixed stage costs; data work "
        "<0.5 s). The corpus-wide shortlist the parity contract "
        "requires (k·refine ≥ N) grows the serve term linearly in N; "
        "the SHIPPED serving path (refine=8) stays O(k·refine). "
        "Build-per-call is a pinned contract (drop_index test), so "
        "cross-key index reuse is deliberately NOT done in the "
        "registered keys; LuxorEngine.build_index is the reuse path.",
        "",
        "- `source_python_ds` (~4-5 s in this ledger, profiled r14): "
        "≈5 s is the FIRST-call cost of Spark's Python DataSource "
        "machinery in a session (plan conversion + Python runner "
        "spin-up, paid once per session by whichever Python-source "
        "key runs first); warm calls measure ~0.5 s on the same "
        "session. The 4-partition generator itself is trivially "
        "parallel — the keyspace partitioning is the scale story, the "
        "first-call constant is Spark infrastructure, not data work.",
        "",
        "- `fn_math` (~2.7 s in this ledger, profiled r14): the "
        "engine-side execution is ~0.26 s warm on a vanilla local[8] "
        "session (one projection, 13 math columns); the ledger's "
        "seconds are dominated by the HARNESS — collecting and "
        "canonicalizing 60k x 13-double rows from BOTH engines for "
        "the order-insensitive compare. Not an engine cost; left "
        "alone by design.",
        "",
        "- Streaming drain FLOOR (measured r13/r14 at sf0.1, "
        "local[32], clamp 8): ~0.34 s for a stateless drain, ~0.72 s "
        "for one stateful aggregation, plus ~0.6 s micro-batch "
        "planning per start and — for watermarked append-mode keys — "
        "a ~1.0 s zero-row watermark-flush batch (state-store "
        "open/commit cycles; NOT partition-bound, measured by the r13 "
        "partition A/B). Every stream_* key pays this per drain "
        "because a bench run starts and stops a fresh query; "
        "amortizing it would require a long-lived query reused across "
        "runs, which is the same cross-run-reuse class the "
        "no-precomputation rule forbids — deliberately NOT done "
        "(r13 verdict item 5: methodology ruling required first).",
        "",
    ]
    missing = [r for r in rows if r[3] is None]
    if missing:
        lines.append(
            f"Keys present in only one column: "
            f"{', '.join(r[0] for r in missing)}"
        )
        lines.append("")
    with open(OUT, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {OUT}")
    raw_ratio = sum(r[2] for r in diffed) / max(
        sum(r[1] for r in diffed), 1e-9
    )
    print(
        f"raw total ratio {raw_ratio:.3f}, median machine factor "
        f"{med_ratio:.3f}"
        + (
            " — GLOBAL SHIFT: attribute machine-vs-code with "
            "drift_probe.py --ab before trusting per-key deltas"
            if global_shift_flagged
            else ""
        )
    )
    for key, a, b, pct in worst[:10]:
        print(f"{key}: {a}s -> {b}s ({pct:+.0f}%)")
    for key, pp, a, b in queue:
        print(f"PROBE {key}: run drift_probe.py --ab (see {OUT})")
    if fail_pct is not None and any(r[3] > fail_pct for r in loud):
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
