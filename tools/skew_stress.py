#!/usr/bin/env python
"""Skew-stress harness: MEASURE the hot-key join strategies against each
other on a deliberately skewed fixture.

SCALE.md and join_skew_salted's docstring argue the salted/AQE paths
defuse a hot key; this harness produces the numbers. It synthesizes a
probe table where ``HOT_FRAC`` of all rows share ONE key (the
boilerplate-dedup / null-surrogate / default-tenant shape that dominates
real pipelines) and joins it to a dim table three ways:

- ``naive``        — shuffle-hash join, AQE OFF: the hot key's entire
                     row mass lands on one reducer; wall time is that
                     one task, cores idle.
- ``aqe_skew``     — AQE ON with OptimizeSkewedJoin: the oversized
                     partition is split at runtime (the config-free
                     production default).
- ``salted``       — the explicit join_skew_salted kernel shape: probe
                     rows salt N ways, build rows replicate ×N; for
                     engines that pre-partition or when skew is known
                     ahead of time.

Broadcast is disabled throughout (a broadcast join never shuffles the
probe side, so skew is moot — and hiding the effect would make every
strategy measure the same thing). All three must return the SAME row
count (asserted) — they differ only in shuffle shape.

A second case, ``--case dedup_near_cap``, measures llm_dedup_near's two
df-cap forms on an amplified Zipf document corpus (every doc shares hot
boilerplate shingles with df ≫ the cap): the ``window`` form
(skew_safe=False — COUNT over partitionBy(s), buffers each hot
shingle's FULL posting list in one task before filtering) versus the
``skew_safe`` form (map-side-combinable groupBy count + left_anti,
partial-agg bounded per shingle). Both must emit the same pair count
(asserted); they differ only in where the Zipf head's row mass sits.

Usage:
    python tools/skew_stress.py                 # default N=4M, hot=0.5
    python tools/skew_stress.py --rows 8000000 --hot 0.3 --salts 16
    python tools/skew_stress.py --case dedup_near_cap --docs 1000000

Prints one JSON line per strategy and a summary line; results tabulated
in docs/SCALE.md ("Round 8: measured skew-join strategies").
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

N_ROWS = 4_000_000
HOT_FRAC = 0.5
N_KEYS = 100_000
N_SALTS = 8
RUNS = int(os.environ.get("LUXOR_SKEW_RUNS", "3"))
FIX_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tmp",
    "skew",
)


def build_fixture(
    spark: SparkSession, n_rows: int, hot_frac: float, n_keys: int
) -> tuple[str, str]:
    """Write (probe, dim) parquet under tmp/skew: probe has ``hot_frac``
    of its rows on key 0, the rest hash-uniform over ``n_keys``; dim has
    one payload row per key. Deterministic (hash-derived, no rand)."""
    tag = f"n{n_rows}_h{int(hot_frac * 100)}_k{n_keys}"
    probe_path = os.path.join(FIX_DIR, f"probe_{tag}.parquet")
    dim_path = os.path.join(FIX_DIR, f"dim_{tag}.parquet")
    if not os.path.exists(probe_path):
        mod = max(2, int(round(1.0 / hot_frac)))
        probe = spark.range(n_rows).select(
            F.col("id"),
            F.when(F.col("id") % mod == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys - 1)) + 1)
            .cast("long")
            .alias("key"),
            (F.col("id") % 997).cast("double").alias("v"),
        )
        probe.write.mode("overwrite").parquet(probe_path)
    if not os.path.exists(dim_path):
        dim = spark.range(n_keys).select(
            F.col("id").alias("key"),
            F.concat(F.lit("grp_"), (F.col("id") % 17).cast("string")).alias(
                "grp"
            ),
        )
        dim.write.mode("overwrite").parquet(dim_path)
    return probe_path, dim_path


def joined_naive(probe: DataFrame, dim: DataFrame) -> DataFrame:
    """Plain shuffle-hash equi-join (strategy differences come from the
    session confs the caller sets around it)."""
    return probe.join(dim.hint("shuffle_hash"), "key").groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )


def joined_salted(
    probe: DataFrame, dim: DataFrame, n_salts: int = N_SALTS
) -> DataFrame:
    """The join_skew_salted kernel shape on the stress fixture."""
    p = probe.withColumn(
        "salt", F.pmod(F.xxhash64("id"), F.lit(n_salts)).cast("int")
    )
    b = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).hint("shuffle_hash")
    return (
        p.join(b, (p.key == b.key) & (p.salt == b.salt))
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    )


def _time(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def build_zipf_docs(spark: SparkSession, n_docs: int) -> str:
    """Write a documents.parquet whose shingle df distribution has a Zipf
    head: every doc opens with the same 5-token boilerplate (3 shingles
    at df = n_docs, 100× past the default cap) and a mid-hot tier shared
    by ``id % 50`` (df = n_docs/50), then a unique 4-token tail so the
    near-dup output itself stays tiny. Returns the sf_dir-shaped parent
    directory; deterministic, reused across runs."""
    zdir = os.path.join(FIX_DIR, f"zipf_docs_{n_docs}")
    path = os.path.join(zdir, "documents.parquet")
    if not os.path.exists(path):
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.lit("common boilerplate header text here"),
                F.concat(F.lit("mid"), (F.col("id") % 50).cast("string")),
                F.concat(F.lit("u"), F.col("id").cast("string")),
                F.concat(F.lit("v"), F.col("id").cast("string")),
                F.concat(F.lit("w"), F.col("id").cast("string")),
                F.concat(F.lit("x"), F.col("id").cast("string")),
            ).alias("text"),
        )
        docs.write.mode("overwrite").parquet(path)
    return zdir


def run_dedup_near_case(spark: SparkSession, n_docs: int) -> int:
    """Time llm_dedup_near's window-form vs skew-safe df-cap on the Zipf
    corpus. AQE stays ON for both (production posture); broadcast is NOT
    disabled — the skew-safe hot-set anti-join is allowed its AQE
    broadcast, that is part of its design."""
    from luxor_db_spark.operators.llm import llm_dedup_near

    zdir = build_zipf_docs(spark, n_docs)
    forms = {
        "window_cap": dict(skew_safe=False),
        "skew_safe_cap": dict(skew_safe=True),
    }
    results, counts = {}, {}
    for name, kw in forms.items():
        counts[name] = llm_dedup_near(spark, zdir, **kw).count()
        samples = [
            _time(llm_dedup_near(spark, zdir, **kw))
            for _ in range(RUNS)
        ]
        results[name] = round(statistics.median(samples), 3)
        print(
            json.dumps(
                {
                    "strategy": name,
                    "median_s": results[name],
                    "samples": [round(s, 3) for s in samples],
                    "pairs": counts[name],
                }
            ),
            flush=True,
        )
    assert len(set(counts.values())) == 1, f"pair counts diverge: {counts}"

    # Auto selection (r9 verdict ask #5): on this Zipf corpus the default
    # skew_safe=None probe MUST pick the skew-safe form (boilerplate
    # shingles at df = n_docs land ~n_docs/16 sample hits — unmissable),
    # and its output must match both explicit forms.
    import luxor_db_spark.operators.llm as llm_mod

    auto_count = llm_dedup_near(spark, zdir).count()
    ev = llm_mod._DEDUP_NEAR_FORM_EVENTS[-1]
    assert ev["form"] == "skew_safe", f"auto probe missed the Zipf head: {ev}"
    assert auto_count == next(iter(counts.values()))
    print(json.dumps({"auto_selection": ev, "pairs": auto_count}), flush=True)

    # The structural difference is WHERE the Zipf head's row mass sits,
    # not local wall time (one shared-memory box absorbs a hot task that
    # would OOM/spill a 100 TB executor). Measure it directly: the
    # window form's partitionBy(s) exchange buffers the hottest
    # shingle's ENTIRE posting list in one task before the cap filter;
    # the skew-safe form's groupBy(s) shuffle carries only map-side
    # partial (s, count) rows — at most one per input partition.
    from luxor_db_spark.catalog import load_table
    from luxor_db_spark.operators.llm import _SHINGLES, _TOKENS

    d = load_table(spark, zdir, "documents").withColumn(
        "tokens", F.expr(_TOKENS)
    )
    sh_all = d.select(
        "doc_id", F.explode(F.array_distinct(F.expr(_SHINGLES))).alias("s")
    )
    hottest_df = (
        sh_all.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.max("df"))
        .collect()[0][0]
    )
    safe_partial_rows_max = (
        sh_all.withColumn("mp", F.spark_partition_id())
        .groupBy("s")
        .agg(F.countDistinct("mp").alias("nparts"))
        .agg(F.max("nparts"))
        .collect()[0][0]
    )
    print(
        json.dumps(
            {
                "summary": "dedup_near_cap",
                "n_docs": n_docs,
                "runs": RUNS,
                "medians_s": results,
                "window_vs_skew_safe": round(
                    results["window_cap"] / results["skew_safe_cap"], 2
                ),
                "window_single_task_buffered_rows": hottest_df,
                "skew_safe_shuffled_rows_for_same_shingle": (
                    safe_partial_rows_max
                ),
            }
        )
    )
    return 0


def build_hotdup_docs(spark: SparkSession, n_docs: int, hot_frac: float) -> str:
    """Write a documents.parquet where ``hot_frac`` of all docs are exact
    copies of ONE boilerplate text (a single fingerprint group with
    n_docs*hot_frac members — the empty-page/license-stub shape of a web
    corpus) and the rest are unique. Deterministic, reused across runs."""
    hdir = os.path.join(FIX_DIR, f"hotdup_docs_{n_docs}_h{int(hot_frac*100)}")
    path = os.path.join(hdir, "documents.parquet")
    if not os.path.exists(path):
        mod = max(2, int(round(1.0 / hot_frac)))
        text = F.when(
            F.col("id") % mod == 0,
            F.lit("standard boilerplate page content identical everywhere"),
        ).otherwise(
            F.concat(F.lit("unique document body "), F.col("id").cast("string"))
        )
        spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            F.length(text).cast("int").alias("n_chars"),
        ).write.mode("overwrite").parquet(path)
    return hdir


def run_keep_first_case(spark: SparkSession, n_docs: int, hot_frac: float) -> int:
    """Measure keep-first dedup's two forms on the hot-fingerprint corpus
    (r10 verdict #2): the retired ``window`` form
    (row_number() OVER (PARTITION BY fp ORDER BY doc_id) — buffers the hot
    group's FULL posting in one task before rn=1 filters it) versus the
    shipped ``agg`` form (groupBy(fp).agg(min(doc_id)) — map-side
    combinable, at most one partial row per input partition per group).
    Survivor sets must be identical (asserted); they differ only in where
    the hot group's row mass sits."""
    from pyspark.sql import Window

    from luxor_db_spark.catalog import load_table
    from luxor_db_spark.operators.llm import _NORM, llm_dedup_exact

    hdir = build_hotdup_docs(spark, n_docs, hot_frac)

    def window_form() -> DataFrame:
        d = load_table(spark, hdir, "documents")
        fp = F.md5(F.expr(_NORM))
        w = Window.partitionBy(fp).orderBy("doc_id")
        return (
            d.select(
                "doc_id", fp.alias("fp"), F.row_number().over(w).alias("rn")
            )
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    forms = {
        "window_keep_first": window_form,
        "agg_keep_first": lambda: llm_dedup_exact(spark, hdir),
    }
    results, counts = {}, {}
    for name, fn in forms.items():
        counts[name] = fn().count()
        samples = [_time(fn()) for _ in range(RUNS)]
        results[name] = round(statistics.median(samples), 3)
        print(
            json.dumps(
                {
                    "strategy": name,
                    "median_s": results[name],
                    "samples": [round(s, 3) for s in samples],
                    "survivors": counts[name],
                }
            ),
            flush=True,
        )
    assert len(set(counts.values())) == 1, f"survivor counts diverge: {counts}"
    # Survivor SETS equal, not just counts (subtract is exact on (doc_id, fp)).
    diff = (
        forms["window_keep_first"]()
        .exceptAll(forms["agg_keep_first"]())
        .count()
    )
    assert diff == 0, f"survivor sets diverge by {diff} rows"

    # Structural measurement, same discipline as dedup_near_cap: the
    # window form's exchange materializes the hot fingerprint's entire
    # group in ONE task's sort buffer; the agg form's shuffle carries at
    # most one (fp, partial-min) row per input partition per group.
    d = load_table(spark, hdir, "documents")
    fp_rows = d.select(F.md5(F.expr(_NORM)).alias("fp"))
    hottest = (
        fp_rows.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    agg_partials = (
        fp_rows.withColumn("mp", F.spark_partition_id())
        .groupBy("fp")
        .agg(F.countDistinct("mp").alias("nparts"))
        .agg(F.max("nparts"))
        .collect()[0][0]
    )
    print(
        json.dumps(
            {
                "summary": "keep_first",
                "n_docs": n_docs,
                "hot_frac": hot_frac,
                "runs": RUNS,
                "medians_s": results,
                "window_vs_agg": round(
                    results["window_keep_first"] / results["agg_keep_first"], 2
                ),
                "window_single_task_buffered_rows": hottest,
                "agg_shuffled_partials_for_same_fp": agg_partials,
            }
        )
    )
    return 0


def main(argv: list[str]) -> int:
    n_rows, hot, salts = N_ROWS, HOT_FRAC, N_SALTS

    def _opt(flag: str, cast, cur):
        if flag in argv:
            i = argv.index(flag)
            val = cast(argv[i + 1])
            del argv[i : i + 2]
            return val
        return cur

    n_rows = _opt("--rows", int, n_rows)
    hot = _opt("--hot", float, hot)
    salts = _opt("--salts", int, salts)
    case = _opt("--case", str, "join")
    n_docs = _opt("--docs", int, 1_000_000)

    from luxor_db_spark.session import get_spark

    spark = get_spark(app_name="luxor-db-spark-skew-stress")
    if case == "dedup_near_cap":
        return run_dedup_near_case(spark, n_docs)
    if case == "keep_first":
        return run_keep_first_case(spark, n_docs, hot)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    probe_path, dim_path = build_fixture(spark, n_rows, hot, n_keys=N_KEYS)
    probe = spark.read.parquet(probe_path)
    dim = spark.read.parquet(dim_path)
    probe.count()  # warm footers

    strategies = {
        "naive": (joined_naive, {"spark.sql.adaptive.enabled": "false"}),
        "aqe_skew": (
            joined_naive,
            {
                "spark.sql.adaptive.enabled": "true",
                "spark.sql.adaptive.skewJoin.enabled": "true",
                # The split thresholds default to 256 MB partitions —
                # sized for cluster-scale shuffles (at 100 TB a hot key's
                # partition is orders of magnitude past it). This fixture
                # is deliberately small, so scale the thresholds DOWN the
                # same way the defaults match production scale UP; without
                # this the optimizer correctly judges the hot partition
                # "not big enough to bother" and the strategy measures
                # nothing (observed: 1.04x vs naive at 32M rows).
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16MB",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8MB",
            },
        ),
        "salted": (
            lambda p, d: joined_salted(p, d, salts),
            {"spark.sql.adaptive.enabled": "true"},
        ),
    }
    results = {}
    counts = {}
    for name, (fn, confs) in strategies.items():
        saved = {k: spark.conf.get(k, None) for k in confs}
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            counts[name] = (
                fn(probe, dim).agg(F.sum("n")).collect()[0][0]
            )
            samples = [_time(fn(probe, dim)) for _ in range(RUNS)]
        finally:
            for k, v in saved.items():
                if v is not None:
                    spark.conf.set(k, v)
        results[name] = round(statistics.median(samples), 3)
        print(
            json.dumps(
                {
                    "strategy": name,
                    "median_s": results[name],
                    "samples": [round(s, 3) for s in samples],
                    "rows_joined": counts[name],
                }
            ),
            flush=True,
        )

    assert len(set(counts.values())) == 1, f"row counts diverge: {counts}"
    print(
        json.dumps(
            {
                "summary": "skew_stress",
                "n_rows": n_rows,
                "hot_frac": hot,
                "n_keys": N_KEYS,
                "n_salts": salts,
                "runs": RUNS,
                "medians_s": results,
                "speedup_vs_naive": {
                    k: round(results["naive"] / v, 2)
                    for k, v in results.items()
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
