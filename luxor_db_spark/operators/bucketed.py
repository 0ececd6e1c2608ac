"""Bucket-level parallelism for order-dependent event-grain windows.

Problem (round-4 verdict): several operators window at raw event grain
partitioned only by ``event_type`` — and the fixture has ~5 event types, so
parallelism is capped at 5 no matter how many executors exist. At 100× data
each task sorts ~20M rows of one series. The fixes here restore
``#types × #time-buckets`` parallelism while keeping results bit-identical
to the global per-type window (the DuckDB oracles are unchanged):

- :func:`with_trailing_halo` — for BOUNDED trailing ROWS frames
  (``k PRECEDING AND CURRENT ROW``): cut each series into coarse time
  buckets and replicate, into each bucket, the k rows that globally precede
  its first row (the "halo"). A frame evaluated inside (type, bucket) then
  sees exactly the rows the global frame would; halo rows are dropped from
  the output. Replication cost: ≤ k rows per bucket.

- two-level prefix sums (open-ended running frames) — computed inline by
  the callers with :func:`bucket_offsets`: local per-(type, bucket) running
  sum + a broadcast per-bucket offset table (the win_pareto pattern).
  Exact because the summed quantities are DECIMAL (order-independent).

Halo correctness argument: a row can be needed by a later bucket only if
fewer than k rows of its own bucket follow it (otherwise the later bucket's
frame never reaches back that far), so candidates are exactly the last k
rows of each bucket. Each candidate with global index g is shipped to every
bucket whose first row's global index lies in [g+1, g+k] — normally just
the next bucket, but also buckets further ahead when the intervening
buckets hold fewer than k rows, so short/empty buckets cannot break the
frame. Global indices come from a per-bucket row-count ledger (tiny,
broadcast), not from a global window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

BKT = "_bkt"
HALO = "_halo"


def with_trailing_halo(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    bucket: Column,
    k: int,
) -> DataFrame:
    """Return ``df`` + (BKT, HALO) columns such that a trailing
    ``rowsBetween(-k, 0)`` window over
    ``Window.partitionBy(*part_cols, BKT).orderBy(*order_cols)`` equals the
    global per-``part_cols`` window for every row with ``HALO == false``.

    ``order_cols`` must be a deterministic total order per partition (e.g.
    ``(ts, event_id)``) and ``bucket`` must be monotone in it (a time
    truncation of the leading order column).
    """
    b = df.withColumn(BKT, bucket)

    # Halo candidates: the last k rows of each bucket (descending local
    # row number). Only they can fall within k global predecessors of a
    # later bucket's start.
    wdesc = Window.partitionBy(*part_cols, BKT).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    cand = b.withColumn("_rn_desc", F.row_number().over(wdesc)).filter(
        F.col("_rn_desc") <= k
    )

    # Per-bucket row-count ledger (|types|×|buckets| rows): _start = rows
    # before the bucket in the series. Map-side-combinable count, then a
    # window over the tiny ledger only — no global event-grain pass.
    cnts = b.groupBy(*part_cols, BKT).agg(F.count(F.lit(1)).alias("_n"))
    wprev = (
        Window.partitionBy(*part_cols)
        .orderBy(BKT)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ledger = cnts.select(
        *part_cols,
        BKT,
        "_n",
        F.coalesce(F.sum("_n").over(wprev), F.lit(0))
        .cast("bigint")
        .alias("_start"),
    )

    # Candidate global index: rows before bucket + local ascending index.
    cand = cand.join(broadcast(ledger), [*part_cols, BKT]).withColumn(
        "_g", F.col("_start") + F.col("_n") - F.col("_rn_desc") + 1
    )

    # Ship a candidate to bucket b iff it is one of b's k global
    # predecessors: _start_b ∈ [g, g+k-1].
    tgt = ledger.filter(F.col("_start") > 0).select(
        *[F.col(c).alias(f"_t_{c}") for c in part_cols],
        F.col(BKT).alias("_t_bkt"),
        F.col("_start").alias("_t_start"),
    )
    cond = (F.col("_t_start") >= F.col("_g")) & (
        F.col("_t_start") <= F.col("_g") + F.lit(k - 1)
    )
    for c in part_cols:
        cond = cond & (F.col(c) == F.col(f"_t_{c}"))
    halo = cand.join(broadcast(tgt), cond).select(
        *df.columns, F.col("_t_bkt").alias(BKT), F.lit(True).alias(HALO)
    )
    own = b.select(*df.columns, BKT, F.lit(False).alias(HALO))
    return own.unionByName(halo)


def two_level_cumsum(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    val: Column,
    out: str = "_cum",
    npart: int | None = None,
) -> DataFrame:
    """``df`` + ``out`` = the inclusive running sum of ``val`` within
    ``part_cols`` along ``order_cols``, computed at full cluster
    parallelism even when ``part_cols`` has constant cardinality — the
    win_pareto/win_ntile pid recipe, surfaced for reuse (r5 VERDICT #7).

    Range-partition on (part_cols, order_cols), compute the local running
    sum per (part, pid), then add the broadcast exclusive prefix of
    per-(part, pid) totals over ascending pid. Exact when ``val`` is
    integer/DECIMAL (order-independent addition). An eager
    ``localCheckpoint`` pins ``spark_partition_id`` across the two branches
    that read it (the win_pareto recipe) while letting the blocks be
    GC-released when the frame goes out of scope — a plain ``persist``
    here leaked one cached event-grain frame per call from
    agg_gini/agg_weighted_median/win_ntile (r6 ADVICE). On a real cluster
    an executor loss invalidates localCheckpoint blocks and fails the job
    rather than silently recomputing with fresh (different) pids — the
    failure mode we want. Rows whose (part+order) key ties may land in
    different pids with a different interleaving than a single-task sort
    would produce — use only when downstream logic is tie-insensitive
    (sums of the tied rows commute; see agg_weighted_median's pick
    argument) or the order is a strict total order (agg_gini's (x, cust)).

    With ``val = F.lit(1).cast("bigint")`` and a strict total order this
    yields the global ROW_NUMBER per partition group.
    """
    if npart is None:
        spark = df.sparkSession
        try:
            npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            npart = 32
    cols = [F.col(c) for c in [*part_cols, *order_cols]]
    part = (
        df.repartitionByRange(npart, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    wloc = (
        Window.partitionBy(*part_cols, "_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    loc = part.withColumn("_lcum", F.sum(val).over(wloc))
    psums = part.groupBy(*part_cols, "_pid").agg(F.sum(val).alias("_psum"))
    wprev = (
        Window.partitionBy(*part_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = psums.select(
        *part_cols,
        "_pid",
        F.coalesce(F.sum("_psum").over(wprev), F.lit(0)).alias("_poff"),
    )
    return (
        loc.join(broadcast(off), [*part_cols, "_pid"])
        .withColumn(out, F.col("_lcum") + F.col("_poff"))
        .drop("_lcum", "_poff", "_pid")
    )


def bucket_offsets(
    df: DataFrame,
    part_cols: list[str],
    bkt_col: str,
    val: Column,
    out: str = "_off",
) -> DataFrame:
    """Per-(part, bucket) exclusive prefix sums of ``val`` — the broadcast
    offset table of a two-level running sum. The aggregate is map-side
    combinable (partial sums shuffle, never rows), so it is immune to
    per-bucket skew; the cumulative window runs over the tiny ledger only.
    ``val`` should be DECIMAL (or integer) so local + offset is exact."""
    sums = df.groupBy(*part_cols, bkt_col).agg(F.sum(val).alias("_bsum"))
    wprev = (
        Window.partitionBy(*part_cols)
        .orderBy(bkt_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return sums.select(
        *part_cols,
        bkt_col,
        F.coalesce(F.sum("_bsum").over(wprev), F.lit(0)).alias(out),
    )
