"""Time-series analytics operators (SURVEY.md §2.5 extension).

Reference status: absent (reference ``Main.java:1-7`` only); these are the
hypertable-style analytics a time-series OLAP engine ships beyond plain
windows: cohort retention, activity streaks, linear gap interpolation, and
z-score anomaly detection.

Determinism contract (see ``functions/exact.py``): float sums accumulate in
DECIMAL and cast to double once, so means/variances are bit-identical across
engines and partitionings; order-dependent statistics round at 4 decimals.

Scale notes: every operator here first SHRINKS the data (distinct day/week
grain, per-group sufficient statistics) before any wide operation, so the
shuffled volume is |users|x|periods| or |groups|, not |events|. Per-series
windows partition by the series key — skewed users cost sort time, never a
join blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from luxor_db_spark.catalog import load_table
from luxor_db_spark.functions.exact import DEC, q4
from luxor_db_spark.operators.bucketed import (
    BKT,
    HALO,
    bucket_offsets,
    with_trailing_halo,
)
from luxor_db_spark.registry import query


@query(
    "ts_retention",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS TIMESTAMP) AS active_week
      FROM events
    ),
    coh AS (
      SELECT user_id, active_week,
             MIN(active_week) OVER (PARTITION BY user_id) AS cohort_week
      FROM active
    )
    SELECT cohort_week,
           CAST((EPOCH(active_week) - EPOCH(cohort_week)) / 604800 AS BIGINT)
             AS week_offset,
           COUNT(*) AS n_active
    FROM coh GROUP BY cohort_week, week_offset
    """,
)
def ts_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-active week, counted
    in each subsequent week they return — the classic retention triangle.

    Scale shape: the first distinct collapses events to |users|x|weeks| rows
    BEFORE any window; the cohort week is a per-user window minimum (no
    second scan of events), and the final aggregate runs on the already-tiny
    grid. Week arithmetic stays integral (both engines truncate weeks to
    Monday 00:00 UTC, so offsets are exact multiples of 604800 s).

    Dialect note: DuckDB's date_trunc('week') yields DATE where Spark yields
    TIMESTAMP — the oracle casts back to TIMESTAMP to align the schema.
    """
    ev = load_table(spark, sf_dir, "events")
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    w = Window.partitionBy("user_id")
    coh = active.select(
        "active_week",
        F.min("active_week").over(w).alias("cohort_week"),
    )
    off = (
        (
            F.unix_timestamp("active_week")
            - F.unix_timestamp("cohort_week")
        )
        / 604800
    ).cast("bigint")
    return (
        coh.select("cohort_week", off.alias("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@query(
    "ts_streak",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    isl AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY d) AS INTEGER) AS grp
      FROM days
    ),
    runs AS (
      SELECT user_id, grp, COUNT(*) AS len FROM isl GROUP BY user_id, grp
    )
    SELECT user_id, MAX(len) AS max_streak,
           CAST(SUM(len) AS BIGINT) AS n_active_days
    FROM runs GROUP BY user_id
    """,
)
def ts_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user (gaps-and-islands):
    date minus row_number is constant within a run of consecutive days, so
    grouping by it splits runs without a self-join.

    Scale shape: events collapse to |users|x|days| distinct rows first; the
    window and both aggregates all key on user_id (one logical grain), and
    run length is a count, not a sequence materialization.
    """
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.select(
        "user_id", F.date_sub(F.col("d"), F.row_number().over(w)).alias("grp")
    )
    runs = isl.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    return runs.groupBy("user_id").agg(
        F.max("len").alias("max_streak"),
        F.sum("len").alias("n_active_days"),
    )


@query(
    "ts_anomaly",
    oracle="""
    WITH s AS (
      SELECT event_type, COUNT(value) AS n,
             SUM(CAST(value AS DECIMAL(18,6))) AS s1,
             SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
               AS s2
      FROM events GROUP BY event_type
    ),
    p AS (
      SELECT event_type,
             CAST(s1 AS DOUBLE) / n AS mu,
             SQRT((CAST(s2 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                  / (n - 1)) AS sigma
      FROM s
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - p.mu) / p.sigma, 4) AS z
    FROM events e JOIN p USING (event_type)
    WHERE ABS(e.value - p.mu) > 2.5 * p.sigma
    """,
)
def ts_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly detection: flag events whose value deviates more than
    2.5 sample standard deviations from their event type's mean.

    Determinism: mean and variance derive from exact DECIMAL sufficient
    statistics (s1, s2) — bit-identical across engines and partition orders
    — and the z threshold compares doubles built from those exact inputs
    with the same expression shape, so the flagged set is stable. The z
    output itself rounds at 4 decimals (exact.py rule 4).

    Scale shape: the stats aggregate map-side-combines to one row per event
    type, which broadcasts back onto the scan — the full table is never
    shuffled. This is the sketch-then-broadcast pattern every screening
    operator here uses.

    Overflow headroom (why s2 stays wide where ts_correlation narrowed):
    DECIMAL(18,6)^2 -> DECIMAL(37,12); both engines SUM that into a
    DECIMAL(38,12) accumulator with 1e26 of integer headroom. With
    per-event |value| <= 1e4 (fixture values are O(1e3)), the squared term
    is <= 1e8, so overflow needs > 1e18 rows *per event type* — beyond the
    100 TB target by orders of magnitude. ts_correlation narrowed because
    its accumulator multiplies two *sums* (each already O(n·v)), squaring
    the row-count factor; here the row-count factor is linear.
    """
    ev = load_table(spark, sf_dir, "events")
    vdec = F.col("value").cast(DEC)
    stats = ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.sum(vdec).alias("s1"),
        F.sum(vdec * vdec).alias("s2"),
    )
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    prof = stats.select(
        "event_type",
        (s1d / F.col("n")).alias("mu"),
        F.sqrt(
            (s2d - s1d * s1d / F.col("n")) / (F.col("n") - 1)
        ).alias("sigma"),
    )
    return (
        ev.join(F.broadcast(prof), "event_type")
        .filter(
            F.abs(F.col("value") - F.col("mu")) > 2.5 * F.col("sigma")
        )
        .select(
            "event_id",
            "event_type",
            "value",
            F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 4)
            .alias("z"),
        )
    )


@query(
    "ts_interpolate",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value)
               AS avg_v
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    bounds AS (
      SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM hourly
      GROUP BY event_type
    ),
    spine AS (
      SELECT event_type,
             CAST(unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                  AS TIMESTAMP) AS h
      FROM bounds
    ),
    j AS (
      SELECT s.event_type, s.h, hourly.avg_v
      FROM spine s LEFT JOIN hourly
        ON s.event_type = hourly.event_type AND s.h = hourly.h
    ),
    br AS (
      SELECT event_type, h, avg_v,
             last_value(avg_v IGNORE NULLS) OVER wp AS prev_v,
             last_value(CASE WHEN avg_v IS NOT NULL THEN h END IGNORE NULLS)
               OVER wp AS prev_h,
             first_value(avg_v IGNORE NULLS) OVER wn AS next_v,
             first_value(CASE WHEN avg_v IS NOT NULL THEN h END IGNORE NULLS)
               OVER wn AS next_h
      FROM j
      WINDOW wp AS (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             wn AS (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, h AS hour_start,
           CASE WHEN avg_v IS NOT NULL THEN avg_v
                WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
                  prev_v + (next_v - prev_v) *
                    ((EPOCH(h) - EPOCH(prev_h))
                     / (EPOCH(next_h) - EPOCH(prev_h)))
                ELSE NULL END AS v_interp,
           (avg_v IS NULL AND prev_v IS NOT NULL AND next_v IS NOT NULL)
             AS interpolated
    FROM br
    """,
)
def ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear gap interpolation over a dense hourly grid, per event type:
    hours with no events get the straight-line value between the nearest
    observed hours (NULL at the edges, where only one side exists). The
    linear-fill complement of `ts_gap_fill`'s LOCF.

    Determinism: hourly means use the exact-DECIMAL-sum convention; the
    interpolation formula is written with identical shape/parenthesization
    in both engines over exact integral epoch differences, so the doubles
    match bitwise.

    Scale shape: the spine is granularity-bounded (hours-in-range x
    n_types), independent of data volume; the hourly rollup map-side
    combines before the (small) spine join, and both bracketing windows
    partition by event_type — parallel across series.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        (F.sum(F.col("value").cast(DEC)).cast("double") / F.count("value"))
        .alias("avg_v")
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    j = spine.join(hourly, ["event_type", "h"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("avg_v").isNotNull(), F.col("h"))
    br = j.select(
        "event_type",
        "h",
        "avg_v",
        F.last("avg_v", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(obs_h, ignorenulls=True).over(wp).alias("prev_h"),
        F.first("avg_v", ignorenulls=True).over(wn).alias("next_v"),
        F.first(obs_h, ignorenulls=True).over(wn).alias("next_h"),
    )
    frac = (
        (F.unix_timestamp("h") - F.unix_timestamp("prev_h"))
        / (F.unix_timestamp("next_h") - F.unix_timestamp("prev_h"))
    )
    v_interp = (
        F.when(F.col("avg_v").isNotNull(), F.col("avg_v"))
        .when(
            F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(),
            F.col("prev_v")
            + (F.col("next_v") - F.col("prev_v")) * frac,
        )
    )
    return br.select(
        "event_type",
        F.col("h").alias("hour_start"),
        v_interp.alias("v_interp"),
        (
            F.col("avg_v").isNull()
            & F.col("prev_v").isNotNull()
            & F.col("next_v").isNotNull()
        ).alias("interpolated"),
    )


@query(
    "ts_correlation",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(14,2)) AS v
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.v AS x, b.v AS y
      FROM hourly a JOIN hourly b
        ON a.h = b.h AND a.event_type < b.event_type
    ),
    s AS (
      SELECT type_a, type_b, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM pairs GROUP BY type_a, type_b
    )
    SELECT type_a, type_b, n AS n_hours,
           ROUND((n * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (SQRT(n * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * SQRT(n * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4)
             AS corr
    FROM s
    """,
)
def ts_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-series Pearson correlation matrix: hourly value sums per event
    type, correlated pairwise over hours where both series observed
    (type_a < type_b keeps each unordered pair once).

    Determinism: all sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²)
    accumulate in exact DECIMAL, so they are identical across engines and
    partition orders; only the final correlation formula runs in double
    (same shape both sides) and rounds at 4 decimals (exact.py rule 4).

    Scale shape: the rollup collapses events to the granularity-bounded
    |hours| x |types| grid map-side; the self-join keys on the hour and the
    stats aggregate emits one row per type pair. Nothing event-sized ever
    joins or shuffles twice.
    """
    ev = load_table(spark, sf_dir, "events")
    # v is exact at DECIMAL(14,2): fixture values carry 2 decimals, and the
    # narrow precision keeps the x*y products inside DuckDB's int64/int128
    # decimal paths at every SF (DECIMAL(18,6) squares overflow at sf0.1).
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.sum(F.col("value").cast(DEC)).cast("decimal(14,2)").alias("v"))
    a, b = hourly.alias("a"), hourly.alias("b")
    pairs = a.join(
        b,
        (F.col("a.h") == F.col("b.h"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    ).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.col("a.v").alias("x"),
        F.col("b.v").alias("y"),
    )
    s = pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    corr = (
        F.col("n") * F.col("sxy").cast("double") - sxd * syd
    ) / (
        F.sqrt(F.col("n") * F.col("sxx").cast("double") - sxd * sxd)
        * F.sqrt(F.col("n") * F.col("syy").cast("double") - syd * syd)
    )
    return s.select(
        "type_a",
        "type_b",
        F.col("n").alias("n_hours"),
        F.round(corr, 4).alias("corr"),
    )


def _ewma_oracle() -> str:
    """Generate the DuckDB EWMA oracle with the exact literal weights and
    left-associative sum order the Spark expression uses (bit-identical
    doubles before the final ROUND)."""
    lam = 0.7
    lags = ", ".join(
        f"LAG(v, {k}) OVER w AS l{k}" for k in range(1, 24)
    )
    num = ["v * 1.0"]
    den = ["1.0"]
    for k in range(1, 24):
        wt = repr(lam**k)
        num.append(f"CASE WHEN l{k} IS NOT NULL THEN {wt} * l{k} ELSE 0 END")
        den.append(f"CASE WHEN l{k} IS NOT NULL THEN {wt} ELSE 0 END")
    return f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value)
               AS v
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    l AS (
      SELECT event_type, h, v, {lags}
      FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY h)
    )
    SELECT event_type, h, v,
           ROUND(({" + ".join(num)}) / ({" + ".join(den)}), 4) AS ewma
    FROM l
    """


@query("ts_ewma", oracle=_ewma_oracle())
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing exponentially-weighted moving average (lambda=0.7) over each
    event type's hourly mean, using the last 24 observations with weights
    normalized over however many actually exist (exact at series edges).

    True recursive EWMA is not window-expressible; the 24-term truncation
    carries >99.97% of the weight mass (0.7^24) and stays a single window
    pass: all 23 LAGs share one (event_type, h) sort — one shuffle, no
    self-join, no iteration.

    Determinism: hourly means use exact DECIMAL sums; every weight is the
    same Python-float literal in both engines and the weighted sum is built
    in the same left-associative order, so the doubles match bitwise before
    the final ROUND(.,4) (exact.py rule 4).
    """
    lam = 0.7
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        (F.sum(F.col("value").cast(DEC)).cast("double") / F.count("value"))
        .alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    num = F.col("v") * F.lit(1.0)
    den = F.lit(1.0)
    for k in range(1, 24):
        wt = F.lit(lam**k)
        lg = F.lag("v", k).over(w)
        num = num + F.when(lg.isNotNull(), wt * lg).otherwise(F.lit(0))
        den = den + F.when(lg.isNotNull(), wt).otherwise(F.lit(0))
    return hourly.select(
        "event_type", "h", "v", F.round(num / den, 4).alias("ewma")
    )


@query(
    "win_pareto",
    oracle="""
    WITH r AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(18,2))
               AS rev
      FROM orders GROUP BY o_custkey
    ),
    w AS (
      SELECT o_custkey, rev,
             SUM(rev) OVER (ORDER BY rev DESC, o_custkey
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS run,
             SUM(rev) OVER () AS tot,
             ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey) AS rk
      FROM r
    )
    SELECT o_custkey, CAST(rev AS DOUBLE) AS rev, rk,
           CAST(run AS DOUBLE) / CAST(tot AS DOUBLE) AS cum_share
    FROM w
    WHERE CAST(run AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.8
    """,
)
def win_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) analysis: customers ranked by revenue, with each
    one's running share of total revenue, cut at the 80% line.

    Determinism: revenue and both sums are exact DECIMAL; the share is one
    double division of bit-identical inputs, so the 0.8 boundary never
    flips between engines.

    Scale shape: the per-customer rollup shrinks orders to entity grain
    map-side FIRST. The global-order cumsum is then the shared
    bucketed.two_level_cumsum kernel — key-domain quantile buckets of the
    (negated, so ascending) revenue, local prefix sums per bucket in
    parallel, and a bounded O(#buckets) ledger supplying cross-bucket
    offsets and the grand total via broadcast. Wall-clock scales with
    1/#buckets instead of serializing all entities through one window
    task. The DESC order is expressed by negating rev (exact for
    DECIMAL), keeping the kernel ascending-only.

    Determinism: bucket *bounds* come from a quantile sketch, but results
    are invariant to where bounds fall — local run + exact-DECIMAL offset
    equals the global prefix sum for any split of a strict total order
    (o_custkey is unique at entity grain, so ties cannot straddle a
    boundary ambiguously). r8: bucket ids are pure functions of the row
    (boundary LITERALS collected once), so the old persist() pin — which
    existed only because spark_partition_id after a sampled range
    repartition could disagree across recomputations — is gone; the plan
    is recompute-deterministic by construction.
    """
    from luxor_db_spark.operators.bucketed import two_level_cumsum

    o = load_table(spark, sf_dir, "orders")
    r = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC))
        .cast("decimal(18,2)")
        .alias("rev")
    ).withColumn("nrev", -F.col("rev"))

    w = two_level_cumsum(
        r,
        [],
        ["nrev", "o_custkey"],
        vals={
            "run": F.col("rev"),
            "rk": F.lit(1).cast("bigint"),
        },
        totals=("run",),
    ).withColumnRenamed("run_tot", "tot")
    share = F.col("run").cast("double") / F.col("tot").cast("double")
    return w.filter(share <= 0.8).select(
        "o_custkey",
        F.col("rev").cast("double").alias("rev"),
        F.col("rk").cast("int").alias("rk"),
        share.alias("cum_share"),
    )


@query(
    "ts_calendar",
    oracle="""
    SELECT CAST(EXTRACT(dow FROM ts) + 1 AS INTEGER) AS dow,
           CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hr,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY dow, hr
    """,
)
def ts_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar heatmap rollup: activity count and value by (day-of-week,
    hour-of-day) — the seasonality fingerprint behind capacity planning.
    Output is bounded at 7x24 rows whatever the input size; one
    map-side-combinable aggregate, constant shuffle volume.

    Dialect note: Spark's dayofweek is 1-7 with Sunday=1; DuckDB's
    EXTRACT(dow) is 0-6 with Sunday=0, so the oracle adds 1.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hr")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
    )


@query(
    "ts_cusum_changepoint",
    oracle="""
    WITH s AS (
      SELECT event_type, COUNT(value) AS n,
             SUM(CAST(value AS DECIMAL(18,6))) AS s1
      FROM events GROUP BY event_type
    ),
    c AS (
      SELECT e.event_type, e.ts, e.event_id,
             SUM(CAST(e.value AS DECIMAL(18,6)) * s.n - s.s1)
               OVER (PARTITION BY e.event_type
                     ORDER BY e.ts, e.event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cusum_n
      FROM events e JOIN s USING (event_type)
    ),
    r AS (
      SELECT event_type, ts, event_id, cusum_n,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY ABS(CAST(cusum_n AS DOUBLE)) DESC, ts, event_id)
               AS rk,
             n FROM c JOIN s USING (event_type)
    )
    SELECT event_type, ts AS change_ts,
           FLOOR((ABS(CAST(cusum_n AS DOUBLE)) / n) * 10000 + 0.5) / 10000
             AS max_cusum
    FROM r WHERE rk = 1
    """,
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection: per event type, the running cumulative
    sum of deviations from the series mean peaks (in absolute value) at the
    most likely mean-shift point — the classic Page/CUSUM estimator.

    Exactness: the deviation (value − mean) is a ratio, so the cumsum is
    kept in *scaled-integer* form: Σ(n·value − s1) over exact DECIMALs
    equals n·Σ(value − mean) with no division until the final report —
    bit-identical across engines and partitionings. The argmax row is
    picked by (|cusum| DESC, ts, event_id), fully deterministic.

    Scale shape: the per-type sufficient stats (n, s1) map-side-combine to
    one row per type and broadcast back onto the scan (same
    sketch-then-broadcast shape as ts_anomaly). The running sum is a
    TWO-LEVEL PREFIX SUM over (event_type, day-bucket): local per-bucket
    cumsum at |types|x|days| parallelism plus a broadcast per-bucket
    offset table (exact because every term is DECIMAL — the win_pareto
    pattern, with buckets derived from data instead of sampling). The
    argmax is a struct-min aggregate (map-side combinable), not a second
    event-grain window.
    """
    ev = load_table(spark, sf_dir, "events")
    vdec = F.col("value").cast(DEC)
    stats = ev.groupBy("event_type").agg(
        F.count("value").alias("n"), F.sum(vdec).alias("s1")
    )
    j = ev.join(F.broadcast(stats), "event_type").withColumn(
        BKT, F.date_trunc("day", F.col("ts"))
    )
    dev = vdec * F.col("n") - F.col("s1")
    wloc = (
        Window.partitionBy("event_type", BKT)
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    loc = j.select(
        "event_type",
        BKT,
        "ts",
        "event_id",
        "n",
        F.sum(dev).over(wloc).alias("_lrun"),
    )
    off = bucket_offsets(j, ["event_type"], BKT, dev)
    c = loc.join(F.broadcast(off), ["event_type", BKT]).withColumn(
        "cusum_n", F.col("_lrun") + F.col("_off")
    )
    # Deterministic argmax by (|cusum| DESC, ts, event_id): min of a
    # (-|cusum|, ts, event_id) struct — lexicographic, map-combinable.
    pick = c.groupBy("event_type", "n").agg(
        F.min(
            F.struct(
                (-F.abs(F.col("cusum_n").cast("double"))).alias("negabs"),
                F.col("ts").alias("ts"),
                F.col("event_id").alias("event_id"),
            )
        ).alias("m")
    )
    return pick.select(
        "event_type",
        F.col("m.ts").alias("change_ts"),
        q4(-F.col("m.negabs") / F.col("n")).alias("max_cusum"),
    )


@query(
    "win_moving_median",
    oracle="""
    SELECT event_type, ts, event_id,
           ROUND(median(value) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med7
    FROM events
    """,
)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing 7-observation moving median per series — the robust
    smoother (median filters ignore outliers that wreck moving averages).

    Spark has no exact windowed median, so the frame is materialized as a
    sorted array (≤ 7 doubles) and the median picked positionally —
    interpolating the two middle elements for even counts, exactly
    DuckDB's `median` semantics for DOUBLE. The frame array is bounded (7
    elements) so this stays O(1) memory per row; both engines see the same
    doubles, and ROUND(·,4) guards the one even-count midpoint addition.

    Scale shape: bucket-with-halo (operators/bucketed.py) — the window
    partitions by (event_type, day-bucket) with the 6 globally-preceding
    rows replicated into each bucket, so parallelism is |types|×|days|,
    not |types|; results are identical to the global per-type frame (the
    oracle is unchanged, and halo rows are dropped from the output).
    """
    ev = load_table(spark, sf_dir, "events")
    aug = with_trailing_halo(
        ev.select("event_type", "ts", "event_id", "value"),
        ["event_type"],
        ["ts", "event_id"],
        F.date_trunc("day", F.col("ts")),
        6,
    )
    w = (
        Window.partitionBy("event_type", BKT)
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    mid_hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    mid_lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    med = F.when(n % 2 == 1, mid_hi).otherwise((mid_lo + mid_hi) / 2.0)
    return (
        aug.select(
            "event_type",
            "ts",
            "event_id",
            F.round(med, 4).alias("med7"),
            HALO,
        )
        .filter(~F.col(HALO))
        .drop(HALO)
    )


@query(
    "ts_seasonal_index",
    oracle="""
    WITH h AS (
      SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) AS hr,
             COUNT(value) AS n,
             SUM(CAST(value AS DECIMAL(18,6))) AS s
      FROM events GROUP BY event_type, hr
    ),
    g AS (
      SELECT event_type, CAST(SUM(n) AS BIGINT) AS gn, SUM(s) AS gs
      FROM h GROUP BY event_type
    )
    SELECT h.event_type, h.hr, CAST(h.n AS BIGINT) AS n_obs,
           FLOOR(((CAST(h.s AS DOUBLE) / h.n)
                  / (CAST(g.gs AS DOUBLE) / g.gn)) * 10000 + 0.5) / 10000
             AS seasonal_idx
    FROM h JOIN g ON h.event_type = g.event_type
    """,
)
def ts_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal index per series: each hour's mean value
    relative to the series' overall mean (1.0 = no seasonality) — the
    multiplicative-decomposition profile used for seasonally-adjusted
    anomaly thresholds and load forecasts.

    Determinism: both means come from exact DECIMAL sums over integer
    counts; the index is one double division chain of bit-identical
    inputs, ROUNDed at 4.

    Scale shape: the hourly rollup map-side-combines to ≤ |types|×24 rows;
    the per-type totals aggregate THAT (not the events) and join back on
    the tiny grain — one events shuffle total.
    """
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hr")
    ).agg(
        F.count("value").alias("n"),
        F.sum(F.col("value").cast(DEC)).alias("s"),
    )
    g = h.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("gn"), F.sum("s").alias("gs")
    )
    return h.join(F.broadcast(g), "event_type").select(
        "event_type",
        "hr",
        F.col("n").cast("bigint").alias("n_obs"),
        q4(
            (F.col("s").cast("double") / F.col("n"))
            / (F.col("gs").cast("double") / F.col("gn"))
        ).alias("seasonal_idx"),
    )


@query(
    "win_bollinger",
    oracle="""
    WITH w AS (
      SELECT event_type, ts, event_id, value,
             COUNT(*) OVER f AS n,
             SUM(CAST(value AS DECIMAL(18,6))) OVER f AS s1,
             SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
               OVER f AS s2
      FROM events
      WINDOW f AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, ts, event_id,
           FLOOR((CAST(s1 AS DOUBLE) / n) * 10000 + 0.5) / 10000 AS ma20,
           ROUND(CAST(s1 AS DOUBLE) / n
                 + 2 * SQRT(GREATEST((CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / n,
                       0)), 4) AS upper_band,
           ROUND(CAST(s1 AS DOUBLE) / n
                 - 2 * SQRT(GREATEST((CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / n,
                       0)), 4) AS lower_band
    FROM w WHERE n >= 20
    """,
)
def win_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands: trailing 20-observation mean ± 2 population
    standard deviations per series — the volatility envelope, emitted
    only once the frame is full (n ≥ 20).

    Determinism: the frame's sufficient statistics (n, Σv, Σv²) are exact
    DECIMAL window sums, so mean and variance are bit-identical across
    engines and partitionings; GREATEST(·, 0) guards the tiny negative
    residue the subtraction form can produce in double space, identically
    on both sides.

    Scale shape: bucket-with-halo (operators/bucketed.py) — the window
    partitions by (event_type, day-bucket) with the 19 globally-preceding
    rows replicated per bucket; all three statistics share one frame and
    one window pass at |types|×|days| parallelism. Identical output to the
    global per-type frame (oracle unchanged; halo rows dropped).
    """
    ev = load_table(spark, sf_dir, "events")
    aug = with_trailing_halo(
        ev.select("event_type", "ts", "event_id", "value"),
        ["event_type"],
        ["ts", "event_id"],
        F.date_trunc("day", F.col("ts")),
        19,
    )
    f = (
        Window.partitionBy("event_type", BKT)
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    vdec = F.col("value").cast(DEC)
    w = aug.select(
        "event_type",
        "ts",
        "event_id",
        HALO,
        F.count(F.lit(1)).over(f).alias("n"),
        F.sum(vdec).over(f).alias("s1"),
        F.sum(vdec * vdec).over(f).alias("s2"),
    ).filter(~F.col(HALO))
    s1d, s2d, n = (
        F.col("s1").cast("double"),
        F.col("s2").cast("double"),
        F.col("n"),
    )
    ma = s1d / n
    sd = F.sqrt(F.greatest((s2d - s1d * s1d / n) / n, F.lit(0.0)))
    return w.filter(n >= 20).select(
        "event_type",
        "ts",
        "event_id",
        q4(ma).alias("ma20"),
        F.round(ma + 2 * sd, 4).alias("upper_band"),
        F.round(ma - 2 * sd, 4).alias("lower_band"),
    )


def _acf_oracle() -> str:
    lag_selects = " UNION ALL ".join(
        f"SELECT event_type, {k} AS lag, v AS x, "
        f"LAG(v, {k}) OVER (PARTITION BY event_type ORDER BY h) AS y "
        f"FROM hourly"
        for k in range(1, 7)
    )
    return f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(14,2)) AS v
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    lagged AS ({lag_selects}),
    pairs AS (SELECT * FROM lagged WHERE y IS NOT NULL),
    s AS (
      SELECT event_type, lag, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM pairs GROUP BY event_type, lag
    )
    SELECT event_type, CAST(lag AS INT) AS lag, n AS n_pairs,
           ROUND((n * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (SQRT(n * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * SQRT(n * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4)
             AS acf
    FROM s
    """


@query("ts_acf", oracle=_acf_oracle())
def ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function at lags 1–6 over each series' hourly sums
    — the periodicity detector (a daily cycle shows as a peak near the
    24-lag family; short-range dependence decays smoothly).

    Determinism: identical to ts_correlation — exact DECIMAL(14,2) hourly
    sums, exact sufficient statistics per (series, lag), one double
    Pearson expression with the same shape both engines, ROUND 4.

    Scale shape: after the map-combinable hourly rollup, all six lags
    share ONE (event_type, h) window sort (six LAG expressions over the
    same windowspec — no self-joins); the pair statistics aggregate on
    the (series, lag) grain. Work is bounded by hours-in-range ×
    n_series × 6, independent of event volume.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.sum(F.col("value").cast(DEC)).cast("decimal(14,2)").alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    with_lags = hourly.select(
        "event_type",
        "v",
        *[F.lag("v", k).over(w).alias(f"l{k}") for k in range(1, 7)],
    )
    lagged = with_lags.select(
        "event_type",
        F.col("v").alias("x"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"), F.col(f"l{k}").alias("y")
                    )
                    for k in range(1, 7)
                ]
            )
        ).alias("e"),
    ).select(
        "event_type", F.col("e.lag").alias("lag"), "x", F.col("e.y").alias("y")
    )
    pairs = lagged.filter(F.col("y").isNotNull())
    s = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    acf = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return s.select(
        "event_type",
        F.col("lag").cast("int").alias("lag"),
        F.col("n").alias("n_pairs"),
        F.round(acf, 4).alias("acf"),
    )


@query(
    "ts_mann_kendall",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(14,2)) AS v
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    p AS (
      SELECT a.event_type,
             CASE WHEN b.v > a.v THEN 1
                  WHEN b.v < a.v THEN -1 ELSE 0 END AS sgn
      FROM hourly a JOIN hourly b
        ON a.event_type = b.event_type AND a.h < b.h
    )
    SELECT event_type,
           CAST(SUM(sgn) AS BIGINT) AS s_stat,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CASE WHEN SUM(sgn) > 0 THEN 'increasing'
                WHEN SUM(sgn) < 0 THEN 'decreasing'
                ELSE 'no trend' END AS trend
    FROM p GROUP BY event_type
    """,
)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend statistic per series: S = Σ sign(v_j − v_i)
    over all hour pairs i<j — the nonparametric monotone-trend detector
    (robust to outliers and missing hours, no distribution assumption).

    Exactness: hourly sums are exact DECIMAL(14,2), so every pairwise
    sign is exact and S is an integer — no floats anywhere.

    Scale shape: the pair join runs on the GRANULARITY-BOUNDED hourly
    grid (hours-in-range × n_series rows, independent of event volume),
    keyed by series — the same bounded self-join family as
    ts_correlation. The event-volume work is one map-combinable rollup.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.sum(F.col("value").cast(DEC)).cast("decimal(14,2)").alias("v")
    )
    a, b = hourly.alias("a"), hourly.alias("b")
    sgn = (
        F.when(F.col("b.v") > F.col("a.v"), 1)
        .when(F.col("b.v") < F.col("a.v"), -1)
        .otherwise(0)
    )
    p = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.h") < F.col("b.h")),
    ).select(F.col("a.event_type").alias("event_type"), sgn.alias("sgn"))
    s = F.sum("sgn")
    return p.groupBy("event_type").agg(
        s.cast("bigint").alias("s_stat"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.when(s > 0, "increasing")
        .when(s < 0, "decreasing")
        .otherwise("no trend")
        .alias("trend"),
    )


@query(
    "win_drawdown",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(14,2)) AS v
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    c AS (
      SELECT event_type, h,
             SUM(v) OVER (PARTITION BY event_type ORDER BY h
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM hourly
    ),
    d AS (
      SELECT event_type, h, cum,
             MAX(cum) OVER (PARTITION BY event_type ORDER BY h
                            ROWS UNBOUNDED PRECEDING) AS peak
      FROM c
    )
    SELECT event_type,
           CAST(MAX(peak - cum) AS DOUBLE) AS max_drawdown,
           CAST(MAX(peak) AS DOUBLE) AS peak_value
    FROM d GROUP BY event_type
    """,
)
def win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per series: largest peak-to-trough fall of the
    running (cumulative) value — THE risk statistic for any cumulative
    metric (P&L, capacity headroom, error budgets).

    Exactness: the cumulative sum, its running max, and their difference
    all stay exact DECIMAL; only the final report casts to double.

    Scale shape: two stacked windows over the SAME (event_type, h) sort —
    Catalyst evaluates both in one window stage after the hourly rollup's
    single shuffle; the grid is granularity-bounded.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.sum(F.col("value").cast(DEC)).cast("decimal(14,2)").alias("v")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = hourly.select(
        "event_type", "h", F.sum("v").over(w).alias("cum")
    )
    d = c.select(
        "event_type",
        F.col("cum"),
        F.max("cum").over(w).alias("peak"),
    )
    return d.groupBy("event_type").agg(
        F.max(F.col("peak") - F.col("cum"))
        .cast("double")
        .alias("max_drawdown"),
        F.max("peak").cast("double").alias("peak_value"),
    )


@query(
    "ts_burst_detect",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    base AS (
      SELECT event_type, CAST(SUM(n) AS BIGINT) AS total,
             COUNT(*) AS n_hours
      FROM hourly GROUP BY event_type
    ),
    flagged AS (
      SELECT h.event_type, h.h, h.n,
             CAST(h.n AS DOUBLE) * b.n_hours / b.total AS rate_ratio
      FROM hourly h JOIN base b ON h.event_type = b.event_type
      WHERE CAST(h.n AS DOUBLE) * b.n_hours / b.total >= 1.5
    ),
    isl AS (
      SELECT event_type, h, n, rate_ratio,
             h - ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h)
                 * INTERVAL 1 HOUR AS grp
      FROM flagged
    )
    SELECT event_type,
           MIN(h) AS burst_start, MAX(h) AS burst_end,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           CAST(SUM(n) AS BIGINT) AS n_events,
           FLOOR(MAX(rate_ratio) * 10000 + 0.5) / 10000 AS peak_ratio
    FROM isl GROUP BY event_type, grp
    """,
)
def ts_burst_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection: hours whose event rate is ≥1.5× the series'
    baseline, merged into contiguous burst INTERVALS (gaps-and-islands)
    with duration, volume and peak intensity — the incident/trending
    detector (Kleinberg-style two-state approximation).

    Determinism: rates are ratios of exact integers with identical
    expression shape; the island key subtracts row_number hours from the
    hour timestamp — exact timestamp arithmetic in both engines.

    Scale shape: events collapse to the hourly grid map-side; baseline
    totals aggregate THAT; flag + islands run per series on the bounded
    grid. One fact shuffle, everything else granularity-bounded.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    base = hourly.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("total"),
        F.count(F.lit(1)).alias("n_hours"),
    )
    ratio = F.col("n").cast("double") * F.col("n_hours") / F.col("total")
    flagged = (
        hourly.join(F.broadcast(base), "event_type")
        .withColumn("rate_ratio", ratio)
        .filter(F.col("rate_ratio") >= 1.5)
    )
    w = Window.partitionBy("event_type").orderBy("h")
    isl = flagged.select(
        "event_type",
        "h",
        "n",
        "rate_ratio",
        (
            F.col("h").cast("timestamp")
            - F.make_interval(hours=F.row_number().over(w))
        ).alias("grp"),
    )
    return isl.groupBy("event_type", "grp").agg(
        F.min("h").alias("burst_start"),
        F.max("h").alias("burst_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum("n").cast("bigint").alias("n_events"),
        q4(F.max("rate_ratio")).alias("peak_ratio"),
    ).drop("grp")


@query(
    "ts_wow_change",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,2)) AS v
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    wow AS (
      SELECT event_type, d, v,
             LAG(v, 7) OVER (PARTITION BY event_type ORDER BY d) AS v_prev
      FROM daily
    )
    SELECT event_type, d, CAST(v AS DOUBLE) AS v,
           CAST(v_prev AS DOUBLE) AS v_prev,
           FLOOR(((CAST(v AS DOUBLE) - CAST(v_prev AS DOUBLE))
                  / CAST(v_prev AS DOUBLE) * 100) * 10000 + 0.5) / 10000
             AS pct_wow
    FROM wow WHERE v_prev IS NOT NULL
    """,
)
def ts_wow_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week percent change of each series' daily total — the
    growth/regression metric every operational dashboard leads with,
    computed against the same weekday (LAG 7 on the daily grid) so
    weekly seasonality cancels.

    Determinism: daily totals are exact DECIMAL; the percent change is
    one double expression of exact inputs, ROUND 4.

    Scale shape: map-combinable daily rollup, then one (event_type)
    window over the date-bounded grid.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(
        F.sum(F.col("value").cast(DEC)).cast("decimal(18,2)").alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    wow = daily.withColumn("v_prev", F.lag("v", 7).over(w)).filter(
        F.col("v_prev").isNotNull()
    )
    vd, pd_ = F.col("v").cast("double"), F.col("v_prev").cast("double")
    return wow.select(
        "event_type",
        "d",
        vd.alias("v"),
        pd_.alias("v_prev"),
        q4((vd - pd_) / pd_ * 100).alias("pct_wow"),
    )


@query(
    "ts_cohort_ltv",
    oracle="""
    WITH firstw AS (
      SELECT user_id,
             CAST(MIN(date_trunc('week', ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY user_id
    ),
    rev AS (
      SELECT f.cohort_week,
             CAST((EPOCH(CAST(date_trunc('week', e.ts) AS TIMESTAMP))
                   - EPOCH(f.cohort_week)) / 604800 AS BIGINT) AS week_offset,
             SUM(CAST(e.value AS DECIMAL(18,6))) AS wk_rev
      FROM events e JOIN firstw f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY f.cohort_week, week_offset
    )
    SELECT cohort_week, week_offset,
           CAST(SUM(wk_rev) OVER (PARTITION BY cohort_week
                                  ORDER BY week_offset
                                  ROWS UNBOUNDED PRECEDING)
                AS DOUBLE) AS cum_revenue
    FROM rev
    """,
)
def ts_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: cumulative purchase revenue per
    signup-week cohort as a function of weeks since first activity — the
    payback/LTV view product teams read next to the retention triangle
    (`ts_retention`).

    Determinism: weekly revenue is an exact DECIMAL sum; the cumulative
    window sums exact DECIMALs (order-independent), casting to double
    only in the report.

    Scale shape: the cohort assignment is a per-user MIN (map-combinable)
    broadcast back onto the purchase scan; revenue collapses to the
    (cohort, offset) grid BEFORE the cumulative window, which runs on
    that tiny grid partitioned by cohort.
    """
    ev = load_table(spark, sf_dir, "events")
    firstw = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort_week")
    )
    purchases = ev.filter(F.col("event_type") == "purchase")
    off = (
        (
            F.unix_timestamp(F.date_trunc("week", F.col("ts")))
            - F.unix_timestamp("cohort_week")
        )
        / 604800
    ).cast("bigint")
    rev = (
        purchases.join(firstw, "user_id")
        .groupBy("cohort_week", off.alias("week_offset"))
        .agg(F.sum(F.col("value").cast(DEC)).alias("wk_rev"))
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return rev.select(
        "cohort_week",
        "week_offset",
        F.sum("wk_rev").over(w).cast("double").alias("cum_revenue"),
    )


@query(
    "ts_gap_stats",
    oracle="""
    WITH g AS (
      SELECT user_id,
             CAST(FLOOR(EPOCH(ts)) AS BIGINT)
             - CAST(FLOOR(EPOCH(LAG(ts) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id)))
                    AS BIGINT) AS gap_s
      FROM events
    ),
    f AS (SELECT user_id, gap_s FROM g WHERE gap_s IS NOT NULL)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           ROUND(quantile_cont(gap_s, 0.5), 4) AS p50_gap_s,
           ROUND(quantile_cont(gap_s, 0.9), 4) AS p90_gap_s,
           CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
    FROM f GROUP BY user_id
    """,
)
def ts_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap distribution per user (median / p90 / max of
    seconds between consecutive events) — the analysis that CALIBRATES
    every gap-threshold operator here: `ts_sessionize`'s 30-minute cut
    and `stream_session`'s session window should sit in the valley
    between p90 intra-session gaps and typical between-session gaps.

    Determinism: gaps are exact integer seconds (floored epochs, tie
    order pinned by event_id); the exact interpolated percentile is the
    same linear rule in both engines over integer inputs, ROUND 4.

    Scale shape: one (user_id) window for the LAG, then a per-user
    aggregate on the same partitioning — single shuffle. Exact
    percentiles buffer per-user gap lists; at 100 TB swap in
    approx_percentile (the `agg_approx_percentile` path).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        (
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.round(F.expr("percentile(gap_s, 0.5)"), 4).alias("p50_gap_s"),
        F.round(F.expr("percentile(gap_s, 0.9)"), 4).alias("p90_gap_s"),
        F.max("gap_s").cast("bigint").alias("max_gap_s"),
    )


@query(
    "ts_outlier_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type,
             quantile_cont(ABS(e.value - m.med), 0.5) AS mad, m.med
      FROM events e JOIN med m ON e.event_type = m.event_type
      GROUP BY e.event_type, m.med
    )
    SELECT e.event_id, e.event_type, e.value,
           FLOOR(((e.value - m.med) / (1.4826 * m.mad)) * 10000 + 0.5)
             / 10000 AS robust_z
    FROM events e JOIN mad m ON e.event_type = m.event_type
    WHERE ABS(e.value - m.med) > 3 * 1.4826 * m.mad
    """,
)
def ts_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via Median Absolute Deviation: flag
    events beyond 3 robust standard deviations (MAD × 1.4826) from the
    per-series median — the detector that, unlike z-scores
    (`ts_anomaly`), is NOT corrupted by the very outliers it hunts
    (median and MAD have 50% breakdown; mean/stddev have 0%).

    Determinism: the exact interpolated median is the same linear rule in
    both engines; the robust-z expression has identical shape, ROUND 4;
    the flag threshold compares the same doubles.

    Scale shape: two sketch-then-broadcast passes (per-type median, then
    per-type MAD of residuals) — the stats grain is |types|, broadcast
    back onto the scan both times, so events never shuffle. Exact
    medians buffer per-type values; approx_percentile is the 100 TB
    drop-in.
    """
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(
            F.expr("percentile(ABS(value - med), 0.5)").alias("mad")
        )
    )
    j = ev.join(F.broadcast(mad), "event_type")
    return j.filter(
        F.abs(F.col("value") - F.col("med")) > 3 * 1.4826 * F.col("mad")
    ).select(
        "event_id",
        "event_type",
        "value",
        q4(
            (F.col("value") - F.col("med")) / (1.4826 * F.col("mad"))
        ).alias("robust_z"),
    )
