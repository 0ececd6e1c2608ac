"""§2.5 Window functions (SURVEY.md).

Reference status: absent (reference ``Main.java:1-7`` only).

Determinism contract: every ORDER BY inside a window carries a unique
tiebreaker column (orderkey/event_id) so rank assignments are identical
across engines and partitionings. Rank-family values (rank/dense_rank/
percent_rank/cume_dist) are tie-stable by definition and need no tiebreak.

Scale notes: a window = one shuffle on partitionBy + per-partition sort.
All partitions here (customer, returnflag, user) are high-cardinality or
low-skew; per-group top-k uses row_number + filter, which Catalyst rewrites
to a group-limit (InferWindowGroupLimit) instead of a full sort+filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from luxor_db_spark.catalog import load_table
from luxor_db_spark.functions.exact import q4
from luxor_db_spark.operators.bucketed import BKT
from luxor_db_spark.registry import query


@query(
    "win_row_number",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS rn
    FROM orders
    """,
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey", "o_custkey", F.row_number().over(w).alias("rn")
    )


@query(
    "win_rank_dense",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           RANK()       OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rnk,
           DENSE_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS drnk
    FROM lineitem
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-ledger rewrite (r6): RANK/DENSE_RANK over (flag | quantity)
    depend only on the (l_returnflag, l_quantity) pair, and l_quantity has
    a bounded domain (TPC-H: 1..50), so instead of sorting raw lineitem
    rows inside |l_returnflag|=3 window partitions (parallelism capped at
    3, each task sorting N/3 rows at 100×), aggregate a ≤3×50-row value
    ledger (map-combinable count), compute both ranks with a window over
    the LEDGER only, and broadcast-join the ranks back to the rows —
    a map-only pass over the fact table. RANK = 1 + exclusive prefix count
    of smaller values; DENSE_RANK = the value's index in the sorted
    distinct list. Ties need no tiebreak: both functions are tie-stable.
    rnk stays BIGINT: it comes from a SUM, not a window rank function, so
    the bigint is free and a flag partition past 2^31 rows can't wrap
    (native rank() shares IntegerType's limit; the ledger need not).
    """
    li = load_table(spark, sf_dir, "lineitem")
    cnts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    wled = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    wprev = wled.rowsBetween(Window.unboundedPreceding, -1)
    led = cnts.select(
        "l_returnflag",
        "l_quantity",
        (F.coalesce(F.sum("_cnt").over(wprev), F.lit(0)) + 1)
        .cast("bigint")
        .alias("rnk"),
        F.row_number().over(wled).alias("drnk"),
    )
    return li.join(broadcast(led), ["l_returnflag", "l_quantity"]).select(
        "l_orderkey", "l_linenumber", "rnk", "drnk"
    )


@query(
    "win_ntile",
    oracle="""
    SELECT o_orderkey,
           NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
    FROM orders
    """,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ntile WITHOUT a global-sort single task: the shared
    bucketed.two_level_cumsum kernel (key-domain quantile buckets, local
    row_number per bucket, broadcast exclusive bucket-count offsets)
    yields each row's GLOBAL rank rk — and the total n for free via
    ``totals`` — at #buckets-way parallelism. NTILE(k) is then a closed
    form of (rk, n): with q = n div k, r = n mod k, the first r tiles
    hold q+1 rows, so
    tile = ceil(rk/(q+1))                    for rk ≤ r·(q+1)
         = r + ceil((rk − r·(q+1))/q)        otherwise
    computed in exact BIGINT arithmetic (ceil(a/b) = (a+b−1) div b) — no
    floats, engine-portable. (o_totalprice, o_orderkey) is a strict total
    order, so ranks — and therefore tiles — are deterministic under any
    bucket split. r8: bucket ids are pure functions of the row (quantile
    literals), so no persist/localCheckpoint pin is needed — the plan is
    recompute-deterministic by construction.
    """
    from luxor_db_spark.operators.bucketed import two_level_cumsum

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    rk = two_level_cumsum(
        o,
        [],
        ["o_totalprice", "o_orderkey"],
        F.lit(1).cast("bigint"),
        out="rk_",
        totals=("rk_",),
    ).withColumnRenamed("rk__tot", "n")

    k = F.lit(4).cast("bigint")
    q = F.expr("n div 4")
    r = F.col("n") % k
    big = q + F.lit(1)
    in_big = F.col("rk_") <= r * big
    # exact integer ceil-div in both branches
    tile = F.when(
        in_big, F.expr("(rk_ + big_ - 1) div big_")
    ).otherwise(r + F.expr("(rk_ - r_ * big_ + q_ - 1) div q_"))
    return (
        rk.withColumn("q_", q)
        .withColumn("r_", r)
        .withColumn("big_", big)
        .select(
            "o_orderkey",
            tile.cast("int").alias("quartile"),
        )
    )


@query(
    "win_percent",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           PERCENT_RANK() OVER (PARTITION BY l_returnflag
                                ORDER BY l_quantity) AS pr,
           CUME_DIST() OVER (PARTITION BY l_returnflag
                             ORDER BY l_quantity) AS cd
    FROM lineitem
    """,
)
def win_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw (unrounded) on purpose: both engines compute the same integer
    ratio (rank-1)/(n-1) as one double division → bit-identical, while
    ROUND could land on an exact tie (e.g. rank/n = 0.00005).

    Value-ledger rewrite (r6, same recipe as win_rank_dense): PERCENT_RANK
    and CUME_DIST over (flag | quantity) are pure functions of the
    ≤3×50-row (l_returnflag, l_quantity) count ledger — (rank−1)/(n−1) and
    (inclusive prefix)/n from the same integers Spark's window would use,
    so the double divisions are bit-identical. No raw-row window: the fact
    table sees one map-combinable count and one broadcast join back.
    PERCENT_RANK of a 1-row partition is 0 by definition (guarded)."""
    li = load_table(spark, sf_dir, "lineitem")
    cnts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    wled = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    wprev = wled.rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.partitionBy("l_returnflag")
    pre = F.coalesce(F.sum("_cnt").over(wprev), F.lit(0))
    n = F.sum("_cnt").over(wall)
    led = cnts.select(
        "l_returnflag",
        "l_quantity",
        F.when(n > 1, pre.cast("double") / (n - 1).cast("double"))
        .otherwise(F.lit(0.0))
        .alias("pr"),
        ((pre + F.col("_cnt")).cast("double") / n.cast("double")).alias("cd"),
    )
    return li.join(broadcast(led), ["l_returnflag", "l_quantity"]).select(
        "l_orderkey", "l_linenumber", "pr", "cd"
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value, 1, 0.0) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS prev_value,
           LEAD(event_id, 1)  OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_event
    FROM events
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value", 1, 0.0).over(w).alias("prev_value"),
        F.lead("event_id", 1).over(w).alias("next_event"),
    )


@query(
    "win_first_last",
    oracle="""
    SELECT o_orderkey, o_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey)  OVER w AS last_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last over an explicit full-partition frame (last_value with the
    default frame is a classic footgun — it would return the current row)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
    )


@query(
    "win_running",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total,
           COUNT(*) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS running_n
    FROM orders
    """,
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals; DECIMAL accumulation keeps every prefix sum exact and
    engine-identical (functions/exact.py contract)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


@query(
    "win_moving",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             AS moving_avg7
    FROM events
    """,
)
def win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving average (decimal-sum / count, exact and portable)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        (
            F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
            / F.count("value").over(w)
        ).alias("moving_avg7"),
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           COUNT(*) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                          RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_within5
    FROM lineitem
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: value-based bounds over the numeric order key.

    Value-ledger rewrite (r6, same recipe as win_rank_dense): the RANGE
    [q−5, q] count depends only on (l_returnflag, l_quantity), so compute
    it with a self-join of the ≤3×50-row count ledger (every pair of
    distinct values within the range band) and broadcast the per-value
    answers back to the rows — the raw fact table is never sorted or
    windowed."""
    li = load_table(spark, sf_dir, "lineitem")
    cnts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    # The SAME range frame, evaluated over the ledger instead of the rows:
    # summing per-value counts within [q-5, q] gives each distinct value's
    # answer in one pass over <=150 rows (one fact scan, not three).
    wrange = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rangeBetween(-5, Window.currentRow)
    )
    led = cnts.select(
        "l_returnflag",
        "l_quantity",
        F.sum("_cnt").over(wrange).alias("n_within5"),
    )
    return li.join(broadcast(led), ["l_returnflag", "l_quantity"]).select(
        "l_orderkey", "l_linenumber", "l_quantity", "n_within5"
    )


@query(
    "win_topk_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
)
def win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: row_number + filter; Catalyst's
    InferWindowGroupLimit keeps only k rows per group before the sort."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "ts_gap_fill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events WHERE event_type = 'purchase'
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS TIMESTAMP)
             AS hour_start
      FROM bounds
    ),
    hourly AS (
      SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT hour_start, COALESCE(n, 0) AS n,
           last_value(sv IGNORE NULLS) OVER (
             ORDER BY hour_start
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_sum
    FROM spine LEFT JOIN hourly ON hour_start = h
    """,
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill + LOCF (the hypertable-rollup pattern): build a
    dense hourly spine from the observed range, left-join the sparse hourly
    rollup, zero-fill counts, carry the last observed sum forward across
    empty hours.

    The spine derives from a 1-row min/max aggregate crossed with
    `sequence` — no driver-side collect. The global LOCF window is safe
    because the spine is granularity-bounded (hours in range), not
    data-sized; a multi-series version partitions the window by series key.
    """
    from luxor_db_spark.functions.exact import dsum

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_start")
    )
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("sv"))
    )
    w = Window.orderBy("hour_start").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        spine.join(hourly, spine.hour_start == hourly.h, "left")
        .select(
            "hour_start",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.last("sv", ignorenulls=True).over(w).alias("locf_sum"),
        )
    )


@query(
    "win_nth_value",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           nth_value(o_totalprice, 2) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_price
    FROM orders
    """,
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over a running frame: each row sees the customer's 2nd
    order price once it exists (NULL before) — the 'value as of the n-th
    occurrence' primitive."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@query(
    "win_funnel",
    oracle="""
    WITH stages AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           COUNT(t_view) AS n_view,
           CAST(SUM(CASE WHEN t_click > t_view THEN 1 ELSE 0 END)
                AS BIGINT) AS n_view_click,
           CAST(SUM(CASE WHEN t_purchase > t_click AND t_click > t_view
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
    FROM stages
    """,
)
def win_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): first-touch
    timestamps per stage per user, then ordering conditions. One hash agg
    over user_id + one global rollup — no self-joins, no windows over the
    event stream, so the shape is flat regardless of events-per-user skew.
    """
    ev = load_table(spark, sf_dir, "events")
    stages = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("n_view"),
        F.sum(
            F.when(F.col("t_click") > F.col("t_view"), 1).otherwise(0)
        ).alias("n_view_click"),
        F.sum(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            ).otherwise(0)
        ).alias("n_full_funnel"),
    )


@query(
    "win_time_range",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
             PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_1h_sum
    FROM events
    """,
)
def win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour per-user sum — a time-valued RANGE frame. Spark's
    rangeBetween is numeric-only, so BOTH engines frame over floored epoch
    seconds with a [-3600, 0] bound (a DuckDB INTERVAL frame would compare
    at µs precision and disagree on sub-second boundary events — caught at
    sf0.1, invisible at sf0.01)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("trailing_1h_sum"),
    )


@query(
    "ts_sessionize",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, value,
             CAST(SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS session_id
      FROM gaps
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS t_start, MAX(ts) AS t_end,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM sess GROUP BY user_id, session_id
    """,
)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: split each user's event stream into sessions at
    >30-minute gaps (the gap-and-island pattern — lag to flag boundaries,
    running sum to number them), then per-session stats.

    Scale shape: ONE shuffle on user_id serves both windows and the final
    group-by (same partitioning); sessions never span users, so no
    cross-partition state. This is the batch twin of `stream_session`
    (which does the same with Structured Streaming session windows).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    new_sess = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    sess = ev.select(
        "user_id",
        "ts",
        "value",
        F.sum(new_sess).over(run).cast("bigint").alias("session_id"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
    )


@query(
    "ts_downsample",
    oracle="""
    WITH b AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket, value,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type, bucket,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           MAX(value) AS high, MIN(value) AS low,
           COUNT(*) AS n
    FROM b GROUP BY event_type, bucket
    """,
)
def ts_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling (hypertable rollup): hourly open/close (first/last
    value by (ts, event_id) — the unique tiebreak makes first/last
    deterministic) plus high/low/count per event type.

    Uses two opposed row_numbers + conditional aggregates instead of
    min_by/max_by: engine-portable tie handling, and Catalyst still plans
    ONE shuffle on the (event_type, bucket) grain for windows + group-by.
    """
    ev = load_table(spark, sf_dir, "events")
    # Materialize the bucket as a column BEFORE the windows: windows and the
    # final groupBy then share the exact (event_type, bucket) partitioning,
    # so the whole query is one shuffle (two sorts, same exchange).
    e0 = ev.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        "value",
        "ts",
        "event_id",
    )
    wa = Window.partitionBy("event_type", "bucket").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    b = e0.select(
        "event_type",
        "bucket",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return b.groupBy("event_type", "bucket").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "ts_pattern_detect",
    oracle="""
    WITH nxt AS (
      SELECT user_id, event_id, event_type, ts,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
             ) AS next_purchase
      FROM events
    )
    SELECT user_id, event_id AS error_event, ts AS t_error,
           next_purchase AS t_purchase
    FROM nxt
    WHERE event_type = 'error'
      AND next_purchase IS NOT NULL
      AND next_purchase - ts <= INTERVAL 10 MINUTE
    """,
)
def ts_pattern_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern detection (MATCH_RECOGNIZE-lite): find every
    'error' followed by a 'purchase' by the same user within 10 minutes.

    The naive shape is a per-user self-join (error × later purchases) —
    quadratic in events-per-user. Instead a forward-looking window computes
    each row's next purchase timestamp in one pass: ONE shuffle on user_id,
    per-row state is a single running minimum, and skewed users cost sort
    time rather than join blowup. The (ts, event_id) tiebreak keeps "next"
    deterministic for simultaneous events.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).over(w).alias("next_purchase"),
    )
    return (
        nxt.filter(
            (F.col("event_type") == "error")
            & F.col("next_purchase").isNotNull()
            & (
                F.col("next_purchase") - F.col("ts")
                <= F.expr("INTERVAL 10 MINUTES")
            )
        )
        .select(
            "user_id",
            F.col("event_id").alias("error_event"),
            F.col("ts").alias("t_error"),
            F.col("next_purchase").alias("t_purchase"),
        )
    )


@query(
    "win_max_concurrent",
    oracle="""
    WITH bounds AS (
      SELECT event_type, ts AS t, 1 AS delta FROM events
      UNION ALL
      SELECT event_type, ts + INTERVAL 5 MINUTE, -1 FROM events
    ),
    run AS (
      SELECT event_type, t, delta,
             SUM(delta) OVER (PARTITION BY event_type
                              ORDER BY t, delta DESC
                              ROWS UNBOUNDED PRECEDING) AS concurrent
      FROM bounds
    )
    SELECT event_type,
           CAST(MAX(concurrent) AS BIGINT) AS max_concurrent
    FROM run GROUP BY event_type
    """,
)
def win_max_concurrent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum concurrency per series — the license-seat / connection-pool
    / peak-load question: treat each event as a 5-minute interval, emit
    +1/−1 boundary rows, running-sum them in time order, take the peak.
    The classic sweep-line rewrite that answers interval-overlap maxima
    without any self-join.

    Determinism: the tie order at identical timestamps is pinned
    (+1 before −1 via `delta DESC`), so a touching end/start pair counts
    as overlapping in both engines — the inclusive-bounds convention,
    applied identically.

    Scale shape: 2 rows per event through ONE window sort — but keyed on
    (event_type, day-bucket), not event_type alone, so parallelism is
    |types|x|days| (the round-4 5-partition cap is gone). The global
    running sum decomposes exactly: max over buckets of (bucket offset +
    local running max), where the offsets are exclusive prefix sums of
    per-bucket deltas over a tiny broadcast ledger (integer arithmetic —
    the two-level prefix-sum pattern of win_pareto/ts_cusum). Same-t ties
    always share a bucket (the bucket is a truncation of t), so the
    +1-before-−1 tie order is preserved. No interval self-join, no
    quadratic corner.
    """
    ev = load_table(spark, sf_dir, "events")
    starts = ev.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta")
    )
    ends = ev.select(
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    bounds = starts.unionAll(ends).withColumn(
        BKT, F.date_trunc("day", F.col("t"))
    )
    wloc = (
        Window.partitionBy("event_type", BKT)
        .orderBy(F.col("t"), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_bucket = (
        bounds.select(
            "event_type",
            BKT,
            "delta",
            F.sum("delta").over(wloc).alias("_lrun"),
        )
        .groupBy("event_type", BKT)
        .agg(
            F.max("_lrun").alias("_mloc"),
            F.sum("delta").alias("_bsum"),
        )
    )
    woff = (
        Window.partitionBy("event_type")
        .orderBy(BKT)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        per_bucket.withColumn(
            "_off", F.coalesce(F.sum("_bsum").over(woff), F.lit(0))
        )
        .groupBy("event_type")
        .agg(
            F.max(F.col("_off") + F.col("_mloc"))
            .cast("bigint")
            .alias("max_concurrent")
        )
    )


@query(
    "win_percent_of_total",
    oracle="""
    WITH r AS (
      SELECT o_orderpriority AS grp, o_orderkey,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders WHERE o_orderkey < 1000
    )
    SELECT grp, o_orderkey,
           CAST(price AS DOUBLE) AS price,
           FLOOR((CAST(price AS DOUBLE)
                  / CAST(SUM(price) OVER (PARTITION BY grp) AS DOUBLE) * 100)
                 * 10000 + 0.5) / 10000 AS pct_of_group,
           FLOOR((CAST(price AS DOUBLE)
                  / CAST(SUM(price) OVER () AS DOUBLE) * 100)
                 * 10000 + 0.5) / 10000 AS pct_of_total
    FROM r
    """,
)
def win_percent_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-group and percent-of-grand-total per row — the
    share-of-wallet / contribution columns every BI report carries.

    Determinism: both denominators are exact DECIMAL window sums
    (order-independent); each share is one double division, ROUND 4.

    Scale shape (r6 rewrite): both denominators are unordered sums — no
    window (hence no sort) is needed at all. The |grp|=5 group totals and
    the 1-row grand total are map-combinable aggregates broadcast back
    onto the rows, so the full-data form is a single map pass; the old
    form's unpartitioned window collapsed the slice into one task.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    r = o.select(
        F.col("o_orderpriority").alias("grp"),
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    # persist() pins the 5-row group-sum table across its two readers
    # (the row join and the grand-total fold) so orders is scanned once
    # for it, not re-derived per branch.
    gtot = r.groupBy("grp").agg(F.sum("price").alias("gsum")).persist()
    # Grand total from the 5 group sums (exact DECIMAL, order-independent)
    # — no second pass over the rows.
    tot = gtot.agg(F.sum("gsum").alias("asum"))
    pd_ = F.col("price").cast("double")
    return (
        r.join(broadcast(gtot), "grp")
        .crossJoin(broadcast(tot))
        .select(
            "grp",
            "o_orderkey",
            pd_.alias("price"),
            q4(pd_ / F.col("gsum").cast("double") * 100).alias(
                "pct_of_group"
            ),
            q4(pd_ / F.col("asum").cast("double") * 100).alias(
                "pct_of_total"
            ),
        )
    )
