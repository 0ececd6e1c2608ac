"""Property-based algebraic identities (SURVEY.md §5.4).

Hypothesis generates small frames; each property is an identity any
relational engine must satisfy, independent of the DuckDB oracle. These
catch semantic regressions in operator composition (e.g. a semi-join that
duplicates probe rows) that fixture-specific oracles might miss.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key (small domain → dups)
        st.integers(min_value=-100, max_value=100),  # value
    ),
    min_size=0,
    max_size=30,
)

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(rows or [(None, None)], "k int, v int").filter(
        F.col("k").isNotNull() if not rows else F.lit(True)
    )


@given(a=ROWS, b=ROWS)
@settings(**SETTINGS)
def test_union_all_count_additive(spark, a, b):
    da, db = _df(spark, a), _df(spark, b)
    assert da.unionAll(db).count() == da.count() + db.count()


@given(a=ROWS, b=ROWS)
@settings(**SETTINGS)
def test_semi_join_is_filtered_probe(spark, a, b):
    """left_semi ≡ probe rows whose key appears in build; never duplicates."""
    da, db = _df(spark, a), _df(spark, b)
    semi = da.join(db.select("k").distinct(), "k", "left_semi")
    keys = {r.k for r in db.select("k").distinct().collect()}
    expected = [r for r in da.collect() if r.k in keys]
    assert sorted(map(tuple, semi.collect())) == sorted(map(tuple, expected))


@given(a=ROWS, b=ROWS)
@settings(**SETTINGS)
def test_semi_anti_partition_probe(spark, a, b):
    """semi ∪ anti = probe side, disjointly (per-row multiset identity)."""
    da, db = _df(spark, a), _df(spark, b)
    semi = da.join(db, "k", "left_semi")
    anti = da.join(db, "k", "left_anti")
    assert semi.count() + anti.count() == da.count()


@given(a=ROWS, b=ROWS)
@settings(**SETTINGS)
def test_intersect_all_multiplicity_min(spark, a, b):
    """INTERSECT ALL keeps min(multiplicity_a, multiplicity_b) per row."""
    from collections import Counter

    da, db = _df(spark, a), _df(spark, b)
    got = Counter(map(tuple, da.intersectAll(db).collect()))
    ca, cb = Counter(map(tuple, da.collect())), Counter(map(tuple, db.collect()))
    want = {t: min(ca[t], cb[t]) for t in ca if t in cb}
    assert got == Counter(want)


@given(a=ROWS, b=ROWS)
@settings(**SETTINGS)
def test_except_all_multiplicity_diff(spark, a, b):
    """EXCEPT ALL keeps max(0, mult_a - mult_b) per row."""
    from collections import Counter

    da, db = _df(spark, a), _df(spark, b)
    got = Counter(map(tuple, da.exceptAll(db).collect()))
    ca, cb = Counter(map(tuple, da.collect())), Counter(map(tuple, db.collect()))
    want = {t: ca[t] - cb.get(t, 0) for t in ca if ca[t] > cb.get(t, 0)}
    assert got == Counter(want)


@given(rows=ROWS)
@settings(**SETTINGS)
def test_row_number_is_permutation_per_partition(spark, rows):
    """row_number over any partition is exactly 1..n within each group."""
    df = _df(spark, rows)
    w = Window.partitionBy("k").orderBy("v", "k")
    rn = df.withColumn("rn", F.row_number().over(w))
    for key, grp in __import__("itertools").groupby(
        sorted(rn.collect(), key=lambda r: (r.k, r.rn)), key=lambda r: r.k
    ):
        ranks = [r.rn for r in grp]
        assert ranks == list(range(1, len(ranks) + 1)), f"group {key}"


@given(rows=ROWS)
@settings(**SETTINGS)
def test_groupby_sum_equals_total(spark, rows):
    """Sum of per-group sums equals the global sum (partial-agg soundness)."""
    df = _df(spark, rows)
    per_group = df.groupBy("k").agg(F.sum("v").alias("s"))
    total_g = per_group.agg(F.sum("s")).collect()[0][0]
    total = df.agg(F.sum("v")).collect()[0][0]
    assert total_g == total


@given(rows=ROWS)
@settings(**SETTINGS)
def test_distinct_idempotent_and_bounded(spark, rows):
    df = _df(spark, rows)
    d1 = df.distinct()
    assert d1.count() == d1.distinct().count()
    assert d1.count() <= df.count()


ASOF_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.integers(min_value=0, max_value=50),  # event ts
    ),
    min_size=0,
    max_size=12,
)
ASOF_ORDERS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.integers(min_value=0, max_value=50),  # order ts
    ),
    min_size=0,
    max_size=12,
)


@given(events=ASOF_EVENTS, orders=ASOF_ORDERS)
@settings(**SETTINGS)
def test_asof_rewrite_matches_brute_force(spark, events, orders):
    """The as-of rewrite (equi-join + range + arg-max) must equal the
    definitional semantics: latest order at/before each event, per user."""
    ev = spark.createDataFrame(
        [(i, u, t) for i, (u, t) in enumerate(events)] or [(None,) * 3],
        "eid int, u int, t int",
    ).filter(F.col("eid").isNotNull() if not events else F.lit(True))
    od = spark.createDataFrame(
        orders or [(None, None)], "u int, ot int"
    ).filter(F.col("u").isNotNull() if not orders else F.lit(True))

    j = (
        ev.join(od, (ev.u == od.u) & (od.ot <= ev.t), "inner")
        .groupBy("eid")
        .agg(F.max("ot").alias("last_ot"))
    )
    got = {r.eid: r.last_ot for r in j.collect()}

    want = {}
    for i, (u, t) in enumerate(events):
        cands = [ot for (ou, ot) in orders if ou == u and ot <= t]
        if cands:
            want[i] = max(cands)
    assert got == want


@given(
    w=st.integers(min_value=1, max_value=4000),
    h=st.integers(min_value=1, max_value=4000),
    rgb=st.tuples(
        st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
    ),
)
@settings(**SETTINGS)
def test_image_header_parser_roundtrip(w, h, rgb):
    """Pure-Python property: for ANY dimensions, synthesizing a PNG/GIF
    and parsing its header must recover exactly (format, w, h) — the
    guarantee mm_decode_image's oracle relies on at every doc_id."""
    from luxor_db_spark.sources.multimodal import (
        _parse_image_header,
        make_gif,
        make_png,
    )

    assert _parse_image_header(make_png(w, h, rgb)) == ("png", w, h)
    if w <= 65535 and h <= 65535:  # GIF dims are u16 by format spec
        assert _parse_image_header(make_gif(w, h)) == ("gif", w, h)


@given(
    x=st.integers(min_value=0, max_value=65535),
    y=st.integers(min_value=0, max_value=65535),
)
@settings(**SETTINGS)
def test_zorder_matches_reference_interleave(spark, x, y):
    """fn_zorder's magic-number cascade must equal the textbook bitwise
    interleave (x bits on even positions, y bits on odd) for any 16-bit
    inputs — checked by running the same Column expressions over a
    one-row frame against a pure-Python reference."""
    from luxor_db_spark.functions.scalar import _spread_bits_spark

    def ref_interleave(a: int, b: int) -> int:
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame([(x, y)], "x long, y long")
    z = (
        _spread_bits_spark(F.col("x"))
        .bitwiseOR(F.shiftleft(_spread_bits_spark(F.col("y")), 1))
        .cast("bigint")
    )
    got = df.select(z.alias("z")).collect()[0].z
    assert got == ref_interleave(x, y), (x, y, got)


@given(
    sizes=st.lists(st.integers(min_value=0, max_value=7), min_size=1, max_size=8),
    k=st.integers(min_value=1, max_value=9),
    two_series=st.booleans(),
)
@settings(**SETTINGS)
def test_trailing_halo_equals_global_window_any_layout(spark, sizes, k, two_series):
    """For ANY bucket layout (including empty buckets, k larger than every
    bucket, k larger than the whole series) and any frame width k, the
    bucketed trailing window over with_trailing_halo must equal the global
    per-series window. This is the load-bearing guarantee behind the
    de-weakened event-grain family (win_moving_median, win_bollinger,
    ts_cusum_changepoint, win_max_concurrent)."""
    from luxor_db_spark.operators.bucketed import BKT, HALO, with_trailing_halo

    rows = []
    for grp in ["a", "b"] if two_series else ["a"]:
        i = 0
        for b, sz in enumerate(sizes):
            for _ in range(sz):
                rows.append((grp, b, i, float(i * 3 + (1 if grp == "b" else 0))))
                i += 1
    if not rows:
        return
    df = spark.createDataFrame(rows, "grp string, bkt int, seq long, v double")

    glob = Window.partitionBy("grp").orderBy("seq").rowsBetween(-k, 0)
    want = {
        (r.grp, r.seq, round(r.s, 6), r.n)
        for r in df.select(
            "grp",
            "seq",
            F.sum("v").over(glob).alias("s"),
            F.count(F.lit(1)).over(glob).alias("n"),
        ).collect()
    }

    aug = with_trailing_halo(df, ["grp"], ["seq"], F.col("bkt"), k)
    wb = Window.partitionBy("grp", BKT).orderBy("seq").rowsBetween(-k, 0)
    got = {
        (r.grp, r.seq, round(r.s, 6), r.n)
        for r in aug.select(
            "grp",
            "seq",
            HALO,
            F.sum("v").over(wb).alias("s"),
            F.count(F.lit(1)).over(wb).alias("n"),
        )
        .filter(~F.col(HALO))
        .collect()
    }
    assert got == want, (sizes, k)


@given(
    sizes=st.lists(st.integers(min_value=0, max_value=7), min_size=1, max_size=8),
)
@settings(**SETTINGS)
def test_bucket_offsets_reconstruct_global_running_sum(spark, sizes):
    """Local per-bucket cumsum + bucket_offsets' exclusive prefix offsets
    must equal the global running sum for any bucket layout (the two-level
    prefix-sum decomposition; exact because values are integers here, as
    the production paths use DECIMAL)."""
    from luxor_db_spark.operators.bucketed import bucket_offsets

    rows = []
    i = 0
    for b, sz in enumerate(sizes):
        for _ in range(sz):
            rows.append(("a", b, i, i * 7 % 13))
            i += 1
    if not rows:
        return
    df = spark.createDataFrame(rows, "grp string, bkt int, seq long, v long")

    glob = (
        Window.partitionBy("grp")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {(r.seq, r.s) for r in df.select("seq", F.sum("v").over(glob).alias("s")).collect()}

    off = bucket_offsets(df, ["grp"], "bkt", F.col("v"))
    loc = (
        Window.partitionBy("grp", "bkt")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    got = {
        (r.seq, r.s)
        for r in df.join(F.broadcast(off), ["grp", "bkt"])
        .select("seq", (F.sum("v").over(loc) + F.col("_off")).alias("s"))
        .collect()
    }
    assert got == want, sizes


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),  # constant-cardinality part key
            st.integers(min_value=0, max_value=8),  # tie-heavy order key
            st.integers(min_value=-50, max_value=50),  # summed value
        ),
        max_size=60,
    ),
    npart=st.integers(min_value=1, max_value=7),
)
@settings(**SETTINGS)
def test_two_level_cumsum_matches_global_window(spark, rows, npart):
    """two_level_cumsum (the distributed prefix-sum behind agg_gini /
    agg_weighted_median / win_ntile's recipe) must agree with the global
    single-partition window on every TIE-INSENSITIVE readout, for any
    partition count and any tie pattern:

    - with a STRICT total order (tie-broken by a unique id), per-row
      cumulative sums must match the global window exactly;
    - with ties left in (the agg_weighted_median shape), the per-ORDER-KEY
      maximum cumulative sum must match (tied rows may interleave
      differently across range partitions, but each tie group's total —
      hence the running sum at the group boundary — is order-independent).
    """
    from luxor_db_spark.operators.bucketed import two_level_cumsum

    if not rows:
        return
    data = [(g, k, v, i) for i, (g, k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "grp string, k long, v long, id long")

    # Strict order: (k, id) is unique.
    glob = (
        Window.partitionBy("grp")
        .orderBy("k", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        (r.grp, r.id, r.c)
        for r in df.select(
            "grp", "id", F.sum("v").over(glob).alias("c")
        ).collect()
    }
    got = {
        (r.grp, r.id, r.c)
        for r in two_level_cumsum(
            df, ["grp"], ["k", "id"], F.col("v"), out="c", npart=npart
        ).collect()
    }
    assert got == want

    # Tied order: only the per-(grp, k) boundary cumsum is contractual.
    globk = (
        Window.partitionBy("grp")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want_b = {
        (r.grp, r.k, r.m)
        for r in df.select("grp", "k", F.sum("v").over(globk).alias("c"))
        .groupBy("grp", "k")
        .agg(F.max("c").alias("m"))
        .collect()
    }
    got_b = {
        (r.grp, r.k, r.m)
        for r in two_level_cumsum(
            df, ["grp"], ["k"], F.col("v"), out="c", npart=npart
        )
        .groupBy("grp", "k")
        .agg(F.max("c").alias("m"))
        .collect()
    }
    assert got_b == want_b


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["A", "N", "R"]),  # flag
            st.integers(min_value=1, max_value=9),  # tie-heavy value
        ),
        min_size=1,
        max_size=50,
    ),
)
@settings(**SETTINGS)
def test_value_ledger_formulas_match_window_functions(spark, rows):
    """The win_rank_dense / win_percent value-ledger formulas (rank =
    1 + exclusive prefix count, dense_rank = distinct-value index,
    percent_rank = (rank−1)/(n−1), cume_dist = inclusive prefix / n)
    must equal Spark's own window functions on arbitrary tie patterns —
    the hand-rolled arithmetic is what parity can't isolate when the
    fixture's tie distribution is benign."""
    df = spark.createDataFrame(
        [(g, float(v), i) for i, (g, v) in enumerate(rows)],
        "flag string, val double, id long",
    )
    w = Window.partitionBy("flag").orderBy("val")
    want = {
        (r.id, r.rnk, r.drnk, r.pr, r.cd)
        for r in df.select(
            "id",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        ).collect()
    }

    cnts = df.groupBy("flag", "val").agg(F.count(F.lit(1)).alias("_cnt"))
    wled = Window.partitionBy("flag").orderBy("val")
    wprev = wled.rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.partitionBy("flag")
    pre = F.coalesce(F.sum("_cnt").over(wprev), F.lit(0))
    n = F.sum("_cnt").over(wall)
    led = cnts.select(
        "flag",
        "val",
        (pre + 1).cast("int").alias("rnk"),
        F.row_number().over(wled).alias("drnk"),
        F.when(n > 1, pre.cast("double") / (n - 1).cast("double"))
        .otherwise(F.lit(0.0))
        .alias("pr"),
        ((pre + F.col("_cnt")).cast("double") / n.cast("double")).alias("cd"),
    )
    got = {
        (r.id, r.rnk, r.drnk, r.pr, r.cd)
        for r in df.join(F.broadcast(led), ["flag", "val"])
        .select("id", "rnk", "drnk", "pr", "cd")
        .collect()
    }
    assert got == want


@given(
    num=st.integers(min_value=-10_000_000, max_value=10_000_000),
    den=st.integers(min_value=1, max_value=200_000),
)
@settings(**SETTINGS)
def test_q4_is_engine_identical_even_on_ties(spark, num, den):
    """The q4 floor-quantization must produce the SAME double in Spark and
    DuckDB for any rational num/den — including exact rounding ties like
    9/180000 = 0.00005, where ROUND(x, 4) diverges between the engines
    (Spark HALF_UP on the decimal repr vs DuckDB rounding the binary
    value; the llm_embed_norm three-round failure class)."""
    import duckdb

    from luxor_db_spark.functions.exact import q4, q4_sql

    df = spark.createDataFrame([(num, den)], "num long, den long")
    got_spark = df.select(
        q4(F.col("num").cast("double") / F.col("den")).alias("v")
    ).collect()[0].v
    got_duck = duckdb.sql(
        f"SELECT {q4_sql(f'CAST({num} AS DOUBLE) / {den}')} AS v"
    ).fetchone()[0]
    assert got_spark == got_duck, (num, den, got_spark, got_duck)


EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=24),
        st.integers(min_value=0, max_value=24),
    ),
    min_size=0,
    max_size=40,
)


@given(edges=EDGES)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_star_contract_matches_union_find(spark, edges):
    """cc.star_contract (the CC kernel behind graph_cc_two_phase and
    llm_dedup_cluster) must label every endpoint with the min node id of
    its component, for ANY graph shape — cycles, long chains (the
    topology that breaks capped label propagation), self-loops,
    duplicate/reversed edges. Ground truth: driver-side union-find."""
    from luxor_db_spark.operators.cc import star_contract

    # union-find ground truth
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent[find(u)] = find(v)
    comp = {
        n: min(m for m in parent if find(m) == find(n)) for n in parent
    }
    # star_contract only labels endpoints of real (non-self-loop) edges
    real_nodes = {n for u, v in edges if u != v for n in (u, v)}
    expected = sorted((n, comp[n]) for n in real_nodes)

    df = spark.createDataFrame(
        edges or [(0, 0)], "a int, b int"
    )
    got = sorted(
        (r["node"], r["component"])
        for r in star_contract(df).collect()
    )
    assert got == expected, f"edges={edges}"


def test_star_contract_long_chain_exceeds_propagation_cap(spark):
    """A 60-node path: diameter 59, far beyond the 20 rounds the old
    min-label propagation loop was capped at. Star contraction must
    still label every node with 0 (and converge well inside its cap)."""
    from luxor_db_spark.operators.cc import star_contract

    chain = [(i, i + 1) for i in range(59)]
    df = spark.createDataFrame(chain, "a int, b int")
    rows = star_contract(df).collect()
    assert len(rows) == 60
    assert all(r["component"] == 0 for r in rows)


def test_profile_table_approx_matches_exact_within_hll_error(spark, sf_dir):
    """profile_table_approx (r7, the 100 TB sketch twin): everything but
    the distinct column must be IDENTICAL to the exact profile, and the
    HLL cardinality estimate must sit within 5% relative error of the
    exact countDistinct per column (lgConfigK=12 ≈ 1.6% standard error;
    the pin leaves ~3σ headroom)."""
    from luxor_db_spark.operators.aggregates import (
        profile_table,
        profile_table_approx,
    )

    exact = {r.col: r for r in profile_table(spark, sf_dir).collect()}
    approx = {r.col: r for r in profile_table_approx(spark, sf_dir).collect()}
    assert exact.keys() == approx.keys()
    for c, e in exact.items():
        a = approx[c]
        assert (a.n_rows, a.n_non_null, a.min_v, a.max_v) == (
            e.n_rows,
            e.n_non_null,
            e.min_v,
            e.max_v,
        ), c
        rel = abs(a.n_distinct_est - e.n_distinct) / max(e.n_distinct, 1)
        assert rel <= 0.05, (c, a.n_distinct_est, e.n_distinct, rel)


def test_two_level_cumsum_exact_under_adversarial_bounds(spark, monkeypatch):
    """The r8 kernel's load-bearing safety claim: bucket BOUNDARIES only
    set parallelism, never results — which is what makes both the
    quantile approximation and the per-plan memoization safe (a stale or
    even garbage boundary set must still produce the exact running sum).
    Pin it by monkeypatching the boundary source with adversarial sets:
    empty (one bucket), a single far-out boundary (all rows one side),
    duplicated/unsorted-domain values, and boundaries denser than the
    data. Every variant must equal the global single-partition window
    bit-for-bit, and totals must be unaffected too."""
    import luxor_db_spark.operators.bucketed as B

    rows = [
        ("a", k, v, i)
        for i, (k, v) in enumerate(
            [(3, 2), (1, 5), (3, 1), (7, 4), (5, 3), (1, 1), (9, 2), (5, 9)]
        )
    ] + [("b", k, k + 1, 100 + k) for k in range(10)]
    df = spark.createDataFrame(rows, "grp string, k long, v long, id long")
    glob = (
        Window.partitionBy("grp")
        .orderBy("k", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        (r.grp, r.id, r.c)
        for r in df.select(
            "grp", "id", F.sum("v").over(glob).alias("c")
        ).collect()
    }
    tot = {
        (r.grp, r.t)
        for r in df.groupBy("grp").agg(F.sum("v").alias("t")).collect()
    }

    for bad, badsub in (
        ([], {}),
        ([1e18], {}),
        ([-1e18], {}),
        ([3.0, 3.0, 3.0], {}),
        ([float(x) / 2 for x in range(-3, 25)], {}),
        # garbage HOT-VALUE sub-buckets must be results-invariant too:
        # sub-split a real tie value by nonsense tie boundaries, and
        # "sub-split" a value that isn't even hot
        ([1.0, 3.0, 5.0], {3.0: [102.0, 104.5], 7.0: [-1e9]}),
    ):
        monkeypatch.setattr(
            B,
            "order_bucket_spec",
            lambda *a, _b=bad, _s=badsub, **kw: (sorted(set(_b)), _s),
        )
        out = B.two_level_cumsum(
            df, ["grp"], ["k", "id"], F.col("v"), out="c", totals=("c",)
        )
        got = {(r.grp, r.id, r.c) for r in out.collect()}
        assert got == want, f"bounds={bad} sub={badsub}"
        got_t = {(r.grp, r.c_tot) for r in out.select("grp", "c_tot").distinct().collect()}
        assert got_t == tot, f"bounds={bad} sub={badsub}"


def test_hot_lead_value_sub_buckets_spread_and_stay_exact(spark):
    """r8 skew refinement: a lead-column value covering ≥ 1/npart of the
    rows (the 9.99-price shape) must (a) be detected from the duplicated
    quantiles, (b) have its tie run SPREAD across multiple sub-buckets
    by the second order column, and (c) leave the running sum bit-exact
    vs the global window — sub-bucketing is a parallelism move only."""
    import luxor_db_spark.operators.bucketed as B

    # 50% of rows on k=42, rest spread; strict order (k, id)
    rows = [("g", 42, 1, i) for i in range(500)] + [
        ("g", (i * 37) % 1000 + 100, 2, 500 + i) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "grp string, k long, v long, id long")

    bounds, sub = B.order_bucket_spec(df, "k", "id", npart=8)
    assert 42.0 in sub and len(sub[42.0]) >= 3, (bounds, sub)

    b = B.order_buckets(df, "k", npart=8, tie_col="id")
    hot_buckets = {
        r.b for r in b.filter("k = 42").select(F.col(B.BKT).alias("b")).distinct().collect()
    }
    assert len(hot_buckets) >= 4, hot_buckets  # the tie run is spread

    glob = (
        Window.partitionBy("grp")
        .orderBy("k", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        (r.id, r.c)
        for r in df.select("id", F.sum("v").over(glob).alias("c")).collect()
    }
    got = {
        (r.id, r.c)
        for r in B.two_level_cumsum(
            df, ["grp"], ["k", "id"], F.col("v"), out="c", npart=8
        ).collect()
    }
    assert got == want


def test_hot_value_sub_buckets_work_on_date_tie_column(spark):
    """r8 ADVICE: CAST(date AS DOUBLE) is NULL in this Spark build, which
    silently disabled hot-value sub-bucketing on DATE tie columns (sub-
    bounds collapsed to none; results stayed exact but the documented
    skew refinement was inert). _as_double now routes dates through
    unix_date — this pins that a hot lead value with a date tie column
    (a) produces non-empty sub-bounds, (b) actually spreads the tie run,
    and (c) keeps the running sum bit-exact. Also pins the missing-value
    guard: val=None with vals=None raises ValueError, not a cryptic
    F.sum(None) failure."""
    import datetime

    import pytest as _pytest

    import luxor_db_spark.operators.bucketed as B

    rows = [
        ("g", 42, 1, datetime.date(2020, 1, 1) + datetime.timedelta(days=i))
        for i in range(500)
    ] + [
        (
            "g",
            (i * 37) % 1000 + 100,
            2,
            datetime.date(2020, 1, 1) + datetime.timedelta(days=i),
        )
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "grp string, k long, v long, d date")

    bounds, sub = B.order_bucket_spec(df, "k", "d", npart=8)
    assert 42.0 in sub and len(sub[42.0]) >= 3, (bounds, sub)

    b = B.order_buckets(df, "k", npart=8, tie_col="d")
    hot_buckets = {
        r.b
        for r in b.filter("k = 42")
        .select(F.col(B.BKT).alias("b"))
        .distinct()
        .collect()
    }
    assert len(hot_buckets) >= 4, hot_buckets

    glob = (
        Window.partitionBy("grp")
        .orderBy("k", "d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        (r.d, r.k, r.c)
        for r in df.select(
            "d", "k", F.sum("v").over(glob).alias("c")
        ).collect()
    }
    got = {
        (r.d, r.k, r.c)
        for r in B.two_level_cumsum(
            df, ["grp"], ["k", "d"], F.col("v"), out="c", npart=8
        ).collect()
    }
    assert got == want

    with _pytest.raises(ValueError, match="val"):
        B.two_level_cumsum(df, ["grp"], ["k", "d"], None, out="c")


def test_pq_encode_adc_identity_property(spark):
    """PQ arithmetic property, fixture-free: for ANY vector corpus, (a)
    every code is in [0, k); (b) the ADC score of a query against a
    coded vector EQUALS the exact dot product of the query with the
    vector's reconstruction (codeword concatenation) — ADC's defining
    identity, which pins the encode expression (argmin codeword) and
    the score expression (LUT sum) against each other."""
    from pyspark.sql import functions as F

    from luxor_db_spark.operators.llm import (
        _pq_adc_expr,
        _pq_codebook_col,
        _pq_encode_expr,
        _unit_norm,
    )

    m, k, dsub = 2, 4, 3  # dim 6
    # tiny deterministic codebook + corpus
    codebooks = [
        [[(i * 17 + j * 5 + t) % 7 - 3.0 for t in range(dsub)] for j in range(k)]
        for i in range(m)
    ]
    vecs = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(m * dsub)),
            lambda t: (
                F.pmod(F.xxhash64(F.col("id") * 31 + t), F.lit(11)) - 5.0
            ).cast("double"),
        ).alias("nv"),
    )
    coded = vecs.withColumn("cb", _pq_codebook_col(codebooks)).withColumn(
        "codes", F.expr(_pq_encode_expr(m, k, dsub))
    )
    rows = coded.select("vec_id", "nv", "codes").collect()
    assert all(0 <= c < k for r in rows for c in r.codes)

    qv = [0.5 * t - 1.0 for t in range(m * dsub)]
    scored = (
        coded.withColumn("qv", F.array(*[F.lit(x) for x in qv]))
        .withColumn("adc", F.expr(_pq_adc_expr(m, dsub)))
        .select("vec_id", "codes", "adc")
        .collect()
    )
    for r in scored:
        recon = [
            codebooks[i][r.codes[i]][t] for i in range(m) for t in range(dsub)
        ]
        exact = sum(a * b for a, b in zip(qv, recon))
        assert abs(r.adc - exact) < 1e-9, (r.vec_id, r.adc, exact)
