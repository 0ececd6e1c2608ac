"""Graph analytics over relational data (SURVEY.md §2 extension).

Reference status: absent (reference ``Main.java:1-7`` only). The pattern
here is the one large-scale graph analytics on Spark actually uses:
*derive* the graph from relational facts with ordinary joins (the
scale-relevant part — edge construction dominates cost at 100 TB), then
iterate on the much smaller node/edge grain.

Related: `llm_dedup_cluster` (operators/llm.py) is the other iterative
graph operator; both route through the shared star-contraction kernel
(operators/cc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from luxor_db_spark.catalog import load_table
from luxor_db_spark.registry import query

_D = 0.85  # damping
_N_ITER = 3  # fixed, unrolled in both engines
# All per-iteration quantization uses FLOOR(x*1e12 + 0.5)/1e12, not
# ROUND(x, 12): contributions are rational (w·r/outw with small integer
# denominators), so ROUND ties between Spark and DuckDB are possible;
# floor-quantization is the identical IEEE-754 expression in both
# engines (functions/exact.py q4 doctrine, at 12 decimals).


def _pagerank_oracle() -> str:
    """Unrolled 3-iteration PageRank as chained CTEs (DuckDB mirror)."""
    its = []
    prev = "r0"
    for k in range(1, _N_ITER + 1):
        its.append(f"""
    c{k} AS (
      SELECT e.dst,
             SUM(CAST(FLOOR(e.w * {prev}.r / o.outw * 1e12 + 0.5) / 1e12
                      AS DECIMAL(28,12))) AS contrib
      FROM edges e JOIN outw o ON e.src = o.src
                   JOIN {prev} ON e.src = {prev}.node
      GROUP BY e.dst
    ),
    r{k} AS (
      SELECT n.node,
             FLOOR((0.15 / 25 + 0.85 * CAST(COALESCE(c{k}.contrib, 0)
                                            AS DOUBLE)) * 1e12 + 0.5) / 1e12
               AS r
      FROM nodes n LEFT JOIN c{k} ON n.node = c{k}.dst
    )""")
        prev = f"r{k}"
    return f"""
    WITH edges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             COUNT(*) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY src, dst
    ),
    nodes AS (SELECT n_nationkey AS node FROM nation),
    outw AS (SELECT src, SUM(w) AS outw FROM edges GROUP BY src),
    r0 AS (SELECT node, 1.0 / 25 AS r FROM nodes),
    {",".join(its)}
    SELECT node AS nation_key, FLOOR(r * 1e6 + 0.5) / 1e6 AS pagerank
    FROM {prev}
    """


@query("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the nation-to-nation trade graph: an edge src→dst
    weighted by how many lineitems customers of nation src bought from
    suppliers of nation dst; 3 damped iterations (d=0.85) from uniform.

    Determinism across engines and partitionings: edge weights and
    out-degrees are exact integers; each contribution w·r/outw is one
    double expression of deterministic inputs, immediately ROUNDed to 12
    decimals and cast to DECIMAL(28,12), so the per-node SUM is exact and
    order-independent; the new rank re-rounds at 12. Dangling nations (no
    outgoing trade) leak their mass — the standard simplification, applied
    identically on both sides.

    Scale shape: edge derivation is the 100 TB part — a fact-table join
    pipeline whose customer/supplier sides are deliberately UN-hinted:
    they are SF-scaled (a forced broadcast would OOM at 100 TB, where
    the size threshold the hint overrides exists precisely to catch
    this), so AQE broadcasts them while they fit and degrades to a
    shuffle join when they don't. The output collapses to ≤ |nations|² weighted edges, which are
    persist()-pinned so every iteration branch reads the cached edge
    table — without the pin, edges + outw re-appear as subtrees in every
    unrolled iteration and the plan scans lineitem 6× (measured: zero
    ReusedExchange across the branches). persist, not localCheckpoint:
    it stays lazy (plan-only consumers never trigger the fact join),
    keeps lineage for fault tolerance, and Spark's CacheManager dedupes
    identical analyzed plans so repeated invocations share one tiny
    cache entry (the win_pareto pattern). The iteration then runs on the
    cached grain (both sides of every iteration join are broadcast), so
    3 rounds add ONE full-data pass total. For graphs whose EDGE set is
    itself huge, the same loop holds with shuffle joins partitioned by
    src — contributions stay (dst, decimal) pairs.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy(
            cust.c_nationkey.alias("src"), supp.s_nationkey.alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    ).persist()
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    outw = edges.groupBy("src").agg(F.sum("w").alias("outw"))

    r = nodes.select("node", (F.lit(1.0) / 25).alias("r"))
    for _ in range(_N_ITER):
        contrib = (
            edges.join(F.broadcast(outw), "src")
            .join(F.broadcast(r), edges.src == F.col("node"))
            .groupBy("dst")
            .agg(
                F.sum(
                    (
                        F.floor(
                            F.col("w") * F.col("r") / F.col("outw") * 1e12
                            + 0.5
                        )
                        / 1e12
                    ).cast("decimal(28,12)")
                ).alias("contrib")
            )
        )
        r = nodes.join(
            F.broadcast(contrib), nodes.node == F.col("dst"), "left"
        ).select(
            "node",
            (
                F.floor(
                    (
                        0.15 / 25
                        + 0.85
                        * F.coalesce(F.col("contrib"), F.lit(0)).cast(
                            "double"
                        )
                    )
                    * 1e12
                    + 0.5
                )
                / 1e12
            ).alias("r"),
        )
    return r.select(
        F.col("node").alias("nation_key"),
        (F.floor(F.col("r") * 1e6 + 0.5) / 1e6).alias("pagerank"),
    )


_CC_ORACLE = """
    WITH RECURSIVE pairs AS (
      SELECT doc_id % 97 AS a, (doc_id * 7) % 97 AS b
      FROM documents WHERE doc_id % 97 <> (doc_id * 7) % 97
    ),
    und AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
    nodes AS (SELECT DISTINCT a AS n FROM und),
    reach(a, b) AS (
      SELECT a, b FROM und
      UNION
      SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
    ),
    comp AS (SELECT a AS n, MIN(b) AS min_reach FROM reach GROUP BY a)
    SELECT CAST(nodes.n AS BIGINT) AS node,
           CAST(LEAST(comp.min_reach, nodes.n) AS BIGINT) AS component
    FROM nodes JOIN comp ON nodes.n = comp.n
"""


@query("graph_cc_two_phase", oracle=_CC_ORACLE)
def graph_cc_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components via alternating LARGE-STAR / SMALL-STAR
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — the heavy-duty CC for graphs whose diameter or skew makes
    plain label propagation slow: each round rewires edges toward local
    minima, collapsing long paths in polylog rounds (O(log² n) proven,
    O(log n) typical) instead of
    O(diameter), and every step is a plain groupBy/join (no driver-side
    graph state).

    Graph: a deterministic functional graph on 97 nodes (u → 7u mod 97)
    derived from doc_ids — cycles and long chains, exactly the topology
    where two-phase beats propagation. Oracle: recursive-CTE transitive
    closure, so the algorithm swap is externally checked against the
    same component definition `llm_dedup_cluster` uses.

    Scale shape: both phases shuffle only (node, neighbor) pairs grouped
    by node; the per-round fixpoint metric is one scalar. r6: the kernel
    lives in ``cc.star_contract`` (shared with ``llm_dedup_cluster``),
    which checkpoints per round and raises on non-convergence.
    """
    from luxor_db_spark.operators.cc import star_contract

    d = load_table(spark, sf_dir, "documents")
    pairs = d.select(
        (F.col("doc_id") % 97).alias("a"),
        ((F.col("doc_id") * 7) % 97).alias("b"),
    )
    labels = star_contract(pairs)
    return labels.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("component").cast("bigint").alias("component"),
    )
