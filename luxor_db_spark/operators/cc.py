"""Distributed connected components: alternating large-star / small-star
contraction (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) as a reusable DataFrame kernel.

Why this and not min-label propagation: propagation moves a label ONE hop
per round, so it needs O(graph diameter) rounds — a 100 TB near-dup graph
can contain template-document chains far longer than any fixed round cap,
and a capped propagation loop returns silently WRONG labels on them.
Star contraction rewires every edge toward a local minimum each round,
collapsing paths multiplicatively: O(log² n) proven / O(log n)
typical rounds, regardless of
diameter, each round plain groupBy/join/distinct on the (node, neighbor)
grain (no driver-side graph state, no Python boundary).

Used by ``graph_cc_two_phase`` (operators/graph.py, where the recursive-
CTE oracle checks it against DuckDB's transitive closure on a cycle-and-
chain functional graph) and ``llm_dedup_cluster`` (operators/llm.py, the
near-dup clustering step). Property-tested against a union-find ground
truth on random graphs (tests/test_properties.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _star(e: DataFrame, large: bool) -> DataFrame:
    """One star round over directed edge frame (a, b).

    large-star: every neighbor LARGER than the center re-points at the
    center's minimum neighborhood label; small-star does the same for the
    smaller-or-equal neighbors (and keeps the center's own pointer), which
    is what contracts already-short stars onto their root.
    """
    bi = e.select("a", "b").union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    if not large:
        bi = bi.filter(F.col("b") <= F.col("a"))
    m = bi.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
    joined = bi.join(m, "a")
    if large:
        out = joined.filter(F.col("b") > F.col("a")).select(
            F.col("b").alias("a"), F.col("m").alias("b")
        )
    else:
        out = joined.select(
            F.col("b").alias("a"), F.col("m").alias("b")
        ).union(m.select(F.col("a"), F.col("m").alias("b")))
    return out.filter(F.col("a") != F.col("b")).distinct()


def star_contract(edges: DataFrame, max_rounds: int = 32) -> DataFrame:
    """Labels ``(node, component)`` for every endpoint of ``edges``, where
    ``component`` is the minimum node id reachable through the undirected
    edge set (the first two columns of ``edges``; direction and
    duplicates are ignored).

    Each round applies large-star then small-star and localCheckpoints
    the result (lineage truncation — round N's plan must not replay
    rounds 1..N-1). The fixpoint test exploits that both frames are
    ``.distinct()`` sets: |new| == |old| == |new ∪ old| ⟺ set equality,
    so rounds where the cardinality moved cost two counts and no join.

    Raises ``RuntimeError`` if the edge set has not reached its fixpoint
    within ``max_rounds`` — heights shrink geometrically in practice
    (O(log² n) proven, O(log n) typical; Kiveris et al. §4), so 32
    rounds covers any realistic graph, and if one ever exceeds it the
    loud failure IS the contract (the capped-propagation alternative
    returned plausible-but-wrong labels instead).
    """
    a, b = edges.columns[0], edges.columns[1]
    e = (
        edges.select(F.col(a).alias("a"), F.col(b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("a").alias("n"))
        .union(e.select(F.col("b").alias("n")))
        .distinct()
    )

    prev_count = e.count()
    converged = prev_count == 0
    rounds = 0
    while not converged and rounds < max_rounds:
        rounds += 1
        new_e = _star(_star(e, large=True), large=False).localCheckpoint(
            eager=True
        )
        new_count = new_e.count()
        converged = (
            new_count == prev_count
            and new_e.union(e).distinct().count() == new_count
        )
        e = new_e
        prev_count = new_count
    if not converged:
        raise RuntimeError(
            f"star_contract: edge set still moving after {max_rounds} "
            f"rounds ({prev_count} edges) — refusing to emit unconverged "
            f"component labels"
        )

    roots = e.groupBy("a").agg(F.min("b").alias("root"))
    return nodes.join(roots, nodes.n == roots.a, "left").select(
        F.col("n").alias("node"),
        F.coalesce(F.col("root"), F.col("n")).alias("component"),
    )
