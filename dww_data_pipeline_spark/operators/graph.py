"""Iterative graph analytics on DataFrames (GraphFrames-free).

The reference's domain IS a graph (people ↔ companies,
``GetWeta.py`` builds it in Neo4j); its analytics tier walks it for
jumps and density. This module adds the iterative-algorithm pattern
on top of the same DataFrame machinery as
``operators.dedup.connected_components``: a driver loop that only
orchestrates, per-iteration lineage truncation, and all data
distributed.

Weighted PageRank with dangling-mass redistribution: at each step

    r'(v) = (1-d)/N + d * ( Σ_{u→v} r(u)·w(u,v)/W(u)  +  D/N )

where W(u) is u's total out-weight and D the mass on dangling nodes
(no out-edges). A FIXED iteration count keeps the computation
SQL-expressible (the oracle unrolls the same recurrence), which is
what makes an iterative algorithm hash-checkable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank, ``iters`` fixed power iterations.

    Scale shape per iteration: one join of the (node, rank) table to
    the edge list on src + one aggregate on dst — identical to the
    label-propagation shape, so the same partitioning is reused every
    round; ranks (two columns) are what shuffles, never the graph
    payload. Dangling mass is a one-row aggregate broadcast back
    inside the SAME lazy plan, so all rounds execute as one action
    (see the loop comment); iteration-invariant inputs checkpoint
    once up front. Returns (node, rank) with ranks summing to ~1.
    The result is LAZY — a caller running several actions over it
    should ``.localCheckpoint()`` or ``.cache()`` it first, or each
    action re-executes the full recurrence.
    """
    w_col = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d"), w_col.alias("_w")
    ).localCheckpoint()
    outw = e.groupBy("_s").agg(F.sum("_w").alias("_ow"))
    nodes = e.select(F.col("_s").alias("node")).union(
        e.select(F.col("_d").alias("node"))
    ).distinct()
    # pre-join edge weights with out-weights once: contribution edge
    # fraction w/W(u) is iteration-invariant — materialized, because
    # the lazy iteration plan below references it in every round
    frac = e.join(outw, "_s").select(
        "_s", "_d", (F.col("_w") / F.col("_ow")).alias("_f")
    ).localCheckpoint()
    # the dangling-node SET is iteration-invariant; flag it once so the
    # per-iteration mass is one conditional sum inside the same plan
    src_nodes = e.select(F.col("_s").alias("node")).distinct()
    flagged = nodes.join(
        src_nodes.withColumn("_has_out", F.lit(True)), "node", "left"
    ).select(
        "node", F.coalesce("_has_out", F.lit(False)).alias("_has_out")
    ).localCheckpoint()
    n = flagged.count()  # bounded: node-count scalar over the checkpoint
    if n == 0:
        # empty graph → empty result, not a ZeroDivisionError at
        # plan-build time
        return flagged.select("node").withColumn("rank", F.lit(0.0))
    # Each round stays lazy WITHIN itself (the dangling-mass scalar is
    # a 1-row aggregate broadcast back into the same plan — no
    # separate collect), but ranks' lineage is truncated EVERY round
    # with a lazy localCheckpoint: ranks_i is referenced twice per
    # round (contrib join + dangling agg), so an unbounded tree
    # doubles per iteration and Catalyst re-optimizes all 2^i paths.
    # Re-measured at sf0.1 (min of 3, full build+exec): full-lazy
    # tree with a %6 cadence 5.4 s, truncate-every-round 4.0-4.5 s —
    # plan-compilation cost of the doubled tree dominates the tiny
    # per-round truncation of a node-count-sized table. eager=False
    # materializes on first downstream use, so no standalone job is
    # scheduled per round.
    ranks = flagged.withColumn("rank", F.lit(1.0 / n))
    for i in range(iters):
        if i > 0:
            ranks = ranks.localCheckpoint(eager=False)
        dangling = ranks.agg(
            F.coalesce(
                F.sum(F.when(~F.col("_has_out"), F.col("rank"))), F.lit(0.0)
            ).alias("_dm")
        )
        contrib = (
            frac.join(ranks, frac._s == ranks.node)
            .groupBy("_d")
            .agg(F.sum(F.col("rank") * F.col("_f")).alias("_c"))
        )
        ranks = (
            flagged.join(contrib, flagged.node == contrib._d, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "_has_out",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_c"), F.lit(0.0))
                        + F.col("_dm") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
    return ranks.select("node", "rank")


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = 2,
    scale: int = 1_000_000,
) -> DataFrame:
    """HITS hubs & authorities, ``iters`` fixed rounds, EXACT integer
    arithmetic (hash-checkable cross-engine, like the e7 k-means).

    The classic formulation L2-normalizes each round — a float sum
    whose accumulation order differs between engines. This variant
    MAX-normalizes in fixed point instead: after each update the
    score vector is rescaled to ``(x * scale) DIV max(x)`` so every
    intermediate stays an exact integer in [0, scale] times the
    incoming weight bound, the argmax structure (what HITS is used
    for) is unchanged, and every engine that follows the recurrence
    produces identical bits. Weights must be non-negative integers.

    Scale shape per round: two edge⋈score joins + two partial-agg
    shuffles keyed on node ids; the max normalizer is a 1-row
    aggregate broadcast back inside the same plan (no driver
    round-trip); score lineage is truncated every round (the measured
    PageRank finding — plan-tree doubling costs more than the
    truncation of a node-count-sized table). Returns
    (node, authority, hub) BIGINT columns.
    """
    if iters < 1:
        raise ValueError("hits() needs at least one iteration")
    w_col = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d"), w_col.alias("_w")
    ).localCheckpoint()
    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint()
    )

    def _rescaled(raw: DataFrame, key: str, col: str) -> DataFrame:
        """(node, col) rescaled to (x*scale) DIV max(x); missing
        nodes -> 0. All integer; max() is order-independent."""
        m = raw.agg(F.max(col).alias("_m"))
        scored = (
            nodes.join(raw, nodes.node == raw[key], "left")
            .crossJoin(F.broadcast(m))
            .select(
                "node",
                F.when(
                    F.col("_m").isNull() | (F.col("_m") == 0), F.lit(0).cast("long")
                )
                .otherwise(
                    F.expr(f"CAST(({col} * CAST({scale} AS BIGINT)) DIV _m AS BIGINT)")
                )
                .alias(col),
            )
            .na.fill({col: 0})
        )
        return scored

    hub = nodes.withColumn("hub", F.lit(scale).cast("long"))
    auth = None
    for _ in range(iters):
        a_raw = (
            e.join(hub, e._s == hub.node)
            .groupBy("_d")
            .agg(F.sum(F.col("_w") * F.col("hub")).alias("authority"))
        )
        auth = _rescaled(a_raw, "_d", "authority").localCheckpoint(eager=False)
        h_raw = (
            e.join(auth, e._d == auth.node)
            .groupBy("_s")
            .agg(F.sum(F.col("_w") * F.col("authority")).alias("hub"))
        )
        hub = _rescaled(h_raw, "_s", "hub").localCheckpoint(eager=False)
    return auth.join(hub, "node").select("node", "authority", "hub")


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = 2,
) -> DataFrame:
    """Community detection by semi-synchronous label propagation,
    ``iters`` fixed rounds, fully deterministic (hash-checkable).

    Each round every node adopts the label with the highest total
    incident edge weight among its neighbours, ties to the SMALLEST
    label — integer weights and a total tie order make the update a
    pure function of the graph, unlike classic randomized LPA.
    Fixed iteration count keeps it oracle-unrollable (the pr1/pr2/e7
    discipline for iterative algorithms).

    Scale shape per round: one edge⋈label join + one (node, label)
    partial-agg shuffle + one node-partitioned argmax window; label
    lineage truncates lazily per round (the measured rule). Edges are
    symmetrized once up front. Returns (node, community).
    """
    if iters < 1:
        raise ValueError("label_propagation needs at least one iteration")
    w_col = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    directed = edges.select(
        F.col(src).alias("_a"), F.col(dst).alias("_b"), w_col.alias("_w")
    )
    und = (
        directed.union(
            directed.select(
                F.col("_b").alias("_a"), F.col("_a").alias("_b"), "_w"
            )
        )
        .groupBy("_a", "_b")
        .agg(F.sum("_w").alias("_w"))
        .localCheckpoint()
    )
    labels = und.select(F.col("_a").alias("node")).distinct().withColumn(
        "community", F.col("node")
    )
    from pyspark.sql import Window

    for i in range(iters):
        if i > 0:
            labels = labels.localCheckpoint(eager=False)
        scores = (
            und.join(labels, und._b == labels.node)
            .groupBy(F.col("_a").alias("n"), F.col("community").alias("lab"))
            .agg(F.sum("_w").alias("s"))
        )
        w_arg = Window.partitionBy("n").orderBy(F.desc("s"), F.asc("lab"))
        labels = (
            scores.withColumn("rn", F.row_number().over(w_arg))
            .filter(F.col("rn") == 1)
            .select(F.col("n").alias("node"), F.col("lab").alias("community"))
        )
    return labels
