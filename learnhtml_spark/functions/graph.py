"""Link-graph analytics — PageRank over crawl-extracted edges.

The canonical web-scale Spark workload: ranks flow along edges for k
rounds, each round ONE equi-join (ranks ⋈ edges on src) + ONE hash
aggregate (sum contributions by dst).  At 10^12 edges the join is the
job; the production layout pre-partitions edges by src once and reuses
that partitioning every round (`edges = edges.repartition(P, 'src')`
before the loop — Catalyst then reuses the exchange), while ranks (one
row per node) re-shuffle on the same key.  Lineage is truncated every
round with ``localCheckpoint`` so the plan doesn't grow with k.

Two variants:

- ``pagerank``: the general float operator (any out-degree mix, dangling
  mass redistributed via the teleport term).  Float contribution sums
  are partition-order dependent in the last ulps — fine for ranking, not
  for bit-exact oracles.
- ``pagerank_exact``: for graphs with UNIFORM out-degree D (validated,
  loud raise otherwise) and damping 17/20, the recurrence is rescaled to
  pure int64:  with R_0 = 1 and S_t = N·(20D)^t,

      R_{t+1}(v) = 3·D·(20D)^t + 17·Σ_{u→v} R_t(u)

  keeps rank_t(v) = R_t(v)/S_t exactly — every value an integer, so the
  distributed sum is order-independent and the driver oracle can state
  the full computation in unrolled SQL.  Magnitudes: mean R_t = (20D)^t,
  so k=6 rounds at D=2 stay ~12 orders below int64 overflow even with
  extreme skew.

No reference counterpart (the reference has no graph surface); PageRank
follows Page et al. 1999 ("The PageRank citation ranking").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _out_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy("src").agg(F.count("*").alias("out_deg"))


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 6,
    damping: float = 0.85,
) -> DataFrame:
    """General float PageRank: (node) + (src, dst) -> (node, rank).

    Dangling nodes (no out-edges) keep their teleport share; their
    retained mass is redistributed uniformly each round, so Σ rank = 1
    throughout.

    Plan shape (optimization round — the round-6 verdict's one remaining
    scale-killer): the dangling mass is computed IN-PLAN as a broadcast
    one-row aggregate cross-joined into the rank update (the
    ``unigram_lm`` / ``_link_edges`` pattern) instead of a per-round
    driver ``collect()`` — at 10^12 edges the old form ran k extra
    driver-synchronized jobs, each re-scanning ranks⋈deg, to move one
    double to the driver and back.  ``deg`` and ``nodes`` are
    checkpointed once before the loop (``deg`` was re-aggregated from
    the raw edges every round), and the per-round checkpoint is lazy —
    one materialization per round, triggered by the next round's (or the
    final action's) first use.

    Float summation note: the dangling-mass aggregate sums the SAME
    per-node values the old driver-side round computed (rank of every
    non-dangling node), so the result is identical up to the float
    summation order both variants already leave unspecified.
    """
    n = nodes.count()
    deg = _out_degrees(edges).localCheckpoint(eager=False)
    nodes = nodes.localCheckpoint(eager=False)
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contribs = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        # dangling mass: total rank not carried over any edge this round,
        # as a broadcast ONE-ROW aggregate (no driver round trip)
        dangling = (
            ranks.join(deg, ranks.node == deg.src, "left")
            .agg(
                (
                    F.lit(1.0)
                    - F.coalesce(
                        F.sum(
                            F.when(
                                F.col("out_deg").isNotNull(), F.col("rank")
                            ).otherwise(F.lit(0.0))
                        ),
                        F.lit(0.0),
                    )
                ).alias("_dangling")
            )
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("_dangling") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def pagerank_exact(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 6,
) -> DataFrame:
    """Integer-exact PageRank at damping 17/20 for uniform-out-degree
    graphs: (node) + (src, dst) -> (node, rank_scaled) where
    rank(v) = rank_scaled(v) / (N·(20·D)^iters) exactly.

    Every arithmetic step is int64, so the result is bit-identical
    regardless of partitioning/summation order — the property that makes
    a distributed PageRank SQL-oracle-able.  Raises loudly if out-degree
    is not uniform (the rescaling is only exact for uniform D).
    """
    # checkpoint edges FIRST so the uniformity check below doubles as its
    # materialization and every round reuses the stored edge list instead
    # of re-deriving it (scan + count + explode for the synthetic graph)
    edges = edges.localCheckpoint(eager=False)
    degs = _out_degrees(edges).select("out_deg").distinct().collect()
    if len(degs) != 1:
        raise ValueError(
            f"pagerank_exact requires uniform out-degree, found "
            f"{sorted(r.out_deg for r in degs)}"
        )
    d_out = degs[0].out_deg
    # int64 guardrail: mean R_t = (20D)^t; leave ~10^4 headroom for skew
    if (20 * d_out) ** iters > 10**14:
        raise ValueError("iters too large for int64-exact scaling")
    # nodes checkpointed once (re-read every round otherwise); per-round
    # checkpoints are LAZY, so the whole k-round chain materializes as
    # one cascading job at the final action instead of k driver-
    # synchronized eager jobs (integer arithmetic — the result is
    # bit-identical under any execution order)
    nodes = nodes.localCheckpoint(eager=False)
    ranks = nodes.select("node", F.lit(1).cast("long").alias("r"))
    for t in range(iters):
        teleport = 3 * d_out * (20 * d_out) ** t  # 3·D·(20D)^t, exact int
        contribs = (
            edges.join(ranks, edges.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum("r").alias("c"))
            .withColumnRenamed("dst", "node")
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport).cast("long")
                    + F.lit(17) * F.coalesce(F.col("c"), F.lit(0).cast("long"))
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 50
) -> DataFrame:
    """(node) + (src, dst) -> (node, component): each node labeled with
    the MINIMUM node id of its connected component (isolated nodes label
    themselves).  Undirected semantics; self-loops and parallel/reversed
    duplicates are canonicalized away first.

    Algorithm: alternating large-star/small-star contraction (Kiveris et
    al. 2014) — O(log d) shuffled rounds vs label propagation's
    O(diameter), the same battle-tested kernel behind the dedup family's
    ``dup_clusters`` (functions/dedup.py:_star_contract), exposed here
    over arbitrary edge lists (e.g. the crawl link graph)."""
    from learnhtml_spark.functions.dedup import _canon_edges, _star_contract

    canon = _canon_edges(
        edges.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    )
    stars, _rounds = _star_contract(canon, max_iter)
    labels = stars.select(
        F.col("b").alias("node"), F.col("a").alias("component")
    )
    return nodes.join(labels, "node", "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )


def pagerank_exact_sql(
    edge_sql: str, node_sql: str, d_out: int, iters: int = 6
) -> str:
    """Unrolled-iteration DuckDB statement of the EXACT same integer
    recurrence — the driver oracle for ``pagerank_exact``.  ``edge_sql``
    / ``node_sql`` are subqueries yielding (src, dst) and (node)."""
    parts = [
        f"with e as ({edge_sql}), n as ({node_sql}), "
        "r0 as (select node, 1::bigint as r from n)"
    ]
    for t in range(iters):
        teleport = 3 * d_out * (20 * d_out) ** t
        parts.append(
            f", r{t + 1} as (select n.node, {teleport}::bigint + "
            f"17 * coalesce(s.c, 0) as r from n left join "
            f"(select e.dst as node, sum(r{t}.r)::bigint as c from e "
            f"join r{t} on r{t}.node = e.src group by e.dst) s "
            f"using (node))"
        )
    parts.append(f" select node, r as rank_scaled from r{iters}")
    return "".join(parts)
