"""Link-graph operators: PageRank over a crawl's (src, dst) edge list.

A web-scale crawler needs a link-importance signal to prioritize its
frontier and to weight pages for corpus inclusion (Common Crawl publishes
exactly this as its harmonic-centrality / PageRank rankings; OPIC — the
"adaptive on-line page importance" Scrapy's priority queues approximate —
is the online variant).  The reference crawler orders purely BFS
(searchgov: docs in SURVEY §2 O1), so this operator extends the engine the
way its own roadmap would: rank what you crawled to decide what to keep
and what to fetch next.

Scale shape (the 100-TB / 10^10-edge design point):
- Each iteration is ONE shuffle: contributions = ranks ⋈ out-degree edges
  (both pre-partitioned on ``src``; the join is co-partitioned after the
  first iteration's exchange, and AQE handles hub-node skew) followed by a
  groupBy on ``dst`` with map-side partial aggregation.
- Ranks stay (node, double) — never materialize adjacency on the driver;
  no collect anywhere.  Iterations are bounded (``n_iter``), and each
  iteration's result is localCheckpoint'd so the plan stays O(1) deep —
  the same lineage-cut discipline as operators/dedup.connected_components.
- Dangling nodes (no out-edges): their mass is NOT redistributed — the
  contract is rank = (1-d)/N + d * sum(in-neighbor contributions), the
  "lost mass" formulation, chosen because it is exactly reproducible by a
  pure-SQL oracle (a redistribution term needs a per-iteration global sum,
  which the oracle can also do, but the simpler contract keeps every rank
  a finite weighted path sum — and for frontier prioritization only the
  ORDER of ranks matters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration power-method PageRank.

    ``edges``: distinct (src, dst) pairs, self-loops allowed (they feed
    their own rank back).  ``nodes``: one row per node id (defines N and
    keeps isolated nodes in the output at the teleport floor).
    Returns (id_col, pagerank) with pagerank rounded to 6 dp.
    """
    spark = edges.sparkSession
    n_total = nodes.count()  # scalar N: one job, O(1) driver memory
    teleport = (1.0 - damping) / n_total

    deg = edges.groupBy(src_col).agg(F.count("*").alias("out_deg"))
    # (src, dst, out_deg) — static across iterations; materialize once so
    # each iteration pays only the rank join, not a recomputed groupBy
    adj = edges.join(deg, src_col).localCheckpoint(eager=True)

    ranks = nodes.select(
        F.col(id_col).alias(src_col), F.lit(1.0 / n_total).alias("rank")
    ).localCheckpoint(eager=True)

    for _ in range(n_iter):
        contribs = (
            adj.join(ranks, src_col)
            .select(
                F.col(dst_col).alias(id_col),
                (F.col("rank") / F.col("out_deg")).alias("contrib"),
            )
            .groupBy(id_col)
            .agg(F.sum("contrib").alias("in_mass"))
        )
        ranks = (
            nodes.select(id_col)
            .join(contribs, id_col, "left")
            .select(
                F.col(id_col).alias(src_col),
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)  # cut lineage: plan depth stays O(1)
        )

    return ranks.select(
        F.col(src_col).alias(id_col), F.round("rank", 6).alias("pagerank")
    )
