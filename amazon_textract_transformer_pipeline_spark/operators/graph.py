"""Host-graph centrality — PageRank (Page et al. 1999) as bounded
relational rounds. Web-corpus pipelines rank hosts to prioritize crawl
frontiers and as a document-quality prior (Common Crawl publishes
host-level centrality rankings for exactly this use); the reference
repo's per-document confidence ranking (E8-E12) has no cross-document
analog, so this supplies the corpus-level one.

Model (pinned, replayed exactly by the DuckDB oracle):

* the graph is the DISTINCT directed edge set; the node universe is
  sources ∪ targets; out-degree counts distinct out-edges;
* ranks start uniform (1/N) and iterate
  ``r'(v) = (1-d)/N + d * (Σ_{(u,v)} r(u)/outdeg(u) + D/N)`` where
  ``D`` is the dangling mass (rank parked on nodes with no out-edges,
  redistributed uniformly — the canonical formulation, total mass 1);
* every round's ranks are rounded to 9 dp IN BOTH ENGINES — this pins
  the iterative state so float combine-order wobble cannot compound
  across rounds (the engine's cross-engine FP practice applied to a
  fixed point).

Scale shape (100 TB audit): one distinct + one out-degree aggregate up
front (uniform src key), then per round ONE join of the rank relation
to the edge list (shuffle on node id) + one contribution aggregate —
the web-graph shape every Pregel paper assumes, with no driver collect:
the two scalars (N, dangling mass) ride single-row broadcast cross
joins. ``localCheckpoint`` per round bounds lineage (k-means pattern);
host-grain keys make skew real (a hub host has millions of in-edges) —
AQE skew-join handles the reduce side, and contributions are
map-side-combined per (dst) before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85


def pagerank(edges: DataFrame, n_iter: int = 8, damping: float = DAMPING,
             src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Returns (node, rank) after ``n_iter`` rounds. Collect-free."""
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst")).distinct() \
        .localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    base = nodes.join(outdeg, nodes.node == outdeg.src, "left") \
        .select("node", F.coalesce("outdeg", F.lit(0)).alias("outdeg")) \
        .localCheckpoint(eager=False)
    n_rel = base.agg(F.count("*").cast("double").alias("n"))

    ranks = base.crossJoin(F.broadcast(n_rel)) \
        .select("node", "outdeg", F.round(F.lit(1.0) / F.col("n"), 9)
                .alias("rank"))
    for _ in range(n_iter):
        dangling = (
            ranks.agg(F.sum(F.when(F.col("outdeg") == 0, F.col("rank"))
                            .otherwise(0.0)).alias("dmass"))
        )
        contrib = (
            ranks.filter("outdeg > 0")
            .join(e, ranks.node == e.src)
            .groupBy("dst")
            .agg(F.sum(F.expr("rank / outdeg")).alias("c"))
        )
        ranks = (
            base.join(contrib, base.node == contrib.dst, "left")
            .crossJoin(F.broadcast(n_rel))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node", "outdeg",
                F.round(
                    (F.lit(1.0) - damping) / F.col("n")
                    + damping * (F.coalesce("c", F.lit(0.0))
                                 + F.col("dmass") / F.col("n")), 9)
                .alias("rank"))
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", "rank")


def pagerank_oracle_sql(edges_cte: str, n_iter: int = 8,
                        damping: float = DAMPING) -> str:
    """DuckDB replay of :func:`pagerank`, rounds unrolled (single-sourced
    semantics). ``edges_cte`` must yield (src, dst)."""
    parts = [f"""
WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_cte})),
nodes AS MATERIALIZED (
  SELECT src AS node FROM e UNION SELECT dst FROM e
),
base AS MATERIALIZED (
  SELECT n.node, coalesce(d.outdeg, 0) AS outdeg
  FROM nodes n LEFT JOIN (
    SELECT src, count(*) AS outdeg FROM e GROUP BY src) d
  ON d.src = n.node
),
nn AS (SELECT count(*)::DOUBLE AS n FROM base),
r0 AS (
  SELECT node, outdeg, round(1.0 / nn.n, 9) AS rank
  FROM base CROSS JOIN nn
)"""]
    for i in range(1, n_iter + 1):
        p = i - 1
        parts.append(f""",
d{i} AS (
  SELECT coalesce(sum(CASE WHEN outdeg = 0 THEN rank ELSE 0.0 END), 0.0)
         AS dmass
  FROM r{p}
),
c{i} AS (
  SELECT e.dst AS dst, sum(r.rank / r.outdeg) AS c
  FROM r{p} r JOIN e ON e.src = r.node
  WHERE r.outdeg > 0 GROUP BY e.dst
),
r{i} AS MATERIALIZED (
  SELECT b.node, b.outdeg,
         round((1.0 - {damping}) / nn.n
               + {damping} * (coalesce(c.c, 0.0) + d.dmass / nn.n), 9)
           AS rank
  FROM base b
  LEFT JOIN c{i} c ON c.dst = b.node
  CROSS JOIN nn CROSS JOIN d{i} d
)""")
    parts.append(f"\nSELECT node, rank FROM r{n_iter}")
    return "".join(parts)
