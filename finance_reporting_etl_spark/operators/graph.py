"""Iterative graph algorithms on DataFrames (SURVEY §2 X-tier extension;
companion to the near-dup connected-components loop in dedup.py:371).

PageRank here is the canonical "iterative join-aggregate" shape a
training-data pipeline needs for link-graph scoring (domain authority for
crawl prioritization / quality weighting — the Common-Crawl use). The
implementation is the standard power iteration expressed as DataFrame
ops, one shuffle per iteration:

    contrib(dst) = sum over in-edges of rank(src) / out_degree(src)
    rank'        = (1 - d) / n + d * contrib

Scale notes (1000-executor shape):
- The edge table is the big operand; it is hash-partitioned by ``src``
  ONCE (a single repartition) and cached — every iteration's
  edges-to-ranks join then shuffles only the rank table (|V| rows, tiny
  next to |E|) to the edges' existing partitioning.
- Degrees ride inside the cached edge partition (attached pre-loop), so
  the loop body is join -> groupBy(dst) -> map: exactly two exchanges of
  |V|-sized data per iteration, never |E|.
- ``localCheckpoint`` each iteration cuts the growing lineage (same
  policy as dedup.py's label-propagation loop).
- No driver-side state: convergence can be checked with a 1-row agg of
  |rank' - rank| when needed; the fixed-iteration form keeps the oracle
  expressible as unrolled SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (dedupe edges
    upstream; symmetrize for undirected graphs — a symmetric graph has
    no dangling nodes, so no redistribution term is needed).

    Returns (id, rank) with rank scaled by |V| (mean 1.0) so small
    graphs keep float precision.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # degrees ride with the cached, src-partitioned edges: the loop body
    # never re-joins them
    ed = (
        e.join(deg, "src")
        .repartition(e.sparkSession.sparkContext.defaultParallelism, "src")
        .persist()
    )
    nodes = ed.select(F.col("src").alias("id")).distinct().persist()
    n = nodes.count()
    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
    for _ in range(iters):
        contribs = (
            ed.join(ranks.withColumnRenamed("id", "src"), "src")
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint(eager=True)
        )
    out = ranks.select("id", (F.col("rank") * n).alias("rank"))
    ed.unpersist()
    nodes.unpersist()
    return out


def pagerank_oracle_sql(
    edges_sql: str, damping: float = 0.85, iters: int = 8, scale_round: int = 6
) -> str:
    """The SAME power iteration unrolled as chained SQL CTEs (pr0..prN)
    for the DuckDB oracle — recursive CTEs can't aggregate in the
    recursive term, but a fixed iteration count needs no recursion."""
    d = damping
    parts = [
        f"WITH edges AS ({edges_sql})",
        "deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)",
        "nodes AS (SELECT DISTINCT src AS id FROM edges)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "pr0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""pr{i} AS (
            SELECT nodes.id,
                   (1 - {d}) / (SELECT n FROM nn)
                   + {d} * coalesce(c.s, 0) AS rank
            FROM nodes LEFT JOIN (
                SELECT e.dst AS id, sum(p.rank / deg.deg) AS s
                FROM edges e
                JOIN pr{i - 1} p ON p.id = e.src
                JOIN deg ON deg.src = e.src
                GROUP BY e.dst
            ) c USING (id))"""
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT id, round(rank * (SELECT n FROM nn), {scale_round}) AS rank FROM pr{iters}"
    )
