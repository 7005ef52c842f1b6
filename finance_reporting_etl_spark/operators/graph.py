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
from finance_reporting_etl_spark.functions.scalars import det_round_sql as _dr


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 8,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 4,
    broadcast_node_limit: int = 10_000_000,
    validate: bool = False,
    symmetric: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list whose node set is
    CLOSED under dst (every dst also appears as a src) — true for any
    symmetrized/undirected graph, which has no dangling nodes, so no
    redistribution term is needed. Dedupe edges upstream. A directed
    graph with pure sinks violates the precondition: sink nodes would
    be absent from the output and their incoming mass silently
    dropped (r5 review) — pass ``validate=True`` to pay one anti-join
    count that raises instead.

    The rank table is |V| rows — tiny next to |E| — so when |V| is
    under ``broadcast_node_limit`` it ships as a broadcast each
    iteration and the ONLY per-iteration exchange is the map-side-
    combined groupBy(dst); beyond that (billion-node graphs) the hint
    is dropped and the join falls back to shuffling ranks to the
    cached edge partitioning. Lineage is cut every
    ``checkpoint_every`` iterations (eager localCheckpoint) — frequent
    enough to keep plans shallow, rare enough not to serialize every
    round (measured 2x end-to-end vs per-iteration checkpoints at
    sf0.1; every-4 beats every-2 by a further ~25% on the 8-iteration
    co-purchase run — plans stay shallow enough at depth 4).

    ``symmetric=True`` (for symmetrized/undirected edge lists, where
    every node is guaranteed an in-edge) derives each round's ranks
    directly from the contribution aggregate, skipping the
    re-attach join against the node table — one broadcast build and
    one hash join fewer PER ITERATION, with bit-identical ranks
    because the dropped coalesce branch never fired.

    Returns (id, rank) with rank scaled by |V| (mean 1.0) so small
    graphs keep float precision.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # degrees ride with the cached edges: the loop body never re-joins
    ed = e.join(deg, "src").persist()
    # size-adaptive partitioning for the 8 per-iteration join+agg
    # stages (guide §2.1): the count materializes the cache (a job the
    # first iteration would otherwise pay) and sizes the working set —
    # a small graph over a task-per-core layout pays 8x the task-launch
    # overhead for no parallelism win (measured 5.7 -> 3.9s on the
    # 2.4M-edge co-purchase graph at local[32]); a 100 TB graph keeps
    # every core busy because p caps at the cluster parallelism.
    n_edges = ed.count()
    ed_cached = ed  # unpersist target: coalesce below derives a new plan
    parallelism = int(edges.sparkSession.sparkContext.defaultParallelism)
    p = max(1, min(parallelism, n_edges // 500_000 + 1))
    if p < ed.rdd.getNumPartitions():
        ed = ed.coalesce(p)
    nodes = ed.select(F.col("src").alias("id")).distinct().persist()
    if validate:
        n_sinks = (
            e.select(F.col("dst").alias("id"))
            .distinct()
            .join(nodes, "id", "left_anti")
            .count()
        )
        if n_sinks:
            raise ValueError(
                f"{n_sinks} dst nodes never appear as src (dangling "
                f"sinks); symmetrize the edge list or add self-loops"
            )
        if symmetric:
            # symmetric mode additionally REQUIRES every node to have
            # an in-edge (contribs covers only dst values); a merely
            # dst-closed directed graph would silently drop in-edge-
            # less nodes from the output (ADVICE r14)
            n_no_in = nodes.join(
                e.select(F.col("dst").alias("id")).distinct(),
                "id",
                "left_anti",
            ).count()
            if n_no_in:
                raise ValueError(
                    f"{n_no_in} nodes have no in-edge; symmetric=True "
                    f"requires a symmetrized edge list"
                )
    n = nodes.count()
    bcast = n <= broadcast_node_limit
    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
    for i in range(iters):
        r = ranks.withColumnRenamed("id", "src")
        contribs = (
            ed.join(F.broadcast(r) if bcast else r, "src")
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        ).withColumnRenamed("dst", "id")
        if symmetric:
            # in a symmetric edge list every node has an in-edge, so
            # contribs already covers the whole node set: the per-
            # iteration nodes-join (one broadcast build + hash join
            # per round, 8 per run) only existed to re-attach
            # zero-in-degree nodes that cannot occur here. Same float
            # ops (the coalesce never fired), same ranks.
            ranks = contribs.select(
                "id",
                (F.lit(base) + F.lit(damping) * F.col("s")).alias("rank"),
            )
        else:
            ranks = nodes.join(
                F.broadcast(contribs) if bcast else contribs, "id", "left"
            ).select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    # materialize the final |V|-row result, then release the cached
    # edge/node tables deterministically (no storage outlives the call)
    out = ranks.select("id", (F.col("rank") * n).alias("rank")).localCheckpoint(
        eager=True
    )
    ed_cached.unpersist()
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
        + f"\nSELECT id, {_dr('rank * (SELECT n FROM nn)', scale_round)} AS rank FROM pr{iters}"
    )


def triangle_counts(edges: DataFrame, a: str = "id_a", b: str = "id_b") -> DataFrame:
    """Per-node triangle counts via degree-ordered orientation — the
    standard trick that bounds wedge generation: direct every
    undirected edge from its lower-(degree, id) endpoint to the higher
    one, so each node's out-degree is O(sqrt(m)) on any graph and the
    wedge self-join generates sum d_out^2 candidates instead of
    sum d^2 (hub-proof). A wedge u->v, u->w closes iff oriented edge
    v->w exists; every triangle is counted exactly once, then credited
    to all three corners.

    ``edges``: undirected, deduped, canonical (id_a < id_b).
    Returns (id, n_triangles) for nodes in >= 1 triangle.
    """
    e = edges.select(F.col(a).alias("x"), F.col(b).alias("y"))
    deg = (
        e.select(F.col("x").alias("id"))
        .unionAll(e.select(F.col("y").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # degrees are |V|-sized — broadcast both attach joins
    dx = F.broadcast(deg.select(F.col("id").alias("x"), F.col("deg").alias("dx")))
    dy = F.broadcast(deg.select(F.col("id").alias("y"), F.col("deg").alias("dy")))
    ranked = e.join(dx, "x").join(dy, "y")
    lower_first = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    oriented = ranked.select(
        F.when(lower_first, F.col("x")).otherwise(F.col("y")).alias("src"),
        F.when(lower_first, F.col("y")).otherwise(F.col("x")).alias("dst"),
    )
    w1 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    w2 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    wedges = w1.join(w2, "u").filter(F.col("v") < F.col("w"))
    # the closing probe is the canonical (min, max) edge set — which
    # IS the input e (id_a < id_b), so probe e directly instead of
    # re-deriving least/greatest over oriented (that re-ran both
    # degree joins and the orientation swap a second time — r5
    # review). Broadcast so the (much larger, sum d_out^2) wedge
    # stream probes it map-side and never shuffles — measured 3x at
    # sf0.1 on the dense co-purchase graph. For graphs whose edge set
    # outgrows broadcast, drop the hint: same plan, shuffled probe.
    close = F.broadcast(e.select(F.col("x").alias("v"), F.col("y").alias("w")))
    tri = wedges.join(close, ["v", "w"])
    corners = (
        tri.select(F.col("u").alias("id"))
        .unionAll(tri.select(F.col("v").alias("id")))
        .unionAll(tri.select(F.col("w").alias("id")))
    )
    return corners.groupBy("id").agg(F.count(F.lit(1)).alias("n_triangles"))


def pagerank_weighted(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 8,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    checkpoint_every: int = 4,
    broadcast_node_limit: int = 10_000_000,
    symmetric: bool = False,
) -> DataFrame:
    """Weighted PageRank: contributions split proportionally to edge
    weight (contrib = rank * w / weighted_out_degree) instead of
    uniformly. Same loop shape as :func:`pagerank` — weighted degrees
    ride the cached edges, only |V|-sized rank rows move per iteration.
    Weights must be positive, and the node set must be closed under
    dst (see :func:`pagerank`: a symmetric weighted graph qualifies;
    pure sinks would be silently dropped otherwise). ``symmetric=True``
    drops the per-iteration node re-attach join exactly as in
    :func:`pagerank`."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(weight).alias("w"))
    wdeg = e.groupBy("src").agg(F.sum("w").alias("wdeg"))
    ed = e.join(wdeg, "src").persist()
    # same size-adaptive coalesce as pagerank (see comment there)
    n_edges = ed.count()
    ed_cached = ed  # unpersist target: coalesce below derives a new plan
    parallelism = int(edges.sparkSession.sparkContext.defaultParallelism)
    p = max(1, min(parallelism, n_edges // 500_000 + 1))
    if p < ed.rdd.getNumPartitions():
        ed = ed.coalesce(p)
    nodes = ed.select(F.col("src").alias("id")).distinct().persist()
    n = nodes.count()
    bcast = n <= broadcast_node_limit
    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
    for i in range(iters):
        r = ranks.withColumnRenamed("id", "src")
        contribs = (
            ed.join(F.broadcast(r) if bcast else r, "src")
            .select("dst", (F.col("rank") * F.col("w") / F.col("wdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        ).withColumnRenamed("dst", "id")
        if symmetric:
            ranks = contribs.select(
                "id",
                (F.lit(base) + F.lit(damping) * F.col("s")).alias("rank"),
            )
        else:
            ranks = nodes.join(
                F.broadcast(contribs) if bcast else contribs, "id", "left"
            ).select(
                "id",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))).alias("rank"),
            )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    out = ranks.select("id", (F.col("rank") * n).alias("rank")).localCheckpoint(eager=True)
    ed_cached.unpersist()
    nodes.unpersist()
    return out


def pagerank_weighted_oracle_sql(
    edges_sql: str, damping: float = 0.85, iters: int = 8, scale_round: int = 6
) -> str:
    """Unrolled-CTE oracle for :func:`pagerank_weighted`; ``edges_sql``
    must yield (src, dst, w)."""
    d = damping
    parts = [
        f"WITH edges AS ({edges_sql})",
        "wdeg AS (SELECT src, sum(w) AS wdeg FROM edges GROUP BY src)",
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
                SELECT e.dst AS id, sum(p.rank * e.w / wdeg.wdeg) AS s
                FROM edges e
                JOIN pr{i - 1} p ON p.id = e.src
                JOIN wdeg ON wdeg.src = e.src
                GROUP BY e.dst
            ) c USING (id))"""
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT id, {_dr('rank * (SELECT n FROM nn)', scale_round)} AS rank FROM pr{iters}"
    )


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Multi-source BFS: exact minimum hop count from any source node,
    up to ``max_hops`` (unreached nodes are absent from the result).

    Frontier-based — the classic distributed-BFS shape (Pregel's
    reachability step expressed as DataFrames): each round expands ONLY
    the previous frontier (an anti-join removes already-settled nodes),
    so per-round work is O(edges incident to the frontier), not O(|E|).
    Contrast with the min-label-propagation form (dedup.py connected
    components), which re-joins every settled node each round; for BFS
    the frontier form computes the same fixpoint with monotonically
    shrinking work. All arithmetic is integer — the oracle (unrolled
    min-agg CTEs, :func:`bfs_oracle_sql`) hash-matches exactly.

    Scale: the edge table is hash-partitioned by ``src`` once and
    cached; each round shuffles only frontier-sized rows. Distances
    accumulate in a union whose lineage is cut per round (eager
    ``localCheckpoint``, same policy as :func:`pagerank`).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
    settled = sources.select(
        F.col(sources.columns[0]).alias("id"), F.lit(0).alias("dist")
    ).localCheckpoint(eager=True)
    frontier = settled
    for h in range(1, max_hops + 1):
        neighbors = (
            e.join(frontier.withColumnRenamed("id", "src").drop("dist"), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        frontier = (
            neighbors.join(settled, "id", "left_anti")
            .select("id", F.lit(h).alias("dist"))
            .localCheckpoint(eager=True)
        )
        settled = settled.unionAll(frontier).localCheckpoint(eager=True)
    e.unpersist()
    return settled


def bfs_oracle_sql(edges_sql: str, sources_sql: str, max_hops: int = 4) -> str:
    """The same BFS fixpoint unrolled as min-agg CTEs for DuckDB: each
    round, a node's distance is the min of its current distance and
    1 + any in-neighbor's distance — equivalent to the frontier form
    because BFS distances are monotone (integer-exact either way)."""
    parts = [
        f"WITH edges AS ({edges_sql})",
        f"d0 AS (SELECT id, 0 AS dist FROM ({sources_sql}))",
    ]
    for h in range(1, max_hops + 1):
        parts.append(
            f"""d{h} AS (
            SELECT id, CAST(min(dist) AS INT) AS dist FROM (
                SELECT id, dist FROM d{h - 1}
                UNION ALL
                SELECT e.dst AS id, p.dist + 1 AS dist
                FROM edges e JOIN d{h - 1} p ON p.id = e.src
            ) GROUP BY id)"""
        )
    return ",\n".join(parts) + f"\nSELECT id, dist FROM d{max_hops}"
