"""Sketch-based approximate aggregation (BASELINE extension X4).

Count-Min Sketch over a token stream: a depth x width counter grid
where each key increments one cell per row (col = hash_d(key) mod
width) and a point estimate is the MIN over its depth cells — always
an overestimate, never an under (collisions only add). The sketch is
the scale story: its size is FIXED (depth*width cells) no matter how
many tokens stream through, the cell grid is a plain groupBy (map-side
partial combine, one shuffle bounded by depth*width live groups), and
two sketches over disjoint data merge by cell-wise addition — the
property that lets 1000 executors sketch 100 TB independently and
combine at the end.

Public construction (Cormode & Muthukrishnan 2005). Engine-native
hashing (xxhash64) follows the repo's persisted-intermediate oracle
pattern: the (token, d, col) placement table is persisted and every
downstream decision — cell counts, min-estimates, thresholding — is
re-derived in ANSI SQL by the DuckDB oracle from that table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_placements(
    keys: DataFrame, key_col: str = "token", depth: int = 4, width: int = 64
) -> DataFrame:
    """(key, d, col) hash placements for each DISTINCT key — the
    engine-hashed stage (narrow: vocab x depth rows, persistable)."""
    return (
        keys.select(key_col)
        .distinct()
        .select(key_col, F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"))
        .withColumn(
            "col", F.pmod(F.xxhash64(F.col(key_col), F.col("d")), F.lit(width)).cast("int")
        )
    )


def cms_cell_counts(
    key_counts: DataFrame, placements: DataFrame, key_col: str = "token"
) -> DataFrame:
    """The sketch itself: (d, col, cell_cnt). Built from per-key counts
    (equivalent to streaming increments, fewer rows shuffled); at most
    depth*width rows regardless of corpus size."""
    return (
        key_counts.join(placements, key_col)
        .groupBy("d", "col")
        .agg(F.sum("cnt").alias("cell_cnt"))
    )


def cms_estimates(
    placements: DataFrame, sketch: DataFrame, key_col: str = "token"
) -> DataFrame:
    """Point estimates: est(key) = min over d of its cell count. The
    sketch is tiny (depth*width rows) and broadcasts."""
    return (
        placements.join(F.broadcast(sketch), ["d", "col"])
        .groupBy(key_col)
        .agg(F.min("cell_cnt").alias("est_count"))
    )
