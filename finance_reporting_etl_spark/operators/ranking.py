"""Distributed exact ntile — global ranking without a global sort.

A bare ``ntile(n) OVER (ORDER BY ...)`` compiles to a single-partition
WindowExec: every row funnels through one task, which is fine on a
post-aggregation input at small SF but becomes a single-executor sort
at 100 TB. This operator computes the IDENTICAL tile assignment with a
bounded-parallelism plan:

1. ``percentile_approx`` sketches ~``buckets`` quantile edges of the
   sort value, fused with the total row count (ONE partial-aggregate
   pass; the driver receives <=buckets scalars).
2. Rows are bucketed by those edges map-side. Ties on the value always
   land in the same bucket (edges partition on value only), so global
   order = (bucket asc, within-bucket order-by).
3. Per-bucket counts become global row-number offsets via a prefix-sum
   self-join over the <=buckets count rows — computed inside the final
   plan, never collected, never a single-partition window.
4. ``row_number`` windows PARTITIONED by bucket, plus the broadcast
   offset, reconstructs the exact global row number; the closed-form
   ntile formula maps it to a tile.

Driver traffic is O(buckets) scalars — never data. The skew ceiling is
the largest single bucket (~N/buckets rows, or the heaviest value tie),
the same bound a range-partitioned sort has.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from finance_reporting_etl_spark.functions.scalars import det_round


def exact_group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: dict[str, float],
    scale: int = 4,
) -> DataFrame:
    """Exact linear-interpolated quantiles per group WITHOUT per-group
    value buffering.

    Spark's ``percentile(...)`` aggregate holds every value of a group
    in the aggregation buffer — a hot group OOMs an executor at 100 TB.
    This computes the identical result with windows partitioned by the
    group key: ``row_number`` + group count locate the two closest
    ranks, and the interpolation ``lower + frac * (upper - lower)``
    (the same formula Spark's Percentile and DuckDB's quantile_cont
    use, so results hash-match bit-for-bit) runs on <=2 surviving rows
    per (group, quantile). The window sort spills; nothing ever
    buffers a whole group in memory.

    ``qs`` maps output column name -> quantile fraction.
    """
    w_order = Window.partitionBy(*group_cols).orderBy(value_col)
    w_group = Window.partitionBy(*group_cols)
    b = (
        df.select(*group_cols, value_col)
        .withColumn("__rn", F.row_number().over(w_order))
        .withColumn("__cnt", F.count(F.lit(1)).over(w_group))
    )
    aggs, finals = [], []
    for name, q in qs.items():
        h = (F.col("__cnt") - 1) * F.lit(float(q))  # 0-based fractional rank
        lo = (F.floor(h) + 1).cast("long")
        hi = (F.ceil(h) + 1).cast("long")
        frac = h - F.floor(h)
        aggs += [
            F.min(F.when(F.col("__rn") == lo, F.col(value_col))).alias(f"__lo_{name}"),
            F.min(F.when(F.col("__rn") == hi, F.col(value_col))).alias(f"__hi_{name}"),
            F.min(frac).alias(f"__fr_{name}"),
        ]
        finals.append(
            det_round(
                F.col(f"__lo_{name}")
                + F.col(f"__fr_{name}") * (F.col(f"__hi_{name}") - F.col(f"__lo_{name}")),
                scale,
            ).alias(name)
        )
    return b.groupBy(*group_cols).agg(*aggs).select(*group_cols, *finals)


def _edge_bucket(col_name: str, edges: list) -> Column:
    """Bucket index = number of sketch edges strictly below the value,
    as ONE flat `size(filter(<literal edge array>, e -> v > e))`
    expression (same integers as the old chained-when sum, NULL -> 0
    either way).

    Two measured failure modes shape this form:
    - a <=63-term chained when() sum is a deep expression tree that
      whole-stage codegen recompiles per plan (~2s/query constant on
      the zorder Morton input);
    - the flat lambda body references the column ONCE, so
      CollapseProject happily inlines a COMPUTED key (pps' md5 bucket)
      into the lambda, re-evaluating it per array element,
      interpreted (~2.3s/query on pps). The when() null-guard below
      references the column a second time, which keeps a non-cheap
      key expression materialized in its own projection (the
      optimizer's multi-reference rule) while costing nothing for
      plain attribute keys.
    """
    v = F.col(col_name)
    if not edges:
        return F.lit(0).cast("int")  # degenerate sketch (constant input)
    flat = F.size(
        F.filter(F.array(*[F.lit(e) for e in edges]), lambda e: v > e)
    )
    return F.when(v.isNull(), F.lit(0)).otherwise(flat).cast("int")


def distributed_ntile(
    df: DataFrame,
    n: int,
    value_col: str,
    tiebreak_cols: list[str],
    out_col: str = "tile",
    buckets: int = 64,
) -> DataFrame:
    """Exact ``ntile(n) OVER (ORDER BY value_col, *tiebreak_cols)``.

    The (value, tiebreak) key must be unique per row — the same
    precondition a deterministic ntile needs anywhere.

    Two jobs total, no retained state (round-4 rework): job 1 is a
    single fused aggregate (quantile sketch + total row count); the
    returned plan is job 2, which derives per-bucket counts, turns them
    into global offsets with a prefix-sum self-join over the <=buckets
    count rows (bounded, broadcast — never a single-partition window),
    and broadcast-joins those offsets back onto the bucketed rows.
    The upstream plan appears in both branches of job 2 with an
    identical shuffle subtree, so ReuseExchange computes it once; no
    ``localCheckpoint`` means no executor-storage blocks outlive the
    call (ADVICE r3). Callers with an expensive upstream can persist it
    themselves — the operator runs exactly two passes either way.
    """
    qs = [i / buckets for i in range(1, buckets)]
    # Edges only steer bucket BALANCE — any edge set yields exact tiles
    # (ties stay bucket-local, offsets are exact) — so the sketch runs
    # on a deterministic 1-in-8 subsample while the fused count stays
    # exact over all rows. One pass either way.
    sample_val = F.when(
        F.abs(F.hash(F.col(value_col), *[F.col(c) for c in tiebreak_cols])) % 8 == 0,
        F.col(value_col),
    )
    head = df.agg(
        F.percentile_approx(sample_val, qs, 2_000).alias("edges"),
        F.count(F.lit(1)).alias("total"),
    ).head()
    edges = sorted(set(head["edges"] or []))
    total = head["total"]

    # bucket = number of edges below the value. The old form chained
    # <=63 when(...)+when(...) terms into one deep expression tree —
    # whole-stage codegen recompiled that tree per query at a visible
    # per-plan constant. One array filter over a literal edge array is
    # the same integer with a tiny, flat expression.
    dfb = df.withColumn("__bucket", _edge_bucket(value_col, edges))

    counts = dfb.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__cnt"))
    earlier = counts.select(
        F.col("__bucket").alias("__b2"), F.col("__cnt").alias("__cnt2")
    )
    # prefix sum over <=buckets rows: each bucket's offset is the row
    # count of all earlier buckets (triangle join, hash-partitioned by
    # __bucket — bounded work, no global exchange)
    off_df = (
        counts.join(F.broadcast(earlier), F.col("__b2") < F.col("__bucket"), "left")
        .groupBy("__bucket")
        .agg(F.coalesce(F.sum("__cnt2"), F.lit(0)).alias("__offset"))
    )

    w = Window.partitionBy("__bucket").orderBy(value_col, *tiebreak_cols)
    rn = (F.row_number().over(w) + F.col("__offset")).alias("__rn")

    # ntile(n) over N rows: the first N%n tiles hold ceil(N/n) rows,
    # the rest floor(N/n). q == 0 (N < n) degenerates to tile = rn.
    q, r = divmod(total, n)
    ranked = dfb.join(F.broadcast(off_df), "__bucket").withColumn("__rn", rn)
    if q == 0:
        tile = F.col("__rn")
    else:
        head = r * (q + 1)
        tile = F.when(
            F.col("__rn") <= head,
            (F.floor((F.col("__rn") - 1) / (q + 1)) + 1),
        ).otherwise(r + F.floor((F.col("__rn") - head - 1) / q) + 1)
    return ranked.withColumn(out_col, tile.cast("int")).drop(
        "__bucket", "__offset", "__rn"
    )


def distributed_cumsum(
    df: DataFrame,
    sum_col: str,
    key_col: str,
    tiebreak_cols: list[str],
    out_col: str = "cum",
    buckets: int = 64,
) -> DataFrame:
    """Exact global running total ``sum(sum_col) OVER (ORDER BY
    key_col, *tiebreaks ROWS UNBOUNDED PRECEDING)`` with NO
    single-partition window — the :func:`distributed_ntile` recipe
    generalized from prefix COUNTS to prefix SUMS (Pareto/ABC curves,
    cumulative market share, token-budget cutoffs all need this over
    data-sized inputs).

    Same two-job shape: a sampled quantile sketch steers bucket
    BALANCE only (any edge set is exact — ties stay bucket-local);
    per-bucket totals prefix-sum through a <=buckets-row triangle join
    (broadcast); rows get offset + an in-bucket running sum from a
    bucket-partitioned window, which spills instead of ever holding
    the global order in one task. For exactness across engines use an
    integer ``sum_col`` (the PLANS.md #10 integer-scaling recipe) —
    float prefix sums are order-defined and this operator pins the
    same total order a SQL window would.

    Descending order: pass a negated key (and negated tiebreaks if
    they must also reverse); the running sum itself is unaffected.
    """
    qs = [i / buckets for i in range(1, buckets)]
    sample_val = F.when(
        F.abs(F.hash(F.col(key_col), *[F.col(c) for c in tiebreak_cols])) % 8 == 0,
        F.col(key_col),
    )
    edges = sorted(
        set(
            df.agg(F.percentile_approx(sample_val, qs, 2_000).alias("e")).head()["e"]
            or []
        )
    )
    # same flat bucket-assign as distributed_ntile (count of edges
    # below the key via one literal-array filter, not a 63-deep when
    # chain that codegen recompiles per plan)
    dfb = df.withColumn("__bucket", _edge_bucket(key_col, edges))

    totals = dfb.groupBy("__bucket").agg(F.sum(sum_col).alias("__tot"))
    earlier = totals.select(
        F.col("__bucket").alias("__b2"), F.col("__tot").alias("__tot2")
    )
    off_df = (
        totals.join(F.broadcast(earlier), F.col("__b2") < F.col("__bucket"), "left")
        .groupBy("__bucket")
        .agg(F.coalesce(F.sum("__tot2"), F.lit(0)).alias("__offset"))
    )
    w = (
        Window.partitionBy("__bucket")
        .orderBy(key_col, *tiebreak_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dfb.join(F.broadcast(off_df), "__bucket")
        .withColumn(out_col, F.sum(sum_col).over(w) + F.col("__offset"))
        .drop("__bucket", "__offset")
    )


def distributed_ntile_melted(
    df: DataFrame,
    n: int,
    group_col: str,
    value_col: str,
    tiebreak_cols: list[str],
    out_col: str = "tile",
    buckets: int = 64,
) -> DataFrame:
    """Exact ntile(n) computed INDEPENDENTLY per group over a melted
    (group, value, tiebreaks) frame — the fleet version of
    :func:`distributed_ntile`, applying the PLANS.md lesson that a
    shard/metric id belongs in the partition key, not a driver loop:
    scoring k metrics (RFM's three, a feature store's hundreds) costs
    ONE sketch job, ONE per-(group, bucket) offset round and ONE
    window pass over the melted rows, instead of k sequential
    invocations with k driver barriers.

    Returns the input columns plus ``out_col``. Same exactness
    contract as distributed_ntile: sampled edges steer bucket balance
    only; per-(group, bucket) counts, triangle-join offsets (bounded
    by groups x buckets, broadcast) and bucket-local windows make the
    global rank — and therefore the tile — exact."""
    qs = [i / buckets for i in range(1, buckets)]
    sample_val = F.when(
        F.abs(F.hash(F.col(value_col), *[F.col(c) for c in tiebreak_cols])) % 8 == 0,
        F.col(value_col),
    )
    head = (
        df.groupBy(group_col)
        .agg(
            F.percentile_approx(sample_val, qs, 2_000).alias("edges"),
            F.count(F.lit(1)).alias("total"),
        )
        .collect()
    )
    edges_by_group = {r[group_col]: sorted(set(r["edges"] or [])) for r in head}
    totals_by_group = {r[group_col]: r["total"] for r in head}

    # per-group bucket assignment: one literal-array filter per group
    # under a groups-deep CASE (bounded by groups x buckets literals —
    # no join, no Python). The per-group inner chain used to be
    # <=63 nested when(...) terms; flattening it to an array filter
    # keeps the codegen'd expression tree small (same integers).
    bucket: Column = F.lit(0)
    for g, edges in edges_by_group.items():
        bucket = F.when(
            F.col(group_col) == F.lit(g), _edge_bucket(value_col, edges)
        ).otherwise(bucket)
    dfb = df.withColumn("__bucket", bucket.cast("int"))

    counts = dfb.groupBy(group_col, "__bucket").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    earlier = counts.select(
        F.col(group_col).alias("__g2"),
        F.col("__bucket").alias("__b2"),
        F.col("__cnt").alias("__cnt2"),
    )
    off_df = (
        counts.join(
            F.broadcast(earlier),
            (F.col("__g2") == F.col(group_col))
            & (F.col("__b2") < F.col("__bucket")),
            "left",
        )
        .groupBy(group_col, "__bucket")
        .agg(F.coalesce(F.sum("__cnt2"), F.lit(0)).alias("__offset"))
    )
    w = Window.partitionBy(group_col, "__bucket").orderBy(
        value_col, *tiebreak_cols
    )
    rn = (F.row_number().over(w) + F.col("__offset")).alias("__rn")
    ranked = dfb.join(F.broadcast(off_df), [group_col, "__bucket"]).withColumn(
        "__rn", rn
    )

    # per-group tile arithmetic (ntile fill rule) as literal whens
    tile: Column = F.lit(0)
    for g, total in totals_by_group.items():
        q, r = divmod(total, n)
        if q == 0:
            t = F.col("__rn")
        else:
            head_rows = r * (q + 1)
            t = F.when(
                F.col("__rn") <= head_rows,
                (F.floor((F.col("__rn") - 1) / (q + 1)) + 1),
            ).otherwise(r + F.floor((F.col("__rn") - head_rows - 1) / q) + 1)
        tile = F.when(F.col(group_col) == F.lit(g), t).otherwise(tile)
    return ranked.withColumn(out_col, tile.cast("int")).drop(
        "__bucket", "__offset", "__rn"
    )


def multi_metric_ntile_scores(
    df: DataFrame,
    metrics: dict[str, str],
    n: int,
    key_cols: list[str],
    out_suffix: str = "_score",
) -> DataFrame:
    """Score several metrics with exact global ntiles in ONE melted
    pass and pivot back to wide columns.

    ``metrics`` maps metric id -> source column (cast to double for
    ranking); output adds ``{metric}{out_suffix}`` int columns to the
    key columns. One :func:`distributed_ntile_melted` pass covers all
    metrics — the metric id rides the partition key, so the job count
    stays constant as metrics grow, where sequential ntile calls pay
    a sketch job + offset round + window pass per metric."""
    melted = None
    for mid, col in metrics.items():
        part = df.select(
            *key_cols,
            F.lit(mid).alias("metric"),
            F.col(col).cast("double").alias("v"),
        )
        melted = part if melted is None else melted.unionAll(part)
    tiles = distributed_ntile_melted(melted, n, "metric", "v", key_cols, out_col="score")
    return tiles.groupBy(*key_cols).agg(
        *[
            F.max(F.when(F.col("metric") == mid, F.col("score"))).alias(
                f"{mid}{out_suffix}"
            )
            for mid in metrics
        ]
    )


def winsorized_group_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
) -> DataFrame:
    """Outlier-robust per-group value stats: clip at the exact
    nearest-rank p_lo/p_hi ORDER STATISTICS (real data values, so a
    fixed-decimal input keeps its grid), then mean/sd over
    integer-scaled cents — sums are exact integers in any
    partial-aggregation order and the single float division at the end
    is IEEE-identical across engines (the PLANS.md #10 tie-proofing
    recipe applied to second moments). The rank pass is a
    group-partitioned window (spills, never buffers a group); bounds
    are a groups-sized broadcast join back. Input values must be on a
    2-decimal grid (cents scaling). Returns (group, n, lo_cut, hi_cut,
    mean_raw, mean_winsor, sd_winsor)."""
    w_ord = Window.partitionBy(group_col).orderBy(value_col, tiebreak_col)
    w_grp = Window.partitionBy(group_col)
    b = df.withColumn("rn", F.row_number().over(w_ord)).withColumn(
        "cnt", F.count(F.lit(1)).over(w_grp)
    )
    k_lo = F.greatest(
        F.ceil(F.col("cnt") * p_lo).cast("long"), F.lit(1).cast("long")
    )
    k_hi = F.greatest(
        F.ceil(F.col("cnt") * p_hi).cast("long"), F.lit(1).cast("long")
    )
    bounds = b.groupBy(group_col).agg(
        F.min(F.when(F.col("rn") == k_lo, F.col(value_col))).alias("lo_cut"),
        F.min(F.when(F.col("rn") == k_hi, F.col(value_col))).alias("hi_cut"),
    )
    c = b.join(F.broadcast(bounds), group_col).select(
        group_col,
        F.col("lo_cut"),
        F.col("hi_cut"),
        F.round(F.col(value_col) * 100).cast("long").alias("rawi"),
        F.round(
            F.least(F.greatest(F.col(value_col), F.col("lo_cut")), F.col("hi_cut"))
            * 100
        )
        .cast("long")
        .alias("wini"),
    )
    n = F.count(F.lit(1))
    sum_raw = F.sum("rawi").cast("double")
    sum_win = F.sum("wini").cast("double")
    sum_sq = F.sum(F.col("wini") * F.col("wini")).cast("double")
    return c.groupBy(group_col).agg(
        n.alias("n"),
        F.min("lo_cut").alias("lo_cut"),
        F.min("hi_cut").alias("hi_cut"),
        det_round(sum_raw / 100.0 / n, 6).alias("mean_raw"),
        det_round(sum_win / 100.0 / n, 6).alias("mean_winsor"),
        # sample sd is undefined for a single observation: explicit
        # NULL, not a divide-by-zero crash under ANSI mode (found by
        # the hypothesis reference test; greatest() would swallow a
        # NULLIF into 0.0, hence the WHEN gate)
        F.when(
            n > 1,
            det_round(
                F.sqrt(
                    F.greatest(
                        (sum_sq - sum_win * sum_win / n)
                        / 10000.0
                        / (n - F.lit(1)),
                        F.lit(0.0),
                    )
                ),
                6,
            ),
        ).alias("sd_winsor"),
    )
