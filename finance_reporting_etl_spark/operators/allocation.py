"""Exact monetary allocation: prorate a total over its detail rows.

The classic finance-ETL requirement (invoice totals to line items, fund
fees to positions, budget to cost centers): split ``total`` across a
group's rows proportional to a weight, in integer cents, such that the
allocations sum EXACTLY to the total — no floating-point drift, no lost
or invented cents. Naive ``round(total * w / sum_w)`` leaks cents both
ways; the standard fix is the largest-remainder (Hamilton) method:

1. base share  = floor(total_cents * w_cents / sum_w_cents)   (integer)
2. shortfall   = total_cents - sum(base)   (0 <= shortfall < n_rows)
3. give +1 cent to the ``shortfall`` rows with the largest integer
   remainder ``(total_cents * w_cents) mod sum_w_cents``, ties broken
   by the detail line number.

Everything is 64-bit integer arithmetic (products bounded by
~5e7 * 5e7 = 2.5e15 < 2^63), so the result is bit-identical across
engines and runs — the property the DuckDB oracle hash-checks.

Scale shape: one shuffle on the group key (the window partition); the
rank window sorts only within a group (detail rows per order, bounded),
never globally. The reference's warehouse models (README.md:425-465)
aggregate statement lines into totals; this is the exact inverse
operation at the same grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prorate_largest_remainder(
    detail: DataFrame,
    group_cols: list[str],
    weight_cents_col: str,
    total_cents_col: str,
    tiebreak_cols: list[str],
) -> DataFrame:
    """Allocate ``total_cents_col`` (constant within a group) across the
    group's rows proportional to ``weight_cents_col``, largest-remainder
    corrected. Both columns must be BIGINT cents. Adds ``alloc_cents``;
    groups whose weights sum to <= 0 are dropped (no proportional
    allocation exists — callers wanting 0-weight fallbacks should remap
    weights first).

    Signed inputs are safe: base/remainder use FLOOR division and
    ``pmod`` (non-negative modulus), not Spark's truncate-toward-zero
    ``div``/``%``. With truncation a negative weight (or total) makes
    the remainder negative and the shortfall fall outside [0, n_rows),
    leaking or inventing cents (ADVICE r5); with floor semantics every
    per-row loss is in [0, 1), so 0 <= shortfall < n_rows and the
    sum-exactly-to-total guarantee holds for any signed weights whose
    group sum is positive. For non-negative inputs floor == truncate,
    so existing results are bit-identical.
    """
    g = Window.partitionBy(*group_cols)
    d = detail.withColumn("__sum_w", F.sum(weight_cents_col).over(g)).filter(
        F.col("__sum_w") > 0
    )
    prod = F.col(total_cents_col) * F.col(weight_cents_col)
    # rem = prod mod sum_w in [0, sum_w); base = exact floor(prod/sum_w)
    # ((prod - rem) is divisible by sum_w, so `div` is exact here).
    d = d.withColumn("__rem", F.pmod(prod, F.col("__sum_w"))).withColumn(
        "__base",
        F.expr(
            f"(({total_cents_col} * {weight_cents_col}) - __rem) div __sum_w"
        ),
    )
    rnk = Window.partitionBy(*group_cols).orderBy(
        F.col("__rem").desc(), *[F.col(c) for c in tiebreak_cols]
    )
    d = (
        d.withColumn("__short", F.col(total_cents_col) - F.sum("__base").over(g))
        .withColumn("__rnk", F.row_number().over(rnk))
        .withColumn(
            "alloc_cents",
            F.col("__base") + (F.col("__rnk") <= F.col("__short")).cast("bigint"),
        )
    )
    return d.drop("__sum_w", "__base", "__rem", "__short", "__rnk")


def fifo_match(
    buys: DataFrame,
    sells: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    qty_col: str,
    total_cents_col: str,
) -> DataFrame:
    """FIFO lot matching as a cumulative-quantity interval join — the
    realized-PnL primitive (cost basis, inventory consumption, queue
    accounting) without any per-row iteration.

    The classic formulation walks buys and sells with two cursors;
    the distributed identity instead places each side on a shared
    cumulative-quantity axis per key: buy i covers [B_{i-1}, B_i) of
    the key's all-time bought quantity, sell j consumes [S_{j-1},
    S_j), and FIFO matches lot-to-sale exactly where the intervals
    OVERLAP. Two prefix-sum windows (one per side, key-partitioned)
    plus one equi-join on the key with the overlap predicate — no
    recursion, no state, exact integers. Per-pair matched quantity is
    min(B_i, S_j) - max(B_{i-1}, S_{j-1}).

    Returns one row per matched (buy, sell) fragment: key_cols +
    buy/sell order cols (prefixed b_/s_), matched_qty, and the exact
    per-unit totals needed for PnL: b_qty/b_total and s_qty/s_total.
    Unsold buy tails and oversold sell tails simply have no overlap.

    Quantities must be POSITIVE: zero-qty rows are dropped here (a
    zero-width interval sits strictly inside any covering lot, so it
    would emit a matched_qty=0 fragment whose per-unit division is
    total/0 -> NaN that poisons the whole key's sum — r5 review), and
    negative quantities break the monotone cumulative axis the
    identity needs — model corrections as separate sell/buy rows.
    """

    def cum(df: DataFrame, side: str) -> DataFrame:
        df = df.filter(F.col(qty_col) > 0)
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = df.withColumn("__end", F.sum(qty_col).over(w)).withColumn(
            "__start", F.col("__end") - F.col(qty_col)
        )
        return out.select(
            *key_cols,
            *[F.col(c).alias(f"{side}_{c}") for c in order_cols],
            F.col(qty_col).alias(f"{side}_qty"),
            F.col(total_cents_col).alias(f"{side}_total"),
            F.col("__start").alias(f"{side}_start"),
            F.col("__end").alias(f"{side}_end"),
        )

    b, s = cum(buys, "b"), cum(sells, "s")
    j = b.join(s, key_cols).filter(
        (F.col("b_start") < F.col("s_end")) & (F.col("s_start") < F.col("b_end"))
    )
    matched = F.least(F.col("b_end"), F.col("s_end")) - F.greatest(
        F.col("b_start"), F.col("s_start")
    )
    return j.withColumn("matched_qty", matched).drop(
        "b_start", "b_end", "s_start", "s_end"
    )


def straight_line_schedule(
    spans: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    total_cents_col: str,
) -> DataFrame:
    """Straight-line recognition schedule: spread ``total_cents_col``
    evenly over the calendar months [month(start), month(end)], exact
    to the cent (ASC 606 / IFRS 15 ratable recognition — the standard
    warehouse transform for subscription and service revenue).

    The month spine is generated per row with ``sequence`` (no
    calendar-table join), then the even split reuses
    ``prorate_largest_remainder`` with unit weights: every month gets
    floor(total/n) cents and the first ``total mod n`` months (month
    order) get the extra cent, so each key's schedule sums EXACTLY to
    its total. One shuffle (the group window); spans are bounded by
    the contract length, so the explode fan-out is small and fixed.

    Returns one row per (key, month) with ``alloc_cents``; ``end`` is
    clamped to ``start`` so inverted spans recognize everything in the
    start month rather than silently vanishing.
    """
    d = spans.select(
        key_col,
        total_cents_col,
        F.explode(
            F.sequence(
                F.date_trunc("month", F.col(start_col)).cast("date"),
                F.date_trunc(
                    "month",
                    F.greatest(F.col(end_col), F.col(start_col)),
                ).cast("date"),
                F.expr("interval 1 month"),
            )
        ).alias("month"),
    ).withColumn("__w", F.lit(1).cast("bigint"))
    out = prorate_largest_remainder(
        d, [key_col], "__w", total_cents_col, ["month"]
    )
    return out.drop("__w")
