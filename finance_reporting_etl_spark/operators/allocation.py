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

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from finance_reporting_etl_spark.functions.scalars import det_round


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
    buy_order_cols: list[str] | None = None,
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

    ``buy_order_cols`` overrides the BUY side's consumption order
    (sells keep ``order_cols``): the lot-priority generalization.
    FIFO is the default (both sides in time order); HIFO — consume the
    highest-cost lot first, the year-end tax-lot optimizer — passes a
    cost-descending buy order over the FULL lot book. Note the static
    reordering prices the whole-history lot priority, not
    point-in-time availability (a sale may match a lot purchased
    later) — exactly the optimizer's retrospective allocation, and
    the documented semantic of hifo queries built on this.

    OUTPUT-SCHEMA CONTRACT (r8 ADVICE): the buy-side passthrough
    columns are prefixed from the buy side's *effective* order —
    ``b_<order_cols>`` by default, but ``b_<buy_order_cols>`` when
    ``buy_order_cols`` is given. A caller switching FIFO→HIFO
    therefore loses any ``b_<order_cols>`` column not repeated in
    ``buy_order_cols``; include the columns you need downstream in
    ``buy_order_cols`` (extra trailing columns only refine ties).
    Sell-side columns are always ``s_<order_cols>``.
    """
    buy_order = buy_order_cols if buy_order_cols is not None else order_cols

    def cum(df: DataFrame, side: str) -> DataFrame:
        df = df.filter(F.col(qty_col) > 0)
        side_order = buy_order if side == "b" else order_cols
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(*side_order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = df.withColumn("__end", F.sum(qty_col).over(w)).withColumn(
            "__start", F.col("__end") - F.col(qty_col)
        )
        return out.select(
            *key_cols,
            *[F.col(c).alias(f"{side}_{c}") for c in side_order],
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
    calendar-table join). With UNIT weights the largest-remainder
    split has a CLOSED FORM — every month gets floor(total/n) and the
    first ``pmod(total, n)`` months (month order) get the extra cent —
    so no group window is needed at all: ``posexplode`` over an integer
    index spine carries the month index, n is ``months_between`` of the
    truncated endpoints, and the allocation is one per-row expression. Identical cents to the
    ``prorate_largest_remainder`` formulation it replaces (rem =
    pmod(total*1, n) is constant within a group, so the rank order is
    purely the month tie-break), measured ~3x cheaper at sf0.1 (the
    three window passes were ~2/3 of the query; round-6 rework).

    Returns one row per (key, month) with ``alloc_cents``; ``end`` is
    clamped to ``start`` so inverted spans recognize everything in the
    start month rather than silently vanishing. Totals must be
    non-negative (floor/pmod agree across engines there).
    """
    # spine length and month values come from SCALAR date math, not
    # from exploding an array of dates: the earlier date-sequence form
    # left Catalyst recomputing size(sequence(...)) — a fresh month
    # array — on every EXPLODED row (2.7M array builds at sf0.1, ~24s
    # noop-write; round-7 profile). months_between on month-truncated
    # dates is exactly integral, the exploded array is cheap bigints,
    # and add_months reconstructs each month from the index.
    start_m = F.date_trunc("month", F.col(start_col)).cast("date")
    end_m = F.date_trunc(
        "month", F.greatest(F.col(end_col), F.col(start_col))
    ).cast("date")
    n = (F.months_between(end_m, start_m) + 1).cast("bigint")
    d = spans.select(
        key_col,
        total_cents_col,
        start_m.alias("__m0"),
        n.alias("__n"),
    ).select(
        key_col,
        total_cents_col,
        "__m0",
        "__n",
        F.posexplode(F.expr("sequence(0L, __n - 1)")).alias("__i", "__k"),
    )
    rem = F.pmod(F.col(total_cents_col), F.col("__n"))
    base = F.expr(f"({total_cents_col} - pmod({total_cents_col}, __n)) div __n")
    return d.select(
        key_col,
        total_cents_col,
        F.add_months("__m0", F.col("__i")).alias("month"),
        (base + (F.col("__i") < rem).cast("bigint")).alias("alloc_cents"),
    )


def xirr_bisection(
    flows: DataFrame,
    key_col: str,
    t_days_col: str,
    cents_col: str,
    iters: int = 28,
    lo: float = -0.9999,
    hi: float = 10.0,
) -> DataFrame:
    """Per-key XIRR (annualized internal rate of return for irregular
    cashflows) by fixed-iteration bisection — the iterative finance
    primitive done distributed AND engine-reproducible.

    NPV(r) = sum cf_i * (1+r)^(-t_i/365) over the key's flows in
    (t, cents) sort order. Cross-engine exactness is by construction,
    not tolerance: libm ``pow`` (CPython ``math.pow`` == DuckDB
    ``power``, verified bitwise), a sequential left-fold sum in the
    same sorted order as DuckDB's ``list_sum``, and a fixed iteration
    count mean both engines take IDENTICAL bracketing decisions, so
    the midpoint after ``iters`` halvings is the same double. numpy's
    vectorized ``power``/pairwise ``sum`` would each drift ~1 ulp and
    eventually flip a knife-edge sign decision — hence the explicit
    per-flow fold (the flows-per-key bound keeps it cheap; work is
    Arrow-batched and embarrassingly parallel across keys).

    Keys with no sign bracket (NPV(lo) <= 0 or NPV(hi) >= 0 — rate
    outside [lo, hi] or no sign change) return NULL irr. Assumes the
    conventional out-then-in profile (NPV decreasing in r).
    Returns (key, n_flows, irr).
    """
    import math

    import pandas as pd

    lists = flows.groupBy(key_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(t_days_col), F.col(cents_col)))
        ).alias("__flows")
    )
    key_field = lists.schema[key_col]

    def solve(batches):
        for pdf in batches:
            keys, ns, irrs = [], [], []
            for k, fl in zip(pdf[key_col], pdf["__flows"]):
                fs = [(f[t_days_col], f[cents_col]) for f in fl]

                def npv(r):
                    acc = 0.0
                    for t, c in fs:
                        acc += c * math.pow(1.0 + r, -(t / 365.0))
                    return acc

                a, b = lo, hi
                if npv(a) > 0 and npv(b) < 0:
                    for _ in range(iters):
                        mid = (a + b) / 2.0
                        if npv(mid) > 0:
                            a = mid
                        else:
                            b = mid
                    irr = (a + b) / 2.0
                else:
                    irr = None
                keys.append(k)
                ns.append(len(fs))
                irrs.append(irr)
            yield pd.DataFrame(
                {key_col: keys, "n_flows": ns, "irr": irrs}
            )

    schema = f"{key_col} {key_field.dataType.simpleString()}, n_flows int, irr double"
    out = lists.mapInPandas(solve, schema)
    return out.select(
        key_col, "n_flows", det_round(F.col("irr"), 6).alias("irr")
    )


def xirr_oracle_sql(
    flows_sql: str,
    key: str = "k",
    iters: int = 28,
    lo: float = -0.9999,
    hi: float = 10.0,
) -> str:
    """DuckDB twin of :func:`xirr_bisection`: the bisection loop
    unrolled into ``iters`` chained CTE pairs (the graph.py
    unrolled-iteration oracle pattern). ``flows_sql`` must yield
    (key, t, c) rows; the NPV at each midpoint is ``list_sum`` over
    the SAME (t, c)-sorted flow list the Spark side folds, so every
    bracketing decision matches bitwise.
    """
    npv_at = (
        "list_sum(list_transform(flows,"
        " f -> f.c * power(1.0 + {r}, -(f.t / 365.0))))"
    )
    steps = [
        f"""cf AS (
        SELECT {key}, list(struct_pack(t := t, c := c) ORDER BY t, c) AS flows
        FROM ({flows_sql}) GROUP BY {key}
    ), b0 AS (
        SELECT {key}, flows, CAST({lo} AS DOUBLE) AS lo,
               CAST({hi} AS DOUBLE) AS hi,
               ({npv_at.format(r=lo)}) > 0
               AND ({npv_at.format(r=hi)}) < 0 AS ok
        FROM cf
    )"""
    ]
    for i in range(1, iters + 1):
        prev, mid_npv = f"b{i-1}", npv_at.format(r="(lo + hi) / 2.0")
        steps.append(
            f"""s{i} AS (
        SELECT {key}, flows, lo, hi, ok, (lo + hi) / 2.0 AS mid,
               CASE WHEN ok THEN {mid_npv} END AS s
        FROM {prev}
    ), b{i} AS (
        SELECT {key}, flows,
               CASE WHEN ok AND s > 0 THEN mid ELSE lo END AS lo,
               CASE WHEN ok AND s > 0 THEN hi ELSE
                    CASE WHEN ok THEN mid ELSE hi END END AS hi,
               ok
        FROM s{i}
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(steps)
        + f"""
    SELECT {key}, CAST(len(flows) AS INT) AS n_flows,
           (CASE WHEN isnan(CAST((CASE WHEN ok THEN (lo + hi) / 2.0 END) AS DOUBLE)) OR abs(CAST((CASE WHEN ok THEN (lo + hi) / 2.0 END) AS DOUBLE)) >= 4611686018427.388 THEN (CASE WHEN ok THEN (lo + hi) / 2.0 END) ELSE floor((CASE WHEN ok THEN (lo + hi) / 2.0 END) * 1000000.0 + 0.5) / 1000000.0 END) AS irr
    FROM b{iters}"""
    )


def level_payment_schedule(
    loans: DataFrame,
    key_col: str,
    principal_cents_col: str,
    monthly_rate: float,
    n_periods: int,
) -> DataFrame:
    """Level-payment (French) amortization schedule: one row per
    (key, period 1..n) with payment, interest, principal portion and
    closing balance for a fixed-rate annuity — the classic finance-ETL
    explosion of a loan book into its cash schedule.

    Everything is the closed annuity form (no per-period recursion):
    pmt = P*r*g_n/(g_n - 1) and balance_k = P*g_k - pmt*(g_k - 1)/r
    with g_k = (1+r)^k. No engine ever evaluates ``pow``: the 13
    per-period factors are computed ONCE in Python and injected as
    repr-printed double literals into both the Spark plan and the
    oracle SQL (the sprt_decision Python-printed-constants pattern) —
    the r7 driver gate showed constant-base pow agrees between the
    JVM and one libm but not every libm, so the libm dependence is
    removed entirely. The per-loan arithmetic is then the SAME
    textual sequence of IEEE double mul/sub on both engines:
    pmt = p*PF, interest = p*D_k - pmt*E_k, balance = p*A_k - pmt*B_k.
    The period spine is a 13-element literal array explode (fan-out =
    n, bounded); no shuffle at all beyond the source scan.

    Output values are UNROUNDED dollars (raw IEEE doubles). The r7/r8
    driver gates proved that ``round(DOUBLE, 6)`` is itself
    per-engine-divergent (Spark rounds the shortest decimal repr via
    BigDecimal HALF_UP; a libm-side round operates on the binary
    value — half-boundary doubles split), so NO engine-evaluated
    float rounding may appear in the emitted columns at all. Each
    IEEE *, -, / with bit-identical inputs is correctly rounded and
    therefore bit-identical across engines; any display rounding must
    happen in ONE downstream place for all consumers. Conservation
    (principal portions sum to P, balance_n = 0) holds to float
    precision — use prorate_largest_remainder on half-up cents if
    ledger-exact cents are required downstream.
    """
    pf, rows = _level_payment_constants(monthly_rate, n_periods)
    d = loans.select(
        key_col,
        F.col(principal_cents_col).alias("__p"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(kk).cast("int").alias("period"),
                        F.lit(a).alias("__a"),
                        F.lit(b).alias("__b"),
                        F.lit(dd).alias("__d"),
                        F.lit(ee).alias("__e"),
                    )
                    for (kk, a, b, dd, ee) in rows
                ]
            )
        ).alias("__g"),
    ).select(key_col, "__p", "__g.*")
    p = F.col("__p")
    pmt = p * F.lit(pf)
    interest = p * F.col("__d") - pmt * F.col("__e")
    bal_k = p * F.col("__a") - pmt * F.col("__b")
    return d.select(
        key_col,
        "period",
        (pmt / 100.0).alias("payment"),
        (interest / 100.0).alias("interest"),
        ((pmt - interest) / 100.0).alias("principal"),
        (bal_k / 100.0).alias("balance"),
    )


def _level_payment_constants(
    monthly_rate: float, n_periods: int
) -> tuple[float, list[tuple[int, float, float, float, float]]]:
    """The shared Python source of every float constant in
    :func:`level_payment_schedule` and its oracle: pf (payment factor,
    pmt = P*pf) and per-period (k, A_k, B_k, D_k, E_k) with
    A_k = g_k (balance growth), B_k = (g_k-1)/r (annuity sum),
    D_k = g_{k-1}*r and E_k = g_{k-1}-1 (interest = P*D_k - pmt*E_k,
    i.e. balance_{k-1}*r with the division by r folded away). Printed
    via repr into both engines, so each literal is the bit-identical
    double — no libm pow in any plan."""
    if not (0 < monthly_rate < 1):
        raise ValueError(f"monthly_rate must be in (0,1), got {monthly_rate}")
    if n_periods < 1:
        raise ValueError(f"n_periods must be >= 1, got {n_periods}")
    r = float(monthly_rate)
    g = [(1.0 + r) ** kk for kk in range(int(n_periods) + 1)]
    pf = r * g[n_periods] / (g[n_periods] - 1.0)
    rows = [
        (kk, g[kk], (g[kk] - 1.0) / r, g[kk - 1] * r, g[kk - 1] - 1.0)
        for kk in range(1, int(n_periods) + 1)
    ]
    return pf, rows


def level_payment_oracle_sql(
    loans_sql: str,
    key: str,
    monthly_rate: float,
    n_periods: int,
) -> str:
    """DuckDB twin of :func:`level_payment_schedule`: the SAME
    repr-printed constants from :func:`_level_payment_constants`
    joined as a VALUES period spine, and the same textual IEEE
    double expressions — zero ``pow`` calls AND zero ``round`` calls
    in either engine (r8 driver gate: per-engine round(DOUBLE, 6) is
    itself divergent at half-boundary doubles; raw IEEE results of
    identical textual ops are bit-equal).
    ``loans_sql`` must yield (``key``, p) with p integer cents."""
    pf, rows = _level_payment_constants(monthly_rate, n_periods)

    # DuckDB types bare decimal-point literals as DECIMAL (exact
    # decimal arithmetic would then diverge from Spark's IEEE doubles
    # AND overflow at chained scales) — a string->DOUBLE cast is the
    # correctly-rounded parse of the shortest repr, i.e. the exact
    # same double Python printed.
    def dbl(v: float) -> str:
        return f"CAST('{v!r}' AS DOUBLE)"

    values = ",\n               ".join(
        f"({kk}, {dbl(a)}, {dbl(b)}, {dbl(dd)}, {dbl(ee)})"
        for (kk, a, b, dd, ee) in rows
    )
    return f"""
    WITH l AS ({loans_sql}),
    g(period, a, b, d, e) AS (
        VALUES {values}
    )
    SELECT l.{key}, CAST(g.period AS INT) AS period,
           (l.p * {dbl(pf)}) / 100.0 AS payment,
           (l.p * g.d - (l.p * {dbl(pf)}) * g.e) / 100.0 AS interest,
           ((l.p * {dbl(pf)}) - (l.p * g.d - (l.p * {dbl(pf)}) * g.e))
                 / 100.0 AS principal,
           (l.p * g.a - (l.p * {dbl(pf)}) * g.b) / 100.0 AS balance
    FROM l CROSS JOIN g
    """


def fifo_open_lots(
    buys: DataFrame,
    sells: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    qty_col: str,
    total_cents_col: str,
) -> DataFrame:
    """The unmatched complement of :func:`fifo_match`: each buy lot's
    REMAINING (open) quantity after all of the key's sells consume the
    oldest lots first — the open-inventory / tax-lot / aging side of
    FIFO accounting.

    No join at all: on the cumulative-quantity axis a lot [b_start,
    b_end) is consumed up to the key's total sold quantity S, so
    remaining = qty - clamp(S - b_start, 0, qty). One key-partitioned
    prefix-sum window plus one grouped total (carried by a second
    window over the same partitioning — Catalyst plans both in a
    single Exchange). Open value is floor((remaining * total) / qty)
    integer cents — deterministic, so downstream sums stay exact
    BIGINT on both engines. Zero/negative quantities are dropped as in
    fifo_match. Returns the buy rows + open_qty / open_cents
    (fully-consumed lots keep a row with open_qty = 0; filter if only
    open inventory is wanted).
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wk = Window.partitionBy(*key_cols)
    b = buys.filter(F.col(qty_col) > 0)
    s_tot = (
        sells.filter(F.col(qty_col) > 0)
        .groupBy(*key_cols)
        .agg(F.sum(qty_col).cast("bigint").alias("__sold"))
    )
    d = (
        b.join(s_tot, key_cols, "left")
        .withColumn("__sold", F.coalesce("__sold", F.lit(0)))
        .withColumn("__end", F.sum(qty_col).over(w).cast("bigint"))
        .withColumn("__start", F.col("__end") - F.col(qty_col))
        .withColumn(
            "open_qty",
            (
                F.col(qty_col)
                - F.least(
                    F.col(qty_col).cast("bigint"),
                    F.greatest(
                        F.lit(0).cast("bigint"),
                        F.col("__sold") - F.col("__start"),
                    ),
                )
            ).cast("bigint"),
        )
        .withColumn(
            "open_cents",
            F.expr(f"(open_qty * {total_cents_col}) div {qty_col}"),
        )
    )
    _ = wk  # single partitioning documented above
    return d.drop("__sold", "__end", "__start")


def wac_inventory_fold(
    flows: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    signed_qty_col: str,
    total_cents_col: str,
) -> DataFrame:
    """Weighted-average-cost inventory accounting per key: buys pool
    into (on-hand qty, inventory value), sells consume value at the
    POOLED average cost — the other standard costing method next to
    FIFO (fifo_match / fifo_open_lots), and a genuinely sequential
    recurrence: the average cost a sale realizes depends on every
    prior buy AND sale, so no prefix-sum identity applies (state is
    2-dimensional and division breaks the algebra that rescued
    clamped_balance_per_key).

    EXACT INTEGER state fold, in ``order_cols`` order:

      buy  (sq > 0):  q += sq; val += v
      sell (sq < 0):  s = min(-sq, q)                 (cap at on-hand)
                      rem = floor(val*s / q)  if q>0 else 0
                      rev = floor(v*s / -sq)          (pro-rated revenue)
                      q -= s; val -= rem; realized += rev - rem

    Every quantity is a non-negative BIGINT, every division a floor of
    non-negatives (truncation == floor, so Python //, Spark div and
    DuckDB // all agree), so the fold is bit-identical in any engine —
    the oracle replays it as a DuckDB recursive CTE.

    Execution shape (round-6 rework): repartition on the key +
    sortWithinPartitions, then ONE ``mapInPandas`` pass that streams
    each partition's Arrow batches through a running-state Python
    loop with key-change detection carried ACROSS batch boundaries.
    The per-key ``applyInPandas`` form this replaces paid one Python
    call + pandas construction per key (~20k groups at sf0.1,
    measured 9.3 s); the streaming fold pays one call per Arrow
    batch. Python-int arithmetic throughout (arbitrary precision, no
    int64 numpy overflow); parallel across partitions.

    Returns (key, n_events, on_hand_qty, inv_value_cents,
    realized_cents).
    """
    key = key_cols[0] if len(key_cols) == 1 else None
    if key is None:
        raise ValueError("wac_inventory_fold supports a single key column")

    ordered = flows.select(
        key, *order_cols, signed_qty_col, total_cents_col
    ).repartition(F.col(key)).sortWithinPartitions(key, *order_cols)

    def fold_stream(batches):
        cur = None
        q = val = realized = n = 0
        out_k, out_n, out_q, out_v, out_r = [], [], [], [], []

        def emit():
            out_k.append(cur)
            out_n.append(n)
            out_q.append(q)
            out_v.append(val)
            out_r.append(realized)

        for pdf in batches:
            ks = pdf[key].tolist()
            sqs = pdf[signed_qty_col].tolist()
            vs = pdf[total_cents_col].tolist()
            for k, sq, v in zip(ks, sqs, vs):
                if k != cur:
                    if cur is not None:
                        emit()
                    cur, q, val, realized, n = k, 0, 0, 0, 0
                n += 1
                sq = int(sq)
                v = int(v)
                if sq >= 0:
                    q += sq
                    val += v
                else:
                    s = min(-sq, q)
                    rem = (val * s) // q if q > 0 else 0
                    rev = (v * s) // (-sq)
                    q -= s
                    val -= rem
                    realized += rev - rem
        if cur is not None:
            emit()
        if out_k:
            yield pd.DataFrame(
                {
                    key: out_k,
                    "n_events": out_n,
                    "on_hand_qty": out_q,
                    "inv_value_cents": out_v,
                    "realized_cents": out_r,
                }
            )

    out_schema = (
        f"{key} long, n_events long, on_hand_qty long, "
        "inv_value_cents long, realized_cents long"
    )
    return ordered.mapInPandas(fold_stream, schema=out_schema)


def wac_oracle_sql(src_sql: str, key_sql: str, order_sql: str) -> str:
    """DuckDB twin of :func:`wac_inventory_fold`: the identical
    integer recurrence replayed as a RECURSIVE CTE that advances every
    key's state one event per iteration (depth = max events per key).

    Why not ``list_reduce`` with a struct accumulator: DuckDB 1.0
    evaluates the lambda's result struct field-by-field IN DECLARED
    ORDER over the accumulator — and when the reduce runs VECTORIZED
    across many groups, later fields can read already-overwritten
    earlier fields, silently corrupting any fold whose fields depend
    on each other (correct on one group, wrong on 158/200 real keys —
    caught by pinning the oracle to a Python replay per key). The
    recursive join form computes every new field from the OLD row, so
    no aliasing is possible in any engine version.
    """
    s_ = "least(-e.sq, s.q)"
    rem = f"CASE WHEN s.q > 0 THEN (s.v * {s_}) // s.q ELSE 0 END"
    return f"""
    WITH RECURSIVE src AS ({src_sql}),
    ev AS (
        SELECT {key_sql} AS k, sq, v,
               row_number() OVER (PARTITION BY {key_sql}
                                  ORDER BY {order_sql}) AS rn
        FROM src
    ),
    nn AS (SELECT k, CAST(count(*) AS BIGINT) AS n_events FROM ev GROUP BY 1),
    s AS (
        SELECT k, CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS q,
               CAST(0 AS BIGINT) AS v, CAST(0 AS BIGINT) AS r
        FROM nn
        UNION ALL
        SELECT s.k, s.i + 1,
               CASE WHEN e.sq >= 0 THEN s.q + e.sq
                    ELSE s.q - {s_} END,
               CASE WHEN e.sq >= 0 THEN s.v + e.v
                    ELSE s.v - {rem} END,
               CASE WHEN e.sq >= 0 THEN s.r
                    ELSE s.r + (e.v * {s_}) // (-e.sq) - {rem} END
        FROM s JOIN ev e ON e.k = s.k AND e.rn = s.i + 1
    )
    SELECT s.k AS {key_sql}, nn.n_events,
           s.q AS on_hand_qty, s.v AS inv_value_cents,
           s.r AS realized_cents
    FROM s JOIN nn ON nn.k = s.k AND s.i = nn.n_events
    """


def accrual_schedule_day_count(
    loans: DataFrame,
    key_col: str,
    principal_cents_col: str,
    apr_ppm: int,
    periods: list[tuple[str, int]],
) -> DataFrame:
    """Interest accrual per period under the two classic day-count
    conventions, side by side: ACT/360 (money-market) vs 30/360
    (bond basis) — the reconciliation every treasury ETL runs when
    two systems book the same loan on different bases.

    ``periods`` is a list of (label, actual_days); the 30/360 basis
    uses 30 days per period by definition. Both accruals are EXACT
    integer floor divisions over BIGINT:

        accrual = P * apr_ppm * days  div  (360 * 1_000_000)

    (P <= ~5e7 cents, apr_ppm <= 1e6, days <= 31 keeps the product
    under ~1.6e15 — no wrap). The period spine is a literal struct
    array explode (fan-out = len(periods), bounded); no shuffle
    beyond the source scan, no float anywhere — hash-stable across
    engines at any scale.
    """
    if not periods:
        raise ValueError("periods must be non-empty")
    if not (0 < apr_ppm < 10_000_000):
        raise ValueError(f"apr_ppm out of range: {apr_ppm}")
    spine = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(lbl).alias("period"),
                    F.lit(int(days)).cast("int").alias("days_act"),
                )
                for (lbl, days) in periods
            ]
        )
    ).alias("__g")
    d = loans.select(
        key_col, F.col(principal_cents_col).alias("__p"), spine
    ).select(key_col, "__p", "__g.*")
    denom = F.lit(360 * 1_000_000).cast("bigint")
    act = F.expr(f"__p * {int(apr_ppm)} * days_act").cast("bigint")
    d30 = F.expr(f"__p * {int(apr_ppm)} * 30").cast("bigint")
    return d.select(
        key_col,
        "period",
        "days_act",
        (act - F.pmod(act, denom)).cast("bigint").alias("__an"),
        (d30 - F.pmod(d30, denom)).cast("bigint").alias("__dn"),
    ).select(
        key_col,
        "period",
        "days_act",
        F.expr("__an div 360000000").cast("bigint").alias("accrual_act360_cents"),
        F.expr("__dn div 360000000").cast("bigint").alias("accrual_30360_cents"),
        F.expr("__an div 360000000 - __dn div 360000000")
        .cast("bigint")
        .alias("basis_diff_cents"),
    )
