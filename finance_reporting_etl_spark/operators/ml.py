"""Distributed tree learning on DataFrames (SURVEY §2 X-tier ML).

The scalable structure (shared with LightGBM-style histogram learners):
candidate thresholds are NEVER evaluated by rescanning the data. One
aggregate produces per-(feature, value) class counts; a prefix sum in
value order then yields every threshold's left/right contingency table
at once — O(data) for the scan plus O(distinct values) for scoring.
Depth-k trees repeat this per node on the node's rows, so cost grows
with depth, never with the number of candidate thresholds.

Exactness contract (the oracle story): class counts are integers
(exact under any partial-aggregation order), the Gini expressions are
closed-form doubles on those integers (bit-identical across engines),
and the argmax is totally ordered by (rounded gain DESC, feature, thr)
— so an independent SQL engine re-derives the same tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _scored_candidates(xy: DataFrame, group_cols: list[str]) -> DataFrame:
    """The shared per-value-count / prefix-sum / Gini-scoring pass
    behind every stump entry point (ADVICE r4 dedup — one copy keeps
    the expression trees bit-identical with the SQL oracles).

    ``group_cols`` is the partitioning for counts, prefix sums and
    scoring: ``["feature"]`` for a single model, ``["fold",
    "feature"]`` for one-pass bagged training. Input is melted
    (*group_cols, v, y) with y in {0,1}; output is one row per
    (*group_cols, threshold) with the full contingency table:
    (*group_cols, thr, nl, posl, nr, posr, n, pos, gini_gain),
    threshold semantics ``v <= thr`` goes left.
    """
    g = xy.groupBy(*group_cols, "v").agg(
        F.count(F.lit(1)).alias("n_v"), F.sum("y").cast("bigint").alias("pos_v")
    )
    wc = (
        Window.partitionBy(*group_cols)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = Window.partitionBy(*group_cols)
    c = g.select(
        *group_cols,
        "v",
        F.sum("n_v").over(wc).alias("nl"),
        F.sum("pos_v").over(wc).alias("posl"),
        F.sum("n_v").over(wf).alias("n"),
        F.sum("pos_v").over(wf).alias("pos"),
    )
    s = c.filter(F.col("nl") < F.col("n")).select(
        *group_cols,
        F.col("v").alias("thr"),
        "nl",
        "posl",
        (F.col("n") - F.col("nl")).alias("nr"),
        (F.col("pos") - F.col("posl")).alias("posr"),
        "n",
        "pos",
    )

    def _gini(pos: str, n: str):
        pd_ = F.col(pos).cast("double") / F.col(n)
        qd = (F.col(n) - F.col(pos)).cast("double") / F.col(n)
        return F.lit(1.0) - pd_ * pd_ - qd * qd

    parent = _gini("pos", "n")
    left = (F.col("nl").cast("double") / F.col("n")) * (
        F.lit(1.0)
        - (F.col("posl").cast("double") / F.col("nl"))
        * (F.col("posl").cast("double") / F.col("nl"))
        - ((F.col("nl") - F.col("posl")).cast("double") / F.col("nl"))
        * ((F.col("nl") - F.col("posl")).cast("double") / F.col("nl"))
    )
    right = (F.col("nr").cast("double") / F.col("n")) * (
        F.lit(1.0)
        - (F.col("posr").cast("double") / F.col("nr"))
        * (F.col("posr").cast("double") / F.col("nr"))
        - ((F.col("nr") - F.col("posr")).cast("double") / F.col("nr"))
        * ((F.col("nr") - F.col("posr")).cast("double") / F.col("nr"))
    )
    return s.select(
        *group_cols,
        "thr",
        "nl",
        "posl",
        "nr",
        "posr",
        "n",
        "pos",
        F.round(parent - (left + right), 6).alias("gini_gain"),
    )


def stump_candidates(xy: DataFrame) -> DataFrame:
    """All split candidates with Gini gain for a melted (feature, v, y)
    frame (y in {0,1}); one row per (feature, threshold v), threshold
    semantics ``v <= thr`` goes left. Columns:
    (feature, thr, n_left, n_right, gini_gain)."""
    return _scored_candidates(xy, ["feature"]).select(
        "feature",
        "thr",
        F.col("nl").alias("n_left"),
        F.col("nr").alias("n_right"),
        "gini_gain",
    )


def best_stump_row(xy: DataFrame):
    """The single best split of a melted (feature, v, y) frame, or
    ``None`` when no feature has two distinct values. The 1-row
    collect is model parameters, not data."""
    rows = (
        stump_candidates(xy)
        .orderBy(F.desc("gini_gain"), "feature", "thr")
        .limit(1)
        .collect()
    )
    return rows[0] if rows else None


def melt_features(df: DataFrame, feature_cols: dict[str, str], y_col: str) -> DataFrame:
    """Long form for the stump: one (feature, v, y) row per input row
    per feature. ``feature_cols`` maps feature name -> source column."""
    parts = [
        df.select(
            F.lit(name).alias("feature"),
            F.col(col).cast("double").alias("v"),
            F.col(y_col).alias("y"),
        )
        for name, col in feature_cols.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def train_depth2_tree(
    df: DataFrame, feature_cols: dict[str, str], y_col: str
) -> DataFrame:
    """Depth-2 tree: root split, then the best split inside each leaf.
    Returns (node, feature, thr, n_left, n_right, gini_gain) with node
    in {'root', 'L', 'R'}; a leaf with no valid split emits no row.

    Two bounded driver collects (root + nothing else — the leaf
    frames are lazy filters of the input); each level is one
    melt-aggregate-prefix-sum pass over that node's rows."""
    xy = melt_features(df, feature_cols, y_col)
    root = best_stump_row(xy)
    spark = df.sparkSession
    schema = (
        "node string, feature string, thr double, n_left bigint, "
        "n_right bigint, gini_gain double"
    )
    if root is None:
        return spark.createDataFrame([], schema)
    rows = [
        (
            "root",
            root["feature"],
            float(root["thr"]),
            root["n_left"],
            root["n_right"],
            float(root["gini_gain"]),
        )
    ]
    split_col = feature_cols[root["feature"]]
    for node, cond in (
        ("L", F.col(split_col).cast("double") <= float(root["thr"])),
        ("R", F.col(split_col).cast("double") > float(root["thr"])),
    ):
        best = best_stump_row(melt_features(df.filter(cond), feature_cols, y_col))
        if best is not None:
            rows.append(
                (
                    node,
                    best["feature"],
                    float(best["thr"]),
                    best["n_left"],
                    best["n_right"],
                    float(best["gini_gain"]),
                )
            )
    return spark.createDataFrame(rows, schema)


def best_stump_full(xy: DataFrame):
    """Like :func:`best_stump_row` but keeps the leaf class counts
    (posl/posr) so each leaf's MAJORITY CLASS is known — what an
    actual classifier needs to predict. Returns the best row of
    (feature, thr, nl, posl, nr, posr, gini_gain), or None."""
    scored = _scored_candidates(xy, ["feature"]).select(
        "feature", "thr", "nl", "posl", "nr", "posr", "gini_gain"
    )
    rows = scored.orderBy(F.desc("gini_gain"), "feature", "thr").limit(1).collect()
    return rows[0] if rows else None


def best_stumps_by_fold(xyf: DataFrame) -> list:
    """Per-fold best stumps in ONE pass: input is a melted
    (fold, feature, v, y) frame; the per-value counts, prefix sums and
    Gini scoring all partition by (fold, feature), and a per-fold rank
    window picks each fold's argmax — so training an N-member bagged
    ensemble costs the same shuffle count as training one member,
    instead of N sequential jobs. Returns the collected best rows
    (fold, feature, thr, nl, posl, nr, posr, gini_gain), one per fold
    that has a valid split — bounded driver traffic (model params)."""
    scored = _scored_candidates(xyf, ["fold", "feature"]).select(
        "fold", "feature", "thr", "nl", "posl", "nr", "posr", "gini_gain"
    )
    wr = Window.partitionBy("fold").orderBy(
        F.desc("gini_gain"), "feature", "thr"
    )
    return (
        scored.withColumn("__rn", F.row_number().over(wr))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .collect()
    )
