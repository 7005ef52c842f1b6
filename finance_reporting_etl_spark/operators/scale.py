"""Scale patterns: skew-salted joins and bucketed (shuffle-free) joins.

The two shuffle pathologies a 100 TB join hits, and their standard
remedies as reusable operators:

- **Skew** — one hot key funnels into one reducer task. AQE's skew-join
  splitting (on in ``session.get_spark``) handles sort-merge joins
  automatically; ``salted_join`` is the explicit fallback for the cases
  AQE can't re-plan (e.g. aggregation-feeding joins, or when a
  deterministic layout is needed). Salting fans each hot key out over N
  sub-keys: the big side gets a deterministic pseudo-random salt, the
  small(er) side is replicated N ways, and the join key becomes
  (key, salt) — N reducers share what one did before, at the cost of
  replicating the right side N times (use per-key salting of only the
  hot keys when replication is too dear).

- **Repeated co-located joins** — two fact tables joined on the same
  key every day pay the same two shuffles every day. Bucketing
  (``write_bucketed``) pre-shuffles ONCE at write time:
  ``bucketBy(n, key)`` stores hash-partitioned buckets so Spark's
  planner proves both sides share the partitioning and plans a
  sort-merge join with NO Exchange on either side (verify with
  ``assert_no_shuffle_join``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (big, skewed) left side,
    replicate the right side ``n_salts`` ways, join on keys + salt.

    Semantically identical to ``left.join(right, keys, how)`` for
    ``inner`` and ``left`` joins (each left row carries exactly one
    salt, and its key's right-side rows exist at every salt). The salt
    is a deterministic hash of the whole left row (all columns), so
    replays produce identical layouts.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in left.columns])), F.lit(n_salts))
    l_salted = left.withColumn("__salt", salt.cast("int"))
    r_replicated = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l_salted.join(r_replicated, [*keys, "__salt"], how).drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) on the join
    key — the pay-once shuffle that makes every later equi-join on
    ``bucket_cols`` exchange-free."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    keys: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables previously written with ``write_bucketed`` on the
    same keys/bucket count. Disables broadcast so the planner proves
    the bucket-partitioning match and emits a zero-Exchange sort-merge
    join (broadcast would hide the property being exercised)."""
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table).hint("merge")
    return left.join(right, keys, how)


def assert_no_shuffle_join(df: DataFrame) -> None:
    """Raise if the physical plan contains an Exchange feeding the join
    — the verification hook for bucketed co-location."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        raise AssertionError(f"plan shuffles:\n{plan}")
