"""Approximate-membership operators: a Bloom filter built and probed
with engine-portable md5 bit positions.

The scale story: a membership check against a huge key set normally
costs a shuffle join per probe batch. A Bloom filter reduces it to a
broadcast of <= m distinct bit positions (the DOMAIN is the filter
size, never the data size) plus a map-side hash — the classic
pre-filter in front of an expensive join (LSM compaction, semi-join
pushdown, dedup probes). Hash positions come from fixed hex slices of
md5(key || salt) — the same engine-portable digest discipline as
md5_bucket — so DuckDB re-derives identical bits and the oracle
hard-verifies both the build and every probe decision, including which
non-members came back as false positives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def _hex_val(h: Column, start: int, n: int) -> Column:
    """Integer value of n hex chars of ``h`` starting at 1-based
    ``start`` — the instr-per-char form both engines evaluate
    identically (conv() has no DuckDB twin)."""
    # accumulate in BIGINT from the start: 12-hex values reach 16^12
    # ~ 2.8e14, far past INT (the ANSI overflow a 4-hex-only test
    # would never catch)
    v = F.lit(0).cast("bigint")
    for i in range(n):
        v = v * 16 + (
            F.instr(F.lit(_HEX), F.substring(h, start + i, 1)) - 1
        ).cast("bigint")
    return v


def _hex_val_sql(h_sql: str, start: int, n: int) -> str:
    """DuckDB twin of :func:`_hex_val` over the SQL digest ``h_sql``."""
    v = "0"
    for i in range(n):
        v = (
            f"({v} * 16 + instr('{_HEX}', "
            f"substr({h_sql}, {start + i}, 1)) - 1)"
        )
    return f"CAST({v} AS BIGINT)"


def bloom_positions(key_col: Column | str, salt: str, m: int, k: int) -> list[Column]:
    """The k bit positions of a key: non-overlapping 4-hex slices of
    md5(key || salt), each mod m. Requires m <= 65536 and k <= 8
    (32 hex digest chars / 4)."""
    if not (1 <= m <= 65536):
        raise ValueError(f"m must be in [1, 65536], got {m}")
    if not (1 <= k <= 8):
        raise ValueError(f"k must be in [1, 8], got {k}")
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    h = F.md5(F.concat(c.cast("string"), F.lit(salt)))
    return [_hex_val(h, 1 + 4 * i, 4) % F.lit(m) for i in range(k)]


def bloom_positions_sql(key_sql: str, salt: str, m: int, k: int) -> list[str]:
    """DuckDB twin of :func:`bloom_positions`."""
    h = f"md5(CAST({key_sql} AS VARCHAR) || '{salt}')"
    return [f"({_hex_val_sql(h, 1 + 4 * i, 4)} % {m})" for i in range(k)]


def bloom_build(
    members: DataFrame, key_col: str, salt: str, m: int, k: int
) -> DataFrame:
    """Distinct set bits of the filter over the member keys: one
    ``pos`` column, <= m rows regardless of member count (the
    broadcast-able build)."""
    pos = F.explode(F.array(*bloom_positions(key_col, salt, m, k))).alias("pos")
    return members.select(pos).distinct()


def bloom_probe(
    probes: DataFrame,
    key_col: str,
    bits: DataFrame,
    salt: str,
    m: int,
    k: int,
) -> DataFrame:
    """Probe each key against the built bits: adds ``bloom_positive``
    (1 iff all k positions are set). Shape: DISTINCT probe keys
    explode x k, one BROADCAST join against the <= m-row bit set, one
    groupBy back to the key grain, and the flag joins back to every
    probe row — never a shuffle sized by the member set. Probing the
    distinct keys (not rows) keeps the all-k-set test exact when a key
    appears more than once: grouping raw rows would accumulate m*k
    hits for a key seen m times and fail ``== k`` — a false negative,
    which a Bloom filter must never produce."""
    keyed = probes.select(key_col).distinct().select(
        F.col(key_col),
        F.posexplode(F.array(*bloom_positions(key_col, salt, m, k))).alias(
            "__i", "__p"
        ),
    )
    hit = (
        keyed.join(
            F.broadcast(bits.withColumnRenamed("pos", "__p")), "__p", "left_semi"
        )
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("__hits"))
    )
    return (
        probes.join(hit, key_col, "left")
        .withColumn(
            "bloom_positive",
            (F.coalesce(F.col("__hits"), F.lit(0)) == F.lit(k)).cast("int"),
        )
        .drop("__hits")
    )


def bloom_oracle_sql(
    members_sql: str, probes_sql: str, salt: str, m: int, k: int
) -> str:
    """DuckDB twin of bloom_build + bloom_probe + the summary readout:
    identical md5 hex-slice positions, the same all-k-set rule, and
    the same TP/FP accounting. ``members_sql``/``probes_sql`` must
    each yield a single key column ``k``."""
    pos = bloom_positions_sql("k", salt, m, k)
    lst = ", ".join(pos)
    return f"""
    WITH mem AS ({members_sql}),
    probes AS ({probes_sql}),
    bits AS (SELECT DISTINCT unnest([{lst}]) AS pos FROM mem),
    pp AS (SELECT k, unnest([{lst}]) AS pos
           FROM (SELECT DISTINCT k FROM probes)),
    hits AS (SELECT pp.k, count(*) AS h
             FROM pp JOIN bits USING (pos) GROUP BY 1),
    flag AS (
        SELECT p.k,
               CASE WHEN coalesce(h, 0) = {k} THEN 1 ELSE 0 END AS bp,
               CASE WHEN mm.k IS NOT NULL THEN 1 ELSE 0 END AS is_m
        FROM probes p
        LEFT JOIN hits ON p.k = hits.k
        LEFT JOIN (SELECT DISTINCT k FROM mem) mm ON p.k = mm.k
    )
    SELECT CAST({m} AS INT) AS m_bits, CAST({k} AS INT) AS k_hashes,
           (SELECT CAST(count(*) AS BIGINT) FROM mem) AS n_members,
           (SELECT CAST(count(*) AS BIGINT) FROM bits) AS bits_set,
           CAST(count(*) AS BIGINT) AS n_probed,
           CAST(sum(bp) AS BIGINT) AS n_positive,
           CAST(sum(CASE WHEN bp = 1 AND is_m = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_positive,
           (CASE WHEN isnan(CAST((CAST(sum(CASE WHEN bp = 1 AND is_m = 0 THEN 1 ELSE 0 END) AS DOUBLE) / nullif(CAST(count(*) - sum(is_m) AS DOUBLE), 0.0)) AS DOUBLE)) OR abs(CAST((CAST(sum(CASE WHEN bp = 1 AND is_m = 0 THEN 1 ELSE 0 END) AS DOUBLE) / nullif(CAST(count(*) - sum(is_m) AS DOUBLE), 0.0)) AS DOUBLE)) >= 4611686018427.388 THEN (CAST(sum(CASE WHEN bp = 1 AND is_m = 0 THEN 1 ELSE 0 END) AS DOUBLE) / nullif(CAST(count(*) - sum(is_m) AS DOUBLE), 0.0)) ELSE floor((CAST(sum(CASE WHEN bp = 1 AND is_m = 0 THEN 1 ELSE 0 END) AS DOUBLE) / nullif(CAST(count(*) - sum(is_m) AS DOUBLE), 0.0)) * 1000000.0 + 0.5) / 1000000.0 END)
               AS fpr
    FROM flag
    """
