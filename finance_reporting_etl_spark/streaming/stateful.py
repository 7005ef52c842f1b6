"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.8 — the escape hatch for per-key logic Spark's built-in
stateful operators can't express).

The demo operator keeps a per-key running aggregate (count + sum) in
explicit ``GroupState`` across micro-batches and emits the updated
running totals once per key per batch, tagged with an update sequence
number. Because count/sum are commutative, the *last* emission per key
equals the batch ``groupBy`` — which is exactly what the oracle checks —
while the emission log itself demonstrates the cross-batch state
machinery (``maxFilesPerTrigger=1`` forces several micro-batches even in
an AvailableNow replay).

Scale notes: state lives in the executor-side state store keyed by the
grouping column — per-key bytes are a 3-tuple, so state size is bounded
by key cardinality, not stream length. Arrow moves each key-group to
Python in batches; for a pure count/sum the built-in windowed agg is
cheaper (stays JVM-side) — reach for this operator only when the
per-key transition function is genuinely custom (decay models, CUSUM
detectors, per-user ML features).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n BIGINT, total DOUBLE, seq INT"


def _make_updater(value_col: str, key_col: str):
    def update(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total, seq = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # pandas sum skips NaN == SQL SUM skips NULL (keys with only
            # NULL values yield 0.0, not NULL — acceptable for the demo)
            total += float(pdf[value_col].sum())
        seq += 1
        state.update((n, total, seq))
        yield pd.DataFrame(
            {key_col: [key[0]], "upd_seq": [seq], "n_events": [n], "total_value": [total]}
        )

    return update


def stateful_running_totals(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    checkpoint_dir: str,
    output_table: str = "stateful_totals_stream",
    key_col: str = "user_id",
    value_col: str = "value",
    max_files_per_trigger: int = 1,
):
    """AvailableNow file stream -> per-key GroupState running totals.

    Emits ``(key, upd_seq, n_events, total_value)`` per key per
    micro-batch; the caller reduces to the final state with
    ``max_by(..., upd_seq)``. Memory sink for the bounded-replay demo —
    the logical plan is sink-agnostic.

    Returns the StreamingQuery; caller awaits termination then reads
    ``spark.table(output_table)``.
    """
    key_type = schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, upd_seq INT, n_events BIGINT, total_value DOUBLE"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    updated = stream.groupBy(key_col).applyInPandasWithState(
        _make_updater(value_col, key_col),
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        updated.writeStream.format("memory")
        .queryName(output_table)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
