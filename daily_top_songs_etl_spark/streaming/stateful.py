"""Custom stateful streaming operator: per-key running totals via
``applyInPandasWithState``.

This is the engine's escape hatch for stateful semantics the built-in
window/aggregation operators can't express (the reference has no analog —
its only state is the daily batch itself, SURVEY.md §2.10). The canonical
use: a running per-user profile (event count + exact spend) updated by
each micro-batch and re-emitted on change.

Exactness: spend accumulates in integer micro-units (value × 1e6 rounded)
so state survives any batch split with bit-identical results — float
accumulation order across micro-batches would drift. The batch-equivalent
aggregation (``running_user_totals_batch``) is the oracle in tests: after
draining any file split, the stream's final per-user state must equal the
one-shot batch aggregate exactly.

Scale: state is partitioned by the group key (Spark's state store shards
with the shuffle), one tiny fixed-size row per user; Arrow batches keep
the Python hop vectorized.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

MICRO = 1_000_000

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_micro", LongType()),
        StructField("n_updates", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_micro", LongType()),
        StructField("update_seq", LongType()),
    ]
)


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import numpy as np

    n, total, seq = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # Quantize PER ROW (floor of the double product — identical IEEE op
        # in numpy and Spark's floor()), then integer-sum: the total is then
        # invariant to how the source is split into micro-batches.
        total += int(
            np.floor(pdf["value"].astype("float64").to_numpy() * MICRO).sum()
        )
    seq += 1
    state.update((n, total, seq))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_micro": [total],
            "update_seq": [seq],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming side: one state row per user, re-emitted each micro-batch
    the user appears in (``update_seq`` orders emissions for consumers).
    Works on a static DataFrame too (single "batch")."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_totals_batch(events: DataFrame) -> DataFrame:
    """Batch oracle: the state the stream must converge to after draining
    the source, computed as one aggregation (same integer micro-units)."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.floor(F.col("value").cast("double") * MICRO).cast("bigint")
        ).alias("total_micro"),
    )
