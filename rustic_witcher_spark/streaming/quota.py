"""Streaming per-key quota admission — the streaming face of the
batch ``source_cap`` entry (queries.q_source_cap): admit at most
``quota`` rows per key across the whole stream, then drop.

The batch twin is ``row_number() OVER (PARTITION BY key ORDER BY
seq) <= quota``; the stream can't see the future, so its admission
order is (arrival batch, seq within batch) — identical to the batch
twin whenever batches arrive in seq order (pinned by test).

State per key is ONE long (admitted-so-far): at web scale the state
store holds |keys| longs regardless of stream length, and keys that
reach quota do constant work per subsequent batch. For key spaces
that grow without bound, pair with a watermark timeout the way
``streaming_seen_filter`` documents.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

QUOTA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("admit_rank", T.LongType()),
    ]
)
QUOTA_STATE_SCHEMA = T.StructType([T.StructField("n_admitted", T.LongType())])


def _quota_fn(quota: int):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        if n >= quota:
            # saturated keys do constant work per batch: no concat, no
            # sort — the unconsumed iterator is simply dropped (the
            # seen-filter does the same)
            return iter(())
        # A micro-batch group may arrive as several pandas chunks; the
        # admission order must be the batch-global seq order, so gather
        # before selecting (groups are per-key slices, not the whole
        # batch). nsmallest bounds the work at O(b log k), not a full
        # sort of the batch slice.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return iter(())
        # nsmallest already returns rows ascending by event_id
        take = pd.concat(chunks).nsmallest(quota - n, "event_id")
        if not len(take):
            return iter(())
        state.update((n + len(take),))
        out = pd.DataFrame(
            {
                "user_id": take["user_id"].values,
                "event_id": take["event_id"].values,
                "admit_rank": range(n + 1, n + len(take) + 1),
            }
        )
        return iter([out])

    return fn


def streaming_quota_filter(events_stream: DataFrame, quota: int) -> DataFrame:
    """First ``quota`` events per user across the stream, ranked."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _quota_fn(quota),
        outputStructType=QUOTA_OUTPUT_SCHEMA,
        stateStructType=QUOTA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
