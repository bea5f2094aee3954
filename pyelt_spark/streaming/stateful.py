"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference is batch-only; the north rule's streaming re-frame calls for
custom stateful operators where built-in windowed aggregates don't fit.
``conversation_progress`` tracks, per conversation and ACROSS microbatches,
the running event count, max applied sequence number, distinct-turn count
estimate and the latest event's text — the streaming twin of the vault's
per-key head state, kept in Spark's state store (RocksDB/HDFS-backed on a
cluster) with Arrow-batched Python transitions.

State transitions are pure pandas/numpy over grouped Arrow batches — no
per-row Python in the hot path beyond the grouped kernel itself.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("max_seq", T.LongType()),
        T.StructField("n_turns_seen", T.LongType()),
        T.StructField("last_text", T.StringType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("max_seq", T.LongType()),
        T.StructField("turns", T.ArrayType(T.IntegerType())),
        T.StructField("last_text", T.StringType()),
    ]
)


def _update(key, pdf_iter, state: GroupState):
    (conv_id,) = key
    if state.exists:
        n_events, max_seq, turns, last_text = state.get
        turns = set(turns or [])
    else:
        n_events, max_seq, turns, last_text = 0, -1, set(), None
    for pdf in pdf_iter:
        n_events += len(pdf)
        turns.update(int(t) for t in pdf["turn_idx"].dropna().unique())
        idx = pdf["seq"].idxmax()
        if int(pdf["seq"].loc[idx]) > max_seq:
            max_seq = int(pdf["seq"].loc[idx])
            last_text = pdf["text"].loc[idx]
    state.update((n_events, max_seq, sorted(turns), last_text))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_events": [n_events],
            "max_seq": [max_seq],
            "n_turns_seen": [len(turns)],
            "last_text": [last_text],
        }
    )


def conversation_progress(events_stream: DataFrame) -> DataFrame:
    """Per-conversation running state over a change-event stream.

    ``events_stream``: a streaming DataFrame with at least
    (conv_id, turn_idx, seq, text). Output mode must be ``update``.
    """
    return events_stream.groupBy("conv_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
