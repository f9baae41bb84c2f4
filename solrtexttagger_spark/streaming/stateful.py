"""Custom stateful streaming operator via applyInPandasWithState:
per-user running aggregates over an event stream (count, value sum, distinct
event types), state carried across micro-batches.

This is the engine's template for custom stateful operators the built-in
windowed aggregations can't express (e.g. running corpus statistics for an
incrementally-built index, per-repo ingest accounting at 10^12-file scale:
keys partition the state, each key's state stays tiny)."""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("n_event_types", T.IntegerType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("types", T.ArrayType(T.StringType())),
    ]
)


def _update(
    key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n_events, sum_value, types = state.get
        types = set(types)
    else:
        n_events, sum_value, types = 0, 0.0, set()
    for pdf in pdfs:
        n_events += len(pdf)
        sum_value += float(pdf["value"].sum())
        types.update(pdf["event_type"].dropna().tolist())
    state.update((n_events, sum_value, sorted(types)))
    yield pd.DataFrame(
        {
            "user_id": pd.Series([key[0]], dtype="int64"),
            "n_events": pd.Series([n_events], dtype="int64"),
            "sum_value": pd.Series([sum_value], dtype="float64"),
            "n_event_types": pd.Series([len(types)], dtype="int32"),
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """events: streaming DataFrame with (user_id long, event_type string,
    value double). Emits the updated running stats per user each batch."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
