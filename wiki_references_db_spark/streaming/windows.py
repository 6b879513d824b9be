"""Windowed / stateful streaming analytics over event streams.

Nothing in the reference requires streaming (SURVEY §2.11) — these are
the engine's forward-looking stream operators, sharing semantics with
their batch twins in queries/generic.py so results can be cross-checked:

- ``windowed_event_counts``: tumbling/sliding window agg with watermark
  (batch twin: events_tumbling_hourly)
- ``stateful_lifecycle``: applyInPandasWithState custom stateful
  operator maintaining first/last-seen per key — the streaming form of
  the citation lifecycle aggregation (A1)
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
    StringType,
    StructField,
    StructType,
)


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling (or sliding) window counts per event_type.
    Works identically on batch and streaming DataFrames."""
    with_wm = (
        events.withWatermark("ts", watermark)
        if events.isStreaming
        else events
    )
    win = F.window("ts", window_duration, slide) if slide else F.window(
        "ts", window_duration
    )
    return with_wm.groupBy(win.alias("win"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("total_value"),
    ).select(
        F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


LIFECYCLE_STATE = StructType(
    [
        StructField("first_seen", LongType()),
        StructField("last_seen", LongType()),
        StructField("appearance_count", LongType()),
    ]
)

LIFECYCLE_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("first_seen", LongType()),
        StructField("last_seen", LongType()),
        StructField("appearance_count", LongType()),
    ]
)


def _lifecycle_fn(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        first_seen, last_seen, count = state.get
    else:
        first_seen, last_seen, count = None, None, 0
    for pdf in pdfs:
        ids = pdf["seq"]
        if len(ids):
            lo, hi = int(ids.min()), int(ids.max())
            first_seen = lo if first_seen is None else min(first_seen, lo)
            last_seen = hi if last_seen is None else max(last_seen, hi)
            count += len(ids)
    state.update((first_seen, last_seen, count))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "first_seen": [first_seen],
            "last_seen": [last_seen],
            "appearance_count": [count],
        }
    )


def stateful_lifecycle(keyed: DataFrame) -> DataFrame:
    """Custom stateful operator: per ``key`` maintain
    first_seen/last_seen/appearance_count over a stream of (key, seq)
    rows — the streaming twin of the lifecycle aggregation (A1,
    reference:api_v1.py:186-199).  Emits the updated lifecycle row for
    each key seen in a micro-batch."""
    return keyed.groupBy("key").applyInPandasWithState(
        _lifecycle_fn,
        outputStructType=LIFECYCLE_OUTPUT,
        stateStructType=LIFECYCLE_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# NOTE: Spark 4's transformWithStateInPandas (the successor stateful
# API) was evaluated and works only with the google-protobuf Python
# package, which this environment does not ship (its state-server
# protocol is protobuf-based: pyspark/sql/streaming/proto).  The
# applyInPandasWithState operator above covers the same arbitrary-state
# semantics; migrate when protobuf is available.
