"""Custom stateful streaming operator: first-seen dedup per key.

``applyInPandasWithState`` demo — the arbitrary-stateful-processing
surface for operators the built-in streaming aggregations can't
express. State per user: the set of event_ids already emitted; a
replayed/duplicated event is dropped in any later micro-batch.

(At production scale the per-key state would hold a sketch — e.g. a
Bloom filter serialized to binary — instead of the exact id list used
here; the operator shape is identical.)
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)
STATE_SCHEMA = "seen array<long>"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen: set[int] = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        fresh = pdf[~pdf["event_id"].isin(seen)]
        fresh = fresh.drop_duplicates(subset=["event_id"])
        seen.update(int(x) for x in fresh["event_id"])
        if len(fresh):
            yield fresh[["event_id", "ts", "user_id", "event_type", "value"]]
    state.update((sorted(seen),))


def dedup_stream_first_seen(events: Any):
    """events stream -> exactly-one-emission-per-event_id-per-user stream."""
    return events.groupBy("user_id").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
