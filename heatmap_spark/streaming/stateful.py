"""Custom stateful streaming operator via applyInPandasWithState.

The escape hatch for operators Structured Streaming's built-in
aggregations can't express (SURVEY.md §2.8, pyspark_guide §Streaming):
arbitrary per-key state evolved batch-by-batch in Arrow-batched pandas.

Example operator: per-user cumulative visit counter with last-seen
timestamp — the streaming analogue of a running total that must
survive across micro-batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, last_ts timestamp"
STATE_SCHEMA = "n bigint"


def running_user_counts(events: DataFrame) -> DataFrame:
    """Streaming DataFrame → per-user cumulative counts (update mode).

    The update function is deliberately NESTED: a module-level function
    would be cloudpickled by reference, requiring ``import
    heatmap_spark`` inside every Python worker — which fails when the
    driver process imported this package from a path workers don't
    share.  A closure serializes by value and is self-contained.
    """

    def update_counts(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        total = state.get[0] if state.exists else 0
        last_ts = None
        for pdf in pdfs:
            total += len(pdf)
            m = pdf["ts"].max()
            last_ts = m if last_ts is None else max(last_ts, m)
        state.update((total,))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [total], "last_ts": [last_ts]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update_counts,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
