"""Custom stateful streaming operators via applyInPandasWithState.

The reference has NO streaming machinery (SURVEY §2.10) — this is the
additive Structured-Streaming surface the engine exposes for arbitrary
per-key state machines that session_window/window aggregations cannot
express. State lives in Spark's state store (checkpointed, bounded by
timeouts); each trigger ships only the key's new rows to Python as Arrow
batches.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_value) maintained across
    triggers — the canonical custom-stateful shape: cumulative per-key
    aggregates that must SURVIVE between micro-batches and emit updated
    snapshots per trigger (a plain groupBy.agg in update mode recomputes
    per batch only with complete-mode state; this owns its state
    explicitly and scales to keys × O(16 bytes) state)."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, round(total, 6)))
        yield pd.DataFrame(
            [{"user_id": key[0], "n_events": n, "total_value": round(total, 6)}]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
