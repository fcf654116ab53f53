"""Streaming throttle — the batch `throttle` operator's live twin
(SURVEY §2.11 × the logstash throttle filter): per-(key, period)
admission caps folded incrementally as micro-batches arrive.

State is keyed by (key, period_start) and holds ONE number — events
seen so far in that period — the registrar shape again (tiny keyed
state summarizing an unbounded stream, `registrar.go:8-36`). Each
batch's group slice is sorted by (ts, event_id) and flagged with a
vectorized position check: event i is throttled iff
``seen_before + i >= max_per_period``. Old-period state evicts on a
processing-time timeout (one period length past last touch), so live
state is bounded by (active keys × periods-in-flight), never by stream
length.

Ordering contract: logstash's throttle is an ARRIVAL-ORDER filter —
whichever events arrive first consume the budget. The batch twin admits
the (ts, event_id)-earliest instead; the two coincide exactly under a
time-ordered replay (the harvest case), which is what the equality test
drives. Under disorder they legitimately differ — that is the filter's
documented semantics, not a defect (contrast `session_stream_exact`,
where event-time exactness is the point).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "event_id long, user_id long, throttled boolean"
STATE_SCHEMA = "n_seen long"


def _make_update(max_per_period: int, ttl_ms: int):
    def _update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.hasTimedOut:
            state.remove()
            return
        (n_seen,) = state.get if state.exists else (0,)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values(["ts", "event_id"])
        pos = n_seen + np.arange(len(pdf))
        state.update((n_seen + len(pdf),))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "event_id": pdf["event_id"].to_numpy(),
                "user_id": pdf["user_id"].to_numpy(),
                "throttled": pos >= max_per_period,
            }
        )

    return _update


def throttle_stream(
    events_stream,
    *,
    key_col: str = "user_id",
    period: str = "day",
    max_per_period: int = 1,
    state_ttl_ms: int = 24 * 3600 * 1000,
):
    """(event_id, key, throttled) per event per micro-batch; state per
    (key, period) is one long, evicted ``state_ttl_ms`` after last
    touch."""
    keyed = events_stream.select(
        "event_id",
        F.col(key_col).alias("user_id"),
        "ts",
        F.date_trunc(period, F.col("ts")).alias("period_start"),
    )
    return keyed.groupBy("user_id", "period_start").applyInPandasWithState(
        _make_update(max_per_period, state_ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
