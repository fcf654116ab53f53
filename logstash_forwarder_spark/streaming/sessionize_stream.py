"""Streaming sessionization — the batch `sessionize` query's live twin
(SURVEY §2.11 × §2.5): per-user session counting with a 30-minute
inactivity gap, folded incrementally as micro-batches arrive.

State per user is three numbers — (last_event_ms, n_sessions, n_events) —
exactly the reference registrar's shape (tiny keyed state summarizing an
unbounded stream, registrar.go:8-36) applied to session semantics. The
fold is vectorized per batch: the user's batch slice is sorted by
(ts, event_id), the previous-event vector is the sorted timestamps shifted
by one with the STATE's last_event_ms spliced in front, and new sessions
are `count(prev < 0 OR ts - prev > gap)` — one numpy pass, no per-event
Python.

Ordering contract: exact equality with the batch window (`lag` over
(ts, event_id)) holds when each user's events are non-decreasing in event
time ACROSS micro-batches (a time-ordered replay — the harvest case).
A late event (ts <= last seen) folds into the CURRENT session rather than
retroactively splitting history — bounded-state streaming's standard
tradeoff; an event-time-timeout variant with watermark would trade
latency for exactness there.

Emissions: one row per TOUCHED user per batch with the updated totals
(update mode). n_events strictly grows, so a memory-sink consumer takes
the max-n_events row per user as the final state (see tests).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_sessions long, n_events long"
STATE_SCHEMA = "last_ms long, n_sessions long, n_events long"

GAP_MS = 30 * 60 * 1000


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import numpy as np

    last_ms, n_sess, n_ev = state.get if state.exists else (-1, 0, 0)
    # applyInPandasWithState hands ONE group's batch rows as an iterator
    # of Arrow-sized CHUNKS in arbitrary order — the sort must run over
    # the whole batch, not per chunk (a >maxRecordsPerBatch user would
    # otherwise fold out-of-order chunks and miscount sessions)
    chunks = [pdf for pdf in pdfs if len(pdf)]
    touched = bool(chunks)
    if touched:
        pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values(["ts", "event_id"])
        # pin the epoch unit: Arrow may hand pandas datetime64[us] or [ns]
        ms = (
            pdf["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000
        ).to_numpy()
        prev = np.concatenate(([last_ms], ms[:-1]))
        n_sess += int(((prev < 0) | (ms - prev > GAP_MS)).sum())
        n_ev += len(ms)
        last_ms = max(last_ms, int(ms[-1]))
    if touched:
        state.update((int(last_ms), int(n_sess), int(n_ev)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_sess],
                "n_events": [n_ev],
            }
        )


def session_stream(events_stream):
    """(user_id, n_sessions, n_events) per touched user per micro-batch."""
    return (
        events_stream.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
