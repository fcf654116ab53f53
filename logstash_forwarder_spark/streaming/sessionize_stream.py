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
tradeoff. `session_stream_exact` below resolves it the other way:
watermark + event-time timeout buy exactness under arbitrary bounded
disorder at the cost of watermark-delay latency.

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


# --------------------------------------------------------------------------
# event-time-exact variant (VERDICT r4 #4): watermark + event-time timeout
# --------------------------------------------------------------------------

EXACT_STATE_SCHEMA = (
    "pending array<long>, last_ms long, n_sessions long, n_events long"
)


def _fold_ripe(
    pending: list[int], wm: int, last_ms: int, n_sess: int, n_ev: int
) -> tuple[list[int], int, int, int, bool]:
    """Finalize every buffered event at-or-below the watermark, in event-time
    order, against the finalized tail — the same gap rule as the batch lag
    window. Ties on ts are order-free for session counting (gap 0 either
    way), so the buffer needs only timestamps."""
    import numpy as np

    ripe = sorted(t for t in pending if t <= wm)
    hold = [t for t in pending if t > wm]
    if ripe:
        arr = np.asarray(ripe, dtype=np.int64)
        prev = np.concatenate(([last_ms], arr[:-1]))
        n_sess += int(((prev < 0) | (arr - prev > GAP_MS)).sum())
        n_ev += len(ripe)
        last_ms = int(arr[-1])
    return hold, last_ms, n_sess, n_ev, bool(ripe)


def _update_exact(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    pending, last_ms, n_sess, n_ev = (
        state.get if state.exists else ([], -1, 0, 0)
    )
    pending = list(pending or [])
    wm = state.getCurrentWatermarkMs()
    for pdf in pdfs:
        if not len(pdf):
            continue
        ms = (
            pdf["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000
        )
        # beyond-delay late rows are filtered by the stateful operator's
        # own late-data filter; this guard makes the fold self-sufficient
        # anyway (an event at-or-below already-finalized time — last_ms
        # never exceeds the watermark — cannot be spliced back without
        # rewriting emitted history)
        pending.extend(int(t) for t in ms if t > last_ms)
    pending, last_ms, n_sess, n_ev, changed = _fold_ripe(
        pending, wm, last_ms, n_sess, n_ev
    )
    state.update((pending, int(last_ms), int(n_sess), int(n_ev)))
    if pending:
        # flush timer: fires on the first micro-batch whose watermark has
        # passed every buffered event (timestamp must exceed current wm —
        # guaranteed, buffered events are all > wm)
        state.setTimeoutTimestamp(max(pending) + 1)
    if changed:
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_sess],
                "n_events": [n_ev],
            }
        )


def session_stream_exact(events_stream, delay: str = "1 hour"):
    """Event-time-EXACT streaming sessionization: equal to the batch lag
    window under ARBITRARY cross-batch reordering, as long as each event
    arrives within ``delay`` of the stream's max event time (the standard
    watermark contract; events later than that are dropped, the documented
    tradeoff `session_stream` resolves the other way by folding them into
    the current session).

    Mechanics: events newer than the watermark BUFFER in keyed state
    (bounded by arrival-rate x delay per user — the same bound every
    watermarked stateful operator carries); events at-or-below the
    watermark can no longer be preceded by an unseen earlier event, so
    they finalize in event-time order against the finalized tail —
    exactly the batch window's fold. An event-time timeout set past the
    newest buffered event flushes the remainder once the watermark
    passes it, so emitted totals converge to the batch result without
    waiting for new data per user. Reference analog: the registrar's
    durable correctness under reordered acks (acks commit when safe, not
    when received)."""
    return (
        events_stream.select("user_id", "ts", "event_id")
        .withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_exact,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=EXACT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
