"""Streaming `aggregate` filter — the live twin of
`operators.eventops.aggregate_correlate` (SURVEY §2.11 × the logstash
aggregate filter's push-map-as-event contract).

State per task is four numbers — (span, n_events, value_cents,
started_us) — the OPEN span's accumulated map, the same registrar-sized
keyed-state shape every stream module here carries (registrar.go:8-36).
Each micro-batch folds the task's slice in (ts, event_id) order: an
end-typed event CLOSES the open span (one output row, emitted exactly
once — spans close exactly once, so update-mode emissions are final),
and the remainder re-opens state for the next batch. The per-batch walk
is bounded by end-events-per-task-per-batch (purchase-rate sized); all
per-row arithmetic is numpy over the sorted slice.

Timeout: push_map_as_event_on_timeout — a task idle for ``ttl_ms``
emits its open span with ``timed_out=true`` (NULL-analog ``ended`` /
``span_us`` of -1, keeping the output schema flat longs), mirroring the
batch operator's ``emit_open=True`` tail rows. The state is NOT removed
on timeout: it re-initializes to ``(span+1, 0, 0, -1)`` so span
numbering stays monotone per user and (user_id, span) output keys never
repeat — removal would restart a returning user at span 0, re-emitting
an already-final key (ADVICE r5). The retained counter is 4 longs per
ever-seen user, the same asymptote as any per-user aggregate.

Ordering contract: exact equality with the batch operator's closed
spans holds under time-ordered replay (the harvest case) — same
contract as `sessionize_stream.session_stream`, whose event-time-exact
variant shows how a watermark would buy arbitrary-disorder exactness
here too.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, span long, n_events long, value_cents long, "
    "span_us long, timed_out boolean"
)
STATE_SCHEMA = "span long, n_events long, value_cents long, started_us long"

END_TYPE = "purchase"


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import numpy as np

    span, n, cents, started_us = state.get if state.exists else (0, 0, 0, -1)

    if state.exists and state.hasTimedOut:
        # push_map_as_event_on_timeout: flush the open span, then keep the
        # span counter (monotone numbering — see module docstring)
        state.update((int(span) + (1 if n > 0 else 0), 0, 0, -1))
        state.setTimeoutDuration(TTL_MS)
        if n > 0:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "span": [span],
                    "n_events": [n],
                    "value_cents": [cents],
                    "span_us": [-1],
                    "timed_out": [True],
                }
            )
        return

    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return
    pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
    # whole-batch sort, not per-chunk (the chunked-iterator gotcha the
    # sessionize twin documents)
    pdf = pdf.sort_values(["ts", "event_id"])
    us = (
        pdf["ts"].astype("datetime64[ns]").astype("int64") // 1_000
    ).to_numpy()
    cents_v = np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    ends = np.flatnonzero((pdf["event_type"] == END_TYPE).to_numpy())

    out: dict[str, list] = {k: [] for k in (
        "user_id", "span", "n_events", "value_cents", "span_us", "timed_out"
    )}
    lo = 0
    # loop bound = end events for THIS task in THIS batch (small by
    # construction); segment math inside is vectorized slices
    for i in ends:
        n += int(i - lo + 1)
        cents += int(cents_v[lo : i + 1].sum())
        if started_us < 0:
            started_us = int(us[lo])
        out["user_id"].append(key[0])
        out["span"].append(span)
        out["n_events"].append(n)
        out["value_cents"].append(cents)
        out["span_us"].append(int(us[i]) - started_us)
        out["timed_out"].append(False)
        span, n, cents, started_us = span + 1, 0, 0, -1
        lo = int(i) + 1
    if lo < len(us):
        n += len(us) - lo
        cents += int(cents_v[lo:].sum())
        if started_us < 0:
            started_us = int(us[lo])

    state.update((int(span), int(n), int(cents), int(started_us)))
    state.setTimeoutDuration(TTL_MS)
    if out["user_id"]:
        yield pd.DataFrame(out)


TTL_MS = 3_600_000  # idle tasks flush after an hour of wall time


def aggregate_stream(events_stream):
    """One row per CLOSED span as its end event arrives (exactly once),
    plus timed-out open spans flushed by processing-time TTL."""
    return (
        events_stream.select("user_id", "ts", "event_id", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
