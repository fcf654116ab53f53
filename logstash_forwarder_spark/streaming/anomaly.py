"""Streaming event-rate spike detection — the live twin of the batch
``rate_anomaly`` query (queries.py).

Semantics (identical to the batch query, which uses a ROWS frame): an
hour is compared against its six most recent OBSERVED hours for that
event_type — a rate-vs-recent-activity rule that is robust to silent
hours (a gap does not reset the detector; it compares against the last
activity whenever that was). Hours with fewer than six observed
predecessors never flag.

State is keyed by ``event_type`` and holds the trailing per-hour counts
(hours + counts arrays pruned to the most recent ``_KEEP``), so memory is
O(window) per key no matter how many events flow — the bounded-state
discipline of the reference registrar's ``map[source]FileState``
(registrar.go:8-36), keyed by type instead of file.

Each micro-batch folds its events into the counts and emits flags ONLY
for the hours the batch touched — never re-emitting retained hours, so a
previously-correct flag is never overwritten by a degraded re-computation
after pruning (emitting everything retained was exactly that bug). With
event-time-ordered arrival — the spooler's delivery order — a touched
hour's six observed predecessors are always inside the retained window,
so the emitted flags equal the batch query's, which the equality test
asserts across a pruning boundary. Late rows older than the retained
window are dropped (documented loss; the batch query is the backfill
path).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

WINDOW_HOURS = 6
FACTOR_PCT = 150
_KEEP = WINDOW_HOURS + 2  # window + current hour + 1 slack

OUTPUT_SCHEMA = "event_type string, hour string, n_events long, trailing_sum long, spike long"
STATE_SCHEMA = "hours array<string>, counts array<long>"


def _flag(by_hour: dict, h: str) -> tuple:
    """(n_events, trailing_sum, spike) for hour h against its <= 6 most
    recent observed predecessors in by_hour (the batch ROWS-frame rule)."""
    trail = sorted(t for t in by_hour if t < h)[-WINDOW_HOURS:]
    tsum = sum(by_hour[t] for t in trail)
    full = len(trail) == WINDOW_HOURS
    spike = int(
        full and by_hour[h] * WINDOW_HOURS * 100 >= FACTOR_PCT * tsum
    )
    return by_hour[h], tsum, spike


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    by_hour = (
        dict(zip(state.get[0], state.get[1])) if state.exists else {}
    )
    touched = set()
    for pdf in pdfs:
        for h, n in pdf.groupby("hour").size().items():
            if by_hour and h < min(by_hour) and len(by_hour) >= _KEEP:
                continue  # older than the retained window: documented drop
            by_hour[h] = by_hour.get(h, 0) + int(n)
            touched.add(h)
    # flags are computed on the FULL post-update view (a touched hour's
    # trail must see predecessors this same batch delivered, even when the
    # batch spans more hours than the state retains); pruning is only for
    # what gets STORED
    rows = [(h, *_flag(by_hour, h)) for h in sorted(touched)]
    kept = sorted(by_hour)[-_KEEP:]
    by_hour = {h: by_hour[h] for h in kept}
    state.update((list(by_hour), [by_hour[h] for h in by_hour]))
    yield pd.DataFrame(
        {
            "event_type": [key[0]] * len(rows),
            "hour": [r[0] for r in rows],
            "n_events": [r[1] for r in rows],
            "trailing_sum": [r[2] for r in rows],
            "spike": [r[3] for r in rows],
        }
    )


def spike_stream(events_stream):
    """(event_type, hour, n_events, trailing_sum, spike) per touched hour."""
    hourly = events_stream.withColumn(
        "hour", F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH")
    )
    return hourly.groupBy("event_type").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
