"""Streaming event-rate spike detection — the live twin of the batch
``rate_anomaly`` query (queries.py).

State is keyed by ``event_type`` and holds the trailing per-hour counts as
parallel arrays (hours list + counts list, pruned to the trailing window
plus the current hour), so the operator's memory is O(window) per key no
matter how many events flow — the same bounded-state discipline as the
reference registrar's ``map[source]FileState`` (registrar.go:8-36), keyed
by type instead of file.

Every micro-batch folds its events into the per-hour counts and re-emits
the spike flag for each touched hour using EXACTLY the batch rule
(``count * window * 100 >= factor_pct * trailing_sum`` over a FULL
trailing window) — so a stream fed the same events as the batch query
converges to identical flags, which is what the test asserts
(batch/stream equality, the dedup_stream.py pattern).

Late rows older than the retained window update nothing (their hour has
been pruned); with event-time ordered input — the spooler's delivery
order — flags are exact.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

WINDOW_HOURS = 6
FACTOR_PCT = 150
_KEEP = WINDOW_HOURS + 2  # trailing window + current hour + 1 slack

OUTPUT_SCHEMA = "event_type string, hour string, n_events long, trailing_sum long, spike long"
STATE_SCHEMA = "hours array<string>, counts array<long>"


def _flags_for(hours: list, counts: list) -> pd.DataFrame:
    by_hour = dict(zip(hours, counts))
    ordered = sorted(by_hour)
    out = []
    for i, h in enumerate(ordered):
        trail = ordered[max(0, i - WINDOW_HOURS) : i]
        tsum = sum(by_hour[t] for t in trail)
        full = len(trail) == WINDOW_HOURS
        spike = int(
            full and by_hour[h] * WINDOW_HOURS * 100 >= FACTOR_PCT * tsum
        )
        out.append((h, by_hour[h], tsum, spike))
    return out


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    hours, counts = (list(state.get[0]), list(state.get[1])) if state.exists else ([], [])
    by_hour = dict(zip(hours, counts))
    for pdf in pdfs:
        for h, n in pdf.groupby("hour").size().items():
            by_hour[h] = by_hour.get(h, 0) + int(n)
    # prune beyond the retained window (bounded state per key)
    kept = sorted(by_hour)[-_KEEP:]
    by_hour = {h: by_hour[h] for h in kept}
    state.update((list(by_hour), [by_hour[h] for h in by_hour]))
    rows = _flags_for(list(by_hour), [by_hour[h] for h in by_hour])
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
    """(event_type, hour, n_events, trailing_sum, spike) updated per batch."""
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
