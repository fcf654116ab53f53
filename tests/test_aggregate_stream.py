"""Streaming aggregate filter == batch aggregate_correlate closed spans:
the stateful fold over time-split micro-batches must reproduce the batch
operator's per-span rows exactly — including a span whose events STRADDLE
a micro-batch boundary (the open map carried in state, not batch-local)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from logstash_forwarder_spark.operators.eventops import aggregate_correlate
from logstash_forwarder_spark.streaming.aggregate_stream import aggregate_stream

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double"
)


def test_aggregate_stream_equals_batch(spark, tmp_path):
    t0 = dt.datetime(2026, 4, 1, 9, 0, 0)

    def ev(eid, user, minutes, etype, value):
        return (eid, t0 + dt.timedelta(minutes=minutes), user, etype, value)

    rows = [
        # user 1: span 0 closes inside batch 1; span 1 STRADDLES the
        # boundary (views in batch 1, purchase in batch 2); open tail
        ev(1, 1, 0, "view", 1.00),
        ev(2, 1, 1, "purchase", 2.00),
        ev(3, 1, 2, "view", 4.00),
        ev(4, 1, 3, "click", 8.00),
        ev(5, 1, 10, "purchase", 16.00),
        ev(6, 1, 11, "view", 32.00),
        # user 2: two purchases in ONE batch (two spans from one slice)
        ev(7, 2, 0, "purchase", 0.25),
        ev(8, 2, 1, "purchase", 0.50),
        # user 3: never closes -> no streamed row
        ev(9, 3, 0, "view", 9.99),
    ]
    batch1 = [r for r in rows if r[0] in (1, 2, 3, 4)]
    batch2 = [r for r in rows if r[0] not in (1, 2, 3, 4)]
    in_dir = str(tmp_path / "agg_in")
    for part in (batch1, batch2):
        spark.createDataFrame(part, EV_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    q = (
        aggregate_stream(stream)
        .writeStream.format("memory")
        .queryName("agg_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.user_id, r.span): (r.n_events, r.value_cents, r.span_us)
        for r in spark.sql(
            "SELECT * FROM agg_out WHERE NOT timed_out"
        ).collect()
    }

    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    batch = aggregate_correlate(
        spark.createDataFrame(rows, EV_SCHEMA),
        end_predicate=F.col("event_type") == "purchase",
        sum_exprs={"value_cents": cents},
    )
    want = {
        (r.user_id, r.span): (r.n_events, r.value_cents, r.span_us)
        for r in batch.collect()
    }
    assert got == want
    # each closed span emitted exactly once (no re-emission dedup needed)
    n_rows = spark.sql("SELECT count(*) c FROM agg_out").collect()[0].c
    assert n_rows == len(want)
    # the straddling span really did straddle: its count spans both files
    assert want[(1, 1)][0] == 3


class _FakeState:
    """Minimal GroupState stand-in for unit-driving _update."""

    def __init__(self, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self.timeout_set = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_timeout_keeps_span_numbering_monotone():
    """TTL flush must NOT restart span numbering: after a timed-out span N,
    the user's next closed span is N+1 — (user_id, span) keys never repeat,
    so update-mode emissions stay final (ADVICE r5)."""
    import datetime as dt

    import pandas as pd

    from logstash_forwarder_spark.streaming.aggregate_stream import _update

    t0 = dt.datetime(2026, 4, 1, 9, 0, 0)

    def batch(rows):
        return pd.DataFrame(
            rows, columns=["ts", "event_id", "event_type", "value"]
        )

    # batch 1: open span 0 (no purchase)
    state = _FakeState()
    out = list(_update((7,), iter([batch([(t0, 1, "view", 1.0)])]), state))
    assert out == [] and state.get[0] == 0 and state.get[1] == 1

    # TTL fires: span 0 flushed timed_out, counter advances to 1
    state.hasTimedOut = True
    out = list(_update((7,), iter([]), state))
    assert len(out) == 1
    flushed = out[0].iloc[0]
    assert (flushed.span, flushed.timed_out, flushed.span_us) == (0, True, -1)
    assert state.get == (1, 0, 0, -1)
    assert state.timeout_set is not None  # re-armed, state retained

    # idle TTL with nothing open: no emission, counter retained
    out = list(_update((7,), iter([]), state))
    assert out == [] and state.get == (1, 0, 0, -1)

    # user returns and closes a span: numbered 1, never 0 again
    state.hasTimedOut = False
    out = list(
        _update(
            (7,),
            iter([batch([(t0, 2, "view", 1.0), (t0, 3, "purchase", 2.0)])]),
            state,
        )
    )
    assert len(out) == 1 and out[0].iloc[0].span == 1
    assert state.get[0] == 2
