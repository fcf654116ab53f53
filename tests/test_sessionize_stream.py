"""Streaming sessionization == batch sessionize: the stateful fold over
time-split micro-batches must reproduce the batch window query's per-user
(n_sessions, n_events) exactly — including sessions that SPAN a
micro-batch boundary (gap computed against state, not batch-local lag)."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_forwarder_spark.streaming.sessionize_stream import session_stream

EV_SCHEMA = "event_id long, ts timestamp, user_id long"


def test_session_stream_equals_batch(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2026, 3, 1, 8, 0, 0)

    def ev(eid, user, minutes):
        return (eid, t0 + dt.timedelta(minutes=minutes), user)

    rows = [
        # user 1: session A (0, 10min), session B (50, 55) — B spans the
        # batch split below (50 in file 1; 55 in file 2)
        ev(1, 1, 0), ev(2, 1, 10), ev(3, 1, 50), ev(4, 1, 55),
        # user 2: one event per batch, 31-min gap -> two sessions
        ev(5, 2, 0), ev(6, 2, 31),
        # user 3: all in file 2, ties on ts broken by event_id
        ev(7, 3, 100), ev(8, 3, 100), ev(9, 3, 131),
    ]
    cut = 4  # events 1-4+5 in file 1? split below keeps ordered replay
    file1 = [r for r in rows if r[0] in (1, 2, 3, 5)]
    file2 = [r for r in rows if r[0] not in (1, 2, 3, 5)]
    in_dir = str(tmp_path / "sess_in")
    spark.createDataFrame(file1, EV_SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)
    spark.createDataFrame(file2, EV_SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    q = (
        session_stream(stream)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # n_events strictly grows per user: the max-n_events emission is final
    got = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in spark.sql(
            "SELECT user_id, max_by(n_sessions, n_events) AS n_sessions, "
            "max(n_events) AS n_events FROM sess_out GROUP BY user_id"
        ).collect()
    }

    # batch twin: identical lag-window semantics on the full data
    e = spark.createDataFrame(rows, EV_SCHEMA)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts") - F.lag(F.col("ts")).over(w)
    new_sess = F.when(gap.isNull() | (gap > F.expr("INTERVAL 30 MINUTES")), 1).otherwise(0)
    batch = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in e.withColumn("ns", new_sess)
        .groupBy("user_id")
        .agg(
            F.sum("ns").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .collect()
    }
    assert got == batch == {1: (2, 4), 2: (2, 2), 3: (2, 3)}


def test_session_stream_fixture_equals_batch_query(spark, tmp_path):
    """Same equality on the real events fixture (sf0.001), split into two
    time-ordered micro-batches — the streaming result must equal the
    registry's q_sessionize output row-for-row."""
    from logstash_forwarder_spark.queries import q_sessionize

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet").select(
        "event_id", "ts", "user_id"
    )
    # TIMESTAMP_NTZ cannot cast to long (CLAUDE.md): unix_timestamp instead
    secs = F.unix_timestamp("ts")
    cut = ev.agg(F.expr("percentile_approx(unix_timestamp(ts), 0.5)")).first()[0]
    in_dir = str(tmp_path / "fx_in")
    ev.filter(secs <= cut).coalesce(1).write.mode("append").parquet(in_dir)
    ev.filter(secs > cut).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    q = (
        session_stream(stream)
        .writeStream.format("memory")
        .queryName("sess_fx")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in spark.sql(
            "SELECT user_id, max_by(n_sessions, n_events) AS n_sessions, "
            "max(n_events) AS n_events FROM sess_fx GROUP BY user_id"
        ).collect()
    }
    batch = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in q_sessionize(spark, sf).collect()
    }
    assert got == batch


def test_native_session_window_agrees(spark):
    """Spark's built-in session_window aggregation (the idiomatic
    streaming-ready form) produces the same per-user session count as the
    lag-window formulation on gaps strictly above/below the threshold.
    (Boundary semantics differ by construction: session_window's window is
    half-open, so a gap of EXACTLY 30 min starts a new session there while
    the lag rule `gap > 30min` keeps it — same convention choice DuckDB
    users make; our oracle pins the lag rule.)"""
    import datetime as dt

    t0 = dt.datetime(2026, 3, 1, 8, 0, 0)
    rows = [
        (1, t0 + dt.timedelta(minutes=m), u)
        for u, ms in ((1, [0, 10, 50, 55]), (2, [0, 31]), (3, [100, 100, 131]))
        for m in ms
    ]
    rows = [(i, ts, u) for i, (_, ts, u) in enumerate(rows, 1)]
    e = spark.createDataFrame(rows, EV_SCHEMA)
    native = {
        r.user_id: r.n
        for r in e.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("sw")
        )
        .count()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    assert native == {1: 2, 2: 2, 3: 2}


def test_session_stream_multi_chunk_group(spark, tmp_path):
    """REGRESSION (code review): one user's micro-batch data arriving as
    MULTIPLE Arrow chunks (maxRecordsPerBatch < group size) in shuffled
    order must still fold time-sorted — the sort runs over the whole
    drained batch, never per chunk."""
    import datetime as dt
    import random

    t0 = dt.datetime(2026, 3, 1, 8, 0, 0)
    # 40 events, sessions split at 31-min gaps every 10 events -> 4 sessions
    rows = []
    minute = 0
    for i in range(40):
        if i and i % 10 == 0:
            minute += 31
        else:
            minute += 1
        rows.append((i + 1, t0 + dt.timedelta(minutes=minute), 7))
    random.Random(3).shuffle(rows)  # arbitrary partition order
    in_dir = str(tmp_path / "mc_in")
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        stream = (
            spark.readStream.schema(EV_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
        )
        q = (
            session_stream(stream)
            .writeStream.format("memory")
            .queryName("mc_out")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = spark.sql(
        "SELECT max_by(n_sessions, n_events) AS s, max(n_events) AS e FROM mc_out"
    ).first()
    assert (got.s, got.e) == (4, 40)


def test_session_stream_exact_out_of_order(spark, tmp_path):
    """VERDICT r4 #4: the event-time-exact variant must equal the batch lag
    window under SHUFFLED micro-batch assignment — events scattered across
    batches in arbitrary order (disorder bounded by the watermark delay),
    where the bounded-state fold would miscount. Two far-future sentinel
    files advance the watermark and fire the flush timeouts."""
    import datetime as dt
    import random

    from logstash_forwarder_spark.streaming.sessionize_stream import (
        session_stream_exact,
    )

    t0 = dt.datetime(2026, 3, 1, 8, 0, 0)

    def ev(eid, user, minutes):
        return (eid, t0 + dt.timedelta(minutes=minutes), user)

    rows = [
        ev(1, 1, 0), ev(2, 1, 10), ev(3, 1, 50), ev(4, 1, 55),
        ev(5, 2, 0), ev(6, 2, 31),
        ev(7, 3, 100), ev(8, 3, 100), ev(9, 3, 131),
    ]
    # adversarial delivery: random assignment of events to 3 micro-batches
    rng = random.Random(11)
    files = [[], [], []]
    for r in rows:
        files[rng.randrange(3)].append(r)
    in_dir = str(tmp_path / "ooo_in")
    for chunk in files:
        if chunk:
            spark.createDataFrame(chunk, EV_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(in_dir)
    # sentinels: advance max event time (file A), then let the next batch's
    # watermark (past every real event) fire the flush timers (file B)
    for h in (10, 11):
        spark.createDataFrame(
            [(900 + h, t0 + dt.timedelta(hours=h), -1)], EV_SCHEMA
        ).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    q = (
        session_stream_exact(stream, delay="3 hours")
        .writeStream.format("memory")
        .queryName("ooo_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in spark.sql(
            "SELECT user_id, max_by(n_sessions, n_events) AS n_sessions, "
            "max(n_events) AS n_events FROM ooo_out "
            "WHERE user_id > 0 GROUP BY user_id"
        ).collect()
    }
    assert got == {1: (2, 4), 2: (2, 2), 3: (2, 3)}


def test_session_stream_exact_incremental_finalize(spark, tmp_path):
    """Bounded state in action: with a short watermark delay, events
    finalize (and emit) as the watermark passes them — the buffer never
    holds the whole stream. Assert an INTERMEDIATE emission exists
    (0 < n_events < total) and the final totals match the batch window."""
    import datetime as dt
    import random

    from logstash_forwarder_spark.streaming.sessionize_stream import (
        session_stream_exact,
    )

    t0 = dt.datetime(2026, 3, 1, 8, 0, 0)
    f1 = [(i + 1, t0 + dt.timedelta(minutes=i), 7) for i in range(40)]
    f2 = [(41 + i, t0 + dt.timedelta(minutes=75 + i), 7) for i in range(40)]
    random.Random(5).shuffle(f1)
    random.Random(6).shuffle(f2)
    in_dir = str(tmp_path / "inc_in")
    for chunk in (f1, f2):
        spark.createDataFrame(chunk, EV_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
    for h in (10, 11):
        spark.createDataFrame(
            [(900 + h, t0 + dt.timedelta(hours=h), -1)], EV_SCHEMA
        ).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    q = (
        session_stream_exact(stream, delay="35 minutes")
        .writeStream.format("memory")
        .queryName("inc_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emis = [
        (r.n_sessions, r.n_events)
        for r in spark.sql(
            "SELECT n_sessions, n_events FROM inc_out WHERE user_id = 7"
        ).collect()
    ]
    assert (2, 80) in emis  # final = batch lag window: 2 sessions, 80 events
    assert any(0 < e < 80 for _, e in emis)  # finalized before end of stream
