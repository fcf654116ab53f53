from __future__ import annotations

from logstash_forwarder_spark.benchutil import best, read_steal_jiffies, timed_trials


def test_read_steal_jiffies_monotone():
    a = read_steal_jiffies()
    b = read_steal_jiffies()
    assert b >= a >= 0


def test_timed_trials_and_best():
    calls = []
    trials = timed_trials(lambda: calls.append(1), n_trials=3, steal_gate=None)
    assert len(trials) == 3 and len(calls) == 3
    for t in trials:
        assert t["sec"] >= 0 and "steal_frac" in t
    assert best(trials)["sec"] == min(t["sec"] for t in trials)


def test_agree_keeps_sampling_until_consensus():
    # first sample is 4× the rest (simulated contention): with agree=0.2
    # the loop must take a third sample so the two FASTEST quiet samples
    # agree; without agree it would have stopped at n_trials=2
    import time

    durations = iter([0.4, 0.1, 0.1, 0.1, 0.1])
    trials = timed_trials(
        lambda: time.sleep(next(durations)),
        n_trials=2,
        steal_gate=None,
        agree=0.2,
        max_attempts=5,
    )
    assert len(trials) == 3
    secs = sorted(t["sec"] for t in trials)
    assert secs[1] <= secs[0] * 1.2


def test_agree_satisfied_immediately_stops_at_n():
    trials = timed_trials(
        lambda: None, n_trials=2, steal_gate=None, agree=0.5, max_attempts=5
    )
    assert len(trials) == 2


def test_steal_gate_caps_attempts():
    # an impossible gate: every sample is "noisy", loop must stop at 3×n
    trials = timed_trials(lambda: None, n_trials=2, steal_gate=-1.0)
    assert len(trials) == 6
    assert all(t.get("gated") for t in trials)


def test_consensus_over_accumulated_blocks():
    from logstash_forwarder_spark.benchutil import consensus_over

    # one storm-poisoned block: everything gated -> no certification
    block1 = [{"sec": 30.0, "gated": True}, {"sec": 28.0, "gated": True}]
    assert not consensus_over(block1)
    # a later quiet block certifies on the ACCUMULATED evidence
    block2 = [{"sec": 8.1}, {"sec": 8.4}]
    assert consensus_over(block1 + block2)
    # two quiet samples too far apart (the round-2 2.2x case) do not
    assert not consensus_over([{"sec": 8.1}, {"sec": 18.0}])
    # a single quiet sample is never consensus
    assert not consensus_over([{"sec": 8.1}, {"sec": 30.0, "gated": True}])
