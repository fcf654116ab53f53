"""Gate the registry's driver-window rotation invariant (ceil(N/50)-round
staleness-ordered schedule, queries.py registry docstring).

No Spark session needed — pure registry-order + CORRECTNESS history check.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import check_rotation  # noqa: E402

from logstash_forwarder_spark.queries import registry

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_rotation_schedule_holds():
    names = list(registry())
    last = check_rotation.load_history(REPO_ROOT)
    errors = check_rotation.check(names, last)
    assert not errors, "\n".join(errors)


def test_never_checked_entries_fit_in_window():
    names = list(registry())
    last = check_rotation.load_history(REPO_ROOT)
    never = [n for n in names if n not in last]
    assert len(never) <= check_rotation.WINDOW, (
        f"{len(never)} never-driver-checked entries cannot all fit in one "
        f"{check_rotation.WINDOW}-slot window — stop adding queries until "
        f"the backlog drains"
    )


def test_rotation_survives_new_correctness_artifact():
    """Round-entry redness must be structurally impossible (VERDICT r6
    task 1): simulate the driver landing a NEW CORRECTNESS artifact that
    greens exactly the current window, re-derive the order from the
    augmented history, and assert the invariants still hold — i.e. the
    next round's window rotates to the stalest tail automatically."""
    from logstash_forwarder_spark.rotation import WINDOW, rotation_order

    last = check_rotation.load_history(REPO_ROOT)
    names = list(registry())
    current_window = names[:WINDOW]
    future_round = max(last.values(), default=0) + 1
    augmented = dict(last)
    for n in current_window:
        augmented[n] = future_round

    next_names = rotation_order(list(registry()), augmented)
    errors = check_rotation.check(next_names, augmented)
    assert not errors, "\n".join(errors)
    # the freshly-checked entries must have left the window (unless the
    # registry is small enough that everything fits)
    next_window = set(next_names[:WINDOW])
    if len(names) > 2 * WINDOW:
        assert not (next_window & set(current_window)), (
            "entries driver-checked this round re-entered next round's "
            "window ahead of staler entries"
        )


def test_rotation_window_leads_with_stalest():
    """The emitted window must be exactly the 50 stalest entries (ties
    broken by declaration order) — the property the driver relies on."""
    from logstash_forwarder_spark.rotation import WINDOW

    names = list(registry())
    last = check_rotation.load_history(REPO_ROOT)
    window_rounds = [last.get(n, 0) for n in names[:WINDOW]]
    tail_rounds = [last.get(n, 0) for n in names[WINDOW:]]
    if tail_rounds:
        assert max(window_rounds) <= min(tail_rounds)
