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
