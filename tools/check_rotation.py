"""Verify the registry's driver-window rotation invariant.

The driver's CORRECTNESS gate checks only the FIRST 50 registry entries
(window). With N total entries the schedule guarantees a driver row for
every entry at least every ceil(N/50) rounds, PROVIDED the registry keeps
the staleness order: every entry outside the window must have been
driver-checked at least as recently as the stalest threshold, and no
never-checked entry may sit outside the window.

Checked invariants (against the CORRECTNESS_r*.json history on disk):
  1. Every entry with NO driver row in any round is inside the window.
  2. No entry outside the window is staler (older last-checked round)
     than the newest last-checked round found inside the window, except
     entries the window simply cannot fit this round (the overflow), which
     must be the FIRST entries after the cut so they enter next round.
     Concretely: the tail must be ordered by last-checked round ascending
     (never < r4 < r5 ...), allowing arbitrary order within a round class.

Exit 0 and a one-line summary when the order is valid; exit 1 with the
violations otherwise. Run from the repo root.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logstash_forwarder_spark.rotation import (  # noqa: E402
    WINDOW,
    load_history,
)


def check(names: list[str], last: dict[str, int]) -> list[str]:
    errors: list[str] = []
    window = names[:WINDOW]
    tail = names[WINDOW:]
    never_out = [n for n in tail if n not in last]
    if never_out:
        errors.append(f"never-driver-checked entries outside the window: {never_out}")
    # tail must be non-decreasing in last-checked round (never == 0)
    rounds = [last.get(n, 0) for n in tail]
    for i in range(1, len(rounds)):
        if rounds[i] < rounds[i - 1]:
            errors.append(
                f"tail staleness order violated at {tail[i]!r} (last r{rounds[i]}) "
                f"after {tail[i - 1]!r} (last r{rounds[i - 1]})"
            )
            break
    # the stalest tail class must not be staler than anything we chose to
    # keep OUT of the window while the window holds fresher entries: every
    # window slot must be <= the stalest tail entry's round, except entries
    # that are new/changed this round (no history -> round 0, always ok).
    if tail:
        stalest_tail = min(last.get(n, 0) for n in tail)
        too_fresh = [
            n for n in window if last.get(n, 0) > stalest_tail
        ]
        if too_fresh:
            errors.append(
                f"window holds fresher entries than the stalest tail (r{stalest_tail}): "
                f"{too_fresh}"
            )
    return errors


def main() -> int:
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from logstash_forwarder_spark.queries import registry

    names = list(registry())
    last = load_history(repo_root)
    errors = check(names, last)
    n = len(names)
    bound = math.ceil(n / WINDOW)
    if errors:
        for e in errors:
            print("ROTATION VIOLATION:", e)
        return 1
    print(
        f"rotation ok: {n} entries, window {WINDOW}, every entry driver-checked "
        f"at least every {bound} rounds; window composition: "
        f"{sum(1 for x in names[:WINDOW] if x not in last)} never + "
        f"{sum(1 for x in names[:WINDOW] if x in last)} stale re-checks"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
