"""Driver-window rotation order, COMPUTED from the CORRECTNESS history.

The driver's DuckDB gate verifies only the FIRST 50 entries of the
registry ("window"). Through round 6 the window order was hand-maintained
in the ``_REGISTRY`` literal and verified after the fact by
``tools/check_rotation.py`` — which guaranteed the suite went red the
moment the driver wrote a new CORRECTNESS_r*.json (the order that was
correct for round N is stale for round N+1; VERDICT r6 "What's wrong #1").

This module makes the order *generated*: ``rotation_order`` sorts the
declared registry names by last-driver-checked round ascending
(never-checked first), with the declaration order as the deterministic
tiebreak within a staleness class. ``registry()`` applies it at call
time, so:

  * a brand-new query (no driver row anywhere) always enters the window;
  * the 50 stalest entries are always the window — every entry gets a
    driver row at least every ceil(N/50) rounds;
  * when the driver lands CORRECTNESS_r{N}.json, the next ``registry()``
    call re-derives the order from the enlarged history — there is no
    hand-maintained order left to go stale.

``tools/check_rotation.py`` remains as an independent verifier of the
invariants (it checks the *emitted* order against the history with its
own logic, not this sort).
"""

from __future__ import annotations

import glob
import json
import os

#: Number of leading registry entries the driver's correctness gate runs.
WINDOW = 50

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_history(repo_root: str | None = None) -> dict[str, int]:
    """name -> last round with a driver row.

    Rows-only entries count: the driver recorded ``spark_rows`` even when
    ``err == 'no_oracle'`` (minhash_lsh / simhash / incremental_dedup).
    """
    root = repo_root or _REPO_ROOT
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        base = os.path.basename(path)
        try:
            rnd = int(base[len("CORRECTNESS_r") : -len(".json")])
        except ValueError:
            continue
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if row.get("spark_rows") is not None or row.get("rows_match") is not None:
                last[name] = max(last.get(name, 0), rnd)
    return last


def rotation_order(
    names: list[str], history: dict[str, int] | None = None
) -> list[str]:
    """Stable staleness sort: never-driver-checked (round 0) first, then
    oldest-last-checked; declaration order breaks ties within a round
    class so the result is deterministic for a given history."""
    last = load_history() if history is None else history
    decl = {n: i for i, n in enumerate(names)}
    return sorted(names, key=lambda n: (last.get(n, 0), decl[n]))
