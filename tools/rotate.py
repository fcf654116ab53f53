"""Print the GENERATED driver-window rotation (VERDICT r6 task 1).

Since round 7 the registry order is computed, not hand-maintained:
``queries.registry()`` sorts the declared entries stalest-first from the
CORRECTNESS_r*.json history (logstash_forwarder_spark/rotation.py), so
there is nothing to rewrite — this CLI shows the order the driver will
see this round and the staleness class of every entry.

Usage: python tools/rotate.py   (from anywhere; paths are repo-relative)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logstash_forwarder_spark.rotation import WINDOW, load_history  # noqa: E402


def main() -> int:
    from logstash_forwarder_spark.queries import registry

    last = load_history()
    names = list(registry())
    window, tail = names[:WINDOW], names[WINDOW:]
    print(f"registry: {len(names)} entries; driver window = first {WINDOW}")
    print("\n== window (driver-gated this round) ==")
    for n in window:
        cls = f"r{last[n]}" if n in last else "never"
        print(f"  {cls:>6}  {n}")
    print("\n== tail (due in later rounds, stalest first) ==")
    for n in tail:
        print(f"  r{last[n]:<5} {n}")
    classes: dict[str, int] = {}
    for n in window:
        cls = f"r{last[n]}" if n in last else "never"
        classes[cls] = classes.get(cls, 0) + 1
    print(f"\nwindow composition: {classes}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
