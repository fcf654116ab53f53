"""Single source of truth for the repo's headline counts (VERDICT r6
task 5 / r5 item 8).

Computes, from the suite and the gate themselves (never typed from
memory):

* ``registry_total``      — entries in queries.registry()
* ``with_oracle``         — entries carrying a DuckDB oracle (the gate's
                            OK population)
* ``rows_only``           — entries with no oracle by design (the gate's
                            ROWS-ONLY population)
* ``tests_collected``     — pytest --collect-only count over tests/
* ``rotation_bound``      — ceil(registry_total / WINDOW) round bound

``python tools/counts.py`` prints the JSON; ``--write`` refreshes the
committed ``COUNTS.json`` at the repo root. README.md / COVERAGE.md /
CLAUDE.md cite COUNTS.json instead of inline numbers;
tests/test_counts.py asserts the committed file matches a fresh
computation, so the doc-count drift class ("393 vs 392") is
structurally impossible.
"""

from __future__ import annotations

import json
import math
import os
import re
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

COUNTS_PATH = os.path.join(REPO_ROOT, "COUNTS.json")


def registry_counts() -> dict[str, int]:
    from logstash_forwarder_spark.queries import registry
    from logstash_forwarder_spark.rotation import WINDOW

    reg = registry()
    total = len(reg)
    with_oracle = sum(1 for _, sql in reg.values() if sql is not None)
    return {
        "registry_total": total,
        "with_oracle": with_oracle,
        "rows_only": total - with_oracle,
        "rotation_window": WINDOW,
        "rotation_bound_rounds": math.ceil(total / WINDOW),
    }


def collected_tests() -> int:
    """pytest --collect-only -q over tests/ (no Spark session is started
    at collection time; ~2 s)."""
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=REPO_ROOT,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    m = re.search(r"(\d+) tests collected", out)
    if not m:
        raise RuntimeError(f"could not parse pytest collection output:\n{out[-500:]}")
    return int(m.group(1))


def compute() -> dict[str, int]:
    counts = registry_counts()
    counts["tests_collected"] = collected_tests()
    return counts


def main(argv: list[str]) -> int:
    counts = compute()
    line = json.dumps(counts, indent=1, sort_keys=True) + "\n"
    if "--write" in argv:
        with open(COUNTS_PATH, "w") as fh:
            fh.write(line)
        print(f"wrote {COUNTS_PATH}")
    print(line, end="")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
