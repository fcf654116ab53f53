"""Weak-scaling evidence — the second scaling axis: constant work PER
CORE instead of constant total work. (local[1], 250k rows) vs
(local[4], 1M rows) should complete in the SAME wall time if the
pipeline has no serial stage and no super-linear shuffle cost; the
ratio lo_wall / hi_wall is the weak efficiency (1.0 = perfect).

Reuses BENCH/scaling.py's fresh-process, worker-warmed, steal- and
consensus-gated runner so the numbers obey the same honesty protocol as
the strong-scaling curve.

Usage: python BENCH/weak_scaling.py [--rows-per-core 250000]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "strong_scaling", os.path.join(REPO, "BENCH", "scaling.py")
)
_scaling = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_scaling)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-per-core", type=int, default=250_000)
    ap.add_argument("--pair", default="1,4")
    args = ap.parse_args()
    lo_cores, hi_cores = (int(c) for c in args.pair.split(","))

    lo = _scaling.run_at(
        lo_cores, _scaling.ensure_input(args.rows_per_core * lo_cores)
    )
    print(json.dumps(lo), flush=True)
    hi = _scaling.run_at(
        hi_cores, _scaling.ensure_input(args.rows_per_core * hi_cores)
    )
    print(json.dumps(hi), flush=True)
    print(
        json.dumps(
            {
                "weak_pair": [
                    [lo_cores, args.rows_per_core * lo_cores],
                    [hi_cores, args.rows_per_core * hi_cores],
                ],
                "lo": lo,
                "hi": hi,
                "weak_efficiency": round(lo["sec"] / hi["sec"], 3),
            }
        )
    )


if __name__ == "__main__":
    main()
