"""Gate the committed COUNTS.json against a fresh computation — the
single-source-of-truth contract (tools/counts.py): README/COVERAGE cite
COUNTS.json, this test makes a stale commit impossible."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import counts  # noqa: E402


def test_counts_json_matches_fresh_computation():
    assert os.path.exists(counts.COUNTS_PATH), (
        "COUNTS.json missing — run `python tools/counts.py --write`"
    )
    with open(counts.COUNTS_PATH) as fh:
        committed = json.load(fh)
    fresh = counts.compute()
    assert committed == fresh, (
        "COUNTS.json is stale — run `python tools/counts.py --write` "
        f"(committed={committed}, fresh={fresh})"
    )


def test_registry_split_adds_up():
    c = counts.registry_counts()
    assert c["with_oracle"] + c["rows_only"] == c["registry_total"]
    assert c["rows_only"] <= 5, (
        "rows-only entries should stay a small, documented set "
        "(minhash_lsh / simhash / incremental_dedup)"
    )
