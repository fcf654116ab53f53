"""Evidence-integrity gate (VERDICT r7 "What's wrong" #1): every BENCH
artifact cited from the docs must exist and be NON-EMPTY. Round 7 shipped
COVERAGE.md citing BENCH/remeasure_r7.log for specific consensus numbers
while the committed file was 0 bytes — numbers an empty file cannot
support. This test makes that class of drift impossible to re-commit."""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# docs whose BENCH/ citations are evidence claims
CITING_DOCS = ["COVERAGE.md", "BASELINE.md", "README.md", "OPTIMIZATION_r08.md"]
CITE_RE = re.compile(r"BENCH/[A-Za-z0-9_.-]+\.(?:log|json)")


def _cited() -> set[str]:
    out: set[str] = set()
    for doc in CITING_DOCS:
        p = os.path.join(REPO, doc)
        if not os.path.exists(p):
            continue
        with open(p) as fh:
            out.update(CITE_RE.findall(fh.read()))
    return out


def test_cited_bench_artifacts_exist_and_are_nonempty():
    cited = _cited()
    assert cited, "citation scan found nothing — regex or doc set broken?"
    missing = [c for c in cited if not os.path.exists(os.path.join(REPO, c))]
    empty = [
        c
        for c in cited
        if os.path.exists(os.path.join(REPO, c))
        and os.path.getsize(os.path.join(REPO, c)) == 0
    ]
    assert not missing, f"docs cite BENCH artifacts that do not exist: {missing}"
    assert not empty, f"docs cite EMPTY (0-byte) BENCH artifacts: {empty}"
