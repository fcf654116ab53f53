"""JSONL structured-event source: explicit-schema read, corrupt-record
quarantine (a torn line is flagged, never dropped or fatal)."""

from __future__ import annotations

from logstash_forwarder_spark.sources.jsonlog import (
    read_json_events,
    split_corrupt,
)


def test_json_events_and_quarantine(spark, tmp_path):
    p = tmp_path / "ev"
    p.mkdir()
    (p / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en"}\n'
        '{"doc_id": 2, "text": "uni\\u00e7ode \\n escape", "lang": "fr"}\n'
        '{"doc_id": 3, "text": "torn line, no close \n'
        '{"doc_id": 4, "text": "fine", "lang": "en"}\n'
    )
    events = read_json_events(
        spark, f"{p}/*.jsonl", "doc_id long, text string, lang string"
    )
    clean, quarantine = split_corrupt(events)
    rows = {r.doc_id: r for r in clean.collect()}
    assert set(rows) == {1, 2, 4}
    # JSON escape round-trip is exact, including the embedded newline
    assert rows[2].text == "uniçode \n escape"
    q = quarantine.collect()
    assert len(q) == 1 and q[0].raw.startswith('{"doc_id": 3')


def test_json_schema_is_pruned_into_scan(spark, tmp_path):
    p = tmp_path / "ev2"
    p.mkdir()
    (p / "b.jsonl").write_text('{"doc_id": 9, "text": "x", "lang": "en"}\n')
    events = read_json_events(
        spark, f"{p}/*.jsonl", "doc_id long, text string, lang string"
    )
    clean, _ = split_corrupt(events)
    plan = clean.select("doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" not in plan or "text" not in plan.split("ReadSchema")[1][:200]
