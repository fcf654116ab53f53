"""Custom stateful streaming operator: the registrar as live state.

The reference's registrar folds acked events into an in-memory
``map[source]FileState`` as the stream flows (/root/reference/
registrar.go:8-36). Structured Streaming's ``applyInPandasWithState`` is the
idiomatic Spark home for exactly that shape: state is partitioned by key
(``source``), updated per micro-batch with an Arrow-vectorized function, and
checkpointed by the engine.

``running_source_totals`` keeps (row_count, token_total, last_doc_id) per
source and emits the updated totals every batch — per-source watermark-free
monotone state, the streaming twin of operators/aggregate.py's O-A1.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "source string, row_count long, token_total long, last_doc_id string"
)
STATE_SCHEMA = "row_count long, token_total long, last_doc_id string"


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    rows, toks, last_doc = (
        state.get if state.exists else (0, 0, "")
    )
    for pdf in pdfs:
        rows += len(pdf)
        toks += int(pdf["n_tok"].sum())
        if len(pdf):
            m = pdf["doc_id"].max()
            last_doc = max(last_doc, m) if last_doc else m
    state.update((rows, toks, last_doc))
    yield pd.DataFrame(
        {
            "source": [key[0]],
            "row_count": [rows],
            "token_total": [toks],
            "last_doc_id": [last_doc],
        }
    )


def running_source_totals(stream_df):
    """Per-source running totals over a stream of sequences rows."""
    return (
        stream_df.groupBy("source")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
