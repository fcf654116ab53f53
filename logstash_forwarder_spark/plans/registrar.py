"""The registrar reborn — checkpoint/lineage metadata table (O-X1..O-X4).

The reference persists ``map[source]FileState`` as JSON via
write-temp-then-atomic-rename (/root/reference/registrar.go:38-51,
registrar_other.go:9-15) and, only after the ack, folds acked events into it
(/root/reference/publisher1.go:126). Here the same trick backs a parquet
metadata table: each sink commit appends one immutable parquet file of
per-partition lineage rows, published with ``os.replace`` (atomic on POSIX).
Iceberg's metadata swap would give this for free; the parquet+rename
fallback keeps the identical interface without the runtime jar (SURVEY
§7.3 hard part 5).

Crucially the commit ordering is the *reverse* of the reference's bug
surface: the reference acks then writes state (duplicate window on crash,
SURVEY §3.4) — we publish data atomically first and the checkpoint row
second, and resume treats an unreferenced published dir as garbage to
delete-and-redo, so routed-row delivery is exactly-once.
"""

from __future__ import annotations

import os
import re
import uuid
from dataclasses import dataclass
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

_ARROW_SCHEMA = pa.schema(
    [
        pa.field("run_id", pa.string(), nullable=False),
        pa.field("sink", pa.string(), nullable=False),
        pa.field("partition_id", pa.int32(), nullable=False),
        pa.field("row_count", pa.int64(), nullable=False),
        pa.field("token_total", pa.int64(), nullable=False),
        pa.field("committed_at", pa.timestamp("us", tz="UTC"), nullable=False),
    ]
)


@dataclass(frozen=True)
class LineageRow:
    partition_id: int
    row_count: int
    token_total: int


def _safe(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]", "_", name)


class Registrar:
    """Parquet-dir-backed checkpoint table. One file per (run_id, sink) commit."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- write side (driver-only, metadata-sized) ---------------------------

    def commit(self, run_id: str, sink: str, lineage: list[LineageRow]) -> str:
        """Atomically record a sink commit. Idempotent: re-commit overwrites."""
        now = datetime.now(timezone.utc)
        table = pa.Table.from_pydict(
            {
                "run_id": [run_id] * len(lineage),
                "sink": [sink] * len(lineage),
                "partition_id": [r.partition_id for r in lineage],
                "row_count": [r.row_count for r in lineage],
                "token_total": [r.token_total for r in lineage],
                "committed_at": [now] * len(lineage),
            },
            schema=_ARROW_SCHEMA,
        )
        final = os.path.join(self.path, self._commit_name(run_id, sink))
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}.parquet")
        pq.write_table(table, tmp)
        os.replace(tmp, final)  # registrar_other.go:9-15, reborn
        return final

    def commit_file(self, run_id: str, sink: str, src_path: str) -> str:
        """Atomically adopt an executor-written lineage parquet file as this
        (run_id, sink)'s commit — the zero-driver-materialization path: the
        lineage rows never exist driver-side, only the rename does.
        Idempotent like commit(): re-adoption overwrites."""
        final = os.path.join(self.path, self._commit_name(run_id, sink))
        os.replace(src_path, final)
        return final

    @staticmethod
    def _commit_name(run_id: str, sink: str) -> str:
        """Collision-free commit filename: readable prefix + hash of the RAW
        (run_id, sink) pair. Prefix-only naming collided for pairs differing
        in characters the sanitizer mangles (e.g. 'r__x'/'y' vs 'r'/'x__y')."""
        import hashlib

        h = hashlib.sha256(f"{run_id}\x00{sink}".encode()).hexdigest()[:16]
        return f"{_safe(run_id)[:32]}__{_safe(sink)[:32]}__{h}.parquet"

    # -- read side -----------------------------------------------------------

    def _files(self) -> list[str]:
        return [
            os.path.join(self.path, f)
            for f in sorted(os.listdir(self.path))
            if f.endswith(".parquet") and not f.startswith(".tmp-")
        ]

    def committed_sinks(self, run_id: str) -> set[str]:
        """O-X3 resume input: which sinks of this run are already done."""
        done: set[str] = set()
        for f in self._files():
            t = pq.read_table(f, columns=["run_id", "sink"])
            for rid, sink in zip(
                t.column("run_id").to_pylist(), t.column("sink").to_pylist()
            ):
                if rid == run_id:
                    done.add(sink)
        return done

    @staticmethod
    def _read_commit(f: str) -> pa.Table:
        """Read one commit file normalized to the registrar schema — commit
        files come from two writers (driver pyarrow for empty sinks,
        executor Spark for data sinks) whose physical types differ slightly
        (e.g. timestamp unit/tz), so cast on read."""
        t = pq.read_table(f)
        return t.select([f_.name for f_ in _ARROW_SCHEMA]).cast(_ARROW_SCHEMA)

    def lineage(self, run_id: str | None = None) -> pa.Table:
        files = self._files()
        if not files:
            return _ARROW_SCHEMA.empty_table()
        t = pa.concat_tables([self._read_commit(f) for f in files])
        if run_id is not None:
            import pyarrow.compute as pc

            t = t.filter(pc.equal(t.column("run_id"), run_id))
        return t

    def load(self, spark: SparkSession) -> DataFrame:
        """The checkpoint table as a DataFrame (for anti-join resume plans)."""
        from ..schema import CHECKPOINT_SCHEMA

        files = self._files()
        if not files:
            return spark.createDataFrame([], CHECKPOINT_SCHEMA)
        return spark.read.schema(CHECKPOINT_SCHEMA).parquet(*files)
