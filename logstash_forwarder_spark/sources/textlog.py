"""Raw text-log harvesting — the reference's native input format, reborn.

logstash-forwarder's harvester opens each discovered file, reads it line by
line, and tracks the byte offset after every emitted line so the registrar
can resume mid-file (harvester.go:37-79 reads through '\\n';
registrar.go:8-36 persists the post-line offset; prospector.go:24-78 globs
for files). The Spark-native form:

* Discovery = the DataFrame source's glob (``binaryFile`` over a path
  pattern) — S1.
* One file = one row of the binary scan = one task's unit of work, exactly
  the reference's one-harvester-per-file model. Files are the parallelism
  unit; at 100 TB the fleet of log files (thousands) saturates executors
  without any single-file splitting, and no shuffle is needed anywhere —
  line splitting is row-local inside ``mapInArrow``.
* Each line is emitted with its 0-based ``line_no``, the byte offset of
  its first byte (``byte_offset``) and the offset to resume from after it
  (``next_offset`` — the number the reference's registrar writes).
* CRLF is handled the way the reference's readline does (the '\\r' stays
  out of the payload); a final line with no terminating newline is emitted
  with ``is_complete = false`` — the reference would hold it back and
  retry until the newline arrives (harvester.go:141-160), which has no
  batch equivalent, so the flag lets the caller choose.

``resume_harvest`` applies registrar state ((file, resume_offset) pairs —
metadata-sized, broadcast) so a restarted run re-reads only the tail of
each file: the reference's seek-on-resume (registrar state loaded at
harvester start), expressed as a pushed-down filter instead of a seek.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HARVEST_SCHEMA = (
    "file string, line_no long, byte_offset long, next_offset long, "
    "line string, is_complete boolean"
)


def _split_file(path: str, buf: bytes):
    """Split one file's bytes into (line_no, byte_offset, next_offset,
    line, is_complete) tuples. Vectorized newline scan via numpy; per-line
    work is slicing only."""
    import numpy as np

    if not buf:
        return
    arr = np.frombuffer(buf, dtype=np.uint8)
    nl = np.flatnonzero(arr == 0x0A)
    starts = np.concatenate(([0], nl + 1))
    ends = np.concatenate((nl, [len(buf)]))
    if starts[-1] == len(buf):  # file ends with '\n' → no trailing partial
        starts, ends = starts[:-1], ends[:-1]
        trailing_partial = False
    else:
        trailing_partial = True
    n = len(starts)
    for i in range(n):
        s, e = int(starts[i]), int(ends[i])
        complete = not (trailing_partial and i == n - 1)
        body_end = e
        if body_end > s and buf[body_end - 1] == 0x0D:  # CRLF → strip '\r'
            body_end -= 1
        yield (
            i,
            s,
            e + 1 if complete else e,  # resume offset skips the '\n'
            buf[s:body_end].decode("utf-8", errors="replace"),
            complete,
        )


def _maybe_decompress(buf: bytes) -> bytes:
    """Transparent gzip: rotated logs (`app.log.1.gz`, logrotate's output)
    harvest like their plain originals — something the reference never
    could (harvester.go reads raw bytes only). Offsets then index the
    DECOMPRESSED stream: raw gzip is not seekable, so decompressed
    coordinates are the only stable resume contract for such files."""
    if buf[:2] == b"\x1f\x8b":
        import gzip

        return gzip.decompress(buf)
    return buf


def _harvest_kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        paths = batch.column("path").to_pylist()
        contents = batch.column("content")
        files, linenos, offs, nexts, lines, compl = [], [], [], [], [], []
        for row, path in enumerate(paths):
            buf = _maybe_decompress(contents[row].as_py())
            for ln, s, nx, line, ok in _split_file(path, buf):
                files.append(path)
                linenos.append(ln)
                offs.append(s)
                nexts.append(nx)
                lines.append(line)
                compl.append(ok)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(files, pa.string()),
                pa.array(linenos, pa.int64()),
                pa.array(offs, pa.int64()),
                pa.array(nexts, pa.int64()),
                pa.array(lines, pa.string()),
                pa.array(compl, pa.bool_()),
            ],
            names=["file", "line_no", "byte_offset", "next_offset", "line", "is_complete"],
        )


def harvest_text_files(spark, path_glob: str) -> DataFrame:
    """Glob-discover text files and emit one row per line with byte-exact
    offsets (S1 + S2). Column-pruned scan: only path + content are read."""
    raw = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    return raw.mapInArrow(_harvest_kernel, HARVEST_SCHEMA)


def lines_to_sequences(lines: DataFrame, *, vocab: int = 2_147_483_647) -> DataFrame:
    """Bridge harvested lines into the pipeline's sequences shape
    (doc_id, tokens:array<int>, n_tok, source): whitespace tokens hashed to
    stable int32 ids (xxhash64 mod vocab), doc_id = file:line_no (the
    reference's (path, offset) event identity, harvester.go:68-78), source =
    file stem. Incomplete trailing lines are excluded — the reference never
    ships a line before its newline arrives.

    Log lines are short, so the interpreted-HOF cost of ``transform`` is
    per-ingest negligible here; bulk token work stays in the Arrow kernels
    (operators/parse.py) downstream.
    """
    words = F.filter(F.split("line", r"\s+"), lambda w: w != F.lit(""))
    tokens = F.transform(
        words, lambda w: F.pmod(F.xxhash64(w), F.lit(vocab)).cast("int")
    )
    return lines.filter("is_complete").select(
        F.concat_ws(":", "file", F.col("line_no").cast("string")).alias("doc_id"),
        tokens.alias("tokens"),
        F.size(tokens).cast("int").alias("n_tok"),
        F.regexp_extract("file", r"([^/]+?)(?:\.[^./]*)?(?:\.gz)?$", 1).alias(
            "source"
        ),
    )


_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def harvest_text_stream(
    spark, path_glob: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming form of the harvester — the prospector's discovery loop
    (prospector.go:24-78: rescan the glob, start a harvester per new file)
    as a Structured Streaming file source: each newly-appearing file becomes
    one micro-batch row, split by the same kernel. The source's checkpoint
    remembers processed files, so a restart never re-harvests — the
    registrar's never-twice contract at file granularity. (Files are
    immutable once written, per the engine's data model — SURVEY §2.1;
    growing-file tailing has no Spark-source analog and is out of scope.)
    """
    reader = spark.readStream.format("binaryFile").schema(_BINARY_FILE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.load(path_glob).select("path", "content")
    return raw.mapInArrow(_harvest_kernel, HARVEST_SCHEMA)


def resume_harvest(harvested: DataFrame, offsets: DataFrame) -> DataFrame:
    """Drop lines already shipped per registrar state.

    ``offsets``: (file, resume_offset) — the max ``next_offset`` the
    registrar recorded per file. Registrar state is metadata-sized (one row
    per file), so it broadcasts; unseen files pass through whole (left join
    null → offset 0), mirroring the reference's start-at-zero for new files
    (registrar resume in logstash-forwarder.go:78-96).
    """
    o = offsets.select(
        "file", F.col("resume_offset").cast("long").alias("_resume")
    )
    return (
        harvested.join(F.broadcast(o), "file", "left")
        .filter(F.col("byte_offset") >= F.coalesce(F.col("_resume"), F.lit(0)))
        .drop("_resume")
    )
