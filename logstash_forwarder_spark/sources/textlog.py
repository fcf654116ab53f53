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


def _split_file_arrays(buf: bytes):
    """Split one file's bytes into parallel per-line arrays
    (line_no:int64, byte_offset:int64, next_offset:int64,
    lines:pa.StringArray, is_complete:bool) with NO per-line Python.

    Newline scan, offset vectors, single-'\\r' CRLF strip and the line
    bodies themselves are all bulk numpy/Arrow ops: the bodies are gathered
    into one compacted values buffer in a single fancy-index pass and
    wrapped zero-copy as a ``pa.StringArray`` via (offsets, values)
    buffers — the same values/offsets technique as the parse kernels
    (operators/parse.py). Returns None for an empty file.
    """
    import numpy as np
    import pyarrow.compute as pc

    if not buf:
        return None
    arr = np.frombuffer(buf, dtype=np.uint8)
    nl = np.flatnonzero(arr == 0x0A).astype(np.int64)
    starts = np.concatenate(([0], nl + 1))
    ends = np.concatenate((nl, [np.int64(len(buf))]))
    trailing_partial = bool(starts[-1] != len(buf))
    if not trailing_partial:  # file ends with '\n' → no trailing partial
        starts, ends = starts[:-1], ends[:-1]
    n = len(starts)
    if n == 0:
        return None
    complete = np.ones(n, dtype=bool)
    if trailing_partial:
        complete[-1] = False
    nexts = ends + complete  # resume offset skips the '\n' (complete only)
    # CRLF: strip exactly ONE '\r' immediately before each '\n' (reference
    # readline semantics — harvester.go strips the \r of \r\n, never
    # interior or doubled \r). Vectorized: a boolean-mask rewrite of the
    # buffer, taken ONLY when such a '\r' exists (unix logs skip it).
    crlf_pos = nl[(nl > 0) & (arr[np.maximum(nl - 1, 0)] == 0x0D)] - 1
    if trailing_partial and arr[-1] == 0x0D:
        # a partial tail ending in '\r' also sheds that one byte (it is the
        # start of a CRLF whose '\n' hasn't arrived yet)
        crlf_pos = np.concatenate((crlf_pos, [np.int64(len(arr) - 1)]))
    if len(crlf_pos):
        keep = np.ones(len(arr), dtype=bool)
        keep[crlf_pos] = False
        arr_split = np.ascontiguousarray(arr[keep])
    else:
        arr_split = arr
    # line bodies via Arrow's C++ split (per-line memcpy — ~7x faster than
    # a per-byte numpy gather on this box): wrap the buffer zero-copy as a
    # 1-element binary array, split on '\n', flatten.
    one = pa.BinaryArray.from_buffers(
        pa.binary(),
        1,
        [
            None,
            pa.py_buffer(np.array([0, len(arr_split)], dtype=np.int32)),
            pa.py_buffer(arr_split),
        ],
    )
    flat = pc.list_flatten(pc.split_pattern(one, b"\n"))
    if not trailing_partial:
        flat = flat.slice(0, n)  # drop the empty element after the last '\n'
    try:
        lines = flat.cast(pa.string())  # validates UTF-8 in C++
    except pa.ArrowInvalid:
        # invalid UTF-8 somewhere in the file: rare path, preserve the
        # decode-replace semantics per line (U+FFFD for bad bytes)
        lines = pa.array(
            [b.decode("utf-8", errors="replace") for b in flat.to_pylist()],
            pa.string(),
        )
    return np.arange(n, dtype=np.int64), starts, nexts, lines, complete


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
    """Per-batch: one vectorized split per file (Python touches each FILE
    once, never each line), then a single concat per column. The file
    column is a dictionary gather (np.repeat of path indices) cast to
    string in C++ — no per-line Python objects anywhere."""
    import numpy as np
    import pyarrow.compute as pc

    for batch in batches:
        paths = batch.column("path").to_pylist()
        contents = batch.column("content")
        per_file = []  # (path_idx, line_no, byte_offset, next_offset, lines, complete)
        for row, path in enumerate(paths):
            buf = _maybe_decompress(contents[row].as_py())
            split = _split_file_arrays(buf)
            if split is not None:
                per_file.append((row, *split))
        if not per_file:
            yield pa.RecordBatch.from_arrays(
                [pa.array([], t) for t in
                 (pa.string(), pa.int64(), pa.int64(), pa.int64(), pa.string(), pa.bool_())],
                names=["file", "line_no", "byte_offset", "next_offset", "line", "is_complete"],
            )
            continue
        counts = np.array([len(p[1]) for p in per_file], dtype=np.int64)
        path_idx = np.repeat(
            np.array([p[0] for p in per_file], dtype=np.int32), counts
        )
        file_col = pc.take(batch.column("path"), pa.array(path_idx))
        yield pa.RecordBatch.from_arrays(
            [
                file_col.combine_chunks() if isinstance(file_col, pa.ChunkedArray) else file_col,
                pa.array(np.concatenate([p[1] for p in per_file])),
                pa.array(np.concatenate([p[2] for p in per_file])),
                pa.array(np.concatenate([p[3] for p in per_file])),
                pa.concat_arrays([p[4] for p in per_file]),
                pa.array(np.concatenate([p[5] for p in per_file])),
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
