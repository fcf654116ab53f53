"""JSON-lines event source — structured-log ingestion alongside textlog.py.

The reference ships raw text lines plus config-declared static fields
(config.go "fields"); modern shippers emit structured JSON events. The
Spark-native form is the built-in json reader (JVM-side Jackson parse,
schema projection pushed into the scan — no Python in the hot path):

* explicit schema ALWAYS (``schema(ddl).json(glob)``): schema inference is
  a full extra pass over 100 TB and type-unstable across batches;
* PERMISSIVE + ``_corrupt_record``: a malformed line becomes one flagged
  row instead of killing the scan or silently vanishing — at corpus scale
  there is always a torn line, and dropping it silently is data loss while
  failing the job on it is an outage. Callers split the relation on
  ``_corrupt_record IS NULL`` into clean events and a quarantine stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_json_events(spark, path_glob: str, schema_ddl: str) -> DataFrame:
    """Read JSONL files under an explicit schema; malformed lines surface
    as rows where every schema field is NULL and ``_corrupt_record`` holds
    the raw line."""
    return (
        spark.read.schema(f"{schema_ddl}, {CORRUPT_COL} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path_glob)
    )


def split_corrupt(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_events_without_corrupt_col, quarantine_rows).

    Quarantine keeps the schema fields alongside ``raw`` — partial parses
    are useful forensics, and Spark refuses a query whose referenced
    columns are ONLY the corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)."""
    clean = events.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = events.filter(F.col(CORRUPT_COL).isNotNull()).withColumnRenamed(
        CORRUPT_COL, "raw"
    )
    return clean, quarantine
