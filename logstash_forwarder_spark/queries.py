"""Driver-contract query registry: every SURVEY §2 operator as a
(Spark DataFrame impl, DuckDB oracle SQL) pair over /root/testdata tables.

``documents(doc_id:int64, text, lang, source, n_chars)`` plays the role of
the sequences table (FIXTURES.md §7); ``events`` supplies the stream-shaped
surface; ``lineitem`` the heavy aggregate; ``embeddings`` the ANN surface.

Conventions for oracle equality (driver sorts columns by name, hashes
values): every computed column is aliased identically on both sides; integer
outputs are BIGINT on both sides; money math goes through DECIMAL(18,2) so
sums are exact, not float; rankings order by raw columns only (no float
arithmetic before an ORDER BY tiebreak).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .operators.aggregate import last_offset_per_source, salted_agg
from .operators.route import route_stage

# ---------------------------------------------------------------------------
# shared rule/dim definitions (single source of truth for both sides)
# ---------------------------------------------------------------------------

# route table over documents (O-R1); predicates are SQL in BOTH engines
DOC_ROUTES: list[tuple[int, str, str]] = [
    (0, "lang = 'en' AND n_chars > 300", "sink_en_long"),
    (1, "source IN ('src0','src1','src2','src3')", "sink_low"),
    (2, "n_chars % 2 = 0", "sink_even"),
    (3, "true", "sink_default"),
]

# enrich dim (O-P3/O-J1): src0..src14 only → src15..src19 hit the left-join
# null path, coalesced to 'unknown'
DOC_DIM: list[tuple[str, str, str]] = [
    (
        f"src{i}",
        ["syslog", "apache", "app"][i % 3],
        ["prod", "dev"][i % 2],
    )
    for i in range(15)
]


def _routes_case_sql() -> str:
    branches = " ".join(
        f"WHEN {pred} THEN '{sink}'" for _, pred, sink in DOC_ROUTES[:-1]
    )
    return f"CASE {branches} ELSE '{DOC_ROUTES[-1][2]}' END"


def _dim_values_sql() -> str:
    rows = ", ".join(f"('{s}', '{t}', '{e}')" for s, t, e in DOC_DIM)
    return f"(VALUES {rows}) AS dim(source, src_type, env)"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _dim_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(DOC_DIM, "source string, src_type string, env string")


# ---------------------------------------------------------------------------
# queries — parse / enrich / route / aggregate (the pipeline stages)
# ---------------------------------------------------------------------------


def q_parse_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-P1/S2 — grok/regex-style field extraction over payload text."""
    d = _docs(spark, sf_dir)
    n_words = F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "))) + 1
    return d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.regexp_extract("text", r"^([a-z]+)", 1).alias("first_word"),
        F.when(F.col("text").contains("spark"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("has_spark"),
    )


SQL_PARSE_EXTRACT = """
SELECT doc_id,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words,
       regexp_extract(text, '^([a-z]+)', 1) AS first_word,
       CAST(CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END AS BIGINT) AS has_spark
FROM documents
"""


def q_enrich_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-P3/O-J1 — broadcast hash-join enrich, incl. unmatched-source nulls."""
    d = _docs(spark, sf_dir)
    dim = _dim_df(spark)
    return (
        d.join(F.broadcast(dim), "source", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("src_type", F.lit("unknown")).alias("src_type"),
            F.coalesce("env", F.lit("unknown")).alias("env"),
        )
    )


SQL_ENRICH_BROADCAST = f"""
SELECT d.doc_id, d.source,
       coalesce(dim.src_type, 'unknown') AS src_type,
       coalesce(dim.env, 'unknown') AS env
FROM documents d LEFT JOIN {_dim_values_sql()} ON d.source = dim.source
"""


def q_enrich_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich then aggregate per (src_type, env) — the broadcast-join + agg shape."""
    return (
        q_enrich_broadcast(spark, sf_dir)
        .join(_docs(spark, sf_dir).select("doc_id", "n_chars"), "doc_id")
        .groupBy("src_type", "env")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars_total"),
        )
    )


SQL_ENRICH_AGG = f"""
SELECT coalesce(dim.src_type, 'unknown') AS src_type,
       coalesce(dim.env, 'unknown') AS env,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(d.n_chars) AS BIGINT) AS chars_total
FROM documents d LEFT JOIN {_dim_values_sql()} ON d.source = dim.source
GROUP BY 1, 2
"""


def q_route_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-R1 — deterministic rule routing; every row exactly one sink."""
    return route_stage(_docs(spark, sf_dir), DOC_ROUTES).select("doc_id", "sink")


SQL_ROUTE_FANOUT = f"SELECT doc_id, {_routes_case_sql()} AS sink FROM documents"


def q_sink_source_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-A2 + skew salting — per-(sink, source) row counts and char totals."""
    routed = route_stage(_docs(spark, sf_dir), DOC_ROUTES)
    out = salted_agg(
        routed,
        keys=["sink", "source"],
        aggs={
            "row_count": ("count", "doc_id"),
            "chars_total": ("sum", "n_chars"),
            "max_chars": ("max", "n_chars"),
        },
        salt_buckets=16,
    )
    return out.select(
        "sink",
        "source",
        F.col("row_count").cast("long").alias("row_count"),
        F.col("chars_total").cast("long").alias("chars_total"),
        F.col("max_chars").cast("long").alias("max_chars"),
    )


SQL_SINK_SOURCE_COUNTS = f"""
SELECT {_routes_case_sql()} AS sink, source,
       CAST(count(*) AS BIGINT) AS row_count,
       CAST(sum(n_chars) AS BIGINT) AS chars_total,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY 1, 2
"""


def q_registrar_max_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-A1 — the registrar's last-offset-per-source fold (registrar.go:12-29)."""
    return last_offset_per_source(_docs(spark, sf_dir), "doc_id")


SQL_REGISTRAR_MAX_OFFSET = (
    "SELECT source, max(doc_id) AS last_offset FROM documents GROUP BY source"
)


def q_line_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-P2 — per-source line numbering (harvester.go:32,78)."""
    w = W.partitionBy("source").orderBy("doc_id")
    return (
        _docs(spark, sf_dir)
        .select("doc_id", "source", F.row_number().over(w).cast("long").alias("line"))
    )


SQL_LINE_NUMBER = """
SELECT doc_id, source,
       CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS line
FROM documents
"""


def q_dead_time_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 — stale-data predicate pruning (prospector.go:118-140)."""
    return (
        _events(spark, sf_dir)
        .filter(F.col("ts") >= F.lit("2024-01-03 00:00:00").cast("timestamp"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


SQL_DEAD_TIME_FILTER = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
FROM events WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
GROUP BY event_type
"""


def q_resume_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-J2/O-X3 — checkpoint anti-join resume (prospector.go:210-237)."""
    d = _docs(spark, sf_dir)
    ck = d.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    todo = d.join(ck, "doc_id", "left_anti")
    return todo.groupBy("source").agg(F.count(F.lit(1)).alias("n_todo"))


SQL_RESUME_ANTI_JOIN = """
SELECT source, CAST(count(*) AS BIGINT) AS n_todo
FROM documents d
WHERE NOT EXISTS (
  SELECT 1 FROM documents c WHERE c.doc_id % 3 = 0 AND c.doc_id = d.doc_id)
GROUP BY source
"""


def q_spool_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-R2 — spool-size micro-batching (spooler.go:7-62, batch = 1024)."""
    e = _events(spark, sf_dir)
    return (
        e.withColumn("batch_id", F.expr("event_id DIV 1024"))
        .groupBy("batch_id")
        .agg(
            F.count(F.lit(1)).alias("batch_rows"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
    )


SQL_SPOOL_BATCHES = """
SELECT event_id // 1024 AS batch_id,
       CAST(count(*) AS BIGINT) AS batch_rows,
       min(event_id) AS first_event, max(event_id) AS last_event
FROM events GROUP BY 1
"""


def q_kv_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-P5 — K/V frame serialization (publisher1.go:242-248), schema-on-write."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("doc="),
            F.col("doc_id").cast("string"),
            F.lit(";source="),
            F.col("source"),
            F.lit(";n="),
            F.col("n_chars").cast("string"),
        ).alias("kv"),
    )


SQL_KV_SERIALIZE = """
SELECT doc_id,
       'doc=' || CAST(doc_id AS VARCHAR) || ';source=' || source
       || ';n=' || CAST(n_chars AS VARCHAR) AS kv
FROM documents
"""


def q_pricing_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy aggregate (TPC-H Q1 shape) — exact via DECIMAL, not float sums."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("sum_base_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_PRICING_AGG = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_base_price,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming analog — tumbling 1h window aggregate over event time."""
    e = _events(spark, sf_dir)
    return (
        e.withColumn("hour", F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH"))
        .groupBy("hour", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("value_total"),
        )
    )


SQL_EVENTS_HOURLY = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS value_total
FROM events GROUP BY 1, 2
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per type — rank/window shape, integer output."""
    w = W.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        _events(spark, sf_dir)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("event_type", "rank", "event_id")
    )


SQL_TOPK_PER_GROUP = """
SELECT event_type, CAST(rank AS BIGINT) AS rank, event_id FROM (
  SELECT event_type, event_id,
         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rank
  FROM events) WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# the public registry
# ---------------------------------------------------------------------------

_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "parse_extract": (q_parse_extract, SQL_PARSE_EXTRACT),
    "enrich_broadcast": (q_enrich_broadcast, SQL_ENRICH_BROADCAST),
    "enrich_agg": (q_enrich_agg, SQL_ENRICH_AGG),
    "route_fanout": (q_route_fanout, SQL_ROUTE_FANOUT),
    "sink_source_counts": (q_sink_source_counts, SQL_SINK_SOURCE_COUNTS),
    "registrar_max_offset": (q_registrar_max_offset, SQL_REGISTRAR_MAX_OFFSET),
    "line_number": (q_line_number, SQL_LINE_NUMBER),
    "dead_time_filter": (q_dead_time_filter, SQL_DEAD_TIME_FILTER),
    "resume_anti_join": (q_resume_anti_join, SQL_RESUME_ANTI_JOIN),
    "spool_batches": (q_spool_batches, SQL_SPOOL_BATCHES),
    "kv_serialize": (q_kv_serialize, SQL_KV_SERIALIZE),
    "pricing_agg": (q_pricing_agg, SQL_PRICING_AGG),
    "events_hourly": (q_events_hourly, SQL_EVENTS_HOURLY),
    "topk_per_group": (q_topk_per_group, SQL_TOPK_PER_GROUP),
}


def registry() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    return dict(_REGISTRY)
