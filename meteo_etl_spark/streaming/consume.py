"""The streaming consumer (ST1-ST4): fetch events → silver merge.

Structured-Streaming re-expression of the reference's poll loop
(`streaming/consumer.py:44-135`):

- **bounded intake / graceful stop** (ST1): ``trigger(availableNow)``
  drains what exists and stops — the `max_messages` analogue;
  continuous mode is the same query with a processing-time trigger.
- **at-least-once + idempotent sink = effectively exactly-once**
  (ST2): the checkpoint commits source offsets only after the batch
  succeeds; re-delivered events re-run the keyed MERGE, which is
  idempotent on (latitude, longitude, timestamp).
- **poison-pill skip** (ST3): events that fail PERMISSIVE parsing
  surface as null structs, are appended to the dead-letter dir, and
  their offsets still commit (skip-forever). A *job* failure raises,
  the batch aborts, nothing commits — redelivery (reference
  `streaming/consumer.py:122-134`).
- **transport error frames** (ST4) are handled inside the source.

The batch body is set-oriented: all payload files referenced by the
batch's events are read in one scan, fetch_ids recovered from the
bronze filename contract (``{source}_{fetch_id}.json``), normalized
per source, and merged once — at 100 TB a trigger processes thousands
of fetches with a constant number of jobs, not a job per event.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from meteo_etl_spark.pipeline.warehouse import (
    Warehouse,
    merge_observations,
    merge_observations_jdbc,
)
from meteo_etl_spark.sources.registry import get_source_by_url
from meteo_etl_spark.streaming.events import parse_wire_json

#: bronze filename contract: `{source}_{uuid4}.json` (sources.bronze).
_FETCH_ID_FROM_FILE = r"_([0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12})\.json$"


@dataclass(frozen=True)
class JdbcSink:
    """Land the silver merge in a DATABASE instead of the parquet
    warehouse — the deployment where a user porting the reference keeps
    Postgres as the store the dashboard reads (`streaming/load.py:58`
    upserts into it). The MERGE runs database-side
    (``upsert_jdbc``), so redelivered batches stay idempotent on the
    natural key — the same at-least-once + idempotent-sink contract
    (ST2) as the parquet path."""

    url: str
    table: str = "observations"
    #: upsert statement shape: "merge" (ANSI MERGE INTO) or
    #: "on_conflict" (Postgres <15 / SQLite — the reference's own
    #: statement shape, `etl/load.py:35-55`).
    dialect: str = "merge"
    options: dict | None = None


@dataclass
class ConsumeStats:
    """Per-run accounting (filled by the foreachBatch bodies)."""

    batches: int = 0
    events: int = 0
    poison: int = 0
    merged_rows: int = 0
    sources: list[str] = field(default_factory=list)


def process_event_batch(
    spark: SparkSession,
    warehouse: Warehouse,
    events: DataFrame,
    stats: ConsumeStats | None = None,
    jdbc_sink: JdbcSink | None = None,
) -> None:
    """Merge the observations referenced by a batch of fetch events.

    ``events`` carries parsed FetchEvent rows. Events are grouped by
    source (the registry probe J3 — reference `etl/sources.py:97-100`),
    each group's payload files are read in ONE schema'd scan, fetch_ids
    are recovered from the filename, and one MERGE lands the group —
    into the parquet warehouse, or into ``jdbc_sink``'s database table.
    """
    rows = events.select("source", "path").filter(F.col("path").isNotNull()).collect()
    by_source: dict[str, list[str]] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r.path)

    for url, paths in sorted(by_source.items()):
        spec = get_source_by_url(url)
        payloads = (
            spark.read.schema(spec.payload_schema)
            .json(paths)
            .withColumn(
                "fetch_id",
                F.regexp_extract(F.input_file_name(), _FETCH_ID_FROM_FILE, 1),
            )
        )
        records = spec.normalize(payloads)  # fetch_id passes through (T1-T4)
        if jdbc_sink is not None:
            touched = merge_observations_jdbc(
                spark,
                jdbc_sink.url,
                records,
                table=jdbc_sink.table,
                dialect=jdbc_sink.dialect,
                options=jdbc_sink.options,
            )
        else:
            merge_stats = merge_observations(spark, warehouse, records)
            touched = merge_stats.inserted + merge_stats.updated
        if stats is not None:
            stats.sources.append(spec.name)
            stats.merged_rows += touched
    if stats is not None:
        stats.events += len(rows)


def consume_fetch_events(
    spark: SparkSession,
    warehouse: Warehouse,
    topic_dir: str,
    checkpoint_dir: str,
    *,
    dead_letter_dir: str | None = None,
    available_now: bool = True,
    processing_interval: str = "10 seconds",
    stats: ConsumeStats | None = None,
    wire_format: str = "json",
    max_files_per_trigger: int | None = None,
    jdbc_sink: JdbcSink | None = None,
) -> StreamingQuery:
    """Start the consumer stream over the file topic.

    Returns the StreamingQuery; with ``available_now`` the caller
    awaits termination (bounded drain, the test/backfill mode), else
    it runs until ``query.stop()`` (reference `stop_event`,
    `streaming/consumer.py:102-109`).

    ``wire_format="avro"`` consumes base64-per-line Avro message
    values (the file topic's encoding of Kafka's binary value column;
    a real Kafka source hands the bytes to from_avro_value directly).
    Corrupt Avro dead-letters exactly like corrupt JSON (ST3).

    ``max_files_per_trigger`` bounds each micro-batch's intake (the
    reference consumer's ``max_messages``, `streaming/consumer.py:47`;
    ``maxOffsetsPerTrigger`` on a real Kafka source) — with
    ``available_now`` the drain still completes, in ceil(files/N)
    batches, each a separate checkpoint commit.

    ``jdbc_sink`` redirects the silver merge to a database table
    (staged ``MERGE INTO`` per batch — the reference's consumer→
    Postgres path, `streaming/load.py:58`); bronze payloads and the
    dead-letter dir stay on the file layer either way."""
    reader = spark.readStream.schema(
        T.StructType([T.StructField("value", T.StringType())])
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.text(topic_dir).withColumnRenamed("value", "value")
    if wire_format == "avro":
        from meteo_etl_spark.streaming.events import from_avro_value

        parsed = from_avro_value(raw.select(F.unbase64("value").alias("value")))
    elif wire_format == "json":
        parsed = parse_wire_json(raw)
    else:
        raise ValueError(f"unknown wire_format {wire_format!r} (json|avro)")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.cache()
        try:
            # PERMISSIVE from_json yields an all-null struct (not a null
            # struct) on corrupt input — a real event always carries its
            # non-null fetch_id, so that's the poison discriminator.
            ok = batch_df.filter(F.col("event.fetch_id").isNotNull()).select("event.*")
            poison = batch_df.filter(F.col("event.fetch_id").isNull()).select("raw_value")
            n_poison = poison.count()
            if n_poison and dead_letter_dir:
                # Skip-forever: record and move on; the batch still
                # succeeds so these offsets commit (ST3). Binary wire
                # values (avro) dead-letter as base64 text lines.
                os.makedirs(dead_letter_dir, exist_ok=True)
                out = poison
                if dict(poison.dtypes).get("raw_value") == "binary":
                    out = poison.select(F.base64("raw_value").alias("raw_value"))
                out.write.mode("append").text(dead_letter_dir)
            process_event_batch(spark, warehouse, ok, stats=stats, jdbc_sink=jdbc_sink)
            if stats is not None:
                stats.batches += 1
                stats.poison += n_poison
        finally:
            batch_df.unpersist()

    writer = parsed.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_interval)
    return writer.start()


KAFKA_PROVIDER_CLASS = "org.apache.spark.sql.kafka010.KafkaSourceProvider"


def kafka_available(spark) -> bool:
    """True when the spark-sql-kafka datasource jar is on the JVM
    classpath (capability gate, same pattern as events.avro_available —
    probes actual loadability, not python-side importability)."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(KAFKA_PROVIDER_CLASS)
        return True
    except Exception:
        return False


def kafka_source_options(bootstrap_servers: str, topic: str) -> dict[str, str]:
    """Real-Kafka source wiring (S4): ``spark.readStream.format("kafka")
    .options(**kafka_source_options(...))`` — `startingOffsets=earliest`
    mirrors the reference consumer's `auto.offset.reset`
    (`streaming/consumer.py:27-41`); offset commits become the
    checkpoint's job."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": "earliest",
    }
