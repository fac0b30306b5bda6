"""Real-broker Kafka e2e — activates automatically when the
spark-sql-kafka jar (and a reachable broker) are present; otherwise
skips with an explicit reason, never silently.

The engine's Kafka path is wiring + an own Avro codec that are fully
tested offline (test_streaming.py, test_avro_wire.py); what only a real
environment can prove is the JVM ``format("kafka")`` source/sink
round-trip itself (reference: `streaming/consumer.py:27-41`,
`streaming/producer.py:16-57`). This test IS that proof wherever the
jars land; in this image it documents exactly why it cannot run.

Enable by launching Spark with
``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>``
and exporting ``KAFKA_BOOTSTRAP_SERVERS=host:9092``.
"""

from __future__ import annotations

import os
import socket
import uuid

import pytest
from pyspark.sql import functions as F

from meteo_etl_spark.streaming.consume import (
    KAFKA_PROVIDER_CLASS,
    kafka_available,
    kafka_source_options,
)
from meteo_etl_spark.streaming.produce import kafka_sink_options

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP_SERVERS", "localhost:9092")


def _broker_reachable(bootstrap: str, timeout: float = 1.0) -> bool:
    host, _, port = bootstrap.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=timeout):
            return True
    except OSError:
        return False


@pytest.fixture()
def kafka_env(spark):
    if not kafka_available(spark):
        pytest.skip(
            f"spark-sql-kafka jar absent: {KAFKA_PROVIDER_CLASS} not on the JVM "
            "classpath (add --packages org.apache.spark:spark-sql-kafka-0-10_2.13)"
        )
    if not _broker_reachable(BOOTSTRAP):
        pytest.skip(
            f"no Kafka broker reachable at {BOOTSTRAP} "
            "(set KAFKA_BOOTSTRAP_SERVERS to enable)"
        )
    return BOOTSTRAP


def test_gate_is_explicit(spark):
    """The capability probe itself must always run and return a bool —
    the e2e below skips loudly, never errors, when the jar is absent."""
    assert isinstance(kafka_available(spark), bool)


def test_kafka_roundtrip_batch(spark, kafka_env, tmp_path):
    """Batch write -> batch read through the real broker: bytes survive
    and offsets advance."""
    topic = f"meteo-e2e-{uuid.uuid4().hex[:8]}"
    payloads = [f"msg-{i}" for i in range(10)]
    df = spark.createDataFrame([(p,) for p in payloads], ["value"]).select(
        F.col("value").cast("binary").alias("value")
    )
    df.write.format("kafka").options(
        **kafka_sink_options(kafka_env, topic)
    ).save()

    got = (
        spark.read.format("kafka")
        .options(**kafka_source_options(kafka_env, topic))
        .load()
        .select(F.col("value").cast("string").alias("value"))
    )
    assert sorted(r.value for r in got.collect()) == sorted(payloads)


def test_kafka_stream_availablenow_drains_topic(spark, kafka_env, tmp_path):
    """Streaming read with availableNow: bounded drain + checkpointed
    offsets (the engine's ST1/ST2 semantics on the real source)."""
    topic = f"meteo-e2e-{uuid.uuid4().hex[:8]}"
    spark.createDataFrame([(f"ev-{i}",) for i in range(5)], ["value"]).select(
        F.col("value").cast("binary").alias("value")
    ).write.format("kafka").options(**kafka_sink_options(kafka_env, topic)).save()

    out_dir = str(tmp_path / "out")
    q = (
        spark.readStream.format("kafka")
        .options(**kafka_source_options(kafka_env, topic))
        .load()
        .select(F.col("value").cast("string").alias("value"))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == 5
