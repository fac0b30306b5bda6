"""Structured-Streaming pipeline (SURVEY.md §3.2, ST1-ST5).

The reference's Kafka/Avro fetch-event loop re-expressed Spark-first:
event production is a projection + sink write; consumption is
``readStream → parse (PERMISSIVE, dead-letter) → foreachBatch
(read referenced bronze → normalize → idempotent MERGE)`` with
checkpointed offsets — at-least-once delivery + an idempotent sink =
effectively exactly-once (reference `streaming/consumer.py:36-37,
122-134` + `etl/load.py:45-55`).
"""
