"""Structured-Streaming throughput benchmark (bounded drain).

Generates a synthetic observation corpus as many small parquet files
(the shape of a micro-batched file/Kafka feed), then drains it through
two streaming pipelines with ``availableNow`` + checkpointing and
reports rows/second:

1. **windowed_rollup** — watermarked tumbling event-time aggregate
   (streaming/windows.windowed_observation_stats): the stateful-agg
   path, state bounded by the watermark.
2. **stream_dedup** — dropDuplicatesWithinWatermark over a keyed
   stream with 10% planted re-deliveries
   (streaming/windows.dedup_stream): the bounded-state dedup path.

Context for the number: the reference consumes ONE Kafka message per
poll with a 1.0 s timeout (streaming/config.py:25,
streaming/consumer.py:36-37) — its ceiling is O(1) msg/s regardless of
hardware. The Spark paths below are micro-batched scans; throughput
scales with cores/executors.

Run: python tools/bench_stream.py  →  one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from meteo_etl_spark.session import get_spark  # noqa: E402
from meteo_etl_spark.streaming.windows import (  # noqa: E402
    dedup_stream,
    windowed_observation_stats,
)

ROWS = 1_000_000
FILES = 32  # micro-batch granularity of the simulated feed
DUP_FRACTION = 0.1


def main() -> None:
    spark = get_spark("bench-stream")
    root = tempfile.mkdtemp(prefix="bench_stream_")
    src = os.path.join(root, "feed")
    try:
        # Synthetic observations: 24h of event time, 100 stations,
        # ids with 10% planted duplicates (re-deliveries) for the
        # dedup leg.
        obs = spark.range(0, ROWS, 1, FILES).select(
            (F.col("id") % int(ROWS * (1 - DUP_FRACTION))).alias("obs_id"),
            F.timestamp_micros(
                F.lit(1704067200_000000) + (F.col("id") % 86400) * 1_000_000
            ).alias("timestamp"),
            (F.col("id") % 10).cast("double").alias("latitude"),
            (F.col("id") % 10 + 100).cast("double").alias("longitude"),
            ((F.col("id") % 400) / 10.0 - 10.0).alias("temperature"),
            ((F.col("id") % 300) / 10.0).alias("wind_speed"),
            ((F.col("id") % 50) / 10.0).alias("precipitation"),
        )
        obs.write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema

        def drain(tag: str, build) -> dict[str, float]:
            ckpt = os.path.join(root, f"ckpt_{tag}")
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 4)  # force multi-batch
                .parquet(src)
            )
            out = build(stream)
            t = time.perf_counter()
            q = (
                out.writeStream.format("noop")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            wall = time.perf_counter() - t
            batches = q.lastProgress["batchId"] + 1 if q.lastProgress else 0
            return {
                "sec": round(wall, 3),
                "rows_per_sec": round(ROWS / wall),
                "batches": batches,
            }

        legs = {
            "windowed_rollup": drain(
                "rollup",
                lambda s: windowed_observation_stats(
                    s, window_duration="1 hour", watermark_delay="2 hours"
                ),
            ),
            "stream_dedup": drain(
                "dedup",
                lambda s: dedup_stream(
                    s, ["obs_id"], ts_col="timestamp", watermark_delay="1 hour"
                ),
            ),
        }
        print(
            json.dumps(
                {
                    "metric": "streaming_throughput",
                    "unit": "rows/sec",
                    "rows": ROWS,
                    "files": FILES,
                    "legs": legs,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
