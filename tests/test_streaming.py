"""Streaming pipeline tests (reference `tests/streaming/*` strategy,
SURVEY.md §5): event round-trip equality, produce→consume→count e2e,
poison-pill skip with dead-letter, checkpointed no-reprocessing, and
idempotent redelivery."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from meteo_etl_spark.pipeline import batch, control
from meteo_etl_spark.pipeline.warehouse import read_observations
from meteo_etl_spark.streaming import consume, events, produce
from tests.conftest import N_HOURS, golden_payload


@pytest.fixture()
def offline_source(monkeypatch):
    from meteo_etl_spark.sources.registry import Source

    monkeypatch.setattr(Source, "extract", lambda self, **extra: golden_payload())


@pytest.fixture()
def topic(tmp_path):
    return str(tmp_path / "topic")


def _publish_one(spark, warehouse, topic) -> str:
    """Producer path (reference `streaming/cli.py:28-61`): ETL with the
    bronze strategy, then publish the finished fetch's event."""
    result = batch.run_etl(
        spark, warehouse, "meteo", {"latitude": 3.06, "longitude": 5.25},
        fetch_job=batch.extract_and_save_to_disk,
    )
    produce.publish_finished_fetch(spark, warehouse, result.fetch_id, topic)
    return result.fetch_id


def test_event_roundtrip(spark, warehouse, offline_source, topic):
    """Serialize → deserialize equality incl. ms truncation (reference
    `tests/streaming/test_producer.py:8-37`, `test_events.py:13-25`)."""
    fetch_id = _publish_one(spark, warehouse, topic)

    row = control.read_fetch_metadata(spark, warehouse).filter(F.col("id") == fetch_id)
    ev = events.events_from_control(row)
    wire = events.to_wire_json(ev)
    back = events.parse_wire_json(wire).select("event.*")

    orig, parsed = ev.collect()[0], back.collect()[0]
    assert parsed.asDict() == orig.asDict()
    assert parsed.fetch_id == fetch_id
    assert parsed.source.startswith("https://")
    assert parsed.path.endswith(f"meteo_{fetch_id}.json")
    # epoch-ms truncation round-trips to a ms-precision timestamp (T5)
    ts = row.select(events.millis_to_timestamp(F.lit(parsed.finished_at)).alias("t")).collect()[0].t
    assert ts.microsecond % 1000 == 0


def test_consume_e2e(spark, warehouse, offline_source, topic, tmp_path):
    """produce → publish → consume → silver count (reference
    `tests/streaming/test_consumer.py:22-55`)."""
    fetch_id = _publish_one(spark, warehouse, topic)

    stats = consume.ConsumeStats()
    q = consume.consume_fetch_events(
        spark, warehouse, topic, str(tmp_path / "ckpt"), stats=stats
    )
    q.awaitTermination(120)

    assert stats.events == 1 and stats.poison == 0 and stats.sources == ["meteo"]
    obs = read_observations(spark, warehouse)
    assert obs.filter(F.col("fetch_id") == fetch_id).count() == N_HOURS


def test_checkpoint_prevents_reprocessing(spark, warehouse, offline_source, topic, tmp_path):
    _publish_one(spark, warehouse, topic)
    ckpt = str(tmp_path / "ckpt")

    s1 = consume.ConsumeStats()
    consume.consume_fetch_events(spark, warehouse, topic, ckpt, stats=s1).awaitTermination(120)
    s2 = consume.ConsumeStats()
    consume.consume_fetch_events(spark, warehouse, topic, ckpt, stats=s2).awaitTermination(120)

    assert s1.events == 1
    assert s2.events == 0  # offsets committed — nothing redelivered


def test_redelivery_is_idempotent(spark, warehouse, offline_source, topic, tmp_path):
    """Fresh checkpoint = full redelivery; the keyed MERGE keeps the
    silver table stable (ST2: at-least-once + idempotent sink)."""
    fetch_id = _publish_one(spark, warehouse, topic)

    consume.consume_fetch_events(
        spark, warehouse, topic, str(tmp_path / "c1")
    ).awaitTermination(120)
    n1 = read_observations(spark, warehouse).count()
    consume.consume_fetch_events(
        spark, warehouse, topic, str(tmp_path / "c2")
    ).awaitTermination(120)
    obs = read_observations(spark, warehouse)
    assert obs.count() == n1 == N_HOURS
    assert obs.filter(F.col("fetch_id") == fetch_id).count() == N_HOURS


def _derby_obs(spark, url):
    from meteo_etl_spark.sources import jdbc

    return jdbc.read_jdbc(
        spark,
        url,
        '(SELECT "id", "fetch_id", "temperature", "created_at", "updated_at"'
        " FROM observations) t",
    )


def test_consume_to_jdbc_sink_lands_observations_in_database(
    spark, warehouse, offline_source, topic, tmp_path
):
    """The reference's consumer→Postgres path (streaming/load.py:58):
    the streaming silver merge lands in a DATABASE table via a staged
    MERGE INTO; the parquet silver table is never written."""
    from meteo_etl_spark.sources import jdbc

    if not jdbc.driver_available(spark, jdbc.DERBY_DRIVER):
        pytest.skip("Derby driver not on JVM classpath")
    url = f"jdbc:derby:{tmp_path}/obsdb;create=true"
    fetch_id = _publish_one(spark, warehouse, topic)

    stats = consume.ConsumeStats()
    consume.consume_fetch_events(
        spark,
        warehouse,
        topic,
        str(tmp_path / "ckpt"),
        stats=stats,
        jdbc_sink=consume.JdbcSink(url),
    ).awaitTermination(120)

    assert stats.events == 1 and stats.merged_rows == N_HOURS
    got = _derby_obs(spark, url).collect()
    assert len(got) == N_HOURS
    assert {r[1] for r in got} == {fetch_id}
    assert all(r[0] is not None and len(r[0]) == 36 for r in got)  # uuid ids
    # database-only deployment: no parquet silver table written
    assert not os.path.exists(warehouse.observations_path)


def test_jdbc_sink_redelivery_idempotent_preserves_identity(
    spark, warehouse, offline_source, topic, tmp_path
):
    """ST2 against the database sink: full redelivery (fresh
    checkpoint) re-runs the MERGE — row count stable, and matched rows
    keep their id/created_at (only measures/fetch_id/updated_at take
    new values, the reference's ON CONFLICT column set)."""
    from meteo_etl_spark.sources import jdbc

    if not jdbc.driver_available(spark, jdbc.DERBY_DRIVER):
        pytest.skip("Derby driver not on JVM classpath")
    url = f"jdbc:derby:{tmp_path}/obsdb;create=true"
    _publish_one(spark, warehouse, topic)
    sink = consume.JdbcSink(url)

    consume.consume_fetch_events(
        spark, warehouse, topic, str(tmp_path / "c1"), jdbc_sink=sink
    ).awaitTermination(120)
    first = {r[0]: (r[3], r[4]) for r in _derby_obs(spark, url).collect()}
    assert len(first) == N_HOURS

    consume.consume_fetch_events(
        spark, warehouse, topic, str(tmp_path / "c2"), jdbc_sink=sink
    ).awaitTermination(120)
    second = {r[0]: (r[3], r[4]) for r in _derby_obs(spark, url).collect()}

    assert set(second) == set(first)  # same rows, same ids — no dupes
    for rid, (created, updated) in second.items():
        assert created == first[rid][0]  # created_at preserved
        assert updated >= first[rid][1]  # updated_at refreshed


def test_poison_pill_skipped_and_dead_lettered(
    spark, warehouse, offline_source, topic, tmp_path
):
    """Corrupt message: dead-lettered + offset committed (skip-forever),
    good messages in the same topic still processed (reference
    `streaming/consumer.py:128-134`, `tests/streaming/test_consumer.py:
    135-186`)."""
    fetch_id = _publish_one(spark, warehouse, topic)
    with open(os.path.join(topic, "zz_poison.json"), "w") as f:
        f.write("{not json at all\n")

    dl = str(tmp_path / "dead")
    ckpt = str(tmp_path / "ckpt")
    s1 = consume.ConsumeStats()
    consume.consume_fetch_events(
        spark, warehouse, topic, ckpt, dead_letter_dir=dl, stats=s1
    ).awaitTermination(120)

    assert s1.poison == 1 and s1.events == 1
    assert read_observations(spark, warehouse).filter(
        F.col("fetch_id") == fetch_id
    ).count() == N_HOURS
    dead = [r.value for r in spark.read.text(dl).collect()]
    assert dead == ["{not json at all"]

    # skip-forever: a re-run does not see the poison message again
    s2 = consume.ConsumeStats()
    consume.consume_fetch_events(
        spark, warehouse, topic, ckpt, dead_letter_dir=dl, stats=s2
    ).awaitTermination(120)
    assert s2.poison == 0 and s2.events == 0


def test_wire_json_matches_declared_schema(spark, warehouse, offline_source, topic):
    """The wire value is a flat JSON object with exactly the FetchEvent
    fields (fastavro-conformance analogue, `tests/streaming/test_events
    .py:13-25`)."""
    fetch_id = _publish_one(spark, warehouse, topic)
    with open(os.path.join(topic, f"{fetch_id}.json")) as f:
        msg = json.loads(f.read())
    from meteo_etl_spark.schemas import FETCH_EVENT_SCHEMA

    assert set(msg) <= {f.name for f in FETCH_EVENT_SCHEMA.fields}
    assert msg["fetch_id"] == fetch_id
    assert msg["status"] == "success"
    assert isinstance(msg["finished_at"], int)


def test_windowed_stats_stream_matches_batch(spark, warehouse, offline_source, tmp_path):
    """Stretch: tumbling event-time rollup with watermark — the
    streaming result (availableNow drain) must equal the same aggregate
    computed in batch (unified semantics)."""
    from meteo_etl_spark.schemas import OBSERVATIONS_SCHEMA
    from meteo_etl_spark.streaming.windows import windowed_observation_stats

    batch.run_etl(spark, warehouse, "meteo", {"latitude": 3.06, "longitude": 5.25})
    obs = read_observations(spark, warehouse)

    src = str(tmp_path / "obs_stream")
    obs.write.mode("overwrite").json(src)

    stream = spark.readStream.schema(OBSERVATIONS_SCHEMA).json(src)
    windowed = windowed_observation_stats(stream, window_duration="1 day")
    q = (
        windowed.writeStream.format("memory")
        .queryName("win_rollup")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql("SELECT * FROM win_rollup").collect()
    exp = windowed_observation_stats(obs, window_duration="1 day").collect()
    key = lambda r: (r.window_start, r.latitude, r.longitude)
    assert sorted([r.asDict() for r in got], key=lambda d: d["window_start"]) == sorted(
        [r.asDict() for r in exp], key=lambda d: d["window_start"]
    )
    assert len(got) == 7  # 7 daily windows in the golden payload
    assert {r.n for r in got} == {24}


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Re-delivered events (same event_id) are dropped by the streaming
    dedup; distinct events all arrive. Batch mode degrades to
    dropDuplicates."""
    from datetime import datetime

    from pyspark.sql import types as T

    from meteo_etl_spark.streaming.windows import dedup_stream

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("v", T.LongType()),
        ]
    )
    base = datetime(2025, 6, 1, 12, 0, 0)
    rows = [
        (1, base, 10),
        (2, base, 20),
        (1, base, 10),  # duplicate delivery
        (3, base, 30),
        (2, base, 20),  # duplicate delivery
    ]
    src = str(tmp_path / "dup_events")
    spark.createDataFrame(rows, schema).repartition(1).write.json(src)

    stream = spark.readStream.schema(schema).json(src)
    q = (
        dedup_stream(stream, ["event_id"])
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.event_id for r in spark.sql("SELECT * FROM dedup_out").collect())
    assert got == [1, 2, 3]

    # batch degradation
    batch_out = dedup_stream(spark.createDataFrame(rows, schema), ["event_id"])
    assert batch_out.count() == 3


def test_avro_gate_reflects_runtime(spark):
    """avro_available() must report actual executability, not mere
    importability (the wrapper imports even without the datasource
    jar). Either way the Avro surface round-trips: the JVM
    from_avro/to_avro when the jar is present, the engine's own
    spec-conformant codec (validated against Java avro-core in
    test_avro_wire.py) when it is not."""
    ok = events.avro_available()
    assert isinstance(ok, bool)
    from meteo_etl_spark.schemas import FETCH_EVENT_SCHEMA

    row = spark.createDataFrame(
        [("f1", "https://s", "success", None, {"a": "1"}, 123)],
        FETCH_EVENT_SCHEMA,
    )
    wire = events.to_avro_value(row)
    back = events.from_avro_value(wire).select("event.*").collect()[0]
    assert back.fetch_id == "f1"
    assert back.params == {"a": "1"}
    assert back.finished_at == 123


def test_consume_multi_source_batch(spark, warehouse, monkeypatch, topic, tmp_path):
    """One trigger, events from TWO sources: the batch body groups by
    source, reads each group's payloads in one scan, and merges all
    groups (set-oriented ST1)."""
    from meteo_etl_spark.operators.normalize import normalize_meteo
    from meteo_etl_spark.schemas import METEO_PAYLOAD_SCHEMA
    from meteo_etl_spark.sources.registry import Source, SourceSpec, register_source

    # param-sensitive payloads: distinct locations -> distinct merge keys
    monkeypatch.setattr(
        Source,
        "extract",
        lambda self, **extra: golden_payload(
            lat=float(self.params["latitude"]), lon=float(self.params["longitude"])
        ),
    )

    register_source(
        SourceSpec(
            name="meteo-alt",
            url="https://alt.example.com/v1/forecast",
            static_params={},
            payload_schema=METEO_PAYLOAD_SCHEMA,
            normalize=normalize_meteo,
            required_params=("latitude", "longitude"),
        )
    )
    ids = []
    for src, lat in (("meteo", 3.06), ("meteo-alt", 13.06)):
        r = batch.run_etl(
            spark, warehouse, src, {"latitude": lat, "longitude": 5.25},
            fetch_job=batch.extract_and_save_to_disk,
        )
        produce.publish_finished_fetch(spark, warehouse, r.fetch_id, topic)
        ids.append(r.fetch_id)

    stats = consume.ConsumeStats()
    consume.consume_fetch_events(
        spark, warehouse, topic, str(tmp_path / "ckpt"), stats=stats
    ).awaitTermination(120)

    assert stats.events == 2
    assert sorted(stats.sources) == ["meteo", "meteo-alt"]
    obs = read_observations(spark, warehouse)
    for fid in ids:
        assert obs.filter(F.col("fetch_id") == fid).count() == N_HOURS


def test_consume_avro_wire_e2e_with_poison(spark, warehouse, offline_source, topic, tmp_path):
    """S4/S5 over the Avro wire: publish a finished fetch as Avro
    bytes (base64-per-line file topic = Kafka binary value), consume
    with wire_format='avro', and dead-letter a corrupt Avro message —
    same ST2/ST3 semantics as the JSON wire."""
    import base64

    result = batch.run_etl(
        spark, warehouse, "meteo", {"latitude": 3.06, "longitude": 5.25},
        fetch_job=batch.extract_and_save_to_disk,
    )
    path = produce.publish_finished_fetch(
        spark, warehouse, result.fetch_id, topic, wire_format="avro"
    )
    assert path.endswith(".avro.b64")
    # poison: valid base64, invalid Avro record
    with open(os.path.join(topic, "poison.avro.b64"), "w") as f:
        f.write(base64.b64encode(b"\xff\xfe not an avro record").decode() + "\n")

    dead = str(tmp_path / "dead")
    stats = consume.ConsumeStats()
    q = consume.consume_fetch_events(
        spark, warehouse, topic, str(tmp_path / "ckpt_avro"),
        dead_letter_dir=dead, stats=stats, wire_format="avro",
    )
    q.awaitTermination(120)

    assert stats.poison == 1 and stats.events == 1
    obs = read_observations(spark, warehouse)
    assert obs.filter(F.col("fetch_id") == result.fetch_id).count() == N_HOURS
    dead_lines = [
        line
        for fn in os.listdir(dead)
        if fn.endswith(".txt") or fn.startswith("part-")
        for line in open(os.path.join(dead, fn))
    ]
    assert any(
        base64.b64decode(line.strip()) == b"\xff\xfe not an avro record"
        for line in dead_lines
    )


def test_bounded_intake_max_files_per_trigger(spark, warehouse, offline_source, topic, tmp_path):
    """ST1 bounded intake: three published events with
    max_files_per_trigger=1 drain in three separate micro-batches
    (three checkpoint commits), all landing in silver."""
    ids = []
    for lat in (3.06, 4.06, 5.06):
        result = batch.run_etl(
            spark, warehouse, "meteo", {"latitude": lat, "longitude": 5.25},
            fetch_job=batch.extract_and_save_to_disk,
        )
        produce.publish_finished_fetch(spark, warehouse, result.fetch_id, topic)
        ids.append(result.fetch_id)

    stats = consume.ConsumeStats()
    q = consume.consume_fetch_events(
        spark, warehouse, topic, str(tmp_path / "ckpt_bounded"),
        stats=stats, max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    assert stats.batches == 3
    assert stats.events == 3
    obs = read_observations(spark, warehouse)
    assert obs.filter(F.col("fetch_id").isin(ids)).count() > 0


def test_enrich_stream_static_broadcast_join(spark, tmp_path):
    """Stream-static enrichment: a streamed events feed joins a static
    dim per micro-batch (stateless — no watermark needed); unmatched
    stream rows survive a left join; dim-preserving modes are refused."""
    from meteo_etl_spark.streaming.windows import enrich_stream
    from pyspark.sql import types as T

    src = str(tmp_path / "feed")
    spark.createDataFrame(
        [(1, "click"), (2, "view"), (3, "click"), (4, "purchase")],
        "user_id int, event_type string",
    ).write.json(src)
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.1)], "event_type string, weight double"
    )

    schema = T.StructType(
        [
            T.StructField("user_id", T.IntegerType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).json(src)
    q = (
        enrich_stream(stream, dim, "event_type")
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.user_id: r.weight for r in spark.sql("SELECT * FROM enriched").collect()}
    assert rows == {1: 1.0, 2: 0.1, 3: 1.0, 4: None}

    with pytest.raises(ValueError, match="stream-preserving"):
        enrich_stream(stream, dim, "event_type", how="full")


def test_consume_e2e_atomic_warehouse_redelivery_idempotent(
    spark, offline_source, topic, tmp_path
):
    """Streaming consume onto Warehouse(atomic=True): the foreachBatch
    MERGE lands through the commit-arbitrated manifest layout, so the
    effectively-exactly-once story composes with crash-atomicity —
    and redelivery (fresh checkpoint, same event) stays idempotent on
    the committed snapshot."""
    from meteo_etl_spark.operators.atomic import is_atomic_table
    from meteo_etl_spark.pipeline.warehouse import Warehouse

    wh = Warehouse(root=str(tmp_path / "wh"), atomic=True)
    fetch_id = _publish_one(spark, wh, topic)

    q = consume.consume_fetch_events(spark, wh, topic, str(tmp_path / "ckpt1"))
    q.awaitTermination(120)
    assert is_atomic_table(wh.observations_path)
    obs = read_observations(spark, wh)
    assert obs.filter(F.col("fetch_id") == fetch_id).count() == N_HOURS

    # redelivery: new checkpoint re-reads the topic; the keyed MERGE on
    # the atomic table absorbs the duplicates
    q2 = consume.consume_fetch_events(spark, wh, topic, str(tmp_path / "ckpt2"))
    q2.awaitTermination(120)
    obs2 = read_observations(spark, wh)
    assert obs2.count() == obs.count()
    assert obs2.filter(F.col("fetch_id") == fetch_id).count() == N_HOURS


def _wait_until(predicate, timeout=120.0, step=0.5):
    import time

    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(step)
    return predicate()


def test_continuous_trigger_soak_consumes_live_feed_then_stops(
    spark, warehouse, offline_source, topic, tmp_path
):
    """The processingTime trigger path (reference `stop_event` loop,
    `streaming/consumer.py:102-109`): start the consumer continuous,
    feed it events WHILE it runs, assert multiple micro-batches
    landed, then `query.stop()` for graceful shutdown. A subsequent
    availableNow run over the SAME checkpoint must redeliver nothing —
    offsets committed under one trigger mode are honored by the other
    (no checkpoint leakage between modes)."""
    ckpt = str(tmp_path / "ckpt")
    _publish_one(spark, warehouse, topic)

    stats = consume.ConsumeStats()
    q = consume.consume_fetch_events(
        spark,
        warehouse,
        topic,
        ckpt,
        available_now=False,
        processing_interval="1 second",
        stats=stats,
    )
    try:
        assert _wait_until(lambda: stats.events >= 1), "first event not consumed"
        # a second fetch published while the query is live
        fetch2 = _publish_one(spark, warehouse, topic)
        assert _wait_until(lambda: stats.events >= 2), "live-fed event not consumed"
    finally:
        q.stop()
    q.awaitTermination(60)

    assert stats.events == 2
    assert stats.batches >= 2  # the live feed arrived in a later trigger
    obs = read_observations(spark, warehouse)
    assert obs.count() == N_HOURS  # same natural keys -> merged, not duped
    assert {r.fetch_id for r in obs.select("fetch_id").distinct().collect()} == {fetch2}

    # Mode switch on the same checkpoint. Committed offsets are honored
    # across trigger modes; the one legitimate redelivery is the LAST
    # batch, when stop() lands between its sink commit and its
    # checkpoint commit — the documented at-least-once contract, which
    # the idempotent keyed merge must absorb invisibly.
    s2 = consume.ConsumeStats()
    consume.consume_fetch_events(
        spark, warehouse, topic, ckpt, stats=s2
    ).awaitTermination(120)
    assert s2.batches <= 1 and s2.events <= 2, "more than the last batch redelivered"
    assert read_observations(spark, warehouse).count() == N_HOURS


def test_continuous_trigger_soak_jdbc_sink(
    spark, warehouse, offline_source, topic, tmp_path
):
    """Same continuous soak with the database sink: per-trigger staged
    MERGEs land in Derby while the query runs; graceful stop; the
    availableNow mode switch on the same checkpoint redelivers
    nothing and the table stays stable."""
    from meteo_etl_spark.sources import jdbc

    if not jdbc.driver_available(spark, jdbc.DERBY_DRIVER):
        pytest.skip("Derby driver not on JVM classpath")
    url = f"jdbc:derby:{tmp_path}/soakdb;create=true"
    ckpt = str(tmp_path / "ckpt")
    sink = consume.JdbcSink(url)
    _publish_one(spark, warehouse, topic)

    stats = consume.ConsumeStats()
    q = consume.consume_fetch_events(
        spark,
        warehouse,
        topic,
        ckpt,
        available_now=False,
        processing_interval="1 second",
        stats=stats,
        jdbc_sink=sink,
    )
    try:
        assert _wait_until(lambda: stats.events >= 1)
        _publish_one(spark, warehouse, topic)
        assert _wait_until(lambda: stats.events >= 2)
    finally:
        q.stop()
    q.awaitTermination(60)

    assert stats.events == 2 and stats.batches >= 2
    rows = _derby_obs(spark, url).collect()
    assert len(rows) == N_HOURS  # merged on the natural key across triggers
    assert not os.path.exists(warehouse.observations_path)  # database-only

    # same at-least-once caveat as the parquet soak: stop() may strand
    # the last batch's checkpoint commit; the database MERGE absorbs
    # the redelivery.
    s2 = consume.ConsumeStats()
    consume.consume_fetch_events(
        spark, warehouse, topic, ckpt, stats=s2, jdbc_sink=sink
    ).awaitTermination(120)
    assert s2.batches <= 1 and s2.events <= 2, "more than the last batch redelivered"
    assert len(_derby_obs(spark, url).collect()) == N_HOURS


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join (two live file feeds,
    availableNow drain) returns exactly the pairs the same join finds
    in batch: equal key, |Δts| <= tolerance."""
    from datetime import datetime, timedelta

    from pyspark.sql import types as T

    from meteo_etl_spark.streaming.windows import interval_join_streams

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    base = datetime(2025, 6, 1, 12, 0, 0)
    lrows = [
        (1, 7, base),
        (2, 7, base + timedelta(minutes=30)),
        (3, 8, base),  # user 8: no right-side partner within band
    ]
    rrows = [
        (101, 7, base + timedelta(minutes=4)),   # pairs with 1 (4m)
        (102, 7, base + timedelta(minutes=26)),  # pairs with 2 (-4m)
        (103, 8, base + timedelta(minutes=20)),  # 20m from 3: outside
        (104, 9, base),                          # key with no left side
    ]
    lsrc, rsrc = str(tmp_path / "lsrc"), str(tmp_path / "rsrc")
    spark.createDataFrame(lrows, schema).repartition(1).write.json(lsrc)
    spark.createDataFrame(rrows, schema).repartition(1).write.json(rsrc)

    lstream = spark.readStream.schema(schema).json(lsrc)
    rstream = spark.readStream.schema(schema).json(rsrc)
    q = (
        interval_join_streams(lstream, rstream, "user_id")
        .writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.event_id, r.event_id_r)
        for r in spark.sql("SELECT * FROM ssj_out").collect()
    }
    assert got == {(1, 101), (2, 102)}

    # unified semantics: the same helper on batch frames agrees
    lb = spark.createDataFrame(lrows, schema)
    rb = spark.createDataFrame(rrows, schema)
    batch_pairs = {
        (r.event_id, r.event_id_r)
        for r in interval_join_streams(lb, rb, "user_id").collect()
    }
    assert batch_pairs == got


def test_stream_stream_interval_join_left_outer_and_rejects_full(spark, tmp_path):
    """left_outer emits unmatched left rows with a NULL right side once
    the watermark closes their band; right/full outer joins are refused
    up front."""
    from datetime import datetime, timedelta

    import pytest as _pytest

    from pyspark.sql import types as T

    from meteo_etl_spark.streaming.windows import interval_join_streams

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    base = datetime(2025, 6, 1, 12, 0, 0)
    lrows = [(1, 7, base), (2, 8, base)]
    rrows = [
        (101, 7, base + timedelta(minutes=1)),
        # far-future row on each side pushes the watermark past the
        # earlier bands so unmatched outer rows actually emit
        (199, 99, base + timedelta(days=7)),
    ]
    lrows.append((9, 99, base + timedelta(days=7)))
    lsrc, rsrc = str(tmp_path / "lo_l"), str(tmp_path / "lo_r")
    spark.createDataFrame(lrows, schema).repartition(1).write.json(lsrc)
    spark.createDataFrame(rrows, schema).repartition(1).write.json(rsrc)

    lstream = spark.readStream.schema(schema).json(lsrc)
    rstream = spark.readStream.schema(schema).json(rsrc)
    q = (
        interval_join_streams(
            lstream, rstream, "user_id", how="left_outer",
            watermark_delay="10 minutes",
        )
        .writeStream.format("memory")
        .queryName("ssj_lo")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_lo"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM ssj_lo").collect()
    by_left = {r.event_id: r.event_id_r for r in rows}
    assert by_left[1] == 101          # matched pair
    assert by_left.get(2, None) is None  # unmatched left emitted with NULLs

    with _pytest.raises(ValueError, match="inner/left_outer only"):
        interval_join_streams(lstream, rstream, "user_id", how="full_outer")


def test_sliding_window_stream_matches_batch(spark, tmp_path):
    """The hopping-window aggregate (2h size / 1h slide) drains to the
    same (window, key) totals streaming as in batch — the overlapping-
    window twin of the tumbling-window parity test."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("k", T.StringType()),
            T.StructField("v", T.LongType()),
        ]
    )
    base = datetime(2025, 6, 1, 0, 0, 0)
    rows = [
        (base + timedelta(minutes=37 * i), "ab"[i % 2], i) for i in range(40)
    ]
    src = str(tmp_path / "slide_src")
    spark.createDataFrame(rows, schema).repartition(1).write.json(src)

    def agg(df):
        if df.isStreaming:
            df = df.withWatermark("ts", "4 hours")
        return (
            df.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
            .select(F.col("w.start").alias("ws"), "k", "n", "s")
        )

    q = (
        agg(spark.readStream.schema(schema).json(src))
        .writeStream.format("memory")
        .queryName("slide_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.ws, r.k): (r.n, r.s) for r in spark.sql("SELECT * FROM slide_out").collect()
    }
    exp = {
        (r.ws, r.k): (r.n, r.s)
        for r in agg(spark.createDataFrame(rows, schema)).collect()
    }
    assert got == exp and len(got) > 0
    # overlap sanity: every event is in exactly 2 windows
    assert sum(n for n, _ in got.values()) == 2 * len(rows)


def test_interval_join_rejects_suffix_collisions(spark):
    """A left frame already holding a suffixed name (e.g. 'ts_r') would
    make the join condition resolve ambiguously — refused up front."""
    from datetime import datetime

    from meteo_etl_spark.streaming.windows import interval_join_streams

    base = datetime(2025, 6, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, 7, base, base)], "event_id long, user_id long, ts timestamp, ts_r timestamp"
    )
    right = spark.createDataFrame(
        [(2, 7, base)], "event_id long, user_id long, ts timestamp"
    )
    with pytest.raises(ValueError, match="collide.*ts_r"):
        interval_join_streams(left, right, "user_id")
