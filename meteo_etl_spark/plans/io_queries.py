"""Driver-checkable queries for the I/O-layer operators: the JDBC
source/sink round-trip and the crash-atomic merge.

Both entries push real bytes through their subsystem (an embedded Derby
database / an atomic-manifest parquet table written to scratch space)
and return a result a plain SQL oracle can state on the original
parquet — so the driver's hash compare certifies the WHOLE path: write
out, read back, aggregate.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import functions as F

from meteo_etl_spark.plans.queries import query
from meteo_etl_spark.sources.testdata import load_table


def _scratch(prefix: str) -> str:
    return f"{tempfile.gettempdir()}/meteo_{prefix}_{uuid.uuid4().hex[:10]}"


@query(
    "jdbc_roundtrip_agg",
    """SELECT c_mktsegment,
              COUNT(*) AS n,
              CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT))
                   AS BIGINT) AS bal_cents
       FROM customer GROUP BY 1 ORDER BY 1""",
    doc="JDBC source/sink certification: write `customer` into an "
    "embedded Derby database through write_jdbc, read it back with a "
    "4-way partition-column parallel read (the cluster topology), and "
    "aggregate. The oracle states the same aggregate on the original "
    "parquet, so a hash match proves the database round-trip is "
    "lossless. Exact-cents SUM keeps the compare order-independent. "
    "Reference: etl/db.py:117-126 (Postgres engine), "
    "dashboard/streamlit_app.py:14-25 (SQL read-back).",
)
def jdbc_roundtrip_agg(spark, sf_dir):
    from meteo_etl_spark.sources import jdbc

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    db = _scratch("derby")
    url = f"jdbc:derby:{db}/db;create=true"
    jdbc.write_jdbc(
        cust,
        url,
        "customer_rt",
        mode="overwrite",
        options={"createTableColumnTypes": "c_mktsegment VARCHAR(16)"},
    )
    bounds = cust.agg(
        F.min("c_custkey").alias("lo"), F.max("c_custkey").alias("hi")
    ).collect()[0]
    back = jdbc.read_jdbc(
        spark,
        url,
        "customer_rt",
        partition_column="c_custkey",
        lower_bound=bounds.lo,
        upper_bound=bounds.hi + 1,
        num_partitions=4,
    )
    return (
        back.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).alias("bal_cents"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "events_session_window",
    """WITH m AS (
         SELECT user_id, ts, event_id,
                CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL 1 DAY
                     THEN 1 ELSE 0 END AS is_new
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       s AS (
         SELECT user_id, ts,
                SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
         FROM m)
       SELECT user_id,
              MIN(ts) AS session_start,
              MAX(ts) + INTERVAL 1 DAY AS session_end,
              MIN(ts) AS first_ts,
              MAX(ts) AS last_ts,
              COUNT(*) AS n
       FROM s GROUP BY user_id, sid
       ORDER BY user_id, session_start""",
    doc="Gap-based sessionization via the JVM-native session_window "
    "(streaming/windows.session_rollup) — the built-in stateful-window "
    "path, identical code for batch and streaming frames. Splits only "
    "when the inter-event gap exceeds 1 day (events exactly one gap "
    "apart MERGE — session windows are inclusive at the close), which "
    "the oracle mirrors with a lag/prefix-sum rewrite; session_end is "
    "the window close (last event + gap) per Spark's contract. Same "
    "split rule as events_sessionize. Complements "
    "events_sessionize (batch lag/sum) and streaming/stateful.py "
    "(applyInPandasWithState) — three implementations, one semantics.",
    bench=True,
)
def events_session_window(spark, sf_dir):
    from meteo_etl_spark.streaming.windows import session_rollup

    ev = load_table(spark, sf_dir, "events")
    return session_rollup(ev, "user_id", ts_col="ts", gap="1 day").orderBy(
        "user_id", "session_start"
    )


@query(
    "q15_atomic_merge",
    """WITH upd AS (SELECT event_id, value + 1000 AS value
                    FROM events WHERE event_id % 5 = 0)
       SELECT e.event_id, e.user_id, e.event_type,
              COALESCE(u.value, e.value) AS value
       FROM events e LEFT JOIN upd u USING (event_id)
       ORDER BY e.event_id""",
    doc="U1 through the crash-atomic landing path: merge an update "
    "batch (value+1000 for every 5th event) into an atomic-manifest "
    "parquet table (operators/atomic: immutable generation dirs + "
    "manifest pointer flip) partitioned by event_type, then read the "
    "committed snapshot back through read_table. The oracle states "
    "MERGE semantics as a left join on the base table, so a hash match "
    "certifies the versioned layout returns exactly the transactional "
    "result. Reference: etl/load.py:35-57 (ON CONFLICT upsert inside a "
    "Postgres transaction).",
)
def q15_atomic_merge(spark, sf_dir):
    from meteo_etl_spark.operators.atomic import read_table
    from meteo_etl_spark.operators.upsert import merge_parquet

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = _scratch("atomic")
    shutil.rmtree(path, ignore_errors=True)
    merge_parquet(
        spark, path, ev, ["event_id"], partition_col="event_type", atomic=True
    )
    updates = ev.filter(F.col("event_id") % 5 == 0).select(
        "event_id",
        "user_id",
        "event_type",
        (F.col("value") + 1000).alias("value"),
    )
    merge_parquet(
        spark, path, updates, ["event_id"], partition_col="event_type", atomic=True
    )
    return (
        read_table(spark, path)
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    )


@query(
    "jdbc_upsert_agg",
    """WITH upd AS (SELECT c_custkey, c_acctbal + 500 AS c_acctbal
                    FROM customer WHERE c_custkey % 7 = 0)
       SELECT c.c_mktsegment,
              COUNT(*) AS n,
              CAST(SUM(CAST(ROUND(COALESCE(u.c_acctbal, c.c_acctbal) * 100)
                            AS BIGINT)) AS BIGINT) AS bal_cents
       FROM customer c LEFT JOIN upd u ON c.c_custkey = u.c_custkey
       GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""",
    doc="Database-side upsert certification: land `customer` in Derby "
    "via upsert_jdbc (staging table + one MERGE INTO), upsert an "
    "update batch (+500 balance for every 7th customer), read the "
    "table back and aggregate. The oracle states MERGE semantics as a "
    "left join on the original parquet, so a hash match proves the "
    "staged-MERGE path applies exactly last-write-wins semantics. "
    "Reference: etl/load.py:35-55 (INSERT .. ON CONFLICT DO UPDATE "
    "inside a Postgres transaction).",
)
def jdbc_upsert_agg(spark, sf_dir):
    from meteo_etl_spark.sources import jdbc

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    db = _scratch("derby_ups")
    url = f"jdbc:derby:{db}/db;create=true"
    opts = {"createTableColumnTypes": "c_mktsegment VARCHAR(16)"}
    jdbc.upsert_jdbc(cust, url, "customer_up", ["c_custkey"], options=opts)
    updates = cust.filter(F.col("c_custkey") % 7 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 500
    )
    jdbc.upsert_jdbc(updates, url, "customer_up", ["c_custkey"], options=opts)
    back = jdbc.read_jdbc(spark, url, "customer_up")
    return (
        back.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).alias("bal_cents"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "events_cdc_apply",
    """WITH snap AS (
         SELECT user_id, event_type, event_id, value FROM (
           SELECT user_id, event_type, event_id, value,
                  row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts DESC, event_id DESC) AS rn
           FROM events WHERE ts < TIMESTAMP '2024-01-20') WHERE rn = 1),
       chg AS (
         SELECT user_id, event_type, event_id, value,
                CASE WHEN value < 25.0 THEN 'D' ELSE 'U' END AS op,
                row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
         FROM events WHERE ts >= TIMESTAMP '2024-01-20'),
       latest AS (SELECT * FROM chg WHERE rn = 1)
       SELECT user_id, event_type, event_id, value FROM snap s
       WHERE NOT EXISTS (SELECT 1 FROM latest l
                         WHERE l.user_id = s.user_id
                           AND l.event_type = s.event_type)
       UNION ALL
       SELECT user_id, event_type, event_id, value FROM latest WHERE op <> 'D'
       ORDER BY user_id, event_type""",
    doc="CDC changelog application (operators/cdc.apply_changelog): the "
    "pre-cutoff last-write-wins state per (user_id, event_type) is the "
    "snapshot; post-cutoff rows form an I/U/D changelog (low-value "
    "rows become DELETE tombstones). The final verb per key wins: "
    "tombstoned keys vanish, updated keys take the newest row, "
    "untouched keys pass through the anti join. Extends the upsert "
    "family (reference etl/load.py:45-55 ON CONFLICT upsert) with the "
    "delete verb a CDC feed requires. Plan: one key shuffle LWWs the "
    "changelog; the snapshot-side anti join broadcasts the changelog "
    "key set under AQE when the feed is small (the nightly-CDC norm), "
    "so the snapshot itself never shuffles; compose with "
    "merge_parquet's partition-pruned rewrite to land the result.",
)
def events_cdc_apply(spark, sf_dir):
    from meteo_etl_spark.operators.cdc import apply_changelog
    from meteo_etl_spark.operators.upsert import dedup_last_write_wins

    cutoff = F.lit("2024-01-20").cast("timestamp")
    ev = load_table(spark, sf_dir, "events")
    order = [F.col("ts").desc(), F.col("event_id").desc()]
    snapshot = dedup_last_write_wins(
        ev.filter(F.col("ts") < cutoff), ["user_id", "event_type"], order
    ).select("user_id", "event_type", "event_id", "value")
    changes = (
        ev.filter(F.col("ts") >= cutoff)
        .withColumn(
            "op", F.when(F.col("value") < 25.0, F.lit("D")).otherwise(F.lit("U"))
        )
        .select("user_id", "event_type", "event_id", "value", "op", "ts")
    )
    applied = apply_changelog(
        snapshot, changes, ["user_id", "event_type"], order
    )
    return applied.orderBy("user_id", "event_type")


@query(
    "events_scd2",
    """WITH ch AS (
         SELECT user_id, ts, event_id, event_type, value,
                CASE WHEN value < 25.0 THEN 'D' ELSE 'U' END AS op
         FROM events),
       w AS (
         SELECT user_id, event_id, value, op,
                ts AS valid_from,
                lead(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS valid_to
         FROM ch)
       SELECT user_id, event_id, valid_from, valid_to,
              CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current,
              value
       FROM w WHERE op <> 'D'
       ORDER BY user_id, valid_from, event_id""",
    doc="Slowly-changing-dimension TYPE 2 history "
    "(operators/cdc.scd2_history): each user's change feed (events as "
    "attribute updates; low-value rows as delete tombstones) becomes "
    "versioned rows with half-open [valid_from, valid_to) validity — "
    "the point-in-time dimension shape that as-of joins and "
    "leakage-free training-feature extraction consume (the LATEST-only "
    "complement is events_cdc_apply). A tombstone closes the prior "
    "interval without opening one, so a deleted key has no current "
    "row. Plan: ONE key shuffle for the lead() window — no range "
    "self-join; at 100 TB each reducer holds one key's change rows "
    "and the op composes with partition pruning on the key's hash "
    "range.",
)
def events_scd2(spark, sf_dir):
    from meteo_etl_spark.operators.cdc import scd2_history

    ev = load_table(spark, sf_dir, "events").withColumn(
        "op", F.when(F.col("value") < 25.0, F.lit("D")).otherwise(F.lit("U"))
    )
    hist = scd2_history(ev, ["user_id"], "ts", tie_cols=["event_id"])
    return hist.select(
        "user_id", "event_id", "valid_from", "valid_to", "is_current", "value"
    ).orderBy("user_id", "valid_from", "event_id")


@query(
    "events_scd2_stream",
    """WITH ded AS (
         SELECT user_id, ts, event_id, value,
                CASE WHEN value < 25.0 THEN 'D' ELSE 'U' END AS op
         FROM (SELECT user_id, ts, event_id, value,
                      row_number() OVER (PARTITION BY user_id, ts
                                         ORDER BY event_id) AS rn
               FROM events) WHERE rn = 1),
       w AS (
         SELECT user_id, event_id, value, op,
                ts AS valid_from,
                lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
         FROM ded)
       SELECT user_id, event_id, valid_from, valid_to,
              CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current,
              value
       FROM w WHERE op <> 'D'
       ORDER BY user_id, valid_from""",
    doc="STREAMING SCD-2 maintenance certification "
    "(operators/cdc.scd2_foreach_batch): the events change feed "
    "(deduped to one change per (user, ts) — streaming SCD2's merge "
    "keys on valid_from; low-value rows as delete tombstones) is "
    "split into three time waves, each drained through a real "
    "Structured-Streaming file source (availableNow) whose "
    "foreachBatch merge-closes open intervals and inserts new ones "
    "into a hash-bucket-partitioned history table (merge pruned to "
    "buckets holding affected users). After the drain, a FULL "
    "REDELIVERY from a fresh checkpoint is asserted to be a no-op "
    "(the per-key frontier drops already-final changes) — then the "
    "final table is returned. The oracle states the batch SCD-2 "
    "(lead() over the whole feed) directly on parquet, so a hash "
    "match certifies streaming maintenance == batch rebuild AND "
    "redelivery idempotency in one driver row. 100 TB shape: "
    "per-batch work is O(batch + affected keys' open rows); history "
    "never rescans.",
)
def events_scd2_stream(spark, sf_dir):
    from meteo_etl_spark.operators.cdc import scd2_foreach_batch
    from meteo_etl_spark.operators.upsert import dedup_last_write_wins

    ev = load_table(spark, sf_dir, "events")
    ded = dedup_last_write_wins(
        ev.select("user_id", "ts", "event_id", "value"),
        ["user_id", "ts"],
        [F.col("event_id").asc()],
    ).withColumn(
        "op", F.when(F.col("value") < 25.0, F.lit("D")).otherwise(F.lit("U"))
    )
    feed = _scratch("scd2_feed")
    hist = _scratch("scd2_hist")
    ckpt = _scratch("scd2_ckpt")
    ckpt2 = _scratch("scd2_ckpt_redeliver")
    schema = ded.schema
    cuts = ["2024-01-11", "2024-01-21"]
    waves = [
        ded.filter(F.col("ts") < F.lit(cuts[0]).cast("timestamp")),
        ded.filter(
            (F.col("ts") >= F.lit(cuts[0]).cast("timestamp"))
            & (F.col("ts") < F.lit(cuts[1]).cast("timestamp"))
        ),
        ded.filter(F.col("ts") >= F.lit(cuts[1]).cast("timestamp")),
    ]

    def drain(checkpoint):
        handler = scd2_foreach_batch(
            spark,
            hist,
            ["user_id"],
            "ts",
            partition_col="kb",
            partition_expr=F.pmod(F.xxhash64(F.col("user_id")), F.lit(8)).cast(
                "int"
            ),
        )
        q = (
            spark.readStream.schema(schema)
            .parquet(feed)
            .writeStream.foreachBatch(handler)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        for wave in waves:
            wave.write.mode("append").parquet(feed)
            drain(ckpt)
        cols = [
            "user_id", "event_id", "valid_from", "valid_to", "is_current", "value"
        ]

        def checksum():
            # order-independent content fingerprint (1 row collected,
            # never the data): xxhash64 over the JSON row encoding —
            # to_json names present fields, so NULL placement changes
            # the hash (plain xxhash64(*cols) would skip NULLs)
            return (
                spark.read.parquet(hist)
                .select(*cols)
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(
                        F.xxhash64(F.to_json(F.struct(*cols))).cast(
                            "decimal(38,0)"
                        )
                    ).alias("h"),
                )
                .collect()[0]
            )

        before = checksum()
        # redelivery certification: a fresh checkpoint replays EVERY
        # file; the frontier must make it a pure no-op
        drain(ckpt2)
        if checksum() != before:
            raise RuntimeError("streaming SCD2 redelivery was not idempotent")
        # materialize the final table off the scratch path
        # (localCheckpoint severs the parquet lineage) so EVERY
        # scratch dir — history included — is removed before
        # returning: repeated bench invocations in one process leave
        # nothing behind and no interpreter-exit hook is needed
        return (
            spark.read.parquet(hist)
            .select(*cols)
            .orderBy("user_id", "valid_from")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(feed, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(ckpt2, ignore_errors=True)
        shutil.rmtree(hist, ignore_errors=True)


@query(
    "events_stream_dedup",
    """SELECT event_id, user_id, ts, value
       FROM events ORDER BY event_id""",
    doc="STREAMING exact-dedup certification "
    "(streaming/windows.dedup_stream — dropDuplicatesWithinWatermark, "
    "the state-bounded guard in front of an at-least-once source "
    "whose sink is not an idempotent merge): the events feed is "
    "drained through a real Structured-Streaming file source in two "
    "availableNow waves, with DUPLICATE deliveries injected both "
    "ACROSS waves (every 5th pre-cut event redelivered in wave 2 — "
    "state restored from the checkpoint must suppress it) and WITHIN "
    "a wave (every 7th post-cut event shipped twice in the same "
    "append — in-batch suppression), onto an append parquet sink "
    "with NO batch-side distinct anywhere. In-query assertions: "
    "output cardinality equals the source's and no event_id appears "
    "twice (RuntimeError otherwise), so the oracle — a plain SELECT "
    "of the original rows — hash-certifies that the STREAM suppressed "
    "every duplicate and corrupted nothing. The watermark delay (60 "
    "days) deliberately spans the whole fixture so suppression is "
    "deterministic; at 100 TB you size it to the real redelivery "
    "horizon and state stays O(keys within horizon), the "
    "dropDuplicatesWithinWatermark contract.",
)
def events_stream_dedup(spark, sf_dir):
    from meteo_etl_spark.streaming.windows import dedup_stream

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    cut = F.lit("2024-01-16").cast("timestamp")
    wave1 = ev.filter(F.col("ts") < cut)
    wave2 = ev.filter(F.col("ts") >= cut)
    redelivered = wave1.filter(F.col("event_id") % 5 == 0)
    in_batch_dup = wave2.filter(F.col("event_id") % 7 == 0)
    feed = _scratch("dedup_feed")
    out = _scratch("dedup_out")
    ckpt = _scratch("dedup_ckpt")
    schema = ev.schema

    def drain():
        q = (
            dedup_stream(
                spark.readStream.schema(schema).parquet(feed),
                ["event_id"],
                ts_col="ts",
                watermark_delay="60 days",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        wave1.write.mode("append").parquet(feed)
        drain()
        # wave 2 + cross-wave redeliveries + doubled in-wave rows land
        # as ONE append so a single drain sees them all
        wave2.unionByName(redelivered).unionByName(in_batch_dup).write.mode(
            "append"
        ).parquet(feed)
        drain()
        got = spark.read.parquet(out)
        stats = got.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("event_id").alias("nd"),
        ).collect()[0]
        n_src = ev.count()
        if stats["n"] != n_src or stats["nd"] != n_src:
            raise RuntimeError(
                f"stream dedup leaked: {stats['n']} rows / "
                f"{stats['nd']} distinct ids vs {n_src} source rows"
            )
        return (
            got.select("event_id", "user_id", "ts", "value")
            .orderBy("event_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(feed, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


@query(
    "events_stream_kmv",
    """WITH h AS (SELECT DISTINCT event_type,
                    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                      AS hv
             FROM events
             WHERE user_id IS NOT NULL),
    n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS exact_users
          FROM h GROUP BY event_type),
    r AS (SELECT event_type, hv,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
          FROM h),
    per AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ns, MAX(hv) AS kth
            FROM r WHERE rn <= 64 GROUP BY event_type)
    SELECT p.event_type,
           n.exact_users,
           CASE WHEN p.ns < 64 THEN p.ns
                ELSE CAST(floor(63.0 * 1152921504606846976.0
                                / CAST(p.kth AS DOUBLE) + 0.5) AS BIGINT)
           END AS est_users,
           p.ns
    FROM per p JOIN n USING (event_type)
    ORDER BY event_type""",
    doc="STREAMING KMV-sketch maintenance certification "
    "(sketches.kmv_merge_foreach_batch): the events feed drains "
    "through a real Structured-Streaming file source in two "
    "availableNow waves into a foreachBatch handler that maintains a "
    "persisted per-type KMV relation — with every 5th wave-1 event "
    "REDELIVERED in wave 2, because the whole point of a KMV store "
    "under an at-least-once source is that set-union + k-min is "
    "idempotent and needs no dedup bookkeeping. The handler applies "
    "the classic insert filter (a mature key admits only hashes "
    "below its k-th minimum, ~k/n of the stream). In-query "
    "certification: the maintained relation must EQUAL the one-shot "
    "batch sketch of the same corpus (RuntimeError otherwise); the "
    "returned per-type exact/estimate/size rows are then fully "
    "deterministic md5 arithmetic, so the oracle hash certifies the "
    "stream produced exactly the batch answer. Side-effecting "
    "(scratch feed/checkpoint/store); excluded from the bench roster.",
)
def events_stream_kmv(spark, sf_dir):
    from meteo_etl_spark.functions.sketches import (
        KMV_K,
        kmv_estimate,
        kmv_merge_foreach_batch,
        kmv_sketch,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "user_id"
    )
    cut = F.lit("2024-01-16").cast("timestamp")
    wave1 = ev.filter(F.col("ts") < cut)
    wave2 = ev.filter(F.col("ts") >= cut)
    redelivered = wave1.filter(F.col("event_id") % 5 == 0)
    feed = _scratch("kmv_feed")
    store = _scratch("kmv_store")
    ckpt = _scratch("kmv_ckpt")
    schema = ev.schema
    handler = kmv_merge_foreach_batch(spark, store, "event_type", "user_id")

    def drain():
        q = (
            spark.readStream.schema(schema)
            .parquet(feed)
            .writeStream.foreachBatch(handler)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        wave1.write.mode("append").parquet(feed)
        drain()
        wave2.unionByName(redelivered).write.mode("append").parquet(feed)
        drain()
        maintained = spark.read.parquet(store).select("key", "hv")
        batch = kmv_sketch(ev, "event_type", "user_id", KMV_K)
        diff = maintained.exceptAll(batch).unionByName(
            batch.exceptAll(maintained)
        )
        n_diff = diff.count()
        if n_diff:
            raise RuntimeError(
                f"streamed KMV relation diverges from the batch sketch "
                f"by {n_diff} rows — merge is not idempotent/lossless"
            )
        # mirror the sketch's drop-at-scan rule: NULL user_ids carry no
        # hash, so the exact census must exclude them too
        exact = (
            ev.select("event_type", "user_id")
            .filter(F.col("user_id").isNotNull())
            .distinct()
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("exact_users"))
        )
        per = maintained.groupBy("key").agg(
            F.count(F.lit(1)).alias("ns"), F.max("hv").alias("kth")
        )
        return (
            per.select(
                F.col("key").alias("event_type"),
                kmv_estimate(F.col("ns"), F.col("kth"), KMV_K).alias(
                    "est_users"
                ),
                "ns",
            )
            .join(exact, "event_type")
            .select("event_type", "exact_users", "est_users", "ns")
            .orderBy("event_type")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(feed, ignore_errors=True)
        shutil.rmtree(store, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


@query(
    "rollup_incremental_agg",
    """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
              COUNT(*) AS n,
              CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                AS value_cents
       FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    doc="Incremental-rollup certification (operators/incremental.py): "
    "land the pre-cutoff events as a day-partitioned fact and refresh "
    "the rollup; append the post-cutoff events and refresh AGAIN — the "
    "second refresh recomputes only the days the append touched "
    "(partition fingerprints; asserted inside the query) — then "
    "return the final rollup state. The oracle states the same "
    "aggregate over ALL events directly, so a hash match proves "
    "incremental maintenance converges to the full recompute. "
    "Exact-cents SUM keeps the compare order-independent. The 100 TB "
    "shape under certification: refresh cost bound by the delta, not "
    "the table.",
)
def rollup_incremental_agg(spark, sf_dir):
    from meteo_etl_spark.operators.incremental import (
        incremental_rollup,
        read_rollup,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    cutoff = F.lit("2024-01-20").cast("timestamp")
    fact = _scratch("rollup_fact")
    state = _scratch("rollup_state")
    ev.filter(F.col("ts") < cutoff).write.partitionBy("day").parquet(fact)

    def build(df):
        return df.groupBy("day", "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("value_cents"),
        )

    first = incremental_rollup(spark, fact, state, "day", build)
    late = ev.filter(F.col("ts") >= cutoff)
    late.write.mode("append").partitionBy("day").parquet(fact)
    second = incremental_rollup(spark, fact, state, "day", build)
    # the append touched only the post-cutoff days: the second refresh
    # must be partial (strictly fewer recomputes than a full rebuild)
    late_days = {r["day"] for r in late.select("day").distinct().collect()}
    pre_days = first.total
    # RuntimeError, not assert: these invariants ARE what this query
    # certifies, and bare asserts vanish under `python -O`.
    if second.recomputed != len(late_days):
        raise RuntimeError(
            f"incremental refresh was not partial: {second} vs {late_days}"
        )
    # every pre-cutoff day the append did NOT touch stays byte-stable
    overlap = len(late_days) - (second.total - pre_days)
    if second.unchanged != pre_days - overlap:
        raise RuntimeError(
            f"unchanged-partition count drifted: {first} vs {second}"
        )
    return (
        read_rollup(spark, state)
        # hive partition inference types day as DATE on read-back
        .select(
            F.col("day").cast("string").alias("day"),
            "event_type",
            "n",
            "value_cents",
        )
        .orderBy("day", "event_type")
    )


@query(
    "events_scd2_pit_join",
    """WITH ch AS (
         SELECT user_id, ts, event_id, value,
                CASE WHEN value < 25.0 THEN 'D' ELSE 'U' END AS op
         FROM events WHERE event_type <> 'purchase'),
       dim AS (
         SELECT user_id, event_id AS version_id, value AS profile_value,
                ts AS valid_from,
                lead(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS valid_to,
                op
         FROM ch),
       v AS (SELECT * FROM dim WHERE op <> 'D')
       SELECT p.event_id, p.user_id, v.version_id,
              CAST(floor(v.profile_value * 100 + 0.5) AS BIGINT)
                AS profile_cents
       FROM events p
       LEFT JOIN v ON v.user_id = p.user_id
                  AND v.valid_from <= p.ts
                  AND (v.valid_to IS NULL OR p.ts < v.valid_to)
       WHERE p.event_type = 'purchase'
       ORDER BY p.event_id""",
    doc="Point-in-time (leakage-free) dimension join: each purchase "
    "fact picks the SCD Type-2 profile version that was valid AT its "
    "timestamp — the feature-extraction join that prevents "
    "train-serve skew (joining the LATEST profile would leak future "
    "attribute values into past training rows). Dimension = "
    "cdc.scd2_history over the non-purchase change feed; facts keep "
    "rows with no valid version (LEFT join — deleted/never-seen "
    "users). Plan: equi join on user_id with the validity range as a "
    "residual predicate — SortMergeJoin/broadcast under AQE, never a "
    "nested loop; the half-open intervals guarantee AT MOST ONE "
    "matching version per fact, so the join cannot fan out.",
    bench=True,
)
def events_scd2_pit_join(spark, sf_dir):
    from meteo_etl_spark.operators.cdc import scd2_history

    ev = load_table(spark, sf_dir, "events")
    changes = ev.filter(F.col("event_type") != "purchase").withColumn(
        "op", F.when(F.col("value") < 25.0, F.lit("D")).otherwise(F.lit("U"))
    )
    dim = scd2_history(changes, ["user_id"], "ts", tie_cols=["event_id"]).select(
        F.col("user_id").alias("d_user"),
        F.col("event_id").alias("version_id"),
        F.col("value").alias("profile_value"),
        "valid_from",
        "valid_to",
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    cond = (
        (F.col("d_user") == F.col("user_id"))
        & (F.col("valid_from") <= F.col("ts"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
    )
    return (
        purchases.join(dim, cond, "left")
        .select(
            "event_id",
            "user_id",
            "version_id",
            F.floor(F.col("profile_value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("profile_cents"),
        )
        .orderBy("event_id")
    )
