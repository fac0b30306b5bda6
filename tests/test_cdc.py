"""CDC changelog application (operators/cdc.apply_changelog).

The upsert family's third verb: delete tombstones. Edge semantics
pinned here; the oracle-checked events_cdc_apply query certifies the
values at sf against DuckDB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meteo_etl_spark.operators.cdc import apply_changelog


def _snap(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k int, name string, v double",
    )


def _chg(spark, rows):
    return spark.createDataFrame(rows, "k int, name string, v double, op string, seq int")


def _apply(snap, chg):
    return apply_changelog(snap, chg, ["k"], [F.col("seq").desc()])


def test_update_insert_delete(spark):
    chg = _chg(
        spark,
        [
            (2, "b2", 21.0, "U", 1),  # update existing
            (4, "d", 40.0, "U", 1),  # insert new key
            (3, "c", 0.0, "D", 1),  # delete existing
            (9, "x", 0.0, "D", 1),  # delete unseen key: no-op
        ],
    )
    out = _apply(_snap(spark), chg).orderBy("k").collect()
    assert [(r.k, r.name, r.v) for r in out] == [
        (1, "a", 10.0),
        (2, "b2", 21.0),
        (4, "d", 40.0),
    ]


def test_last_verb_wins(spark):
    chg = _chg(
        spark,
        [
            (1, "a1", 11.0, "U", 1),
            (1, "a", 0.0, "D", 2),  # delete AFTER the update: key vanishes
            (2, "b", 0.0, "D", 1),
            (2, "b9", 29.0, "U", 2),  # re-insert AFTER the delete: key survives
        ],
    )
    out = _apply(_snap(spark), chg).orderBy("k").collect()
    assert [(r.k, r.name, r.v) for r in out] == [(2, "b9", 29.0), (3, "c", 30.0)]


def test_empty_changelog_is_identity(spark):
    chg = _chg(spark, [])
    out = _apply(_snap(spark), chg).orderBy("k").collect()
    assert [(r.k, r.name, r.v) for r in out] == [
        (1, "a", 10.0),
        (2, "b", 20.0),
        (3, "c", 30.0),
    ]


def test_missing_columns_rejected(spark):
    bad = spark.createDataFrame([(1, "U", 1)], "k int, op string, seq int")
    with pytest.raises(ValueError, match="missing columns"):
        apply_changelog(_snap(spark), bad, ["k"], [F.col("seq").desc()])


def test_idempotent_reapplication(spark):
    """Replaying the same changelog over the applied state is a no-op
    (at-least-once delivery safety, the ST2 discipline)."""
    chg = _chg(spark, [(2, "b2", 21.0, "U", 1), (3, "c", 0.0, "D", 1)])
    once = _apply(_snap(spark), chg)
    twice = _apply(once, chg)
    assert sorted((r.k, r.name, r.v) for r in twice.collect()) == sorted(
        (r.k, r.name, r.v) for r in once.collect()
    )


# ---------------------------------------------------------------------------
# Parquet CDC sink: apply_changelog_parquet / merge_parquet(delete_keys=...)
# ---------------------------------------------------------------------------

import os

from meteo_etl_spark.operators.cdc import apply_changelog_parquet
from meteo_etl_spark.operators.upsert import merge_parquet


def _state(spark, path):
    return sorted(
        (r.k, r.name, r.v)
        for r in spark.read.parquet(path).select("k", "name", "v").collect()
    )


def test_parquet_sink_applies_all_verbs(spark, tmp_path):
    path = str(tmp_path / "t")
    _snap(spark).write.parquet(path)
    chg = _chg(
        spark,
        [
            (2, "b2", 21.0, "U", 1),
            (3, "c", 0.0, "D", 1),
            (4, "d", 40.0, "U", 1),
        ],
    )
    stats = apply_changelog_parquet(
        spark, path, chg, ["k"], [F.col("seq").desc()]
    )
    assert _state(spark, path) == [(1, "a", 10.0), (2, "b2", 21.0), (4, "d", 40.0)]
    assert (stats.inserted, stats.updated, stats.deleted) == (1, 1, 1)
    assert stats.target_rows == 3


def test_parquet_sink_idempotent_redelivery(spark, tmp_path):
    path = str(tmp_path / "t")
    _snap(spark).write.parquet(path)
    chg = _chg(spark, [(2, "b2", 21.0, "U", 1), (3, "c", 0.0, "D", 1)])
    apply_changelog_parquet(spark, path, chg, ["k"], [F.col("seq").desc()])
    once = _state(spark, path)
    apply_changelog_parquet(spark, path, chg, ["k"], [F.col("seq").desc()])
    assert _state(spark, path) == once


def test_parquet_sink_last_verb_wins(spark, tmp_path):
    path = str(tmp_path / "t")
    _snap(spark).write.parquet(path)
    chg = _chg(
        spark,
        [
            (1, "a1", 11.0, "U", 1),
            (1, "a", 0.0, "D", 2),  # delete wins over the earlier update
            (3, "c9", 39.0, "D", 1),
            (3, "c9", 39.0, "U", 2),  # re-insert wins over the earlier delete
        ],
    )
    apply_changelog_parquet(spark, path, chg, ["k"], [F.col("seq").desc()])
    assert _state(spark, path) == [(2, "b", 20.0), (3, "c9", 39.0)]


def test_partitioned_delete_prunes_untouched_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10.0, "p1"), (2, "b", 20.0, "p1"), (3, "c", 30.0, "p2")],
        "k int, name string, v double, part string",
    )
    base.write.partitionBy("part").parquet(path)
    before = {
        f: os.path.getmtime(os.path.join(path, "part=p2", f))
        for f in os.listdir(os.path.join(path, "part=p2"))
        if f.endswith(".parquet")
    }
    chg = spark.createDataFrame(
        [(1, "a", 0.0, "p1", "D", 1)],
        "k int, name string, v double, part string, op string, seq int",
    )
    stats = apply_changelog_parquet(
        spark, path, chg, ["k"], [F.col("seq").desc()], partition_col="part"
    )
    assert stats.deleted == 1 and stats.inserted == 0 and stats.updated == 0
    got = sorted(
        (r.k, r.part) for r in spark.read.parquet(path).select("k", "part").collect()
    )
    assert got == [(2, "p1"), (3, "p2")]
    after = {
        f: os.path.getmtime(os.path.join(path, "part=p2", f))
        for f in os.listdir(os.path.join(path, "part=p2"))
        if f.endswith(".parquet")
    }
    assert after == before  # p2 files untouched: the delete pass pruned


def test_delete_keys_require_partition_col(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10.0, "p1")], "k int, name string, v double, part string"
    )
    base.write.partitionBy("part").parquet(path)
    dels = spark.createDataFrame([(1,)], "k int")
    ups = spark.createDataFrame([], "k int, name string, v double, part string")
    with pytest.raises(ValueError, match="partition col"):
        merge_parquet(
            spark, path, ups, ["k"], partition_col="part", delete_keys=dels
        )


def test_merge_delete_and_update_same_key_nets_to_update(spark, tmp_path):
    """Raw merge_parquet contract: a key in BOTH delete_keys and
    updates → drop-then-insert (the update wins)."""
    path = str(tmp_path / "t")
    _snap(spark).write.parquet(path)
    ups = spark.createDataFrame([(2, "b9", 29.0)], "k int, name string, v double")
    dels = spark.createDataFrame([(2,), (3,)], "k int")
    stats = merge_parquet(spark, path, ups, ["k"], delete_keys=dels)
    assert _state(spark, path) == [(1, "a", 10.0), (2, "b9", 29.0)]
    assert (stats.inserted, stats.updated, stats.deleted) == (1, 0, 2)


def test_atomic_layout_cdc(spark, tmp_path):
    from meteo_etl_spark.operators.atomic import read_table

    path = str(tmp_path / "t")
    chg0 = _chg(
        spark,
        [(1, "a", 10.0, "U", 1), (2, "b", 20.0, "U", 1), (3, "c", 30.0, "U", 1)],
    )
    apply_changelog_parquet(
        spark, path, chg0, ["k"], [F.col("seq").desc()], atomic=True
    )
    chg1 = _chg(spark, [(2, "b", 0.0, "D", 2), (4, "d", 40.0, "U", 2)])
    stats = apply_changelog_parquet(
        spark, path, chg1, ["k"], [F.col("seq").desc()], atomic=True
    )
    got = sorted((r.k, r.name, r.v) for r in read_table(spark, path).collect())
    assert got == [(1, "a", 10.0), (3, "c", 30.0), (4, "d", 40.0)]
    assert (stats.inserted, stats.updated, stats.deleted) == (1, 0, 1)


def test_streaming_changelog_sink(spark, tmp_path):
    """Structured-Streaming CDC e2e: a file-source changelog stream
    lands through changelog_foreach_batch; a second run with new
    change files (same checkpoint) applies only the new batch."""
    import json

    from meteo_etl_spark.operators.cdc import changelog_foreach_batch

    src = tmp_path / "feed"
    src.mkdir()
    tgt = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    schema = "k int, name string, v double, op string, seq int"

    def emit(fname, rows):
        (src / fname).write_text(
            "\n".join(
                json.dumps(dict(zip(["k", "name", "v", "op", "seq"], r)))
                for r in rows
            )
        )

    def run():
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            stream.writeStream.foreachBatch(
                changelog_foreach_batch(
                    spark, tgt, ["k"], lambda: [F.col("seq").desc()]
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    emit("b0.json", [(1, "a", 10.0, "U", 1), (2, "b", 20.0, "U", 1)])
    run()
    assert _state(spark, tgt) == [(1, "a", 10.0), (2, "b", 20.0)]

    emit("b1.json", [(1, "a", 0.0, "D", 2), (3, "c", 30.0, "U", 2)])
    run()
    assert _state(spark, tgt) == [(2, "b", 20.0), (3, "c", 30.0)]


def test_delete_empties_whole_partition_plain(spark, tmp_path):
    """All rows of a partition tombstoned → the partition DIRECTORY is
    removed (dynamic overwrite alone cannot drop a partition absent
    from the written data — the deletes would silently resurface)."""
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, 10.0, "p1"), (2, 20.0, "p1"), (3, 30.0, "p2")],
        "k int, v double, part string",
    )
    base.write.partitionBy("part").parquet(path)
    chg = spark.createDataFrame(
        [(3, 0.0, "p2", "D", 1)],
        "k int, v double, part string, op string, seq int",
    )
    stats = apply_changelog_parquet(
        spark, path, chg, ["k"], [F.col("seq").desc()], partition_col="part"
    )
    assert stats.deleted == 1
    got = sorted((r.k, r.part) for r in spark.read.parquet(path).select("k", "part").collect())
    assert got == [(1, "p1"), (2, "p1")]
    assert not os.path.isdir(os.path.join(path, "part=p2"))


def test_delete_empties_whole_table_partitioned(spark, tmp_path):
    """Every partition emptied in one batch: nothing to stage, every
    affected partition dropped, table reads back empty."""
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, 10.0, "p1"), (2, 20.0, "p2")], "k int, v double, part string"
    )
    base.write.partitionBy("part").parquet(path)
    chg = spark.createDataFrame(
        [(1, 0.0, "p1", "D", 1), (2, 0.0, "p2", "D", 1)],
        "k int, v double, part string, op string, seq int",
    )
    stats = apply_changelog_parquet(
        spark, path, chg, ["k"], [F.col("seq").desc()], partition_col="part"
    )
    assert stats.deleted == 2 and stats.target_rows == 0


def test_delete_empties_whole_partition_atomic(spark, tmp_path):
    """Atomic layout: the emptied partition leaves the manifest in the
    SAME commit; time travel still sees it at the previous version."""
    from meteo_etl_spark.operators.atomic import AtomicParquetTable, read_table

    path = str(tmp_path / "t")
    t = AtomicParquetTable(spark, path, partition_col="part")
    t.overwrite(
        spark.createDataFrame(
            [(1, 10.0, "p1"), (3, 30.0, "p2")], "k int, v double, part string"
        )
    )
    chg = spark.createDataFrame(
        [(3, 0.0, "p2", "D", 1), (1, 11.0, "p1", "U", 1)],
        "k int, v double, part string, op string, seq int",
    )
    stats = apply_changelog_parquet(
        spark, path, chg, ["k"], [F.col("seq").desc()],
        partition_col="part", atomic=True,
    )
    assert stats.deleted == 1 and stats.updated == 1
    got = sorted((r.k, r.v, r.part) for r in read_table(spark, path).collect())
    assert got == [(1, 11.0, "p1")]
    prev = sorted((r.k, r.part) for r in t.read(version=1).select("k", "part").collect())
    assert prev == [(1, "p1"), (3, "p2")]  # snapshot history intact


def test_atomic_drop_spares_restaged_partition(spark, tmp_path):
    """overwrite_partitions(drop=...) removes a listed partition ONLY
    when the staged data does not re-create it."""
    from meteo_etl_spark.operators.atomic import AtomicParquetTable, read_table

    path = str(tmp_path / "t")
    t = AtomicParquetTable(spark, path, partition_col="part")
    t.overwrite(
        spark.createDataFrame(
            [(1, "p1"), (2, "p2")], "k int, part string"
        )
    )
    t.overwrite_partitions(
        spark.createDataFrame([(9, "p1")], "k int, part string"),
        drop=["part=p1", "part=p2"],
    )
    got = sorted((r.k, r.part) for r in read_table(spark, path).collect())
    assert got == [(9, "p1")]  # p1 restaged (kept, new data), p2 dropped


# ---------------------------------------------------------------------------
# SCD Type 2 history
# ---------------------------------------------------------------------------


def _hist_rows(spark, rows):
    from meteo_etl_spark.operators.cdc import scd2_history

    df = spark.createDataFrame(rows, "k int, ts int, seq int, op string, v string")
    return {
        (r["k"], r["valid_from"]): (r["valid_to"], r["is_current"], r["v"])
        for r in scd2_history(df, ["k"], "ts", tie_cols=["seq"]).collect()
    }


def test_scd2_intervals_chain_and_delete_closes(spark):
    got = _hist_rows(
        spark,
        [
            (1, 10, 0, "I", "a"),
            (1, 20, 0, "U", "b"),
            (1, 30, 0, "D", None),  # tombstone: closes b, opens nothing
            (2, 15, 0, "I", "x"),
        ],
    )
    assert got == {
        (1, 10): (20, 0, "a"),
        (1, 20): (30, 0, "b"),  # closed BY the delete's ts
        (2, 15): (None, 1, "x"),
    }
    # key 1 was deleted: no current row for it
    assert not any(k == 1 and cur == 1 for (k, _), (_, cur, _) in got.items())


def test_scd2_same_ts_tie_breaks_on_seq(spark):
    got = _hist_rows(
        spark,
        [(1, 10, 1, "U", "late"), (1, 10, 0, "U", "early")],
    )
    assert got[(1, 10)] == (10, 1, "late") or list(got) == [(1, 10)]
    # lead() pairs the seq=0 row with the seq=1 row at the same ts:
    # the final version is 'late' and it is the only current row
    current = [(v, cur) for (_, _), (_, cur, v) in got.items() if cur == 1]
    assert current == [("late", 1)]


def test_scd2_requires_columns(spark):
    from meteo_etl_spark.operators.cdc import scd2_history

    df = spark.createDataFrame([(1, 2)], "k int, ts int")
    with pytest.raises(ValueError):
        scd2_history(df, ["k"], "ts")  # no op column


def test_streaming_scd2_matches_batch_twin_and_redelivery(spark, tmp_path):
    """Streaming SCD-2 maintenance e2e (r7 verdict order #6): a change
    feed drained one file per micro-batch through scd2_foreach_batch
    must build EXACTLY the table the batch builder (scd2_history — the
    events_scd2-certified kernel) produces over the whole feed;
    full redelivery from a fresh checkpoint is a no-op (the per-key
    frontier drops already-final changes before any write); and an
    incremental wave (including re-insert after delete) keeps the
    batch-twin equality."""
    import json
    from datetime import datetime, timezone

    from meteo_etl_spark.operators.cdc import scd2_foreach_batch, scd2_history

    src = tmp_path / "feed"
    src.mkdir()
    tgt = str(tmp_path / "hist")
    schema = "k string, ts timestamp, v double, op string"

    def emit(fname, rows):
        (src / fname).write_text(
            "\n".join(
                json.dumps({"k": k, "ts": f"2024-01-01 {h:02d}:00:00", "v": v, "op": op})
                for k, h, v, op in rows
            )
        )

    plans: list[str] = []

    def run(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = (
            stream.writeStream.foreachBatch(
                scd2_foreach_batch(
                    spark, tgt, ["k"], "ts", frontier_plan_log=plans
                )
            )
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def twin(rows):
        df = spark.createDataFrame(
            [
                (k, datetime(2024, 1, 1, h, tzinfo=timezone.utc), v, op)
                for k, h, v, op in rows
            ],
            schema,
        )
        return scd2_history(df, ["k"], "ts")

    def snap(df):
        return sorted(
            (r["k"], r["v"], r["op"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in df.select(
                "k", "v", "op", "valid_from", "valid_to", "is_current"
            ).collect()
        )

    wave1 = [
        ("a", 1, 10.0, "U"), ("b", 1, 5.0, "U"),   # file b0
        ("a", 2, 11.0, "U"),                         # file b1
        ("a", 3, 0.0, "D"), ("b", 4, 6.0, "U"),    # file b2
    ]
    # drain between emissions: the per-key append-order contract is the
    # feed's job (a keyed Kafka topic gives it; file mtime ties don't)
    emit("b0.json", wave1[:2])
    run("ck1")
    emit("b1.json", wave1[2:3])
    run("ck1")
    emit("b2.json", wave1[3:])
    run("ck1")
    assert snap(spark.read.parquet(tgt)) == snap(twin(wave1))
    # key a is deleted (no open row); b open at hour 4
    cur = {r["k"] for r in spark.read.parquet(tgt).filter(F.col("is_current") == 1).collect()}
    assert cur == {"b"}

    # full redelivery: fresh checkpoint replays every file — frontier
    # filtering makes it a pure no-op
    before = snap(spark.read.parquet(tgt))
    run("ck2")
    assert snap(spark.read.parquet(tgt)) == before

    # incremental wave: re-insert after delete + a new delete
    wave2 = [("a", 5, 12.0, "U"), ("b", 6, 0.0, "D")]
    emit("b3.json", wave2)
    run("ck1")
    assert snap(spark.read.parquet(tgt)) == snap(twin(wave1 + wave2))
    cur = {r["k"] for r in spark.read.parquet(tgt).filter(F.col("is_current") == 1).collect()}
    assert cur == {"a"}

    # r8 verdict order #4: with NO layout passed, the history defaults
    # to the key-derived kb hash bucket and the per-batch frontier
    # read is partition-PRUNED in-plan (never an O(history) scan)
    import os

    assert any(d.startswith("kb=") for d in os.listdir(tgt))
    assert plans, "frontier plan log never captured a history read"
    for p in plans:
        seg = p.split("PartitionFilters: [", 1)
        assert len(seg) == 2, f"frontier scan carries no PartitionFilters:\n{p}"
        assert seg[1].lstrip()[0] != "]", (
            f"frontier scan's PartitionFilters are EMPTY:\n{p}"
        )
        assert "kb" in seg[1][:200]


def test_streaming_scd2_prune_guard_rejects_non_key_expr(spark, tmp_path):
    """A partition layout derived from NON-key columns must not prune
    the frontier read (a key's rows in other partitions would be
    missed, silently re-applying changes): prune_partitions=True
    raises; the default (None) degrades to the unpruned full scan and
    stays correct."""
    from meteo_etl_spark.operators.cdc import scd2_foreach_batch, scd2_history

    df = spark.createDataFrame(
        [("a", "2024-01-01 01:00:00", 1.0, "U"),
         ("a", "2024-01-02 01:00:00", 2.0, "U")],
        "k string, ts string, v double, op string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    # non-key-derived layout (the classic date partition) + required
    # pruning -> refused before any write
    strict = scd2_foreach_batch(
        spark,
        str(tmp_path / "h1"),
        ["k"],
        "ts",
        prune_partitions=True,
        partition_col="day",
        partition_expr=F.date_format("ts", "yyyy-MM-dd"),
    )
    with pytest.raises(ValueError, match="non-key columns"):
        strict(df, 0)

    # default (auto): same layout is accepted but NOT pruned — one
    # key's intervals span day partitions and redelivery stays a no-op
    tgt = str(tmp_path / "h2")
    plans: list[str] = []
    auto = scd2_foreach_batch(
        spark,
        tgt,
        ["k"],
        "ts",
        partition_col="day",
        partition_expr=F.date_format("ts", "yyyy-MM-dd"),
        frontier_plan_log=plans,
    )
    auto(df.filter("v = 1.0"), 0)
    auto(df.filter("v = 2.0"), 1)
    auto(df.filter("v = 2.0"), 1)  # redelivery: frontier must drop it
    expect = sorted(
        (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_history(df, ["k"], "ts").collect()
    )
    got = sorted(
        (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in spark.read.parquet(tgt)
        .select("k", "v", "valid_from", "valid_to", "is_current")
        .collect()
    )
    assert got == expect
    # and the frontier scans were genuinely unpruned
    for p in plans:
        if "PartitionFilters: [" in p:
            assert p.split("PartitionFilters: [", 1)[1].lstrip()[0] == "]"


def test_streaming_scd2_partition_col_without_expr_or_column_raises(spark, tmp_path):
    """partition_col with no partition_expr and no such batch column:
    a clear ValueError, not an AttributeError on a None expr."""
    from meteo_etl_spark.operators.cdc import scd2_foreach_batch

    df = spark.createDataFrame(
        [("a", "2024-01-01 01:00:00", 1.0, "U")],
        "k string, ts string, v double, op string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    handle = scd2_foreach_batch(
        spark, str(tmp_path / "h"), ["k"], "ts", partition_col="zone"
    )
    with pytest.raises(ValueError, match="absent from the batch frame"):
        handle(df, 0)


def test_streaming_scd2_duplicate_key_ts_rejected(spark, tmp_path):
    from meteo_etl_spark.operators.cdc import scd2_foreach_batch

    df = spark.createDataFrame(
        [("a", "2024-01-01 01:00:00", 1.0, "U"),
         ("a", "2024-01-01 01:00:00", 2.0, "U")],
        "k string, ts string, v double, op string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    handle = scd2_foreach_batch(spark, str(tmp_path / "h"), ["k"], "ts")
    with pytest.raises(RuntimeError, match="duplicate"):
        handle(df, 0)


def test_scd2_stream_query_leaves_no_scratch_and_no_atexit(spark):
    """Round-10 order: the registered events_scd2_stream query must
    clean ALL its scratch dirs (history included — the returned frame
    is localCheckpoint-materialized off the parquet path) and must
    not install interpreter-exit hooks. Two invocations in one
    process: second still correct, zero /tmp/meteo_scd2_* growth."""
    import glob
    import inspect

    from meteo_etl_spark.plans import queries as Q

    spec = Q.get("events_scd2_stream")
    assert "atexit" not in inspect.getsource(spec.fn)
    before = set(glob.glob("/tmp/meteo_scd2_*"))
    n0 = spec.fn(spark, "/root/testdata/sf0.001").count()
    n1 = spec.fn(spark, "/root/testdata/sf0.001").count()
    assert n0 == n1 > 0
    assert set(glob.glob("/tmp/meteo_scd2_*")) == before


def test_streaming_scd2_legacy_unpartitioned_table_detected(spark, tmp_path):
    """ADVICE r9: a history table created BEFORE the auto kb-bucket
    default (unpartitioned) must keep working when a new deployment
    runs with defaults — first batch detects the missing kb column,
    warns, and serves the legacy unpartitioned path instead of
    failing both the frontier read and the merge prune."""
    import warnings as w

    from meteo_etl_spark.operators.cdc import scd2_foreach_batch

    tgt = str(tmp_path / "hist")

    def batch(rows):
        return spark.createDataFrame(
            rows, "k string, ts string, v double, op string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    # legacy table: explicitly unpartitioned (the pre-r9 default)
    legacy = scd2_foreach_batch(spark, tgt, ["k"], "ts", partition_col=None)
    legacy(batch([("a", "2024-01-01 01:00:00", 1.0, "U")]), 0)
    assert "kb" not in spark.read.parquet(tgt).columns

    # new deployment, default (auto kb) layout, same table
    handle = scd2_foreach_batch(spark, tgt, ["k"], "ts")
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        handle(batch([("a", "2024-01-01 02:00:00", 2.0, "U"),
                      ("b", "2024-01-01 02:00:00", 9.0, "U")]), 1)
    assert any("UNPARTITIONED" in str(c.message) for c in caught), [
        str(c.message) for c in caught
    ]
    out = spark.read.parquet(tgt)
    assert "kb" not in out.columns
    rows = {(r["k"], r["is_current"]): r for r in out.collect()}
    assert rows[("a", 1)]["v"] == 2.0 and rows[("a", 0)]["v"] == 1.0
    assert rows[("b", 1)]["v"] == 9.0
    # redelivery through the SAME handler stays a no-op (frontier
    # works on the legacy path too)
    handle(batch([("a", "2024-01-01 02:00:00", 2.0, "U")]), 2)
    assert spark.read.parquet(tgt).count() == 3
    # a FRESH table under the same defaults still gets the kb layout
    tgt2 = str(tmp_path / "hist2")
    scd2_foreach_batch(spark, tgt2, ["k"], "ts")(
        batch([("a", "2024-01-01 01:00:00", 1.0, "U")]), 0
    )
    assert "kb" in spark.read.parquet(tgt2).columns


def test_streaming_scd2_legacy_table_with_demanded_pruning_raises(spark, tmp_path):
    """prune_partitions=True is a contract, not a hint: against a
    pre-kb legacy table the handler must raise on the first batch
    instead of silently serving full-history frontier scans."""
    import pytest

    from meteo_etl_spark.operators.cdc import scd2_foreach_batch

    tgt = str(tmp_path / "hist")

    def batch(rows):
        return spark.createDataFrame(
            rows, "k string, ts string, v double, op string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    legacy = scd2_foreach_batch(spark, tgt, ["k"], "ts", partition_col=None)
    legacy(batch([("a", "2024-01-01 01:00:00", 1.0, "U")]), 0)

    demanded = scd2_foreach_batch(
        spark, tgt, ["k"], "ts", prune_partitions=True
    )
    with pytest.raises(ValueError, match="cannot be pruned"):
        demanded(batch([("a", "2024-01-01 02:00:00", 2.0, "U")]), 1)
    # the failed batch must not have touched the table
    assert spark.read.parquet(tgt).count() == 1


def test_streaming_scd2_foreign_partition_layout_raises_not_mixes(spark, tmp_path):
    """r10 ADVICE: 'no kb column' must not be read as 'unpartitioned'.
    A history table an older deployment laid out on a DIFFERENT
    explicit partition column, later driven with the auto-layout
    default, must fail loudly — merging with partition kwargs
    stripped would silently rewrite/mix the table's physical layout."""
    import pytest

    from meteo_etl_spark.operators.cdc import scd2_foreach_batch

    tgt = str(tmp_path / "hist")

    def batch(rows):
        return spark.createDataFrame(
            rows, "k string, ts string, v double, op string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    # older deployment: explicit partition layout on a day column
    old = scd2_foreach_batch(
        spark,
        tgt,
        ["k"],
        "ts",
        partition_col="day",
        partition_expr=F.to_date(F.col("ts")).cast("string"),
        prune_partitions=False,
    )
    old(batch([("a", "2024-01-01 01:00:00", 1.0, "U")]), 0)
    import glob as _glob

    assert _glob.glob(str(tmp_path / "hist" / "day=*")), "fixture must be partitioned"

    # new deployment with auto-layout defaults: must raise, not degrade
    handle = scd2_foreach_batch(spark, tgt, ["k"], "ts")
    with pytest.raises(ValueError, match="partitioned on \\['day'\\]"):
        handle(batch([("a", "2024-01-01 02:00:00", 2.0, "U")]), 1)
    # the failed batch must not have touched the table
    assert spark.read.parquet(tgt).count() == 1
    # the explicit old layout keeps working
    old(batch([("a", "2024-01-02 01:00:00", 3.0, "U")]), 1)
    assert spark.read.parquet(tgt).count() == 2


def test_foreign_layout_check_propagates_listdir_failures(monkeypatch):
    """Self-review r11: an I/O fault during the foreign-layout SAFETY
    check must fail loudly — returning an empty set would read as
    'verified unpartitioned' and green-light the kwarg-stripped merge
    the guard exists to block."""
    import pytest

    from meteo_etl_spark.operators import fsio
    from meteo_etl_spark.operators.cdc import _partition_dirs_other_than

    def boom(self, path):
        raise OSError("transient listdir fault")

    monkeypatch.setattr(fsio.LocalIO, "listdir", boom)
    with pytest.raises(OSError, match="transient listdir fault"):
        _partition_dirs_other_than(None, "/tmp/nonexistent-scd2", "kb")
