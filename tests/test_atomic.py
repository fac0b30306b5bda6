"""Crash-atomicity of the versioned-manifest table (operators/atomic).

The contract under test: a merge/overwrite that dies at ANY point
before the manifest flip leaves the previous snapshot bit-identical and
readable; the flip itself is a single atomic rename. This is the
parquet analogue of the reference's transactional upsert
(`etl/load.py:35-57` runs inside a Postgres transaction).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from meteo_etl_spark.operators.atomic import (
    AtomicParquetTable,
    is_atomic_table,
    read_table,
)
from meteo_etl_spark.operators.upsert import merge_parquet


class Boom(RuntimeError):
    pass


def _df(spark, rows):
    return spark.createDataFrame([Row(k=k, v=v, d=d) for k, v, d in rows])


def _snapshot(spark, path):
    return {(r.k, r.v, r.d) for r in read_table(spark, path).collect()}


def test_roundtrip_partitioned(spark, tmp_path):
    t = AtomicParquetTable(spark, str(tmp_path / "t"), partition_col="d")
    t.overwrite(_df(spark, [(1, "a", "x"), (2, "b", "y")]))
    assert _snapshot(spark, t.path) == {(1, "a", "x"), (2, "b", "y")}
    assert t.partition_values() == ["d=x", "d=y"]


def test_roundtrip_unpartitioned(spark, tmp_path):
    t = AtomicParquetTable(spark, str(tmp_path / "t"))
    t.overwrite(_df(spark, [(1, "a", "x")]))
    assert _snapshot(spark, t.path) == {(1, "a", "x")}


def test_partition_overwrite_leaves_other_partition_files_untouched(spark, tmp_path):
    path = str(tmp_path / "t")
    t = AtomicParquetTable(spark, path, partition_col="d")
    t.overwrite(_df(spark, [(1, "a", "x"), (2, "b", "y")]))

    def files_of(part):
        m = t._load_manifest()
        gen_dir = os.path.join(path, m["partitions"][part], part)
        return sorted(
            (f, os.stat(os.path.join(gen_dir, f)).st_mtime_ns)
            for f in os.listdir(gen_dir)
            if f.endswith(".parquet")
        )

    y_before = files_of("d=y")
    t.overwrite_partitions(_df(spark, [(1, "A2", "x")]))
    # d=x repointed, d=y: same generation, same files, same mtimes
    assert files_of("d=y") == y_before
    assert _snapshot(spark, path) == {(1, "A2", "x"), (2, "b", "y")}


def test_crash_before_flip_preserves_old_snapshot(spark, tmp_path):
    path = str(tmp_path / "t")
    t = AtomicParquetTable(spark, path, partition_col="d")
    t.overwrite(_df(spark, [(1, "a", "x"), (2, "b", "y")]))
    v1 = t._load_manifest()["version"]

    def die(point):
        if point == "before_flip":
            raise Boom(point)

    with pytest.raises(Boom):
        t.overwrite_partitions(_df(spark, [(1, "CORRUPT", "x")]), _failpoint=die)

    # old snapshot intact, version unchanged, staged generation invisible
    assert _snapshot(spark, path) == {(1, "a", "x"), (2, "b", "y")}
    assert t._load_manifest()["version"] == v1
    # a never-referenced generation could be a live writer's staging, so
    # default vacuum leaves it until the orphan age threshold passes...
    assert t.vacuum() == []
    # ...and collects it when the caller asserts writer quiescence
    removed = t.vacuum(min_orphan_age_seconds=0)
    assert len(removed) == 1
    assert _snapshot(spark, path) == {(1, "a", "x"), (2, "b", "y")}


def test_vacuum_keeps_every_referenced_generation(spark, tmp_path):
    path = str(tmp_path / "t")
    t = AtomicParquetTable(spark, path, partition_col="d")
    t.overwrite(_df(spark, [(1, "a", "x"), (2, "b", "y")]))
    t.overwrite_partitions(_df(spark, [(1, "a2", "x")]))
    # two live generations (d=x new, d=y old) -> nothing to remove
    assert t.vacuum() == []
    assert _snapshot(spark, path) == {(1, "a2", "x"), (2, "b", "y")}
    t.overwrite(_df(spark, [(9, "z", "x")]))
    assert len(t.vacuum()) == 2  # both superseded generations collected
    assert _snapshot(spark, path) == {(9, "z", "x")}


def test_merge_parquet_atomic_crash_mid_commit(spark, tmp_path, monkeypatch):
    """merge_parquet(atomic=True) dying AT the commit = old table intact.

    The exclusive create of the version file IS the commit; failing it
    proves every earlier step (staged generation, fsyncs) was
    invisible."""
    path = str(tmp_path / "obs")
    base = _df(spark, [(1, "a", "x"), (2, "b", "y")])
    merge_parquet(spark, path, base, ["k"], partition_col="d", atomic=True)
    assert is_atomic_table(path)

    real_open = os.open

    def broken_open(p, *a, **kw):
        if "_MANIFEST.v" in str(p):
            raise Boom("power cut")
        return real_open(p, *a, **kw)

    import meteo_etl_spark.operators.atomic as atomic_mod

    monkeypatch.setattr(atomic_mod.os, "open", broken_open)
    with pytest.raises(Boom):
        merge_parquet(
            spark, path, _df(spark, [(1, "HALF", "x")]), ["k"],
            partition_col="d", atomic=True,
        )
    monkeypatch.undo()

    assert _snapshot(spark, path) == {(1, "a", "x"), (2, "b", "y")}
    # and the table still accepts commits after the "restart"
    stats = merge_parquet(
        spark, path, _df(spark, [(1, "a2", "x")]), ["k"],
        partition_col="d", atomic=True,
    )
    assert stats.updated == 1
    assert _snapshot(spark, path) == {(1, "a2", "x"), (2, "b", "y")}


def test_merge_parquet_atomic_upsert_semantics_match_plain(spark, tmp_path):
    """Same merge on plain vs atomic layout -> identical table contents."""
    rows0 = [(1, "a", "x"), (2, "b", "y"), (3, "c", "x")]
    batch = [(2, "B2", "y"), (4, "d", "z")]
    results = {}
    for mode, flag in (("plain", False), ("atomic", True)):
        path = str(tmp_path / mode)
        merge_parquet(spark, path, _df(spark, rows0), ["k"], partition_col="d", atomic=flag)
        stats = merge_parquet(spark, path, _df(spark, batch), ["k"], partition_col="d", atomic=flag)
        assert (stats.inserted, stats.updated) == (1, 1)
        results[mode] = _snapshot(spark, path)
    assert results["plain"] == results["atomic"]


def test_conversion_plain_to_atomic_preserves_all_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_parquet(spark, path, _df(spark, [(1, "a", "x"), (2, "b", "y")]), ["k"], partition_col="d")
    assert not is_atomic_table(path)
    # atomic=True on the plain table converts it (full rewrite) and the
    # untouched partition survives the conversion
    merge_parquet(spark, path, _df(spark, [(1, "a2", "x")]), ["k"], partition_col="d", atomic=True)
    assert is_atomic_table(path)
    assert _snapshot(spark, path) == {(1, "a2", "x"), (2, "b", "y")}
    # old plain hive dirs are gone; only generations + manifest remain
    assert all(
        d.startswith("gen-") or d.startswith("_MANIFEST") for d in os.listdir(path)
    )


def test_schema_evolution_across_generations(spark, tmp_path):
    path = str(tmp_path / "t")
    t = AtomicParquetTable(spark, path, partition_col="d")
    t.overwrite(_df(spark, [(1, "a", "x"), (2, "b", "y")]))
    widened = _df(spark, [(1, "a2", "x")]).withColumn("extra", F.lit(42))
    t.overwrite_partitions(widened)
    got = read_table(spark, path)
    assert "extra" in got.columns
    vals = {(r.k, r.extra) for r in got.collect()}
    assert vals == {(1, 42), (2, None)}


def test_inflight_reader_keeps_snapshot_across_commit(spark, tmp_path):
    """A DataFrame resolved BEFORE a commit still collects the old
    snapshot afterwards: generations are immutable and the commit only
    moves the manifest pointer (the dynamic-overwrite plain layout
    deletes files under in-flight readers — FILE_NOT_EXIST). Vacuum is
    what finally invalidates old readers, which is why its contract is
    'no reader older than the last commit'."""
    path = str(tmp_path / "t")
    t = AtomicParquetTable(spark, path, partition_col="d")
    t.overwrite(_df(spark, [(1, "a", "x"), (2, "b", "y")]))
    old_reader = t.read()
    t.overwrite_partitions(_df(spark, [(1, "NEW", "x")]))
    # new reader sees the commit; the in-flight one still sees v1
    assert _snapshot(spark, path) == {(1, "NEW", "x"), (2, "b", "y")}
    assert {(r.k, r.v, r.d) for r in old_reader.collect()} == {
        (1, "a", "x"),
        (2, "b", "y"),
    }


def test_time_travel_reads_past_version_until_vacuum(spark, tmp_path):
    path = str(tmp_path / "t")
    t = AtomicParquetTable(spark, path, partition_col="d")
    t.overwrite(_df(spark, [(1, "a", "x"), (2, "b", "y")]))      # v1
    t.overwrite_partitions(_df(spark, [(1, "NEW", "x")]))         # v2
    assert t.versions() == [1, 2]
    old = {(r.k, r.v, r.d) for r in t.read(version=1).collect()}
    assert old == {(1, "a", "x"), (2, "b", "y")}
    assert _snapshot(spark, path) == {(1, "NEW", "x"), (2, "b", "y")}
    # vacuum collects v1's superseded generation AND its history entry
    t.vacuum()
    assert t.versions() == [2]
    with pytest.raises(FileNotFoundError, match="no committed version 1"):
        t.read(version=1)


def test_time_travel_rejects_uncommitted_version(spark, tmp_path):
    """A crash before the version-file create leaves no trace of the
    attempted version — it is not readable as committed."""
    path = str(tmp_path / "t")
    t = AtomicParquetTable(spark, path, partition_col="d")
    t.overwrite(_df(spark, [(1, "a", "x")]))                      # v1

    def die(point):
        if point == "before_flip":
            raise Boom(point)

    with pytest.raises(Boom):
        t.overwrite(_df(spark, [(9, "z", "x")]), _failpoint=die)  # v2 staged, not committed
    with pytest.raises(FileNotFoundError, match="no committed version 2"):
        t.read(version=2)
    assert _snapshot(spark, path) == {(1, "a", "x")}


def test_concurrent_writers_first_wins_loser_gets_typed_error(spark, tmp_path):
    """Two writers committing the same next version: the filesystem's
    exclusive create admits exactly one; the loser gets
    ConcurrentWriteError (optimistic concurrency) and its staged
    generation never becomes visible."""
    from meteo_etl_spark.operators.atomic import ConcurrentWriteError

    path = str(tmp_path / "t")
    t = AtomicParquetTable(spark, path, partition_col="d")
    t.overwrite(_df(spark, [(1, "a", "x"), (2, "b", "y")]))       # v1

    rival = AtomicParquetTable(spark, path, partition_col="d")

    def rival_commits_first(point):
        if point == "before_flip":
            rival.overwrite_partitions(_df(spark, [(2, "RIVAL", "y")]))  # commits v2

    with pytest.raises(ConcurrentWriteError, match="committed by"):
        t.overwrite_partitions(
            _df(spark, [(1, "LOSER", "x")]), _failpoint=rival_commits_first
        )
    # the rival's commit is the live state; the loser's staged rows are
    # invisible and a retry on the fresh snapshot succeeds
    assert _snapshot(spark, path) == {(1, "a", "x"), (2, "RIVAL", "y")}
    t.overwrite_partitions(_df(spark, [(1, "RETRY", "x")]))
    assert _snapshot(spark, path) == {(1, "RETRY", "x"), (2, "RIVAL", "y")}


def test_crashed_pointer_update_loses_nothing(spark, tmp_path):
    """A crash AFTER the commit but before the pointer update: readers
    resolve the newest version file, and the next commit heals the
    pointer."""
    path = str(tmp_path / "t")
    t = AtomicParquetTable(spark, path, partition_col="d")
    t.overwrite(_df(spark, [(1, "a", "x")]))                      # v1

    def die(point):
        if point == "after_commit":
            raise Boom(point)

    with pytest.raises(Boom):
        t.overwrite_partitions(_df(spark, [(1, "NEW", "x")]), _failpoint=die)  # v2 committed!
    # the commit happened — the pointer is stale but resolution is not
    assert _snapshot(spark, path) == {(1, "NEW", "x")}
    assert t._load_manifest()["version"] == 2
    t.overwrite_partitions(_df(spark, [(1, "v3", "x")]))          # heals pointer
    assert _snapshot(spark, path) == {(1, "v3", "x")}


def test_vacuum_spares_concurrent_writers_staged_generation(spark, tmp_path):
    """vacuum racing a writer that has STAGED but not yet committed:
    the staged generation is referenced by no version file, so default
    vacuum must leave it alone (age threshold) — deleting it would turn
    the writer's subsequent successful commit into committed data
    loss."""
    path = str(tmp_path / "t")
    t = AtomicParquetTable(spark, path, partition_col="d")
    t.overwrite(_df(spark, [(1, "a", "x"), (2, "b", "y")]))

    vacuumed = []

    def rival_vacuums(point):
        if point == "before_flip":
            # generation is staged on disk; commit has not happened yet
            vacuumed.append(
                AtomicParquetTable(spark, path, partition_col="d").vacuum()
            )

    t.overwrite_partitions(_df(spark, [(1, "NEW", "x")]), _failpoint=rival_vacuums)
    assert vacuumed == [[]]  # the staged generation survived the vacuum
    # and the commit it belonged to is fully readable
    assert _snapshot(spark, path) == {(1, "NEW", "x"), (2, "b", "y")}


def test_torn_version_file_falls_back_to_previous_parseable(spark, tmp_path):
    """A truncated/empty version file (legacy table, or a store without
    atomic link-publish) must not make every read fail: resolution falls
    back to the newest parseable version."""
    path = str(tmp_path / "t")
    t = AtomicParquetTable(spark, path, partition_col="d")
    t.overwrite(_df(spark, [(1, "a", "x")]))                      # v1
    with open(os.path.join(path, "_MANIFEST.v2.json"), "w"):
        pass  # torn commit: exists but empty
    assert _snapshot(spark, path) == {(1, "a", "x")}
    assert t._load_manifest()["version"] == 1


def test_file_uri_table_runs_through_hadoop_fs_layer(spark, tmp_path):
    """A table addressed by URI (file://) routes every metadata op
    through the Hadoop FileSystem API (fsio.HadoopIO) — the code path a
    cluster uses for hdfs:// — and the full protocol holds: commit,
    merge, concurrent-writer arbitration, time travel, vacuum."""
    from meteo_etl_spark.operators import fsio
    from meteo_etl_spark.operators.atomic import ConcurrentWriteError

    path = f"file://{tmp_path}/t"
    t = AtomicParquetTable(spark, path, partition_col="d")
    assert isinstance(t._io, fsio.HadoopIO)  # not the local fast path

    t.overwrite(_df(spark, [(1, "a", "x"), (2, "b", "y")]))       # v1
    assert is_atomic_table(path, spark)
    assert _snapshot(spark, path) == {(1, "a", "x"), (2, "b", "y")}

    t.overwrite_partitions(_df(spark, [(1, "a2", "x")]))          # v2
    assert _snapshot(spark, path) == {(1, "a2", "x"), (2, "b", "y")}

    # concurrent writer: no-overwrite rename arbitrates, loser typed
    rival = AtomicParquetTable(spark, path, partition_col="d")

    def rival_commits_first(point):
        if point == "before_flip":
            rival.overwrite_partitions(_df(spark, [(2, "RIVAL", "y")]))  # v3

    with pytest.raises(ConcurrentWriteError, match="committed by"):
        t.overwrite_partitions(
            _df(spark, [(1, "LOSER", "x")]), _failpoint=rival_commits_first
        )
    assert _snapshot(spark, path) == {(1, "a2", "x"), (2, "RIVAL", "y")}

    # time travel + vacuum through the same layer
    assert t.versions() == [1, 2, 3]
    assert {(r.k, r.v, r.d) for r in t.read(version=1).collect()} == {
        (1, "a", "x"),
        (2, "b", "y"),
    }
    removed = t.vacuum(min_orphan_age_seconds=0)
    assert len(removed) >= 1  # superseded v1/v2 gens + loser staging
    assert t.versions() == [3]
    assert _snapshot(spark, path) == {(1, "a2", "x"), (2, "RIVAL", "y")}


def test_vacuum_retention_keeps_time_travel_window(spark, tmp_path):
    """retain_versions=K keeps the newest K versions fully readable
    (their generations survive vacuum); older history is collected."""
    path = str(tmp_path / "t")
    t = AtomicParquetTable(spark, path, partition_col="d")
    t.overwrite(_df(spark, [(1, "v1", "x")]))                     # v1
    t.overwrite_partitions(_df(spark, [(1, "v2", "x")]))          # v2
    t.overwrite_partitions(_df(spark, [(1, "v3", "x")]))          # v3
    removed = t.vacuum(retain_versions=2)
    assert t.versions() == [2, 3]
    assert len(removed) == 1  # only v1's generation collected
    # both retained versions still fully readable
    assert {r.v for r in t.read(version=2).collect()} == {"v2"}
    assert {r.v for r in t.read(version=3).collect()} == {"v3"}
    with pytest.raises(FileNotFoundError, match="no committed version 1"):
        t.read(version=1)
    # default retention: current only
    t.vacuum()
    assert t.versions() == [3]
    with pytest.raises(ValueError, match=">= 1"):
        t.vacuum(retain_versions=0)


def test_vacuum_never_collects_version_committed_after_snapshot(
    spark, tmp_path, monkeypatch
):
    """Writer-safety of the history-collection branch: a version file
    committed by a concurrent writer AFTER vacuum's version-list
    snapshot (but before the deletion loop re-lists the directory) is
    newer than every kept version — it must survive, it is a
    successful commit, not collectable history."""
    from meteo_etl_spark.operators import atomic as atomic_mod

    path = str(tmp_path / "t")
    t = AtomicParquetTable(spark, path)
    t.overwrite(_df(spark, [(1, "a", "x")]))  # v1
    t.overwrite(_df(spark, [(2, "b", "x")]))  # v2
    stale_manifest = t._load_manifest()
    stale_versions = atomic_mod._version_files(t._io, path)

    # the "concurrent" commit that lands between snapshot and deletion
    t.overwrite(_df(spark, [(3, "c", "x")]))  # v3
    v3 = t._load_manifest()["version"]

    # replay vacuum as if it had snapshotted at v2-time
    monkeypatch.setattr(t, "_load_manifest", lambda: stale_manifest)
    monkeypatch.setattr(
        atomic_mod, "_version_files", lambda io, p: list(stale_versions)
    )
    removed = t.vacuum()  # default orphan age also protects v3's generation
    monkeypatch.undo()

    # v1's superseded generation was still collected...
    assert any(r.startswith("gen-") for r in removed)
    # ...but the concurrent v3 commit survives intact
    assert t._load_manifest()["version"] == v3
    assert t.versions()[-1] == v3
    assert _snapshot(spark, path) == {(3, "c", "x")}


def test_single_writer_mode_commits_without_arbiter(spark, tmp_path, monkeypatch):
    """single_writer=True skips the exclusive-create arbiter (the
    object-store deployment where the scheduler guarantees one writer):
    commits go through a plain put, reads/merges/time travel behave
    identically, and publish_exclusive is never invoked."""
    from meteo_etl_spark.operators import atomic as atomic_mod
    from meteo_etl_spark.operators import fsio

    def boom(self, path, body):
        raise AssertionError("arbiter must not run in single_writer mode")

    monkeypatch.setattr(fsio.LocalIO, "publish_exclusive", boom)
    path = str(tmp_path / "t")
    t = AtomicParquetTable(spark, path, single_writer=True)
    t.overwrite(_df(spark, [(1, "a", "x")]))
    t.overwrite(_df(spark, [(2, "b", "x")]))
    assert _snapshot(spark, path) == {(2, "b", "x")}
    assert t.versions() == [1, 2]
    monkeypatch.undo()

    # best-effort duplicate rejection: a SECOND writer instance that
    # commits after the first completed still collides on the visible
    # version file. (A true in-flight race is undetected by contract —
    # that is what the mode's single-writer assertion means.)
    stale = AtomicParquetTable(spark, path, single_writer=True)
    stale_m = stale._load_manifest()
    t.overwrite(_df(spark, [(3, "c", "x")]))  # v3 lands first
    monkeypatch.setattr(stale, "_load_manifest", lambda: stale_m)
    with pytest.raises(atomic_mod.ConcurrentWriteError):
        stale.overwrite(_df(spark, [(9, "LOST", "x")]))
    monkeypatch.undo()
    assert _snapshot(spark, path) == {(3, "c", "x")}


def test_single_writer_and_lock_io_are_mutually_exclusive(spark, tmp_path):
    from meteo_etl_spark.operators.atomic import InMemoryLockIO

    with pytest.raises(ValueError, match="mutually exclusive"):
        AtomicParquetTable(
            spark, str(tmp_path / "t"), single_writer=True, lock_io=InMemoryLockIO()
        )


def test_lock_io_arbitrates_racing_writers(spark, tmp_path, monkeypatch):
    """With lock_io set, the conditional-put store — not the filesystem
    — arbitrates: the loser gets ConcurrentWriteError even on a store
    whose native create is last-writer-wins (simulated by disabling
    the filesystem arbiter entirely)."""
    from meteo_etl_spark.operators import fsio
    from meteo_etl_spark.operators.atomic import (
        ConcurrentWriteError,
        InMemoryLockIO,
    )

    def no_arbiter(self, path, body):
        raise AssertionError("filesystem arbiter must not run in lock_io mode")

    monkeypatch.setattr(fsio.LocalIO, "publish_exclusive", no_arbiter)
    path = str(tmp_path / "t")
    lock = InMemoryLockIO()  # the store shared by both writers
    a = AtomicParquetTable(spark, path, lock_io=lock)
    a.overwrite(_df(spark, [(1, "a", "x")]))

    b = AtomicParquetTable(spark, path, lock_io=lock)
    stale_m = b._load_manifest()
    a.overwrite(_df(spark, [(2, "a2", "x")]))  # writer A commits v2 first
    monkeypatch.setattr(b, "_load_manifest", lambda: stale_m)
    with pytest.raises(ConcurrentWriteError):
        b.overwrite(_df(spark, [(9, "LOST", "x")]))
    assert _snapshot(spark, path) == {(2, "a2", "x")}


def test_lock_io_completes_crashed_winners_commit(spark, tmp_path):
    """Recovery contract: a winner that acquires the lock but dies
    before materializing the version file in the data store is
    COMPLETED by the next writer (the lock entry carries the full
    manifest body) — the committed version is never lost and the table
    converges on it."""
    from meteo_etl_spark.operators.atomic import (
        ConcurrentWriteError,
        InMemoryLockIO,
    )

    path = str(tmp_path / "t")
    lock = InMemoryLockIO()
    t = AtomicParquetTable(spark, path, lock_io=lock)
    t.overwrite(_df(spark, [(1, "a", "x")]))

    def die(point):
        if point == "after_lock":
            raise Boom(point)

    with pytest.raises(Boom):
        t.overwrite(_df(spark, [(2, "WINNER", "x")]), _failpoint=die)
    # lock held for v2, but no v2 version file in the store yet
    assert t.versions() == [1]

    rival = AtomicParquetTable(spark, path, lock_io=lock)
    with pytest.raises(ConcurrentWriteError):
        rival.overwrite(_df(spark, [(3, "RIVAL", "x")]))
    # the rival completed the crashed winner's v2 before losing
    assert t.versions() == [1, 2]
    assert _snapshot(spark, path) == {(2, "WINNER", "x")}
    # and a retry on the fresh snapshot (the contract's next step) works
    rival2 = AtomicParquetTable(spark, path, lock_io=lock)
    rival2.overwrite(_df(spark, [(3, "RIVAL", "x")]))
    assert _snapshot(spark, path) == {(3, "RIVAL", "x")}


def test_jdbc_lock_io_arbitrates_via_database_unique_key(spark, tmp_path, monkeypatch):
    """The deployable LockIO: commit arbitration through a database
    primary-key insert (Derby e2e) — racing writers to an
    object-store-like table are arbitrated by the database, and a
    crashed winner's commit is completed from the stored body."""
    from meteo_etl_spark.operators import fsio
    from meteo_etl_spark.operators.atomic import ConcurrentWriteError, JdbcLockIO
    from meteo_etl_spark.sources import jdbc

    if not jdbc.driver_available(spark, jdbc.DERBY_DRIVER):
        pytest.skip("Derby driver not on JVM classpath")
    url = f"jdbc:derby:{tmp_path}/lockdb;create=true"

    def no_arbiter(self, path, body):
        raise AssertionError("filesystem arbiter must not run in lock_io mode")

    monkeypatch.setattr(fsio.LocalIO, "publish_exclusive", no_arbiter)
    path = str(tmp_path / "t")
    a = AtomicParquetTable(spark, path, lock_io=JdbcLockIO(spark, url))
    a.overwrite(_df(spark, [(1, "a", "x")]))

    # rival with a stale snapshot loses at the database
    b = AtomicParquetTable(spark, path, lock_io=JdbcLockIO(spark, url))
    stale_m = b._load_manifest()
    a.overwrite(_df(spark, [(2, "a2", "x")]))
    monkeypatch.setattr(b, "_load_manifest", lambda: stale_m)
    with pytest.raises(ConcurrentWriteError):
        b.overwrite(_df(spark, [(9, "LOST", "x")]))
    monkeypatch.undo()
    assert _snapshot(spark, path) == {(2, "a2", "x")}

    # crashed winner (lock row written, version file not) is completed
    c = AtomicParquetTable(spark, path, lock_io=JdbcLockIO(spark, url))

    def die(point):
        if point == "after_lock":
            raise Boom(point)

    with pytest.raises(Boom):
        c.overwrite(_df(spark, [(3, "WINNER", "x")]), _failpoint=die)
    assert c.versions() == [1, 2]
    rival = AtomicParquetTable(spark, path, lock_io=JdbcLockIO(spark, url))
    with pytest.raises(ConcurrentWriteError):
        rival.overwrite(_df(spark, [(4, "RIVAL", "x")]))
    assert _snapshot(spark, path) == {(3, "WINNER", "x")}


def test_warehouse_atomic_options_reach_the_commit_arbiter(
    spark, tmp_path, monkeypatch
):
    """Deployment plumbing: Warehouse(atomic=True,
    atomic_options={'single_writer': True}) must carry the arbiter
    selection through merge_observations/merge_parquet down to every
    AtomicParquetTable the pipeline constructs — proven by disabling
    the filesystem arbiter and running a full merge+read cycle."""
    from pyspark.sql import types as T

    from meteo_etl_spark.operators import fsio
    from meteo_etl_spark.pipeline.warehouse import (
        Warehouse,
        merge_observations,
        read_observations,
    )

    def no_arbiter(self, path, body):
        raise AssertionError(
            "filesystem arbiter must not run under single_writer deployment"
        )

    monkeypatch.setattr(fsio.LocalIO, "publish_exclusive", no_arbiter)
    wh = Warehouse(
        str(tmp_path / "wh"), atomic=True, atomic_options={"single_writer": True}
    )
    schema = T.StructType(
        [
            T.StructField("latitude", T.DoubleType()),
            T.StructField("longitude", T.DoubleType()),
            T.StructField("timestamp", T.TimestampType()),
            T.StructField("temperature", T.DoubleType()),
        ]
    )
    import datetime as dt

    rows = [
        (1.0, 2.0, dt.datetime(2025, 12, 1, h), float(h)) for h in range(3)
    ]
    stats = merge_observations(
        spark, wh, spark.createDataFrame(rows, schema), fetch_id="f1"
    )
    assert stats.inserted == 3
    # second merge exercises the existing-table (overwrite_partitions) path
    rows2 = [(1.0, 2.0, dt.datetime(2025, 12, 1, 1), 99.0)]
    merge_observations(spark, wh, spark.createDataFrame(rows2, schema), fetch_id="f2")
    got = {
        (r.timestamp.hour, r.temperature, r.fetch_id)
        for r in read_observations(spark, wh).collect()
    }
    assert got == {(0, 0.0, "f1"), (1, 99.0, "f2"), (2, 2.0, "f1")}


def test_vacuum_completes_pending_lock_commit_instead_of_collecting_it(
    spark, tmp_path
):
    """Maintenance must not destroy a commit that exists only in the
    lock store: vacuum materializes pending lock entries as version
    files FIRST, so the crashed winner's generation is live data, not
    an age-expired orphan — and the later completion path never
    publishes a version pointing at deleted files."""
    from meteo_etl_spark.operators.atomic import InMemoryLockIO

    path = str(tmp_path / "t")
    lock = InMemoryLockIO()
    t = AtomicParquetTable(spark, path, lock_io=lock)
    t.overwrite(_df(spark, [(1, "a", "x")]))

    def die(point):
        if point == "after_lock":
            raise Boom(point)

    with pytest.raises(Boom):
        t.overwrite(_df(spark, [(2, "WINNER", "x")]), _failpoint=die)
    assert t.versions() == [1]  # v2 exists only in the lock store

    # age gate disabled: without the completion pre-pass this would
    # collect v2's generation as an unreferenced orphan
    removed = t.vacuum(min_orphan_age_seconds=0)
    assert t.versions() == [1, 2]  # vacuum completed the commit
    assert all("gen-" not in r or True for r in removed)
    # v2 is the newest version -> its generation survived and reads
    assert _snapshot(spark, path) == {(2, "WINNER", "x")}


# ---------------------------------------------------------------------------
# diff_versions
# ---------------------------------------------------------------------------


def test_diff_versions_add_remove_change(spark, tmp_path):
    from meteo_etl_spark.operators.atomic import diff_versions

    path = str(tmp_path / "t")
    t = AtomicParquetTable(spark, path, partition_col="d")
    t.overwrite(_df(spark, [(1, "a", "x"), (2, "b", "x"), (3, "c", "y")]))
    v1 = t.versions()[-1]
    # change k=1's value, drop k=2, add k=4
    t.overwrite(_df(spark, [(1, "A!", "x"), (3, "c", "y"), (4, "d", "y")]))
    v2 = t.versions()[-1]
    got = {
        r["k"]: r["change"]
        for r in diff_versions(spark, path, v1, v2, ["k"]).collect()
    }
    assert got == {1: "changed", 2: "removed", 4: "added"}
    # unchanged key 3 absent; identical-version diff is empty
    assert diff_versions(spark, path, v2, v2, ["k"]).count() == 0


def test_diff_versions_detects_value_moved_between_null_columns(spark, tmp_path):
    """Regression (ADVICE r7): Spark's xxhash64 SKIPS NULL inputs, so a
    bare xxhash64(*payload) hashed (a=5, b=NULL) and (a=NULL, b=5)
    identically and the move was reported as unchanged. The hash now
    encodes NULLs explicitly."""
    from meteo_etl_spark.operators.atomic import diff_versions

    path = str(tmp_path / "t")
    t = AtomicParquetTable(spark, path)
    schema = "k int, a int, b int"
    t.overwrite(spark.createDataFrame([(1, 5, None), (2, 7, None)], schema))
    v1 = t.versions()[-1]
    # k=1: value MOVES a->b (NULL-filling a); k=2 untouched
    t.overwrite(spark.createDataFrame([(1, None, 5), (2, 7, None)], schema))
    v2 = t.versions()[-1]
    got = {
        r["k"]: r["change"]
        for r in diff_versions(spark, path, v1, v2, ["k"]).collect()
    }
    assert got == {1: "changed"}


def test_diff_versions_schema_change_rejected(spark, tmp_path):
    from pyspark.sql import functions as F

    from meteo_etl_spark.operators.atomic import diff_versions

    path = str(tmp_path / "t")
    t = AtomicParquetTable(spark, path, partition_col="d")
    t.overwrite(_df(spark, [(1, "a", "x")]))
    v1 = t.versions()[-1]
    t.overwrite(_df(spark, [(1, "a", "x")]).withColumn("extra", F.lit(1)))
    v2 = t.versions()[-1]
    with pytest.raises(ValueError, match="schema changed"):
        diff_versions(spark, path, v1, v2, ["k"])


# -- tags (named version refs) ----------------------------------------------


def test_tag_reads_pinned_snapshot(spark, tmp_path):
    path = str(tmp_path / "t")
    t = AtomicParquetTable(spark, path, partition_col="d")
    t.overwrite(_df(spark, [(1, "a", "x"), (2, "b", "y")]))       # v1
    assert t.tag("train-v1") == 1                                  # live default
    t.overwrite_partitions(_df(spark, [(1, "NEW", "x")]))          # v2
    got = {(r.k, r.v, r.d) for r in t.read(tag="train-v1").collect()}
    assert got == {(1, "a", "x"), (2, "b", "y")}
    assert t.tags() == {"train-v1": 1}


def test_tagged_version_survives_vacuum(spark, tmp_path):
    path = str(tmp_path / "t")
    t = AtomicParquetTable(spark, path, partition_col="d")
    t.overwrite(_df(spark, [(1, "a", "x")]))                       # v1 (tagged)
    t.tag("release", 1)
    t.overwrite(_df(spark, [(1, "b", "x")]))                       # v2 (untagged)
    t.overwrite(_df(spark, [(1, "c", "x")]))                       # v3 (live)
    t.vacuum(retain_versions=1, min_orphan_age_seconds=0)
    # v2 collected, v1 protected by the tag, v3 live
    assert t.versions() == [1, 3]
    old = {(r.k, r.v, r.d) for r in t.read(tag="release").collect()}
    assert old == {(1, "a", "x")}
    # dropping the tag releases it to the next vacuum
    t.delete_tag("release")
    t.vacuum(retain_versions=1, min_orphan_age_seconds=0)
    assert t.versions() == [3]
    with pytest.raises(FileNotFoundError, match="no tag"):
        t.read(tag="release")


def test_tag_validation_and_immutability(spark, tmp_path):
    path = str(tmp_path / "t")
    t = AtomicParquetTable(spark, path)
    t.overwrite(_df(spark, [(1, "a", "x")]))                       # v1
    with pytest.raises(ValueError, match="invalid tag name"):
        t.tag("../escape")
    with pytest.raises(ValueError, match="invalid tag name"):
        t.tag("rel\n")  # `$`-anchored match would admit the newline
    with pytest.raises(FileNotFoundError, match="no committed version 9"):
        t.tag("ghost", 9)
    t.tag("rel", 1)
    with pytest.raises(FileExistsError, match="already exists"):
        t.tag("rel", 1)
    t.overwrite(_df(spark, [(2, "b", "y")]))                       # v2
    assert t.tag("rel", replace=True) == 2                         # moved to live
    assert t.tags() == {"rel": 2}
    with pytest.raises(ValueError, match="version OR tag"):
        t.read(version=1, tag="rel")
    with pytest.raises(FileNotFoundError, match="no tag"):
        t.delete_tag("nope")


def test_diff_versions_distinguishes_complex_typed_payloads(spark, tmp_path):
    """Regression: a bare string cast renders ['a','b'] and ['a, b']
    identically ('[a, b]'), so array/struct/binary payloads must be
    encoded losslessly (to_json / base64) or real changes read as
    unchanged."""
    from meteo_etl_spark.operators.atomic import diff_versions

    path = str(tmp_path / "tc")
    t = AtomicParquetTable(spark, path)
    df1 = spark.createDataFrame(
        [(1, ["a", "b"], None), (2, ["x"], bytearray(b"\x01\x02"))],
        "k long, tags array<string>, blob binary",
    )
    t.overwrite(df1)
    v1 = t.versions()[-1]
    # k=1: ['a','b'] -> ['a, b'] (same naive rendering); k=2: blob
    # bytes change but decode to the same lossy UTF-8 replacement
    df2 = spark.createDataFrame(
        [(1, ["a, b"], None), (2, ["x"], bytearray(b"\x01\x03"))],
        "k long, tags array<string>, blob binary",
    )
    t.overwrite(df2)
    v2 = t.versions()[-1]
    got = {
        r["k"]: r["change"]
        for r in diff_versions(spark, path, v1, v2, ["k"]).collect()
    }
    assert got == {1: "changed", 2: "changed"}
    # [NULL] element vs the string 'null' must also differ
    t.overwrite(
        spark.createDataFrame(
            [(1, [None], None)], "k long, tags array<string>, blob binary"
        )
    )
    v3 = t.versions()[-1]
    t.overwrite(
        spark.createDataFrame(
            [(1, ["null"], None)], "k long, tags array<string>, blob binary"
        )
    )
    v4 = t.versions()[-1]
    assert {
        r["k"]: r["change"]
        for r in diff_versions(spark, path, v3, v4, ["k"]).collect()
    } == {1: "changed"}


def test_tag_replace_restores_previous_mapping_on_vacuum_race(spark, tmp_path):
    """A replace=True that loses the tag/vacuum race must RESTORE the
    previous mapping, not delete the name: the old target's vacuum
    protection has to survive the failed move."""
    path = str(tmp_path / "tr")
    t = AtomicParquetTable(spark, path)
    t.overwrite(_df(spark, [(1, "a", "x")]))  # v1
    v1 = t.versions()[-1]
    t.tag("prod", v1)
    t.overwrite(_df(spark, [(2, "b", "y")]))  # v2
    v2 = t.versions()[-1]
    # simulate a vacuum completing between publish and re-verify: the
    # second versions() call no longer sees v2
    calls = {"n": 0}
    orig = t.versions

    def racing():
        calls["n"] += 1
        vs = orig()
        return [v for v in vs if v != v2] if calls["n"] >= 2 else vs

    t.versions = racing
    try:
        with pytest.raises(FileNotFoundError, match="restored"):
            t.tag("prod", v2, replace=True)
    finally:
        t.versions = orig
    assert t.tags() == {"prod": v1}  # old mapping intact
