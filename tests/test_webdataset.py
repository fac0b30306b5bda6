"""WebDataset tar-shard export: loader-readable round trip,
deterministic shard assignment, byte-reproducible archives."""

from __future__ import annotations

import glob
import hashlib
import os
import tarfile

from meteo_etl_spark.sources.export import export_webdataset
from meteo_etl_spark.sources.testdata import load_table
from tests.conftest import SF_SMALL

N_SHARDS = 4


def _read_all(path: str) -> dict[str, dict[str, bytes]]:
    samples: dict[str, dict[str, bytes]] = {}
    for f in sorted(glob.glob(os.path.join(path, "shard-*.tar"))):
        with tarfile.open(f) as tar:
            for m in tar.getmembers():
                key, col = m.name.rsplit(".", 1)
                samples.setdefault(key, {})[col] = tar.extractfile(m).read()
    return samples


def test_webdataset_round_trip_and_stats(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text", "lang"
    )
    path = str(tmp_path / "wds")
    stats = export_webdataset(
        docs, path, key_col="doc_id", content_cols=["text", "lang"],
        num_shards=N_SHARDS,
    )

    src = {
        str(r.doc_id): {"text": r.text.encode(), "lang": r.lang.encode()}
        for r in docs.collect()
    }
    got = _read_all(path)
    assert got == src

    assert sum(n for _, n, _ in stats) == len(src)
    assert {s for s, _, _ in stats} <= set(range(N_SHARDS))
    for s, _, b in stats:
        f = os.path.join(path, f"shard-{s:06d}.tar")
        assert os.path.getsize(f) == b
    # no stray temp files from the atomic-rename protocol
    assert not glob.glob(os.path.join(path, "*.tmp"))


def test_webdataset_is_byte_reproducible(spark, tmp_path):
    """Same input -> byte-identical shards (zeroed tar metadata,
    deterministic hash assignment, sorted members) regardless of the
    input's partition layout."""
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")

    def digest(path):
        return {
            os.path.basename(f): hashlib.sha256(open(f, "rb").read()).hexdigest()
            for f in glob.glob(os.path.join(path, "shard-*.tar"))
        }

    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    export_webdataset(
        docs, p1, key_col="doc_id", content_cols=["text"], num_shards=N_SHARDS
    )
    export_webdataset(
        docs.repartition(13), p2, key_col="doc_id", content_cols=["text"],
        num_shards=N_SHARDS,
    )
    d1, d2 = digest(p1), digest(p2)
    assert d1 and d1 == d2


def test_webdataset_rejects_bad_types_and_null_content(spark, tmp_path):
    """Non-string/binary content columns are refused up front; a NULL
    content value fails the export naming the key."""
    import pytest as _pytest

    docs = load_table(spark, SF_SMALL, "documents")
    with _pytest.raises(ValueError, match="string/binary"):
        export_webdataset(
            docs, str(tmp_path / "x"), key_col="doc_id",
            content_cols=["n_chars"], num_shards=2,
        )

    from pyspark.sql import functions as F

    nulled = docs.select(
        "doc_id", F.when(F.col("doc_id") == 7, None).otherwise(F.col("text")).alias("text")
    )
    with _pytest.raises(Exception, match="NULL 'text' for key '7'"):
        export_webdataset(
            nulled, str(tmp_path / "y"), key_col="doc_id",
            content_cols=["text"], num_shards=2,
        )


def test_resume_rewrites_only_missing_shards(spark, tmp_path):
    """Crash-resume contract: delete two finished shards + plant a
    stray .tmp; resume=True regenerates exactly the missing shards
    byte-identically, trusts the surviving ones, removes the orphan."""
    import hashlib
    import os

    from meteo_etl_spark.sources.export import export_webdataset

    docs = (
        spark.range(0, 200)
        .selectExpr("id AS doc_id", "concat('text-', id) AS text")
    )
    out1 = str(tmp_path / "full")
    stats1 = export_webdataset(
        docs, out1, key_col="doc_id", content_cols=["text"], num_shards=8
    )
    digests = {
        f: hashlib.md5(open(os.path.join(out1, f), "rb").read()).hexdigest()
        for f in sorted(os.listdir(out1))
    }
    assert len(digests) == 8

    # simulate the crash: two shards missing, one orphaned staging file
    os.unlink(os.path.join(out1, "shard-000002.tar"))
    os.unlink(os.path.join(out1, "shard-000005.tar"))
    stray = os.path.join(out1, "shard-000005.tar.deadbeef.tmp")
    open(stray, "wb").write(b"partial")

    stats2 = export_webdataset(
        docs, out1, key_col="doc_id", content_cols=["text"],
        num_shards=8, resume=True,
    )
    assert sorted(s for s, _, _ in stats2) == [2, 5]  # only the missing two
    assert not os.path.exists(stray)
    after = {
        f: hashlib.md5(open(os.path.join(out1, f), "rb").read()).hexdigest()
        for f in sorted(os.listdir(out1))
    }
    assert after == digests  # byte-identical to the uninterrupted export
