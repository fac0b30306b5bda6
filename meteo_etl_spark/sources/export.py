"""Dataset export sinks: sharded JSONL and globally-ordered parquet.

A training-data pipeline's last mile is rarely parquet-in-place: it
ships (a) JSONL shards sized for downstream loaders and (b) exports
with a GLOBAL total order (curriculum schedules, binary-searchable
id ranges). Both are pure Spark write shapes:

- ``export_jsonl`` — round-robin repartition to a target shard count
  (or rows-per-shard), one JSON object per line. Shard count, not
  shard assignment, is the contract: readers must not assume row
  placement (hash_split is the deterministic-assignment tool).
- ``export_ordered`` — ``repartitionByRange`` + in-partition sort:
  file k holds keys strictly below file k+1 and every file is
  internally sorted, which is a global total order across the export
  at O(n log n/p) per partition — no single-reducer global sort. The
  range boundaries come from Spark's reservoir sampling of the key
  column (one extra pass, sampled, not a full scan).

Reference parity: no reference counterpart (its outputs are Postgres
rows); mandated by the training-data scope in BASELINE.md.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

#: default rows per JSONL shard when no shard count is given.
DEFAULT_ROWS_PER_SHARD = 100_000


def export_jsonl(
    df: DataFrame,
    path: str,
    *,
    num_shards: int | None = None,
    rows_per_shard: int = DEFAULT_ROWS_PER_SHARD,
) -> int:
    """Write ``df`` as JSONL shards; returns the shard count used.

    With no explicit ``num_shards`` the count is sized from a cheap
    ``df.count()`` (metadata-only for parquet inputs) over
    ``rows_per_shard``. Round-robin repartition gives near-uniform
    shard sizes regardless of input partitioning or skew."""
    if num_shards is None:
        num_shards = max(1, math.ceil(df.count() / rows_per_shard))
    df.repartition(num_shards).write.mode("overwrite").json(path)
    return num_shards


def export_ordered(
    df: DataFrame,
    path: str,
    order_cols: list[str],
    *,
    num_files: int,
) -> None:
    """Globally-ordered parquet export: range-partition on
    ``order_cols`` then sort within each partition — a total order
    across files without a single-reducer sort."""
    (
        df.repartitionByRange(num_files, *order_cols)
        .sortWithinPartitions(*order_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def export_webdataset(
    df: DataFrame,
    path: str,
    *,
    key_col: str,
    content_cols: list[str],
    num_shards: int,
    resume: bool = False,
) -> list[tuple[int, int, int]]:
    """WebDataset-style tar-shard export: ``shard-NNNNNN.tar`` files
    whose members are ``{key}.{column}`` entries — samples grouped by
    basename, the format streaming training loaders consume directly.
    Returns per-shard ``(shard, n_samples, n_bytes)`` stats, sorted.

    Plan shape: shard assignment is the deterministic content-hash
    bucket (``sampling.hash_bucket`` — reproducible on any cluster
    size and stable under repartitioning); rows shuffle ONCE on the
    shard id and sort within partitions on (shard, key), so each task
    STREAMS its rows into tar archives in order — one open tar at a
    time, O(row) memory, never a whole shard buffered. Each shard id
    lands in exactly one task, so writers never collide; archives are
    written to a temp name and atomically renamed, making task retries
    idempotent. Tar metadata (mtime/uid/gid) is zeroed so the export
    is byte-reproducible.

    String columns are encoded UTF-8; binary columns pass through.
    Any other content type is rejected up front (``bytes(5)`` would
    silently write zero-filled garbage), and a NULL content value
    fails the export with the offending key in the error — a sample
    with a missing member is a corrupt dataset, not a formatting
    choice.

    ``resume=True`` makes a re-run after a crash INCREMENTAL: existing
    ``shard-NNNNNN.tar`` files are trusted complete (the atomic
    tmp+rename publish guarantees a final name is never partial),
    orphaned ``*.tmp`` staging files are removed, and only the missing
    shards are computed and written — at 100 TB a died-at-90% export
    costs 10% to finish, not 100%. Safe because shards are
    byte-reproducible: re-running over the SAME input and parameters
    regenerates exactly the bytes the crashed run would have produced
    (the caller owns that contract — input changed means start fresh).
    Returned stats cover only the newly written shards.
    """
    import os

    from pyspark.sql import functions as F

    from meteo_etl_spark.functions.sampling import hash_bucket

    types = dict(df.dtypes)
    bad = [c for c in content_cols if types.get(c) not in ("string", "binary")]
    if bad:
        raise ValueError(
            f"export_webdataset: content columns must be string/binary; "
            f"got {[(c, types.get(c)) for c in bad]}"
        )
    os.makedirs(path, exist_ok=True)
    sel = df.select(
        F.col(key_col).cast("string").alias("__key"),
        *[F.col(c) for c in content_cols],
        hash_bucket(F.col(key_col), num_shards).cast("int").alias("__shard"),
    )
    if resume:
        import re as _re

        done = []
        for f in os.listdir(path):
            if f.endswith(".tmp"):
                os.unlink(os.path.join(path, f))  # crashed staging
                continue
            m = _re.fullmatch(r"shard-(\d{6})\.tar", f)
            if m:
                done.append(int(m.group(1)))
        if done:
            sel = sel.filter(~F.col("__shard").isin(done))

    def write_shards(batches):
        import io
        import tarfile
        import uuid

        import pandas as pd

        cur_shard = None
        tar = None
        tmp_name = final_name = None
        stats: list[tuple[int, int, int]] = []
        n_samples = 0

        def close_current():
            nonlocal tar, n_samples
            if tar is None:
                return
            tar.close()
            os.replace(tmp_name, final_name)
            stats.append((cur_shard, n_samples, os.path.getsize(final_name)))
            tar = None
            n_samples = 0

        def open_shard(shard):
            nonlocal tar, tmp_name, final_name, cur_shard
            cur_shard = shard
            final_name = os.path.join(path, f"shard-{shard:06d}.tar")
            tmp_name = final_name + f".{uuid.uuid4().hex[:8]}.tmp"
            tar = tarfile.open(tmp_name, "w")

        for pdf in batches:
            # positional access: itertuples mangles the __-prefixed
            # names; column order is (__key, *content_cols, __shard).
            for row in pdf.itertuples(index=False):
                shard = row[-1]
                key = row[0]
                if shard != cur_shard:
                    close_current()
                    open_shard(shard)
                for i, c in enumerate(content_cols):
                    val = row[1 + i]
                    if val is None:
                        raise ValueError(
                            f"export_webdataset: NULL {c!r} for key {key!r}"
                            " — a sample with a missing member is corrupt;"
                            " filter or fill upstream"
                        )
                    data = (
                        val.encode("utf-8") if isinstance(val, str) else bytes(val)
                    )
                    info = tarfile.TarInfo(name=f"{key}.{c}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(data))
                n_samples += 1
        close_current()
        if stats:  # empty partitions (hash can leave one shardless) yield nothing
            yield pd.DataFrame(
                {
                    "shard": [s for s, _, _ in stats],
                    "n_samples": [n for _, n, _ in stats],
                    "n_bytes": [b for _, _, b in stats],
                }
            )

    out = (
        sel.repartition(num_shards, "__shard")
        .sortWithinPartitions("__shard", "__key")
        .mapInPandas(write_shards, "shard int, n_samples long, n_bytes long")
        .collect()
    )
    return sorted((r.shard, r.n_samples, r.n_bytes) for r in out)
