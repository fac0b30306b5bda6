"""Multimodal (image/audio/video) column plumbing.

Media is carried as opaque ``binary`` payload columns next to typed
metadata — the same pointer-to-payload pattern the reference uses for
its bronze files (`streaming/schemas/fetch_event.avsc:22` carries a
path, not the data; SURVEY.md §2.4). At 100 TB the payload column
lives in its own parquet files (or is a path into object storage) and
decode runs as Arrow-batched Python over ``mapInPandas`` —
per-partition batches, bounded memory, no driver involvement.

The actual codecs (PIL/ffmpeg/librosa) are not in this container, so
``decode_media`` is a STUB: the Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested,
while the pixel/sample decode is a clearly-marked deterministic fake
(``fake=True``, metadata derived from the byte length) or
``NotImplementedError`` when a real codec is requested.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

#: Decoded-media metadata: one row per payload.
DECODED_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("frames", LongType()),
        StructField("format", StringType()),
    ]
)

#: Payload column schema fragment (binary + pointer metadata).
PAYLOAD_FIELDS = [
    StructField("payload", BinaryType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
]


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload column (here: the utf-8 bytes of
    the text column — the testdata has no real media) plus its size."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "n_bytes", F.octet_length(payload)
    )


def fake_decode_cols(n_bytes: Column) -> dict[str, Column]:
    """The deterministic fake decode as pure JVM expressions — the
    contract the mapInPandas stub must reproduce (tested for equality).
    Dimensions are a fixed function of payload size."""
    return {
        "width": (F.lit(16) + F.pmod(n_bytes, F.lit(64))).cast("long"),
        # (n/7) cast to long truncates toward zero == floor for n >= 0,
        # matching the stub's integer division.
        "height": (F.lit(16) + F.pmod((n_bytes / F.lit(7)).cast("long"), F.lit(64))).cast("long"),
        "frames": (F.lit(1) + F.pmod(n_bytes, F.lit(5))).cast("long"),
    }


def decode_media(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    codec: str = "fake",
) -> DataFrame:
    """Decode binary payloads to media metadata via mapInPandas.

    Arrow-batched: each partition streams in as pandas batches; the
    decode touches bytes only inside the executor. ``codec='fake'``
    produces the deterministic metadata of :func:`fake_decode_cols`;
    any real codec raises NotImplementedError (libs not installed).
    """
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r}: real media codecs (PIL/ffmpeg) are not "
            "available in this environment; only the deterministic "
            "'fake' decode is implemented"
        )

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            n = batch["payload"].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].astype("int64"),
                    "n_bytes": n,
                    "width": 16 + n % 64,
                    "height": 16 + (n // 7) % 64,
                    "frames": 1 + n % 5,
                    "format": "fake",
                }
            )

    return src.mapInPandas(decode, DECODED_META_SCHEMA)


#: fake embedding dimensionality (kept small; real encoders emit 512+).
EMBED_DIM = 8


def embed_media(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Binary payload → embedding vector via mapInPandas (the
    feature-extract step of a multimodal pipeline; a real encoder —
    CLIP/wav2vec — is not in this container, so the embedding is a
    deterministic byte-statistics fake with the REAL plumbing: Arrow
    batches in, fixed-width array<double> out, composable with
    functions/similarity.* downstream)."""
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("embedding", ArrayType(DoubleType()), False),
        ]
    )
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def embed(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for batch in batches:
            vecs = []
            for buf in batch["payload"]:
                arr = np.frombuffer(bytes(buf), dtype=np.uint8).astype(np.float64)
                # deterministic per-stripe byte statistics, L2-normalized
                stripes = np.array_split(arr, EMBED_DIM) if len(arr) else []
                v = np.array(
                    [s.mean() if len(s) else 0.0 for s in stripes]
                    + [0.0] * (EMBED_DIM - len(stripes))
                )
                n = np.linalg.norm(v)
                vecs.append((v / n if n else v).tolist())
            yield pd.DataFrame(
                {"doc_id": batch["doc_id"].astype("int64"), "embedding": vecs}
            )

    return src.mapInPandas(embed, out_schema)


def sample_frames(decoded: DataFrame, every: int = 1) -> DataFrame:
    """Explode one row per sampled frame index — frame *sampling* is
    native explode/sequence (JVM-side), only frame *decode* would be
    Python. ``every`` keeps each k-th frame."""
    return decoded.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("frames") - 1, F.lit(every))
        ).alias("frame_idx"),
    )


#: fake audio framing constants (wav2vec-style 25ms window / 20ms hop
#: at a pretend 16kHz would be 400/320 samples — kept literal here).
AUDIO_CHUNK = 400
AUDIO_HOP = 320
AUDIO_SAMPLES_PER_BYTE = 2  # fake codec: 16-bit mono, n_samples = bytes*2


def chunk_audio(
    decoded: DataFrame,
    chunk: int = AUDIO_CHUNK,
    hop: int = AUDIO_HOP,
) -> DataFrame:
    """Explode one row per overlapping audio chunk — the audio half of
    the multimodal sampling contract (wav2vec/Whisper-style framing:
    fixed window, fixed hop). Chunk *selection* is native
    explode/sequence (JVM-side, integer arithmetic); only sample
    *decode* would be Python. Input is :func:`decode_media` output
    (``n_bytes`` drives the fake sample count); emits
    ``(doc_id, chunk_idx, start_sample, end_sample)`` with the final
    chunk truncated at the stream end. At 100 TB the explode fans out
    BEFORE any Python runs, so a downstream per-chunk featurizer sees
    exactly the framed fraction."""
    n_samples = (
        F.col("n_bytes") * F.lit(AUDIO_SAMPLES_PER_BYTE)
    ).cast("long")
    base = decoded.select("doc_id", n_samples.alias("n_samples"))
    n_chunks = F.expr(f"(n_samples - 1) div {int(hop)} + 1")
    start = (F.col("chunk_idx") * F.lit(int(hop))).cast("long")
    return (
        base.select(
            "doc_id",
            "n_samples",
            F.explode(
                F.sequence(F.lit(0).cast("long"), (n_chunks - 1).cast("long"))
            ).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            start.alias("start_sample"),
            F.least(start + F.lit(int(chunk)), F.col("n_samples"))
            .cast("long")
            .alias("end_sample"),
        )
    )
