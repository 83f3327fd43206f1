"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``BINARY`` columns with a typed metadata struct. The
Spark-side machinery — schema, Arrow batch shape, ``mapInPandas``
signatures, partition sizing — is real and tested; the codec step is a
deterministic fake (the container ships no image/audio libs), clearly
marked, swappable for PIL/torchaudio on a real cluster.

Scale notes: media rows are large → keep ``spark.sql.files.
maxPartitionBytes`` low enough that one Arrow batch of decoded frames
fits executor memory; never collect; feature vectors (small) flow on,
raw bytes get dropped as early as possible (column pruning does this
automatically once downstream selects only features).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

__all__ = [
    "MEDIA_META_TYPE",
    "attach_media_meta",
    "decode_image_features",
    "resize_media",
    "audio_resample",
    "sample_video_frames",
]

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),      # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)


def attach_media_meta(df: DataFrame, binary_col: str = "content",
                      media_type: str = "image", fmt: str = "png") -> DataFrame:
    """Add the typed metadata struct next to an opaque binary column."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(binary_col)).cast("long").alias("size_bytes"),
        ),
    )


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """STUB CODEC — deterministic fake in place of a real image decode.

    Real deployment: replace with PIL/torchvision; signature and batch
    shape stay identical. The fake is md5-derived so an external SQL
    oracle can reproduce it exactly: feature ``i`` is hex chars
    ``[4i, 4i+4)`` of ``md5(HEX(payload))`` scaled to [0, 1) —
    ``md5(hex(encode(text)))`` + ``CAST('0x'||substr AS INT)`` in
    DuckDB. Uppercase hex to match Spark's ``F.hex``/DuckDB's ``hex``;
    4 hex chars per feature → dim ≤ 8 stays within one md5 (wraps after).
    """
    import hashlib

    if payload is None:
        return [0.0] * dim
    h = hashlib.md5(payload.hex().upper().encode("ascii")).hexdigest()
    return [
        int(h[(4 * i) % 32 : (4 * i) % 32 + 4], 16) / 65536.0
        for i in range(dim)
    ]


def decode_image_features(df: DataFrame, binary_col: str = "content",
                          id_col: str = "doc_id", dim: int = 8) -> DataFrame:
    """binary → feature vector via Arrow-batched ``mapInPandas``.

    Output schema ``(id, features array<float>)`` — raw bytes do not
    survive the operator, so downstream stages shuffle only features.
    """
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [
                        _fake_decode(b, dim) for b in pdf[binary_col]
                    ],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(_decode, out_schema)


def sample_video_frames(df: DataFrame, binary_col: str = "content",
                        id_col: str = "doc_id", every_ms: int = 1000,
                        fake_duration_ms: int = 5000) -> DataFrame:
    """Frame sampling plumbing: one output row per sampled frame offset
    (the real codec would seek; the stub emits offsets + a byte-slice
    fingerprint). Fan-out is a JVM-side explode over ``sequence``."""
    frames = df.select(
        id_col,
        F.posexplode(
            F.sequence(F.lit(0), F.lit(fake_duration_ms - 1), F.lit(every_ms))
        ).alias("frame_idx", "offset_ms"),
        # hex-encode before md5: engines disagree on base64 chunking
        # (Spark's base64 wraps MIME-style at 76 chars) and on md5(BLOB)
        F.md5(F.hex(F.col(binary_col))).alias("frame_fingerprint"),
    )
    return frames


def resize_media(df: DataFrame, width: int, height: int,
                 binary_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    """Resize plumbing: binary in → binary out + updated media_meta.

    STUB CODEC — the fake "resize" emits a deterministic byte string of
    length ``width*height//256`` derived from the input bytes; a real
    deployment swaps ``_fake_resize`` for PIL ``Image.resize`` with the
    same Arrow batch shape. Output rows carry the new dimensions in
    ``media_meta`` so downstream filters prune on real columns.
    """
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(binary_col, T.BinaryType()),
            T.StructField("media_meta", MEDIA_META_TYPE),
        ]
    )

    def _fake_resize(payload: bytes) -> bytes:
        if not payload:
            return b""
        n = max(1, width * height // 256)
        return bytes(payload[i % len(payload)] for i in range(n))

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [_fake_resize(b) for b in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    binary_col: resized,
                    "media_meta": [
                        {
                            "media_type": "image",
                            "format": "raw",
                            "width": width,
                            "height": height,
                            "duration_ms": None,
                            "size_bytes": len(b),
                        }
                        for b in resized
                    ],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(_resize, out_schema)


def audio_resample(df: DataFrame, target_hz: int = 16000,
                   binary_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    """Audio resample plumbing (STUB CODEC — swap for torchaudio/librosa).

    The fake keeps every ``k``-th byte as if decimating samples; schema
    ``(id, content binary, sample_rate int)``. Real and fake share batch
    shape, so the Spark plan (partitioning, Arrow transfer, pruning) is
    exercised for real."""
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(binary_col, T.BinaryType()),
            T.StructField("sample_rate", T.IntegerType()),
        ]
    )
    k = max(1, 44100 // target_hz)

    def _resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    binary_col: [
                        bytes((b or b"")[::k]) for b in pdf[binary_col]
                    ],
                    "sample_rate": target_hz,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(_resample, out_schema)
