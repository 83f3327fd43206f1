"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``BINARY`` columns with a typed metadata struct. The
Spark-side machinery — schema, Arrow batch shape, ``mapInPandas``
signatures, partition sizing — is real and tested. Codecs come in two
families: REAL stdlib/numpy codecs for binary PPM (P6) images,
non-interlaced RGB8 PNG (full zlib + filter-reconstruction pipeline,
`decode_png_features` / `raw_rgb_to_png`), baseline 4:4:4 JPEG
(DCT + stream-read Huffman tables, `decode_jpeg_features` /
`raw_rgb_to_jpeg` — lossy, so its oracle gate is a tolerance boolean)
and PCM WAV audio (`decode_ppm_features`, `resize_ppm`,
`resample_wav` — exact header parsing, pixel/sample math, re-encode),
plus REAL container/frame-layer parsers for MP4 (ISO-BMFF sample
tables, `frames_to_mp4` / `sample_mp4_frames`) and MP3 (frame-sync
walk, `mp3_audio_meta` / `sample_mp3_segments`) whose PAYLOAD
bitstream decode stays honestly external (the GPU/library stage of a
real pipeline), and deterministic fakes only for that inner decode and
for exotic JPEG flavors — clearly marked, swappable for
PIL/torchaudio on a real cluster. Both families share batch shapes.

Scale notes: media rows are large → keep ``spark.sql.files.
maxPartitionBytes`` low enough that one Arrow batch of decoded frames
fits executor memory; never collect; feature vectors (small) flow on,
raw bytes get dropped as early as possible (column pruning does this
automatically once downstream selects only features).
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

__all__ = [
    "MEDIA_META_TYPE",
    "attach_media_meta",
    "decode_image_features",
    "resize_media",
    "audio_resample",
    "sample_video_frames",
    "decode_ppm_features",
    "resize_ppm",
    "resample_wav",
    "decode_png_features",
    "raw_rgb_to_png",
    "decode_jpeg_features",
    "raw_rgb_to_jpeg",
    "frames_to_mp4",
    "sample_mp4_frames",
    "mp3_audio_meta",
    "sample_mp3_segments",
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


def _box_resize_rgb(px, width: int, height: int):
    """Generic box-resample of an ``(h, w, 3)`` uint8 array to
    ``(height, width, 3)``: per axis, a downscale averages each target
    pixel's source span (exact box filter on the integer grid), an
    upscale takes nearest samples. Deterministic, pure numpy."""
    import numpy as np

    a = px.astype(np.float64)

    def _axis(arr, target, axis):
        n = arr.shape[axis]
        if target <= n:
            edges = (np.arange(target + 1) * n) // target
            summed = np.add.reduceat(arr, edges[:-1], axis=axis)
            cnt = np.diff(edges).astype(np.float64)
            shape = [1] * arr.ndim
            shape[axis] = target
            return summed / cnt.reshape(shape)
        idx = (np.arange(target) * n) // target
        return np.take(arr, idx, axis=axis)

    out = _axis(_axis(a, height, 0), width, 1)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def resize_media(df: DataFrame, width: int, height: int,
                 binary_col: str = "content", id_col: str = "doc_id",
                 quality: int = 90) -> DataFrame:
    """Resize: binary in → binary out + updated media_meta.

    REAL for the formats this engine can decode (sniffed per payload):
    JPEG (SOI ``FF D8``) runs decode → box-resample → re-encode through
    the real baseline codec (``_parse_jpeg``/``_encode_jpeg``); binary
    PPM (``P6``) runs the same box-resample back to P6. UNKNOWN formats
    keep the deterministic stub (a ``width*height//256``-byte cycle,
    ``format='raw'``) so the plumbing stays total — a production user
    plugs PIL into ``_fake_resize`` for the rest. Output rows carry
    the new dimensions (and the REAL format tag) in ``media_meta`` so
    downstream filters prune on real columns."""
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

    def _one(payload):
        """-> (bytes, format). Real path for jpeg/ppm, stub otherwise;
        a payload that SNIFFS real but fails to decode yields null
        content (corrupt-row routing, same policy as the decoders)."""
        b = bytes(payload or b"")
        if b[:2] == b"\xff\xd8":
            try:
                _w, _h, px = _parse_jpeg(b)
                return _encode_jpeg(
                    _box_resize_rgb(px, width, height), quality=quality
                ), "jpeg"
            except (ValueError, TypeError):
                return None, "jpeg"
        if b.startswith(_PNG_SIG):
            try:
                _w, _h, px = _parse_png(b)
                return _encode_png(_box_resize_rgb(px, width, height)), "png"
            except (ValueError, TypeError):
                return None, "png"
        # strict P6 sniff (magic + dims + maxval 255), not just the two
        # magic bytes: document TEXT routed through the stub arm could
        # legitimately start with "P6" and must stay on the stub path
        if re.match(rb"^P6\s+\d+\s+\d+\s+255\s", b[:64]):
            try:
                _w, _h, px = _parse_ppm(b)
                return _encode_ppm(_box_resize_rgb(px, width, height)), "ppm"
            except (ValueError, TypeError):
                return None, "ppm"
        return _fake_resize(b), "raw"

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [_one(b) for b in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    binary_col: [b for b, _f in resized],
                    "media_meta": [
                        {
                            "media_type": "image",
                            "format": f,
                            "width": width if b is not None else None,
                            "height": height if b is not None else None,
                            "duration_ms": None,
                            "size_bytes": len(b) if b is not None else None,
                        }
                        for b, f in resized
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


# ---------------------------------------------------------------------------
# REAL codecs for the formats the standard library can decode: binary
# PPM (P6) images and PCM WAV audio. These are not stubs — header
# parsing, pixel/sample access, nearest-neighbor resize and linear
# resampling are exact — so the Spark plumbing is exercised with real
# decode work end-to-end. JPEG/PNG/MP3/MP4 stay on the fake codecs
# above until PIL/torchaudio exist on the cluster; both codec families
# share batch shapes, so swapping is a one-line change per operator.
# ---------------------------------------------------------------------------


def _parse_ppm(payload: bytes):
    """Decode a binary PPM (P6): returns ``(width, height, pixels)``
    with ``pixels`` an ``(h, w, 3)`` uint8 ndarray. Raises ValueError
    on anything that is not a maxval-255 P6."""
    import numpy as np

    if not payload or not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header = magic, width, height, maxval separated by whitespace;
    # '#' comment lines allowed between tokens
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3 and i < len(payload):
        c = payload[i : i + 1]
        if c == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    raw = payload[i : i + w * h * 3]
    if len(raw) != w * h * 3:
        raise ValueError("truncated PPM payload")
    return w, h, np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def _encode_ppm(pixels) -> bytes:
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def _grid_means(px, w: int, h: int, grid: int) -> list[float]:
    """Per-cell RGB means over a ``grid × grid`` spatial grid of an
    ``(h, w, 3)`` uint8 array — the color-layout feature shared by
    every real image decoder here."""
    feats: list[float] = []
    for gy in range(grid):
        ys = slice(h * gy // grid, max(h * (gy + 1) // grid, h * gy // grid + 1))
        for gx in range(grid):
            xs = slice(w * gx // grid, max(w * (gx + 1) // grid, w * gx // grid + 1))
            cell = px[ys, xs].reshape(-1, 3).mean(axis=0) / 255.0
            feats.extend(float(v) for v in cell)
    return feats


def decode_ppm_features(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "doc_id",
    grid: int = 2,
) -> DataFrame:
    """REAL image decode: P6 pixels → per-cell RGB means over a
    ``grid × grid`` spatial grid (the classic color-layout feature),
    plus real width/height. Output ``(id, width, height, features
    array<float> of len grid*grid*3)``; non-PPM rows yield null
    features so callers can route them to the stub/real-codec path."""
    import numpy as np
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def _one(payload):
        try:
            w, h, px = _parse_ppm(payload)
        except (ValueError, TypeError):
            return None, None, None
        return w, h, _grid_means(px, w, h, grid)

    def _decode(batches: "Iterator[pd.DataFrame]"):
        for pdf in batches:
            decoded = [_one(b) for b in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "features": [d[2] for d in decoded],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(_decode, out_schema)


def resize_ppm(
    df: DataFrame,
    width: int,
    height: int,
    binary_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL nearest-neighbor resize of P6 payloads: binary in → binary
    out (still valid P6) + updated ``media_meta``. Non-PPM rows pass
    through with null content."""
    import numpy as np
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(binary_col, T.BinaryType()),
            T.StructField("media_meta", MEDIA_META_TYPE),
        ]
    )

    def _one(payload):
        try:
            w, h, px = _parse_ppm(payload)
        except (ValueError, TypeError):
            return None
        ys = (np.arange(height) * h // height).clip(0, h - 1)
        xs = (np.arange(width) * w // width).clip(0, w - 1)
        return _encode_ppm(px[ys][:, xs])

    def _resize(batches: "Iterator[pd.DataFrame]"):
        for pdf in batches:
            out = [_one(b) for b in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    binary_col: out,
                    "media_meta": [
                        {
                            "media_type": "image",
                            "format": "ppm",
                            "width": width if b is not None else None,
                            "height": height if b is not None else None,
                            "duration_ms": None,
                            "size_bytes": len(b) if b is not None else None,
                        }
                        for b in out
                    ],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(_resize, out_schema)


def resample_wav(
    df: DataFrame,
    target_hz: int = 16000,
    binary_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL PCM WAV resample: stdlib ``wave`` decode → linear
    interpolation to ``target_hz`` (numpy ``interp``) → re-encoded
     16-bit mono WAV. Output ``(id, content, sample_rate,
    duration_ms)`` with the TRUE post-resample duration; non-WAV rows
    carry null content."""
    import io
    import wave

    import numpy as np
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(binary_col, T.BinaryType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("duration_ms", T.LongType()),
        ]
    )

    def _one(payload):
        try:
            with wave.open(io.BytesIO(payload), "rb") as w:
                rate = w.getframerate()
                n = w.getnframes()
                ch = w.getnchannels()
                width = w.getsampwidth()
                raw = w.readframes(n)
        except (wave.Error, EOFError, AttributeError, TypeError):
            return None, None, None
        if width != 2:
            return None, None, None
        samples = np.frombuffer(raw, dtype=np.int16).reshape(-1, ch)
        mono = samples.mean(axis=1)
        n_out = max(1, int(round(len(mono) * target_hz / rate)))
        resampled = np.interp(
            np.linspace(0, len(mono) - 1, n_out),
            np.arange(len(mono)),
            mono,
        ).astype(np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as out:
            out.setnchannels(1)
            out.setsampwidth(2)
            out.setframerate(target_hz)
            out.writeframes(resampled.tobytes())
        return buf.getvalue(), target_hz, n_out * 1000 // target_hz

    def _resample(batches: "Iterator[pd.DataFrame]"):
        for pdf in batches:
            out = [_one(b) for b in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    binary_col: [o[0] for o in out],
                    "sample_rate": [o[1] for o in out],
                    "duration_ms": [o[2] for o in out],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(_resample, out_schema)


# ---------------------------------------------------------------------------
# REAL PNG codec (non-interlaced 8-bit RGB, color type 2) — pure
# stdlib: the container walk, CRC-32 verification, zlib inflate and the
# full five-type filter reconstruction (None/Sub/Up/Average/Paeth) are
# all exact per the PNG specification. Palette/alpha/16-bit/interlaced
# variants raise and route to the stub path like any other format.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunks(payload: bytes):
    """Yield ``(type, data)`` for each chunk, verifying each CRC-32."""
    import struct
    import zlib

    i = len(_PNG_SIG)
    while i + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[i : i + 4])
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + length]
        crc_bytes = payload[i + 8 + length : i + 12 + length]
        if len(data) != length or len(crc_bytes) != 4:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", crc_bytes)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG CRC mismatch in {ctype!r}")
        yield ctype, data
        i += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _parse_png(payload: bytes):
    """Decode a non-interlaced 8-bit RGB PNG: returns ``(width,
    height, pixels)`` with ``pixels`` an ``(h, w, 3)`` uint8 ndarray.
    Raises ValueError for any other PNG flavor or corrupt stream."""
    import struct
    import zlib

    import numpy as np

    if not payload or not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    w = h = None
    idat = b""
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG flavor (need 8-bit RGB non-interlaced)"
                )
        elif ctype == b"IDAT":
            idat += data
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as exc:
        # the decoder's contract is ValueError on any corrupt stream —
        # callers (decode_png_features) route those rows to null
        raise ValueError(f"corrupt PNG IDAT stream: {exc}") from None
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel payload has wrong length")
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    bpp = 3
    for y in range(h):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        # filters 0/2 have no left-neighbor recurrence -> pure numpy;
        # 1/3/4 predict from the just-reconstructed left pixel, an
        # inherently sequential scan, so they stay per-byte
        if ftype == 0:
            out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
            continue
        if ftype == 2:  # Up
            out[y] = (
                np.frombuffer(bytes(line), dtype=np.uint8) + prev
            )  # uint8 add wraps mod 256
            continue
        if ftype == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                line[x] = (line[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
    return w, h, out.reshape(h, w, 3)


def _encode_png(pixels, filter_choice: str = "adaptive-fixed") -> bytes:
    """Encode an ``(h, w, 3)`` uint8 array as a non-interlaced RGB8
    PNG. ``filter_choice='none'`` writes filter 0 everywhere;
    ``'adaptive-fixed'`` cycles Sub/Up/None per row (computing the
    REAL filtered deltas) so a decoder must implement filter
    reconstruction, not just inflate, to round-trip."""
    import struct
    import zlib

    import numpy as np

    h, w = pixels.shape[:2]
    flat = pixels.reshape(h, w * 3).astype(np.int16)
    lines = []
    for y in range(h):
        row = flat[y]
        ftype = 0
        if filter_choice == "adaptive-fixed":
            ftype = (1, 2, 0)[y % 3] if y else 0
        if ftype == 1:  # Sub: delta vs pixel to the left
            shifted = np.concatenate([np.zeros(3, dtype=np.int16), row[:-3]])
            data = ((row - shifted) % 256).astype(np.uint8)
        elif ftype == 2:  # Up: delta vs row above
            data = ((row - flat[y - 1]) % 256).astype(np.uint8)
        else:
            data = row.astype(np.uint8)
        lines.append(bytes([ftype]) + data.tobytes())

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 6)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def raw_rgb_to_png(
    df: DataFrame,
    width: int,
    height: int,
    binary_col: str = "content",
    id_col: str = "doc_id",
    filter_choice: str = "adaptive-fixed",
) -> DataFrame:
    """REAL PNG encode: pack a raw ``width*height*3``-byte RGB payload
    into a non-interlaced RGB8 PNG (zlib deflate + per-row filter
    computation). Rows whose payload is not exactly that long carry
    null content. Arrow-batched ``mapInPandas``; output ``(id, content
    binary, media_meta)``."""
    import numpy as np
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(binary_col, T.BinaryType()),
            T.StructField("media_meta", MEDIA_META_TYPE),
        ]
    )
    n_bytes = width * height * 3

    def _one(payload):
        if payload is None or len(payload) != n_bytes:
            return None
        px = np.frombuffer(payload, dtype=np.uint8).reshape(height, width, 3)
        return _encode_png(px, filter_choice=filter_choice)

    def _encode(batches: "Iterator[pd.DataFrame]"):
        for pdf in batches:
            out = [_one(b) for b in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    binary_col: out,
                    "media_meta": [
                        {
                            "media_type": "image",
                            "format": "png",
                            "width": width if b is not None else None,
                            "height": height if b is not None else None,
                            "duration_ms": None,
                            "size_bytes": len(b) if b is not None else None,
                        }
                        for b in out
                    ],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(_encode, out_schema)


def decode_png_features(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "doc_id",
    grid: int = 2,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """REAL PNG decode: chunk walk + CRC verify + inflate + filter
    reconstruction, then the same ``grid × grid`` RGB-mean color-layout
    features as :func:`decode_ppm_features`. Non-PNG / unsupported-
    flavor rows yield null features so callers can route them to
    another codec path. ``keep_cols`` pass through the Arrow batch
    untouched — a consumer that needs the encoder's metadata beside
    the features gets it WITHOUT a second execution of the upstream
    encode chain plus a join (a DataFrame consumed by two branches is
    planned, and run, twice)."""
    import pandas as pd

    keep_fields = [df.schema[c] for c in keep_cols]
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            *keep_fields,
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def _one(payload):
        try:
            w, h, px = _parse_png(payload)
        except (ValueError, TypeError):
            return None, None, None
        return w, h, _grid_means(px, w, h, grid)

    def _decode(batches: "Iterator[pd.DataFrame]"):
        for pdf in batches:
            decoded = [_one(b) for b in pdf[binary_col]]
            out = {id_col: pdf[id_col]}
            for c in keep_cols:
                out[c] = pdf[c]
            out["width"] = [d[0] for d in decoded]
            out["height"] = [d[1] for d in decoded]
            out["features"] = [d[2] for d in decoded]
            yield pd.DataFrame(out)

    return df.select(id_col, *keep_cols, binary_col).mapInPandas(
        _decode, out_schema
    )


# ---------------------------------------------------------------------------
# REAL JPEG codec (baseline sequential DCT, 4:4:4, 8-bit) — stdlib+numpy.
#
# Closes the r6 "honest stub" gap for JPEG: the encoder emits a real
# JFIF/baseline stream (level shift → 2-D DCT → quantization → zigzag →
# DC-differential + AC run-length Huffman coding with byte stuffing),
# and the decoder is a genuine marker-loop decoder that reads the
# quantization AND Huffman tables FROM THE STREAM (DQT/DHT), and
# handles sampling factors up to 2x2 — so it round-trips baseline
# 4:4:4, 4:2:2 and 4:2:0 (the dominant real-world flavor) JPEGs, not
# just its own output; the encoder emits 4:4:4 or (subsample=True)
# interleaved-MCU 4:2:0. Unsupported flavors — progressive (SOF2),
# 12-bit, arithmetic coding, factors beyond 2x2 — raise ValueError
# and route to the stub path like every other codec here. JPEG is lossy by construction, so
# the oracle gate for this codec is a tolerance boolean (the HLL
# pattern), not exact pixel equality.
# ---------------------------------------------------------------------------

_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_JPEG_LUM_QT = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_JPEG_CHROMA_QT = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
] + [99] * 32

# Huffman tables written into DHT. Codes are canonical; the decoder
# reads whatever tables the stream carries, so the VALUES here only
# affect compression ratio, never round-trip correctness. DC: 12
# categories at 4 bits. AC: all 162 (run, size) symbols incl. EOB and
# ZRL at 8 bits — complete coverage by construction (asserted in
# tests), max canonical code 161 so the all-ones code never occurs.
_JPEG_DC_BITS = [0, 0, 0, 12] + [0] * 12
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162] + [0] * 8
_JPEG_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _dct_mat():
    import math

    import numpy as np

    t = np.zeros((8, 8))
    for k in range(8):
        for n in range(8):
            c = math.sqrt(0.25) if k else math.sqrt(0.125)
            t[k, n] = c * math.cos(math.pi * (2 * n + 1) * k / 16)
    return t


def _scale_qt(qt, quality: int):
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [max(1, min(255, (v * s + 50) // 100)) for v in qt]


def _canonical_codes(bits, vals):
    """(symbol -> (code, length)) for a canonical Huffman table."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def byte_align(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1s per spec

    def marker(self, byte2: int) -> None:
        """Emit a raw 0xFF<byte2> marker (byte-aligned, unstuffed)."""
        self.byte_align()
        self.buf.append(0xFF)
        self.buf.append(byte2)

    def flush(self) -> bytes:
        self.byte_align()
        return bytes(self.buf)


def _mag_category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _comp_block(comp, ys: int, xs: int):
    """8x8 block at (ys, xs) with edge replication past the borders."""
    import numpy as np

    h, w = comp.shape
    yy = np.clip(np.arange(ys, ys + 8), 0, h - 1)
    xx = np.clip(np.arange(xs, xs + 8), 0, w - 1)
    return comp[np.ix_(yy, xx)]


def _box2(comp):
    """2x2 box-mean downsample (edge-replicated to even dims)."""
    import numpy as np

    h, w = comp.shape
    if h % 2:
        comp = np.vstack([comp, comp[-1:]])
    if w % 2:
        comp = np.hstack([comp, comp[:, -1:]])
    return comp.reshape(comp.shape[0] // 2, 2, comp.shape[1] // 2, 2).mean(
        axis=(1, 3)
    )


def _encode_jpeg(
    pixels,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 RGB array as a baseline JFIF
    JPEG — 4:4:4 by default, 4:2:0 (2x2 luma sampling, box-mean
    chroma downsample, interleaved MCUs) with ``subsample=True``;
    ``restart_interval=N`` emits a DRI segment and RSTn markers every
    N MCUs (the resync structure most real encoders write)."""
    import struct

    import numpy as np

    h, w = pixels.shape[:2]
    px = pixels.astype(np.float64)
    # JFIF BT.601 RGB -> YCbCr
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    comps = [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ]
    if subsample:
        factors = [(2, 2), (1, 1), (1, 1)]
        comps = [comps[0], _box2(comps[1]), _box2(comps[2])]
    else:
        factors = [(1, 1)] * 3
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    qts = [_scale_qt(_JPEG_LUM_QT, quality),
           _scale_qt(_JPEG_CHROMA_QT, quality)]
    qmats = [np.array(qt, dtype=np.float64).reshape(8, 8) for qt in qts]
    t = _dct_mat()
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    dc_tab = _canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_tab = _canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)

    bwr = _BitWriter()
    dc_prev = [0, 0, 0]
    mcu_count = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                bwr.marker(0xD0 + rst_n)
                rst_n = (rst_n + 1) % 8
                dc_prev = [0, 0, 0]
            mcu_count += 1
            for ci, comp in enumerate(comps):
                hi, vi = factors[ci]
                for iby in range(vi):
                    for ibx in range(hi):
                        blk = _comp_block(
                            comp,
                            (my * vi + iby) * 8,
                            (mx * hi + ibx) * 8,
                        )
                        d = t @ (blk - 128.0) @ t.T
                        q = np.rint(d / qmats[min(ci, 1)]).astype(
                            np.int64
                        )
                        zz = [int(q.flat[_JPEG_ZIGZAG[i]]) for i in range(64)]
                        diff = zz[0] - dc_prev[ci]
                        dc_prev[ci] = zz[0]
                        cat = _mag_category(diff)
                        code, ln = dc_tab[cat]
                        bwr.put(code, ln)
                        if cat:
                            v = diff if diff > 0 else diff + (1 << cat) - 1
                            bwr.put(v, cat)
                        run = 0
                        last_nz = max(
                            (i for i in range(1, 64) if zz[i]), default=0
                        )
                        for i in range(1, last_nz + 1):
                            if zz[i] == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = ac_tab[0xF0]  # ZRL
                                bwr.put(code, ln)
                                run -= 16
                            s = _mag_category(zz[i])
                            code, ln = ac_tab[(run << 4) | s]
                            bwr.put(code, ln)
                            v = zz[i] if zz[i] > 0 else zz[i] + (1 << s) - 1
                            bwr.put(v, s)
                            run = 0
                        if last_nz < 63:
                            code, ln = ac_tab[0x00]  # EOB
                            bwr.put(code, ln)
    data = bwr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, qt in enumerate(qts):
        zz_qt = bytes(qt[_JPEG_ZIGZAG[i]] for i in range(64))
        out += seg(0xFFDB, bytes([tid]) + zz_qt)
    samp = [(fh << 4) | fv for fh, fv in factors]
    out += seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes(
            [1, samp[0], 0, 2, samp[1], 1, 3, samp[2], 1]
        ),
    )
    for tclass_tid, (bits, vals) in (
        ((0x00, (_JPEG_DC_BITS, _JPEG_DC_VALS))),
        ((0x10, (_JPEG_AC_BITS, _JPEG_AC_VALS))),
        ((0x01, (_JPEG_DC_BITS, _JPEG_DC_VALS))),
        ((0x11, (_JPEG_AC_BITS, _JPEG_AC_VALS))),
    ):
        out += seg(
            0xFFC4, bytes([tclass_tid]) + bytes(bits) + bytes(vals)
        )
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    out += seg(
        0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    )
    return out + data + b"\xff\xd9"  # EOI


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; raises
    ValueError past the end (truncated stream)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | byte
        self.n += 8

    def consume_restart(self) -> None:
        """Byte-align and consume an RSTn (0xFFD0-D7) marker — the
        per-restart-interval resync real encoders emit (DRI)."""
        self.acc = 0
        self.n = 0  # discard pad bits to the byte boundary
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or not (0xD0 <= self.data[self.pos + 1] <= 0xD7)
        ):
            raise ValueError("expected JPEG restart marker")
        self.pos += 2

    def bit(self) -> int:
        if not self.n:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _huff_decode(reader: "_BitReader", table: dict) -> int:
    code, ln = 0, 0
    while ln <= 16:
        code = (code << 1) | reader.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _parse_jpeg(payload: bytes):
    """Decode a baseline sequential 4:4:4 (or grayscale) JPEG:
    returns ``(width, height, pixels)`` with ``pixels`` an
    ``(h, w, 3)`` uint8 ndarray. The quantization and Huffman tables
    are read from the stream (DQT/DHT), so any compliant baseline
    non-subsampled file decodes — progressive, subsampled, 12-bit and
    arithmetic-coded flavors raise ValueError (stub-path routing)."""
    import struct

    import numpy as np

    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qts: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    w = h = None
    comps = None  # [(cid, qt_id, fh, fv)]
    scan_tabs = None  # [(dc_tid, ac_tid)]
    restart_interval = 0
    i = 2
    data_start = None
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI with no scan
            break
        (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
        seg = payload[i + 4 : i + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT (possibly several tables)
            j = 0
            while j < len(seg):
                prec_id = seg[j]
                if prec_id >> 4:
                    raise ValueError("16-bit JPEG quant tables unsupported")
                tid = prec_id & 0x0F
                zz = list(seg[j + 1 : j + 65])
                if len(zz) != 64:
                    raise ValueError("short DQT")
                qt = [0] * 64
                for k in range(64):
                    qt[_JPEG_ZIGZAG[k]] = zz[k]
                qts[tid] = qt
                j += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            j = 0
            while j < len(seg):
                tc_th = seg[j]
                bits = list(seg[j + 1 : j + 17])
                nval = sum(bits)
                vals = list(seg[j + 17 : j + 17 + nval])
                if len(vals) != nval:
                    raise ValueError("short DHT")
                table = {}
                code = 0
                k = 0
                for ln in range(1, 17):
                    for _ in range(bits[ln - 1]):
                        table[(ln, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(tc_th >> 4, tc_th & 0x0F)] = table
                j += 17 + nval
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            if nc not in (1, 3):
                raise ValueError("only 1/3-component JPEG supported")
            comps = []
            for c in range(nc):
                cid, samp, qtid = seg[6 + 3 * c : 9 + 3 * c]
                fh, fv = samp >> 4, samp & 0x0F
                if not (1 <= fh <= 2 and 1 <= fv <= 2):
                    raise ValueError(
                        "JPEG sampling factors beyond 2x2 unsupported"
                    )
                comps.append((cid, qtid, fh, fv))
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            if comps is None or ns != len(comps):
                raise ValueError("JPEG SOS/SOF component mismatch")
            scan_tabs = []
            for c in range(ns):
                _cid, tt = seg[1 + 2 * c : 3 + 2 * c]
                scan_tabs.append((tt >> 4, tt & 0x0F))
            data_start = i + 2 + seglen
            break
        i += 2 + seglen
    if data_start is None or w is None:
        raise ValueError("JPEG missing SOF/SOS")
    end = payload.rfind(b"\xff\xd9")
    if end < data_start:
        raise ValueError("JPEG missing EOI")
    reader = _BitReader(payload[data_start:end])

    t = _dct_mat()
    nc = len(comps)
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    if any(hmax % c[2] or vmax % c[3] for c in comps):
        raise ValueError("JPEG non-integer sampling ratios unsupported")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * 8 * c[3], mcux * 8 * c[2])) for c in comps
    ]
    dc_prev = [0] * nc
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                reader.consume_restart()
                dc_prev = [0] * nc  # predictors reset at each restart
            mcu_count += 1
            for ci in range(nc):
                _cid, qtid, fh, fv = comps[ci]
                dc_tab = huff.get((0, scan_tabs[ci][0]))
                ac_tab = huff.get((1, scan_tabs[ci][1]))
                qt = qts.get(qtid)
                if dc_tab is None or ac_tab is None or qt is None:
                    raise ValueError("JPEG missing table for scan")
                for iby in range(fv):
                    for ibx in range(fh):
                        zz = [0] * 64
                        s = _huff_decode(reader, dc_tab)
                        diff = _extend(reader.bits(s), s) if s else 0
                        dc_prev[ci] += diff
                        zz[0] = dc_prev[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, ac_tab)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0x0F
                            if k > 63:
                                raise ValueError(
                                    "JPEG AC index overflow"
                                )
                            zz[k] = _extend(reader.bits(size), size)
                            k += 1
                        q = np.zeros(64)
                        for k in range(64):
                            q[_JPEG_ZIGZAG[k]] = (
                                zz[k] * qt[_JPEG_ZIGZAG[k]]
                            )
                        blk = t.T @ q.reshape(8, 8) @ t + 128.0
                        ys = (my * fv + iby) * 8
                        xs = (mx * fh + ibx) * 8
                        planes[ci][ys : ys + 8, xs : xs + 8] = blk
    # upsample subsampled components to full resolution (pixel
    # replication — the spec-legal nearest reconstruction)
    full = []
    for ci in range(nc):
        _cid, _qtid, fh, fv = comps[ci]
        pl = planes[ci]
        if fv != vmax or fh != hmax:
            pl = np.repeat(
                np.repeat(pl, vmax // fv, axis=0), hmax // fh, axis=1
            )
        full.append(pl[:h, :w])
    if nc == 1:
        y = full[0]
        rgb = np.stack([y, y, y], axis=-1)
    else:
        y = full[0]
        cb = full[1] - 128.0
        cr = full[2] - 128.0
        rgb = np.stack(
            [
                y + 1.402 * cr,
                y - 0.344136 * cb - 0.714136 * cr,
                y + 1.772 * cb,
            ],
            axis=-1,
        )
    return w, h, np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def raw_rgb_to_jpeg(
    df: DataFrame,
    width: int,
    height: int,
    binary_col: str = "content",
    id_col: str = "doc_id",
    quality: int = 97,
) -> DataFrame:
    """REAL JPEG encode: pack a raw ``width*height*3``-byte RGB payload
    into a baseline 4:4:4 JFIF JPEG (DCT → quantization → Huffman with
    byte stuffing). Rows whose payload is not exactly that long carry
    null content. Arrow-batched ``mapInPandas``."""
    import numpy as np
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(binary_col, T.BinaryType()),
            T.StructField("media_meta", MEDIA_META_TYPE),
        ]
    )
    n_bytes = width * height * 3

    def _one(payload):
        if payload is None or len(payload) != n_bytes:
            return None
        px = np.frombuffer(payload, dtype=np.uint8).reshape(height, width, 3)
        return _encode_jpeg(px, quality=quality)

    def _encode(batches: "Iterator[pd.DataFrame]"):
        for pdf in batches:
            out = [_one(b) for b in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    binary_col: out,
                    "media_meta": [
                        {
                            "media_type": "image",
                            "format": "jpeg",
                            "width": width if b is not None else None,
                            "height": height if b is not None else None,
                            "duration_ms": None,
                            "size_bytes": len(b) if b is not None else None,
                        }
                        for b in out
                    ],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(_encode, out_schema)


def decode_jpeg_features(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "doc_id",
    grid: int = 2,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """REAL JPEG decode: marker loop, stream-read DQT/DHT tables,
    Huffman + run-length entropy decode, dequantize, IDCT, YCbCr→RGB —
    then the same ``grid × grid`` RGB-mean features as the PPM/PNG
    decoders. Non-JPEG / unsupported-flavor / corrupt rows yield null
    features (stub-path routing). ``keep_cols`` pass through the Arrow
    batch untouched (see :func:`decode_png_features`)."""
    import pandas as pd

    keep_fields = [df.schema[c] for c in keep_cols]
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            *keep_fields,
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def _one(payload):
        try:
            w, h, px = _parse_jpeg(payload)
        except (ValueError, TypeError):
            return None, None, None
        return w, h, _grid_means(px, w, h, grid)

    def _decode(batches: "Iterator[pd.DataFrame]"):
        for pdf in batches:
            decoded = [_one(b) for b in pdf[binary_col]]
            out = {id_col: pdf[id_col]}
            for c in keep_cols:
                out[c] = pdf[c]
            out["width"] = [d[0] for d in decoded]
            out["height"] = [d[1] for d in decoded]
            out["features"] = [d[2] for d in decoded]
            yield pd.DataFrame(out)

    return df.select(id_col, *keep_cols, binary_col).mapInPandas(
        _decode, out_schema
    )


def rgb_codec_roundtrip_features(
    df: DataFrame,
    codec: str,
    width: int,
    height: int,
    binary_col: str = "content",
    id_col: str = "doc_id",
    grid: int = 2,
    quality: int = 97,
    filter_choice: str = "adaptive-fixed",
) -> DataFrame:
    """Encode a raw RGB payload through the REAL ``png``/``jpeg`` codec
    and decode it back to grid-mean features in ONE Arrow-batched pass.

    Exactly the composition ``raw_rgb_to_png/jpeg →
    decode_png/jpeg_features`` (same ``_encode_*`` / ``_parse_*`` /
    ``_grid_means`` helpers, same null routing: wrong-length payloads
    encode to null, null/corrupt bitstreams decode to null features) —
    but as a single ``mapInPandas`` stage. Chained, each stage pays a
    full JVM→Python→JVM Arrow round trip and the encoded bitstream
    crosses the boundary twice for no reason; fused, the bitstream
    never leaves the Python worker (guide §4.1: you cannot remove the
    boundary, but you control how often you cross it)."""
    import numpy as np
    import pandas as pd

    if codec not in ("png", "jpeg"):
        raise ValueError(f"unsupported roundtrip codec: {codec!r}")
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )
    n_bytes = width * height * 3

    def _one(payload):
        if payload is None or len(payload) != n_bytes:
            return None, None, None
        px = np.frombuffer(payload, dtype=np.uint8).reshape(height, width, 3)
        if codec == "png":
            enc = _encode_png(px, filter_choice=filter_choice)
        else:
            enc = _encode_jpeg(px, quality=quality)
        try:
            w, h, dec = _parse_png(enc) if codec == "png" else _parse_jpeg(enc)
        except (ValueError, TypeError):
            return None, None, None
        return w, h, _grid_means(dec, w, h, grid)

    def _roundtrip(batches: "Iterator[pd.DataFrame]"):
        for pdf in batches:
            decoded = [_one(b) for b in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "features": [d[2] for d in decoded],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(_roundtrip, out_schema)


# ---------------------------------------------------------------------------
# REAL MP4 (ISO-BMFF) container codec — stdlib struct only.
#
# Closes the container half of the r6 "MP4 is a stub" gap: the writer
# emits a structurally valid ISO base-media file (ftyp + mdat + a full
# moov/trak/mdia/minf/stbl sample-table chain), and the parser is a
# genuine box walker that reconstructs per-sample (offset, size,
# timestamp) from the REAL sample tables — stts (durations), stsz
# (sizes), stsc (chunk runs), stco/co64 (chunk offsets) — the exact
# machinery a production frame sampler seeks with. What stays honestly
# stubbed is the frame PAYLOAD codec (H.264/AV1 bitstream decode needs
# external libs); sampled frames surface as opaque bytes + real
# timestamps, which is precisely what a training pipeline hands to a
# GPU decode stage anyway.
# ---------------------------------------------------------------------------


def _mp4_box(btype: bytes, payload: bytes) -> bytes:
    import struct

    return struct.pack(">I", len(payload) + 8) + btype + payload


def _full_box(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    import struct

    return _mp4_box(btype, struct.pack(">I", (version << 24) | flags) + payload)


def _encode_mp4(frames: list, fps: int = 30, timescale: int = 90000) -> bytes:
    """Pack opaque frame payloads into a minimal valid single-track
    ISO-BMFF file: one chunk, constant frame duration, real stbl."""
    import struct

    n = len(frames)
    if n == 0:
        raise ValueError("mp4 needs at least one frame")
    delta = timescale // fps
    duration = n * delta
    mdat_payload = b"".join(frames)

    ftyp = _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    # stco needs the absolute offset of the first frame byte: it sits
    # right after ftyp + the mdat header (8 bytes). moov follows mdat.
    chunk_off = len(ftyp) + 8

    stsd = _full_box(
        b"stsd",
        0, 0,
        struct.pack(">I", 1)
        # one generic sample entry: fourcc 'raw ' with the 8-byte
        # sample-entry header (6 reserved + data_reference_index)
        + _mp4_box(b"raw ", b"\x00" * 6 + struct.pack(">H", 1)),
    )
    stts = _full_box(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _full_box(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full_box(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = _full_box(b"stco", 0, 0, struct.pack(">II", 1, chunk_off))
    stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full_box(
        b"dref", 0, 0,
        struct.pack(">I", 1) + _full_box(b"url ", 0, 1, b""),
    )
    dinf = _mp4_box(b"dinf", dref)
    minf = _mp4_box(b"minf", vmhd + dinf + stbl)
    mdhd = _full_box(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),
    )
    hdlr = _full_box(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"pypeman\x00",
    )
    mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full_box(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(
            ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
        )
        + struct.pack(">II", 0, 0),
    )
    trak = _mp4_box(b"trak", tkhd + mdia)
    mvhd = _full_box(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, 1000, duration * 1000 // timescale)
        + struct.pack(">IH", 0x10000, 0x0100)
        + b"\x00" * 10
        + struct.pack(
            ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
        )
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    moov = _mp4_box(b"moov", mvhd + trak)
    return ftyp + _mp4_box(b"mdat", mdat_payload) + moov


def _walk_boxes(data: bytes, start: int, end: int):
    import struct

    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", data[i : i + 4])
        btype = data[i + 4 : i + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if i + 16 > end:
                raise ValueError("truncated mp4 largesize box")
            (size,) = struct.unpack(">Q", data[i + 8 : i + 16])
            hdr = 16
        elif size == 0:  # box extends to EOF
            size = end - i
        if size < hdr or i + size > end:
            raise ValueError(f"bad mp4 box size in {btype!r}")
        yield btype, i + hdr, i + size
        i += size


def _find_box(data: bytes, path: list, start: int, end: int):
    """(payload_start, payload_end) of the first box at a nested path.
    When a matching box doesn't contain the rest of the path, sibling
    boxes of the same type are tried (a real file can interleave e.g.
    multiple ``trak`` boxes; bailing on the first would miss the one
    that actually holds the nested chain)."""
    for btype, ps, pe in _walk_boxes(data, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return ps, pe
            try:
                return _find_box(data, path[1:], ps, pe)
            except ValueError:
                continue
    raise ValueError(f"mp4 missing box {b'/'.join(path)!r}")


def _parse_mp4(payload: bytes):
    """Reconstruct the sample map of the FIRST video track: returns
    ``(timescale, [(offset, size, ts_units), ...])`` from the real
    stts/stsz/stsc/stco(co64) tables — the full chunk-run mapping, not
    just the single-chunk shape the writer emits."""
    import struct

    if len(payload) < 16:
        raise ValueError("not an mp4")
    try:
        _find_box(payload, [b"ftyp"], 0, len(payload))
    except ValueError:
        raise ValueError("not an mp4 (no ftyp)") from None
    # pick the first VIDEO trak (mdia/hdlr handler 'vide'), not just the
    # first trak: a real MP4 whose audio trak precedes the video trak
    # would otherwise silently yield the audio sample table as "frames"
    moov_s, moov_e = _find_box(payload, [b"moov"], 0, len(payload))
    mdia = first_mdia = None
    for btype, ps, pe in _walk_boxes(payload, moov_s, moov_e):
        if btype != b"trak":
            continue
        try:
            ms, me = _find_box(payload, [b"mdia"], ps, pe)
        except ValueError:
            continue
        if first_mdia is None:
            first_mdia = (ms, me)
        try:
            hs, _he = _find_box(payload, [b"hdlr"], ms, me)
            # hdlr payload: 4B version/flags, 4B pre_defined, 4B handler
            handler = payload[hs + 8 : hs + 12]
        except ValueError:
            handler = b""
        if handler == b"vide":
            mdia = (ms, me)
            break
    if mdia is None:
        if first_mdia is None:
            raise ValueError("mp4 missing box b'moov/trak/mdia'")
        mdia = first_mdia  # no 'vide' handler anywhere: legacy fallback
    mdia_s, mdia_e = mdia
    mdhd_s, _mdhd_e = _find_box(payload, [b"mdhd"], mdia_s, mdia_e)
    version = payload[mdhd_s]
    if version == 1:
        (timescale,) = struct.unpack(
            ">I", payload[mdhd_s + 20 : mdhd_s + 24]
        )
    else:
        (timescale,) = struct.unpack(
            ">I", payload[mdhd_s + 12 : mdhd_s + 16]
        )
    stbl_s, stbl_e = _find_box(
        payload, [b"minf", b"stbl"], mdia_s, mdia_e
    )

    def full(btype):
        s, e = _find_box(payload, [btype], stbl_s, stbl_e)
        return s + 4, e  # skip version+flags

    # stts -> per-sample durations
    s, e = full(b"stts")
    (nent,) = struct.unpack(">I", payload[s : s + 4])
    durations = []
    p = s + 4
    for _ in range(nent):
        cnt, delta = struct.unpack(">II", payload[p : p + 8])
        durations.extend([delta] * cnt)
        p += 8
    # stsz -> sizes
    s, e = full(b"stsz")
    fixed, n = struct.unpack(">II", payload[s : s + 8])
    if fixed:
        sizes = [fixed] * n
    else:
        sizes = list(
            struct.unpack(f">{n}I", payload[s + 8 : s + 8 + 4 * n])
        )
    if len(durations) < n:
        raise ValueError("mp4 stts/stsz disagree")
    # stco / co64 -> chunk offsets
    try:
        s, e = full(b"stco")
        (nch,) = struct.unpack(">I", payload[s : s + 4])
        offsets = list(
            struct.unpack(f">{nch}I", payload[s + 4 : s + 4 + 4 * nch])
        )
    except ValueError:
        s, e = full(b"co64")
        (nch,) = struct.unpack(">I", payload[s : s + 4])
        offsets = list(
            struct.unpack(f">{nch}Q", payload[s + 4 : s + 4 + 8 * nch])
        )
    # stsc -> samples-per-chunk runs
    s, e = full(b"stsc")
    (nsc,) = struct.unpack(">I", payload[s : s + 4])
    runs = [
        struct.unpack(">III", payload[s + 4 + 12 * i : s + 16 + 12 * i])
        for i in range(nsc)
    ]
    samples = []
    ts = 0
    si = 0
    for ri, (first_chunk, per_chunk, _desc) in enumerate(runs):
        last_chunk = (
            runs[ri + 1][0] - 1 if ri + 1 < len(runs) else len(offsets)
        )
        for ch in range(first_chunk, last_chunk + 1):
            off = offsets[ch - 1]
            for _ in range(per_chunk):
                if si >= n:
                    break
                size = sizes[si]
                if off + size > len(payload):
                    raise ValueError("mp4 sample beyond file end")
                samples.append((off, size, ts))
                off += size
                ts += durations[si]
                si += 1
    if si != n:
        raise ValueError("mp4 chunk map does not cover all samples")
    return timescale, samples


def frames_to_mp4(
    df: DataFrame,
    frames_col: str = "frames",
    id_col: str = "doc_id",
    fps: int = 30,
) -> DataFrame:
    """REAL MP4 container encode: pack an ``array<binary>`` of opaque
    frame payloads into a valid single-track ISO-BMFF file (ftyp +
    mdat + full moov/stbl sample tables). Empty/null frame lists carry
    null content."""
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("media_meta", MEDIA_META_TYPE),
        ]
    )

    def _one(frames):
        if frames is None or len(frames) == 0:
            return None
        return _encode_mp4([bytes(f) for f in frames], fps=fps)

    def _encode(batches: "Iterator[pd.DataFrame]"):
        for pdf in batches:
            out = [_one(f) for f in pdf[frames_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "content": out,
                    "media_meta": [
                        {
                            "media_type": "video",
                            "format": "mp4",
                            "width": None,
                            "height": None,
                            "duration_ms": (
                                len(pdf[frames_col][i]) * 1000 // fps
                                if out[i] is not None
                                else None
                            ),
                            "size_bytes": (
                                len(out[i]) if out[i] is not None else None
                            ),
                        }
                        for i in range(len(out))
                    ],
                }
            )

    return df.select(id_col, frames_col).mapInPandas(_encode, out_schema)


def sample_mp4_frames(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "doc_id",
    every_ms: int = 1000,
) -> DataFrame:
    """REAL container-level frame sampling: parse the MP4 sample
    tables, pick the first sample at or after each ``every_ms`` tick,
    and slice its ACTUAL bytes out of mdat. One output row per sampled
    frame: ``(id, frame_idx, ts_ms, frame binary)``. Rows that are not
    parseable MP4s yield a single null-frame row (stub-path routing).
    The frame payload stays an opaque bitstream — decoding it is the
    external-lib stage a production pipeline runs on GPU."""
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def _one(payload):
        try:
            timescale, samples = _parse_mp4(bytes(payload))
        except (ValueError, TypeError):
            return [(None, None, None)]
        out = []
        next_tick = 0
        for i, (off, size, ts_units) in enumerate(samples):
            ts_ms = ts_units * 1000 // timescale
            if ts_ms >= next_tick:
                out.append((i, ts_ms, bytes(payload[off : off + size])))
                next_tick = ts_ms + every_ms
        return out or [(None, None, None)]

    def _sample(batches: "Iterator[pd.DataFrame]"):
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for did, payload in zip(pdf[id_col], pdf[binary_col]):
                for idx, ts, fr in _one(payload):
                    ids.append(did)
                    idxs.append(idx)
                    tss.append(ts)
                    frames.append(fr)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": pd.array(idxs, dtype="Int32"),
                    "ts_ms": pd.array(tss, dtype="Int64"),
                    "frame": frames,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(_sample, out_schema)


# ---------------------------------------------------------------------------
# REAL MP3 frame parser — stdlib only.
#
# Same stance as the MP4 codec: the CONTAINER layer is real, the PCM
# decode stays honestly external. The parser does a genuine MPEG
# frame-sync walk — ID3v2 tag skip (syncsafe size), per-frame header
# decode (version/layer/bitrate/samplerate/padding from the standard
# tables), exact frame-length arithmetic, ID3v1 trailer handling — and
# reconstructs (offset, size, duration) per frame, which is everything
# a training pipeline needs for duration accounting, segment slicing
# and shuffling audio WITHOUT decoding it. Layer III MPEG-1/2/2.5 only;
# anything unsyncable raises ValueError (stub-path routing).
# ---------------------------------------------------------------------------

_MP3_BITRATES_V1_L3 = [
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
]
_MP3_BITRATES_V2_L3 = [
    0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160,
]
_MP3_RATES = {
    3: [44100, 48000, 32000],   # MPEG-1
    2: [22050, 24000, 16000],   # MPEG-2
    0: [11025, 12000, 8000],    # MPEG-2.5
}


def _mp3_frame_at(payload: bytes, i: int):
    """(frame_len, sample_rate, samples_per_frame, bitrate_kbps) of the
    frame whose header starts at ``i``; ValueError if not a frame."""
    if i + 4 > len(payload):
        raise ValueError("truncated mp3 header")
    b0, b1, b2, _b3 = payload[i : i + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        raise ValueError("mp3 sync lost")
    version = (b1 >> 3) & 0x03  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = (b1 >> 1) & 0x03    # 1 = Layer III
    if version == 1 or layer != 1:
        raise ValueError("not an MPEG-1/2/2.5 Layer III frame")
    br_idx = (b2 >> 4) & 0x0F
    sr_idx = (b2 >> 2) & 0x03
    padding = (b2 >> 1) & 0x01
    if br_idx in (0, 15) or sr_idx == 3:
        raise ValueError("free-format/bad mp3 bitrate or samplerate")
    if version == 3:
        bitrate = _MP3_BITRATES_V1_L3[br_idx]
        spf = 1152
    else:
        bitrate = _MP3_BITRATES_V2_L3[br_idx]
        spf = 576
    sample_rate = _MP3_RATES[version][sr_idx]
    frame_len = (spf // 8) * bitrate * 1000 // sample_rate + padding
    return frame_len, sample_rate, spf, bitrate


def _parse_mp3(payload: bytes):
    """Walk an MP3 stream: returns ``(sample_rate, [(offset, size,
    start_ms), ...])``. Skips a leading ID3v2 tag (syncsafe length)
    and a trailing 128-byte ID3v1 tag; a sync loss mid-stream or an
    unparseable head raises ValueError."""
    if payload is None or len(payload) < 4:
        raise ValueError("not an mp3")
    payload = bytes(payload)
    i = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        size = 0
        for b in payload[6:10]:
            size = (size << 7) | (b & 0x7F)
        i = 10 + size
    end = len(payload)
    if end - i > 128 and payload[end - 128 : end - 125] == b"TAG":
        end -= 128
    frames = []
    cum_samples = 0  # integer accumulation: start_ms is exact, never
    sr0 = None       # a float-sum truncation artifact
    while i < end:
        if end - i < 4:
            break  # trailing garbage shorter than a header
        frame_len, sr, spf, _br = _mp3_frame_at(payload, i)
        if sr0 is None:
            sr0 = sr
        if i + frame_len > end:
            break  # final truncated frame: ignore, like real players
        frames.append((i, frame_len, cum_samples * 1000 // sr0))
        cum_samples += spf
        i += frame_len
    if not frames:
        raise ValueError("no mp3 frames found")
    return sr0, frames


def mp3_audio_meta(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL MP3 metadata extraction via the frame walk: per row
    ``(id, sample_rate, n_frames, duration_ms)`` — exact (every frame
    counted, VBR-safe by construction since lengths come from each
    frame's own header, not a bitrate guess). Unparseable rows carry
    nulls."""
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("duration_ms", T.LongType()),
        ]
    )

    def _one(payload):
        try:
            sr, frames = _parse_mp3(payload)
        except (ValueError, TypeError):
            return None, None, None
        off, _size, _start = frames[-1]
        _fl, _sr, spf, _br = _mp3_frame_at(bytes(payload), off)
        # exact: total samples over the true rate, integer division
        total = sum(
            _mp3_frame_at(bytes(payload), o)[2] for o, _s, _t in frames
        )
        return sr, len(frames), total * 1000 // sr

    def _meta(batches: "Iterator[pd.DataFrame]"):
        for pdf in batches:
            rows = [_one(b) for b in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sample_rate": pd.array(
                        [r[0] for r in rows], dtype="Int32"
                    ),
                    "n_frames": pd.array(
                        [r[1] for r in rows], dtype="Int32"
                    ),
                    "duration_ms": pd.array(
                        [r[2] for r in rows], dtype="Int64"
                    ),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(_meta, out_schema)


def sample_mp3_segments(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "doc_id",
    every_ms: int = 1000,
) -> DataFrame:
    """Frame-accurate audio segmenting: one row per ``every_ms`` tick,
    carrying the ACTUAL bytes of the frame that starts at-or-after the
    tick — the slice a downstream GPU decoder consumes. Unparseable
    rows yield a single null-segment row."""
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("segment_idx", T.IntegerType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("segment", T.BinaryType()),
        ]
    )

    def _one(payload):
        try:
            _sr, frames = _parse_mp3(payload)
        except (ValueError, TypeError):
            return [(None, None, None)]
        out = []
        next_tick = 0
        for k, (off, size, start_ms) in enumerate(frames):
            if start_ms >= next_tick:
                out.append(
                    (k, start_ms, bytes(payload[off : off + size]))
                )
                next_tick = start_ms + every_ms
        return out or [(None, None, None)]

    def _sample(batches: "Iterator[pd.DataFrame]"):
        for pdf in batches:
            ids, idxs, tss, segs = [], [], [], []
            for did, payload in zip(pdf[id_col], pdf[binary_col]):
                for k, ts, seg in _one(payload):
                    ids.append(did)
                    idxs.append(k)
                    tss.append(ts)
                    segs.append(seg)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "segment_idx": pd.array(idxs, dtype="Int32"),
                    "ts_ms": pd.array(tss, dtype="Int64"),
                    "segment": segs,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(_sample, out_schema)
