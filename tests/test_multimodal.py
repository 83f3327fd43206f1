"""Multimodal column plumbing: schema, Arrow batch shape, fan-out.
Codec steps are deterministic stubs (marked in functions/multimodal.py);
the Spark-side machinery under test is real."""

from pyspark.sql import functions as F, types as T

from pypeman_spark.functions import multimodal as MM


def media_df(spark):
    return spark.createDataFrame(
        [(1, b"aaaa"), (2, b"bbbbbbbb"), (3, None)],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )


def test_attach_media_meta(spark):
    out = MM.attach_media_meta(media_df(spark)).collect()
    by_id = {r["doc_id"]: r["media_meta"] for r in out}
    assert by_id[1]["size_bytes"] == 4 and by_id[1]["media_type"] == "image"
    assert by_id[3]["size_bytes"] is None


def test_decode_image_features_shape(spark):
    out = MM.decode_image_features(media_df(spark), dim=8).collect()
    assert {r["doc_id"] for r in out} == {1, 2, 3}
    for r in out:
        assert len(r["features"]) == 8
    # deterministic: same input bytes → same features
    again = MM.decode_image_features(media_df(spark), dim=8).collect()
    assert sorted(map(str, out)) == sorted(map(str, again))


def test_resize_media_updates_meta(spark):
    out = MM.resize_media(media_df(spark), width=64, height=32).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["media_meta"]["width"] == 64
    assert by_id[1]["media_meta"]["height"] == 32
    assert len(by_id[1]["content"]) == 64 * 32 // 256
    assert by_id[1]["media_meta"]["size_bytes"] == len(by_id[1]["content"])
    assert by_id[3]["content"] == b""


def test_audio_resample_decimates(spark):
    out = MM.audio_resample(media_df(spark), target_hz=22050).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[2]["sample_rate"] == 22050
    assert len(by_id[2]["content"]) == 4  # every 2nd byte of 8
    assert by_id[3]["content"] == b""


def test_video_frame_sampling_fanout(spark):
    out = MM.sample_video_frames(
        media_df(spark), every_ms=500, fake_duration_ms=2000
    )
    rows = out.collect()
    assert len(rows) == 3 * 4  # 4 offsets per doc
    offs = sorted(
        r["offset_ms"] for r in rows if r["doc_id"] == 1
    )
    assert offs == [0, 500, 1000, 1500]


def _ppm(w, h, rgb):
    # solid-color P6 with a comment line in the header
    return (b"P6\n# test\n%d %d\n255\n" % (w, h)) + bytes(rgb) * (w * h)


def _wav(rate, hz, seconds=1, amp=12000):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        n = rate * seconds
        frames = b"".join(
            struct.pack("<h", int(amp * math.sin(2 * math.pi * hz * i / rate)))
            for i in range(n)
        )
        w.writeframes(frames)
    return buf.getvalue()


def test_real_ppm_decode_and_resize(spark):
    from pypeman_spark.functions.multimodal import (
        _parse_ppm,
        decode_ppm_features,
        resize_ppm,
    )

    red = _ppm(8, 4, (255, 0, 0))
    blue = _ppm(6, 6, (0, 0, 255))
    df = spark.createDataFrame(
        [(1, bytearray(red)), (2, bytearray(blue)), (3, bytearray(b"JPEG..."))],
        "doc_id long, content binary",
    )
    got = {
        r["doc_id"]: r
        for r in decode_ppm_features(df, grid=2).collect()
    }
    assert (got[1]["width"], got[1]["height"]) == (8, 4)
    # solid red: every grid cell decodes to exactly (1, 0, 0)
    assert got[1]["features"] == [1.0, 0.0, 0.0] * 4
    assert got[2]["features"] == [0.0, 0.0, 1.0] * 4
    assert got[3]["features"] is None  # non-PPM routed out, not crashed

    resized = {
        r["doc_id"]: r for r in resize_ppm(df, 4, 2).collect()
    }
    w, h, px = _parse_ppm(bytes(resized[1]["content"]))
    assert (w, h) == (4, 2)
    assert bytes(px[0, 0]) == b"\xff\x00\x00"  # still red after resize
    assert resized[1]["media_meta"]["width"] == 4
    assert resized[3]["content"] is None


def test_real_wav_resample(spark):
    import io
    import wave

    from pypeman_spark.functions.multimodal import resample_wav

    src = _wav(rate=44100, hz=440, seconds=1)
    df = spark.createDataFrame(
        [(1, bytearray(src)), (2, bytearray(b"mp3junk"))],
        "doc_id long, content binary",
    )
    got = {r["doc_id"]: r for r in resample_wav(df, target_hz=16000).collect()}
    assert got[1]["sample_rate"] == 16000
    assert got[1]["duration_ms"] == 1000
    with wave.open(io.BytesIO(bytes(got[1]["content"])), "rb") as w:
        assert w.getframerate() == 16000
        assert abs(w.getnframes() - 16000) <= 1
    assert got[2]["content"] is None
