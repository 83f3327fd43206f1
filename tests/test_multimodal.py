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
