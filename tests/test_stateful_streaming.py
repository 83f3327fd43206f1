"""Stateful streaming tests: per-key state across micro-batches and
watermarked windows (SURVEY §2.H / guide 'Structured Streaming')."""

import json

from pyspark.sql import functions as F

from pypeman_spark.message import ensure_message_columns
from pypeman_spark.streaming.stateful import (
    running_counter,
    watermarked_window_counts,
)


def test_running_counter_across_batches(spark, tmp_path):
    landing = tmp_path / "in"
    landing.mkdir()
    for i in range(3):
        (landing / f"a{i}.txt").write_text(json.dumps({"n": i}))

    src = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", "*.txt")
        .load(str(landing))
        .select(F.col("value").alias("payload"))
        .withColumn("channel", F.lit("c1"))
    )
    counted = running_counter(src, key_col="channel")
    q = (
        counted.writeStream.format("memory")
        .queryName("counter_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            r["key"]: r["count"]
            for r in spark.sql("SELECT * FROM counter_out").collect()
        }
        assert first == {"c1": 3}
        # second batch: state persists, counter continues
        (landing / "late1.txt").write_text(json.dumps({"n": 99}))
        (landing / "late2.txt").write_text(json.dumps({"n": 100}))
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM counter_out ORDER BY count DESC LIMIT 1"
        ).collect()
        assert rows[0]["count"] == 5
    finally:
        q.stop()


def test_watermarked_window_counts_batch_semantics(spark, sf_dir):
    # batch run of the same expression the streaming channel uses
    from pypeman_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").alias("timestamp")
    )
    out = watermarked_window_counts(ev, window="60 minutes", watermark="10 minutes")
    rows = out.collect()
    assert sum(r["n"] for r in rows) == ev.count()
    # tumbling windows are exactly 1h wide
    assert all(
        (r["window_end"] - r["window_start"]).total_seconds() == 3600 for r in rows
    )
