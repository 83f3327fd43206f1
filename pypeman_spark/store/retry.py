"""Retry store — dead-letter queue with automatic re-injection.

Reference: ``pypeman/retry.py:13-240`` (RetryFileMsgStore): failed
messages are parked with the node name to re-enter at; a background loop
retries oldest-first every ``retry_delay`` seconds; the channel pauses
while the store is non-empty.

Spark design: the retry table IS the buffer — no global pause needed
(SURVEY §2.H row 63). A retry row is the full message plus ``(stage,
retry_at, attempts)``. ``retry_due`` reads rows whose ``retry_at`` has
passed; the caller re-runs ``Pipeline.run(df, from_stage=stage)`` and
acks success. Appends only (Delta-ready); acks are tombstone events, so
nothing rewrites at scale.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..message import MESSAGE_COLUMNS, WAIT_RETRY, ensure_message_columns

__all__ = ["RetryStore"]

_ACK_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("ack_ts", T.DoubleType()),
    ]
)


class RetryStore:
    def __init__(self, spark: SparkSession, base_path: str,
                 channel: str = "default", retry_delay: float = 60.0):
        self.spark = spark
        self.base_path = base_path
        self.channel = channel
        self.retry_delay = retry_delay
        self.msg_path = os.path.join(base_path, "retry_messages")
        self.ack_path = os.path.join(base_path, "retry_acks")

    def store_until_retry(self, df: DataFrame, stage: str | None = None) -> None:
        """Park rows for retry at ``stage`` (``retry.py:58-86``). Rows
        carrying a ``retry_stage`` column (set by ``auto_retry`` nodes,
        ``nodes.py:194-204``) re-enter at that per-row stage; ``stage``
        is the fallback (None = restart from the first stage)."""
        stage_col = F.lit(stage).cast("string")
        if "retry_stage" in df.columns:
            stage_col = F.coalesce(F.col("retry_stage"), stage_col)
        out = (
            ensure_message_columns(df, channel=self.channel)
            .withColumn("__stage", stage_col)
            .select(*MESSAGE_COLUMNS, "__stage")
            .withColumn("state", F.lit(WAIT_RETRY))
            .withColumn("stage", F.col("__stage"))
            .drop("__stage")
            .withColumn("retry_at", F.lit(time.time() + self.retry_delay))
            .withColumn("attempts", F.lit(1))
        )
        out.write.mode("append").parquet(self.msg_path)

    def _acks(self) -> DataFrame:
        if not os.path.isdir(self.ack_path):
            return self.spark.createDataFrame([], _ACK_SCHEMA)
        return self.spark.read.schema(_ACK_SCHEMA).parquet(self.ack_path)

    def pending(self) -> DataFrame:
        """All parked, un-acked rows, oldest first (``retry.py:96-120``)."""
        if not os.path.isdir(self.msg_path):
            from ..message import MESSAGE_SCHEMA

            schema = T.StructType(
                MESSAGE_SCHEMA.fields
                + [
                    T.StructField("stage", T.StringType()),
                    T.StructField("retry_at", T.DoubleType()),
                    T.StructField("attempts", T.IntegerType()),
                ]
            )
            return self.spark.createDataFrame([], schema)
        # no broadcast hint: acks grow with parked volume between
        # compactions; AQE broadcasts the anti-join side while small
        parked = self.spark.read.parquet(self.msg_path)
        return parked.join(self._acks(), "id", "left_anti").orderBy("id")

    def retry_due(self, now: float | None = None) -> DataFrame:
        """Rows whose backoff has elapsed (``retry.py:225-240``)."""
        now = time.time() if now is None else now
        return self.pending().filter(F.col("retry_at") <= now)

    def ack(self, df: DataFrame) -> None:
        """Mark rows as successfully retried (``retry.py:150-160`` delete)."""
        df.select("id").withColumn("ack_ts", F.lit(time.time())).write.mode(
            "append"
        ).parquet(self.ack_path)

    def is_empty(self) -> bool:
        return self.pending().isEmpty()

    def retry_once(self, pipeline, now: float | None = None) -> dict[str, int]:
        """One retry sweep (the reference's background loop body,
        ``retry.py:130-170``): group due rows by re-entry stage, run the
        pipeline from that stage, ack successes, re-park failures with
        doubled backoff."""
        due = self.retry_due(now)
        stages = [r["stage"] for r in due.select("stage").distinct().collect()]
        counts = {"retried": 0, "succeeded": 0}
        for stage in stages:
            batch = due.filter(
                F.col("stage").eqNullSafe(F.lit(stage))
            ).select(*MESSAGE_COLUMNS).withColumn("state", F.lit(None).cast("string"))
            res = pipeline.run(batch, from_stage=stage)
            ok = res.df.unionByName(res.dropped, allowMissingColumns=True)
            self.ack(ok.select("id"))
            counts["retried"] += batch.count()
            counts["succeeded"] += ok.count()
        return counts
