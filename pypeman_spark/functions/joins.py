"""Join strategies Spark's optimizer won't pick on its own.

``range_join`` — point-in-interval joins (``p.ts BETWEEN i.lo AND i.hi``)
compile to ``BroadcastNestedLoopJoin``/cartesian in vanilla Spark because
there is no equi-key. At 100 TB that's O(N·M) — unrunnable. The classic
fix (used by every time-series engine) is *bucketing*: quantize time into
fixed buckets, explode each interval to the buckets it covers, tag each
point with its single bucket, then equi-join on the bucket and re-check
the exact range predicate. The shuffle is hash-partitioned on the bucket
key, the candidate set per point is only the intervals overlapping its
bucket, and Catalyst/AQE handle the rest (broadcast when the interval
side is small, skew-split when one bucket is hot).

Each (interval, point) pair is produced at most once because a point
belongs to exactly one bucket — no post-join dedup needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["range_join"]


def _bucket(ts: Column, bucket_seconds: int) -> Column:
    # unix_timestamp truncates to whole seconds; exactness is restored by
    # the residual range predicate on the original timestamps.
    return F.floor(F.unix_timestamp(ts) / F.lit(bucket_seconds))


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo: str,
    hi: str,
    bucket_seconds: int = 600,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point_ts < hi`` via bucket quantization (equi-join, never a
    nested-loop). ``bucket_seconds`` should be on the order of the
    typical interval length: too small explodes the interval side, too
    large widens the candidate set the residual filter prunes.

    ``broadcast_intervals=True`` hints the exploded interval side — use
    when intervals are a bounded dimension (campaign windows, maintenance
    calendars), not when they are event-scale.
    """
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                _bucket(F.col(lo), bucket_seconds),
                _bucket(F.col(hi), bucket_seconds),
            )
        ),
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    pt = points.withColumn("__bucket", _bucket(F.col(point_ts), bucket_seconds))
    cond = (
        (pt["__bucket"] == iv["__bucket"])
        & (pt[point_ts] >= iv[lo])
        & (pt[point_ts] < iv[hi])
    )
    return pt.join(iv, cond, "inner").drop("__bucket")
