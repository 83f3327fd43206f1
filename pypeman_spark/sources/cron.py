"""Cron / time source (SURVEY §2.A row 5).

Reference: ``contrib/time.py:8-30`` — fire one message per cron match,
payload = fire datetime.

Spark translations:

* **Streaming**: ``readStream.format("rate")`` emits ticks; filter to
  the cron schedule. Rate source is the idiomatic in-stream clock.
* **Batch**: :func:`cron_ticks` materializes the matching fire times in
  a window as a message DataFrame (what a scheduler-launched
  ``Trigger.AvailableNow`` run would process).

The cron match is a pure column predicate over the 5 standard fields —
no external cron lib.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..message import ensure_message_columns

__all__ = ["cron_match_col", "cron_ticks", "rate_stream"]


def _field_match(col: Column, spec: str) -> Column:
    """One cron field ('*', 'a', 'a-b', '*/n', 'a,b,c') as a predicate."""
    pred = F.lit(False)
    for part in spec.split(","):
        if part == "*":
            return F.lit(True)
        if part.startswith("*/"):
            step = int(part[2:])
            pred = pred | (col % step == 0)
        elif "-" in part:
            lo, hi = part.split("-")
            pred = pred | col.between(int(lo), int(hi))
        else:
            pred = pred | (col == int(part))
    return pred


def cron_match_col(ts: Column, cron: str = "* * * * *") -> Column:
    """True when ``ts`` (minute resolution) matches the cron expression
    (minute hour dom month dow; dow 0=Sunday as in the reference's
    aiocron syntax)."""
    minute, hour, dom, month, dow = cron.split()
    return (
        _field_match(F.minute(ts), minute)
        & _field_match(F.hour(ts), hour)
        & _field_match(F.dayofmonth(ts), dom)
        & _field_match(F.month(ts), month)
        & _field_match(F.dayofweek(ts) - 1, dow)  # Spark dayofweek: 1=Sunday
    )


def cron_ticks(
    spark: SparkSession,
    start: datetime,
    end: datetime,
    cron: str = "* * * * *",
    channel: str = "cron",
) -> DataFrame:
    """All cron fire times in [start, end) as messages (payload =
    ISO timestamp, mirroring payload=now at fire time)."""
    ticks = spark.sql(
        "SELECT explode(sequence(to_timestamp(:s), to_timestamp(:e), "
        "interval 1 minute)) AS fire_ts",
        args={"s": start.isoformat(sep=" "), "e": end.isoformat(sep=" ")},
    ).filter(F.col("fire_ts") < F.lit(end.isoformat(sep=" ")).cast("timestamp"))
    matched = ticks.filter(cron_match_col(F.col("fire_ts"), cron))
    df = matched.select(
        F.date_format("fire_ts", "yyyy-MM-dd HH:mm:ss").alias("payload"),
        F.col("fire_ts").alias("timestamp"),
    )
    return ensure_message_columns(df, channel=channel)


def rate_stream(spark: SparkSession, rows_per_second: int = 1,
                channel: str = "cron") -> DataFrame:
    """Streaming clock: rate source rows as messages."""
    df = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(
            F.date_format("timestamp", "yyyy-MM-dd HH:mm:ss").alias("payload"),
            F.col("timestamp"),
        )
    )
    return ensure_message_columns(df, channel=channel)
