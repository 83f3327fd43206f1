"""SparkSession factory tuned for the engine.

Local defaults target the test harness (``local[$SPARK_GRAFT_CPUS]``);
on a real cluster callers pass their own master/conf. Every knob here is
scale-motivated:

* AQE on — runtime coalescing + skew-join handling replaces hand-tuned
  shuffle partitioning at 100 TB.
* ``spark.sql.shuffle.partitions`` ~ cores locally; AQE re-coalesces, so
  on a cluster a high initial value (e.g. 2000) is safe.
* Arrow on — every pandas UDF path (HL7/XML parsing, minhash, ANN) is
  Arrow-batched, never row-at-a-time.
* UTC session timezone — parquet timestamps compare identically across
  engines (the duckdb oracle is UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark"]


def get_spark(
    app_name: str = "pypeman_spark",
    master: str | None = None,
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # ctx snapshots overwrite same-named keys (Message.add_context semantics)
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # testdata parquet carries TIMESTAMP(NANOS); read as long, the
        # table loader converts back to TimestampType (sources/tables.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # parquet TIMESTAMP(MICROS/MILLIS, isAdjustedToUTC=false) must
        # surface as TimestampType, not TIMESTAMP_NTZ: event-time ops
        # (withWatermark, unix_micros, epoch casts) reject NTZ, and under
        # the pinned UTC session the two types denote the same instant.
        # Done at scan level (vs a cast in the plan) so pushdown/stats
        # on the timestamp column are untouched.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
