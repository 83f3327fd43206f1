"""Time-series resampling: regular grids, gap filling, forward fill.

Event streams are irregular; models and dashboards want regular grids.
The relational formulation (no UDFs, no driver loops):

* bucket each event to its grid cell (`date_trunc`-style arithmetic);
* build the COMPLETE per-key grid with ``sequence()`` + ``explode`` —
  the grid is generated from each key's own [min, max] bounds, so no
  driver-side date arithmetic and no global materialized calendar;
* left-join observed buckets onto the grid (empty cells → null);
* forward-fill with ``last(value, ignorenulls=True)`` over an
  unbounded-preceding window — the classic gaps-and-islands fill.

Scale shape: one shuffle on the key for the window; the grid explode
is a narrow map (each key's grid rows are generated where the key's
aggregate row lives). Grid size is bounded by (span / step) per key —
callers control step; a key spanning years at 1-second steps is a
caller bug, not an engine surprise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["resample", "forward_fill", "rolling_zscore"]


def resample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int = 3600,
    agg: str = "sum",
    fill: str | None = "ffill",
) -> DataFrame:
    """Aggregate ``value_col`` onto a regular ``step_seconds`` grid per
    key, emitting EVERY grid cell between each key's first and last
    event. ``agg`` ∈ sum/avg/min/max/count. Empty cells carry null
    unless ``fill='ffill'`` (forward-fill from the last observed cell)
    or ``fill='zero'``.

    Returns ``(key, bucket_start TIMESTAMP, value, n_events)`` —
    ``n_events`` stays 0 for generated cells so consumers can tell
    observed zeros from filled gaps."""
    if agg not in ("sum", "avg", "min", "max", "count"):
        raise ValueError(f"unsupported agg {agg!r}")
    if step_seconds <= 0:
        raise ValueError(f"step_seconds must be positive, got {step_seconds}")
    step = F.lit(step_seconds).cast("long")
    # floor, not cast("long"): the cast truncates toward zero, which
    # would land pre-1970 (negative-epoch) timestamps one bucket late;
    # floor division matches date_trunc and the floor(epoch) oracle
    bucket = F.floor(F.unix_timestamp(F.col(ts_col)) / step).cast("long") * step
    agg_col = (
        F.count(F.lit(1)) if agg == "count"
        else getattr(F, agg)(F.col(value_col))
    )
    observed = (
        df.withColumn("__b", bucket)
        .groupBy(F.col(key_col), F.col("__b"))
        .agg(
            agg_col.alias("value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    # per-key grid from that key's own bounds; sequence+explode stays
    # where the key's aggregate row lives (no cross join, no driver)
    bounds = observed.groupBy(key_col).agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), step)
        ).alias("__b"),
    )
    full = grid.join(observed, [key_col, "__b"], "left").select(
        key_col,
        F.col("__b"),
        F.col("value"),
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
    )
    if fill == "ffill":
        full = forward_fill(full, key_col, "__b", "value")
    elif fill == "zero":
        full = full.withColumn("value", F.coalesce(F.col("value"), F.lit(0.0)))
    elif fill is not None:
        raise ValueError(f"unsupported fill {fill!r}")
    return full.select(
        key_col,
        F.timestamp_seconds(F.col("__b")).alias("bucket_start"),
        "value",
        "n_events",
    )


def forward_fill(
    df: DataFrame, key_col: str, order_col: str, value_col: str
) -> DataFrame:
    """Replace nulls in ``value_col`` with the last non-null value at or
    before this row in ``order_col`` order, per key. Leading nulls (no
    prior observation) stay null. One window, one shuffle on the key."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(
        value_col, F.last(F.col(value_col), ignorenulls=True).over(w)
    )


def rolling_zscore(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    window_rows: int = 12,
    min_periods: int = 2,
    threshold: float = 3.0,
    round_to: int | None = 6,
) -> DataFrame:
    """Trailing-window anomaly scores per key: for each row, the mean
    and sample stddev of the PRECEDING ``window_rows`` values (current
    row excluded — scoring a point against a history that includes it
    dampens exactly the spikes being hunted), the z-score, and an
    ``is_anomaly`` flag at ``|z| > threshold``.

    Null discipline: rows with fewer than ``min_periods`` history
    points or zero variance get null stats/z (not NaN — Spark's
    ``stddev_samp`` of a single value is NaN while other engines say
    NULL, so the count guard also keeps results engine-portable).

    One window over one shuffle on the key — the standard
    quality-monitoring pass over a resampled series; chain after
    :func:`resample` so gaps are filled and the row cadence is the
    grid, not the raw event arrival."""
    if window_rows < 1:
        raise ValueError(f"window_rows must be >= 1, got {window_rows}")
    if min_periods < 2:
        raise ValueError(f"min_periods must be >= 2, got {min_periods}")
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(-window_rows, -1)
    )
    v = F.col(value_col)
    cnt = F.count(v).over(w)
    mean = F.avg(v).over(w)
    std = F.stddev_samp(v).over(w)
    ok = (cnt >= min_periods) & std.isNotNull() & (std > 0)
    z = F.when(ok, (v - mean) / std)
    mean_out = F.when(cnt >= min_periods, mean)
    std_out = F.when(cnt >= min_periods, std)
    if round_to is not None:
        z = F.round(z, round_to)
        mean_out = F.round(mean_out, round_to)
        std_out = F.round(std_out, round_to)
    return (
        df.withColumn("roll_mean", mean_out)
        .withColumn("roll_std", std_out)
        .withColumn("zscore", z)
        .withColumn(
            "is_anomaly",
            F.when(z.isNotNull(), F.abs(z) > threshold),
        )
    )
