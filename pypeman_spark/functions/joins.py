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

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["range_join", "asof_join", "salted_join"]


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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    n_salt: int = 8,
    fact_salt: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (big, skewed) ``fact`` side
    into ``n_salt`` sub-keys and explode the ``dim`` side ``n_salt``×,
    so a single hot key spreads over ``n_salt`` tasks instead of one
    straggler. Result rows are identical to the plain join.

    ``fact_salt`` defaults to a hash of the whole fact row — any
    deterministic expression works; pass e.g. ``F.pmod(F.col("id"), 8)``
    to reproduce a specific spread. AQE's skew-join splitter handles
    moderate skew adaptively; explicit salting is the belt-and-braces
    form for extreme keys (one key >> one task's memory).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if fact_salt is None:
        fact_salt = F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(n_salt))
    salted_fact = fact.withColumn("__salt", fact_salt.cast("int"))
    salted_dim = dim.withColumn(
        "__salt",
        F.explode(
            F.sequence(F.lit(0).cast("int"), F.lit(n_salt - 1).cast("int"))
        ),
    )
    return salted_fact.join(salted_dim, [*keys, "__salt"], how).drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    strict: bool = True,
    tolerance: str | None = None,
) -> DataFrame:
    """Distributed as-of join: for each left row, the latest right row
    with ``right_ts < left_ts`` (``<=`` when ``strict=False``) and the
    same ``by`` key; ``tolerance`` (an INTERVAL string, e.g.
    ``"10 minutes"``) null-outs matches farther back than the bound.

    The union-timeline formulation: tag both sides, union them into one
    event stream, and carry the last right-side payload forward with a
    running ``last(..., ignorenulls)`` window. ONE shuffle on the key —
    no range explosion, no per-key loop — which is why every large-scale
    engine compiles ASOF this way when it lacks a native operator. Ties
    on the timestamp are broken deterministically: the side order
    encodes strict/non-strict, and among right rows the highest
    ``value_cols[0]`` wins.

    Right-side payload columns come back prefixed ``asof_``.
    """
    # side-sort key: for strict '<' the left row must sort BEFORE
    # same-timestamp right rows (so they fall outside its frame); for
    # '<=' after them.
    l_side, r_side = (0, 1) if strict else (1, 0)
    lhs = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__s", F.lit(l_side)
    ).withColumn("__val", F.lit(None).cast("string")).withColumn(
        "__payload",
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols
            ) + f",__rts:timestamp>"
        ),
    )
    rhs = right.select(
        F.col(by),
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__s"),
        F.lit("r").alias("__val"),
        F.struct(
            *[F.col(c) for c in value_cols],
            F.col(right_ts).alias("__rts"),
        ).alias("__payload"),
    )
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)
    w = (
        Window.partitionBy(by)
        .orderBy("__ts", "__s", F.col("__payload").getField(value_cols[0]))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__val").isNull())
    match = F.col("__match")
    if tolerance is not None:
        match = F.when(
            F.col("__match").getField("__rts")
            >= F.col(left_ts) - F.expr(f"INTERVAL {tolerance}"),
            F.col("__match"),
        )
    for c in value_cols:
        out = out.withColumn(f"asof_{c}", match.getField(c))
    return out.drop("__ts", "__s", "__val", "__payload", "__match")
