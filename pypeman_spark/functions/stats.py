"""Grouped percentile + cardinality-sketch helpers (SURVEY §2 analytics).

``exact=True`` uses ``percentile`` — linearly-interpolated and
oracle-exact, but a sort-based aggregate that buffers every value of a
group in executor memory: fine at test SF, memory-heavy at 100 TB.
``exact=False`` is the scale path: ``percentile_approx`` (a GK sketch,
bounded memory per group, mergeable map-side partials) with tunable
``accuracy`` — error ≤ 1/accuracy of the rank.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "grouped_percentiles",
    "cardinality_sketch",
    "merge_cardinality_sketches",
    "grouped_distinct_estimate",
    "heavy_hitters",
    "funnel",
    "cohort_retention",
]


def grouped_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    percentiles: Sequence[float] = (0.5, 0.9),
    exact: bool = True,
    accuracy: int = 10000,
    round_to: int | None = 6,
) -> DataFrame:
    """One-shuffle grouped percentiles; columns named ``p50``-style.

    All requested fractions compute in a single aggregation pass (one
    shuffle on ``group_cols``), never one agg per fraction.
    """
    aggs = []
    for p in percentiles:
        name = f"p{round(p * 100):g}"
        if exact:
            col = F.expr(f"percentile({value_col}, {p!r})")
        else:
            col = F.percentile_approx(value_col, p, accuracy).cast("double")
        if round_to is not None:
            col = F.round(col, round_to)
        aggs.append(col.alias(name))
    return df.groupBy(*group_cols).agg(*aggs)


def cardinality_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lg_k: int = 12,
    sketch_col: str = "distinct_sketch",
) -> DataFrame:
    """Per-group HyperLogLog sketches (Apache DataSketches HLL, built
    into Spark SQL) of ``COUNT(DISTINCT value_col)``.

    The 100 TB story is MERGEABILITY, not just bounded memory: exact
    count-distinct needs a full shuffle of every distinct value; a
    sketch is a fixed ``~2^lg_k``-byte binary that aggregates with
    map-side partials, persists next to each partition/day, and rolls
    up later with :func:`merge_cardinality_sketches` WITHOUT re-reading
    the data — incremental distinct-users-per-anything at any scale.
    Standard error ≈ 1.04/√2^lg_k (~1.6% at the default lg_k=12)."""
    return df.groupBy(*group_cols).agg(
        F.expr(f"hll_sketch_agg({value_col}, {lg_k})").alias(sketch_col)
    )


def merge_cardinality_sketches(
    df: DataFrame,
    group_cols: Sequence[str],
    sketch_col: str = "distinct_sketch",
) -> DataFrame:
    """Roll previously-built sketches up to a coarser grouping (e.g.
    day → month, shard → corpus) via ``hll_union_agg`` — a pure
    sketch-merge, no raw data touched. Empty ``group_cols`` gives the
    single global rollup."""
    grouped = df.groupBy(*group_cols) if group_cols else df.groupBy()
    return grouped.agg(
        F.expr(f"hll_union_agg({sketch_col})").alias(sketch_col)
    )


def grouped_distinct_estimate(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lg_k: int = 12,
    out_col: str = "n_distinct_est",
) -> DataFrame:
    """Per-group approximate distinct counts: sketch + estimate in one
    aggregation (one shuffle of fixed-size sketch partials)."""
    sk = cardinality_sketch(df, group_cols, value_col, lg_k=lg_k)
    return sk.select(
        *group_cols,
        F.expr("hll_sketch_estimate(distinct_sketch)").alias(out_col),
    )


def heavy_hitters(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 10,
    max_items_tracked: int = 10000,
) -> DataFrame:
    """Per-group approximate top-``k`` most frequent values via
    ``approx_top_k`` (one aggregation pass, mergeable partials).

    The exact formulation — groupBy(value) → count → window top-k —
    shuffles EVERY distinct value; on a 100 TB token/n-gram census the
    shuffle is the corpus. The sketch tracks ``max_items_tracked``
    candidates per partial, merges map-side, and ships one bounded
    struct per group. Exact when a group's distinct-value count stays
    under ``max_items_tracked`` (the usual case for per-domain token
    stats); approximate with frequency error bounded by the sketch
    capacity otherwise. Output: group cols + ``topk`` =
    ``array<struct<item, count>>`` ordered most-frequent first."""
    return df.groupBy(*group_cols).agg(
        F.expr(
            f"approx_top_k({value_col}, {k}, {max_items_tracked})"
        ).alias("topk")
    )


def funnel(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    stage_col: str,
    stages: Sequence[str],
    max_events_per_key: int | None = None,
) -> DataFrame:
    """Ordered funnel analysis: per key, the earliest strictly-ordered
    completion chain through ``stages`` — ``stage_ts`` holds the
    timestamp at which each stage was first reached AFTER the previous
    one, and ``n_completed`` counts how deep the key got. Keys that
    never reach stage 1 are excluded (standard funnel convention).

    One shuffle (the per-key groupBy); the chain extraction is a single
    ``aggregate`` fold over the key's time-sorted events — greedy
    earliest-first matching, which provably finds the minimal chain
    (exchange argument), so the result equals the relational
    min/join-chain formulation the oracle uses without k self-joins
    over the full event log.

    ``max_events_per_key`` bounds executor memory against pathological
    hot keys (a bot emitting millions of funnel-stage events): only
    each key's earliest N stage events (ts, then stage for tie
    stability) enter the fold. Greedy earliest-first matching only ever
    consumes the earliest qualifying event per stage, so for any key
    with ≤ N stage events the capped result is IDENTICAL to the
    uncapped one (property-tested); a key over the cap can at worst
    undercount depth, never invent it. The cap is a row_number window
    on the same key — Spark reuses the one hash partitioning for the
    window and the groupBy, so the exchange budget stays at one."""
    from pyspark.sql import Window

    k = len(stages)
    if k == 0:
        raise ValueError("stages must be non-empty")
    stage_arr = F.array(*[F.lit(s) for s in stages])
    ev = df.filter(F.col(stage_col).isin(list(stages)))
    if max_events_per_key is not None:
        if max_events_per_key < 1:
            raise ValueError(
                f"max_events_per_key must be >= 1, got {max_events_per_key}"
            )
        wcap = Window.partitionBy(key_col).orderBy(
            F.col(ts_col).asc(), F.col(stage_col).asc()
        )
        ev = (
            ev.withColumn("__rn", F.row_number().over(wcap))
            .filter(F.col("__rn") <= max_events_per_key)
            .drop("__rn")
        )
    per_key = ev.groupBy(key_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(ts_col).alias("ts"),
                                    F.col(stage_col).alias("stage")))
        ).alias("__evs")
    )
    done = F.aggregate(
        F.col("__evs"),
        F.expr("CAST(array() AS array<timestamp>)"),
        lambda acc, x: F.when(
            (F.size(acc) < k)
            & (x["stage"] == F.element_at(stage_arr, F.size(acc) + 1))
            & (
                # F.get (not element_at) returns null out-of-bounds, so
                # the empty-acc branch never throws under ANSI; the OR
                # then resolves true|null -> true
                (F.size(acc) == 0)
                | (x["ts"] > F.get(acc, F.size(acc) - 1))
            ),
            F.concat(acc, F.array(x["ts"])),
        ).otherwise(acc),
    )
    out = per_key.withColumn("__done", done).drop("__evs")
    cols = [
        # F.get: null (not an ANSI error) when the chain stopped early
        F.get(F.col("__done"), i).alias(f"stage{i + 1}_ts")
        for i in range(k)
    ]
    return (
        out.select(
            key_col, F.size("__done").alias("n_completed"), *cols
        )
        .filter(F.col("n_completed") >= 1)
    )


def cohort_retention(
    df: DataFrame,
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly cohort-retention triangle: users grouped by the week of
    their FIRST event, counted once per subsequent week they were
    active. Returns ``(cohort_week DATE, week_offset INT, n_users)``.

    Shuffle shape at 100 TB: one groupBy on the key for first-seen,
    one distinct over (key, week) — both key-partitioned so the join
    between them co-locates on the same hash partitioning — then a
    final aggregation over the tiny (cohort, offset) domain. The event
    log never joins anything wider than its own per-key aggregates."""
    first = df.groupBy(key_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("__cw")
    )
    active = df.select(
        key_col, F.date_trunc("week", F.col(ts_col)).alias("__w")
    ).distinct()
    joined = active.join(first, key_col)
    # DST-immune offset: date_trunc('week') is session-timezone-local,
    # so a week span crossing spring-forward is 601200 s and a
    # seconds/604800 truncation would yield k-1. datediff over DATEs
    # counts calendar days regardless of the zone's UTC offsets.
    offset = F.floor(
        F.datediff(F.col("__w").cast("date"), F.col("__cw").cast("date"))
        / 7
    ).cast("int")
    return (
        joined.groupBy(
            F.col("__cw").cast("date").alias("cohort_week"),
            offset.alias("week_offset"),
        )
        .agg(F.count_distinct(key_col).alias("n_users"))
    )
