"""Custom stateful streaming operators (SURVEY §1.4, §2.H).

Pypeman nodes keep cross-run state via ``BaseNode.save_data/restore_data``
(``nodes.py:283-303``). For in-flight streaming state the Spark-native
primitive is ``applyInPandasWithState`` — per-key state in the state
store, checkpoint-backed, with timeout-based eviction.

Provided operators:

* :func:`running_counter` — per-key message counter + last-seen payload
  (the reference's counter/dedup-window node shape).
* :func:`watermarked_window_counts` — event-time tumbling window with
  late-data handling via watermark (pypeman has no event-time semantics
  at all — SURVEY §2 'not present'; this is the Spark-first upgrade).

Scale: state is partitioned by key across the cluster; the watermark
bounds state size (old windows evicted), so the operator runs
indefinitely on unbounded streams.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = [
    "running_counter",
    "watermarked_window_counts",
    "session_window_counts",
    "stream_dedup",
]

_COUNTER_OUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("count", T.LongType()),
        T.StructField("last_payload", T.StringType()),
    ]
)
_COUNTER_STATE = T.StructType(
    [T.StructField("count", T.LongType()), T.StructField("last", T.StringType())]
)


def running_counter(
    df: DataFrame, key_col: str = "channel", payload_col: str = "payload"
) -> DataFrame:
    """Per-key running message count across micro-batches.

    Works on a streaming DataFrame (state store) and, for tests, on any
    grouped batch via the same code path semantics.
    """
    import pandas as pd

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        count, last = state.get if state.exists else (0, None)
        for pdf in pdfs:
            count += len(pdf)
            if len(pdf):
                last = pdf[payload_col].iloc[-1]
        state.update((count, last))
        yield pd.DataFrame({"key": [key[0]], "count": [count], "last_payload": [last]})

    return (
        df.groupBy(F.col(key_col))
        .applyInPandasWithState(
            update,
            outputStructType=_COUNTER_OUT,
            stateStructType=_COUNTER_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def session_window_counts(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "timestamp",
    gap: str = "5 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Per-key session windows via the native ``session_window``
    aggregation: a session extends while consecutive events arrive
    within ``gap``; the window closes ``gap`` after the last event.
    Works identically on batch frames (one-shot gaps-and-islands) and
    streams (state-store sessions, evicted once the watermark passes
    the session end — pass ``watermark`` on unbounded streams so state
    stays bounded).

    Returns ``(key, session_start, session_end, n)`` with real
    TimestampType bounds.
    """
    src = df.withWatermark(ts_col, watermark) if watermark else df
    return (
        src.groupBy(
            F.col(key_col), F.session_window(F.col(ts_col), gap).alias("win")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col(key_col),
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            F.col("n"),
        )
    )


def stream_dedup(
    df: DataFrame, keys: list[str], ts_col: str | None = None,
    within: str | None = None,
) -> DataFrame:
    """Streaming exact dedup on ``keys``.

    ``within=None`` keeps every seen key in the state store — exact
    forever, state grows with distinct keys (fine for bounded key
    domains or ``availableNow`` backfills). Passing ``within`` (e.g.
    ``"24 hours"``) switches to ``dropDuplicatesWithinWatermark``: a
    watermark on ``ts_col`` bounds state by evicting keys older than
    the delay — the 100 TB / unbounded-stream path, trading "duplicates
    farther apart than the delay re-emit" for bounded memory.
    """
    if within is not None and df.isStreaming:
        if ts_col is None:
            raise ValueError("within= requires ts_col for the watermark")
        return df.withWatermark(ts_col, within).dropDuplicatesWithinWatermark(keys)
    # batch frames: dropDuplicatesWithinWatermark is streaming-only, and
    # a bounded frame needs no state bound — plain dedup IS the semantics
    return df.dropDuplicates(keys)


def watermarked_window_counts(
    df: DataFrame,
    ts_col: str = "timestamp",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time tumbling window counts with late-data tolerance."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            F.col("n"),
        )
    )
