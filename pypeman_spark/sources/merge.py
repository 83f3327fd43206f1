"""MergeChannel (SURVEY §2.A row 6): N sources → one processing chain.

Reference: ``channels.py:1252-1303`` — input channels must have no nodes
of their own; they only feed the merge target.

Spark: ``unionByName(allowMissingColumns=True)`` over message
DataFrames — works identically for batch frames and streaming frames
(union of streams is native in Structured Streaming).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame

from ..message import ensure_message_columns

__all__ = ["merge_channels"]


def merge_channels(*sources: DataFrame, channel: str = "merged") -> DataFrame:
    if not sources:
        raise ValueError("merge_channels needs at least one source")
    frames = [ensure_message_columns(s, channel=channel) for s in sources]
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), frames
    )
