"""Event-time helpers robust to timestamp flavor drift.

The corpus parquet has shipped event time as TIMESTAMP(NANOS) (surfaces
as long under ``nanosAsLong``), TIMESTAMP(MICROS, adjusted) (TimestampType)
and TIMESTAMP(MICROS, unadjusted) (TIMESTAMP_NTZ) across regenerations.
``F.unix_micros`` and ``cast("long")`` each reject at least one of those
flavors, so every epoch derivation on an event-time column goes through
these helpers: a leading ``cast("timestamp")`` is a no-op on TimestampType
and legalizes TIMESTAMP_NTZ (identity under the engine's pinned UTC
session timezone). Pure built-in expressions — Catalyst folds the cast,
nothing here leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["as_event_time", "epoch_us", "epoch_seconds"]


def as_event_time(col: Column | str) -> Column:
    """Normalize an event-time column to TimestampType."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp")


def epoch_us(col: Column | str) -> Column:
    """Microseconds since the epoch as BIGINT, any timestamp flavor."""
    return F.unix_micros(as_event_time(col))


def epoch_seconds(col: Column | str) -> Column:
    """Whole seconds since the epoch as BIGINT (truncating, like
    ``CAST(ts AS BIGINT)`` on TimestampType)."""
    return as_event_time(col).cast("long")
