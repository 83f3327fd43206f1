"""Event-time helpers robust to timestamp flavor drift.

The corpus parquet has shipped event time as TIMESTAMP(NANOS),
TIMESTAMP(MICROS, adjusted) (TimestampType) and TIMESTAMP(MICROS,
unadjusted) (TIMESTAMP_NTZ) across regenerations. ``F.unix_micros``
and ``cast("long")`` each reject at least one of those flavors, so
every epoch derivation on an event-time column goes through these
helpers: a leading ``cast("timestamp")`` is a no-op on TimestampType
and legalizes TIMESTAMP_NTZ (identity under the engine's pinned UTC
session timezone). Pure built-in expressions — Catalyst folds the cast,
nothing here leaves the JVM.

Scope: these helpers accept TimestampType and TIMESTAMP_NTZ **only**.
The raw-long nanos flavor (LongType under ``nanosAsLong``) must be
converted by ``sources.tables.load_table`` first — it detects the
parquet footer's logical type and divides nanos to micros. Feeding a
LongType column here would cast long→timestamp as epoch *seconds*,
silently off by ~1e9× for nanos; ``load_table`` is the single place
that conversion is allowed to happen.
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
