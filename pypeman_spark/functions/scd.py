"""Slowly-changing-dimension (SCD type 2) versioning, set-based.

The warehouse-side counterpart of the engine's event-log thinking: a
dimension row's history is kept as versioned rows
``(key, attrs..., valid_from, valid_to, is_current)`` where the open
version has ``valid_to IS NULL``. Applying a batch of timestamped
updates is usually written as a per-row MERGE loop; the set-based
formulation here is two windows over one shuffle on the key:

* union the dimension's OPEN versions with the update batch (closed
  history passes through untouched — at 100 TB the closed majority is
  never rewritten);
* drop no-op updates (attributes equal to the chronologically
  previous version) with one ``lag`` comparison;
* re-chain: ``valid_to = lead(valid_from)`` per key, open tail =
  current.

Deterministic under ties: equal-timestamp updates order by the
attribute tuple, so re-runs produce byte-identical history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["scd2_apply"]


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str = "valid_from",
    validate: bool = False,
) -> DataFrame:
    """Apply ``updates`` (``key_cols + attr_cols + ts_col``) to an SCD2
    dimension ``dim`` (``key_cols + attr_cols + valid_from, valid_to,
    is_current``); returns the full new history.

    Brand-new keys start their history at their first update; closed
    versions are passed through untouched; an update identical to the
    version in force at its timestamp is dropped as a no-op.

    Precondition: updates must postdate the key's CLOSED history
    (``ts >= max(closed.valid_to)`` per key). Only open versions are
    re-chained, so an update timestamped inside an already-closed
    interval would order before the open version while the closed rows
    pass through untouched, yielding overlapping validity ranges. Pass
    ``validate=True`` to enforce this and raise on the first violation
    (costs one extra aggregation over the closed slice + a join
    against the per-key bounds)."""
    keys = list(key_cols)
    attrs = list(attr_cols)
    closed = dim.filter(F.col("valid_to").isNotNull()).select(
        *keys, *attrs, "valid_from", "valid_to"
    )
    open_now = dim.filter(F.col("valid_to").isNull()).select(
        *keys, *attrs, "valid_from"
    )
    incoming = updates.select(
        *keys, *attrs, F.col(ts_col).alias("valid_from")
    )
    if validate:
        bounds = closed.groupBy(*keys).agg(
            F.max("valid_to").alias("__max_closed")
        )
        # no broadcast hint: bounds is per-key and can be
        # dimension-sized; AQE picks broadcast when it actually fits
        stale = (
            incoming.join(bounds, keys, "inner")
            .filter(F.col("valid_from") < F.col("__max_closed"))
            .count()
        )
        if stale:
            raise ValueError(
                f"scd2_apply: {stale} update(s) are timestamped inside "
                "already-closed history (ts < max(closed.valid_to) for "
                "their key); applying them would create overlapping "
                "validity ranges"
            )
    cand = open_now.unionByName(incoming)
    order = [F.col("valid_from").asc()] + [F.col(a).asc() for a in attrs]
    w = Window.partitionBy(*keys).orderBy(*order)
    # no-op suppression: same attrs as the chronologically previous
    # candidate version -> drop. eqNullSafe, not !=: with any NULL
    # attribute the plain inequality is NULL and the filter would
    # silently drop a genuine NULL<->value change.
    attr_tuple = F.struct(*[F.col(a) for a in attrs])
    chained = (
        cand.withColumn("__prev", F.lag(attr_tuple).over(w))
        .filter(
            F.col("__prev").isNull()
            | ~F.col("__prev").eqNullSafe(attr_tuple)
        )
        .drop("__prev")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    versioned = chained.withColumn(
        "valid_to", F.lead("valid_from").over(w2)
    )
    out = versioned.unionByName(closed).withColumn(
        "is_current", F.col("valid_to").isNull()
    )
    return out.select(*keys, *attrs, "valid_from", "valid_to", "is_current")
