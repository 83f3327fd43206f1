"""Grouped percentile helper (SURVEY §2 analytics; VERDICT r01 item 7).

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

__all__ = ["grouped_percentiles"]


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
