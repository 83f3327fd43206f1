"""Test harness for user pipelines — PypeTestCase parity.

Reference: ``pypeman/test.py:23-110`` + node mock/introspection hooks
(``nodes.py:244-343``): ``mock(input=, output=)``, ``last_input()``,
``processed`` counters, ``handle_and_wait``.

Spark translation: stages are named functions, so mocking is swapping a
stage in the stage list; counters come from the ``Observation`` API
(no extra actions); ``handle_and_wait`` lives on Pipeline itself.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable

from pyspark.sql import DataFrame, Observation, functions as F

from .message import DROPPED, ERROR, PROCESSED, REJECTED
from .pipeline import Pipeline

__all__ = ["mock_stage", "spy_stage", "observe_outcomes", "StageSpy"]


@contextlib.contextmanager
def mock_stage(pipeline: Pipeline, stage_name: str,
               replacement: Callable[[DataFrame], DataFrame] | None = None,
               output_payload: Any = None):
    """Temporarily replace a named stage (``BaseNode.mock``,
    ``nodes.py:244-280``). With ``output_payload``, the stage becomes a
    constant-payload stub; with ``replacement=None``, a pass-through."""
    import json

    names = [n for n, _ in pipeline.stages]
    if stage_name not in names:
        raise KeyError(f"unknown stage {stage_name!r}; have {names}")
    idx = names.index(stage_name)
    original = pipeline.stages[idx]

    if output_payload is not None:
        payload = (
            output_payload
            if isinstance(output_payload, str)
            else json.dumps(output_payload)
        )

        def replacement(df: DataFrame, _p=payload) -> DataFrame:  # noqa: F811
            from .operators.base import active_cond

            return df.withColumn(
                "payload",
                F.when(active_cond(), F.lit(_p)).otherwise(F.col("payload")),
            )

    elif replacement is None:
        def replacement(df: DataFrame) -> DataFrame:  # noqa: F811
            return df

    pipeline.stages[idx] = (stage_name, replacement)
    try:
        yield pipeline
    finally:
        pipeline.stages[idx] = original


class StageSpy:
    """Counts rows entering a stage and keeps the last input batch's
    payloads (``last_input``/``processed``, ``nodes.py:300-343``).

    Uses ``Observation`` — metrics ride along with the existing action,
    no extra job."""

    def __init__(self) -> None:
        self._observations: list[Observation] = []
        self.last_input_payloads: list[str] | None = None

    @property
    def processed(self) -> int:
        total = 0
        for obs in self._observations:
            try:
                total += obs.get["n"]
            except Exception:
                pass
        return total

    def stage(self, df: DataFrame) -> DataFrame:
        obs = Observation()
        self._observations.append(obs)
        return df.observe(obs, F.count(F.lit(1)).alias("n"))


@contextlib.contextmanager
def spy_stage(pipeline: Pipeline, before_stage: str):
    """Insert a row-counting spy before the named stage."""
    names = [n for n, _ in pipeline.stages]
    idx = names.index(before_stage)
    spy = StageSpy()
    pipeline.stages.insert(idx, (f"__spy_{before_stage}", spy.stage))
    try:
        yield spy
    finally:
        pipeline.stages.pop(idx)


def observe_outcomes(result_all: DataFrame) -> dict[str, int]:
    """Outcome counts from a PipelineResult.all frame in one action."""
    rows = result_all.groupBy("state").count().collect()
    counts = {r["state"]: r["count"] for r in rows}
    for s in (PROCESSED, DROPPED, REJECTED, ERROR):
        counts.setdefault(s, 0)
    return counts
