"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` / ``oracle_sql()`` — the full registry from
``pypeman_spark.plans.queries`` (one entry per SURVEY §2 operator
concept + the LLM-pipeline ops), hash-compared against DuckDB at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import pypeman_spark.plans.coverage_queries  # noqa: F401 — registers entries
import pypeman_spark.plans.scale_queries  # noqa: F401 — registers entries
from pypeman_spark.plans.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the Q3-shape join/agg over sf0.001."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return REGISTRY["shipping_priority"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }
