#!/usr/bin/env python
"""Capture .explain("formatted") for headline queries into plans/r15/.

Usage: python tools/r15_explain_capture.py <suffix> [query ...]
Writes plans/r15/<query>_<suffix>.txt
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUFFIX = sys.argv[1]
ONLY = sys.argv[2:]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import pypeman_spark.plans.scale_queries  # noqa: F401
    from pypeman_spark.plans.queries import REGISTRY
    from pypeman_spark.session import get_spark
    from bench import HEADLINE

    spark = get_spark("r15_explain", cpus=8)
    names = ONLY or HEADLINE
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR: {type(exc).__name__}: {exc}"
        with open(os.path.join(out_dir, f"{name}_{SUFFIX}.txt"), "w") as fh:
            fh.write(plan)
        print(name, "ok" if not plan.startswith("ERROR") else plan[:120])


if __name__ == "__main__":
    main()
