#!/usr/bin/env python
"""Capture the FINAL executed adaptive plan for registry entries.

AQE decides exchange reuse at runtime, so the initial
``explain("formatted")`` capture cannot show ``ReusedExchange`` nodes —
this tool executes the entry (collect at a small SF) and dumps
``queryExecution().executedPlan()`` (AdaptiveSparkPlanExec with
isFinalPlan=true), which does.

Usage: python tools/r15_final_plan.py <suffix> <query> [query ...]
Writes plans/r15/<query>_<suffix>.txt
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01 — small on
purpose: the plan SHAPE is the artifact, not the timing).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUFFIX = sys.argv[1]
NAMES = sys.argv[2:]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    import pypeman_spark.plans.scale_queries  # noqa: F401
    from pypeman_spark.plans.queries import REGISTRY
    from pypeman_spark.session import get_spark

    spark = get_spark("r15_final_plan", cpus=8)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    for name in NAMES:
        try:
            df = REGISTRY[name].fn(spark, SF_DIR)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR: {type(exc).__name__}: {exc}"
        with open(os.path.join(out_dir, f"{name}_{SUFFIX}.txt"), "w") as fh:
            fh.write(plan)
        print(name, "ok" if not plan.startswith("ERROR") else plan[:120],
              "ReusedExchange=%d" % plan.count("ReusedExchange"))


if __name__ == "__main__":
    main()
