#!/usr/bin/env python
"""Compare physical plan SHAPES between two scale factors.

For every headline query, compile the plan at both sf_dirs and report
the operator-shape fingerprint: counts of each join strategy, shuffle
exchanges, aggregates and sorts. AQE re-plans joins from measured
sizes, so a broadcast at sf0.1 can legitimately flip to a shuffled
join at sf1 — this tool makes every such flip an explicit, committed
observation instead of a surprise (VERDICT r5 #1).

Note: these are compile-time plans (initial AQE plans). Flips that AQE
performs mid-query from runtime statistics are visible in the timings
instead; the compile-time diff catches the static-size-estimate flips,
which are the plan-shape class the brief asks about.

Usage: python tools/plan_shape_diff.py [sf_a] [sf_b] [--json out]
Prints one JSON line per query whose shape differs, then a summary.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pypeman_spark.plans.scale_queries  # noqa: E402,F401
from bench import HEADLINE  # noqa: E402
from pypeman_spark.plans.queries import REGISTRY  # noqa: E402
from pypeman_spark.session import get_spark  # noqa: E402

_argv = list(sys.argv[1:])
JSON_OUT = None
if "--json" in _argv:
    i = _argv.index("--json")
    JSON_OUT = _argv[i + 1]
    del _argv[i:i + 2]
SF_A = _argv[0] if len(_argv) > 0 else "/root/testdata/sf0.1"
SF_B = _argv[1] if len(_argv) > 1 else "/tmp/pypeman_scale_sf1"

SHAPE_NODES = [
    "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct",
    "WindowGroupLimit", "TakeOrderedAndProject",
]

# queries that execute eagerly inside fn() (streaming drains, store
# builds, index writes): compile-time plan capture would RUN them;
# their scale behavior is covered by the timed bench instead
EAGER = {
    "route_outcomes", "worst_substate_agg", "search_text_window",
    "ivf_index_probe", "ivfpq_index_probe",
    # these three run Spark jobs inside fn() before returning the
    # frame (check()'s agg/anti-join counts, scd2's validate count,
    # connected components' localCheckpoint iterations) — capturing
    # "compile-time" shape would execute them, and the executed jobs
    # would not appear in the fingerprint anyway; their scale behavior
    # is covered by the timed bench
    "data_quality_report", "scd2_customer_segments",
    "dedup_corpus_pipelines",
}


def shape(plan: str) -> dict:
    out = {n: plan.count(n) for n in SHAPE_NODES}
    out["ShuffleExchange"] = plan.replace("BroadcastExchange", "").count(
        "Exchange"
    )
    return {k: v for k, v in out.items() if v}


def main() -> int:
    spark = get_spark(
        "plan_diff", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    )
    results = {}
    diffs = []
    for name in HEADLINE:
        if name in EAGER:
            continue
        row = {}
        for label, sf in (("a", SF_A), ("b", SF_B)):
            try:
                plan = (
                    REGISTRY[name].fn(spark, sf)
                    ._jdf.queryExecution().executedPlan().toString()
                )
                row[label] = shape(plan)
            except Exception as exc:  # noqa: BLE001
                row[label] = {"error": f"{type(exc).__name__}: {exc}"[:160]}
        results[name] = row
        if row["a"] != row["b"]:
            diffs.append(name)
            print(json.dumps({"query": name, SF_A: row["a"], SF_B: row["b"]}))
    summary = {
        "compared": len(results), "shape_diffs": len(diffs),
        "queries_with_diffs": diffs, "sf_a": SF_A, "sf_b": SF_B,
        "skipped_eager": sorted(EAGER),
    }
    print(json.dumps(summary))
    if JSON_OUT:
        with open(JSON_OUT, "w") as f:
            json.dump({"summary": summary, "shapes": results}, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
