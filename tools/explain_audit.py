#!/usr/bin/env python
"""Plan auditor: .explain("formatted") every registry query and check
scale hygiene — parquet filter pushdown, column pruning (ReadSchema),
broadcast joins where a side is a dim table, and shuffle counts.

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def main() -> None:
    import pypeman_spark.plans.scale_queries  # noqa: F401 — registers entries
    from pypeman_spark.plans.queries import REGISTRY
    from pypeman_spark.session import get_spark

    spark = get_spark("explain_audit", cpus=8)
    for name, spec in REGISTRY.items():
        if ONLY and name not in ONLY:
            continue
        df = spec.fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        # formatted mode prints "(N) Exchange" nodes with the
        # partitioning in an Arguments: line — count node headers
        n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
        n_bcast = len(re.findall(r"^\(\d+\) BroadcastExchange", plan, re.M))
        n_shuffle = n_exchange
        n_scan = len(re.findall(r"Scan parquet", plan))
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        pushed_nonempty = sum(1 for p in pushed if p.strip())
        read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        widest = max((len(s.split(",")) for s in read_schemas), default=0)
        print(
            f"{name:34s} scans={n_scan} shuffles={n_shuffle} "
            f"broadcasts={n_bcast} pushedFilters={pushed_nonempty}/{len(pushed)} "
            f"widestRead={widest}"
        )
        if os.environ.get("EXPLAIN_FULL"):
            print(plan)


if __name__ == "__main__":
    main()
