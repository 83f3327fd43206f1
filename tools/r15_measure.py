#!/usr/bin/env python
"""Per-query fn()/action split measurement for the r15 optimization round.

For each query: time fn() construction (includes any eager build jobs)
and the noop action separately, twice (warm number is the signal).

Usage: python tools/r15_measure.py [query ...]   (default: bench HEADLINE)
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import pypeman_spark.plans.scale_queries  # noqa: F401
    from pypeman_spark.plans.queries import REGISTRY
    from pypeman_spark.session import get_spark
    from bench import HEADLINE

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    names = sys.argv[1:] or HEADLINE
    spark = get_spark("r15_measure", cpus=cpus)
    from pypeman_spark.sources.tables import load_table

    load_table(spark, sf_dir, "lineitem").count()
    try:
        REGISTRY[names[0]].fn(spark, sf_dir).write.mode("overwrite").format(
            "noop").save()
    except Exception:
        pass
    out = {}
    for name in names:
        spec = REGISTRY[name]
        rec = {}
        for run in ("cold", "warm"):
            try:
                t0 = time.time()
                df = spec.fn(spark, sf_dir)
                t1 = time.time()
                df.write.mode("overwrite").format("noop").save()
                t2 = time.time()
                rec[run] = {"fn_s": round(t1 - t0, 3),
                            "act_s": round(t2 - t1, 3),
                            "tot_s": round(t2 - t0, 3)}
            except Exception as exc:  # noqa: BLE001
                rec[run] = {"err": f"{type(exc).__name__}: {exc}"[:200]}
        out[name] = rec
        w = rec.get("warm", {})
        print(f"{name:34s} warm fn={w.get('fn_s')} act={w.get('act_s')} "
              f"tot={w.get('tot_s')}", flush=True)
    with open("/tmp/r15_measure.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
