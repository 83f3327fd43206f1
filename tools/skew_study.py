#!/usr/bin/env python
"""Measured skew-join study: one hot key vs the three mitigations.

A sort-merge join hashes rows to tasks BY KEY, so a key holding half
the fact table lands on ONE task — the stage runs as long as that
straggler regardless of cluster size. This measures, on synthetic
hot-key data, the wall-clock of:

* ``plain``       — SMJ, AQE skew splitting disabled (the failure mode);
* ``aqe_skew``    — AQE's adaptive skew-join splitter
  (`spark.sql.adaptive.skewJoin`), which splits oversized partitions
  at runtime;
* ``salted``      — explicit `functions.joins.salted_join` (fact side
  salted N ways, dim side exploded N×) — the belt-and-braces form that
  also works when one key exceeds a task's MEMORY, which AQE splitting
  cannot fix for a single key on the build side.

Broadcast is disabled throughout (at 100 TB the dim side of the worst
joins does not broadcast). Each case runs the identical
join + aggregate; results are printed as JSON lines and summarized in
SKEW.md.

Usage: python tools/skew_study.py [n_fact_millions] [hot_fraction]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pypeman_spark.functions.joins import salted_join  # noqa: E402
from pypeman_spark.session import get_spark  # noqa: E402

N_FACT = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 4_000_000
HOT_FRACTION = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
N_KEYS = 100_000
N_SALT = 16


def build_frames(spark):
    # hot key 0 gets HOT_FRACTION of all fact rows; the rest uniform
    n_hot = int(N_FACT * HOT_FRACTION)
    fact = spark.range(N_FACT).select(
        F.when(F.col("id") < n_hot, F.lit(0))
        .otherwise(F.pmod(F.hash("id"), F.lit(N_KEYS)))
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("x"),
        F.col("id"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") % 13).cast("double").alias("w")
    )
    return fact, dim


def run_case(spark, name, fact, dim, salted, aqe_skew):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe_skew).lower())
    # keep AQE's partition coalescing on in all cases (it is orthogonal)
    t0 = time.time()
    if salted:
        joined = salted_join(
            fact, dim, "k", n_salt=N_SALT,
            fact_salt=F.pmod(F.col("id"), F.lit(N_SALT)),
        )
    else:
        joined = fact.join(dim, "k")
    total = joined.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("x") * F.col("w")).alias("s")
    ).collect()[0]
    dt = time.time() - t0
    print(json.dumps({
        "case": name, "wall_s": round(dt, 2),
        "rows_joined": total["n"], "checksum": round(total["s"], 2),
        "n_fact": N_FACT, "hot_fraction": HOT_FRACTION,
        "n_keys": N_KEYS, "n_salt": N_SALT if salted else None,
        "aqe_skew_join": aqe_skew,
    }))
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
    return total["n"], round(total["s"], 2)


def main() -> int:
    spark = get_spark(
        "skew_study", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    fact, dim = build_frames(spark)
    fact.count()  # materialize range gen cost out of the timings
    # untimed warm-up (codegen, shuffle machinery)
    run_case(spark, "warmup", fact.limit(100_000), dim, False, False)
    results = [
        run_case(spark, "plain", fact, dim, salted=False, aqe_skew=False),
        run_case(spark, "aqe_skew", fact, dim, salted=False, aqe_skew=True),
        run_case(spark, "salted", fact, dim, salted=True, aqe_skew=False),
    ]
    # all three must produce the identical join result
    assert len({r for r in results}) == 1, f"result mismatch: {results}"
    return 0


if __name__ == "__main__":
    sys.exit(main())
