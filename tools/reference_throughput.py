#!/usr/bin/env python
"""Head-to-head single-node throughput: reference pypeman vs pypeman_spark.

The brief's contract is "match or beat the reference's single-node
throughput at the same data scale". BASELINE.md documents that the
reference publishes no numbers, so this harness MEASURES both engines on
the identical workload and node chain:

    JsonToPython -> PythonToJson -> Encode -> B64Encode

over N synthetic messages with payload ``{"k": i}`` (engine-neutral,
deterministic). The reference runs its real asyncio BaseChannel
(``/root/reference/pypeman/channels.py`` — one message in flight per
channel, deepcopy before every node); pypeman_spark runs its real
``Pipeline.run`` (one Arrow-batched plan over a DataFrame, forced with
the noop sink so nothing is collected).

The reference import needs a ``sqlitedict`` shim (module absent in this
container): it is pulled in by ``pypeman.persistence`` for the
``save_data`` backend, which the four parser nodes under test never
touch — the measured path is unaffected.

Usage: python tools/reference_throughput.py [N_ref] [N_spark ...]
Defaults: N_ref=20000, N_spark=20000,200000. Prints one JSON line and a
markdown table fragment.
"""

from __future__ import annotations

import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_reference(n: int) -> float:
    """Messages/sec through the reference's real BaseChannel."""
    import asyncio

    sys.path.insert(0, "/root/reference")
    os.environ.setdefault(
        "PYPEMAN_SETTINGS_MODULE", "pypeman.tests.settings.test_settings_default"
    )
    if "sqlitedict" not in sys.modules:  # see module docstring
        fake = types.ModuleType("sqlitedict")

        class SqliteDict(dict):  # noqa: N801 — mirrors the real class name
            def __init__(self, *a, **k):
                super().__init__()

            def close(self):
                pass

        fake.SqliteDict = SqliteDict
        sys.modules["sqlitedict"] = fake

    from pypeman import channels, message, nodes

    loop = asyncio.new_event_loop()
    chan = channels.BaseChannel(name="bench_ref", loop=loop)
    chan.add(
        nodes.JsonToPython(), nodes.PythonToJson(),
        nodes.Encode(), nodes.B64Encode(),
    )
    loop.run_until_complete(chan.start())
    msgs = []
    for i in range(n):
        m = message.Message()
        m.payload = json.dumps({"k": i})
        m.meta = {"etype": "view"}
        msgs.append(m)
    t0 = time.time()
    for m in msgs:
        loop.run_until_complete(chan.handle(m))
    dt = time.time() - t0
    loop.run_until_complete(chan.stop())
    return n / dt


def run_spark(spark, n: int) -> float:
    """Messages/sec through pypeman_spark's real Pipeline.run (noop-forced,
    steady-state: one untimed warm-up run, then the timed run)."""
    from pyspark.sql import functions as F

    from pypeman_spark import Pipeline, ensure_message_columns
    from pypeman_spark.operators import (
        B64Encode, Encode, JsonToPython, PythonToJson,
    )

    base = spark.range(n).select(
        F.concat(F.lit('{"k": '), F.col("id"), F.lit("}")).alias("payload"),
        F.create_map(F.lit("etype"), F.lit("view")).alias("meta"),
    )
    msgs = ensure_message_columns(base, channel="bench")

    def once() -> None:
        p = Pipeline("tp").add(
            JsonToPython(), PythonToJson(), Encode(), B64Encode()
        )
        p.run(msgs).df.write.mode("overwrite").format("noop").save()

    once()  # warm-up: session/codegen init out of the timed run
    t0 = time.time()
    once()
    return n / (time.time() - t0)


def main() -> None:
    n_ref = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_spark = [int(a) for a in sys.argv[2:]] or [20_000, 200_000]

    ref_rate = run_reference(n_ref)

    from pypeman_spark.session import get_spark

    spark = get_spark("throughput", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark_rates = {n: run_spark(spark, n) for n in n_spark}

    out = {
        "chain": "JsonToPython->PythonToJson->Encode->B64Encode",
        "reference_msgs_per_sec": round(ref_rate),
        "reference_n": n_ref,
        "spark_msgs_per_sec": {str(n): round(r) for n, r in spark_rates.items()},
        "speedup_at_largest_n": round(
            spark_rates[max(spark_rates)] / ref_rate, 1
        ),
    }
    print(json.dumps(out))
    print()
    print("| engine | N | msg/s |")
    print("|---|---|---|")
    print(f"| reference pypeman (asyncio BaseChannel) | {n_ref:,} | {ref_rate:,.0f} |")
    for n, r in sorted(spark_rates.items()):
        print(f"| pypeman_spark Pipeline.run | {n:,} | {r:,.0f} |")


if __name__ == "__main__":
    main()
