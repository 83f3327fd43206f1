"""Streaming fault-injection soak (VERDICT r6 task #8).

The streaming operators were attested via clean availableNow drains;
nothing proved exactly-once under TASK RETRIES. This soak runs the
dedup → sink → incremental-rollup chain in a subprocess JVM whose
master is ``local[8,4]`` (4 task attempts — plain ``local[N]`` makes
the first failure fatal) with a mapInPandas stage that THROWS on every
task's first attempt, in both legs:

* source → stream_dedup → flaky map → parquet sink (the sink's
  file-commit protocol must discard attempt-0 output);
* sink → flaky map → ContinuousRollup foreachBatch (every job the
  merge runs re-executes the flaky stage — partials must stay
  deterministic across retries).

Final counts/sums are compared EXACTLY against the batch computation;
marker files prove the faults actually fired. A second soak re-delivers
a foreachBatch batch_id to exercise the rollup's replay guard
(restart-after-merge-before-checkpoint semantics).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SOAK = r"""
import glob, os, sys
sys.path.insert(0, sys.argv[1])
tmp = sys.argv[2]
sf_dir = sys.argv[3]

from pyspark.sql import functions as F
from pypeman_spark.session import get_spark
from pypeman_spark.sources.tables import load_table
from pypeman_spark.streaming.stateful import stream_dedup
from pypeman_spark.streaming.rollup import ContinuousRollup

# local[8,4]: 8 threads, FOUR task attempts — the fault budget
spark = get_spark("fault_soak", master="local[8,4]", cpus=8)

src = os.path.join(tmp, "src")
dst = os.path.join(tmp, "dedup_out")
ck1 = os.path.join(tmp, "ck1")
store = os.path.join(tmp, "rollup")
faults = os.path.join(tmp, "faults")
os.makedirs(faults, exist_ok=True)

ev = load_table(spark, sf_dir, "events").select(
    "event_id", "user_id", "ts", "event_type",
    # whole cents: double sums become exact so == comparison is fair
    F.floor(F.col("value") * 100 + 0.5).cast("double").alias("value"),
)
ev.unionAll(ev).repartition(8).write.mode("overwrite").parquet(src)
schema = spark.read.parquet(src).schema


def flaky(it):
    # every task fails its FIRST attempt; the marker file both records
    # that injection fired and is the evidence the assert checks
    from pyspark import TaskContext

    tc = TaskContext.get()
    if tc is not None and tc.attemptNumber() == 0:
        open(os.path.join(
            faults, f"f_{tc.stageId()}_{tc.partitionId()}"), "w").close()
        raise RuntimeError("injected fault (attempt 0)")
    for pdf in it:
        yield pdf


# leg 1: dedup the doubled stream through the flaky stage into parquet
stream = (
    spark.readStream.schema(schema)
    .option("maxFilesPerTrigger", "3")
    .parquet(src)
)
deduped = stream_dedup(stream, keys=["event_id"]).mapInPandas(
    flaky, schema=schema
)
q1 = (
    deduped.writeStream.format("parquet")
    .option("path", dst)
    .option("checkpointLocation", ck1)
    .trigger(availableNow=True)
    .start()
)
assert q1.awaitTermination(300), "dedup drain timed out"

# leg 2: incremental rollup of the deduped output, flaky again
stream2 = (
    spark.readStream.schema(schema)
    .option("maxFilesPerTrigger", "2")
    .parquet(dst)
    .mapInPandas(flaky, schema=schema)
)
rollup = ContinuousRollup(
    spark, store, bucket="1 hour", keys=("event_type",),
    ts_col="ts", value_col="value",
)
q2 = rollup.start(stream2)
assert q2.awaitTermination(300), "rollup drain timed out"

n_faults = len(glob.glob(os.path.join(faults, "f_*")))
assert n_faults > 0, "fault injection never fired"

# exactly-once leg 1: sink == the exact distinct set (no loss, no dupes)
out = spark.read.parquet(dst)
assert out.count() == ev.count(), (out.count(), ev.count())
assert out.exceptAll(ev).count() == 0
assert ev.exceptAll(out).count() == 0

# leg 3: CHECKPOINT RESTART — new files land in the source, a fresh
# query resumes from the same checkpoint (same flaky stage) and must
# process exactly the delta: old rows not re-emitted, new rows deduped
ev2 = ev.withColumn("event_id", F.col("event_id") + 1_000_000)
ev2.unionAll(ev2).repartition(4).write.mode("append").parquet(src)
q1b = (
    stream_dedup(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "3")
        .parquet(src),
        keys=["event_id"],
    )
    .mapInPandas(flaky, schema=schema)
    .writeStream.format("parquet")
    .option("path", dst)
    .option("checkpointLocation", ck1)
    .trigger(availableNow=True)
    .start()
)
assert q1b.awaitTermination(300), "restart drain timed out"
both = ev.unionAll(ev2)
out2 = spark.read.parquet(dst)
assert out2.count() == both.count(), (out2.count(), both.count())
assert out2.exceptAll(both).count() == 0
assert both.exceptAll(out2).count() == 0

# exactly-once leg 2: incremental store == one-shot batch aggregation
inc = rollup.read().select("bucket_start", "event_type", "n", "total")
exact = ev.groupBy(
    F.date_trunc("hour", "ts").alias("bucket_start"), "event_type"
).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
assert inc.exceptAll(exact).count() == 0
assert exact.exceptAll(inc).count() == 0

# replay guard: re-delivering an already-merged batch_id is a no-op
before = {tuple(r) for r in inc.collect()}
rollup.merge_batch(spark.read.parquet(dst), batch_id=0)  # stale id
after = {
    tuple(r)
    for r in rollup.read()
    .select("bucket_start", "event_type", "n", "total")
    .collect()
}
assert after == before, "stale batch_id re-delivery double-merged"

print(f"SOAK_OK faults={n_faults}")
"""


def test_streaming_fault_injection_soak(tmp_path, sf_dir):
    script = tmp_path / "soak.py"
    script.write_text(_SOAK)
    out = subprocess.run(
        [sys.executable, str(script), REPO, str(tmp_path), sf_dir],
        capture_output=True, text=True, cwd=REPO, timeout=900,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("SOAK_OK")]
    assert line, out.stdout[-2000:]
    n = int(line[0].split("faults=")[1])
    assert n >= 8  # at least one injected failure per leg's task set
