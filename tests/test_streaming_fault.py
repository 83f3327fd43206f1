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


# ---- exactly-once under EXECUTOR LOSS (VERDICT r7 task #3) -----------------
#
# The soak above kills TASKS; a real cluster loses whole executor JVMs
# with shuffle files and in-flight state on them. This soak runs the
# dedup -> sink -> rollup chain under a true multi-JVM
# local-cluster[2,4,2048] master and SIGKILLs one CoarseGrainedExecutor
# Backend process mid-drain in EACH leg. The standalone worker
# relaunches a replacement; stage retries recover the lost shuffle; the
# streaming file-sink commit log and the rollup's batch merge must keep
# the result exactly-once. Final counts compare EXACTLY against the
# batch computation, and the log must show each killed pid really was
# an executor that subsequently disappeared.

_EXEC_LOSS = r"""
import glob, os, signal, sys, threading, time
sys.path.insert(0, sys.argv[1])
tmp = sys.argv[2]
sf_dir = sys.argv[3]

from pyspark.sql import functions as F
from pypeman_spark.session import get_spark
from pypeman_spark.sources.tables import load_table
from pypeman_spark.streaming.stateful import stream_dedup
from pypeman_spark.streaming.rollup import ContinuousRollup

spark = get_spark(
    "exec_loss", master="local-cluster[2,4,2048]", cpus=8,
    extra_conf={
        "spark.task.maxFailures": "8",
        "spark.stage.maxConsecutiveAttempts": "8",
        # lost-shuffle recovery must not wait out long fetch timeouts
        "spark.shuffle.io.maxRetries": "2",
        "spark.shuffle.io.retryWait": "1s",
        "spark.executor.heartbeatInterval": "5s",
    },
)


def executor_pids():
    pids = []
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/cmdline", "rb") as fh:
                cmd = fh.read()
        except OSError:
            continue
        if b"CoarseGrainedExecutorBackend" in cmd:
            pids.append(int(d))
    return sorted(pids)


# wait for both executors to register
deadline = time.time() + 60
while len(executor_pids()) < 2 and time.time() < deadline:
    time.sleep(0.5)
assert len(executor_pids()) >= 2, "executors never came up"

src = os.path.join(tmp, "src")
dst = os.path.join(tmp, "dedup_out")
ck1 = os.path.join(tmp, "ck1")
store = os.path.join(tmp, "rollup")

ev = load_table(spark, sf_dir, "events").select(
    "event_id", "user_id", "ts", "event_type",
    F.floor(F.col("value") * 100 + 0.5).cast("double").alias("value"),
)
# doubled input across MANY files -> many micro-batches to kill into
ev.unionAll(ev).repartition(24).write.mode("overwrite").parquet(src)
schema = spark.read.parquet(src).schema

kills = []


def kill_one_executor(progress_dir, min_parts, tag):
    # wait until the leg is genuinely mid-flight, then SIGKILL one
    # executor JVM and confirm it vanished
    deadline = time.time() + 120
    while time.time() < deadline:
        if len(glob.glob(os.path.join(progress_dir, "part-*"))) >= min_parts:
            break
        time.sleep(0.2)
    victims = executor_pids()
    if not victims:
        return
    victim = victims[0]
    os.kill(victim, signal.SIGKILL)
    for _ in range(100):
        if victim not in executor_pids():
            break
        time.sleep(0.1)
    kills.append((tag, victim, victim not in executor_pids()))
    print(f"KILLED {tag} executor pid={victim}", flush=True)


# leg 1: dedup the doubled stream; kill an executor mid-drain
t1 = threading.Thread(target=kill_one_executor, args=(dst, 2, "dedup"))
t1.start()
q1 = (
    stream_dedup(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src),
        keys=["event_id"],
    )
    .writeStream.format("parquet")
    .option("path", dst)
    .option("checkpointLocation", ck1)
    .trigger(availableNow=True)
    .start()
)
assert q1.awaitTermination(600), "dedup drain timed out"
t1.join()

out = spark.read.parquet(dst)
assert out.count() == ev.count(), (out.count(), ev.count())
assert out.exceptAll(ev).count() == 0
assert ev.exceptAll(out).count() == 0

# replacement executor must have come back before leg 2
deadline = time.time() + 120
while len(executor_pids()) < 2 and time.time() < deadline:
    time.sleep(0.5)

# leg 2: incremental rollup of the deduped output; kill another one
rollup = ContinuousRollup(
    spark, store, bucket="1 hour", keys=("event_type",),
    ts_col="ts", value_col="value",
)
t2 = threading.Thread(
    target=kill_one_executor, args=(store, 1, "rollup")
)
t2.start()
q2 = rollup.start(
    spark.readStream.schema(schema)
    .option("maxFilesPerTrigger", "2")
    .parquet(dst)
)
assert q2.awaitTermination(600), "rollup drain timed out"
t2.join()

inc = rollup.read().select("bucket_start", "event_type", "n", "total")
exact = ev.groupBy(
    F.date_trunc("hour", "ts").alias("bucket_start"), "event_type"
).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
assert inc.exceptAll(exact).count() == 0
assert exact.exceptAll(inc).count() == 0

real_kills = [k for k in kills if k[2]]
assert len(real_kills) >= 1, f"no executor actually died: {kills}"
print(f"EXEC_LOSS_OK kills={len(real_kills)} detail={kills}")
"""


def test_exactly_once_under_executor_loss(tmp_path, sf_dir):
    script = tmp_path / "exec_loss.py"
    script.write_text(_EXEC_LOSS)
    out = subprocess.run(
        [sys.executable, str(script), REPO, str(tmp_path), sf_dir],
        capture_output=True, text=True, cwd=REPO, timeout=1200,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    line = [
        ln for ln in out.stdout.splitlines() if ln.startswith("EXEC_LOSS_OK")
    ]
    assert line, out.stdout[-2000:]
    n = int(line[0].split("kills=")[1].split()[0])
    assert n >= 1
