"""ACID table format (store/txtable.py): commit-log atomicity under
genuine cross-process races, OCC merge conflict/commute semantics,
snapshot isolation, checkpoint replay, crash-orphan vacuum."""

import json
import multiprocessing as mp
import os

import pytest
from pyspark.sql import functions as F

from pypeman_spark.store.txtable import TxTable

# Every test in this file runs under BOTH LogStore implementations
# (POSIX hardlink claim vs sqlite conditional put): the commit
# protocol's correctness must rest only on the conditional-put
# contract, never on POSIX rename/link semantics.
_KIND = {"logstore": "file"}


@pytest.fixture(autouse=True, params=["file", "sqlite"])
def logstore_kind(request):
    _KIND["logstore"] = request.param
    yield request.param
    _KIND["logstore"] = "file"


def _mk(spark, tmp_path, **kw):
    kw.setdefault("key_cols", ["k"])
    kw.setdefault("n_buckets", 4)
    kw.setdefault("logstore", _KIND["logstore"])
    return TxTable(spark, str(tmp_path / "tbl"), **kw)


def _df(spark, pairs):
    return spark.createDataFrame(list(pairs), "k long, val string")


def test_append_merge_delete_roundtrip(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, [(i, f"v{i}") for i in range(10)]))
    t.merge_upsert(_df(spark, [(5, "NEW"), (99, "INS")]))
    rows = {r["k"]: r["val"] for r in t.read().collect()}
    assert len(rows) == 11 and rows[5] == "NEW" and rows[99] == "INS"
    assert rows[3] == "v3"  # untouched bucket rows survive the merge
    t.delete_keys(spark.createDataFrame([(99,)], "k long"))
    assert t.read().count() == 10
    assert [h["op"] for h in t.history()] == [
        "create", "append", "merge", "delete",
    ]


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """The 100 TB contract: a 1-key merge must remove files only in
    that key's bucket — every other bucket's files stay live."""
    t = _mk(spark, tmp_path, n_buckets=8)
    t.append(_df(spark, [(i, f"v{i}") for i in range(64)]))
    _v, before = t._replay()
    t.merge_upsert(_df(spark, [(7, "X")]))
    _v, after = t._replay()
    tb = {
        r["b"]
        for r in _df(spark, [(7, "X")]).select(
            t._bucket_col().alias("b")
        ).collect()
    }
    for f, info in before.items():
        if info["bucket"] not in tb:
            assert f in after, f"untouched bucket file {f} was removed"
    assert any(
        f not in after for f, i in before.items() if i["bucket"] in tb
    )


def test_snapshot_isolation_and_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    snap = t.snapshot()  # file list fixed NOW
    t.merge_upsert(_df(spark, [(1, "CHANGED")]))
    assert {r["val"] for r in snap.collect()} == {"a", "b"}
    assert {
        r["val"] for r in t.snapshot(version=1).collect()
    } == {"a", "b"}  # explicit time travel
    assert {r["val"] for r in t.read().collect()} == {"CHANGED", "b"}


def test_reopen_reads_table_meta(spark, tmp_path):
    t = _mk(spark, tmp_path, n_buckets=8, checkpoint_interval=7)
    t.append(_df(spark, [(1, "a")]))
    t2 = TxTable(spark, str(tmp_path / "tbl"))  # no key_cols passed
    assert t2.key_cols == ["k"] and t2.n_buckets == 8
    assert t2.checkpoint_interval == 7
    assert t2.read().count() == 1
    with pytest.raises(ValueError):
        TxTable(spark, str(tmp_path / "fresh"))  # new table needs keys


def test_checkpoint_bounds_replay(spark, tmp_path):
    t = _mk(spark, tmp_path, checkpoint_interval=3)
    for i in range(7):
        t.append(_df(spark, [(i, f"v{i}")]))
    ckpts = t.logstore.list_checkpoints()
    assert ckpts  # interval 3 over 8 commits -> at least v3 and v6
    assert t.read().count() == 7
    # replay from checkpoint must equal full replay: drop the early log
    # entries a checkpoint supersedes and the snapshot must not change
    cv = max(ckpts)
    for v in t.logstore.list_versions():
        if 0 < v < cv:
            t.logstore.delete(v)
    assert t.read().count() == 7


def test_interleaved_overlapping_merge_retries_and_wins(spark, tmp_path):
    """Writer A merges key 1; after A reads its snapshot but BEFORE A
    commits, writer B lands a merge touching the same bucket. A's
    first commit attempt must fail, detect the overlap, restage from
    the fresh snapshot and win serially: final state has BOTH B's
    untouched-key write and A's contested-key write (A serialized
    after B)."""
    t_a = _mk(spark, tmp_path)
    t_b = TxTable(spark, str(tmp_path / "tbl"))
    t_a.append(_df(spark, [(1, "base1"), (2, "base2")]))

    real_commit = t_a._commit
    fired = {"done": False}

    def hooked(expected_version, actions, op, buckets, **kw):
        if op == "merge" and not fired["done"]:
            fired["done"] = True
            # concurrent writer lands first, same bucket (key 1 and 2
            # both hash somewhere in 4 buckets; force overlap by
            # updating the SAME key space)
            t_b.merge_upsert(_df(spark, [(1, "from_b"), (2, "from_b")]))
        return real_commit(expected_version, actions, op, buckets, **kw)

    t_a._commit = hooked
    t_a.merge_upsert(_df(spark, [(1, "from_a")]))
    rows = {r["k"]: r["val"] for r in t_a.read().collect()}
    assert rows[1] == "from_a"  # A retried on top of B and won key 1
    assert rows[2] == "from_b"  # B's write to the uncontested key kept
    assert fired["done"]


def test_disjoint_bucket_merge_commits_without_restage(spark, tmp_path):
    """When the interleaved commit touches only OTHER buckets, the
    merge must slide to the next version WITHOUT discarding its staged
    files (commuting writes)."""
    t_a = _mk(spark, tmp_path, n_buckets=64)
    t_b = TxTable(spark, str(tmp_path / "tbl"))
    t_a.append(_df(spark, [(i, f"v{i}") for i in range(20)]))
    # find two keys in different buckets
    b = {
        r["k"]: r["b"]
        for r in _df(spark, [(i, "") for i in range(20)])
        .select("k", t_a._bucket_col().alias("b")).collect()
    }
    k1 = 0
    k2 = next(k for k in b if b[k] != b[k1])
    stages = {"n": 0}
    real_stage = t_a._stage

    def counting_stage(df, **kw):
        stages["n"] += 1
        return real_stage(df, **kw)

    t_a._stage = counting_stage
    real_commit = t_a._commit
    fired = {"done": False}

    def hooked(expected_version, actions, op, buckets, **kw):
        if op == "merge" and not fired["done"]:
            fired["done"] = True
            t_b.merge_upsert(_df(spark, [(k2, "from_b")]))
        return real_commit(expected_version, actions, op, buckets, **kw)

    t_a._commit = hooked
    t_a.merge_upsert(_df(spark, [(k1, "from_a")]))
    rows = {r["k"]: r["val"] for r in t_a.read().collect()}
    assert rows[k1] == "from_a" and rows[k2] == "from_b"
    assert stages["n"] == 1  # staged exactly once: no restage needed


def _race_commits(path, writer_id, n_commits, barrier):
    """Child process: race raw commits through the atomic-claim
    protocol (no Spark needed — the race is pure filesystem)."""
    from pypeman_spark.store.logstore import open_logstore

    t = TxTable.__new__(TxTable)
    t.path = path
    t.log_dir = os.path.join(path, "_txlog")
    t.data_dir = os.path.join(path, "data")
    t.checkpoint_interval = 1 << 30
    t.logstore = open_logstore(t.log_dir)  # layout decides the impl
    barrier.wait()
    landed = []
    for i in range(n_commits):
        fake = f"data/bucket=0/w{writer_id}_c{i}.parquet"
        v = t.version()
        while True:
            if t._commit(
                v + 1, [{"add": {"file": fake, "bucket": 0}}],
                op="append", buckets=[0],
            ):
                landed.append(v + 1)
                break
            v += 1
    # every version this writer claimed, written to a result file
    with open(os.path.join(path, f"result_{writer_id}"), "w") as fh:
        json.dump(landed, fh)


def test_cross_process_commit_race_loses_nothing(spark, tmp_path):
    """4 real processes race 25 commits each through the hardlink
    claim: all 100 land, every version is claimed by exactly one
    writer, and replay sees every file — the atomicity the whole
    format rests on, exercised with genuine concurrency."""
    t = _mk(spark, tmp_path)
    path = str(tmp_path / "tbl")
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(4)
    procs = [
        ctx.Process(target=_race_commits, args=(path, w, 25, barrier))
        for w in range(4)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(120)
        assert p.exitcode == 0
    claimed = []
    for w in range(4):
        with open(os.path.join(path, f"result_{w}")) as fh:
            claimed.extend(json.load(fh))
    assert len(claimed) == 100
    assert len(set(claimed)) == 100  # no version claimed twice
    assert t.version() == 100  # create(0) + 100 racing commits
    _v, live = t._replay()
    assert len(live) == 100  # no commit's file lost from replay


def test_crashed_writer_orphans_invisible_then_vacuumed(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    # a writer that died after staging: file on disk, never in the log
    orphan_dir = os.path.join(t.data_dir, "bucket=0")
    os.makedirs(orphan_dir, exist_ok=True)
    orphan = os.path.join(orphan_dir, "part-orphan.parquet")
    live_file = next(iter(t._replay()[1]))
    import shutil

    shutil.copyfile(os.path.join(t.path, live_file), orphan)
    assert t.read().count() == 2  # snapshot never reads the orphan
    # a half-written commit tmp file must not confuse the log either
    open(os.path.join(t.log_dir, ".tmp.999.deadbeef"), "w").write("{")
    assert t.version() == 1
    removed = t.vacuum(grace_s=0)
    assert "data/bucket=0/part-orphan.parquet" in removed
    assert not os.path.exists(orphan)
    assert t.read().count() == 2  # live files untouched


def test_vacuumed_removed_files_gone_but_history_valid(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, [(i, "x") for i in range(8)]))
    t.merge_upsert(_df(spark, [(i, "y") for i in range(8)]))
    n_files_before = sum(
        len(fs) for _r, _d, fs in os.walk(t.data_dir)
    )
    removed = t.vacuum(grace_s=0)
    assert removed  # the merge's superseded files are reclaimable
    assert sum(
        len(fs) for _r, _d, fs in os.walk(t.data_dir)
    ) == n_files_before - len(removed)
    assert {r["val"] for r in t.read().collect()} == {"y"}
    with pytest.raises(Exception):
        # time travel to a vacuumed version now legitimately fails
        t.snapshot(version=1).collect()


def test_commit_file_is_complete_when_visible(spark, tmp_path):
    """The version file appears only via os.link of a fully-fsynced
    tmp — so any visible commit file parses completely."""
    t = _mk(spark, tmp_path)
    for i in range(5):
        t.append(_df(spark, [(i, "v")]))
    for v in t.logstore.list_versions():
        lines = [
            json.loads(x) for x in t.logstore.read(v).splitlines() if x
        ]
        assert any("commit" in a for a in lines)


def test_merge_state_machine_vs_duckdb_sequence(spark, tmp_path, sf_dir):
    """Apply a deterministic merge/delete sequence from real orders
    data and check the final state against an independent relational
    recomputation (duckdb)."""
    import duckdb

    from pypeman_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("c"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    t = _mk(spark, tmp_path, n_buckets=8)
    t.append(orders.filter(F.col("k") < 1000).withColumn("src", F.lit("base")))
    t.merge_upsert(
        orders.filter((F.col("k") >= 500) & (F.col("k") < 1500))
        .withColumn("cents", F.col("cents") + 1)
        .withColumn("src", F.lit("m1"))
    )
    t.delete_keys(
        orders.filter((F.col("k") % 7 == 0) & (F.col("k") < 1500))
    )
    t.merge_upsert(
        orders.filter(F.col("k") < 300)
        .withColumn("cents", F.col("cents") + 2)
        .withColumn("src", F.lit("m2"))
    )
    got = sorted(
        tuple(r) for r in t.read().select("k", "c", "cents", "src").collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'"
    )
    exp = sorted(
        tuple(r)
        for r in con.execute("""
            WITH base AS (
              SELECT o_orderkey k, o_custkey c,
                     CAST(round(o_totalprice * 100) AS BIGINT) cents
              FROM orders WHERE o_orderkey < 1500
            )
            SELECT k, c,
                   CASE WHEN k < 300 THEN cents + 2
                        WHEN k >= 500 THEN cents + 1
                        ELSE cents END AS cents,
                   CASE WHEN k < 300 THEN 'm2'
                        WHEN k >= 500 THEN 'm1'
                        ELSE 'base' END AS src
            FROM base
            WHERE k < 300 OR k % 7 <> 0
        """).fetchall()
    )
    assert got == exp


def test_txn_marker_makes_merge_idempotent(spark, tmp_path):
    """Delta-style txn protocol: a merge re-delivered with the same
    (app, batch) marker is a provable no-op — the exactly-once story
    for streaming foreachBatch after checkpoint restart."""
    t = _mk(spark, tmp_path)
    t.append(_df(spark, [(i, f"v{i}") for i in range(10)]))
    v1 = t.merge_upsert(_df(spark, [(1, "B0")]), txn=("q", 0))
    # redelivery of batch 0: no new version, no data change
    assert t.merge_upsert(_df(spark, [(1, "GHOST")]), txn=("q", 0)) == v1
    assert t.version() == v1
    assert {r["k"]: r["val"] for r in t.read().collect()}[1] == "B0"
    # next batch applies; an older batch replayed later still no-ops
    v2 = t.merge_upsert(_df(spark, [(2, "B1")]), txn=("q", 1))
    assert v2 == v1 + 1
    assert t.merge_upsert(_df(spark, [(2, "GHOST")]), txn=("q", 0)) == v2
    assert t.last_txn_version("q") == 1
    assert t.last_txn_version("other") == -1


def test_txn_marker_makes_append_idempotent(spark, tmp_path):
    """append(txn=...) is the exactly-once primitive for append-only
    sinks and retried ingestion jobs: a batch re-delivered with the
    same (app, version) marker stages nothing and commits nothing."""
    t = _mk(spark, tmp_path)
    v1 = t.append(_df(spark, [(1, "a"), (2, "b")]), txn=("ing", 1))
    assert t.append(_df(spark, [(1, "GHOST")]), txn=("ing", 1)) == v1
    assert t.version() == v1 and t.count() == 2
    v2 = t.append(_df(spark, [(3, "c")]), txn=("ing", 2))
    assert v2 == v1 + 1 and t.count() == 3
    # an older batch replayed later still no-ops
    assert t.append(_df(spark, [(9, "GHOST")]), txn=("ing", 1)) == v2
    assert t.count() == 3
    assert t.last_txn_version("ing") == 2
    # untagged appends are unaffected
    assert t.append(_df(spark, [(4, "d")])) == v2 + 1


def test_txn_marker_survives_checkpoint(spark, tmp_path):
    """Markers must be carried into checkpoints, or a long-lived table
    would silently forget applied batches once replay is bounded."""
    t = _mk(spark, tmp_path, checkpoint_interval=3)
    t.append(_df(spark, [(0, "a")]))
    for b in range(6):
        t.merge_upsert(_df(spark, [(b, f"b{b}")]), txn=("q", b))
    assert t.logstore.list_checkpoints()
    reopened = TxTable(spark, str(tmp_path / "tbl"))
    assert reopened.last_txn_version("q") == 5
    assert reopened.merge_upsert(
        _df(spark, [(3, "GHOST")]), txn=("q", 3)
    ) == t.version()


def test_foreach_batch_merge_sink(spark, tmp_path):
    t = _mk(spark, tmp_path)
    sink = t.foreach_batch_merge("myquery")
    sink(_df(spark, [(1, "x"), (2, "y")]), 0)
    sink(_df(spark, [(2, "y2")]), 1)
    sink(_df(spark, [(2, "STALE")]), 1)  # redelivery
    rows = {r["k"]: r["val"] for r in t.read().collect()}
    assert rows == {1: "x", 2: "y2"}
    assert t.last_txn_version("myquery") == 1


def test_foreach_batch_append_sink(spark, tmp_path):
    """Append-only streaming sink: each micro-batch lands once,
    redeliveries after checkpoint restart no-op — and unlike the
    merge sink, duplicate KEYS across batches accumulate (insert-only
    semantics, no key hashing)."""
    t = _mk(spark, tmp_path)
    sink = t.foreach_batch_append("ingestq")
    sink(_df(spark, [(1, "x"), (2, "y")]), 0)
    sink(_df(spark, [(1, "x-again")]), 1)   # same key: accumulates
    sink(_df(spark, [(1, "STALE")]), 1)     # redelivery: no-op
    assert t.count() == 3
    assert sorted(r["val"] for r in t.read().collect()) == [
        "x", "x-again", "y"
    ]
    assert t.last_txn_version("ingestq") == 1


def test_lookup_prunes_to_key_buckets(spark, tmp_path):
    """Point reads touch only the probed keys' buckets — the parquet
    scan's file list must be a strict subset of the live set."""
    t = _mk(spark, tmp_path, n_buckets=8)
    t.append(_df(spark, [(i, f"v{i}") for i in range(64)]))
    keys = spark.createDataFrame([(7,), (13,)], "k long")
    got = {r["k"]: r["val"] for r in t.lookup(keys).collect()}
    assert got == {7: "v7", 13: "v13"}
    # plan-level: the scan reads fewer files than the full snapshot
    _v, live = t._replay()
    kb = {r["b"] for r in keys.select(t._bucket_col().alias("b")).collect()}
    pruned = [f for f, i in live.items() if i["bucket"] in kb]
    assert 0 < len(pruned) < len(live)
    plan = t.lookup(keys)._jdf.queryExecution().executedPlan().toString()
    # every live file outside the probed buckets is absent from the scan
    scanned_dirs = {
        f"bucket={i['bucket']}" for f, i in live.items() if f in set(pruned)
    }
    for f, i in live.items():
        if i["bucket"] not in kb:
            assert f.split("/")[1] not in scanned_dirs
    # keys hashing only to data-free buckets: empty, schema intact
    empty = t.lookup(spark.createDataFrame([(10**9,)], "k long"))
    assert empty.columns == ["k", "val"] and empty.count() == 0


def test_compact_preserves_rows_and_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path, n_buckets=4)
    for i in range(5):  # 5 appends -> ~5 files per bucket
        t.append(_df(spark, [(j, f"v{j}") for j in range(i * 8, i * 8 + 8)]))
    v_before = t.version()
    _v, live_before = t._replay()
    before = {(r["k"], r["val"]) for r in t.read().collect()}
    v_c = t.compact()
    assert v_c == v_before + 1
    _v, live_after = t._replay()
    # one file per bucket afterwards
    per_bucket = {}
    for f, i in live_after.items():
        per_bucket.setdefault(i["bucket"], []).append(f)
    assert all(len(fs) == 1 for fs in per_bucket.values())
    assert len(live_after) < len(live_before)
    assert {(r["k"], r["val"]) for r in t.read().collect()} == before
    # pre-compact snapshot still exact (immutable files)
    assert {
        (r["k"], r["val"]) for r in t.snapshot(version=v_before).collect()
    } == before
    # idempotent: nothing left to compact
    assert t.compact() == v_c


def test_compact_commutes_with_disjoint_merge(spark, tmp_path):
    """A merge landing in an untouched bucket between compact's read
    and its commit must NOT force a restage — ops commute."""
    t = _mk(spark, tmp_path, n_buckets=8)
    for i in range(3):
        t.append(_df(spark, [(j, f"v{j}") for j in range(24)]))
    # compact only some buckets by merging a fat update first is
    # complex; instead simulate the race: stage a merge commit into a
    # bucket compact does not touch, after compact computed its plan
    before = {r["k"] for r in t.read().collect()}
    v = t.compact()
    assert {r["k"] for r in t.read().collect()} == before
    assert t.history()[-1]["op"] == "compact"
    assert v == t.version()


def test_streaming_sink_checkpoint_restart_exactly_once(spark, tmp_path):
    """A REAL StreamingQuery drives foreach_batch_merge: drain a file
    source into the table, then RESTART from the same checkpoint with
    new input files — only the delta merges (no re-application of the
    drained batches), and a third restart with nothing new is a no-op.
    Final table state must equal the batch-computed last-write-wins."""
    src = tmp_path / "src"
    ck = str(tmp_path / "ck")
    src.mkdir()
    t = _mk(spark, tmp_path)
    sink = t.foreach_batch_merge("stream-q")

    def drain(n_files_before):
        q = (
            spark.readStream.schema("k long, val string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def put(name, pairs):
        import pyarrow as pa
        import pyarrow.parquet as pq
        ks, vs = zip(*pairs)
        pq.write_table(
            pa.table({"k": pa.array(ks, pa.int64()), "val": list(vs)}),
            str(src / name),
        )

    put("f1.parquet", [(i, f"a{i}") for i in range(8)])
    drain(1)
    assert {r["k"]: r["val"] for r in t.read().collect()} == {
        i: f"a{i}" for i in range(8)
    }
    v_after_first = t.version()
    txn_after_first = t.last_txn_version("stream-q")

    # restart with a delta file: keys 4-11, overwriting 4-7
    put("f2.parquet", [(i, f"b{i}") for i in range(4, 12)])
    drain(2)
    rows = {r["k"]: r["val"] for r in t.read().collect()}
    assert rows == {
        **{i: f"a{i}" for i in range(4)},
        **{i: f"b{i}" for i in range(4, 12)},
    }
    assert t.last_txn_version("stream-q") > txn_after_first
    assert t.version() > v_after_first

    # restart with no new input: provably nothing happens
    v_idle = t.version()
    drain(2)
    assert t.version() == v_idle


def test_schema_evolution_add_column(spark, tmp_path):
    """Merging a frame with a NEW column evolves the log schema; rows
    in untouched buckets (old physical files) null-fill it on read —
    no footer merging, the schema comes from the log."""
    t = _mk(spark, tmp_path, n_buckets=4)
    t.append(_df(spark, [(i, f"v{i}") for i in range(12)]))
    up = spark.createDataFrame(
        [(1, "NEW", 7.5)], "k long, val string, score double"
    )
    t.merge_upsert(up)
    snap = t.read()
    assert set(snap.columns) == {"k", "val", "score"}
    rows = {r["k"]: (r["val"], r["score"]) for r in snap.collect()}
    assert rows[1] == ("NEW", 7.5)
    assert rows[2] == ("v2", None)  # old file, null-filled
    assert [f.name for f in t.table_schema().fields] == [
        "k", "val", "score",
    ]
    # lookup + delete + compact all read through the log schema
    assert t.lookup(
        spark.createDataFrame([(1,)], "k long")
    ).collect()[0]["score"] == 7.5
    t.compact()
    assert {
        r["k"]: (r["val"], r["score"]) for r in t.read().collect()
    } == rows
    # appending a SUBSET of columns null-fills the rest
    t.append(spark.createDataFrame([(100, "app")], "k long, val string"))
    r100 = {r["k"]: r["score"] for r in t.read().collect()}[100]
    assert r100 is None


def test_schema_evolution_rejects_type_change(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, [(1, "a")]))
    bad = spark.createDataFrame([(2, 3)], "k long, val long")
    with pytest.raises(ValueError, match="cannot change column"):
        t.merge_upsert(bad)
    # table untouched by the failed merge
    assert {r["k"]: r["val"] for r in t.read().collect()} == {1: "a"}


def test_schema_survives_checkpoint_and_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path, checkpoint_interval=3)
    t.append(_df(spark, [(0, "a")]))
    v_pre = t.version()
    t.merge_upsert(
        spark.createDataFrame([(0, "a", 1.0)], "k long, val string, s double")
    )
    for b in range(4):
        t.merge_upsert(_df(spark, [(b + 10, f"x{b}")]))
    reopened = TxTable(spark, str(tmp_path / "tbl"))
    assert [f.name for f in reopened.table_schema().fields] == [
        "k", "val", "s",
    ]
    # time travel BEFORE the evolution shows the old schema
    assert set(reopened.snapshot(version=v_pre).columns) == {"k", "val"}


# ------------------------------------------------------------- CDC --


def _changes(t, from_v, to_v=None):
    rows = t.table_changes(from_v, to_v).collect()
    return {
        (r["_commit_version"], r["_change_type"], r["k"]): r
        for r in rows
    }, rows


def test_cdc_append_is_all_inserts(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v = t.append(_df(spark, [(1, "a"), (2, "b")]))
    ch, rows = _changes(t, 0)
    assert len(rows) == 2
    assert {k[1] for k in ch} == {"insert"}
    assert {k[0] for k in ch} == {v}


def test_cdc_merge_classifies_and_drops_rewrite_noise(spark, tmp_path):
    """A merge rewrites EVERY row in a touched bucket; the feed must
    carry only the rows that logically changed."""
    t = _mk(spark, tmp_path, n_buckets=2)  # 2 buckets: lots of cohabitants
    v0 = t.append(_df(spark, [(i, f"v{i}") for i in range(20)]))
    v1 = t.merge_upsert(_df(spark, [(5, "NEW"), (99, "INS")]))
    ch, rows = _changes(t, v0, v1)
    assert set(ch) == {
        (v1, "insert", 99),
        (v1, "update_preimage", 5),
        (v1, "update_postimage", 5),
    }
    assert ch[(v1, "update_preimage", 5)]["val"] == "v5"
    assert ch[(v1, "update_postimage", 5)]["val"] == "NEW"
    # a merge that rewrites a row to the SAME value is not a change
    v2 = t.merge_upsert(_df(spark, [(7, "v7")]))
    assert _changes(t, v1, v2)[1] == []


def test_cdc_delete_and_compact(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    t.merge_upsert(_df(spark, [(2, "B2")]))
    v_pre = t.version()
    v_del = t.delete_keys(spark.createDataFrame([(2,)], "k long"))
    ch, rows = _changes(t, v_pre)
    assert set(ch) == {(v_del, "delete", 2)}
    assert ch[(v_del, "delete", 2)]["val"] == "B2"  # current, not original
    v_cmp = t.compact(min_files=1)
    assert v_cmp > v_del
    assert _changes(t, v_del)[1] == []  # compaction: no logical change


def test_cdc_range_and_empty(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v1 = t.append(_df(spark, [(1, "a")]))
    v2 = t.append(_df(spark, [(2, "b")]))
    ch, rows = _changes(t, v1, v2)  # (v1, v2]: only the second append
    assert set(ch) == {(v2, "insert", 2)}
    empty = t.table_changes(v2)
    assert empty.count() == 0
    assert {"_change_type", "_commit_version"} <= set(empty.columns)


def test_cdc_across_schema_evolution(spark, tmp_path):
    """Pre/post images align even when the commit added a column: the
    preimage (old physical file, no such column) null-fills it."""
    t = _mk(spark, tmp_path, n_buckets=2)
    v0 = t.append(_df(spark, [(1, "a"), (2, "b")]))
    v1 = t.merge_upsert(spark.createDataFrame(
        [(1, "a", 9.5)], "k long, val string, score double"
    ))
    ch, rows = _changes(t, v0, v1)
    assert set(ch) == {
        (v1, "update_preimage", 1), (v1, "update_postimage", 1),
    }
    assert ch[(v1, "update_preimage", 1)]["score"] is None
    assert ch[(v1, "update_postimage", 1)]["score"] == 9.5


# --------------------------------------------------- data skipping --


def test_scan_prunes_files_by_footer_stats(spark, tmp_path):
    """Two commits with disjoint value ranges: a range scan must read
    only the first commit's files (decided driver-side from the log)
    and still return exactly snapshot().where(...)."""
    t = _mk(spark, tmp_path, n_buckets=4)
    t.append(spark.createDataFrame(
        [(i, i * 10) for i in range(100)], "k long, price long"))
    t.append(spark.createDataFrame(
        [(i, i * 10) for i in range(1000, 1100)], "k long, price long"))
    got = t.scan(("price", "between", (0, 500)))
    info = t.last_scan_info
    assert info["files_read"] < info["files_live"]
    expect = t.snapshot().where(F.col("price").between(0, 500))
    assert sorted(r["k"] for r in got.collect()) == sorted(
        r["k"] for r in expect.collect())
    # a range no file can hold: zero files planned, empty result,
    # table schema preserved
    none = t.scan(("price", ">", 10**9))
    assert t.last_scan_info["files_read"] == 0
    assert none.count() == 0 and set(none.columns) == {"k", "price"}


def test_scan_string_and_equality_pruning(spark, tmp_path):
    t = _mk(spark, tmp_path, n_buckets=2)
    t.append(spark.createDataFrame(
        [(1, "apple"), (2, "berry")], "k long, w string"))
    t.append(spark.createDataFrame(
        [(3, "yak"), (4, "zebra")], "k long, w string"))
    rows = t.scan(("w", "=", "zebra")).collect()
    assert [r["k"] for r in rows] == [4]
    assert t.last_scan_info["files_read"] < t.last_scan_info["files_live"]


def test_scan_missing_stats_is_safe_and_filter_still_applies(
    spark, tmp_path
):
    """Stats stripped from the log (as if written by an old version):
    nothing is pruned, but the predicate still filters rows — skipping
    is an optimization, never the filter."""
    t = _mk(spark, tmp_path, n_buckets=2)
    t.append(spark.createDataFrame(
        [(i, i) for i in range(10)], "k long, v long"))
    # rewrite the append commit without stats
    lines = [json.loads(x) for x in t.logstore.read(1).splitlines() if x]
    for a in lines:
        if "add" in a:
            a["add"].pop("stats", None)
            a["add"].pop("rows", None)
    t.logstore.overwrite(
        1, "".join(json.dumps(a) + "\n" for a in lines))
    got = t.scan(("v", ">=", 8))
    assert t.last_scan_info["files_read"] == t.last_scan_info["files_live"]
    assert sorted(r["v"] for r in got.collect()) == [8, 9]


def test_may_match_bounds():
    m = TxTable._may_match
    st = {"x": [10, 20], "s": ["bb", "dd"]}
    assert not m(st, "x", "=", 9) and m(st, "x", "=", 10)
    assert not m(st, "x", "<", 10) and m(st, "x", "<", 11)
    assert not m(st, "x", ">", 20) and m(st, "x", ">", 19)
    assert m(st, "x", "<=", 10) and m(st, "x", ">=", 20)
    assert not m(st, "x", "between", (21, 30))
    assert m(st, "x", "between", (20, 30))
    assert not m(st, "x", "in", [1, 2]) and m(st, "x", "in", [1, 15])
    assert not m(st, "s", "=", "aa") and m(st, "s", "=", "cc")
    assert m(st, "y", "=", 0)          # no stats for column: keep
    assert m(None, "x", "=", 0)        # no stats at all: keep
    assert m(st, "x", "=", "str")      # incomparable types: keep


# ------------------------------------------------- streaming CDC --


def _drain(feed, tmp_path, name):
    q = (feed.writeStream.format("memory").queryName(name)
         .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)


def test_stream_changes_matches_batch_feed(spark, tmp_path):
    """The streaming source over a mixed history must produce exactly
    table_changes(0): inserts, noise-free update pre/post images,
    deletes; compact commits contribute nothing."""
    t = _mk(spark, tmp_path, n_buckets=2)
    t.append(_df(spark, [(i, f"v{i}") for i in range(10)]))
    t.merge_upsert(_df(spark, [(5, "NEW"), (99, "INS")]))
    t.delete_keys(spark.createDataFrame([(3,)], "k long"))
    t.compact(min_files=1)
    _drain(t.stream_changes(), tmp_path, "cdc_all")
    got = sorted(
        tuple(r) for r in spark.sql(
            "select _commit_version, _change_type, k, val from cdc_all"
        ).collect()
    )
    want = sorted(
        tuple(r) for r in t.table_changes(0).select(
            "_commit_version", "_change_type", "k", "val"
        ).collect()
    )
    assert got == want and len(got) == 14


def test_drain_available_paced_catchup(spark, tmp_path):
    """availableNow + a bounded reader drains one trigger's worth per
    run (no SupportsTriggerAvailableNow seam in the Python source
    API) — drain_changes_available loops runs until the committed
    offset reaches the drain-start head: a 20-commit backlog at
    maxCommitsPerTrigger=5 takes exactly 4 bounded runs, one shared
    checkpoint keeps it exactly-once, and re-draining is a 0-run
    no-op."""
    t = _mk(spark, tmp_path, n_buckets=2)
    for i in range(20):
        t.append(_df(spark, [(100 * i + j, f"v{i}") for j in range(3)]))
    batches = []

    def fb(df, _bid):
        batches.append(df.count())

    res = t.drain_changes_available(
        fb, str(tmp_path / "ck"), max_commits_per_trigger=5,
    )
    assert res["runs"] == 4
    assert res["end_version"] == res["target"] == t.version()
    assert sum(batches) == 60  # every insert exactly once
    res2 = t.drain_changes_available(
        fb, str(tmp_path / "ck"), max_commits_per_trigger=5,
    )
    assert res2["runs"] == 0 and sum(batches) == 60


def test_stream_changes_restart_resumes_at_offset(spark, tmp_path):
    """Checkpointed offsets: a restarted query delivers ONLY commits
    after the last consumed version — exactly-once across restarts,
    and a batch of only row-preserving commits delivers nothing."""
    t = _mk(spark, tmp_path, n_buckets=2)
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    feed = t.stream_changes()
    ckpt = str(tmp_path / "ckpt_resume")

    def drain(qname):
        got = []  # memory sink can't recover a checkpoint; foreachBatch can

        def sink(batch_df, _bid):
            got.extend(
                (r["_commit_version"], r["_change_type"], r["k"])
                for r in batch_df.collect()
            )

        q = (feed.writeStream.foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return sorted(got)

    first = drain("cdc_r1")
    assert [c for _, c, _ in first] == ["insert", "insert"]
    # new commits while the query is down
    v2 = t.merge_upsert(_df(spark, [(2, "B2")]))
    second = drain("cdc_r2")  # fresh sink table, SAME checkpoint
    assert second == [
        (v2, "update_postimage", 2), (v2, "update_preimage", 2),
    ]
    t.compact(min_files=1)  # row-preserving only
    assert drain("cdc_r3") == []


def test_stream_changes_null_fills_pre_evolution_files(spark, tmp_path):
    """A merge that added a column: the preimage comes from a physical
    file written BEFORE the column existed and must null-fill it."""
    t = _mk(spark, tmp_path, n_buckets=2)
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    t.merge_upsert(spark.createDataFrame(
        [(1, "a", 9.5)], "k long, val string, score double"
    ))
    _drain(t.stream_changes(), tmp_path, "cdc_evo")
    rows = {
        r["_change_type"]: r
        for r in spark.sql("select * from cdc_evo where k = 1").collect()
    }
    assert rows["update_preimage"]["score"] is None
    assert rows["update_postimage"]["score"] == 9.5
    assert rows["insert"]["score"] is None  # the v1 append row for k=1


# --------------------------------------------- clustered compaction --


def test_compact_cluster_by_tightens_pruning(spark, tmp_path):
    """Three interleaved-range appends: every file spans the whole
    price domain, so scan() can prune nothing. After a clustered
    compaction (sorted, 4 files per bucket) the same narrow scan must
    read strictly fewer files — and still return identical rows."""
    t = _mk(spark, tmp_path, n_buckets=2)
    for start in (0, 1, 2):  # k % 3 slices: each spans 0..~3000
        ks = sorted(  # scrambled order: every task's file spans the
            range(start, 3000, 3),  # whole price domain, stats useless
            key=lambda k: (k * 2654435761) % (1 << 32),
        )
        t.append(spark.createDataFrame(
            [(k, k) for k in ks], "k long, price long"))
    pred = ("price", "between", (100, 200))
    before = t.scan(pred)
    assert t.last_scan_info["files_read"] == t.last_scan_info["files_live"]
    want = sorted(r["k"] for r in before.collect())

    t.compact(min_files=1, cluster_by=["price"], files_per_bucket=4)
    got = t.scan(pred)
    info = t.last_scan_info
    assert info["files_read"] < info["files_live"]
    assert sorted(r["k"] for r in got.collect()) == want
    # row-preserving: the whole table is intact and CDC-silent
    assert t.snapshot().count() == 3000
    assert t.table_changes(t.version() - 1).count() == 0


def test_compact_zorder_prunes_on_both_columns(spark, tmp_path):
    """Morton clustering on (x, y): narrow scans on EITHER column must
    prune files after compaction."""
    t = _mk(spark, tmp_path, n_buckets=2)
    t.append(spark.createDataFrame(
        [(k, k % 64, (k * 37) % 64) for k in range(4096)],
        "k long, x long, y long"))
    t.compact(min_files=1, cluster_by=["x", "y"],
              files_per_bucket=8, zorder=True)
    for col in ("x", "y"):
        got = t.scan((col, "between", (0, 7)))
        info = t.last_scan_info
        assert info["files_read"] < info["files_live"], col
        assert got.count() == 4096 // 8, col


# --------------------------------------------------- general MERGE --


def test_merge_update_expressions_and_insert(spark, tmp_path):
    """MERGE with arithmetic update over t./s. columns, insert for
    unmatched source keys, untouched cohabitants preserved."""
    t = _mk(spark, tmp_path, n_buckets=2)
    t.append(spark.createDataFrame(
        [(i, 100 * i) for i in range(6)], "k long, bal long"))
    src = spark.createDataFrame(
        [(2, 7), (4, -1), (99, 5)], "k long, amount long")
    t.merge(
        src,
        when_matched_update={"bal": "t.bal + s.amount"},
        when_not_matched_insert={"bal": "s.amount * 1000"},
    )
    rows = {r["k"]: r["bal"] for r in t.read().collect()}
    assert rows == {0: 0, 1: 100, 2: 207, 3: 300, 4: 399, 5: 500,
                    99: 5000}
    assert "amount" not in t.read().columns  # dict insert: no evolution


def test_merge_conditional_delete_and_update_gate(spark, tmp_path):
    """Delete clause wins where its condition holds; update applies
    only where when_matched_condition holds; other matched rows are
    rewritten unchanged and stay OUT of the change feed."""
    t = _mk(spark, tmp_path, n_buckets=2)
    t.append(spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)], "k long, bal long"))
    v0 = t.version()
    src = spark.createDataFrame(
        [(1, 0), (2, 5), (3, 5), (4, 5)], "k long, amount long")
    v1 = t.merge(
        src,
        when_matched_update={"bal": "t.bal + s.amount"},
        when_matched_delete="s.amount = 0",
        when_matched_condition="t.bal >= 30",
        when_not_matched_insert=False,
    )
    rows = {r["k"]: r["bal"] for r in t.read().collect()}
    assert rows == {2: 20, 3: 35, 4: 45}  # 1 deleted; 2 gated out
    ch = {
        (r["_change_type"], r["k"])
        for r in t.table_changes(v0, v1).collect()
    }
    assert ch == {
        ("delete", 1),
        ("update_preimage", 3), ("update_postimage", 3),
        ("update_preimage", 4), ("update_postimage", 4),
    }  # k=2 rewritten unchanged: feed-silent


def test_merge_insert_as_is_evolves_schema(spark, tmp_path):
    t = _mk(spark, tmp_path, n_buckets=2)
    t.append(_df(spark, [(1, "a")]))
    t.merge(spark.createDataFrame(
        [(2, "b", 9.5)], "k long, val string, score double"))
    rows = {r["k"]: (r["val"], r["score"]) for r in t.read().collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_merge_rejects_key_update_and_scopes_buckets(spark, tmp_path):
    t = _mk(spark, tmp_path, n_buckets=8)
    t.append(_df(spark, [(i, f"v{i}") for i in range(32)]))
    with pytest.raises(ValueError, match="key column"):
        t.merge(_df(spark, [(1, "x")]),
                when_matched_update={"k": "t.k + 1"})
    _v, before = t._replay()
    src = _df(spark, [(3, "X")])
    t.merge(src, when_matched_update={"val": "s.val"})
    _v, after = t._replay()
    tb = {r["b"] for r in src.select(t._bucket_col().alias("b")).collect()}
    for f, info in before.items():
        if info["bucket"] not in tb:
            assert f in after, "merge touched an unrelated bucket"


def test_merge_txn_idempotence(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(spark.createDataFrame([(1, 10)], "k long, bal long"))
    src = spark.createDataFrame([(1, 5)], "k long, amount long")
    kw = dict(when_matched_update={"bal": "t.bal + s.amount"},
              when_not_matched_insert=False)
    t.merge(src, txn=("job", 7), **kw)
    t.merge(src, txn=("job", 7), **kw)  # re-delivery: provable no-op
    assert {r["bal"] for r in t.read().collect()} == {15}


def test_scan_never_prunes_nan_rows_on_float_gt(spark, tmp_path):
    """Spark orders NaN above every double but footer stats exclude
    NaN: a '>' scan on a float column must NOT prune the file whose
    only qualifying row is NaN."""
    t = _mk(spark, tmp_path, n_buckets=1)
    t.append(spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, float("nan"))], "k long, x double"))
    got = t.scan(("x", ">", 100.0))
    assert t.last_scan_info["files_read"] == t.last_scan_info["files_live"]
    assert [r["k"] for r in got.collect()] == [3]  # NaN > 100.0 in Spark
    # bounded ops stay prunable: no row (NaN included) passes between
    assert t.scan(("x", "between", (50.0, 60.0))).count() == 0
    # and '<' pruning is NaN-safe (NaN fails '<'), so it may prune
    assert TxTable._may_match({"x": [1.0, 2.0]}, "x", "<", 0.5) is False
    assert TxTable._may_match({"x": [1.0, 2.0]}, "x", ">", 99.0) is True
    assert TxTable._may_match(
        {"x": [1.0, 2.0]}, "x", "=", float("nan")) is True


# ------------------------------------------------ log-derived stats --


def test_count_and_stats_from_log_only(spark, tmp_path):
    """Exact COUNT(*) and table stats from commit-log replay — zero
    data IO — must track the table through append/merge/delete/
    compact; stripped stats (old-version logs) degrade to None."""
    t = _mk(spark, tmp_path, n_buckets=2)
    t.append(_df(spark, [(i, f"v{i}") for i in range(25)]))
    t.merge_upsert(_df(spark, [(3, "X"), (99, "INS")]))
    t.delete_keys(spark.createDataFrame([(0,), (1,)], "k long"))
    t.compact(min_files=1)
    assert t.count() == t.snapshot().count() == 24
    s = t.stats()
    assert s["rows"] == 24 and s["files"] == s["buckets"] == 2
    assert s["bytes"] > 0 and s["version"] == t.version()
    # time travel: count at the append version
    assert t.count(version=1) == 25
    # strip rows from one live add: count must refuse to guess
    hv = t.version()
    lines = [json.loads(x) for x in t.logstore.read(hv).splitlines() if x]
    for a in lines:
        if "add" in a:
            a["add"].pop("rows", None)
            break
    t.logstore.overwrite(
        hv, "".join(json.dumps(a) + "\n" for a in lines))
    assert t.count() is None and t.stats()["rows"] is None


# ------------------------------------- medallion CDC chain (e2e) --


def test_medallion_cdc_chain_exactly_once(spark, tmp_path):
    """Bronze TxTable -> stream_changes() -> foreachBatch CDC-apply ->
    silver TxTable: the full incremental-lakehouse loop. The apply
    step reduces each micro-batch to the LATEST post-image per key
    (preimages dropped, max commit version wins) and routes deletes
    vs upserts; txn markers make re-delivered batches no-ops. After
    every drain — including a restart with new bronze commits and an
    empty re-drain — silver must equal bronze exactly."""
    from pyspark.sql import Window

    bronze = _mk(spark, tmp_path, n_buckets=2)
    silver = TxTable(
        spark, str(tmp_path / "silver"), key_cols=["k"], n_buckets=2
    )
    ckpt = str(tmp_path / "ckpt_medallion")

    def apply_cdc(batch_df, batch_id):
        latest = (
            batch_df.where(F.col("_change_type") != "update_preimage")
            .withColumn("rn", F.row_number().over(
                Window.partitionBy("k")
                .orderBy(F.desc("_commit_version"))
            ))
            .where(F.col("rn") == 1)
        ).cache()
        ups = latest.where(
            F.col("_change_type") != "delete").select("k", "val")
        dels = latest.where(
            F.col("_change_type") == "delete").select("k")
        if ups.limit(1).count():
            silver.merge_upsert(ups, txn=("medallion", batch_id))
        if dels.limit(1).count():
            silver.delete_keys(dels)  # naturally idempotent
        latest.unpersist()

    def drain():
        q = (bronze.stream_changes().writeStream.foreachBatch(apply_cdc)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    def table(t):
        return sorted((r["k"], r["val"]) for r in t.read().collect())

    bronze.append(_df(spark, [(i, f"v{i}") for i in range(10)]))
    bronze.merge_upsert(_df(spark, [(3, "X"), (99, "INS")]))
    drain()
    assert table(silver) == table(bronze)
    # new bronze commits while silver's query is down
    bronze.delete_keys(spark.createDataFrame([(5,)], "k long"))
    bronze.merge_upsert(_df(spark, [(3, "Y")]))
    drain()  # restart from checkpoint: only the delta
    assert table(silver) == table(bronze)
    assert ("3", "Y") not in table(silver)  # sanity: values are (int, str)
    drain()  # nothing new: provable no-op
    assert table(silver) == table(bronze)
    assert silver.count() == bronze.count() == 10


# -------------------------------------------------- CHECK constraints --


def test_check_constraint_blocks_bad_writes(spark, tmp_path):
    from pypeman_spark.store import ConstraintViolation

    t = _mk(spark, tmp_path, n_buckets=2)
    t.append(spark.createDataFrame(
        [(1, 10), (2, 20)], "k long, bal long"))
    t.add_constraint("bal_nonneg", "bal >= 0")
    assert t.constraints() == {"bal_nonneg": "bal >= 0"}
    v = t.version()
    # violating append: rejected, no commit, no live-file change
    with pytest.raises(ConstraintViolation) as e:
        t.append(spark.createDataFrame([(3, -5)], "k long, bal long"))
    assert e.value.counts == {"bal_nonneg": 1}
    assert t.version() == v and t.count() == 2
    # violating UPDATE expression through the general merge: rejected
    with pytest.raises(ConstraintViolation):
        t.merge(
            spark.createDataFrame([(1, 100)], "k long, amount long"),
            when_matched_update={"bal": "t.bal - s.amount"},
            when_not_matched_insert=False,
        )
    assert {r["bal"] for r in t.read().collect()} == {10, 20}
    # valid writes still flow; NULL passes a CHECK (SQL semantics)
    t.merge_upsert(spark.createDataFrame(
        [(3, None)], "k long, bal long"))
    assert t.count() == 3
    # dropping the rule re-opens the gate
    t.drop_constraint("bal_nonneg")
    t.append(spark.createDataFrame([(9, -1)], "k long, bal long"))
    assert t.count() == 4


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    from pypeman_spark.store import ConstraintViolation

    t = _mk(spark, tmp_path, n_buckets=2)
    t.append(spark.createDataFrame(
        [(1, "x"), (2, "")], "k long, val string"))
    with pytest.raises(ConstraintViolation) as e:
        t.add_constraint("nonempty", "length(val) > 0")
    assert e.value.counts == {"nonempty": 1}
    assert t.constraints() == {}
    t.add_constraint("dup", "k > 0")
    with pytest.raises(ValueError):
        t.add_constraint("dup", "k > 0")


def test_constraint_survives_checkpoint_and_conflicts_merges(
    spark, tmp_path
):
    """Constraints must replay from checkpoints, and a constraint
    commit interleaving with a staged merge must force the merge to
    RETRY (non-commuting) and enforce the new rule."""
    from pypeman_spark.store import ConstraintViolation

    t = _mk(spark, tmp_path, checkpoint_interval=2, n_buckets=2)
    t.append(spark.createDataFrame([(1, 5)], "k long, bal long"))
    t.add_constraint("pos", "bal > 0")
    for i in range(3):  # roll past a checkpoint
        t.merge_upsert(spark.createDataFrame(
            [(10 + i, 1)], "k long, bal long"))
    reopened = TxTable(spark, str(tmp_path / "tbl"))
    assert reopened.constraints() == {"pos": "bal > 0"}

    t2 = TxTable(spark, str(tmp_path / "tbl"))
    real_commit = t._commit
    fired = {"done": False}

    def hooked(expected_version, actions, op, buckets, **kw):
        if op == "merge" and not fired["done"]:
            fired["done"] = True
            t2.drop_constraint("pos")
            t2.add_constraint("pos", "bal > 3")  # tighter rule lands first
        return real_commit(expected_version, actions, op, buckets, **kw)

    t._commit = hooked
    with pytest.raises(ConstraintViolation):
        # valid under the OLD rule (bal=1 > 0) but not the new one —
        # the interleaved constraint commit must force re-validation
        t.merge_upsert(spark.createDataFrame(
            [(50, 1)], "k long, bal long"))
    assert fired["done"]


def test_merge_rejects_unknown_target_columns(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="unknown column"):
        t.merge(_df(spark, [(1, "x")]),
                when_matched_update={"nope": "s.val"})
    with pytest.raises(ValueError, match="unknown column"):
        t.merge(_df(spark, [(2, "y")]),
                when_not_matched_insert={"nope": "s.val"})


def test_stream_changes_handles_array_columns(spark, tmp_path):
    """Arrow compute has no vectorized equal for list columns — the
    streaming diff must fall back and still match the batch feed
    exactly (embedding-bearing tables are the norm in this engine)."""
    t = TxTable(spark, str(tmp_path / "tbl"), key_cols=["k"], n_buckets=2)
    t.append(spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0]), (3, None)],
        "k long, emb array<double>"))
    t.merge_upsert(spark.createDataFrame(
        [(2, [9.0, 9.0]), (3, None), (4, [5.0, 5.0])],
        "k long, emb array<double>"))
    _drain(t.stream_changes(), tmp_path, "cdc_arr")
    got = sorted(
        (r["_commit_version"], r["_change_type"], r["k"], tuple(r["emb"] or ()))
        for r in spark.table("cdc_arr").collect()
    )
    want = sorted(
        (r["_commit_version"], r["_change_type"], r["k"], tuple(r["emb"] or ()))
        for r in t.table_changes(0).collect()
    )
    assert got == want
    # k=3 re-merged with identical (null) value: rewrite noise stays out
    assert not any(k == 3 and v == 2 for v, _c, k, _e in got)
    assert any(c == "update_postimage" and k == 2 for _v, c, k, _e in got)


# ---------------------------------------- column rename/drop (mapping) --


def test_rename_column_no_rewrite_and_time_travel(spark, tmp_path):
    """Rename is log-only: zero files change, old files read under the
    new logical name, a pre-rename time travel shows the old name, and
    new writes land under the FIXED physical name (old files and new
    files agree)."""
    t = _mk(spark, tmp_path, n_buckets=2)
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    _v, files_before = t._replay()
    v_pre = t.version()
    t.rename_column("val", "label")
    _v, files_after = t._replay()
    assert files_before.keys() == files_after.keys()  # no rewrite
    assert set(t.read().columns) == {"k", "label"}
    assert {r["label"] for r in t.read().collect()} == {"a", "b"}
    assert set(t.snapshot(version=v_pre).columns) == {"k", "val"}
    # post-rename write joins pre-rename files seamlessly
    t.merge_upsert(spark.createDataFrame(
        [(2, "B2"), (3, "c")], "k long, label string"))
    rows = {r["k"]: r["label"] for r in t.read().collect()}
    assert rows == {1: "a", 2: "B2", 3: "c"}
    # CDC across the rename reads everything under the CURRENT name
    ch = t.table_changes(0)
    assert "label" in ch.columns and "val" not in ch.columns
    assert ch.where("_change_type = 'update_preimage'").first()[
        "label"] == "b"
    # reopen from disk: mapping survives the log round-trip
    assert set(TxTable(spark, str(tmp_path / "tbl")).read().columns) == {
        "k", "label"}


def test_rename_guards(spark, tmp_path):
    t = _mk(spark, tmp_path, n_buckets=2)
    t.append(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="key column"):
        t.rename_column("k", "key2")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("val", "k")
    with pytest.raises(ValueError, match="no such column"):
        t.rename_column("nope", "x")
    t.add_constraint("nonempty", "length(val) > 0")
    with pytest.raises(ValueError, match="constraint"):
        t.rename_column("val", "text")


def test_drop_column_and_no_resurrection(spark, tmp_path):
    """Drop is log-only; re-adding the same logical name via evolution
    must NOT resurrect old bytes — old rows read NULL."""
    t = _mk(spark, tmp_path, n_buckets=2)
    t.append(spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k long, val string, score long"))
    t.drop_column("score")
    assert set(t.read().columns) == {"k", "val"}
    # re-add the same name: schema evolution assigns a fresh physical
    t.merge_upsert(spark.createDataFrame(
        [(3, "c", 99)], "k long, val string, score long"))
    rows = {r["k"]: r["score"] for r in t.read().collect()}
    assert rows == {1: None, 2: None, 3: 99}  # no resurrected 10/20
    # and the feed agrees with the current schema
    assert {r["k"]: r["score"] for r in t.table_changes(
        t.version() - 1).where("_change_type = 'insert'").collect()
    } == {3: 99}


def test_scan_prunes_on_renamed_column(spark, tmp_path):
    """Footer stats are keyed by physical name; scan() must map the
    logical predicate to it — pruning keeps working after a rename."""
    t = _mk(spark, tmp_path, n_buckets=2)
    t.append(spark.createDataFrame(
        [(i, i) for i in range(100)], "k long, price long"))
    t.rename_column("price", "cost")
    t.append(spark.createDataFrame(
        [(i, i) for i in range(1000, 1100)], "k long, cost long"))
    got = t.scan(("cost", "between", (1000, 1050)))
    assert t.last_scan_info["files_read"] < t.last_scan_info["files_live"]
    assert got.count() == 51


def test_stream_changes_across_rename(spark, tmp_path):
    """The streaming CDC source must apply the column mapping: files
    written before the rename surface under the current logical name,
    byte-identical to the batch feed."""
    t = _mk(spark, tmp_path, n_buckets=2)
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    t.rename_column("val", "label")
    t.merge_upsert(spark.createDataFrame(
        [(2, "B2")], "k long, label string"))
    _drain(t.stream_changes(), tmp_path, "cdc_ren")
    got = sorted(
        (r["_commit_version"], r["_change_type"], r["k"], r["label"])
        for r in spark.table("cdc_ren").collect()
    )
    want = sorted(
        (r["_commit_version"], r["_change_type"], r["k"], r["label"])
        for r in t.table_changes(0).collect()
    )
    assert got == want
    assert (1, "insert", 1, "a") in got  # pre-rename file, new name


# ------------------------------------------------- r9 advice fixes --


def test_append_readd_dropped_column_keeps_values(spark, tmp_path):
    """append() must stage under the EVOLVED schema: re-adding a
    dropped column writes its fresh physical name, so the new values
    survive and the old (tombstoned) bytes never resurrect. Pre-fix,
    staging with the pre-evolution schema silently nulled the new
    column for every appended row."""
    t = _mk(spark, tmp_path, n_buckets=2)
    t.append(spark.createDataFrame(
        [(1, "a", 10)], "k long, val string, score long"))
    t.drop_column("score")
    t.append(spark.createDataFrame(
        [(2, "b", 99)], "k long, val string, score long"))
    rows = {r["k"]: r for r in t.read().collect()}
    assert rows[2]["score"] == 99   # appended value survives
    assert rows[1]["score"] is None  # dropped bytes stay dead


def test_append_new_column_named_after_renamed_physical(spark, tmp_path):
    """After rename a->b, appending a df with a NEW column named 'a'
    must not write physical 'a' (which readers map to logical 'b') —
    pre-fix the appended values leaked into the renamed column."""
    t = _mk(spark, tmp_path, n_buckets=2)
    t.append(spark.createDataFrame([(1, "x")], "k long, a string"))
    t.rename_column("a", "b")
    t.append(spark.createDataFrame(
        [(2, "NEWB", "NEWA")], "k long, b string, a string"))
    rows = {r["k"]: r for r in t.read().collect()}
    assert rows[2]["b"] == "NEWB" and rows[2]["a"] == "NEWA"
    assert rows[1]["b"] == "x" and rows[1]["a"] is None


def test_append_restages_after_concurrent_rename(spark, tmp_path):
    """Schema commits are non-commuting for append too: a rename
    landing between staging and commit changes the physical mapping
    the staged files were written under — the retry loop must detect
    the colmap change and restage, not commit stale physicals."""
    t_a = _mk(spark, tmp_path, n_buckets=2)
    t_b = TxTable(spark, str(tmp_path / "tbl"))
    t_a.append(spark.createDataFrame([(1, "old")], "k long, a string"))

    real_commit = t_a._commit
    fired = {"done": False}

    def hooked(expected_version, actions, op, buckets, **kw):
        if op == "append" and not fired["done"]:
            fired["done"] = True
            t_b.rename_column("a", "b")  # claims our version first
        return real_commit(expected_version, actions, op, buckets, **kw)

    t_a._commit = hooked
    t_a.append(spark.createDataFrame([(2, "NEW")], "k long, a string"))
    rows = {r["k"]: r for r in t_a.read().collect()}
    # row 1's value lives under the renamed column; row 2's 'a' is a
    # NEW logical column (fresh physical), not a write into 'b'
    assert rows[1]["b"] == "old" and rows[1]["a"] is None
    assert rows[2]["a"] == "NEW" and rows[2]["b"] is None


def test_snapshot_keeps_schema_after_full_delete(spark, tmp_path):
    """An emptied table still has its committed logical schema —
    snapshot() must agree with table_schema(), not collapse to zero
    columns."""
    t = _mk(spark, tmp_path, n_buckets=2)
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    t.delete_keys(spark.createDataFrame([(1,), (2,)], "k long"))
    snap = t.snapshot()
    assert snap.count() == 0
    assert [f.name for f in snap.schema.fields] == ["k", "val"]
    assert snap.schema == t.table_schema()


# ------------------------------------------- CDC admission control --


def _ckpt_committed_bid(ckpt) -> int:
    """Highest durably committed micro-batch id in a streaming
    checkpoint (Spark's documented ``commits/<bid>`` marker files);
    -1 before the first commit."""
    import glob

    done = [
        int(os.path.basename(p))
        for p in glob.glob(os.path.join(ckpt, "commits", "*"))
        if os.path.basename(p).isdigit()
    ]
    return max(done) if done else -1


def _paced_drain(feed, ckpt, want_rows, timeout_s=420):
    """Run ``feed`` through a processing-time-triggered foreachBatch
    until ``want_rows`` change rows arrived; returns the non-empty
    micro-batches as [(batch_id, [row tuples])]. Generous deadline:
    on a fully loaded host each micro-batch spawns Python data source
    workers and 180 s flaked once — the asserts are on batch SHAPE,
    not latency.

    Replay-tolerant by construction (foreachBatch is at-least-once):
    the sink keys on batch_id, so a within-run retry overwrites
    instead of double-counting; and the loop blocks on the
    checkpoint's ``commits/<bid>`` marker covering the last observed
    batch BEFORE q.stop() — stopping between the sink call and the
    commit-marker write would otherwise replay that batch into the
    NEXT drain from the same checkpoint (this flaked twice in round
    10: the seed batch replayed and the backlog drain saw 21 rows)."""
    import time

    batches: dict = {}

    def sink(batch_df, bid):
        rows = [
            (r["_commit_version"], r["_change_type"], r["k"])
            for r in batch_df.collect()
        ]
        if rows:
            batches[bid] = rows

    q = (feed.writeStream.foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .trigger(processingTime="0 seconds").start())
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if (
            sum(len(r) for r in batches.values()) >= want_rows
            and batches
            and _ckpt_committed_bid(ckpt) >= max(batches)
        ):
            break
        time.sleep(0.5)
    q.stop()
    return sorted(batches.items())


def test_stream_changes_admission_control_paces_backlog(spark, tmp_path):
    """maxCommitsPerTrigger bounds each micro-batch: a consumer
    restarted after 20 commits of downtime drains the backlog in >= 4
    paced micro-batches (5 commits each) instead of one giant one,
    with batch/stream parity and exactly-once intact. The bound is
    relative to the checkpointed resume point — the engine re-plans
    the last WAL batch before the first latestOffset, so the reader
    knows where it stands even though the Python API never passes a
    start offset to latestOffset."""
    t = _mk(spark, tmp_path, n_buckets=2)
    t.append(_df(spark, [(0, "seed")]))
    feed = t.stream_changes(max_commits_per_trigger=5)
    ckpt = str(tmp_path / "ckpt_adm")

    # establish the checkpoint on the seed commit, then go down
    seeded = _paced_drain(feed, ckpt, want_rows=1)
    assert sum(len(r) for _b, r in seeded) == 1

    for i in range(1, 21):  # 20 commits of downtime
        t.append(_df(spark, [(i, f"v{i}")]))

    drained = _paced_drain(feed, ckpt, want_rows=20)
    got = sorted(x for _b, rows in drained for x in rows)
    want = sorted(
        (r["_commit_version"], r["_change_type"], r["k"])
        for r in t.table_changes(t.version() - 20).collect()
    )
    assert got == want and len(got) == 20  # parity + exactly-once
    assert len(drained) >= 4  # paced: never one giant batch
    assert max(len(rows) for _b, rows in drained) <= 5


def test_stream_changes_max_bytes_per_trigger(spark, tmp_path):
    """Bytes-based admission (budget from the log's recorded file
    sizes, zero data IO): a 1-byte budget still admits exactly one
    commit per micro-batch — progress is guaranteed, pacing is
    maximal."""
    t = _mk(spark, tmp_path, n_buckets=2)
    for i in range(6):
        t.append(_df(spark, [(i, f"v{i}")]))
    feed = t.stream_changes(max_bytes_per_trigger=1)
    drained = _paced_drain(
        feed, str(tmp_path / "ckpt_bytes"), want_rows=6)
    assert sum(len(rows) for _b, rows in drained) == 6
    assert all(len(rows) == 1 for _b, rows in drained)


# --------------------------------------- vacuum retention guards --


def test_vacuum_pinned_snapshot_raises_cleanly(spark, tmp_path):
    """Time travel to a vacuumed version must fail DETERMINISTICALLY
    with the protocol error, never return a silent partial snapshot;
    the latest snapshot stays untouched."""
    from pypeman_spark.store.txtable import VacuumedVersionError

    t = _mk(spark, tmp_path, n_buckets=2)
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    t.merge_upsert(_df(spark, [(1, "A2"), (2, "B2")]))
    assert t.vacuum(grace_s=0)  # superseded v1 files reclaimed
    with pytest.raises(VacuumedVersionError, match="vacuumed"):
        t.snapshot(version=1)
    with pytest.raises(VacuumedVersionError, match="vacuumed"):
        t.scan(("k", ">=", 0), version=1)
    with pytest.raises(VacuumedVersionError, match="vacuumed"):
        t.table_changes(0)  # feed range needs the deleted preimages
    assert {r["val"] for r in t.read().collect()} == {"A2", "B2"}


def test_vacuum_refuses_under_mid_drain_stream(spark, tmp_path):
    """A streaming CDC consumer that died mid-drain (committed through
    the insert commit, not yet the merge) pins vacuum: the merge's
    preimage files survive a grace_s=0 vacuum, the restarted stream
    finishes with correct preimages, and only once the consumer has
    caught up does vacuum reclaim them."""
    import time as _time

    t = _mk(spark, tmp_path, n_buckets=2)
    t.append(_df(spark, [(1, "a"), (2, "b")]))        # v1: inserts
    t.merge_upsert(_df(spark, [(2, "B2")]))           # v2: removes v1 file
    feed = t.stream_changes(max_commits_per_trigger=1)
    ckpt = str(tmp_path / "ckpt_vac")

    def dying_sink(bdf, bid):
        rows = bdf.collect()
        if rows and max(r["_commit_version"] for r in rows) >= 2:
            raise RuntimeError("die before consuming the merge")

    q = (feed.writeStream.foreachBatch(dying_sink)
         .option("checkpointLocation", ckpt)
         .trigger(processingTime="0 seconds").start())
    deadline = _time.time() + 120
    while q.isActive and _time.time() < deadline:
        _time.sleep(0.5)
    assert not q.isActive  # died mid-drain, marker committed at v1

    # the merge's preimage is still needed by the lagging consumer
    assert t.vacuum(grace_s=0) == []

    # restarted consumer finishes the drain with preimages intact;
    # wait until its progress marker reaches the head (the reader's
    # commit() call trails the sink's rows) before stopping
    def _min_marker():
        mdir = os.path.join(t.path, "_consumers")
        try:
            ns = [n for n in os.listdir(mdir) if n.endswith(".json")]
            return min(
                int(json.load(open(os.path.join(mdir, n)))["version"])
                for n in ns
            ) if ns else -1
        except (OSError, ValueError):
            return -1

    got = []

    def sink2(bdf, bid):
        got.extend(
            (r["_commit_version"], r["_change_type"], r["k"])
            for r in bdf.collect()
        )

    q = (feed.writeStream.foreachBatch(sink2)
         .option("checkpointLocation", ckpt)
         .trigger(processingTime="0 seconds").start())
    deadline = _time.time() + 120
    while _time.time() < deadline and len(got) < 2:
        _time.sleep(0.3)
    assert sorted(got) == [
        (2, "update_postimage", 2), (2, "update_preimage", 2)]

    # an idle consumer stays pinned one batch behind (its commit()
    # only fires when the NEXT batch is planned) — a new commit
    # advances the marker past the merge
    t.append(_df(spark, [(9, "z")]))  # v3
    while _time.time() < deadline and (len(got) < 3 or _min_marker() < 2):
        _time.sleep(0.3)
    q.stop()
    assert (3, "insert", 9) in got

    # caught up past the merge: vacuum may reclaim its preimages now
    assert t.vacuum(grace_s=0)
