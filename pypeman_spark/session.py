"""SparkSession factory tuned for the engine.

Local defaults target the test harness (``local[$SPARK_GRAFT_CPUS]``);
on a real cluster callers pass their own master/conf. Every knob here is
scale-motivated:

* AQE on — runtime coalescing + skew-join handling replaces hand-tuned
  shuffle partitioning at 100 TB.
* ``spark.sql.shuffle.partitions`` ~ cores locally; AQE re-coalesces, so
  on a cluster a high initial value (e.g. 2000) is safe.
* Arrow on — every pandas UDF path (HL7/XML parsing, minhash, ANN) is
  Arrow-batched, never row-at-a-time.
* UTC session timezone — parquet timestamps compare identically across
  engines (the duckdb oracle is UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark"]


def get_spark(
    app_name: str = "pypeman_spark",
    master: str | None = None,
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        # SPARK_GRAFT_MASTER lets the harness swap execution topology
        # without code changes — e.g. "local-cluster[2,16,8192]" for a
        # true multi-JVM run (real serialization, network shuffle,
        # per-executor Python workers) that local[N] can't exercise
        master = os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # PySpark's DataFrame-debugging hook (on by default) pays up to
        # THREE extra py4j round-trips per DataFrame API call (conf
        # read + PySparkCurrentOrigin.set/clear) plus a Python
        # traceback walk, just to enrich error messages with the user
        # call site. On plan-construction-heavy queries that is the
        # majority of all driver→JVM chatter (measured: a three-arm
        # TPC-H suite built in 0.6 s instead of 1.9 s). Errors still
        # carry the full Python traceback; only the [DATAFRAME_CONTEXT]
        # decoration is lost — the right production trade.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # ctx snapshots overwrite same-named keys (Message.add_context semantics)
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # testdata parquet carries TIMESTAMP(NANOS); read as long, the
        # table loader converts back to TimestampType (sources/tables.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # parquet TIMESTAMP(MICROS/MILLIS, isAdjustedToUTC=false) must
        # surface as TimestampType, not TIMESTAMP_NTZ: event-time ops
        # (withWatermark, unix_micros, epoch casts) reject NTZ, and under
        # the pinned UTC session the two types denote the same instant.
        # Done at scan level (vs a cast in the plan) so pushdown/stats
        # on the timestamp column are untouched.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if not master.startswith("local["):
        _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship pypeman_spark to executor Python workers (addPyFile zip).

    ``local[N]`` executors share the driver process, so the driver's
    sys.path covers them and module-level UDF functions (pickled BY
    REFERENCE, e.g. the multimodal codecs) import fine. Any multi-JVM
    master — ``local-cluster[...]`` or a real cluster — spawns
    separate executor Python workers that need the package on their
    path; without this, exactly the entries whose UDFs live at module
    level die with ModuleNotFoundError (caught by the r7 local-cluster
    run — invisible under local[32]). A real deployment ships a wheel
    via --py-files; this is the programmatic equivalent. The zip is
    content-hashed so a changed source tree re-ships."""
    import hashlib
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_dir)
    sources = sorted(
        os.path.join(dp, f)
        for dp, _dn, fns in os.walk(pkg_dir)
        for f in fns
        if f.endswith(".py")
    )
    h = hashlib.md5()
    for src in sources:
        h.update(src.encode())
        with open(src, "rb") as fh:
            h.update(fh.read())
    # per-user 0700 cache dir, never the shared /tmp root: the hash is
    # computable from the readable source tree, so a world-writable
    # predictable path would let another local user pre-plant a zip
    # that addPyFile ships to every executor (arbitrary code execution)
    cache_dir = os.path.join(
        tempfile.gettempdir(), f"pypeman_spark_pyfiles_{os.getuid()}"
    )
    os.makedirs(cache_dir, mode=0o700, exist_ok=True)
    st = os.stat(cache_dir)
    if st.st_uid != os.getuid() or (st.st_mode & 0o077):
        raise RuntimeError(
            f"refusing to ship executor zip via {cache_dir}: directory "
            "is not exclusively ours (pre-created by another user?)"
        )
    zip_path = os.path.join(cache_dir, f"pypeman_spark_{h.hexdigest()[:12]}.zip")

    def _zip_content_hash(path: str) -> str:
        hz = hashlib.md5()
        with zipfile.ZipFile(path) as zf:
            for name in sorted(zf.namelist()):
                hz.update(name.encode())
                hz.update(zf.read(name))
        return hz.hexdigest()

    def _tree_content_hash() -> str:
        ht = hashlib.md5()
        for src in sources:
            ht.update(os.path.relpath(src, parent).encode())
            with open(src, "rb") as fh:
                ht.update(fh.read())
        return ht.hexdigest()

    # trust an existing file only after re-verifying its CONTENT
    # matches the source tree (belt to the 0700-dir braces)
    fresh = True
    if os.path.exists(zip_path):
        try:
            fresh = _zip_content_hash(zip_path) != _tree_content_hash()
        except (OSError, zipfile.BadZipFile):
            fresh = True
    if fresh:
        tmp = zip_path + f".tmp{os.getpid()}"
        with zipfile.ZipFile(tmp, "w") as zf:
            for src in sources:
                zf.write(src, os.path.relpath(src, parent))
        os.replace(tmp, zip_path)
    spark.sparkContext.addPyFile(zip_path)


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
