"""Parquet table loader for the test corpus (and any parquet dir).

Handles a real-world ingestion wart: parquet files written with
``TIMESTAMP(NANOS)`` (pandas/pyarrow default) are rejected by Spark's
vectorized reader unless ``spark.sql.legacy.parquet.nanosAsLong=true``,
and then surface as LongType nanoseconds. We inspect the parquet footer
with pyarrow (driver-side, metadata only — no data read) and convert
those columns back to proper ``TimestampType`` via ``timestamp_micros``,
so every downstream operator sees real event-time columns.

The conversion is a cheap JVM-side projection; predicate pushdown on the
underlying int64 column still works (Catalyst pushes comparisons through
the cast at the literal level after we pre-convert filters, and at worst
the scan prunes row groups by min/max stats on the raw int64).
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

__all__ = [
    "load_table", "load_tables", "register_views", "TABLES",
    "clear_metadata_caches",
]


def clear_metadata_caches() -> None:
    """Drop the footer-metadata caches. Call after REWRITING a table
    directory in-process (e.g. ``tools/scale_dataset.py``): the
    lru_caches key on path only, so a rewritten layout would otherwise
    serve stale schema/row-group stats."""
    _nanos_ts_columns.cache_clear()
    _parquet_chunk_stats.cache_clear()
    _df_cache.clear()


# Loaded-table PLAN cache: ``spark.read.parquet`` re-infers the schema
# from the footers on every call (~0.15 s of JVM work + py4j chatter
# per call), and query fns load the same table up to six times while
# BUILDING one plan. A DataFrame is an immutable logical plan, so
# handing the same object out again is semantically identical — this
# caches no data and nothing about query RESULTS. Keyed per session
# object (a new session invalidates everything); cleared alongside the
# footer caches above.
_df_cache: dict = {}
_df_cache_session: "list" = [None]


def _parquet_parts(path: str) -> list[str]:
    """The parquet data files behind ``path``: the file itself, or a
    directory layout's ``*.parquet`` parts (Spark writer output with
    ``_SUCCESS`` markers skipped). Real tables are directories of many
    files, not the single-file layout of the test corpus — every
    footer inspection below must handle both."""
    if not os.path.isdir(path):
        return [path]
    return sorted(
        os.path.join(path, n)
        for n in os.listdir(path)
        if n.endswith(".parquet")
    )


@lru_cache(maxsize=256)
def _nanos_ts_columns(path: str) -> tuple[str, ...]:
    """Column names stored as timestamp[ns] in the parquet footer."""
    import pyarrow.parquet as pq

    # union over EVERY part's footer: evolved directory layouts can
    # carry a timestamp[ns] column only in later parts (or mix
    # writers). pyarrow.dataset's default schema inference reads only
    # the first fragment, so walk each footer explicitly — this is
    # metadata-only, no data read.
    out: list[str] = []
    seen: set[str] = set()
    for part in _parquet_parts(path):
        for field in pq.read_schema(part):
            name = field.name
            if name in seen:
                continue
            if str(field.type).startswith("timestamp[ns"):
                seen.add(name)
                out.append(name)
    return tuple(out)


@lru_cache(maxsize=256)
def _parquet_chunk_stats(path: str) -> tuple[int, int]:
    """(num_row_groups, num_rows) summed over the layout's data files —
    metadata only, no data read."""
    import pyarrow.parquet as pq

    groups = rows = 0
    for part in _parquet_parts(path):
        md = pq.ParquetFile(part).metadata
        groups += md.num_row_groups
        rows += md.num_rows
    return groups, rows


def _ensure_runtime_confs(spark: SparkSession) -> None:
    """Make query plans correct in ANY SparkSession, not just ours.

    Callers (e.g. an external harness) may hand us a session built
    without the confs `session.get_spark` sets at build time. The ones
    correctness depends on are all runtime-settable, so set them here:

    * ``nanosAsLong`` — without it the vectorized reader rejects the
      TIMESTAMP(NANOS) testdata parquet outright (PARQUET_TYPE_ILLEGAL).
    * ``session.timeZone=UTC`` — timestamp→date/string derivations must
      match the UTC-naive DuckDB oracle regardless of host timezone.
    * ``mapKeyDedupPolicy=LAST_WIN`` — ctx snapshot overwrite semantics
      (Message.add_context) rely on map_concat keeping the last key.
    """
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.mapKeyDedupPolicy", "LAST_WIN"),
        # unadjusted parquet TIMESTAMP (micros/millis) must read as
        # TimestampType, not TIMESTAMP_NTZ — watermarks and epoch ops
        # reject NTZ; identical instants under the UTC session tz.
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf locked down (e.g. shared cluster) — keep going


def load_table(
    spark: SparkSession, sf_dir: str, name: str, parallelize: bool = False
) -> DataFrame:
    """Load one corpus table.

    ``parallelize=True`` — for compute-bound consumers (explode-heavy
    shingling, Arrow UDF batches): if the file has fewer row groups than
    the session's parallelism (parquet can't split inside a row group,
    so such a scan — and everything codegen-fused into it — runs on that
    few cores), repartition to spread the downstream compute. On a real
    multi-file / many-row-group layout the condition is false and this
    is a no-op, so plans at scale stay shuffle-minimal; tiny dims are
    excluded by the row-count floor.
    """
    if _df_cache_session[0] is not spark:
        _df_cache.clear()
        _df_cache_session[0] = spark
    cache_key = (os.path.abspath(os.path.join(sf_dir, f"{name}.parquet")),
                 bool(parallelize))
    cached = _df_cache.get(cache_key)
    if cached is not None:
        return cached
    _ensure_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    dtypes = dict(df.dtypes)
    for col in _nanos_ts_columns(path):
        # long nanos -> micros -> TimestampType. Integer DIV, not `/`:
        # epoch-nanos (~1.7e18) exceed double's 2^53 exact range, so a
        # float division silently corrupts the low microseconds.
        # Guard on the READ dtype: pyarrow also reports legacy INT96
        # timestamps as timestamp[ns], but Spark reads those as proper
        # TIMESTAMP already — only int64-nanos columns (read as bigint
        # under nanosAsLong) need the conversion.
        if dtypes.get(col) != "bigint":
            continue
        df = df.withColumn(
            col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
        )
    # Belt-and-braces for sessions where inferTimestampNTZ couldn't be
    # set (locked conf): normalize any TIMESTAMP_NTZ column to
    # TimestampType. Identity under the pinned UTC session timezone, and
    # a no-op projection when the scan-level conf already applied.
    from pyspark.sql.types import TimestampNTZType

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    if ntz:
        # The cast below is only an identity when the session renders
        # NTZ wall-clocks in UTC. session.timeZone is a runtime conf so
        # _ensure_runtime_confs normally guarantees this — but if even
        # that failed (fully locked session), the cast would SHIFT
        # instants; surface that loudly instead of corrupting silently.
        tz = spark.conf.get("spark.sql.session.timeZone", "")
        if tz not in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
            import warnings

            warnings.warn(
                f"load_table: session timeZone is {tz!r}, not UTC; "
                f"TIMESTAMP_NTZ columns {ntz} will be interpreted as "
                f"{tz!r} wall-clock and their instants shifted. Set "
                "spark.sql.session.timeZone=UTC (it is a runtime conf).",
                stacklevel=2,
            )
    for col in ntz:
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    if parallelize:
        cores = spark.sparkContext.defaultParallelism
        row_groups, rows = _parquet_chunk_stats(path)
        if row_groups < cores and rows >= 2048:
            df = df.repartition(cores)
    _df_cache[cache_key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Register each table as a temp view for the SQL surface."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    path: str,
    buckets: int = 32,
) -> None:
    """Persist ``df`` hash-bucketed (and sorted) by ``key``.

    Co-location strategy for repeated big-big joins (SURVEY "Partitioning
    & shuffle"): two tables bucketed on the same key with the same bucket
    count join with ZERO exchange — at 100 TB that removes the dominant
    shuffle of lineitem⋈orders-class queries entirely. Registered as an
    external table so the files live at ``path``, not in the warehouse.
    """
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(table)
    )
