"""Data-layout optimization: Z-order (Morton) clustering.

Parquet scans prune row groups / files by min-max statistics. Sorting by
a single key gives perfect pruning on that key and none on any other;
interleaving the bits of two keys (the Morton curve) keeps BOTH keys
locally clustered, so range predicates on either column skip most of the
data. This is the same layout trick behind ``OPTIMIZE ZORDER BY`` in
lakehouse engines, expressed here as a pure column expression + a
repartition/sort — no engine extension needed.

``zvalue`` is deliberately engine-portable (shift/and/or on int64), so
the DuckDB oracle computes bit-identical values; ``zorder_sort`` applies
the layout for writing (range-partition on the z-value so files tile the
curve, then sort within partitions so row groups tile it too).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "zvalue",
    "zvalue_sql",
    "zorder_sort",
    "write_training_shards",
    "compact_parquet",
]


def zvalue(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative
    integer columns: bit i of ``a`` lands at position 2i, bit i of ``b``
    at 2i+1. A 2*bits-bit z-value as LongType. The expression is a flat
    OR tree — whole-stage codegen compiles it to straight-line JVM
    bit math."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1).cast("long"))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1).cast("long"))
        z = z.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return z


def zvalue_sql(a: str, b: str, bits: int = 16) -> str:
    """The same Morton interleave as ANSI-ish SQL text (DuckDB-ready) —
    used by the registry oracle to prove ``zvalue`` engine-portable."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_sort(
    df: DataFrame, a: str, b: str, bits: int = 16, partitions: int | None = None
) -> DataFrame:
    """Return ``df`` laid out along the Morton curve of (a, b): range-
    partitioned on the z-value (files tile disjoint curve segments) and
    sorted within partitions (row groups tile it too). Write the result
    with plain ``df.write.parquet`` and scans filtered on EITHER column
    prune most files via min-max stats."""
    z = zvalue(F.col(a), F.col(b), bits).alias("__z")
    out = df.withColumn("__z", z)
    out = (
        out.repartitionByRange(partitions, "__z")
        if partitions
        else out.repartitionByRange("__z")
    )
    return out.sortWithinPartitions("__z").drop("__z")


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str,
    salt: str = "",
    fmt: str = "parquet",
) -> None:
    """Write the finished corpus as deterministic training shards.

    The last step of a corpus build: fix a global, reproducible document
    order and cut it into ``n_shards`` equal-expectation pieces that a
    data loader can stream independently. Shard assignment is the same
    content-addressed hash as `functions.sampling` (``shard =
    hash_bucket % n_shards``) so re-running the build — on any cluster
    size, any input partitioning — produces byte-identical shard
    membership; within a shard, rows are sorted by (bucket, id), which
    doubles as the corpus-level deterministic shuffle (hash order is
    uncorrelated with source order, so each shard is already "mixed").

    One exchange total: ``repartition(n_shards, shard)`` then a
    sort-within-partition (no global sort). Output directories are
    ``shard=K/`` via ``partitionBy``, the layout every loader
    understands.
    """
    from .sampling import hash_bucket

    bucket = hash_bucket(F.col(id_col), salt)
    out = (
        df.withColumn("__bucket", bucket)
        .withColumn("shard", (F.col("__bucket") % n_shards).cast("int"))
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "__bucket", id_col)
        .drop("__bucket")
    )
    out.write.mode("overwrite").partitionBy("shard").format(fmt).save(path)


def compact_parquet(
    spark,
    path: str,
    out_path: str,
    target_mb: int = 256,
    sort_within_by: list[str] | None = None,
) -> int:
    """Compact a small-files parquet directory into ``out_path`` with
    file sizes near ``target_mb``. Returns the output partition count.

    The small-files problem is a first-order 100 TB cost: a directory
    of 100k × 1 MB files pays 100k opens + footer reads per scan and
    drowns the driver in listing; the fix is periodic compaction to
    ~128-512 MB files. The output partition count is sized from the
    ACTUAL input bytes (not a guess), and ``sort_within_by`` optionally
    re-sorts rows within each output file so min-max stats stay tight
    after the rewrite (pair with :func:`zorder_sort` ordering for
    two-column locality).

    Writes to ``out_path`` (never in place — an in-place rewrite that
    fails mid-write loses data); swap directories atomically in the
    metastore/catalog layer above."""
    import math

    df = spark.read.parquet(path)
    files = df.inputFiles()
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jvm = spark.sparkContext._jvm
    total = 0
    for f in files:
        p = jvm.org.apache.hadoop.fs.Path(f)
        total += p.getFileSystem(hconf).getFileStatus(p).getLen()
    n_out = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    out = df.repartition(n_out)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    out.write.mode("overwrite").parquet(out_path)
    return n_out
