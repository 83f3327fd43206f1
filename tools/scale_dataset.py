#!/usr/bin/env python
"""Synthesize a 10x-scale dataset from sf0.1 (VERDICT r5 #1).

Every scale claim above sf0.1 was an argument, not a measurement; this
tool builds a local "sf1" (10x fact volume) so the headline list can
be RUN at 10x and plan-shape changes observed (AQE join flips,
super-linear queries).

Scaling model — facts replicate 10x with disjoint key ranges, dims
stay fixed (the fact:dim ratio grows, as it does in real warehouses):

* orders / lineitem: copy i gets ``l_orderkey/o_orderkey + i*1e7`` so
  the FK stays consistent; o_custkey unchanged (each customer now owns
  10x orders).
* events: ``event_id + i*1e7``, ``user_id + i*1e6`` — distinct users
  scale 10x; self-joins (sessions, as-of, funnels) stay per-user-sized.
* documents / embeddings: ``doc_id/vec_id + i*1e6``; text/vectors
  verbatim. Entries that slice ``doc_id < 200/400`` keep their bounded
  slices (originals only); full-corpus dedup sees each doc in a
  10-copy duplicate group — collisions stay bucket-local, so candidate
  volume grows ~linearly (45 within-group pairs per original doc).
* region/nation/customer/supplier/part: file-copied verbatim.

Deterministic (pure key arithmetic, no RNG). Output dir defaults to
/tmp/pypeman_scale_sf1; pass a path to override. Writes each table as
parquet with sensible partition counts for a 32-core local run.

Usage: python tools/scale_dataset.py [out_dir] [copies]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pypeman_spark.session import get_spark  # noqa: E402
from pypeman_spark.sources.tables import (  # noqa: E402
    clear_metadata_caches,
    load_table,
)

SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pypeman_scale_sf1"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10

DIMS = ["region", "nation", "customer", "supplier", "part"]
ORD_OFF = 10_000_000
EV_OFF = 10_000_000
USER_OFF = 1_000_000
DOC_OFF = 1_000_000


def replicate(df, shifts):
    """Union COPIES copies, adding copy_idx * offset to each id col."""
    out = None
    for i in range(COPIES):
        c = df
        for col, off in shifts.items():
            c = c.withColumn(col, F.col(col) + F.lit(i * off))
        out = c if out is None else out.unionByName(c)
    return out


def main() -> int:
    spark = get_spark(
        "scale_dataset", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    # write standard us timestamps, not legacy INT96 (pyarrow reports
    # INT96 as timestamp[ns], which load_table's nanos detection would
    # otherwise have to special-case)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    os.makedirs(OUT, exist_ok=True)
    for name in DIMS:
        src = os.path.join(SRC, f"{name}.parquet")
        dst = os.path.join(OUT, f"{name}.parquet")
        if os.path.isdir(src):  # directory layout (e.g. chained output)
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy(src, dst)
        print(f"copied {name}")

    # timestamps are loaded as proper TimestampType by load_table and
    # re-written as standard INT96-free us timestamps — downstream
    # load_table reads them natively
    jobs = {
        "orders": ({"o_orderkey": ORD_OFF}, 16),
        "lineitem": ({"l_orderkey": ORD_OFF}, 32),
        "events": ({"event_id": EV_OFF, "user_id": USER_OFF}, 16),
        "documents": ({"doc_id": DOC_OFF}, 16),
        "embeddings": ({"vec_id": DOC_OFF}, 16),
    }
    for name, (shifts, parts) in jobs.items():
        src = load_table(spark, SRC, name)
        # layout fidelity: the driver's parquet stores timestamps
        # UNADJUSTED (naive) — DuckDB reads them as plain TIMESTAMP.
        # A TimestampType write would mark isAdjustedToUTC=true and
        # DuckDB would surface TIMESTAMPTZ ("+00:00" in every string
        # form), hash-breaking any oracle that prints a timestamp.
        # Casting to timestamp_ntz writes naive micros; load_table
        # reads those back as TimestampType (inferTimestampNTZ off,
        # UTC session) — identical instants, identical strings.
        from pyspark.sql.types import TimestampType

        for f in src.schema.fields:
            if isinstance(f.dataType, TimestampType):
                src = src.withColumn(
                    f.name, F.col(f.name).cast("timestamp_ntz")
                )
        out = replicate(src, shifts).repartition(parts)
        dest = os.path.join(OUT, f"{name}.parquet")
        tmp = dest + ".dir"
        out.write.mode("overwrite").parquet(tmp)
        # keep the multi-file directory layout — that IS the realistic
        # shape (load_table handles both layouts since r6)
        if os.path.exists(dest):
            shutil.rmtree(dest, ignore_errors=True)
        os.replace(tmp, dest)
        # the footer caches key on path only — a rewritten layout
        # would otherwise serve stale schema/row-group stats in-process
        clear_metadata_caches()
        n = spark.read.parquet(dest).count()
        print(f"wrote {name}: {n} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
