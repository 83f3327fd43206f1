"""Regression tests pinning the exact round-6 ADVICE failure modes.

Each test reproduces the precise input the advisor showed would have
gone wrong under the pre-fix code, so a future refactor that
reintroduces the hazard fails here rather than in a downstream gate:

- leakage_safe_splits: float cumulative boundaries put hash bucket
  899999 in the wrong split for weights 0.7/0.2/0.1
  (0.7 + 0.2 == 0.8999999999999999 -> int() truncates to 899999).
- quality uniqueness keys: the old string encoding aliased tuples
  whose values contain the delimiter sequence.
- cohort_retention: seconds/604800 arithmetic under a DST timezone
  merged the week after spring-forward into the cohort week.
- _nanos_ts_columns: inspecting only parts[0]'s footer missed
  timestamp[ns] columns present only in later parts of a directory
  layout, and the lru_cache served stale schemas after a rewrite.
"""

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


def _py_bucket(value: str, salt: str = "split") -> int:
    """Pure-Python twin of sampling.hash_bucket for test oracles."""
    h = hashlib.md5(f"{salt}:{value}".encode()).hexdigest()
    return int(h[:8], 16) % 1_000_000


def _id_with_bucket(target: int, salt: str = "split") -> str:
    for i in range(5_000_000):
        cand = f"c{i}"
        if _py_bucket(cand, salt) == target:
            return cand
    raise AssertionError(f"no id found for bucket {target}")


def test_splits_integer_boundaries_bucket_899999(spark):
    """Weights 0.7/0.2/0.1: bucket 899999 belongs to 'val' (boundary
    900000 exactly). The pre-fix float cumsum computed the val/test
    boundary as 899999, sending this bucket to 'test'."""
    from pypeman_spark.functions.sampling import leakage_safe_splits

    edge_id = _id_with_bucket(899_999)
    below_id = _id_with_bucket(699_999)   # last 'train' bucket
    first_val = _id_with_bucket(700_000)  # first 'val' bucket
    first_test = _id_with_bucket(900_000)
    df = spark.createDataFrame(
        [(edge_id,), (below_id,), (first_val,), (first_test,)],
        "cluster_id string",
    )
    got = {
        r["cluster_id"]: r["split"]
        for r in leakage_safe_splits(
            df, "cluster_id", {"train": 0.7, "val": 0.2, "test": 0.1}
        ).collect()
    }
    assert got[edge_id] == "val"
    assert got[below_id] == "train"
    assert got[first_val] == "val"
    assert got[first_test] == "test"


def test_unique_key_delimiter_values_do_not_alias(spark):
    """('a\\x00\\x01Vb','c') and ('a','b\\x00\\x01Vc') are distinct
    tuples; the old string-encoded key collapsed them into one."""
    from pypeman_spark.functions import quality as Q

    df = spark.createDataFrame(
        [("a\x00\x01Vb", "c"), ("a", "b\x00\x01Vc")], "x string, y string"
    )
    report = {
        r["rule"]: r["n_violations"]
        for r in Q.check(df, {}, unique=[("x", "y")]).collect()
    }
    assert report["unique(x,y)"] == 0

    flagged = Q.flag_violations(df, {}, unique=[("x", "y")]).collect()
    assert all(not r["violations"] for r in flagged)

    # true duplicates (including NULL-bearing tuples) still count
    df2 = spark.createDataFrame(
        [("a", None), ("a", None), ("b", "c")], "x string, y string"
    )
    report2 = {
        r["rule"]: r["n_violations"]
        for r in Q.check(df2, {}, unique=[("x", "y")]).collect()
    }
    assert report2["unique(x,y)"] == 1


def test_cohort_retention_dst_spring_forward(spark):
    """Under America/New_York, the week starting 2021-03-15 is 601200 s
    after the 2021-03-08 cohort week (spring-forward 2021-03-14).
    Seconds/604800 truncation yielded offset 0, merging the two weeks;
    the datediff form must report offset 1."""
    from pypeman_spark.functions.stats import cohort_retention

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = spark.createDataFrame(
            [("u1", "2021-03-08 12:00:00"), ("u1", "2021-03-15 12:00:00")],
            "user_id string, ts_s string",
        ).select("user_id", F.to_timestamp("ts_s").alias("ts"))
        rows = {
            (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
            for r in cohort_retention(df, "user_id", "ts").collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
    assert rows == {
        ("2021-03-08", 0): 1,
        ("2021-03-08", 1): 1,
    }


def test_nanos_columns_unified_over_all_parts(tmp_path):
    """A directory layout whose timestamp[ns] column appears only in a
    later part must still be detected, and clear_metadata_caches()
    must drop the footer cache after an in-process rewrite."""
    from pypeman_spark.sources.tables import (
        _nanos_ts_columns,
        clear_metadata_caches,
    )

    d = str(tmp_path / "t.parquet")
    os.makedirs(d)
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int64())}),
        os.path.join(d, "part-000.parquet"),
    )
    clear_metadata_caches()
    assert _nanos_ts_columns(d) == ()

    # rewrite in-process: add a part carrying an int64-nanos column
    pq.write_table(
        pa.table(
            {
                "id": pa.array([3], pa.int64()),
                "ts": pa.array([1_700_000_000_000_000_000], pa.timestamp("ns")),
            }
        ),
        os.path.join(d, "part-001.parquet"),
    )
    # stale without the cache clear...
    assert _nanos_ts_columns(d) == ()
    clear_metadata_caches()
    # ...and unified over EVERY part after it
    assert _nanos_ts_columns(d) == ("ts",)
