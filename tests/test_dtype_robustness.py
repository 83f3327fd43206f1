"""Timestamp-flavor robustness: the corpus parquet's physical event-time
type has drifted between data regenerations (TIMESTAMP(NANOS) →
TIMESTAMP(MICROS, unadjusted)), breaking event-time queries both times.
This test synthesizes every flavor of the time-bearing tables at sf0.001
and asserts that plan analysis succeeds for every registry query that
touches event time, under each flavor:

* ``ns``      — timestamp[ns]            (nanosAsLong long shim path)
* ``us_ntz``  — timestamp[us], no tz     (TIMESTAMP_NTZ normalize path)
* ``us_utc``  — timestamp[us, tz=UTC]    (native TimestampType path)
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import pypeman_spark.plans.coverage_queries  # noqa: F401 — registers entries
import pypeman_spark.plans.scale_queries  # noqa: F401 — registers entries
from pypeman_spark.plans.queries import REGISTRY
from pypeman_spark.sources.tables import TABLES, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

# tables that carry a time column the corpus has regenerated with
# different physical types across rounds
TIME_TABLES = {"events": "ts", "orders": "o_orderdate", "lineitem": "l_shipdate"}

FLAVORS = {
    "ns": pa.timestamp("ns"),
    "us_ntz": pa.timestamp("us"),
    "us_utc": pa.timestamp("us", tz="UTC"),
}

# queries that execute eagerly inside fn() (streaming drains / file
# round-trips) — covered once under the current-reality flavor by
# tools/check_correctness.py; here we only need cheap plan analysis,
# but these four ARE the historical breakage class, so keep them and
# accept a few seconds each at sf0.001.
STREAMING = {
    # r8 fold: carries the sess + wc + ijoin arms (all five stateful
    # streaming operators) under the one composed entry
    "streaming_dedup_session_rollup",
}


def _variant_dir(tmp_root: str, flavor: str) -> str:
    """sf0.001 with the time tables rewritten in the given flavor."""
    out = os.path.join(tmp_root, flavor)
    os.makedirs(out, exist_ok=True)
    for name in TABLES:
        src = os.path.join(SF_DIR, f"{name}.parquet")
        dst = os.path.join(out, f"{name}.parquet")
        if name not in TIME_TABLES:
            os.symlink(src, dst)
            continue
        tbl = pq.read_table(src)
        col = TIME_TABLES[name]
        i = tbl.schema.get_field_index(col)
        target = FLAVORS[flavor]
        cast = tbl.set_column(
            i, pa.field(col, target), tbl.column(i).cast(target)
        )
        pq.write_table(cast, dst, version="2.6", coerce_timestamps=None)
    return out


@pytest.fixture(scope="module")
def variant_dirs(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dtype_variants"))
    dirs = {f: _variant_dir(root, f) for f in FLAVORS}
    yield dirs
    shutil.rmtree(root, ignore_errors=True)


@pytest.mark.parametrize("flavor", list(FLAVORS))
def test_time_tables_load_as_timestamp(spark, variant_dirs, flavor):
    """Every flavor must surface as plain TimestampType from load_table."""
    for name, col in TIME_TABLES.items():
        df = load_table(spark, variant_dirs[flavor], name)
        assert df.schema[col].dataType.typeName() == "timestamp", (
            f"{flavor}/{name}.{col} -> {df.schema[col].dataType}"
        )


def _analyzes(spark, sf_dir: str, name: str) -> None:
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    _ = df.schema  # forces analysis; AnalysisException = regression


@pytest.mark.parametrize("flavor", list(FLAVORS))
def test_event_time_queries_analyze(spark, variant_dirs, flavor):
    """Plan analysis must succeed for the event-time query surface under
    every timestamp flavor the corpus has ever shipped."""
    failures = []
    for name in sorted(REGISTRY):
        if name in STREAMING:
            continue
        try:
            _analyzes(spark, variant_dirs[flavor], name)
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not failures, f"[{flavor}] {len(failures)} broken:\n" + "\n".join(
        failures[:10]
    )


@pytest.mark.parametrize("flavor", ["ns", "us_ntz"])
def test_streaming_queries_run(spark, variant_dirs, flavor):
    """The four streaming drains — the historical breakage class — must
    actually run (not just analyze) under the non-native flavors."""
    for name in sorted(STREAMING):
        df = REGISTRY[name].fn(spark, variant_dirs[flavor])
        assert df.count() >= 0, name


def test_ensure_message_columns_ntz_scoping(spark):
    """coerce_ntz: True = blanket (default), list = only those columns,
    False = keep every NTZ flavor untouched."""
    from datetime import datetime

    from pypeman_spark.message import ensure_message_columns

    df = spark.createDataFrame(
        [("{}", datetime(2024, 1, 1), datetime(2024, 1, 2))],
        "payload string, ev_time timestamp_ntz, audit_time timestamp_ntz",
    )
    blanket = dict(ensure_message_columns(df).dtypes)
    assert blanket["ev_time"] == "timestamp"
    assert blanket["audit_time"] == "timestamp"

    scoped = dict(ensure_message_columns(df, coerce_ntz=["ev_time"]).dtypes)
    assert scoped["ev_time"] == "timestamp"
    assert scoped["audit_time"] == "timestamp_ntz"

    off = dict(ensure_message_columns(df, coerce_ntz=False).dtypes)
    assert off["ev_time"] == off["audit_time"] == "timestamp_ntz"
