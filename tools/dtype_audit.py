#!/usr/bin/env python
"""Audit driver-canonicalizer compatibility for every registry query.

The driver compares Spark and DuckDB results through a pandas
canonicalizer that (a) cannot sort list/dict cells and (b) formats
values dtype-sensitively — an int64 column vs a float64 column with
identical values still hash-mismatches (round-1 ``simhash_sketch``).
The plain value-hash in ``check_correctness.py`` is blind to both, so
this audit closes the gap:

* flags any Spark output column of Array/Map/Struct type;
* collects one row from Spark and DuckDB per query and flags columns
  whose Python type class differs (int vs float vs str vs bool vs
  date/datetime vs bytes).

Usage: python tools/dtype_audit.py [sf_dir]
"""

from __future__ import annotations

import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def type_class(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, (bytes, bytearray)):
        return "bytes"
    if isinstance(v, datetime.datetime):
        return "datetime"
    if isinstance(v, datetime.date):
        return "date"
    if isinstance(v, str):
        return "str"
    return type(v).__name__


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from pypeman_spark.session import get_spark

    spark = get_spark(app_name="dtype_audit")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    bad = 0
    for name, fn in sorted(queries.items()):
        try:
            df = fn(spark, SF_DIR)
            complex_cols = [
                f.name for f in df.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            srow = df.limit(1).collect()
            srow = srow[0].asDict() if srow else {}
            orow, ocols = {}, []
            if name in oracles:
                cur = con.execute(oracles[name])
                ocols = [d[0] for d in cur.description]
                fetched = cur.fetchone()
                if fetched:
                    orow = dict(zip(ocols, fetched))
            issues = []
            if complex_cols:
                issues.append(f"complex-cols={complex_cols}")
            for c in srow:
                if c in orow:
                    sc, oc = type_class(srow[c]), type_class(orow[c])
                    if sc and oc and sc != oc:
                        issues.append(f"{c}: spark={sc} oracle={oc}")
            if issues:
                bad += 1
                print(f"WARN  {name}: {'; '.join(issues)}")
            else:
                print(f"ok    {name}")
        except Exception as exc:  # noqa: BLE001
            bad += 1
            print(f"ERR   {name}: {exc}")
    print(f"\n{bad} queries flagged / {len(queries)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
