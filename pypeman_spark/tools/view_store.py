"""View / filter messages in a message store.

Reference: ``pypeman/tools/view_store.py`` — walk a file store, decode
payloads, apply ``name=value`` payload filters, print ``id payload``.

Spark-first difference: the reference opens every store file one at a
time on the driver; here filters compile to ``get_json_object`` column
predicates, so the filtering runs distributed over the store parquet and
only the matching (count-bounded) rows are ever collected. Dotted filter
names address nested payload fields (``a.b=1`` → ``$.a.b``).

Usage::

    python -m pypeman_spark.tools.view_store /path/to/store \
        --channel mychan -f status=3 -f user.name='"bob"' --count 50
"""

from __future__ import annotations

import argparse
import ast

from pyspark.sql import DataFrame, functions as F

__all__ = ["Filter", "filtered_messages", "main", "mk_parser"]


class Filter:
    """``name=value`` payload filter (``view_store.py:Filter``); value is
    a python literal (``3``, ``"bob"``, ``True``), compared against the
    JSON payload field at the (dotted) path with TYPED equality —
    matching the reference's ``payload.get(name) == literal_eval(val)``:
    a JSON string ``"9"`` does not match ``-f k=9``, while ``-f k=9.0``
    matches an int-encoded ``9``. Implemented over VARIANT so the JSON
    type is known per row; still a distributed column predicate."""

    def __init__(self, filter_str: str):
        self.filter_str = filter_str
        name, val = filter_str.split("=", 1)
        self.name = name
        self.val = ast.literal_eval(val)

    def column(self) -> F.Column:
        path = "$." + self.name
        v = F.try_parse_json(F.col("payload"))
        fld = F.try_variant_get(v, path, "variant")
        ty = F.schema_of_variant(fld)
        if self.val is None:
            # dict.get semantics: JSON null and missing key both match
            return fld.isNull() | (ty == "VOID")
        if isinstance(self.val, bool):
            return (ty == "BOOLEAN") & (
                F.try_variant_get(v, path, "boolean") == F.lit(self.val)
            )
        if isinstance(self.val, (int, float)):
            # any JSON numeric type (BIGINT / DECIMAL / DOUBLE), never a
            # string or boolean masquerading as one
            return ~ty.isin("STRING", "BOOLEAN", "VOID") & (
                F.try_variant_get(v, path, "double") == F.lit(float(self.val))
            )
        if isinstance(self.val, str):
            return (ty == "STRING") & (
                F.try_variant_get(v, path, "string") == F.lit(self.val)
            )
        # non-scalar literal (list/dict): text compare fallback
        return F.get_json_object(F.col("payload"), path) == F.lit(str(self.val))

    def __repr__(self) -> str:  # pragma: no cover
        return self.filter_str


def filtered_messages(store, filters: list[Filter], count: int = 100) -> DataFrame:
    """Current store messages matching every filter — one distributed
    plan (filters push into the store scan), LIMIT-bounded."""
    df = store.search(count=count)
    for flt in filters:
        df = df.filter(flt.column())
    return df


def mk_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="view_store", description="view store contents or search"
    )
    parser.add_argument("path", help="store base path")
    parser.add_argument("--channel", "-c", default="default", help="store channel")
    parser.add_argument(
        "--filter", "-f", action="append", default=[],
        help="payload filter name=value (value is a python literal)",
    )
    parser.add_argument("--count", type=int, default=100, help="max messages")
    return parser


def main(argv: list[str] | None = None) -> int:
    options = mk_parser().parse_args(argv)
    from ..session import get_spark
    from ..store.msgstore import FileMessageStore

    spark = get_spark("view-store", cpus=4)
    store = FileMessageStore(spark, options.path, channel=options.channel)
    filters = [Filter(s) for s in options.filter]
    for row in filtered_messages(store, filters, count=options.count).collect():
        print(row["id"], row["payload"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
