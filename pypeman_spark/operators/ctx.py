"""Context operators (SURVEY §2.C rows 26–30).

In pypeman, ``msg.ctx[key]`` holds payload/meta snapshots taken at
earlier nodes (``message.py:92-102``); ``contrib/ctx.py`` restores or
combines them. In Spark **columns are the context** — a snapshot is a
struct copy inside the same codegen stage; restoring is a column swap.
No joins, no shuffles, no UDFs anywhere in this module.
"""


import json
from typing import Any

from pyspark.sql import DataFrame, functions as F

from ..message import META_TYPE, add_context
from .base import Node, active_cond

__all__ = ["SaveContext", "SetCtx", "CombineCtx", "UseMetaFromCtx", "EmptyMeta"]


class SaveContext(Node):
    """Explicit snapshot: ``ctx[key] = (payload, meta)`` — the standalone
    form of the ``store_input_as``/``store_output_as`` BaseNode params
    (``nodes.py:114-115``)."""

    def __init__(self, key: str, **kw):
        super().__init__(**kw)
        self.key = key

    def transform(self, df: DataFrame) -> DataFrame:
        return add_context(df, self.key)


class SetCtx(Node):
    """Restore payload+meta from ``ctx[key]`` (``nodes.py:396-407``)."""

    def __init__(self, key: str, **kw):
        super().__init__(**kw)
        self.key = key

    def transform(self, df: DataFrame) -> DataFrame:
        act = active_cond()
        entry = F.col("ctx").getItem(self.key)
        return df.withColumn(
            "payload", F.when(act, entry.getField("payload")).otherwise(F.col("payload"))
        ).withColumn(
            "meta", F.when(act, entry.getField("meta")).otherwise(F.col("meta"))
        )


class CombineCtx(Node):
    """Build a new dict payload from ≥2 saved contexts
    (``contrib/ctx.py:10-62``): ``flatten=True`` merges the ctx payload
    dicts into one; else nests each under its ctx key. ``meta_from``
    selects which context supplies meta.

    The merge itself is dict-level (payloads are JSON), done in one
    Arrow batch; the ctx lookup stays columnar.
    """

    def __init__(self, keys: list[str], flatten: bool = False,
                 meta_from: str | None = None, **kw):
        super().__init__(**kw)
        self.keys = keys
        self.flatten = flatten
        self.meta_from = meta_from

    def transform(self, df: DataFrame) -> DataFrame:
        keys, flatten = self.keys, self.flatten
        import pandas as pd
        from pyspark.sql import types as T

        @F.pandas_udf(T.StringType())
        def _combine(*payloads: pd.Series) -> pd.Series:
            out = []
            for vals in zip(*payloads):
                if flatten:
                    merged: dict[str, Any] = {}
                    for v in vals:
                        obj = json.loads(v) if v is not None else {}
                        if not isinstance(obj, dict):
                            raise TypeError("flatten requires dict payloads")
                        merged.update(obj)
                    out.append(json.dumps(merged))
                else:
                    nested = {
                        k: (json.loads(v) if v is not None else None)
                        for k, v in zip(keys, vals)
                    }
                    out.append(json.dumps(nested))
            return pd.Series(out)

        cols = [F.col("ctx").getItem(k).getField("payload") for k in keys]
        out = self.apply_payload(df, _combine(*cols), content_type="application/json")
        if self.meta_from:
            act = active_cond()
            out = out.withColumn(
                "meta",
                F.when(
                    act, F.col("ctx").getItem(self.meta_from).getField("meta")
                ).otherwise(F.col("meta")),
            )
        return out


class UseMetaFromCtx(Node):
    """Replace meta from a saved context (``contrib/ctx.py:65-76``)."""

    def __init__(self, key: str, **kw):
        super().__init__(**kw)
        self.key = key

    def transform(self, df: DataFrame) -> DataFrame:
        act = active_cond()
        return df.withColumn(
            "meta",
            F.when(
                act, F.col("ctx").getItem(self.key).getField("meta")
            ).otherwise(F.col("meta")),
        )


class EmptyMeta(Node):
    """meta = {} (``contrib/ctx.py:79-86``)."""

    def transform(self, df: DataFrame) -> DataFrame:
        act = active_cond()
        return df.withColumn(
            "meta",
            F.when(act, F.create_map().cast(META_TYPE)).otherwise(F.col("meta")),
        )
