"""Operator (node) base class.

Reference: ``pypeman/nodes.py:94-343`` (BaseNode). A node is a unit of
the processing chain. Our nodes are **DataFrame → DataFrame functions**
built from built-in Spark expressions wherever possible; the whole chain
collapses into a handful of whole-stage-codegen projections at runtime —
there is no per-node execution boundary, unlike the reference's
one-message-at-a-time ``node.handle(msg.copy())`` loop
(``channels.py:790``).

Cross-cutting BaseNode params reproduced here (``nodes.py:114-121``):

* ``store_input_as`` / ``store_output_as`` — snapshot payload+meta into
  ``ctx[key]`` before/after the transform (``nodes.py:189-190,224-225``).
* ``passthrough`` — run the node (for side effects / ctx capture) but
  forward the *input* payload+meta (``nodes.py:227-229``).
* ``name`` — stage-addressable name for inject/replay
  (``channels.py:551-662``).

Per-row failure never raises: nodes write ``err_msg`` and flip ``state``
to ``error``; downstream nodes skip non-active rows. This is the columnar
translation of pypeman's per-message exception routing
(``channels.py:465-517``).
"""


import json
from typing import Any, Callable

from pyspark.sql import Column, DataFrame, functions as F, types as T

from ..message import DROPPED, ERROR, PENDING, PROCESSING, REJECTED, add_context

__all__ = ["Node", "active_cond", "payload_fn_udf"]


def active_cond() -> Column:
    """Rows still flowing through the chain (not dropped/rejected/errored)."""
    return F.col("state").isin(PENDING, PROCESSING) | F.col("state").isNull()


class Node:
    """Base operator: subclasses override :meth:`transform`."""

    def __init__(
        self,
        name: str | None = None,
        passthrough: bool = False,
        store_input_as: str | None = None,
        store_output_as: str | None = None,
    ):
        self.name = name or type(self).__name__
        self.passthrough = passthrough
        self.store_input_as = store_input_as
        self.store_output_as = store_output_as

    # -- override points -------------------------------------------------
    def transform(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError

    # -- helpers for subclasses ------------------------------------------
    def apply_payload(
        self,
        df: DataFrame,
        expr: Column,
        content_type: str | None = None,
        err: Column | None = None,
    ) -> DataFrame:
        """Replace ``payload`` for active rows only; optionally record a
        per-row error condition (``err`` column evaluating to an error
        string or NULL)."""
        act = active_cond()
        out = df
        if err is not None:
            out = out.withColumn(
                "err_msg", F.when(act & err.isNotNull(), err).otherwise(F.col("err_msg"))
            ).withColumn(
                "state", F.when(act & err.isNotNull(), F.lit(ERROR)).otherwise(F.col("state"))
            )
            act = active_cond()
        out = out.withColumn(
            "payload", F.when(act, expr).otherwise(F.col("payload"))
        )
        if content_type is not None:
            out = out.withColumn(
                "content_type",
                F.when(act, F.lit(content_type)).otherwise(F.col("content_type")),
            )
        return out

    def set_state(self, df: DataFrame, cond: Column, state: str, err_msg: Column | None = None) -> DataFrame:
        # err_msg must be set BEFORE state: active_cond() is symbolic and
        # would resolve against the already-flipped state column.
        act = active_cond()
        out = df
        if err_msg is not None:
            out = out.withColumn(
                "err_msg", F.when(act & cond, err_msg).otherwise(F.col("err_msg"))
            )
        out = out.withColumn(
            "state", F.when(act & cond, F.lit(state)).otherwise(F.col("state"))
        )
        return out

    # -- chain protocol --------------------------------------------------
    def __call__(self, df: DataFrame) -> DataFrame:
        if self.store_input_as:
            df = add_context(df, self.store_input_as)
        if self.passthrough:
            saved = df.withColumn("__pt_payload", F.col("payload")).withColumn(
                "__pt_meta", F.col("meta")
            )
            out = self.transform(saved)
            out = (
                out.withColumn("payload", F.col("__pt_payload"))
                .withColumn("meta", F.col("__pt_meta"))
                .drop("__pt_payload", "__pt_meta")
            )
        else:
            out = self.transform(df)
        if self.store_output_as:
            out = add_context(out, self.store_output_as)
        return out

    def __repr__(self) -> str:  # pragma: no cover
        return f"<{type(self).__name__} {self.name!r}>"


_FN_RESULT = T.StructType(
    [T.StructField("payload", T.StringType()), T.StructField("err", T.StringType())]
)


def payload_fn_udf(fn: Callable[[Any], Any], decode_json: bool = True):
    """Lift an arbitrary python ``payload -> payload`` callable to an
    Arrow-batched pandas UDF returning ``(payload, err)``.

    This is the generic escape hatch (FuncNode, ``nodes.py:976-1007``) and
    the ONLY place arbitrary python runs in the hot path — everything
    expressible as built-in Spark functions stays JVM-side. Errors are
    captured per row, mirroring pypeman's per-message exception routing.
    """
    import pandas as pd

    @F.pandas_udf(_FN_RESULT)
    def _udf(s: pd.Series) -> pd.DataFrame:
        payloads: list[str | None] = []
        errs: list[str | None] = []
        for raw in s:
            try:
                obj = raw
                if decode_json and raw is not None:
                    try:
                        obj = json.loads(raw)
                    except (ValueError, TypeError):
                        obj = raw
                res = fn(obj)
                if res is None or isinstance(res, str):
                    payloads.append(res)
                else:
                    payloads.append(json.dumps(res))
                errs.append(None)
            except Exception as exc:  # noqa: BLE001 — per-row error routing
                payloads.append(raw)
                errs.append(f"{type(exc).__name__}: {exc}")
        return pd.DataFrame({"payload": payloads, "err": errs})

    return _udf
