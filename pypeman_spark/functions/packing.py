"""Sequence packing for training-data pipelines.

Packing concatenates documents into fixed-token-budget training
sequences. True greedy packing ("append docs in order until the next one
would overflow, then start a new pack") is inherently sequential — the
pack id of row *n* depends on every row before it — so it is NOT
expressible as a window function (a running sum never resets). The
standard distributed formulation, used by real corpus pipelines, packs
*within shards*: documents are hash-sharded, each shard is packed
greedily in document order, and pack ids are local to the shard. Shards
are independent, so the operator scales linearly; within a shard the
sequential scan runs in one Arrow-batched ``applyInPandas`` task.

This is the documented correct use of the UDF escape hatch (SURVEY §7.3):
the semantics genuinely cannot be expressed with built-in operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, types as T

__all__ = ["greedy_pack"]


def greedy_pack(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_col: str,
    shard_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each row a ``pack_id`` (local to its shard) by greedy
    first-fit in ``order_col`` order. A row larger than ``budget`` gets a
    pack of its own. Returns ``(id_col, shard_col, token_col, pack_id)``.
    """
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(shard_col, T.LongType()),
            T.StructField(token_col, T.LongType()),
            T.StructField("pack_id", T.LongType()),
        ]
    )

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(order_col, kind="mergesort")
        pack_ids = []
        pid, fill = 0, 0
        for tok in pdf[token_col]:
            if fill > 0 and fill + tok > budget:
                pid += 1
                fill = 0
            fill += int(tok)
            pack_ids.append(pid)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].astype("int64"),
                shard_col: pdf[shard_col].astype("int64"),
                token_col: pdf[token_col].astype("int64"),
                "pack_id": pd.Series(pack_ids, dtype="int64", index=pdf.index),
            }
        )

    cols = [id_col, shard_col, token_col, order_col]
    return (
        df.select(*dict.fromkeys(cols))
        .groupBy(shard_col)
        .applyInPandas(pack, out_schema)
    )
