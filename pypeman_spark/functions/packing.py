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

from pyspark.sql import DataFrame, functions as F, types as T

__all__ = ["greedy_pack", "chunk_documents"]


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


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """Split documents into fixed-size token windows — the standard
    pre-tokenization chunking step (long doc → training-length pieces,
    optional ``overlap`` tokens of left context carried into each next
    chunk so no boundary-spanning phrase is lost).

    Tokens are whitespace words here; stride = ``max_tokens - overlap``.
    Output: ``(id, chunk_idx, chunk_text, n_tokens)``, one row per
    chunk, chunk 0 starting at token 0. Pure JVM expressions — the
    window arithmetic is ``sequence``/``transform`` over the split
    array and ONE explode; no Python, no shuffle. The fan-out ratio is
    output/input size, the theoretical floor for this op.
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    stride = max_tokens - overlap
    w = F.split(F.trim(F.col(text_col)), "\\s+")
    # chunk starts: 0, stride, 2*stride, ... while start < len (at least
    # one chunk even for empty text — slice handles the short tail)
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.ceil((F.size(w) - F.lit(max_tokens)) / F.lit(stride)).cast("int"),
            F.lit(0),
        ),
    )
    chunks = F.transform(
        starts,
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.array_join(
                F.slice(w, i * stride + 1, max_tokens), " "
            ).alias("chunk_text"),
            F.least(
                F.size(w) - i * stride, F.lit(max_tokens)
            ).alias("n_tokens"),
        ),
    )
    return df.select(
        F.col(id_col), F.explode(chunks).alias("__c")
    ).select(
        id_col,
        F.col("__c.chunk_idx").alias("chunk_idx"),
        F.col("__c.chunk_text").alias("chunk_text"),
        F.col("__c.n_tokens").alias("n_tokens"),
    )
