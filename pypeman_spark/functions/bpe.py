"""Byte-pair-encoding tokenizer — distributed training, Arrow encode.

The text suite's token counting (``text.py``) is whitespace + a
BPE-ish regex; a real training-data pipeline budgets and packs by the
TOKENIZER's counts. This module implements actual BPE:

* :func:`train_bpe` — the textbook DISTRIBUTED formulation: training
  never touches the corpus again after one word-frequency aggregation.
  The iterative part runs on the word-frequency table (vocabulary-
  sized — ~10^5-10^6 rows at 100 TB, NOT corpus-sized), one tiny
  Spark job pair per merge: (1) explode adjacent symbol pairs weighted
  by word count and take the argmax, (2) apply the winning merge to
  the symbol strings with one ``regexp_replace``. The table is cached
  and re-checkpointed periodically so the lineage never grows past a
  bound.
* :func:`bpe_encode` / :func:`bpe_token_count` — apply the learned
  merges in rank order. Per-word merge application is inherently
  sequential, so this is an Arrow-batched ``mapInPandas`` with a
  per-batch word cache (real corpora repeat words heavily; the cache
  turns encode into a dict lookup for the bulk of tokens).

Scope, stated honestly: char-level symbols with an end-of-word marker
(the GPT-2-style byte-level alphabet is a drop-in alphabet swap, not a
different algorithm); training is deterministic (count desc, then
lexicographic pair) so two runs on the same corpus produce identical
vocabularies. The training loop is driver-COORDINATED (k merges = k
tiny jobs) but never driver-EXECUTED — pair counting and merge
application stay distributed.
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

__all__ = ["train_bpe", "bpe_encode", "bpe_token_count", "apply_merges"]

_EOW = "</w>"  # end-of-word marker symbol (spaces impossible)


def _word_freq(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n) over the corpus — the ONE corpus-sized job."""
    return (
        df.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    ranked merge list ``[(left, right), ...]``.

    Shuffle budget: ONE corpus aggregation (word frequencies), then
    per merge one pair-count aggregation over the cached vocab table
    (symbols exploded from a space-delimited string — ~word-length
    rows per word) and one narrow ``regexp_replace``. Ties break
    deterministically (count desc, pair asc)."""
    words = _word_freq(df, text_col).select(
        # "h e l l o <eow>" — symbols space-delimited so a merge is a
        # string replace and pair extraction is a split+slide
        F.concat_ws(
            " ",
            F.concat(
                F.split(F.col("word"), ""),
                F.array(F.lit(_EOW)),
            ),
        ).alias("sym"),
        "n",
    ).localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    for step in range(num_merges):
        syms = F.split(F.col("sym"), " ")
        pairs = words.select(
            F.explode(
                F.zip_with(
                    F.slice(syms, 1, F.size(syms) - 1),
                    F.slice(syms, 2, F.size(syms) - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("pair"),
            "n",
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break  # nothing left worth merging
        left, right = top[0]["pair"].split(" ", 1)
        merges.append((left, right))
        # apply the merge: " left right " -> " leftright " on the
        # delimited string (padded so matches are whole symbols); two
        # passes because adjacent matches share the padding space
        pat = re.escape(f"{left} {right}")
        # Java Matcher replacement semantics: '$' is a group reference
        # and '\' an escape — quote both (Matcher.quoteReplacement),
        # else a corpus word containing '$' or '\' whose symbols win a
        # merge kills the whole job with INVALID_REGEXP_REPLACE
        repl = f"{left}{right}".replace("\\", "\\\\").replace("$", "\\$")
        # lookarounds keep the delimiting spaces unconsumed, so the
        # engine's left-to-right scan replaces exactly the canonical
        # non-overlapping occurrence set in ONE pass
        padded = F.concat(F.lit(" "), F.col("sym"), F.lit(" "))
        replaced = F.regexp_replace(padded, f"(?<= ){pat}(?= )", repl)
        # localCheckpoint (not cache): materializes AND truncates the
        # logical plan, so step k's plan is one replace over blocks —
        # a cache chain keeps the k-deep lineage alive and OOMs the
        # driver past ~20 merges
        words = words.select(
            F.trim(replaced).alias("sym"), "n"
        ).localCheckpoint(eager=True)
    return merges


def apply_merges(word: str, ranks: dict) -> list[str]:
    """Encode one word with the learned merge ranks (lowest rank
    first — the canonical BPE application order)."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "tokens",
) -> DataFrame:
    """Attach ``out_col``: the BPE token sequence of each document.
    Arrow-batched; a per-batch word→tokens cache collapses repeated
    words to a dict lookup."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(out_col, T.ArrayType(T.StringType())),
        ]
    )

    def _encode(batches: "Iterator[pd.DataFrame]"):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                doc: list[str] = []
                for w in re.split(r"\s+", str(text).lower()):
                    if not w:
                        continue
                    got = cache.get(w)
                    if got is None:
                        got = apply_merges(w, ranks)
                        cache[w] = got
                    doc.extend(got)
                toks.append(doc)
            yield pd.DataFrame({id_col: pdf[id_col], out_col: toks})

    return df.select(id_col, text_col).mapInPandas(_encode, out_schema)


def bpe_token_count(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Per-document token count under the learned tokenizer — the
    number a budget/packing stage should use instead of whitespace
    counts."""
    enc = bpe_encode(df, merges, text_col=text_col, id_col=id_col)
    return enc.select(
        id_col, F.size("tokens").cast("long").alias(out_col)
    )
