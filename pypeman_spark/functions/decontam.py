"""Benchmark decontamination: remove training documents that overlap a
held-out evaluation set.

The standard corpus-hygiene step (GPT-3 appendix C's 13-gram filter,
PaLM/Llama n-gram decontamination): a training document is contaminated
when it contains a large fraction of some benchmark item's n-grams —
containment, not symmetric Jaccard, because a long web page that embeds
a whole eval question must be caught even though the page is 100× the
question's length.

100 TB design
-------------
* Shingles are md5-hashed before the join — 16-byte keys move through
  the shuffle/broadcast, never the text.
* The benchmark side is tiny relative to the corpus (10^4-10^5 items vs
  10^9 docs), so its shingle set is **broadcast** by default: the corpus
  side is then a map-side hash-probe — no shuffle of the 100 TB side at
  all.  For unusually large benchmark suites pass ``broadcast_bench=
  False`` to fall back to a plain equi-join on the shingle hash.
* Aggregation after the probe groups on (doc, bench item) — cardinality
  bounded by actual overlaps, which is sparse by construction.

Reference scope note: pypeman has no corpus ops; this module is part of
the §2.I training-data surface the build contract adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import shingles

__all__ = ["benchmark_overlap", "contaminated_ids", "decontaminate"]


def _hashed_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int, out_id: str
) -> DataFrame:
    """(out_id, sh) — 64-bit hash of each distinct word n-gram.

    xxhash64, not md5: the hash is an internal join key (it never
    reaches the output), so an 8-byte long beats a 32-char hex string
    through the broadcast and the groupBy — and a collision would need
    ~2^32 distinct shingles per benchmark item to matter."""
    return (
        shingles(df, text_col=text_col, id_col=id_col, n=n)
        .select(F.col(id_col).alias(out_id), F.xxhash64(F.col("shingle")).alias("sh"))
    )


def benchmark_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id: str = "bench_id",
    n: int = 3,
    min_ratio: float = 0.5,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Contaminated (doc, benchmark-item) pairs with containment ratio.

    Returns ``(doc_id, bench_id, overlap, bench_sz, ratio)`` where
    ``ratio = |doc shingles ∩ bench shingles| / |bench shingles|`` and
    only pairs with ``ratio >= min_ratio`` survive.
    """
    doc_sh = _hashed_shingles(corpus, text_col, id_col, n, id_col)
    bench_sh = _hashed_shingles(benchmark, text_col, id_col, n, bench_id)
    sizes = bench_sh.groupBy(bench_id).agg(F.count(F.lit(1)).alias("bench_sz"))
    if broadcast_bench:
        bench_sh = F.broadcast(bench_sh)
        sizes = F.broadcast(sizes)
    hits = (
        doc_sh.join(bench_sh, "sh")
        .groupBy(id_col, bench_id)
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    return (
        hits.join(sizes, bench_id)
        .withColumn(
            "ratio", F.round(F.col("overlap") / F.col("bench_sz"), 6)
        )
        .filter(F.col("overlap") / F.col("bench_sz") >= min_ratio)
        .select(id_col, bench_id, "overlap", "bench_sz", "ratio")
    )


def contaminated_ids(
    corpus: DataFrame,
    benchmark: DataFrame,
    overlap: DataFrame | None = None,
    **kw,
) -> DataFrame:
    """Distinct corpus ids contaminated by ANY benchmark item.

    ``overlap`` lets a caller that already ran :func:`benchmark_overlap`
    hand the staged pair frame in, so a report deriving both overlap
    stats and the cleaned corpus plans ONE shingle-probe subtree (the
    shared frame keeps identical expression ids, letting Spark's
    exchange reuse deduplicate the computation at runtime) instead of
    shingling the corpus twice.
    """
    id_col = kw.get("id_col", "doc_id")
    if overlap is None:
        overlap = benchmark_overlap(corpus, benchmark, **kw)
    return overlap.select(id_col).distinct()


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    overlap: DataFrame | None = None,
    **kw,
) -> DataFrame:
    """The corpus minus contaminated documents (left-anti on the id).

    The anti join's right side is the tiny contaminated-id set — Spark
    broadcasts it, so the cleaning pass is a single map-side filter over
    the corpus scan. ``overlap`` optionally reuses a precomputed
    :func:`benchmark_overlap` frame (see :func:`contaminated_ids`).
    """
    id_col = kw.get("id_col", "doc_id")
    return corpus.join(
        F.broadcast(contaminated_ids(corpus, benchmark, overlap=overlap, **kw)),
        id_col,
        "left_anti",
    )
