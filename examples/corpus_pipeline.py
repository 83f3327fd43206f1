"""End-to-end training-corpus build, composed from the §2.I operators.

The pipeline every large-scale pretraining corpus runs, in order:

1. **Structural clean** — C4-style line filtering (`text.clean_lines`).
2. **Quality gate** — language ID + repetition ratio + quality score.
3. **Exact dedup** — keep-first by content hash (`dedup.dedupe_exact`).
4. **Fuzzy dedup** — MinHash LSH pairs → connected components → keep
   cluster representatives; the cluster ids also seed the
   **leakage-safe split** (`sampling.leakage_safe_splits`): every
   near-dup cluster member lands in the same train/val/test split.
5. **Decontamination** — drop docs containing benchmark n-grams
   (`decontam.decontaminate`).
6. **Mixture** — hit target domain proportions
   (`sampling.mixture_sample`).
7. **Quality gate** — `quality.assert_valid` fails the build on null
   keys / empty texts / duplicate ids before anything is written.
8. **Chunk** — fixed-token windows (`packing.chunk_documents`).
9. **Shards** — deterministic hash-ordered output
   (`layout.write_training_shards`), split carried per chunk.

Every stage is a DataFrame → DataFrame transform, so the whole build is
ONE lazy plan until the final write (plus the two tiny count passes in
mixture/dedup that Spark runs as separate jobs). At 100 TB each stage
keeps the properties documented on its function: hashes through
shuffles, broadcasts for small sides, no all-pairs joins.

Run: ``python examples/corpus_pipeline.py [sf_dir] [out_dir]``
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from pypeman_spark import get_spark
from pypeman_spark.functions import dedup as D
from pypeman_spark.functions import text as TX
from pypeman_spark.functions.decontam import decontaminate
from pypeman_spark.functions.layout import write_training_shards
from pypeman_spark.functions.packing import chunk_documents
from pypeman_spark.functions.quality import assert_valid
from pypeman_spark.functions.sampling import leakage_safe_splits, mixture_sample
from pypeman_spark.sources.tables import load_table


def build_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    mixture: dict[str, float],
    out_dir: str,
    max_tokens: int = 64,
    n_shards: int = 4,
) -> dict[str, int]:
    """Run the full build; returns per-stage surviving doc counts."""
    counts: dict[str, int] = {"input": docs.count()}

    # 1-2: structural clean + quality gate (pure expressions, one pass)
    cleaned = docs.withColumn(
        "text", TX.clean_lines(F.col("text"), min_words=2)
    ).filter(
        (F.col("text") != "")
        & (TX.word_repetition_ratio(F.col("text")) <= 0.9)
        & (TX.detect_language(F.col("text")).isNotNull())
    )
    counts["quality"] = cleaned.count()

    # 3: exact dedup (hash groupBy + semi join)
    exact = D.dedupe_exact(cleaned)
    counts["exact_dedup"] = exact.count()

    # 4: fuzzy dedup — LSH pairs -> CC -> keep min-id representative
    pairs = D.minhash_candidate_pairs(exact, num_hashes=16, bands=4, shingle_n=3)
    clusters = D.connected_components(
        pairs, nodes=exact.select(F.col("doc_id").alias("node"))
    )
    keep = clusters.filter(F.col("node") == F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    fuzzy = exact.join(F.broadcast(keep), "doc_id", "left_semi")
    counts["fuzzy_dedup"] = fuzzy.count()
    # leakage guard: split hashed from the CLUSTER id, so near-dups can
    # never straddle train and eval
    split_of = leakage_safe_splits(clusters, "cluster_id").select(
        F.col("node").alias("doc_id"), "split"
    )
    fuzzy = fuzzy.join(split_of, "doc_id")

    # 5: benchmark decontamination (broadcast bench shingles, anti join)
    clean = decontaminate(fuzzy, benchmark, n=3, min_ratio=0.5, bench_id="bench_id")
    counts["decontaminated"] = clean.count()

    # 6: target mixture over sources
    mixed = mixture_sample(clean, "source", "doc_id", mixture, salt="mix")
    counts["mixture"] = mixed.count()

    # 7: data-quality gate — fail the BUILD, not the training run
    assert_valid(
        mixed,
        {
            "doc_id_not_null": F.col("doc_id").isNotNull(),
            "text_nonempty": F.col("text") != "",
            "split_assigned": F.col("split").isin("train", "val", "test"),
        },
        unique=[["doc_id"]],
    )

    # 8: chunk to training length
    chunks = chunk_documents(mixed, max_tokens=max_tokens, overlap=8)
    # carry source/lang/split onto chunks for loader-side bookkeeping
    chunks = chunks.join(
        mixed.select("doc_id", "source", "lang", "split"), "doc_id"
    )
    counts["chunks"] = chunks.count()

    # 9: deterministic shards keyed by (doc, chunk)
    sharded = chunks.withColumn(
        "chunk_id",
        F.concat_ws(":", F.col("doc_id").cast("string"), F.col("chunk_idx")),
    )
    write_training_shards(sharded, out_dir, n_shards, "chunk_id", salt="rel1")
    return counts


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        tempfile.mkdtemp(prefix="corpus_"), "shards"
    )
    spark = get_spark("corpus_pipeline", cpus=8)
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 7)
    bench = docs.filter(F.col("doc_id") % 10 == 7)  # stand-in eval set
    counts = build_corpus(
        corpus,
        bench,
        {"src0": 0.2, "src1": 0.2, "src2": 0.2, "src3": 0.2, "src4": 0.2},
        out_dir,
    )
    for stage, n in counts.items():
        print(f"{stage:>15s}: {n}")
    print("shards at:", out_dir)


if __name__ == "__main__":
    main()
