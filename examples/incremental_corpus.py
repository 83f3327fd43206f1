"""Incremental corpus ingestion: dedup each arriving batch against
EVERYTHING ingested before it — without ever re-reading the history.

The pattern a growing pretraining corpus needs (the batch pipeline in
``examples/corpus_pipeline.py`` covers the one-shot build; this one
covers day-2 operations):

1. Two ACID tables: ``corpus`` (the documents) and ``mh_index`` (one
   row per (doc, band): ``dedup.minhash_index`` — band hash for LSH
   candidate lookup, full MinHash signature for similarity estimation).
2. Each arriving batch is exact-deduped WITHIN itself, then probed
   against the persisted index (``dedup.minhash_probe``): candidates
   come from the (band, band_hash) equi-join, similarity from the
   integer count of agreeing signature components. The history's TEXT
   never participates — at 100 TB a batch moves only its own index
   rows plus the collided buckets.
3. Survivors append to BOTH tables under one idempotent txn id per
   table, so a crashed-and-retried batch can never double-ingest
   (TxTable's txn markers make the append exactly-once).

Run: ``python examples/incremental_corpus.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from pypeman_spark import get_spark
from pypeman_spark.functions import dedup as D
from pypeman_spark.sources.tables import load_table
from pypeman_spark.store.txtable import TxTable


def ingest_batch(
    batch: DataFrame,
    corpus: TxTable,
    index: TxTable,
    batch_id: int,
    min_agree: int = 8,
) -> dict[str, int]:
    """Dedup ``batch`` against itself and the ingested history, then
    append the survivors (documents + their index rows) exactly-once.
    Returns per-stage counts."""
    n_in = batch.count()
    batch = D.dedupe_exact(batch)
    n_self = batch.count()
    # near-dups vs EVERYTHING ingested so far: probe the persisted
    # index — the corpus table itself is never read here. A virgin
    # index table (nothing ingested yet) has no schema to probe.
    idx_df = index.snapshot()
    if "band_hash" in idx_df.columns:
        dup_ids = D.minhash_probe(
            batch, idx_df, min_agree=min_agree
        ).select(F.col("new_id").alias("doc_id")).distinct()
        survivors = batch.join(dup_ids, "doc_id", "left_anti")
    else:
        survivors = batch
    n_new = survivors.count()
    if n_new:
        # one txn id per table: a retried batch is a no-op
        corpus.append(survivors, txn=("ingest", batch_id))
        index.append(
            D.minhash_index(survivors), txn=("ingest_idx", batch_id)
        )
    return {"arrived": n_in, "after_self_dedup": n_self, "ingested": n_new}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
    )
    spark = get_spark("incremental_corpus")
    root = tempfile.mkdtemp(prefix="incr_corpus_")
    corpus = TxTable(
        spark, os.path.join(root, "corpus"), key_cols=["doc_id"],
        n_buckets=8,
    )
    index = TxTable(
        spark, os.path.join(root, "mh_index"),
        key_cols=["doc_id", "band"], n_buckets=8,
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # batch 1: the first 300 docs
    b1 = docs.filter(F.col("doc_id") < 300)
    print("batch 1:", ingest_batch(b1, corpus, index, batch_id=1))

    # batch 2: 100 genuinely new docs + re-keyed copies of 60 already
    # ingested ones — the copies must be caught by the INDEX, not by
    # anything re-reading batch 1
    b2 = (
        docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400))
        .unionByName(
            docs.filter(F.col("doc_id") < 300)
            .filter(F.col("doc_id") % 5 == 0)
            .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
        )
    )
    stats2 = ingest_batch(b2, corpus, index, batch_id=2)
    print("batch 2:", stats2)

    # a retried batch is exactly-once: same txn id, nothing doubles
    stats2r = ingest_batch(b2, corpus, index, batch_id=2)
    print("batch 2 retry:", stats2r, "| corpus rows:", corpus.count())
    print("index stats:", index.stats())


if __name__ == "__main__":
    main()
