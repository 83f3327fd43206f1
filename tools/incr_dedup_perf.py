#!/usr/bin/env python
"""Incremental near-dup probe cost vs history size (VERDICT r12 #4).

``examples/incremental_corpus.py`` proves the day-2 ingestion recipe
CORRECT (oracle entry ``incremental_minhash_probe``); this study
measures its COST CURVE: as batches accumulate in the persisted
MinHash index, does the per-batch probe stay flat-ish, or does it grow
linearly with history?

Why flat-ish is the expected shape: the probe
(``functions/dedup.py:minhash_probe``) joins the batch's index rows
(bounded: batch_docs x bands) against the persisted index on
(band, band_hash). The batch side is small, so AQE broadcasts it and
the HISTORY never shuffles — it streams through a map-side hash join.
The only history-proportional cost is the parquet scan of (id, band,
band_hash, sig) rows — tens of bytes per doc per band, embarrassingly
parallel, no text. At local-NVMe scales that scan is dominated by job
overhead; at 100 TB it is a narrow-column scan of the INDEX table
(~1/1000 the corpus bytes), not of the corpus.

Workload per batch: ``dup_per_batch`` verbatim re-keyed copies of
already-ingested documents (real sf text — the probe must catch them
via the index alone) + ``fresh_per_batch`` synthetic documents whose
words are sha2 chunks keyed by (batch, doc, position) — guaranteed
novel shingles, so history grows every batch. Appends are exactly-once
(TxTable txn markers), same as the example.

Usage:
    python tools/incr_dedup_perf.py [sf_dir] [n_batches]
Writes INCR_DEDUP_PERF.json (one JSON line) in the CWD.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from pypeman_spark import get_spark  # noqa: E402
from pypeman_spark.functions import dedup as D  # noqa: E402
from pypeman_spark.sources.tables import load_table  # noqa: E402
from pypeman_spark.store.txtable import TxTable  # noqa: E402
from pypeman_spark.streaming.ingest import index_sync  # noqa: E402

FRESH_PER_BATCH = int(os.environ.get("INCR_FRESH", "15000"))
DUP_PER_BATCH = int(os.environ.get("INCR_DUP", "5000"))
WORDS_PER_FRESH = 48
MIN_AGREE = 8


def fresh_docs(spark, batch_id: int, n: int) -> DataFrame:
    """n synthetic documents with novel shingles: every word is an
    8-hex-char slice of sha2(batch:doc:word_position)."""
    base = (batch_id + 1) * 10_000_000  # never collides with seed ids
    words = [
        F.substring(
            F.sha2(
                F.concat_ws(
                    ":", F.lit(batch_id), F.col("id"), F.lit(j)
                ),
                256,
            ),
            1, 8,
        )
        for j in range(WORDS_PER_FRESH)
    ]
    return spark.range(n).select(
        (F.col("id") + base).alias("doc_id"),
        F.concat_ws(" ", *words).alias("text"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pypeman_scale_sf1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark("incr_dedup_perf")
    root = tempfile.mkdtemp(prefix="incr_perf_")
    corpus = TxTable(
        spark, os.path.join(root, "corpus"), key_cols=["doc_id"],
        n_buckets=16,
    )
    index = TxTable(
        spark, os.path.join(root, "mh_index"),
        key_cols=["doc_id", "band"], n_buckets=16,
    )
    # the real-text pool dups are drawn from: the sf corpus originals
    pool = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 5000)
    )
    batches = []
    for k in range(n_batches):
        batch = fresh_docs(spark, k, FRESH_PER_BATCH)
        seed = pool.filter(F.col("doc_id") < DUP_PER_BATCH)
        if k > 0:
            # verbatim copies of the batch-0-ingested real docs,
            # re-keyed per batch: only the INDEX can catch these
            # (their text never rejoins batch 0's)
            dups = seed.select(
                (F.col("doc_id") + 900_000_000 + k * 1_000_000).alias(
                    "doc_id"
                ),
                "text",
            )
            batch = batch.unionByName(dups)
        elif DUP_PER_BATCH:
            # seed the real-text history the later dups point back at
            batch = batch.unionByName(seed)
        hist_rows = index.count() if k else 0
        batch = D.dedupe_exact(batch).localCheckpoint()
        t0 = time.time()
        idx_df = index.snapshot()
        if "band_hash" in idx_df.columns:
            dup_ids = D.minhash_probe(
                batch, idx_df, min_agree=MIN_AGREE
            ).select(F.col("new_id").alias("doc_id")).distinct()
            survivors = batch.join(dup_ids, "doc_id", "left_anti")
        else:
            survivors = batch
        survivors = survivors.localCheckpoint()  # probe runs HERE
        n_new = survivors.count()
        t_probe = time.time() - t0
        t1 = time.time()
        if n_new:
            corpus.append(survivors, txn=("ingest", k))
            index.append(
                D.minhash_index(survivors), txn=("ingest_idx", k)
            )
        t_append = time.time() - t1
        caught = (batch.count() - n_new)
        row = {
            "batch": k,
            "history_index_rows": hist_rows,
            "batch_docs": batch.count(),
            "dups_caught": caught,
            "ingested": n_new,
            "probe_s": round(t_probe, 3),
            "append_s": round(t_append, 3),
        }
        batches.append(row)
        print(row, flush=True)
        if k == 1:
            # zero-copy fork at the SMALL-history point for the
            # retention study below: shallow clones, so the standing
            # probe-cost curve above stays unperturbed (clone DML
            # never touches source bytes)
            corpus.clone(os.path.join(root, "ret_small_c"))
            index.clone(os.path.join(root, "ret_small_i"))

    def retention_point(tag: str, c_path: str, i_path: str) -> dict:
        """index_sync wall for a FIXED 2k-doc delete at this history
        size — flat across points proves the prune is O(deleted), not
        O(index): the candidate list drives a bucket-pruned lookup
        guard plus a dv delete of the dead keys' buckets only."""
        c = TxTable(spark, c_path)
        i = TxTable(spark, i_path)
        doomed = spark.range(10_000_000, 10_002_000).select(
            F.col("id").alias("doc_id")
        )
        c.delete_keys(doomed, mode="dv")
        t0 = time.time()
        pruned = index_sync(c, i, deleted_ids=doomed, bands=4)
        dt = time.time() - t0
        row = {
            "point": tag,
            "history_index_rows": i.count(),
            "deleted_docs": 2000,
            "pruned_ids": pruned,
            "sync_s": round(dt, 3),
        }
        print(row, flush=True)
        return row

    corpus.clone(os.path.join(root, "ret_big_c"))
    index.clone(os.path.join(root, "ret_big_i"))
    retention = [
        retention_point(
            "small",
            os.path.join(root, "ret_small_c"),
            os.path.join(root, "ret_small_i"),
        ),
        retention_point(
            "big",
            os.path.join(root, "ret_big_c"),
            os.path.join(root, "ret_big_i"),
        ),
    ]
    probed = [b for b in batches if b["history_index_rows"] > 0]
    first = probed[0] if probed else batches[-1]
    last = batches[-1]
    out = {
        "metric": "incremental_minhash_probe_cost",
        "unit": "sec",
        "sf_dir": sf_dir,
        "fresh_per_batch": FRESH_PER_BATCH,
        "dup_per_batch": DUP_PER_BATCH,
        "min_agree": MIN_AGREE,
        "batches": batches,
        # the headline ratio: probe time growth vs history growth —
        # flat-ish means the probe is NOT re-reading history text and
        # the index join does not shuffle the history side
        "history_growth_x": round(
            last["history_index_rows"]
            / max(1, first["history_index_rows"]), 2,
        ),
        "probe_growth_x": round(
            last["probe_s"] / max(1e-9, first["probe_s"]), 2
        ),
        # retention cascade (round 14): index_sync wall for an equal
        # 2k-doc delete at a small and a large history — flat means
        # the prune is O(deleted), not O(index)
        "retention_sync": retention,
        "retention_sync_growth_x": round(
            retention[1]["sync_s"]
            / max(1e-9, retention[0]["sync_s"]), 2,
        ),
    }
    print(json.dumps(out))
    with open("INCR_DEDUP_PERF.json", "w") as fh:
        fh.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
