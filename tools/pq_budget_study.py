#!/usr/bin/env python
"""PQ at production code budgets (VERDICT r5 #4).

ANN_RECALL.md's r5 study ran PQ at toy budgets (m=4-8 x 8-16 codes)
and correctly diagnosed that recall was SHORTLIST-bound: the ADC
ordering was too coarse for nprobe/codebook quality to matter. This
study re-runs the clustered-corpus measurement at the Faiss-default
regime the docstrings cite — m=8 sub-spaces x 256 KMeans codes (8
bytes/vector, 64x compression) — and publishes the recall@10-vs-
shortlist curve against the toy budget, so the claim "a tighter ADC
ordering buys a smaller shortlist for the same recall" is a measured
number.

Prints one JSON line per configuration; the committed table lives in
ANN_RECALL.md. The deterministic gate entries (pq_ann_topk /
ivfpq_index_probe) are untouched — this is measurement tooling only.

Usage: python tools/pq_budget_study.py [n_corpus]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pypeman_spark.functions import similarity as S  # noqa: E402
from pypeman_spark.session import get_spark  # noqa: E402

from ann_recall import clustered_corpus, recall, topk_sets  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
K = 10
N_QUERIES = 20
DIM = 64
SHORTLISTS = (10, 20, 40, 80, 160)


def main() -> int:
    spark = get_spark(
        "pq_budget", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    )
    emb = clustered_corpus(spark, n=N).cache()
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = topk_sets(S.cosine_topk(emb, queries, k=K))

    budgets = [
        ("toy", 8, 16),        # r5 regime: 8 x 16 codes (4 bits/code)
        ("faiss_default", 8, 256),  # m=8 x 256 codes (8 bits/code)
    ]
    for label, m, n_codes in budgets:
        books = S.pq_codebooks_kmeans(emb, m=m, n_codes=n_codes, dim=DIM)
        # pure ADC ordering (no re-rank): how good is the compressed
        # ordering by itself?
        adc = S.pq_ann_topk(emb, queries, books, k=K, rerank=False)
        base = {
            "budget": label, "m_subspaces": m, "n_codes": n_codes,
            "codebooks": "kmeans", "corpus": "clustered",
            "corpus_size": n, "n_queries": N_QUERIES, "k": K,
            "code_bytes_per_row": m,
            "compression_x": DIM * 8 // m,
        }
        print(json.dumps({
            **base, "method": "pq_adc", "shortlist": None,
            "recall_at_k": recall(topk_sets(adc), exact),
        }))
        for shortlist in SHORTLISTS:
            df = S.pq_ann_topk(
                emb, queries, books, k=K, rerank=True,
                n_candidates=shortlist,
            )
            print(json.dumps({
                **base, "method": "pq_adc_rerank", "shortlist": shortlist,
                "recall_at_k": recall(topk_sets(df), exact),
            }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
