"""End-to-end embedding similarity search, composed from the
`functions.similarity` family — the build → index → query lifecycle a
production retrieval pipeline runs:

1. **Build** — fit KMeans centroids on the corpus, write the persisted
   IVF+PQ index: vectors partitioned by centroid cell, each row
   carrying residual PQ codes (`ivfpq_index_write`).
2. **Ingest** — append a fresh batch against the PERSISTED centroids
   without rewriting the index (`ivf_index_append` shape; here shown
   with the plain IVF index since IVF+PQ appends reuse the same
   assignment path).
3. **Query** — probe the index: unprobed cells pruned at file-listing
   time, ADC scoring over codes only, exact-cosine re-rank of the
   shortlist (`ivfpq_probe`).
4. **Verify** — spot-check recall of the approximate path against the
   exact brute-force baseline on the same queries (`cosine_topk`).

At 100 TB the numbers that matter: the probe scans ~nprobe/C of the
index, the ADC stage reads m code ints per row instead of the vector,
and only the shortlist ever touches vector data again.

Run: ``python examples/ann_search.py [sf_dir] [index_dir]``
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from pypeman_spark import get_spark
from pypeman_spark.functions import similarity as S
from pypeman_spark.sources.tables import load_table


def build_index(
    corpus: DataFrame, path: str, n_centroids: int = 8, fitted: bool = True
) -> str:
    """Fit centroids (KMeans when ``fitted``, else the deterministic
    lowest-id convention) and persist the IVF+PQ index."""
    centroids = (
        S.kmeans_centroids(corpus, n_centroids=n_centroids)
        if fitted
        else None
    )
    return S.ivfpq_index_write(
        corpus, path, n_centroids=n_centroids, m=4, n_codes=8, dim=64,
        centroids=centroids,
    )


def search(
    spark, path: str, queries: DataFrame, k: int = 5, nprobe: int = 2
) -> DataFrame:
    """Partition-pruned ADC probe + exact re-rank."""
    return S.ivfpq_probe(spark, path, queries, k=k, nprobe=nprobe)


def recall_vs_exact(spark, path: str, corpus: DataFrame, queries: DataFrame,
                    k: int = 5, nprobe: int = 2) -> float:
    """Fraction of exact top-k recovered by the approximate probe."""
    exact: dict[int, set] = {}
    for r in S.cosine_topk(corpus, queries, k=k).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx: dict[int, set] = {}
    for r in search(spark, path, queries, k=k, nprobe=nprobe).collect():
        approx.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = [
        len(approx.get(q, set()) & want) / len(want)
        for q, want in exact.items()
    ]
    return sum(hits) / len(hits)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(tempfile.mkdtemp(prefix="ann_example_"), "index")
    )
    spark = get_spark("ann_search_example", cpus=8)
    corpus = load_table(spark, sf_dir, "embeddings", parallelize=True).withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = corpus.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    build_index(corpus, path, fitted=True)
    hits = search(spark, path, queries, k=5, nprobe=2)
    print(f"top-5 rows: {hits.count()}")
    r = recall_vs_exact(spark, path, corpus, queries, k=5, nprobe=2)
    print(f"recall@5 vs exact at nprobe=2: {r:.3f}")
    print(f"index at: {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
