#!/usr/bin/env python
"""Measure recall@k and candidate cost for every ANN path vs exact.

The scale argument for LSH/IVF is only honest with a measured recall
curve: each approximate method trades candidate-generation cost
(fraction of the corpus scored per query) against recall of the exact
top-k. This prints one JSON line per configuration over the test
embeddings so the trade-off is a committed, reproducible number, not a
claim.

Usage: python tools/ann_recall.py [sf_dir] [k]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pypeman_spark.functions import similarity as S  # noqa: E402
from pypeman_spark.session import get_spark  # noqa: E402
from pypeman_spark.sources.tables import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10
N_QUERIES = 20
DIM = 64


def topk_sets(df):
    """{query_id: frozenset(vec_id of its top-k)}"""
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def recall(approx, exact):
    per_q = [
        len(approx.get(qid, set()) & hits) / len(hits)
        for qid, hits in exact.items()
    ]
    return round(sum(per_q) / len(per_q), 4)


def main() -> int:
    spark = get_spark("ann_recall", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    emb = load_table(spark, SF_DIR, "embeddings", parallelize=True).withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    n_corpus = emb.count()
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    exact = topk_sets(S.cosine_topk(emb, queries, k=K))

    def report(name, df, cand_per_query, **cfg):
        r = recall(topk_sets(df), exact)
        print(json.dumps({
            "method": name, "recall_at_k": r, "k": K,
            "corpus": n_corpus, "n_queries": N_QUERIES,
            "candidates_per_query": round(cand_per_query, 1),
            "corpus_fraction_scored": round(cand_per_query / n_corpus, 4),
            **cfg,
        }))

    report("exact", S.cosine_topk(emb, queries, k=K), n_corpus)

    for planes in (4, 6, 8):
        p = S.hyperplanes(planes, DIM)
        c = emb.withColumn("b", S.lsh_bucket(F.col("embedding"), p))
        q = queries.withColumn("b", S.lsh_bucket(F.col("embedding"), p))
        cand = (
            c.join(q.select("query_id", "b"), "b")
            .groupBy("query_id").count().agg(F.avg("count")).collect()[0][0]
        )
        report(
            "lsh", S.lsh_ann_topk(emb, queries, k=K, num_planes=planes, dim=DIM),
            cand or 0.0, num_planes=planes,
        )

    for tables in (2, 4):
        # candidate count = distinct (query, vec) pairs across tables
        pair_union = None
        for tt in range(tables):
            p = S.hyperplanes(4, DIM, seed=f"t{tt}:")
            c = emb.withColumn("b", S.lsh_bucket(F.col("embedding"), p))
            q = queries.withColumn("b", S.lsh_bucket(F.col("embedding"), p))
            pairs = c.join(q.select("query_id", "b"), "b").select(
                "query_id", "vec_id"
            )
            pair_union = pairs if pair_union is None else pair_union.unionByName(pairs)
        cand = (
            pair_union.distinct().groupBy("query_id").count()
            .agg(F.avg("count")).collect()[0][0]
        )
        report(
            "lsh_multi",
            S.lsh_ann_topk_multi(
                emb, queries, k=K, num_planes=4, dim=DIM, num_tables=tables
            ),
            cand or 0.0, num_planes=4, num_tables=tables,
        )

    for nprobe in (1, 2, 4):
        # cost = rows in probed cells
        cent = (
            emb.orderBy("vec_id").limit(8)
            .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
        )
        assigned = S.ivf_assign(emb, cent)
        probes = S._probe_cells(queries, cent, nprobe, "query_id", "embedding")
        cand = (
            assigned.join(probes.select("query_id", "cid"), "cid")
            .groupBy("query_id").count().agg(F.avg("count")).collect()[0][0]
        )
        report(
            "ivf",
            S.ivf_ann_topk(emb, queries, k=K, n_centroids=8, nprobe=nprobe),
            cand or 0.0, n_centroids=8, nprobe=nprobe,
        )

    # ---- PQ/ADC: full-corpus scan over compressed codes ---------------
    # PQ is a different axis than LSH/IVF: it does not prune candidates
    # (every row is scored) — it compresses WHAT is scored: m code ints
    # per row instead of the dim x 8 B vector. Cost is therefore
    # reported as bytes-scanned fraction, not candidate fraction.
    def pq_qerr(corpus_df, books):
        """Mean reconstruction (quantization) error: ADC distance of
        each vector to its own codes — the quantity PQ training
        minimizes (recall@k additionally depends on neighbor-ordering
        survival, so both are reported)."""
        m = len(books)
        ds = len(books[0][0])
        coded = S.pq_encode(corpus_df, books)
        expr = None
        for j in range(m):
            sub = F.slice(F.col("embedding"), j * ds + 1, ds)
            lut = F.transform(
                S._code_array(books[j]), lambda cv: S._l2sq(sub, cv)
            )
            term = F.element_at(lut, F.col("pq_code")[j] + 1)
            expr = term if expr is None else expr + term
        return round(coded.agg(F.avg(expr)).collect()[0][0], 4)

    for m, n_codes in ((4, 8), (8, 16)):
        books = S.pq_codebooks(emb, m=m, n_codes=n_codes, dim=DIM)
        for rerank in (False, True):
            df = S.pq_ann_topk(emb, queries, books, k=K, rerank=rerank)
            print(json.dumps({
                "method": "pq_adc" + ("_rerank4k" if rerank else ""),
                "recall_at_k": recall(topk_sets(df), exact), "k": K,
                "corpus": n_corpus, "n_queries": N_QUERIES,
                "m_subspaces": m, "n_codes": n_codes,
                "quantization_error": pq_qerr(emb, books),
                "code_bytes_per_row": m,
                "vector_bytes_per_row": DIM * 8,
                "bytes_scanned_fraction": round(m / (DIM * 8), 4),
            }))

    # ---- clustered corpus: lowest-id vs KMeans-fitted centroids -------
    # Real embedding corpora are clustered; random vectors are ANN's
    # worst case. This section measures both centroid choices on a
    # corpus with actual cluster structure, at equal nprobe.
    cemb = clustered_corpus(spark).cache()
    cn = cemb.count()
    cqueries = cemb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cexact = topk_sets(S.cosine_topk(cemb, cqueries, k=K))
    centroid_sets = {
        "lowest_id": S._default_centroids(cemb, 8, "vec_id", "embedding"),
        "kmeans": S.kmeans_centroids(cemb, n_centroids=8),
    }
    for cname, cent in centroid_sets.items():
        for nprobe in (1, 2, 4):
            assigned = S.ivf_assign(cemb, cent)
            probes = S._probe_cells(cqueries, cent, nprobe, "query_id", "embedding")
            cand = (
                assigned.join(probes.select("query_id", "cid"), "cid")
                .groupBy("query_id").count().agg(F.avg("count")).collect()[0][0]
            ) or 0.0
            df = S.ivf_ann_topk(
                cemb, cqueries, k=K, nprobe=nprobe, centroids=cent
            )
            print(json.dumps({
                "method": "ivf", "corpus": "clustered", "centroids": cname,
                "recall_at_k": recall(topk_sets(df), cexact), "k": K,
                "corpus_size": cn, "n_queries": N_QUERIES,
                "candidates_per_query": round(cand, 1),
                "corpus_fraction_scored": round(cand / cn, 4),
                "n_centroids": 8, "nprobe": nprobe,
            }))

    # LSH on the clustered corpus: hyperplanes are data-oblivious, so
    # unlike IVF they cannot exploit the cluster structure — measured
    # here to make that comparison concrete at equal cost
    for tables in (2, 4):
        pair_union = None
        for tt in range(tables):
            p = S.hyperplanes(4, DIM, seed=f"t{tt}:")
            c = cemb.withColumn("b", S.lsh_bucket(F.col("embedding"), p))
            q2 = cqueries.withColumn("b", S.lsh_bucket(F.col("embedding"), p))
            pairs = c.join(q2.select("query_id", "b"), "b").select(
                "query_id", "vec_id"
            )
            pair_union = (
                pairs if pair_union is None else pair_union.unionByName(pairs)
            )
        cand = (
            pair_union.distinct().groupBy("query_id").count()
            .agg(F.avg("count")).collect()[0][0]
        ) or 0.0
        df = S.lsh_ann_topk_multi(
            cemb, cqueries, k=K, num_planes=4, dim=DIM, num_tables=tables
        )
        print(json.dumps({
            "method": "lsh_multi", "corpus": "clustered",
            "recall_at_k": recall(topk_sets(df), cexact), "k": K,
            "corpus_size": cn, "n_queries": N_QUERIES,
            "candidates_per_query": round(cand, 1),
            "corpus_fraction_scored": round(cand / cn, 4),
            "num_planes": 4, "num_tables": tables,
        }))

    # IVF+PQ (IVFADC): partition-pruned cells + residual-code ADC +
    # exact re-rank — the composed production stack. Cost per query =
    # candidate fraction (IVF pruning) x bytes fraction (PQ codes),
    # plus 4k exact scores for the re-rank.
    import tempfile

    idx = tempfile.mkdtemp(prefix="ann_recall_ivfpq_") + "/index"
    S.ivfpq_index_write(cemb, idx, n_centroids=8, m=8, n_codes=16, dim=DIM)
    for nprobe in (1, 2, 4):
        df = S.ivfpq_probe(spark, idx, cqueries, k=K, nprobe=nprobe,
                           rerank=True)
        cent = S._default_centroids(cemb, 8, "vec_id", "embedding")
        assigned = S.ivf_assign(cemb, cent)
        probes = S._probe_cells(cqueries, cent, nprobe, "query_id",
                                "embedding")
        cand = (
            assigned.join(probes.select("query_id", "cid"), "cid")
            .groupBy("query_id").count().agg(F.avg("count")).collect()[0][0]
        ) or 0.0
        print(json.dumps({
            "method": "ivfpq_rerank4k", "corpus": "clustered",
            "recall_at_k": recall(topk_sets(df), cexact), "k": K,
            "corpus_size": cn, "n_queries": N_QUERIES,
            "n_centroids": 8, "m_subspaces": 8, "n_codes": 16,
            "nprobe": nprobe,
            "candidates_per_query": round(cand, 1),
            "corpus_fraction_scored": round(cand / cn, 4),
            "bytes_scanned_fraction_within_cells": round(8 / (DIM * 8), 4),
        }))

    # PQ codebooks on the clustered corpus: deterministic vs fitted
    for cbname in ("lowest_id", "kmeans"):
        books = (
            S.pq_codebooks(cemb, m=8, n_codes=16, dim=DIM)
            if cbname == "lowest_id"
            else S.pq_codebooks_kmeans(cemb, m=8, n_codes=16, dim=DIM)
        )
        for rerank in (False, True):
            df = S.pq_ann_topk(cemb, cqueries, books, k=K, rerank=rerank)
            print(json.dumps({
                "method": "pq_adc" + ("_rerank4k" if rerank else ""),
                "corpus": "clustered", "codebooks": cbname,
                "recall_at_k": recall(topk_sets(df), cexact), "k": K,
                "corpus_size": cn, "n_queries": N_QUERIES,
                "m_subspaces": 8, "n_codes": 16,
                "quantization_error": pq_qerr(cemb, books),
                "bytes_scanned_fraction": round(8 / (DIM * 8), 4),
            }))

    # ---- centroid staleness: recall under frozen-quantizer appends ---
    # ivf_index_append assigns against the BUILD-time centroids; as the
    # appended distribution drifts, recall@k on drift-shaped queries
    # decays silently. Measured: build on one cluster set, append
    # 1x/2x/4x the build size from a DIFFERENT cluster set, recall at
    # each step, then ivf_index_maintain's rebuild and the recovery.
    drift_idx = tempfile.mkdtemp(prefix="ann_recall_drift_") + "/index"
    build = clustered_corpus(spark, n=2048, seed=7).cache()
    S.ivf_index_write(
        build, drift_idx,
        centroids=S.kmeans_centroids(build, n_centroids=8),
    )
    dq = clustered_corpus(
        spark, n=N_QUERIES, seed=13, centers_seed=11, id_base=10_000_000
    ).select(F.col("vec_id").alias("query_id"), "embedding").cache()
    total = build
    appended_x = 0
    for step, inc in enumerate((2048, 2048, 4096)):
        batch = clustered_corpus(
            spark, n=inc, seed=20 + step, centers_seed=11,
            id_base=100_000 * (step + 1),
        )
        S.ivf_index_append(spark, drift_idx, batch)
        total = total.unionByName(batch)
        appended_x += inc / 2048
        dexact = topk_sets(S.cosine_topk(total, dq, k=K))
        stale = recall(
            topk_sets(S.ivf_probe(spark, drift_idx, dq, k=K, nprobe=2)),
            dexact,
        )
        g = S.ivf_index_gauges(spark, drift_idx)
        print(json.dumps({
            "method": "ivf_drift", "corpus": "clustered+shifted",
            "appended_x": appended_x, "recall_at_k_stale": stale,
            "k": K, "nprobe": 2, "n_queries": N_QUERIES,
            "appended_fraction": g["appended_fraction"],
            "cell_skew": g["cell_skew"], "max_cell": g["max_cell"],
        }))
    out = S.ivf_index_maintain(spark, drift_idx,
                               max_appended_fraction=0.5)
    dexact = topk_sets(S.cosine_topk(total, dq, k=K))
    rebuilt = recall(
        topk_sets(S.ivf_probe(spark, drift_idx, dq, k=K, nprobe=2)),
        dexact,
    )
    print(json.dumps({
        "method": "ivf_drift_rebuilt", "corpus": "clustered+shifted",
        "appended_x": appended_x, "recall_at_k_rebuilt": rebuilt,
        "k": K, "nprobe": 2, "rebuild_reason": out["reason"],
        "cell_skew_after": out["after"]["cell_skew"],
        "appended_fraction_after": out["after"]["appended_fraction"],
    }))
    return 0


def clustered_corpus(spark, n=4096, dim=DIM, n_clusters=8, sigma=0.25,
                     seed=7, centers_seed=None, id_base=0):
    """Synthetic corpus WITH cluster structure: unit-norm cluster
    centers + Gaussian noise, re-normalized. Deterministic via the
    seed; this is the regime real embedding corpora live in.
    ``centers_seed`` decouples the cluster CENTERS from the point
    noise so a drift study can sample several independent batches
    (different ``seed``) from one shifted distribution (same
    ``centers_seed``); ``id_base`` keeps batch ids disjoint."""
    import numpy as np

    rng = np.random.default_rng(seed)
    # centers_seed=None draws centers from the SAME stream, in the
    # same order, as every prior round's run — the standing numbers
    # in ANN_RECALL.md stay comparable
    centers = (
        rng.normal(size=(n_clusters, dim))
        if centers_seed is None
        else np.random.default_rng(centers_seed).normal(
            size=(n_clusters, dim)
        )
    )
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_clusters, size=n)
    pts = centers[labels] + sigma * rng.normal(size=(n, dim))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    return spark.createDataFrame(
        [(i + id_base, [float(x) for x in pts[i]]) for i in range(n)],
        "vec_id bigint, embedding array<double>",
    ).repartition(8)


if __name__ == "__main__":
    sys.exit(main())
