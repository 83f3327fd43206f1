"""Streaming corpus ingestion: the day-2 recipe as a foreachBatch sink.

``examples/incremental_corpus.py`` shows the batch loop; this module
packages the same semantics for Structured Streaming — every arriving
micro-batch is deduped within itself, probed against the PERSISTED
MinHash index (history text never re-read), and the survivors appended
to BOTH tables exactly-once (TxTable txn markers keyed by the stream's
batch_id, so a checkpoint-restart re-delivery is a provable no-op).

Reference basis: the reference engine's channels replay safely via
message-store state (``/root/reference/pypeman/channels.py`` process /
replay); re-expressed Spark-first as Delta-style idempotent table
appends driven by ``writeStream.foreachBatch``. The dedup tier is
Broder MinHash / banded LSH (``functions/dedup.py``).

Scale contract (same as the probe's): per micro-batch the history
contributes only a narrow-column index scan that streams map-side
through the (band, band_hash) equi-join — the batch side broadcasts,
the corpus text of everything already ingested never moves. Measured
flat-ish in history size in ``INCR_DEDUP_PERF.md``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import dedup as D


def incremental_ingest_sink(
    corpus,
    index,
    app: str = "ingest",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    min_agree: int = 8,
    within_batch: bool = True,
):
    """foreachBatch sink factory:
    ``writeStream.foreachBatch(incremental_ingest_sink(corpus, index))``.

    ``corpus`` and ``index`` are :class:`~pypeman_spark.store.TxTable`
    handles; the index table holds :func:`~pypeman_spark.functions.
    dedup.minhash_index` rows and grows with every ingested batch.
    Each micro-batch is exact-deduped within itself, near-dup-deduped
    WITHIN the batch (``within_batch`` — self-probe of the batch's own
    index rows, keeping the lowest id of each agreeing pair; a batch
    that arrives carrying two paraphrases of one document must not
    ingest both), near-dup-probed against the index, and the survivors
    appended to both tables under txn ids ``(app, batch_id)`` /
    ``(app + "_idx", batch_id)`` — a re-delivered batch (crash between
    the appends and the stream's checkpoint commit) no-ops on
    whichever appends already landed, so the pair converges
    exactly-once without a cross-table transaction.

    Cost shape: the batch's MinHash signatures are computed ONCE
    (``minhash_index`` rows), reused for the self-probe, the history
    probe, and the index append — per batch the history contributes
    only its narrow index scan, never text, never a shuffle of
    history-sized data.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch = D.dedupe_exact(
            batch_df, text_col=text_col, id_col=id_col
        )
        mh = dict(
            text_col=text_col, id_col=id_col, num_hashes=num_hashes,
            bands=bands, shingle_n=shingle_n,
        )
        rows = D.minhash_index(batch, **mh).localCheckpoint()
        if within_batch:
            self_dups = (
                D.minhash_probe(
                    batch, rows, min_agree=min_agree,
                    new_index_df=rows, **mh,
                )
                .filter(F.col("hist_id") < F.col("new_id"))
                .select(F.col("new_id").alias(id_col)).distinct()
            )
            batch = batch.join(self_dups, id_col, "left_anti")
            rows = rows.join(self_dups, id_col, "left_anti")
        idx_df = index.snapshot()
        if "band_hash" in idx_df.columns:
            dup_ids = D.minhash_probe(
                batch, idx_df, min_agree=min_agree,
                new_index_df=rows, **mh,
            ).select(F.col("new_id").alias(id_col)).distinct()
            survivors = batch.join(dup_ids, id_col, "left_anti")
        else:  # virgin index: nothing ingested yet, no schema to probe
            survivors = batch
        # one materialization: everything below appends THIS relation
        survivors = survivors.localCheckpoint()
        if survivors.count():
            corpus.append(survivors, txn=(app, int(batch_id)))
            index.append(
                rows.join(survivors, id_col, "left_semi"),
                txn=(f"{app}_idx", int(batch_id)),
            )

    return _sink
