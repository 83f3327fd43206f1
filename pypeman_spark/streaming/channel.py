"""Streaming channel: the pypeman channel lifecycle on Structured
Streaming (SURVEY §2.H rows 62-65, §3.1).

A :class:`StreamingChannel` binds a streaming message DataFrame (from
sources/) to a :class:`~pypeman_spark.pipeline.Pipeline` via
``foreachBatch``:

* each micro-batch runs the pipeline (one Catalyst plan per batch);
* outcomes are appended to the message store (audit) in bulk;
* rows whose ``state`` is ``wait_retry`` — or error rows when
  ``retry_on_error`` — are parked in the retry store with their re-entry
  stage (dead-letter topology, ``retry.py:13-240``);
* the channel lifecycle (STARTING/PROCESSING/WAITING/STOPPED) mirrors
  ``channels.py:65-66`` via the StreamingQuery state, and listeners can
  subscribe through :func:`add_listener` (events.py:6-60 parity via
  ``StreamingQueryListener``).

Exactly-once: the file-source offset log + checkpointLocation give
at-least-once delivery into ``foreachBatch``; the audit append is keyed
by message id so replays are idempotent at the query level.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, functions as F

from ..message import WAIT_RETRY
from ..pipeline import Pipeline

__all__ = ["StreamingChannel"]


class StreamingChannel:
    STARTING = "STARTING"
    WAITING = "WAITING"
    PROCESSING = "PROCESSING"
    STOPPED = "STOPPED"

    def __init__(
        self,
        source: DataFrame,
        pipeline: Pipeline,
        message_store=None,
        retry_store=None,
        retry_on_error: bool = False,
        checkpoint_dir: str | None = None,
    ):
        self.source = source
        self.pipeline = pipeline
        self.message_store = message_store
        self.retry_store = retry_store
        self.retry_on_error = retry_on_error
        self.checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(
            prefix=f"pypeman_spark_ckpt_{pipeline.channel}_"
        )
        self.query = None
        self.batches_processed = 0

    # -- foreachBatch body ----------------------------------------------
    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        try:
            if self.message_store is not None:
                self.message_store.store(batch_df)
            res = self.pipeline.run(batch_df)
            out = res.all
            if self.retry_store is not None:
                retry_cond = F.col("state") == WAIT_RETRY
                if self.retry_on_error:
                    retry_cond = retry_cond | (F.col("state") == "error")
                to_retry = out.filter(retry_cond)
                if not to_retry.isEmpty():
                    self.retry_store.store_until_retry(to_retry, None)
                    out = out.filter(~retry_cond)
            if self.message_store is not None:
                self.message_store.change_message_states(out)
                self.message_store.add_meta_from_messages(out)
            self.batches_processed += 1
        finally:
            # branch fan-outs persist per batch; release so a long-running
            # stream doesn't accumulate cached frames across micro-batches
            self.pipeline.release()

    # -- lifecycle (channels.py:206-247) --------------------------------
    def start(self, trigger: dict | None = None):
        writer = (
            self.source.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", os.path.join(self.checkpoint_dir, "cp"))
            .outputMode("update")
        )
        if trigger:
            writer = writer.trigger(**trigger)
        self.query = writer.start()
        return self.query

    @property
    def status(self) -> str:
        if self.query is None:
            return self.STOPPED
        if not self.query.isActive:
            return self.STOPPED
        s = self.query.status
        return self.PROCESSING if s.get("isTriggerActive") else self.WAITING

    def process_all_available(self) -> None:
        """Drain everything currently available (test/batch-drive mode —
        ``handle_and_wait`` parity for streams)."""
        assert self.query is not None, "channel not started"
        self.query.processAllAvailable()

    def stop(self) -> None:
        if self.query is not None:
            self.query.stop()
            self.query = None

    def run_retries_once(self) -> dict:
        """One retry sweep (the reference's background loop body)."""
        assert self.retry_store is not None
        return self.retry_store.retry_once(self.pipeline)


def add_channel_listener(spark, on_event) -> object:
    """Channel state-change events (``events.py:6-60``,
    ``channels.py:192-198``) via ``StreamingQueryListener``: ``on_event``
    receives ``(kind, query_id, payload)`` with kind in
    start|progress|terminate. Returns the listener (pass to
    ``spark.streams.removeListener`` to detach)."""
    from pyspark.sql.streaming import StreamingQueryListener

    class _Listener(StreamingQueryListener):
        def onQueryStarted(self, event):
            on_event("start", str(event.id), {"name": event.name})

        def onQueryProgress(self, event):
            p = event.progress
            on_event(
                "progress",
                str(p.id),
                {"batchId": p.batchId, "numInputRows": p.numInputRows},
            )

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            on_event("terminate", str(event.id), {"exception": event.exception})

    listener = _Listener()
    spark.streams.addListener(listener)
    return listener
