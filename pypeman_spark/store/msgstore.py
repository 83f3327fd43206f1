"""Message store — the reference's queryable table (SURVEY §1.3, §2.G).

Reference: ``pypeman/msgstore.py``. Every message is persisted with its
state transitions and searchable meta; the file backend lays messages out
as ``<store>/<YYYY>/<MM>/<DD>/<ts>_<uuid>`` — i.e. date partitioning with
directory pruning (``msgstore.py:805-811``).

Spark design — an **append-only event-sourced audit table** on parquet
(Delta-ready: every mutation is an append; with Delta the same API maps
to MERGE/DELETE):

* ``messages/`` — one row per stored message, Hive-partitioned by
  ``date`` (Catalyst partition pruning replaces directory skipping).
* ``events/``  — state changes / sub-message states / meta additions as
  appended events; "current" values resolve with a max-timestamp window,
  so no rewrite is ever needed. This is the plain-parquet fallback of
  SURVEY §7.4 ("mutable-store semantics on parquet").

At 100 TB the messages table is the one that grows; events stay tiny
relative to it. ``search`` compiles to a single Catalyst plan with
partition pruning on ``date``, predicate pushdown on ``timestamp`` and
LIMIT pushdown for pagination.

Backends mirror the reference: :class:`NullMessageStore`
(``msgstore.py:315``), :class:`MemoryMessageStore` (``msgstore.py:424``)
and :class:`FileMessageStore` (parquet; ``msgstore.py:576``) share one
implementation parameterized by path — memory uses a temp dir.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
import uuid as _uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

from ..message import (
    MESSAGE_COLUMNS,
    PENDING,
    STATES_PRIORITY,
    ensure_message_columns,
    renew,
    worst_state_expr,
)

__all__ = [
    "MessageStore", "NullMessageStore", "MemoryMessageStore",
    "FileMessageStore", "StoreLockTimeout",
]


class StoreLockTimeout(RuntimeError):
    """Another writer holds the store's lease (``.store_lock``) and it
    did not free up within the wait budget."""

_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("kind", T.StringType()),  # state | substate | meta
        T.StructField("state", T.StringType()),
        T.StructField("sub_id", T.StringType()),
        T.StructField("meta_key", T.StringType()),
        T.StructField("meta_value", T.StringType()),
        T.StructField("event_ts", T.DoubleType()),
    ]
)


class MessageStore:
    """Parquet-backed audit table with the full §2.G query surface."""

    #: seconds after which an unrefreshed lease from a dead pid is stale
    LOCK_TTL = 600.0

    def __init__(self, spark: SparkSession, base_path: str, channel: str = "default"):
        self.spark = spark
        self.base_path = base_path
        self.channel = channel
        self.msg_path = os.path.join(base_path, "messages")
        self.event_path = os.path.join(base_path, "events")
        # id -> date side table: lets point lookups prune to ONE date
        # partition instead of scanning the whole store (see _id_dates)
        self.index_path = os.path.join(base_path, "id_index")
        self.lock_path = os.path.join(base_path, ".store_lock")
        self.journal_path = os.path.join(base_path, ".compact_journal")
        # roll forward a compact() another process died in the middle of
        self._recover()

    # -- single-writer lease ---------------------------------------------
    # The reference's file store gets single-process safety for free
    # (one pypeman daemon owns the directory). A Spark store does not:
    # a compact()'s directory swap racing a concurrent store() append
    # could drop the appended rows with no error. Every mutating entry
    # point therefore takes a lease file first (VERDICT r6 task #6).
    # O_CREAT|O_EXCL creation is the atomic primitive; a lease whose
    # holder pid is dead (same host) or whose mtime exceeds LOCK_TTL is
    # broken and retaken. The unavoidable fine-print: breaking a stale
    # lock has a tiny TOCTOU window (two breakers racing) — acceptable
    # for a crashed-holder recovery path; live writers never race
    # because live leases are refreshed by their mtime at creation.
    # Readers are NOT serialized: current() on another process during a
    # swap can transiently see an empty messages dir (documented in
    # compact()); same-process reads are safe because compact holds the
    # GIL-side state and finishes the swap before returning.

    def _lock_is_stale(self, now: float) -> bool:
        # pid liveness is authoritative (a long compact legitimately
        # outlives LOCK_TTL); the mtime TTL is the fallback when the
        # pid can't be read — e.g. a truncated lease from a crash
        try:
            with open(self.lock_path) as fh:
                pid = int(fh.read().split()[0])
        except FileNotFoundError:
            return False  # holder released; acquire loop retries
        except (OSError, ValueError, IndexError):
            try:
                return now - os.stat(self.lock_path).st_mtime > self.LOCK_TTL
            except OSError:
                return False
        if pid == os.getpid():
            return False
        try:
            os.kill(pid, 0)
            return False  # holder alive
        except ProcessLookupError:
            return True  # same-host pid is gone
        except OSError:
            return False  # e.g. EPERM: alive but not ours

    def _acquire_lock(self, op: str, timeout: float = 30.0) -> None:
        os.makedirs(self.base_path, exist_ok=True)
        deadline = time.monotonic() + timeout
        while True:
            try:
                fd = os.open(
                    self.lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY
                )
                with os.fdopen(fd, "w") as fh:
                    fh.write(f"{os.getpid()} {op} {time.time()}")
                return
            except FileExistsError:
                if self._lock_is_stale(time.time()):
                    try:
                        os.unlink(self.lock_path)
                    except FileNotFoundError:
                        pass
                    continue
                if time.monotonic() >= deadline:
                    raise StoreLockTimeout(
                        f"store {self.base_path} is locked by another "
                        f"writer (op={op}, waited {timeout}s)"
                    ) from None
                time.sleep(0.05)

    def _release_lock(self) -> None:
        try:
            os.unlink(self.lock_path)
        except FileNotFoundError:
            pass

    @contextmanager
    def _writer_lock(self, op: str, timeout: float = 30.0):
        self._acquire_lock(op, timeout=timeout)
        try:
            yield
        finally:
            self._release_lock()

    # -- crash recovery ---------------------------------------------------
    def _needs_recovery(self) -> bool:
        if os.path.isfile(self.journal_path):
            return True
        if os.path.isdir(self.base_path):
            for name in os.listdir(self.base_path):
                if name.startswith(".compact_") and name != os.path.basename(
                    self.journal_path
                ):
                    return True
        return False

    def _recover(self) -> None:
        """Complete a compact() swap a previous process died inside.

        compact() fully writes the three fresh directories, then
        journals the (live, fresh) pairs (tmp+rename, atomic), then
        swaps. A crash before the journal leaves only orphan
        ``.compact_*`` dirs — the store is untouched and the orphans
        are swept. A crash during the swap leaves the journal — every
        fresh dir is complete by construction, so recovery ROLLS
        FORWARD: finish each pair's rename sequence idempotently and
        remove the journal. Either way a reader after recovery sees
        wholly-old or wholly-new state, never a mix.

        Runs ONLY under the writer lease: a journal or fresh dirs seen
        while a LIVE writer holds ``.store_lock`` belong to an
        in-flight compact() that will finish its own swap — sweeping
        them from a second process would race the live rename sequence
        and can delete the messages directory outright. Recovery
        therefore only ever processes a journal whose holder is
        provably dead (stale/absent lease)."""
        if not self._needs_recovery():
            return
        if os.path.isfile(self.lock_path) and not self._lock_is_stale(time.time()):
            return  # live writer mid-compact; it owns the journal
        try:
            with self._writer_lock("recover", timeout=5.0):
                if self._needs_recovery():  # recheck under the lease
                    self._recover_locked()
        except StoreLockTimeout:
            pass  # a live writer appeared; it finishes its own swap

    def _recover_locked(self) -> None:
        import json as _json

        if os.path.isfile(self.journal_path):
            with open(self.journal_path) as fh:
                pairs = _json.load(fh)["pairs"]
            for live, fresh in pairs:
                old = live + ".old"
                if os.path.isdir(fresh):
                    if os.path.isdir(live) and not os.path.isdir(old):
                        os.replace(live, old)
                    if not os.path.isdir(live):
                        os.replace(fresh, live)
                shutil.rmtree(old, ignore_errors=True)
                shutil.rmtree(fresh, ignore_errors=True)
            os.unlink(self.journal_path)
        # orphan temp dirs from a pre-journal crash: store is intact,
        # the half-written output is garbage
        if os.path.isdir(self.base_path):
            for name in os.listdir(self.base_path):
                if name.startswith(".compact_") and name != os.path.basename(
                    self.journal_path
                ):
                    shutil.rmtree(
                        os.path.join(self.base_path, name), ignore_errors=True
                    )

    # -- writes ----------------------------------------------------------
    def store(self, df: DataFrame, state: str = PENDING) -> None:
        """Append messages with state=pending (``msgstore.py:617-634``).
        Partitioned by date(timestamp) — the reference's YYYY/MM/DD tree."""
        out = (
            ensure_message_columns(df, channel=self.channel)
            .select(*MESSAGE_COLUMNS)
            .withColumn("state", F.lit(state))
            .withColumn("date", F.to_date("timestamp"))
        )
        with self._writer_lock("store"):
            out.write.mode("append").partitionBy("date").parquet(self.msg_path)
            out.select("id", "date").write.mode("append").parquet(
                self.index_path
            )

    def _append_events(self, rows: list[tuple]) -> None:
        df = self.spark.createDataFrame(rows, _EVENT_SCHEMA)
        with self._writer_lock("events"):
            df.write.mode("append").parquet(self.event_path)

    def change_message_state(self, msg_id: str, state: str) -> None:
        """``msgstore.py:110-130``."""
        self._append_events([(msg_id, "state", state, None, None, None, time.time())])

    def change_message_states(self, df: DataFrame, state_col: str = "state") -> None:
        """Bulk variant: one append for a whole batch's outcomes — the
        scale path (per-row events would be a driver loop)."""
        ev = df.select(
            F.col("id"),
            F.lit("state").alias("kind"),
            F.col(state_col).alias("state"),
            F.lit(None).cast("string").alias("sub_id"),
            F.lit(None).cast("string").alias("meta_key"),
            F.lit(None).cast("string").alias("meta_value"),
            F.lit(time.time()).alias("event_ts"),
        )
        with self._writer_lock("events"):
            ev.write.mode("append").parquet(self.event_path)

    def add_meta_from_messages(self, df: DataFrame) -> None:
        """Bulk flush of node-level ``store_meta`` captures: explode the
        ``__store_meta`` column (built by ``Node._append_store_meta``)
        into ``kind=meta`` events — one distributed append for the whole
        batch (``nodes.py:216-222`` per-message, done set-at-a-time)."""
        if "__store_meta" not in df.columns:
            return
        ev = (
            df.filter(F.col("__store_meta").isNotNull())
            .select("id", F.explode("__store_meta").alias("__e"))
            .select(
                F.col("id"),
                F.lit("meta").alias("kind"),
                F.lit(None).cast("string").alias("state"),
                F.lit(None).cast("string").alias("sub_id"),
                F.col("__e.key").alias("meta_key"),
                F.col("__e.value").alias("meta_value"),
                F.lit(time.time()).alias("event_ts"),
            )
        )
        with self._writer_lock("events"):
            ev.write.mode("append").parquet(self.event_path)

    def add_sub_message_state(self, msg_id: str, sub_id: str, state: str) -> None:
        """``msgstore.py:74-108``."""
        self._append_events([(msg_id, "substate", state, sub_id, None, None, time.time())])

    def add_message_meta_infos(self, msg_id: str, name: str, value: str) -> None:
        """Append ``value`` to the store-meta list ``name``
        (``msgstore.py:44-64``)."""
        self._append_events([(msg_id, "meta", None, None, name, str(value), time.time())])

    def set_state_to_worst_sub_state(self, msg_id: str) -> None:
        """``msgstore.py:687-705``: state := worst recorded substate."""
        ev = self._events().filter(
            (F.col("id") == msg_id) & (F.col("kind") == "substate")
        )
        states = [r["state"] for r in ev.select("state").collect()]
        if states:
            worst = max(states, key=lambda s: STATES_PRIORITY.index(s))
            self.change_message_state(msg_id, worst)

    def delete(self, msg_id: str) -> None:
        """``msgstore.py:877-888``. Append a tombstone event; the current
        view filters deleted ids (parquet is immutable; Delta: DELETE)."""
        self._append_events([(msg_id, "delete", None, None, None, None, time.time())])

    def delete_many(self, msg_ids: list[str]) -> None:
        """Bulk tombstone: ONE event-log append for any number of ids —
        the scale path (per-id :meth:`delete` is a driver loop of tiny
        writes)."""
        if not msg_ids:
            return
        now = time.time()
        self._append_events(
            [(mid, "delete", None, None, None, None, now) for mid in msg_ids]
        )

    def apply_retention(
        self,
        keep_days: int | None = None,
        before=None,
    ) -> list[str]:
        """Expire messages older than the cutoff by DROPPING whole date
        partitions — the retention shape that stays cheap at 100 TB:
        a ``date=YYYY-MM-DD`` directory removal is a file-listing
        operation, no scan, no rewrite, no tombstones (contrast
        :meth:`delete_many`, which is for targeted ids). Events and
        id-index rows for expired ids become orphans the next
        :meth:`compact` discards (a stale index row is harmless
        meanwhile: it prunes to a partition that no longer exists, so
        lookups correctly return nothing).

        Pass ``keep_days`` (cutoff = today - keep_days, driver clock)
        or an explicit ``before`` date/"YYYY-MM-DD" string; partitions
        STRICTLY OLDER than the cutoff are removed. Returns the dropped
        partition names."""
        import datetime as _dt

        if (keep_days is None) == (before is None):
            raise ValueError("pass exactly one of keep_days / before")
        if before is None:
            cutoff = _dt.date.today() - _dt.timedelta(days=keep_days)
        elif isinstance(before, str):
            cutoff = _dt.date.fromisoformat(before)
        else:
            cutoff = before
        dropped = []
        if not os.path.isdir(self.msg_path):
            return dropped
        # under the lease: a per-partition rmtree is individually
        # atomic and expiry is idempotent (a crash mid-sweep just
        # leaves later partitions for the next run), but it must not
        # interleave with a compact() swapping the same directory
        with self._writer_lock("retention"):
            for name in sorted(os.listdir(self.msg_path)):
                if not name.startswith("date="):
                    continue
                try:
                    part_date = _dt.date.fromisoformat(name[5:])
                except ValueError:
                    continue
                if part_date < cutoff:
                    shutil.rmtree(
                        os.path.join(self.msg_path, name), ignore_errors=True
                    )
                    dropped.append(name)
        return dropped

    def compact(self) -> None:
        """Fold the event log into the base table (the plain-parquet
        analogue of Delta OPTIMIZE + checkpoint).

        The event log grows with every state change; ``current()`` pays
        one extra join chain per query until it is folded. Compaction
        rewrites the base from ``current()`` (latest state and substates
        become base columns, tombstoned rows disappear) and re-emits
        store-meta lists as a fresh, minimal event log — schemas are
        unchanged, so readers never see a special case.

        Concurrency + crash safety (VERDICT r6 #6): the whole fold —
        snapshot through swap — runs under the writer lease, so a
        concurrent ``store()``/event append blocks rather than landing
        rows the swap would silently discard. The three-directory swap
        itself is made atomic-or-completable by a journal: the fresh
        dirs are fully written first, then ``.compact_journal`` records
        the (live, fresh) pairs (tmp+rename), then the renames run and
        the journal is removed. A crash anywhere leaves either an
        untouched store (pre-journal; orphans swept on next open) or a
        journal that :meth:`_recover` rolls FORWARD on the next open —
        never a mixed old-messages/new-events state. Cross-process
        readers mid-swap can transiently see a missing directory
        (read as empty); serializing readers would need a catalog
        layer (Delta), which the docstring above scopes out.

        The id→date side index is rewritten in the same pass: every
        ``store()`` appends a small parquet file to it and deletions/
        retention leave stale rows, so without this the index would be
        an ever-growing many-small-files scan. The rewrite derives
        (id, date) from the surviving rows only — deleted and expired
        ids drop out — written with a bounded file count sized from
        the surviving row count (~2M index rows per file), never a
        single-task coalesce(1) that would bottleneck a big store's
        compaction on one executor."""
        import json as _json

        self._acquire_lock("compact", timeout=300.0)
        cur = None
        try:
            # a previous holder may have died mid-swap after this
            # process opened its store handle — roll forward first,
            # now that the lease proves the journal's holder is dead
            if self._needs_recovery():
                self._recover_locked()
            cur = self.current().cache()
            new_msg = os.path.join(self.base_path, f".compact_msg_{_uuid.uuid4().hex}")
            new_ev = os.path.join(self.base_path, f".compact_ev_{_uuid.uuid4().hex}")
            new_idx = os.path.join(self.base_path, f".compact_idx_{_uuid.uuid4().hex}")
            (
                cur.select(*MESSAGE_COLUMNS)
                .withColumn("date", F.to_date("timestamp"))
                .write.mode("overwrite")
                .partitionBy("date")
                .parquet(new_msg)
            )
            meta_ev = (
                cur.filter(F.col("store_meta").isNotNull())
                .select(
                    "id",
                    F.explode("store_meta").alias("meta_key", "__vals"),
                )
                .select(
                    "id", F.posexplode("__vals").alias("__pos", "meta_value"), "meta_key"
                )
                .select(
                    F.col("id"),
                    F.lit("meta").alias("kind"),
                    F.lit(None).cast("string").alias("state"),
                    F.lit(None).cast("string").alias("sub_id"),
                    F.col("meta_key"),
                    F.col("meta_value"),
                    # position preserves list order through the re-read
                    (F.lit(time.time()) + F.col("__pos")).alias("event_ts"),
                )
            )
            meta_ev.write.mode("overwrite").parquet(new_ev)
            idx_files = max(1, cur.count() // 2_000_000)
            (
                cur.select("id", F.to_date("timestamp").alias("date"))
                .repartition(idx_files)
                .write.mode("overwrite")
                .parquet(new_idx)
            )
            pairs = [
                (self.msg_path, new_msg),
                (self.event_path, new_ev),
                (self.index_path, new_idx),
            ]
            # journal BEFORE the first rename: from here a crash is
            # rolled forward by _recover(); before here the store is
            # untouched and the fresh dirs are swept as orphans
            jtmp = self.journal_path + ".tmp"
            with open(jtmp, "w") as fh:
                _json.dump({"pairs": pairs}, fh)
            os.replace(jtmp, self.journal_path)
            for live, fresh in pairs:
                old = live + ".old"
                if os.path.isdir(live):
                    os.replace(live, old)
                os.replace(fresh, live)
                shutil.rmtree(old, ignore_errors=True)
            os.unlink(self.journal_path)
        finally:
            if cur is not None:
                cur.unpersist()
            self._release_lock()

    # -- reads -----------------------------------------------------------
    def _messages(self) -> DataFrame:
        from ..message import MESSAGE_SCHEMA

        empty_schema = T.StructType(
            MESSAGE_SCHEMA.fields + [T.StructField("date", T.DateType())]
        )
        # existence checks avoid a logged JVM FileNotFound on fresh
        # stores and UNABLE_TO_INFER_SCHEMA on a store whose every date
        # partition was expired by apply_retention (dir exists, empty)
        if not os.path.isdir(self.msg_path) or not any(
            n.startswith("date=") for n in os.listdir(self.msg_path)
        ):
            return self.spark.createDataFrame([], empty_schema)
        return self.spark.read.parquet(self.msg_path)

    def _events(self) -> DataFrame:
        if not os.path.isdir(self.event_path):
            return self.spark.createDataFrame([], _EVENT_SCHEMA)
        return self.spark.read.schema(_EVENT_SCHEMA).parquet(self.event_path)

    def current(self, dates: list | None = None) -> DataFrame:
        """Current view: base messages + latest state event + substates +
        store-meta lists. All four joins key on ``id`` — no broadcast
        hints: the event aggregates scale 1:1 with message volume, so
        AQE broadcasts them while small and co-shuffles at scale (one
        shared hash partitioning on ``id`` across the join chain).

        ``dates`` (internal, from :meth:`_id_dates`) pre-filters the
        base scan on the partition column so point lookups read one
        date directory instead of the whole store; every event join
        still applies, so semantics are identical to the full view."""
        msgs = self._messages()
        if dates:
            msgs = msgs.filter(F.col("date").isin(list(dates)))
        events = self._events()

        w = Window.partitionBy("id").orderBy(F.col("event_ts").desc())
        latest_state = (
            events.filter(F.col("kind") == "state")
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("id", F.col("state").alias("__new_state"))
        )
        substates = (
            events.filter(F.col("kind") == "substate")
            .groupBy("id")
            .agg(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("sub_id"), F.col("state"), F.col("event_ts").alias("ts")
                        )
                    )
                ).alias("__substates")
            )
        )
        store_meta = (
            events.filter(F.col("kind") == "meta")
            .groupBy("id", "meta_key")
            # collect_list order is partition-dependent; sort on event_ts
            # so list order is append order at any parallelism
            .agg(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("event_ts", "meta_value"))
                    ),
                    lambda s: s["meta_value"],
                ).alias("__vals")
            )
            .groupBy("id")
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("meta_key", "__vals"))
                ).alias("store_meta")
            )
        )
        deleted = events.filter(F.col("kind") == "delete").select("id").distinct()

        cur = (
            msgs.join(latest_state, "id", "left")
            .join(substates, "id", "left")
            .join(store_meta, "id", "left")
            .join(deleted, "id", "left_anti")
            .withColumn("state", F.coalesce("__new_state", "state"))
            .withColumn(
                "submessage_states",
                F.coalesce(F.col("__substates"), F.col("submessage_states")),
            )
            .drop("__new_state", "__substates")
        )
        return cur

    def total(self) -> int:
        """``msgstore.py:292``."""
        return self.current().count()

    def _id_dates(self, msg_id: str) -> list | None:
        """Partition-pruning lookup: the id's date partition(s) from the
        side index (written on every :meth:`store`). Returns None on an
        index MISS (id unknown to the index — e.g. a store predating
        the index) so callers fall back to the full scan; an index HIT
        makes the point lookup a one-partition read regardless of store
        size. The index row count equals message count but carries two
        small columns — at 100 TB it stays a ~1% side table."""
        if not os.path.isdir(self.index_path):
            return None
        rows = (
            self.spark.read.parquet(self.index_path)
            .filter(F.col("id") == msg_id)
            .select("date")
            .distinct()
            .collect()
        )
        return [r["date"] for r in rows] or None

    def get(self, msg_id: str):
        """Point lookup (``msgstore.py:710-717``) — partition-pruned via
        the id index when possible."""
        rows = (
            self.current(dates=self._id_dates(msg_id))
            .filter(F.col("id") == msg_id)
            .collect()
        )
        return rows[0] if rows else None

    def get_preview_str(self, msg_id: str, length: int = 1000):
        """First ``length`` chars of payload (``msgstore.py:727-735``)."""
        rows = (
            self.current(dates=self._id_dates(msg_id))
            .filter(F.col("id") == msg_id)
            .select(F.substring("payload", 1, length).alias("preview"))
            .collect()
        )
        return rows[0]["preview"] if rows else None

    def search(
        self,
        start: int = 0,
        count: int = 100,
        order_by: str = "timestamp",
        start_dt=None,
        end_dt=None,
        text: str | None = None,
        rtext: str | None = None,
        start_id: str | None = None,
        meta: dict | None = None,
    ) -> DataFrame:
        """The §2.G row-53/54 search surface as one Catalyst plan.

        Semantics mirror ``msgstore.py:777-867``:

        * ``start_dt``/``end_dt`` — timestamp range; the ``date``
          partition column prunes whole partitions (directory skipping,
          ``msgstore.py:805-811``).
        * ``text`` — substring anywhere in payload (``is_txt_in_msg``).
        * ``rtext`` — **anchored** regex (reference uses ``re.match``,
          ``msgstore.py:766-767``) → ``RLIKE '^(…)'``.
        * ``start_id`` — keyset pagination: strictly after that id
          (ids sort by timestamp by construction).
        * ``start``/``count`` — offset pagination (LIMIT pushdown).
        * ``order_by`` — ``timestamp`` / ``-timestamp`` / any message
          column; meta ordering via ``meta['k']``.
        * ``meta`` — dict of ``{name: v}`` exact / ``{'text_n': v}``
          contains / ``{'rtext_n': v}`` regex-search / ``{'start_n': v}``
          / ``{'end_n': v}`` numeric range / ``{'order_by': 'n'|'-n'}`` —
          ANY-match over store-meta lists (``msgstore.py:214-290``).
        """
        df = self.current()
        if start_dt is not None:
            df = df.filter(
                (F.col("timestamp") >= F.lit(start_dt))
                & (F.to_date("timestamp") >= F.to_date(F.lit(start_dt)))
            )
        if end_dt is not None:
            df = df.filter(
                (F.col("timestamp") <= F.lit(end_dt))
                & (F.to_date("timestamp") <= F.to_date(F.lit(end_dt)))
            )
        if text:
            df = df.filter(F.col("payload").contains(text))
        if rtext:
            df = df.filter(F.col("payload").rlike(f"^(?:{rtext})"))
        if start_id is not None:
            df = df.filter(F.col("id") > start_id)

        meta = dict(meta or {})
        meta_order = meta.pop("order_by", None)
        for key, value in meta.items():
            filt_name, _, meta_name = key.partition("_")
            if filt_name not in ("text", "rtext", "start", "end"):
                filt_name, meta_name = "exact", key
            vals = F.coalesce(
                F.col("store_meta").getItem(meta_name),
                F.when(
                    F.col("meta").getItem(meta_name).isNotNull(),
                    F.array(F.col("meta").getItem(meta_name)),
                ),
            )
            if filt_name == "exact":
                pred = F.exists(vals, lambda x: x == F.lit(value))
            elif filt_name == "text":
                pred = F.exists(vals, lambda x: x.contains(value))
            elif filt_name == "rtext":
                pred = F.exists(vals, lambda x: x.rlike(value))
            elif filt_name == "start":
                pred = F.exists(
                    vals, lambda x: x.cast("double") >= float(value)
                )
            else:  # end
                pred = F.exists(
                    vals, lambda x: x.cast("double") <= float(value)
                )
            df = df.filter(vals.isNotNull() & pred)

        if meta_order is not None:
            desc = meta_order.startswith("-")
            name = meta_order.lstrip("-")
            key = F.coalesce(
                F.element_at(F.col("store_meta").getItem(name), 1),
                F.col("meta").getItem(name),
                F.lit(""),
            )
            df = df.orderBy(key.desc() if desc else key.asc())
        else:
            desc = order_by.startswith("-")
            name = order_by.lstrip("-")
            col = F.col(name)
            df = df.orderBy(col.desc() if desc else col.asc())

        if start:
            df = df.offset(start)
        return df.limit(count)

    # -- replay ----------------------------------------------------------
    def get_for_replay(self, msg_id: str) -> DataFrame:
        """Stored message as a fresh 1-row DataFrame with renewed
        uuid/timestamp (``channels.py:857-869``, ``message.py:80-90``)."""
        one = (
            self.current(dates=self._id_dates(msg_id))
            .filter(F.col("id") == msg_id)
            .select(*MESSAGE_COLUMNS)
        )
        return renew(one).withColumn("state", F.lit(PENDING))


class NullMessageStore(MessageStore):
    """No-op store (``msgstore.py:315``)."""

    def __init__(self, spark: SparkSession, channel: str = "default"):
        self.spark = spark
        self.channel = channel

    def store(self, df: DataFrame, state: str = PENDING) -> None:
        pass

    def _messages(self) -> DataFrame:  # pragma: no cover
        raise RuntimeError("NullMessageStore is write-only/no-op")


class MemoryMessageStore(MessageStore):
    """Ephemeral store in a temp dir (``msgstore.py:424``) — same engine,
    auto-cleaned."""

    def __init__(self, spark: SparkSession, channel: str = "default"):
        self._tmp = tempfile.mkdtemp(prefix=f"pypeman_spark_store_{channel}_")
        super().__init__(spark, self._tmp, channel)

    def close(self) -> None:
        shutil.rmtree(self._tmp, ignore_errors=True)


class FileMessageStore(MessageStore):
    """Durable store rooted at ``path/<channel>`` (``msgstore.py:576``)."""

    def __init__(self, spark: SparkSession, path: str, channel: str = "default"):
        super().__init__(spark, os.path.join(path, channel), channel)
