"""``dirwatch`` — a Spark 4 Python DataSource for FileWatcher parity.

Reference: ``channels.py:1306-1422`` (FileWatcherChannel). The native
Spark file source covers new-file pickup with exactly-once bookkeeping,
but it ignores REWRITES of already-seen files — the reference's
mtime-dict behavior (``channels.py:1348-1358``) re-emits a file whenever
its mtime changes, which SURVEY §7.4 lists as the one watcher semantic
with no built-in equivalent. This DataSource closes that gap natively:

* batch:     ``spark.read.format("dirwatch").options(...)`` — one input
  partition per file, so reads distribute across executors;
* streaming: ``spark.readStream.format("dirwatch")`` — the offset IS the
  mtime snapshot ``{path: mtime}``, checkpointed by Spark, so restarts
  resume the watch exactly where it stopped (replacing the reference's
  in-memory dict that forgets on restart).

Options: ``path`` (dir, required), ``regex`` (filename filter, default
``.*``), ``binary`` ("true" → base64-encoded content column — Python
DataSource rows cross Arrow, so bytes are b64-carried like the
reference's ``message.py:117`` transport encoding).

Register once per session::

    from pypeman_spark.sources.dirwatch_datasource import DirWatchDataSource
    spark.dataSource.register(DirWatchDataSource)

Scale notes: the directory listing runs on the driver (as any file
source's does); content reads happen in executors for batch. The
streaming simple reader returns rows from the driver — right for the
watcher use case (control-plane volumes); bulk backfills should use the
batch form or the native file source.
"""

from __future__ import annotations

import base64
import os
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

__all__ = ["DirWatchDataSource"]

_SCHEMA = "path string, filename string, mtime double, content string"


def _listing(path: str, regex: str) -> dict[str, float]:
    rx = re.compile(regex)
    out: dict[str, float] = {}
    if not os.path.isdir(path):
        return out
    for name in sorted(os.listdir(path)):
        p = os.path.join(path, name)
        if os.path.isfile(p) and rx.match(name):
            out[p] = os.path.getmtime(p)
    return out


def _read_one(path: str, binary: bool) -> tuple:
    with open(path, "rb") as fh:
        raw = fh.read()
    content = (
        base64.b64encode(raw).decode() if binary else raw.decode("utf-8", "replace")
    )
    return (path, os.path.basename(path), os.path.getmtime(path), content)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.regex = options.get("regex", ".*")
        self.binary = options.get("binary", "false").lower() == "true"

    def partitions(self):
        return [_FilePartition(p) for p in _listing(self.path, self.regex)]

    def read(self, partition):
        yield _read_one(partition.path, self.binary)


class _WatchStreamReader(SimpleDataSourceStreamReader):
    """Offset = the mtime snapshot. ``read(start)`` emits every file that
    is new or whose mtime moved since ``start`` — FileWatcherChannel's
    ``file_status`` diff (``channels.py:1348-1358``), with Spark's
    checkpoint making it restart-safe."""

    def __init__(self, options):
        self.path = options["path"]
        self.regex = options.get("regex", ".*")
        self.binary = options.get("binary", "false").lower() == "true"

    def initialOffset(self) -> dict:
        return {"mtimes": {}}

    def read(self, start: dict):
        seen = start.get("mtimes", {})
        current = _listing(self.path, self.regex)
        changed = [p for p, m in current.items() if seen.get(p) != m]
        rows = [_read_one(p, self.binary) for p in changed]
        return iter(rows), {"mtimes": current}

    def commit(self, end: dict) -> None:
        pass


class DirWatchDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "dirwatch"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema):
        return _BatchReader(self.options)

    def simpleStreamReader(self, schema):
        return _WatchStreamReader(self.options)
