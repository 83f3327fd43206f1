"""Send store messages to an HTTP endpoint.

Reference: ``pypeman/tools/send_from_store.py`` — filter a store and POST
each message's payload to a destination URL.

The filter/scan stage is the distributed :func:`~.view_store.
filtered_messages` plan; the send stage runs per partition on executors
(one HTTP connection per partition, not per message), mirroring the
HttpRequest enrichment node's batching discipline.

Usage::

    python -m pypeman_spark.tools.send_from_store /path/to/store \
        -c mychan -f kind='"order"' -d http://localhost:8000/ingest
"""

from __future__ import annotations

import argparse

from .view_store import Filter, filtered_messages

__all__ = ["send_messages", "main", "mk_parser"]


def send_messages(df, url: str) -> int:
    """POST each payload to ``url`` from the executors; returns the
    number of messages sent (Observation-free: count first, then send)."""
    rows = df.select("id", "payload")
    n = rows.count()

    def _send(part):
        import urllib.request

        for row in part:
            body = (row["payload"] or "").encode()
            req = urllib.request.Request(
                url, data=body, method="POST",
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=10) as resp:
                resp.read()

    rows.foreachPartition(_send)
    return n


def mk_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="send_from_store", description="send store contents to an endpoint"
    )
    parser.add_argument("path", help="store base path")
    parser.add_argument("--channel", "-c", default="default", help="store channel")
    parser.add_argument(
        "--filter", "-f", action="append", default=[],
        help="payload filter name=value (value is a python literal)",
    )
    parser.add_argument(
        "--destination", "-d", default="http://localhost:8000",
        help="destination url to send messages to",
    )
    parser.add_argument("--count", type=int, default=100, help="max messages")
    return parser


def main(argv: list[str] | None = None) -> int:
    options = mk_parser().parse_args(argv)
    from ..session import get_spark
    from ..store.msgstore import FileMessageStore

    spark = get_spark("send-from-store", cpus=4)
    store = FileMessageStore(spark, options.path, channel=options.channel)
    filters = [Filter(s) for s in options.filter]
    df = filtered_messages(store, filters, count=options.count)
    n = send_messages(df, options.destination)
    print(f"sent {n} messages to {options.destination}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
