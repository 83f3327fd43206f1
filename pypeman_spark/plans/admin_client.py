"""Shell client for the remote-admin API (SURVEY §2.G row 61).

Reference: ``pypeman/plugins/remoteadmin/remoteadmin.py:403-557`` — a
command-line client (channels / list_msgs / view / preview / replay /
push / start / stop) against the admin HTTP endpoints.

Usage::

    python -m pypeman_spark.plans.admin_client --url http://host:port channels
    python -m pypeman_spark.plans.admin_client list_msgs mychan --text foo --count 5
    python -m pypeman_spark.plans.admin_client replay mychan <msg_id>
    python -m pypeman_spark.plans.admin_client push mychan '{"n": 1}'
"""

from __future__ import annotations

import argparse
import json
import urllib.parse
import urllib.request

__all__ = ["AdminClient", "main"]


class AdminClient:
    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")

    def _get(self, path: str, params: dict | None = None):
        url = self.base_url + path
        if params:
            url += "?" + urllib.parse.urlencode(params)
        with urllib.request.urlopen(url) as resp:
            return json.loads(resp.read().decode())

    def _post(self, path: str, body: str):
        req = urllib.request.Request(
            self.base_url + path, data=body.encode(), method="POST"
        )
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read().decode())

    # -- the reference shell's verb set ----------------------------------
    def channels(self):
        return self._get("/channels")

    def start(self, channel: str):
        return self._get(f"/channels/{channel}/start")

    def stop(self, channel: str):
        return self._get(f"/channels/{channel}/stop")

    def list_msgs(self, channel: str, **params):
        clean = {k: v for k, v in params.items() if v is not None}
        return self._get(f"/channels/{channel}/messages", clean)

    def view(self, channel: str, msg_id: str):
        return self._get(f"/channels/{channel}/messages/{msg_id}")

    def preview(self, channel: str, msg_id: str):
        return self._get(f"/channels/{channel}/messages/{msg_id}/preview")

    def replay(self, channel: str, msg_id: str):
        return self._get(f"/channels/{channel}/messages/{msg_id}/replay")

    def push(self, channel: str, payload: str):
        return self._post(f"/channels/{channel}/messages", payload)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pypeman-spark-admin")
    ap.add_argument("--url", default="http://127.0.0.1:8091")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("channels")
    for verb in ("start", "stop"):
        p = sub.add_parser(verb)
        p.add_argument("channel")
    p = sub.add_parser("list_msgs")
    p.add_argument("channel")
    p.add_argument("--count", type=int, default=10)
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--text")
    p.add_argument("--rtext")
    p.add_argument("--order_by")
    for verb in ("view", "preview", "replay"):
        p = sub.add_parser(verb)
        p.add_argument("channel")
        p.add_argument("msg_id")
    p = sub.add_parser("push")
    p.add_argument("channel")
    p.add_argument("payload")
    args = ap.parse_args(argv)

    c = AdminClient(args.url)
    if args.cmd == "channels":
        out = c.channels()
    elif args.cmd in ("start", "stop"):
        out = getattr(c, args.cmd)(args.channel)
    elif args.cmd == "list_msgs":
        out = c.list_msgs(
            args.channel,
            count=args.count,
            start=args.start,
            text=args.text,
            rtext=args.rtext,
            order_by=args.order_by,
        )
    elif args.cmd == "push":
        out = c.push(args.channel, args.payload)
    else:
        out = getattr(c, args.cmd)(args.channel, args.msg_id)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
