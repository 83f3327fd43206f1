"""Shell client for the remote-admin API (SURVEY §2.G row 61).

Reference: ``pypeman/remoteadmin.py:403-557`` — a command-line client
(channels / list_msgs / view / preview / replay / push / start / stop)
plus an interactive ``cmd.Cmd`` shell, speaking either transport.

A ``--url http://...`` drives the REST :class:`~.admin.AdminServer`; a
``--url ws://...`` drives the JSON-RPC
:class:`~.ws_admin.WsAdminServer` — the same verb surface either way,
mirroring the reference's REST + websocket pair.

Usage::

    python -m pypeman_spark.plans.admin_client --url http://host:port channels
    python -m pypeman_spark.plans.admin_client --url ws://host:port list_msgs mychan
    python -m pypeman_spark.plans.admin_client replay mychan <msg_id>
    python -m pypeman_spark.plans.admin_client push mychan '{"n": 1}'
    python -m pypeman_spark.plans.admin_client shell   # interactive
"""

from __future__ import annotations

import argparse
import cmd
import json
import shlex
import urllib.parse
import urllib.request

__all__ = ["AdminClient", "AdminShell", "client_for", "main"]


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


def client_for(url: str):
    """REST client for ``http(s)://``, JSON-RPC websocket client for
    ``ws://`` (``remoteadmin.py:560-575`` transport choice)."""
    if url.startswith(("ws://", "wss://")):
        from .ws_admin import WsAdminClient

        return WsAdminClient(url)
    return AdminClient(url)


class AdminShell(cmd.Cmd):
    """Interactive shell over either transport
    (``remoteadmin.py:403-557`` PypemanShell)."""

    prompt = "pypeman> "
    intro = "pypeman-spark admin shell. Type help or ? to list commands."

    def __init__(self, client, **kw):
        super().__init__(**kw)
        self.client = client

    def _show(self, out) -> None:
        print(json.dumps(out, indent=2, default=str))

    def do_channels(self, _arg):
        """List channels and their status."""
        self._show(self.client.channels())

    def do_start(self, arg):
        """start <channel> — start a streaming channel."""
        self._show(self.client.start(arg.strip()))

    def do_stop(self, arg):
        """stop <channel> — stop a streaming channel."""
        self._show(self.client.stop(arg.strip()))

    def do_list_msgs(self, arg):
        """list_msgs <channel> [count] [text] — search the store."""
        parts = shlex.split(arg)
        kw = {}
        if len(parts) > 1:
            kw["count"] = int(parts[1])
        if len(parts) > 2:
            kw["text"] = parts[2]
        self._show(self.client.list_msgs(parts[0], **kw))

    def do_view(self, arg):
        """view <channel> <msg_id>"""
        self._show(self.client.view(*shlex.split(arg)))

    def do_preview(self, arg):
        """preview <channel> <msg_id>"""
        self._show(self.client.preview(*shlex.split(arg)))

    def do_replay(self, arg):
        """replay <channel> <msg_id>"""
        self._show(self.client.replay(*shlex.split(arg)))

    def do_push(self, arg):
        """push <channel> <payload>"""
        chan, payload = shlex.split(arg)
        self._show(self.client.push(chan, payload))

    def do_exit(self, _arg):
        """Quit the shell."""
        return True

    do_quit = do_EOF = do_exit

    def onecmd(self, line):  # errors never kill the shell (ref :414-420)
        try:
            return super().onecmd(line)
        except SystemExit:
            raise
        except Exception as exc:  # noqa: BLE001
            print(f"error: {exc}")
            return False


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pypeman-spark-admin")
    ap.add_argument("--url", default="http://127.0.0.1:8091")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("channels")
    sub.add_parser("shell")
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

    c = client_for(args.url)
    if args.cmd == "shell":
        AdminShell(c).cmdloop()
        return 0
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
