"""HTTP / MLLP ingest sidecars (SURVEY §2.A rows 3-4, §7.4).

Pypeman's HTTP and MLLP channels are socket servers whose requests
become messages and whose pipeline result becomes the response
(``contrib/http.py:99-182``, ``contrib/hl7.py:18-186``). Spark has no
server sources; the idiomatic bridge is a tiny receiver (stdlib only —
no aiohttp in this image) that appends each request as a landing file,
which the FileWatcher/streaming file source then consumes — the async
ack pattern of SURVEY §7.4.

Response semantics:

* HTTP: the sidecar acks ``202 {"id": ...}`` immediately; callers poll
  the outcome via the admin API (message-store search). Synchronous
  request/response at Spark latency is a non-goal (§7.4 hard parts).
* MLLP: HL7 ACK codes map from row outcome — AA on processed/dropped,
  AR on rejected, AE on error (``contrib/hl7.py:173-186``) — computed by
  :func:`hl7_ack_for_state` so the sidecar can answer once the outcome
  row lands.
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

__all__ = ["HttpLandingServer", "hl7_ack_for_state", "MLLP_VT", "MLLP_FS", "MLLP_CR"]

MLLP_VT = b"\x0b"
MLLP_FS = b"\x1c"
MLLP_CR = b"\x0d"


def hl7_ack_for_state(state: str, msh_fields: list | None = None) -> str:
    """Outcome → HL7 ACK (AA success/drop, AR reject, AE error) —
    ``contrib/hl7.py:173-186``."""
    code = {
        "processed": "AA",
        "dropped": "AA",
        "rejected": "AR",
    }.get(state, "AE")
    ctrl_id = ""
    if msh_fields and len(msh_fields) > 9:
        ctrl_id = msh_fields[9] if isinstance(msh_fields[9], str) else ""
    return f"MSH|^~\\&|PYPEMAN_SPARK|ACK|||{time.strftime('%Y%m%d%H%M%S')}||ACK|{ctrl_id}|P|2.3.1\rMSA|{code}|{ctrl_id}|\r"


class HttpLandingServer:
    """Threaded stdlib HTTP server: each POST body lands as
    ``<landing_dir>/<ts>_<uuid>.json`` with method/url/headers meta —
    the exact meta surface of ``contrib/http.py:141-158``."""

    def __init__(self, landing_dir: str, host: str = "127.0.0.1", port: int = 0):
        self.landing_dir = landing_dir
        os.makedirs(landing_dir, exist_ok=True)
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _land(self):
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length).decode("utf-8", "replace")
                msg_id = f"{time.strftime('%Y%m%d_%H%M%S')}_{uuid.uuid4().hex}"
                record = {
                    "payload": body,
                    "meta": {
                        "method": self.command,
                        "url": self.path,
                        **{
                            f"header_{k.lower()}": v
                            for k, v in self.headers.items()
                            if k.lower() in ("content-type", "x-request-id")
                        },
                    },
                }
                tmp = os.path.join(outer.landing_dir, f".{msg_id}.tmp")
                dest = os.path.join(outer.landing_dir, f"{msg_id}.json")
                with open(tmp, "w") as fh:
                    json.dump(record, fh)
                os.replace(tmp, dest)  # atomic: the file source never sees partials
                self.send_response(202)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps({"id": msg_id}).encode())

            do_POST = _land
            do_PUT = _land

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_port
        self._thread: threading.Thread | None = None

    def start(self) -> None:
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
