"""Email sink tests (reference ``pypeman/tests/test_nodes.py`` email
case; node parity: ``pypeman/nodes.py:857-911``).

The SMTP path runs inside ``foreachPartition`` on executor Python
workers, so driver-side monkeypatching can't reach it. Instead a
minimal in-process SMTP server (socket-level double) listens on a
loopback port; executors connect to it exactly as they would to a real
relay, and the test asserts on what the server received.
"""

import socket
import threading

from pypeman_spark import Pipeline, messages_from_payloads
from pypeman_spark.operators import Email


class MiniSMTP(threading.Thread):
    """Just enough SMTP for smtplib: 220 greet, EHLO/HELO, MAIL, RCPT,
    DATA (354 + dot-terminated body), QUIT. Captures (mail_from,
    rcpt_tos, data) per message, thread-safe."""

    def __init__(self):
        super().__init__(daemon=True)
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(16)
        self.port = self.sock.getsockname()[1]
        self.messages = []
        self._lock = threading.Lock()
        self._stop = threading.Event()

    def run(self):
        self.sock.settimeout(0.2)
        while not self._stop.is_set():
            try:
                conn, _ = self.sock.accept()
            except socket.timeout:
                continue
            except OSError:  # socket closed by stop()
                break
            threading.Thread(
                target=self._handle, args=(conn,), daemon=True
            ).start()

    def _handle(self, conn):
        f = conn.makefile("rb")

        def reply(line):
            conn.sendall(line + b"\r\n")

        reply(b"220 minismtp ready")
        mail_from, rcpts = None, []
        while True:
            line = f.readline()
            if not line:
                break
            cmd = line.strip()
            up = cmd.upper()
            if up.startswith(b"EHLO") or up.startswith(b"HELO"):
                reply(b"250 minismtp")
            elif up.startswith(b"MAIL FROM:"):
                mail_from = cmd[10:].strip(b"<> ").decode()
                reply(b"250 OK")
            elif up.startswith(b"RCPT TO:"):
                rcpts.append(cmd[8:].strip(b"<> ").decode())
                reply(b"250 OK")
            elif up == b"DATA":
                reply(b"354 end with .")
                body = []
                while True:
                    dl = f.readline()
                    if dl.rstrip(b"\r\n") == b".":
                        break
                    body.append(dl)
                with self._lock:
                    self.messages.append(
                        (mail_from, list(rcpts), b"".join(body).decode())
                    )
                mail_from, rcpts = None, []
                reply(b"250 accepted")
            elif up == b"QUIT":
                reply(b"221 bye")
                break
            else:
                reply(b"250 OK")
        conn.close()

    def stop(self):
        self._stop.set()
        self.sock.close()


def test_email_smtp_params_over_meta(spark):
    srv = MiniSMTP()
    srv.start()
    try:
        node = Email(
            host="127.0.0.1", port=srv.port,
            subject="from-param", sender="param@x.test",
            recipients=["a@x.test", "b@x.test"],
        )
        msgs = messages_from_payloads(
            spark, ["hello one", "hello two"],
            meta={"subject": "from-meta", "sender": "meta@x.test"},
        )
        res = Pipeline("mail").add(node).run(msgs)
        assert res.counts().get("processed") == 2
        assert len(srv.messages) == 2
        for mail_from, rcpts, body in srv.messages:
            # node params beat meta (reference choose_first_not_none order)
            assert mail_from == "param@x.test"
            assert sorted(rcpts) == ["a@x.test", "b@x.test"]
            assert "Subject: from-param" in body
        bodies = "".join(b for _, _, b in srv.messages)
        assert "hello one" in bodies and "hello two" in bodies
    finally:
        srv.stop()


def test_email_smtp_meta_fallback_and_defaults(spark):
    srv = MiniSMTP()
    srv.start()
    try:
        node = Email(host="127.0.0.1", port=srv.port)
        msgs = messages_from_payloads(
            spark, ["payload body"],
            meta={"subject": "meta-subject",
                  "recipients": "m1@x.test,m2@x.test"},
        )
        Pipeline("mail").add(node).run(msgs)
        assert len(srv.messages) == 1
        mail_from, rcpts, body = srv.messages[0]
        assert mail_from == "pypeman@example.com"  # reference default
        assert sorted(rcpts) == ["m1@x.test", "m2@x.test"]
        assert "Subject: meta-subject" in body
        assert "payload body" in body
    finally:
        srv.stop()


def test_email_spool_dry_run(spark, tmp_path):
    spool = str(tmp_path / "spool")
    node = Email(subject="spooled", recipients="solo@x.test",
                 content="forced content", dry_run_spool=spool)
    msgs = messages_from_payloads(spark, ["ignored payload"])
    Pipeline("mail").add(node).run(msgs)
    import glob

    files = glob.glob(spool + "/*.eml")
    assert len(files) == 1
    raw = open(files[0]).read()
    assert "Subject: spooled" in raw
    assert "To: solo@x.test" in raw  # str recipients coerced to list
    assert "forced content" in raw  # content param overrides payload
