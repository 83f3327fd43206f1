"""CLI entry-point tests (reference commands.py:229-400 verb set)."""

import os
import subprocess
import sys

from pypeman_spark.__main__ import graph_lines, main
from pypeman_spark.project_template import new_project


def test_startproject_scaffold(tmp_path):
    target = str(tmp_path / "proj")
    written = new_project(target)
    assert {os.path.basename(p) for p in written} == {
        "project.py", "settings.py", "tests.py"
    }
    # template files are valid python
    for p in written:
        compile(open(p).read(), p, "exec")
    # refuses to clobber an existing dir (reference pjt_templates behavior)
    try:
        new_project(target)
        raise AssertionError("expected FileExistsError")
    except FileExistsError:
        pass


def test_graph_lines(spark):
    from pypeman_spark import Pipeline
    from pypeman_spark.operators import FuncNode
    from pypeman_spark.plans.admin import ChannelRegistry
    from pypeman_spark.store import MemoryMessageStore

    reg = ChannelRegistry(spark)
    pipe = Pipeline("c1").add(FuncNode(lambda d: d, name="a"),
                              FuncNode(lambda d: d, name="b"))
    reg.register("c1", pipe, MemoryMessageStore(spark, channel="c1"))
    ascii_out = list(graph_lines(reg))
    assert ascii_out[0].startswith("c1 (BATCH)")
    assert "|-a" in ascii_out and "|-b" in ascii_out
    dot = "\n".join(graph_lines(reg, dot=True))
    assert dot.startswith("digraph") and '"c1" -> "a";' in dot and '"a" -> "b";' in dot


def test_cli_help_and_bad_project(tmp_path):
    # argparse wiring: every verb registered
    out = subprocess.run(
        [sys.executable, "-m", "pypeman_spark", "--help"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0
    for verb in ("start", "graph", "startproject", "shell", "pyshell",
                 "debug", "printsettings", "test", "pytest"):
        assert verb in out.stdout
    # graph against a dir with no project.py → clean SystemExit, not a traceback
    (tmp_path / "project.py").write_text("x = 1\n")
    out = subprocess.run(
        [sys.executable, "-m", "pypeman_spark", "--project-dir", str(tmp_path),
         "startproject", str(tmp_path / "sub")],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0 and "created" in out.stdout


def test_pyshell_local_repl(tmp_path):
    # reference commands.py:329-340: local REPL with a connected admin
    # client in scope. EOF on stdin exits the REPL immediately; the
    # lazy client needs no live server.
    proj = str(tmp_path / "pyproj")
    new_project(proj)
    out = subprocess.run(
        [sys.executable, "-m", "pypeman_spark", "--project-dir", proj,
         "pyshell", "--url", "ws://127.0.0.1:19991"],
        capture_output=True, text=True, cwd="/root/repo",
        input="", timeout=60,
    )
    assert out.returncode == 0, out.stderr
    combined = out.stdout + out.stderr
    assert "pyshell" in combined and "ws://127.0.0.1:19991" in combined


def test_debug_verb_delegates_to_start(tmp_path, monkeypatch):
    # reference commands.py:363-367 dev hook: here it turns on DEBUG
    # logging and runs the normal foreground start.
    import logging

    from pypeman_spark import __main__ as M

    root = logging.getLogger()
    saved = (root.level, root.handlers[:],
             logging.getLogger("pypeman_spark").level)
    called = {}
    monkeypatch.setattr(M, "cmd_start", lambda args: called.setdefault("rc", 0))
    proj = str(tmp_path / "dbgproj")
    new_project(proj)
    try:
        rc = M.main(["--project-dir", proj, "debug"])
        assert rc == 0 and called == {"rc": 0}
        assert logging.getLogger("pypeman_spark").level == logging.DEBUG
    finally:
        # basicConfig(force=True) is process-wide — restore so later
        # tests don't run at DEBUG verbosity
        root.handlers[:] = saved[1]
        root.setLevel(saved[0])
        logging.getLogger("pypeman_spark").setLevel(saved[2])


def test_daemon_start_stop(tmp_path):
    # reference commands.py:260-294: start -d writes a pidfile via
    # double-fork; stop SIGTERMs through it and cleans up.
    proj = str(tmp_path / "dproj")
    new_project(proj)
    pidfile = os.path.join(proj, "pypeman.pid")

    # stop with nothing running → clean error, not a traceback
    out = subprocess.run(
        [sys.executable, "-m", "pypeman_spark", "--project-dir", proj, "stop"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 1 and "no pidfile" in out.stderr

    out = subprocess.run(
        [sys.executable, "-m", "pypeman_spark", "--project-dir", proj,
         "start", "--daemon"],
        capture_output=True, text=True, cwd="/root/repo", timeout=60,
    )
    assert out.returncode == 0, out.stderr
    assert "started as daemon" in out.stdout
    pid = int(open(pidfile).read())

    # second start refuses while the first is alive
    out = subprocess.run(
        [sys.executable, "-m", "pypeman_spark", "--project-dir", proj,
         "start", "--daemon"],
        capture_output=True, text=True, cwd="/root/repo", timeout=60,
    )
    assert out.returncode == 1 and "already running" in out.stderr

    out = subprocess.run(
        [sys.executable, "-m", "pypeman_spark", "--project-dir", proj, "stop"],
        capture_output=True, text=True, cwd="/root/repo", timeout=90,
    )
    assert out.returncode == 0 and f"stopped (pid {pid})" in out.stdout
    assert not os.path.exists(pidfile)
    # process actually gone
    try:
        os.kill(pid, 0)
        raise AssertionError(f"daemon {pid} still alive")
    except ProcessLookupError:
        pass


def test_reload_restarts_on_change(tmp_path):
    # reference helpers/reloader.py: child exits 3 on source change,
    # parent respawns it; SIGTERM on the parent tears both down.
    import signal
    import time as _time

    proj = str(tmp_path / "rproj")
    new_project(proj)
    p = subprocess.Popen(
        [sys.executable, "-m", "pypeman_spark", "--project-dir", proj,
         "start", "--reload"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd="/root/repo",
    )
    try:
        def wait_for(needle, timeout):
            deadline = _time.time() + timeout
            seen = []
            while _time.time() < deadline:
                line = p.stdout.readline()
                if not line:
                    _time.sleep(0.1)
                    continue
                seen.append(line)
                if needle in line:
                    return seen
            raise AssertionError(f"{needle!r} not seen; got: {''.join(seen)}")

        up = "channel example: started"      # scaffold starts a stream
        wait_for(up, 90)                      # first child is up
        _time.sleep(2)                        # let the watcher snapshot
        proj_py = os.path.join(proj, "project.py")
        os.utime(proj_py, None)               # touch a watched source file
        wait_for("pending reload", 30)
        wait_for("reloading...", 60)
        wait_for(up, 90)                      # second child came up
    finally:
        p.send_signal(signal.SIGINT)
        try:
            p.wait(timeout=60)
        except subprocess.TimeoutExpired:
            p.kill()
    # no orphaned child: the lockfile cleanup path ran
    assert p.returncode is not None


def test_tools_view_and_send_from_store(spark, tmp_path, capsys):
    # reference tool_commands.py verbs: view_store (filtered print) and
    # send_from_store (POST payloads to an endpoint)
    import http.server
    import json
    import threading

    from pypeman_spark import messages_from_payloads
    from pypeman_spark.store.msgstore import MessageStore

    store_dir = str(tmp_path / "store")
    store = MessageStore(spark, store_dir, channel="t")
    store.store(messages_from_payloads(
        spark, [{"k": 9, "tag": "a"}, {"k": 9, "tag": "b"}, {"k": 3}],
        channel="t",
    ))

    rc = main(["tools", "view_store", store_dir, "--channel", "t",
               "-f", "k=9"])
    out = capsys.readouterr().out
    assert rc == 0
    lines = [ln for ln in out.strip().splitlines() if ln]
    assert len(lines) == 2 and all('"k": 9' in ln for ln in lines)

    # send_from_store → tiny HTTP sink
    received = []

    class Sink(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            received.append(json.loads(
                self.rfile.read(int(self.headers["Content-Length"]))))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Sink)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        rc = main(["tools", "send_from_store", store_dir, "--channel", "t",
                   "-f", "k=3", "--dest",
                   f"http://127.0.0.1:{srv.server_port}/in"])
        out = capsys.readouterr().out
        assert rc == 0 and "sent 1 messages" in out
        assert received == [{"k": 3}]
    finally:
        srv.shutdown()

    # missing --dest is a clean error
    assert main(["tools", "send_from_store", store_dir]) == 1


def test_tools_retention_verb(spark, tmp_path, capsys):
    import datetime as dt

    from pypeman_spark.__main__ import main
    from pypeman_spark.store import MessageStore

    store = MessageStore(spark, str(tmp_path / "s"), channel="default")
    now = dt.datetime.now()
    df = spark.createDataFrame(
        [("old", now - dt.timedelta(days=60)), ("new", now)],
        "payload string, timestamp timestamp",
    )
    store.store(df)
    rc = main(["tools", "retention", str(tmp_path / "s"), "--keep-days", "30"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "expired 1 partition(s)" in out
    assert store.total() == 1
    # missing --keep-days is an error
    assert main(["tools", "retention", str(tmp_path / "s")]) == 1


def test_pytest_passthrough_verb(tmp_path):
    # reference commands.py:399-403: `pypeman pytest ...` forwards the
    # remaining argv to pytest with the project dir on sys.path
    (tmp_path / "test_verbcheck.py").write_text(
        "import projmod\n\n"
        "def test_ok():\n    assert projmod.X == 7\n"
    )
    (tmp_path / "projmod.py").write_text("X = 7\n")
    out = subprocess.run(
        [sys.executable, "-m", "pypeman_spark", "--project-dir",
         str(tmp_path), "pytest", str(tmp_path / "test_verbcheck.py"),
         "-q", "-p", "no:cacheprovider"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "1 passed" in out.stdout
    # a failing selection propagates pytest's exit code
    out = subprocess.run(
        [sys.executable, "-m", "pypeman_spark", "--project-dir",
         str(tmp_path), "pytest", str(tmp_path / "test_verbcheck.py"),
         "-q", "-k", "nope", "-p", "no:cacheprovider"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode != 0  # pytest exit 5: no tests collected


def test_pytest_passthrough_flag_first(tmp_path):
    # ADVICE r6: `pypeman pytest -k foo -x` (flag BEFORE any positional)
    # must reach pytest — nargs=REMAINDER alone rejects it. A leading
    # literal `--` is stripped, not forwarded into pytest's parsing.
    (tmp_path / "test_flagfirst.py").write_text(
        "def test_yes():\n    assert True\n\n"
        "def test_no():\n    assert True\n"
    )
    out = subprocess.run(
        [sys.executable, "-m", "pypeman_spark", "--project-dir",
         str(tmp_path), "pytest", "-q", "-k", "yes",
         "-p", "no:cacheprovider", str(tmp_path / "test_flagfirst.py")],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "1 passed" in out.stdout
    out = subprocess.run(
        [sys.executable, "-m", "pypeman_spark", "--project-dir",
         str(tmp_path), "pytest", "--", "-q", "-k", "yes",
         "-p", "no:cacheprovider", str(tmp_path / "test_flagfirst.py")],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "1 passed" in out.stdout
