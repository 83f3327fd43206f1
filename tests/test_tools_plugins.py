"""Store CLI tools (`pypeman/tools/*`) and plugin lifecycle
(`pypeman/plugins/base.py`, `plugin_mgr.py`) parity tests."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from pypeman_spark import messages_from_payloads
from pypeman_spark.plugins import BasePlugin, PluginManager
from pypeman_spark.store import MemoryMessageStore
from pypeman_spark.tools.send_from_store import send_messages
from pypeman_spark.tools.view_store import Filter, filtered_messages


@pytest.fixture()
def store(spark):
    s = MemoryMessageStore(spark, channel="t")
    s.store(
        messages_from_payloads(
            spark,
            [{"i": i, "tag": "even" if i % 2 == 0 else "odd",
              "who": {"name": "bob" if i < 3 else "eve"}} for i in range(6)],
        )
    )
    yield s
    s.close()


def test_view_store_filters_distributed(spark, store):
    # view_store.py:Filter — name=value payload filters, dotted paths;
    # compiled to get_json_object predicates, not a driver loop
    rows = filtered_messages(store, [Filter('tag="even"')]).collect()
    assert sorted(json.loads(r["payload"])["i"] for r in rows) == [0, 2, 4]

    rows = filtered_messages(store, [Filter('who.name="bob"'), Filter("i=2")]).collect()
    assert [json.loads(r["payload"])["i"] for r in rows] == [2]

    assert filtered_messages(store, [Filter("i=99")]).count() == 0


def test_view_store_filter_typed_equality(spark):
    # reference Filter semantics are Python ==: "9" != 9, 9.0 == 9,
    # True is boolean-typed, None matches null AND missing
    s = MemoryMessageStore(spark, channel="ty")
    s.store(
        messages_from_payloads(
            spark,
            [{"k": 9}, {"k": "9"}, {"k": 9.0}, {"k": True},
             {"k": None}, {"other": 1}],
            channel="ty",
        )
    )

    def ks(flt):
        rows = filtered_messages(s, [Filter(flt)]).collect()
        return sorted(
            repr(json.loads(r["payload"]).get("k")) for r in rows
        )

    assert ks("k=9") == ["9", "9.0"]          # int matches 9 and 9.0, not "9"
    assert ks("k=9.0") == ["9", "9.0"]        # float matches int-encoded 9
    assert ks('k="9"') == ["'9'"]             # string matches only the string
    assert ks("k=True") == ["True"]           # bool is not 1
    assert ks("k=None") == ["None", "None"]   # null + missing key
    s.close()


def test_send_from_store_posts_payloads(spark, store):
    got = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            got.append(json.loads(body))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        n = send_messages(
            filtered_messages(store, [Filter('tag="odd"')]),
            f"http://127.0.0.1:{srv.server_port}/ingest",
        )
        assert n == 3
        assert sorted(d["i"] for d in got) == [1, 3, 5]
    finally:
        srv.shutdown()


class _Probe(BasePlugin):
    calls: list = []

    def ready(self):
        self.calls.append("ready")

    def start(self):
        self.calls.append("start")

    def stop(self):
        self.calls.append("stop")

    def destroy(self):
        self.calls.append("destroy")


def test_plugin_lifecycle_state_machine():
    _Probe.calls = []
    mgr = PluginManager([f"{__name__}._Probe"])
    mgr.import_plugins()
    mgr.init_plugins(registry="reg")
    mgr.ready_plugins()
    mgr.start_plugins()
    (p,) = mgr.plugins
    assert p.status == BasePlugin.STARTED
    assert p.registry == "reg"
    assert p.status_name() == "STARTED"
    mgr.stop_plugins()
    mgr.destroy_plugins()
    assert p.status == BasePlugin.DESTROYED
    assert _Probe.calls == ["ready", "start", "stop", "destroy"]

    # re-init shuts the previous generation down (plugin_mgr.py:46-58)
    mgr.init_plugins()
    mgr.ready_plugins()
    mgr.start_plugins()
    assert mgr.plugins[0] is not p
    mgr.stop_plugins()
    mgr.destroy_plugins()


def test_plugin_lifecycle_asserts_order():
    p = BasePlugin()
    with pytest.raises(AssertionError):
        p.do_start()  # must be READY first
    p.do_ready()
    p.do_start()
    with pytest.raises(AssertionError):
        p.do_destroy()  # must be STOPPED first
    p.do_stop()
    p.do_destroy()


def test_remote_admin_plugin(spark):
    from pypeman_spark.pipeline import Pipeline
    from pypeman_spark.plans.admin import ChannelRegistry
    from pypeman_spark.plugins import RemoteAdminPlugin
    import urllib.request

    store = MemoryMessageStore(spark, channel="chan_p")
    reg = ChannelRegistry(spark)
    reg.register("chan_p", Pipeline("chan_p"), store)

    plugin = RemoteAdminPlugin()
    plugin.registry = reg
    plugin.http_port = 0  # ephemeral
    plugin.ws_port = 0
    plugin.do_ready()
    plugin.do_start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{plugin.rest.port}/channels", timeout=5
        ) as resp:
            chans = json.loads(resp.read())["channels"]
        assert chans[0]["name"] == "chan_p"
    finally:
        plugin.do_stop()
    store.close()
