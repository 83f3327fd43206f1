"""HttpRequest / FileReader enrichment node tests (contrib/http.py:185,
nodes.py:619; reference test: test_nodes.py:429 test_httprequest_node)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from pypeman_spark import Pipeline, messages_from_payloads
from pypeman_spark.operators import FileReader, HttpRequest
from pypeman_spark.operators.enrich import render_url


@pytest.fixture(scope="module")
def echo_server():
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            body = json.dumps({"path": self.path, "method": "GET"}).encode()
            self.send_response(200)
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length).decode()
            body = json.dumps({"path": self.path, "echo": data}).encode()
            self.send_response(201)
            self.end_headers()
            self.wfile.write(body)

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()
    server.server_close()


def test_render_url_templating():
    # contrib/http.py:259-280 dotted-path URL params
    url = render_url(
        "http://h/api/%(meta.user)s/item/%(payload.item.id)s",
        json.dumps({"item": {"id": 7}}),
        {"user": "u1"},
    )
    assert url == "http://h/api/u1/item/7"
    with pytest.raises(KeyError):
        render_url("http://h/%(meta.missing)s", "{}", {})


def test_http_request_get(spark, echo_server):
    p = Pipeline("t").add(
        HttpRequest(echo_server + "/lookup/%(meta.key)s", name="enrich")
    )
    msgs = messages_from_payloads(spark, [{"a": 1}], meta={"key": "k42"})
    row = p.run(msgs).all.collect()[0]
    assert row["state"] == "processed"
    body = json.loads(row["payload"])
    assert body == {"path": "/lookup/k42", "method": "GET"}
    assert row["meta"]["status_code"] == "200"
    assert row["meta"]["url"].endswith("/lookup/k42")


def test_http_request_post_payload(spark, echo_server):
    p = Pipeline("t").add(
        HttpRequest(echo_server + "/submit", method="POST",
                    send_payload=True, name="post")
    )
    msgs = messages_from_payloads(spark, [{"n": 5}])
    row = p.run(msgs).all.collect()[0]
    assert json.loads(row["payload"]) == {"path": "/submit", "echo": '{"n": 5}'}
    assert row["meta"]["status_code"] == "201"


def test_http_request_connection_error_routes_to_fail(spark):
    p = Pipeline("t").add(
        HttpRequest("http://127.0.0.1:1/unreachable", timeout=0.5, name="bad")
    )
    msgs = messages_from_payloads(spark, [{"a": 1}])
    res = p.run(msgs)
    assert res.errors.count() == 1
    row = res.errors.collect()[0]
    assert row["payload"] == '{"a": 1}'  # original payload preserved
    assert row["err_msg"]


def test_file_reader_from_meta(spark, tmp_path):
    f = tmp_path / "data.txt"
    f.write_text("file content here")
    p = Pipeline("t").add(FileReader(name="read"))
    msgs = messages_from_payloads(
        spark, ["ignored"], meta={"filepath": str(f)}
    )
    row = p.run(msgs).all.collect()[0]
    assert row["payload"] == "file content here"


def test_file_reader_missing_file_errors(spark):
    p = Pipeline("t").add(FileReader(filepath="/nonexistent/x.txt", name="read"))
    msgs = messages_from_payloads(spark, ["x"])
    res = p.run(msgs)
    assert res.errors.count() == 1
