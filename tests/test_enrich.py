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


@pytest.fixture(scope="module")
def inspect_server():
    """Echoes method/path/query/headers/body back as JSON."""
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _echo(self):
            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length).decode()
            body = json.dumps({
                "path": self.path,
                "method": self.command,
                "headers": {k.lower(): v for k, v in self.headers.items()},
                "body": data,
            }).encode()
            self.send_response(200)
            self.send_header("X-Answer", "42")
            self.end_headers()
            self.wfile.write(body)

        do_GET = _echo
        do_POST = _echo

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()
    server.server_close()


def test_http_request_auth_params_cookies(spark, inspect_server):
    # contrib/http.py:205-216,305-321 — basic auth header, query-param
    # templating (str, list, per-row callable), cookie header
    p = Pipeline("t").add(
        HttpRequest(
            inspect_server + "/api",
            auth=("alice", "s3cret"),
            params={
                "q": "fixed",
                "tags": ["a", "b"],
                "n": lambda payload, meta: json.loads(payload)["n"],
            },
            cookies={"sid": "xyz"},
            name="req",
        )
    )
    msgs = messages_from_payloads(spark, [{"n": 7}])
    row = p.run(msgs).all.collect()[0]
    assert row["state"] == "processed"
    seen = json.loads(row["payload"])
    assert seen["path"] == "/api?q=fixed&tags=a&tags=b&n=7"
    import base64
    expect = "Basic " + base64.b64encode(b"alice:s3cret").decode()
    assert seen["headers"]["authorization"] == expect
    assert seen["headers"]["cookie"] == "sid=xyz"


def test_http_request_send_as_json_and_add_meta(spark, inspect_server):
    # contrib/http.py:220-223,330-360 — JSON body + content-type, response
    # headers landed in meta, response parsed as JSON
    p = Pipeline("t").add(
        HttpRequest(
            inspect_server + "/submit", method="POST",
            send_as_json=True, json=True, add_meta=True, name="req",
        )
    )
    msgs = messages_from_payloads(spark, [{"k": [1, 2]}])
    row = p.run(msgs).all.collect()[0]
    seen = json.loads(row["payload"])
    assert json.loads(seen["body"]) == {"k": [1, 2]}
    assert seen["headers"]["content-type"] == "application/json"
    assert row["meta"]["header_x-answer"] == "42"


def test_http_request_binary_response(spark, inspect_server):
    # contrib/http.py:219 — body kept as bytes (base64 payload)
    import base64
    p = Pipeline("t").add(
        HttpRequest(inspect_server + "/bin", binary=True, name="req")
    )
    msgs = messages_from_payloads(spark, [{"x": 1}])
    row = p.run(msgs).all.collect()[0]
    decoded = json.loads(base64.b64decode(row["payload"]))
    assert decoded["path"] == "/bin"


def test_http_request_bad_json_routes_to_error(spark, inspect_server):
    # json=True on a non-JSON body → per-row error, not a task failure
    p = Pipeline("t").add(
        HttpRequest(inspect_server + "/api", json=True, name="req")
    )
    # the echo body IS json — force failure via send_as_json on bad payload
    p2 = Pipeline("t2").add(
        HttpRequest(inspect_server + "/api", method="POST",
                    send_as_json=True, name="req")
    )
    msgs = messages_from_payloads(spark, ["not json {{{"])
    res = p2.run(msgs)
    assert res.errors.count() == 1
