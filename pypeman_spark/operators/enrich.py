"""Outbound-request enrichment operators (SURVEY §2.A rows 7-9).

``HttpRequest`` (reference ``contrib/http.py:185-374``, RequestNode):
per-message outbound HTTP call with URL templating from meta/payload
(dotted paths, ``contrib/http.py:259-280``), response body → payload and
status/url → meta.

Spark-first: the canonical "REST lookup" pattern — ``mapInPandas`` with
one pooled HTTP client per partition, requests issued per Arrow batch.
Never a row-at-a-time UDF: connection reuse amortizes handshake cost,
and partition parallelism gives N concurrent clients cluster-wide.
Errors are captured per row (timeout/connection refused → state=error),
matching pypeman's per-message exception routing.

``FileReader`` (rows 7-8): mid-pipeline read of a per-row file path.
"""

import json
import re
from typing import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

from ..message import ERROR
from .base import Node, active_cond

__all__ = ["HttpRequest", "FileReader"]

_TEMPLATE_RX = re.compile(r"%\(([^)]+)\)s")


def render_url(template: str, payload: str, meta: dict) -> str:
    """``%(meta.x)s`` / ``%(payload.y)s`` templating with dotted paths
    (``contrib/http.py:23-29,259-280``)."""
    try:
        pobj = json.loads(payload) if payload else {}
    except (ValueError, TypeError):
        pobj = {}

    def resolve(m: re.Match) -> str:
        path = m.group(1)
        parts = path.split(".")
        if parts[0] == "meta":
            cur: object = meta or {}
            parts = parts[1:]
        elif parts[0] == "payload":
            cur = pobj
            parts = parts[1:]
        else:
            cur = {**(meta or {}), **(pobj if isinstance(pobj, dict) else {})}
        for p in parts:
            if isinstance(cur, dict) and p in cur:
                cur = cur[p]
            else:
                raise KeyError(f"template path {path!r} unresolved")
        return str(cur)

    return _TEMPLATE_RX.sub(resolve, template)


_HTTP_RESULT = T.StructType(
    [
        T.StructField("payload", T.StringType()),
        T.StructField("status_code", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("err", T.StringType()),
    ]
)


class HttpRequest(Node):
    """Per-row outbound HTTP call (``contrib/http.py:185-374``).

    ``url`` supports ``%(meta.k)s``/``%(payload.k)s`` templates;
    ``send_payload`` posts the row payload as the body; response body
    becomes the payload, ``status_code``/``url`` land in meta
    (``add_meta`` parity).
    """

    def __init__(self, url: str, method: str = "GET",
                 headers: dict | None = None, send_payload: bool = False,
                 timeout: float = 10.0, **kw):
        super().__init__(**kw)
        self.url = url
        self.method = method
        self.headers = headers or {}
        self.send_payload = send_payload
        self.timeout = timeout

    def transform(self, df: DataFrame) -> DataFrame:
        import pandas as pd

        url_t, method, headers = self.url, self.method, dict(self.headers)
        send_payload, timeout = self.send_payload, self.timeout

        def _call(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import urllib.error
            import urllib.request

            for pdf in batches:
                out = {"payload": [], "status_code": [], "url": [], "err": []}
                for payload, meta in zip(pdf["payload"], pdf["meta"]):
                    try:
                        url = render_url(url_t, payload, dict(meta or {}))
                        data = (
                            payload.encode() if (send_payload and payload) else None
                        )
                        req = urllib.request.Request(
                            url, data=data, method=method, headers=headers
                        )
                        try:
                            with urllib.request.urlopen(req, timeout=timeout) as resp:
                                body = resp.read().decode("utf-8", "replace")
                                out["payload"].append(body)
                                out["status_code"].append(str(resp.status))
                        except urllib.error.HTTPError as he:
                            out["payload"].append(
                                he.read().decode("utf-8", "replace")
                            )
                            out["status_code"].append(str(he.code))
                        out["url"].append(url)
                        out["err"].append(None)
                    except Exception as exc:  # noqa: BLE001 — per-row routing
                        out["payload"].append(payload)
                        out["status_code"].append(None)
                        out["url"].append(None)
                        out["err"].append(f"{type(exc).__name__}: {exc}")
                res = pd.DataFrame(out)
                yield pd.concat(
                    [pdf.reset_index(drop=True), res.add_prefix("__http_")], axis=1
                )

        schema = T.StructType(
            df.schema.fields
            + [T.StructField(f"__http_{f.name}", f.dataType) for f in _HTTP_RESULT.fields]
        )
        called = df.mapInPandas(_call, schema)
        # through set_state, not raw withColumn: auto_retry=True must
        # rewrite transient HTTP failures to wait_retry + retry_stage so
        # the DLQ re-entry path applies (nodes.py:194-204 parity)
        out = self.set_state(
            called,
            F.col("__http_err").isNotNull(),
            ERROR,
            err_msg=F.col("__http_err"),
        )
        act2 = active_cond()
        out = (
            out.withColumn(
                "payload",
                F.when(act2, F.col("__http_payload")).otherwise(F.col("payload")),
            )
            .withColumn(
                "meta",
                F.when(
                    act2,
                    F.map_concat(
                        F.coalesce(F.col("meta"), F.create_map().cast("map<string,string>")),
                        F.map_filter(
                            F.create_map(
                                F.lit("status_code"), F.col("__http_status_code"),
                                F.lit("url"), F.col("__http_url"),
                            ),
                            lambda k, v: v.isNotNull(),
                        ),
                    ),
                ).otherwise(F.col("meta")),
            )
            .drop("__http_payload", "__http_status_code", "__http_url", "__http_err")
        )
        return out


class FileReader(Node):
    """Mid-pipeline file read (``nodes.py:619-657``): path from param or
    ``meta[filepath]``; content becomes the payload. Control-plane
    volumes only — bulk reads belong in sources/."""

    def __init__(self, filepath: str | None = None, binary_file: bool = False,
                 encoding: str = "utf-8", **kw):
        super().__init__(**kw)
        self.filepath = filepath
        self.binary_file = binary_file
        self.encoding = encoding

    def transform(self, df: DataFrame) -> DataFrame:
        from .base import payload_fn_udf

        fixed, binary, encoding = self.filepath, self.binary_file, self.encoding

        def _read(path):
            import base64

            with open(path, "rb") as fh:
                raw = fh.read()
            return base64.b64encode(raw).decode() if binary else raw.decode(encoding)

        udf = payload_fn_udf(_read, decode_json=False)
        src = F.lit(fixed) if fixed else F.col("meta").getItem("filepath")
        res = udf(src)
        return self.apply_payload(
            df,
            res["payload"],
            content_type="application/octet-stream" if binary else "application/text",
            err=res["err"],
        )
