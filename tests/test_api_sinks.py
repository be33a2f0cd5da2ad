"""Webhook + Mixpanel API-based sinks against a local capture server
(`bulkerlib/implementations/api_based/` parity: batch formats, headers,
macros, the retry ladder, Mixpanel partial-validation semantics)."""

import base64
import gzip
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from bulker_spark.sinks.api_based import (
    ApiSinkError,
    MixpanelSink,
    WebhookSink,
)


class _Capture:
    def __init__(self):
        self.requests = []  # (path, method, headers, body)
        self.responses = []  # queue of (status, body); default 200 "{}"
        self.lock = threading.Lock()

    def pop_response(self):
        with self.lock:
            return self.responses.pop(0) if self.responses else (200, "{}")


@pytest.fixture()
def capture_server():
    cap = _Capture()

    class Handler(BaseHTTPRequestHandler):
        def _any(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            with cap.lock:
                cap.requests.append(
                    (self.path, self.command, dict(self.headers), body)
                )
            status, resp = cap.pop_response()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(resp.encode())

        do_POST = _any
        do_PUT = _any

        def log_message(self, *a):  # quiet
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address
    yield cap, f"http://{host}:{port}"
    server.shutdown()


def _df(spark, n=5):
    return spark.range(n).selectExpr(
        "id", "concat('u', id) AS user", "id * 2 AS score"
    )


class TestWebhookSink:
    def test_json_array_batch_with_headers(self, spark, capture_server):
        cap, base = capture_server
        sink = WebhookSink(
            f"{base}/hook",
            headers=["X-Token: sek", "X-Empty"],
        )
        sent = sink.upload(_df(spark, 5))
        assert sent == 5
        rows = []
        for _p, method, headers, body in cap.requests:
            assert method == "POST"
            assert headers["Content-Type"] == "application/json"
            assert headers["X-Token"] == "sek"
            assert headers["X-Empty"] == ""
            arr = json.loads(body)
            assert isinstance(arr, list)
            rows.extend(arr)
        assert sorted(r["id"] for r in rows) == [0, 1, 2, 3, 4]

    def test_chunking_bounds_request_size(self, spark, capture_server):
        cap, base = capture_server
        sink = WebhookSink(f"{base}/hook", chunk_size=2)
        sent = sink.upload(_df(spark, 5).coalesce(1))
        assert sent == 5
        sizes = sorted(len(json.loads(b)) for _, _, _, b in cap.requests)
        assert sizes == [1, 2, 2]

    def test_custom_method(self, spark, capture_server):
        cap, base = capture_server
        WebhookSink(f"{base}/hook", method="put").upload(_df(spark, 1))
        assert cap.requests[0][1] == "PUT"

    def test_retry_ladder_on_503(self, spark, capture_server):
        cap, base = capture_server
        cap.responses = [(503, "down"), (503, "still down"), (200, "{}")]
        sent = WebhookSink(f"{base}/hook").upload(_df(spark, 3).coalesce(1))
        assert sent == 3
        assert len(cap.requests) == 3  # two 503s retried, then success

    def test_terminal_status_fails(self, spark, capture_server):
        cap, base = capture_server
        cap.responses = [(401, "no")]
        with pytest.raises(Exception) as ex:
            WebhookSink(f"{base}/hook").upload(_df(spark, 2).coalesce(1))
        assert "401" in str(ex.value)

    def test_macro_payload(self, spark, capture_server):
        cap, base = capture_server
        sink = WebhookSink(
            f"{base}/hook",
            custom_payload=True,
            payload=(
                '{"text": "{{ EVENTS_COUNT }} {{ NAME }} for '
                '{{ env.team }}", "items": {{ EVENTS }}}'
            ),
        )
        sent = sink.upload(_df(spark, 2), "clicks", {"team": "growth"})
        assert sent == 2
        body = json.loads(cap.requests[0][3])
        assert body["text"] == "2 clicks for growth"
        assert len(body["items"]) == 2

    def test_event_macro_requires_single_event(self, spark, capture_server):
        _cap, base = capture_server
        sink = WebhookSink(
            f"{base}/hook", custom_payload=True, payload="{{ EVENT }}"
        )
        assert sink.upload(_df(spark, 1)) == 1
        with pytest.raises(ApiSinkError, match="only one event"):
            sink.upload(_df(spark, 2))

    def test_unknown_macro_fails(self, spark, capture_server):
        _cap, base = capture_server
        sink = WebhookSink(
            f"{base}/hook", custom_payload=True, payload="{{ NOPE }}"
        )
        with pytest.raises(ApiSinkError, match="unknown macro"):
            sink.upload(_df(spark, 1))


class TestMixpanelSink:
    def _sink(self, base, **kw):
        return MixpanelSink(
            "proj1", "sa-user", "sa-pass", api_base=base, **kw
        )

    def test_gzip_ndjson_auth_and_url(self, spark, capture_server):
        cap, base = capture_server
        sent, reports = self._sink(base).upload(_df(spark, 4))
        assert sent == 4 and reports == []
        lines = []
        for path, _m, headers, body in cap.requests:
            assert path == "/import?strict=1&project_id=proj1"
            assert headers["Content-Encoding"] == "gzip"
            assert headers["Content-Type"] == "application/x-ndjson"
            expect = base64.b64encode(b"sa-user:sa-pass").decode()
            assert headers["Authorization"] == f"Basic {expect}"
            lines += gzip.decompress(body).decode().splitlines()
        assert sorted(json.loads(ln)["id"] for ln in lines) == [0, 1, 2, 3]

    def test_partial_validation_400_reports_not_fails(
        self, spark, capture_server
    ):
        cap, base = capture_server
        cap.responses = [
            (
                400,
                json.dumps(
                    {
                        "code": 400,
                        "error": "some data points in the request "
                        "failed validation",
                        "num_records_imported": 2,
                        "failed_records": [
                            {
                                "index": 0,
                                "$insert_id": "x1",
                                "field": "properties.time",
                                "message": "invalid",
                            }
                        ],
                        "status": "Bad Request",
                    }
                ),
            )
        ]
        sent, reports = self._sink(base).upload(_df(spark, 3).coalesce(1))
        assert sent == 3
        assert len(reports) == 1
        assert "Imported: 2" in reports[0]
        assert "properties.time:invalid" in reports[0]

    def test_validation_400_with_zero_imported_fails(
        self, spark, capture_server
    ):
        cap, base = capture_server
        cap.responses = [
            (
                400,
                json.dumps(
                    {
                        "error": "some data points in the request "
                        "failed validation",
                        "num_records_imported": 0,
                        "failed_records": [],
                    }
                ),
            )
        ]
        with pytest.raises(Exception) as ex:
            self._sink(base).upload(_df(spark, 2).coalesce(1))
        assert "400" in str(ex.value)

    def test_500_rides_the_retry_ladder(self, spark, capture_server):
        cap, base = capture_server
        cap.responses = [(500, "boom"), (200, "{}")]
        sent, reports = self._sink(base).upload(_df(spark, 2).coalesce(1))
        assert sent == 2 and reports == []
        assert len(cap.requests) == 2

    def test_eu_residency_host(self):
        sink = MixpanelSink("p", "u", "s", data_residency="EU")
        assert sink.url.startswith("https://api-eu.mixpanel.com/import")
