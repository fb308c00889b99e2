"""REST sink tests: routing precedence, outcome mapping, throttling, and a
live end-to-end run against a real local HTTP server."""

from __future__ import annotations

import http.server
import json
import threading
import time

from pyspark.sql import Row

from oe_batch_processing_spark.sinks.rest_sink import (
    RestSinkOptions,
    rest_write,
)

def make_fake_transport():
    # defined as a closure so cloudpickle serializes it by value (a module-
    # level function in a test file isn't importable on executors)
    def fake_transport(url, method, headers, body):
        payload = json.loads(body) if body else {}
        if str(payload.get("key", "")).endswith("3"):
            return 422, "HTTP 422: rejected"
        return 200, None

    return fake_transport


def _parsed_frame(spark, n=10, model_api=None):
    rows = []
    for i in range(1, n + 1):
        payload = {"key": f"K{i}", "value": f"V{i}"}
        if model_api:
            payload["modelAPI"] = model_api
        rows.append(
            Row(
                fileName="test.csv",
                rec=f"K{i},V{i}",
                recId=i,
                parsed_json=json.dumps(payload),
            )
        )
    return spark.createDataFrame(rows)


def test_rest_write_outcomes_and_counts(spark):
    opts = RestSinkOptions(
        app_base_url="http://app.example/api",
        model_api="TestData",
        transport=make_fake_transport(),
    )
    status = rest_write(_parsed_frame(spark, 10), opts).collect()
    by_text = {}
    for r in status:
        by_text.setdefault(r["statusText"], []).append(r)
    assert len(by_text["SUCCESS"]) == 9
    assert len(by_text["FAILED"]) == 1  # K3
    assert by_text["FAILED"][0]["statusCode"] == 422


def test_rest_write_payload_routing_precedence(spark):
    # payload-level modelAPI overrides options (reference :632)
    seen = []

    def recording_transport(url, method, headers, body):
        seen.append(url)
        return 200, None

    opts = RestSinkOptions(
        app_base_url="http://app.example/api",
        model_api="Default",
        transport=recording_transport,
        rate_domains=1,
    )
    df = _parsed_frame(spark, 3, model_api="Override")
    out = rest_write(df, opts)
    assert out.filter("statusText = 'SUCCESS'").count() == 3
    # transport runs on executors; verify via a driver-side re-run of one row
    from oe_batch_processing_spark.sinks.rest_sink import TokenBucket, _send_one

    row = {"parsed_json": json.dumps({"key": "x", "modelAPI": "Override"})}
    status, code, err = _send_one(row, opts, recording_transport, TokenBucket(0))
    assert seen[-1].endswith("/api/Override")


def test_rest_write_missing_model_api_is_fatal(spark):
    opts = RestSinkOptions(
        app_base_url="http://app.example/api", transport=make_fake_transport()
    )
    status = rest_write(_parsed_frame(spark, 2), opts).collect()
    assert all(r["statusText"] == "FATAL" for r in status)
    assert "modelAPI not specified" in status[0]["error"]


class _CountingHandler(http.server.BaseHTTPRequestHandler):
    received = []
    lock = threading.Lock()

    def do_POST(self):  # noqa: N802
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        with self.lock:
            type(self).received.append((self.path, body))
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(b"{}")

    def log_message(self, *args):  # silence
        pass


def test_rest_write_live_http_server_with_throttle(spark):
    """End-to-end against a real HTTP server via the default urllib
    transport, single rate domain, 10ms spacing => >= ~0.3s for 30 recs."""
    _CountingHandler.received = []
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _CountingHandler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        opts = RestSinkOptions(
            app_base_url=f"http://127.0.0.1:{port}/api",
            model_api="TestData",
            min_time_ms=10,
            rate_domains=1,
            access_token="tok123",
        )
        t0 = time.time()
        status = rest_write(_parsed_frame(spark, 30), opts).collect()
        elapsed = time.time() - t0
        assert sum(1 for r in status if r["statusText"] == "SUCCESS") == 30
        assert len(_CountingHandler.received) == 30
        path, body = _CountingHandler.received[0]
        assert path == "/api/TestData?access_token=tok123"
        assert b"key" in body
        assert elapsed >= 0.29  # throttle actually paced the launches
    finally:
        server.shutdown()


def test_full_ingest_lifecycle_through_rest_sink(spark, tmp_path):
    """The reference's complete pipeline in one call: file scan -> CSV parse
    -> REST POST per record -> BatchStatus from HTTP results -> BatchRun
    counts. HTTP 200 is the only success criterion (reference :679)."""
    from oe_batch_processing_spark.engine import IngestJob, run_ingest
    from oe_batch_processing_spark.sinks.ledger import read_runs, read_status
    from oe_batch_processing_spark.sources.csv_source import CsvOptions

    src = tmp_path / "batch.csv"
    lines = [f'K{i:03d},"V,{i:03d}"' for i in range(1, 21)]
    lines.append("only_one_field")  # parse failure
    src.write_text("\r\n".join(lines) + "\r\n")

    _CountingHandler.received = []
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _CountingHandler)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        job = IngestJob(
            file_path=str(src),
            parser="csv",
            csv_options=CsvOptions(csv_headers="key, value"),
            rest_options=RestSinkOptions(
                app_base_url=f"http://127.0.0.1:{port}/api",
                model_api="TestData",
                min_time_ms=0,
            ),
            ledger_dir=str(tmp_path / "ledger"),
        )
        res = run_ingest(spark, job)
        assert res.counts == {
            "totalRecordCount": 21,
            "successCount": 20,
            "failureCount": 1,
        }
        assert len(_CountingHandler.received) == 20  # only parsed records POST
        status = read_status(spark, job.ledger_dir).collect()
        codes = sorted(r["statusCode"] for r in status)
        assert codes == [200] * 20 + [422]
        runs = read_runs(spark, job.ledger_dir).collect()
        assert runs[0]["successCount"] == 20
    finally:
        server.shutdown()


def test_auth_token_precedence(monkeypatch):
    from oe_batch_processing_spark.sinks.auth import AuthError, get_access_token

    # env wins
    monkeypatch.setenv("ACCESS_TOKEN", "envtok")
    assert get_access_token(username="u", password="p", app_base_url="http://x") == "envtok"
    monkeypatch.delenv("ACCESS_TOKEN")

    # login path via fake transport; token = body.id (reference :467-505)
    def fake_login(url, method, headers, body):
        assert url.endswith("/api/users/login")
        assert json.loads(body)["username"] == "u"
        assert headers.get("tenant_id") == "t1"
        return 200, json.dumps({"id": "logintok"})

    tok = get_access_token(
        app_base_url="http://app/",
        username="u",
        password="p",
        tenant_id="t1",
        transport=fake_login,
    )
    assert tok == "logintok"

    # bad credentials => AuthError
    import pytest

    def deny(url, method, headers, body):
        return 401, "{}"

    with pytest.raises(AuthError):
        get_access_token(app_base_url="http://app", username="u", password="x", transport=deny)

    # fallback: explicit ctx token
    assert get_access_token(ctx_access_token="ctxtok") == "ctxtok"


def test_rest_write_job_expiration_bounds_wedged_transport(spark):
    """A transport call that ignores its own timeout (e.g. a server
    trickling bytes) is abandoned at the per-job expiration bound
    (reference's 25 s Bottleneck expiration) and the record FAILs instead
    of stalling the partition."""

    def wedged_transport(url, method, headers, body):
        payload = json.loads(body) if body else {}
        if payload.get("key") == "K1":
            time.sleep(30)  # would wedge the partition without the bound
            return 200, None
        return 200, None

    opts = RestSinkOptions(
        app_base_url="http://app.example/api",
        model_api="TestData",
        transport=wedged_transport,
        expiration_s=1.0,
        rate_domains=1,
    )
    t0 = time.time()
    rows = rest_write(_parsed_frame(spark, n=4), opts).collect()
    assert time.time() - t0 < 20  # bounded, not 30 s
    by_key = {json.loads(r["parsed_json"])["key"]: r for r in rows}
    assert by_key["K1"]["statusText"] == "FAILED"
    assert "expired" in by_key["K1"]["error"]
    assert by_key["K1"]["statusCode"] == 0
    assert all(by_key[k]["statusText"] == "SUCCESS" for k in ("K2", "K3", "K4"))
