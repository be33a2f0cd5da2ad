"""Ingest-service web shells: tracking pixel (/api/px/:tp), classic
events (/api/v1/[s2s/]event[s]), the loader script, and the pure shaping
functions behind them.

Reference behaviors: ``ingest/router_pixel_handler.go``,
``ingest/router_classic_handler.go``, ``ingest/router.go:291-410``,
``jitsubase/types/json.go:57-92``.
"""

import base64
import datetime as dt
import json
import shutil
import tempfile
import urllib.request
from urllib.error import HTTPError

import pytest

from bulker_spark.app import BulkerApp, Destination, serve
from bulker_spark.app import ingest_shapes as shapes

NOW = dt.datetime(2026, 1, 2, 3, 4, 5, 678000, tzinfo=dt.timezone.utc)


# ==========================================================================
# pure shaping functions
# ==========================================================================

class TestParsePixelEvent:
    def test_data_field_and_params_merge(self):
        data = base64.b64encode(json.dumps({"a": 1}).encode()).decode()
        ev = shapes.parse_pixel_event(
            {"data": [data], "b": ["2"], "c.d": ["3"]}
        )
        assert ev == {"a": 1, "b": "2", "c": {"d": "3"}}

    def test_control_params_never_copied(self):
        ev = shapes.parse_pixel_event(
            {
                "data": [],
                "cookie_domain": ["x.com"],
                "process_headers": ["true"],
                "destination_url": ["https://e.com"],
                "keep": ["v"],
            }
        )
        assert ev == {"keep": "v"}

    def test_repeated_param_becomes_list(self):
        ev = shapes.parse_pixel_event({"tag": ["a", "b"]})
        assert ev == {"tag": ["a", "b"]}

    def test_bad_base64_raises(self):
        with pytest.raises(ValueError, match="decoding"):
            shapes.parse_pixel_event({"data": ["%%%not-b64%%%"]})

    def test_bad_json_raises(self):
        raw = base64.b64encode(b"{oops").decode()
        with pytest.raises(ValueError, match="unmarshalling"):
            shapes.parse_pixel_event({"data": [raw]})


class TestRedirectValidation:
    HOST = "t.example.com"

    def test_valid_https_redirect(self):
        assert (
            shapes.extract_redirect_url(
                "https://other.com/landing", {}, self.HOST
            )
            == "https://other.com/landing"
        )

    @pytest.mark.parametrize(
        "url",
        [
            "http://other.com/x",            # not https
            "https://other.com:8443/x",      # explicit port
            "https://t.example.com/x",       # same host
            "https://93.184.216.34/x",       # IP literal
        ],
    )
    def test_rejected_redirects_fall_back_to_gif(self, url):
        assert shapes.extract_redirect_url(url, {}, self.HOST) == ""

    def test_message_field_fallback(self):
        msg = {"destination_url": "https://from-msg.com/x"}
        assert (
            shapes.extract_redirect_url("", msg, self.HOST)
            == "https://from-msg.com/x"
        )


class TestPatchEvent:
    def test_short_alias_and_stamps(self):
        ev = shapes.patch_event(
            {}, tp="p", message_id="m1", headers={}, now=NOW
        )
        assert ev["type"] == "page"
        assert ev["receivedAt"] == "2026-01-02T03:04:05.678Z"
        assert ev["timestamp"] == ev["receivedAt"]
        assert ev["messageId"] == "m1"

    def test_event_type_from_body_when_e(self):
        ev = shapes.patch_event(
            {"type": "identify"}, tp="e", message_id="m", now=NOW
        )
        assert ev["type"] == "identify"

    def test_e_without_type_rejected(self):
        with pytest.raises(ValueError, match="type property"):
            shapes.patch_event({}, tp="e", message_id="m")

    def test_unknown_type_rejected(self):
        with pytest.raises(ValueError, match="Unknown event type"):
            shapes.patch_event({}, tp="bogus", message_id="m")

    def test_track_requires_event_name(self):
        with pytest.raises(ValueError, match="'event' property"):
            shapes.patch_event({}, tp="t", message_id="m")
        ev = shapes.patch_event(
            {"event": "clicked"}, tp="t", message_id="m", now=NOW
        )
        assert ev["event"] == "clicked"

    def test_track_name_max_128(self):
        with pytest.raises(ValueError, match="128"):
            shapes.patch_event(
                {"event": "x" * 129}, tp="t", message_id="m"
            )

    def test_browser_context_enrichment(self):
        headers = {
            "X-Real-Ip": "10.1.2.3",
            "User-Agent": "UA/1.0",
            "Accept-Language": "de-DE, en;q=0.5",
        }
        ev = shapes.patch_event(
            {}, tp="p", message_id="m", headers=headers, now=NOW
        )
        assert ev["requestIp"] == "10.1.2.3"
        assert ev["context"]["ip"] == "10.1.2.3"
        assert ev["context"]["userAgent"] == "UA/1.0"
        assert ev["context"]["locale"] == "de-DE"

    def test_ip_policy_strip_and_remove(self):
        headers = {"X-Real-Ip": "10.1.2.3", "X-IP-Policy": "stripLastOctet"}
        ev = shapes.patch_event(
            {}, tp="p", message_id="m", headers=headers, now=NOW
        )
        assert ev["requestIp"] == "10.1.2.0"
        headers = {"X-Real-Ip": "10.1.2.3", "X-IP-Policy": "remove"}
        ev = shapes.patch_event(
            {}, tp="p", message_id="m", headers=headers, now=NOW
        )
        assert "requestIp" not in ev

    def test_s2s_context_untouched_and_unfiltered(self):
        ev = shapes.patch_event(
            {"JITSU_TABLE_NAME": "t", "context": {"ip": "9.9.9.9"}},
            tp="p",
            message_id="m",
            ingest_type="s2s",
            headers={"X-Real-Ip": "10.0.0.1", "User-Agent": "UA"},
            now=NOW,
        )
        # server callers are trusted: their context.ip stays, reserved
        # keys are not stripped (router.go:346-360 browser-only block)
        assert ev["context"]["ip"] == "9.9.9.9"
        assert "userAgent" not in ev["context"]
        assert ev["JITSU_TABLE_NAME"] == "t"

    def test_analytic_context_merged_under_event(self):
        ev = shapes.patch_event(
            {"context": {"a": 1}},
            tp="p",
            message_id="m",
            ingest_type="s2s",
            analytic_context={"a": 0, "b": 2},
            now=NOW,
        )
        assert ev["context"] == {"a": 1, "b": 2}


class TestFilterEvent:
    def test_reserved_keys_stripped_recursively(self):
        ev = {
            "JITSU_TABLE_NAME": "x",
            "SALESFORCE_PAYLOAD": {},
            "__sql_type_a": "text",
            "keep": {"__sql_type_b": "int", "v": [{"__sql_type_c": 1}]},
        }
        shapes.filter_event(ev)
        assert ev == {"keep": {"v": [{}]}}


class TestClassicShaping:
    def test_patch_classic_browser(self):
        headers = {
            "X-Forwarded-For": "1.2.3.4, 10.0.0.1",
            "User-Agent": "UA",
            "Accept-Language": "fr, en",
        }
        ev = shapes.patch_classic_event(
            {"__sql_type_x": "t", "v": 1},
            message_id="mid",
            api_key="k1",
            headers=headers,
            now=NOW,
        )
        assert ev["source_ip"] == "1.2.3.4"  # first hop only
        assert ev["user_agent"] == "UA"
        assert ev["user_language"] == "fr"
        assert ev["_timestamp"] == "2026-01-02T03:04:05.678Z"
        assert ev["api_key"] == "k1"
        assert ev["utc_time"] == ev["_timestamp"]
        assert ev["eventn_ctx_event_id"] == "mid"
        assert "__sql_type_x" not in ev

    def test_ip_policy_strict_strips_octet(self):
        ev = shapes.patch_classic_event(
            {},
            message_id="m",
            api_key="k",
            headers={"X-Real-Ip": "5.6.7.8"},
            ip_policy="strict",
            now=NOW,
        )
        assert ev["source_ip"] == "5.6.7.0"

    def test_token_extraction_order(self):
        assert shapes.classic_token_from({"token": ["q"]}, {}) == "q"
        assert (
            shapes.classic_token_from({}, {"X-Auth-Token": "h"}) == "h"
        )
        assert shapes.classic_token_from({"p_ab12": ["rand"]}, {}) == "rand"
        assert shapes.classic_token_from({}, {}) == ""

    def test_write_key_sources(self):
        wk = base64.b64encode(b"mykey:").decode()
        assert (
            shapes.write_key_from({}, {"Authorization": f"Basic {wk}"})
            == "mykey"
        )
        assert shapes.write_key_from({}, {"X-Write-Key": "xk"}) == "xk"
        assert shapes.write_key_from({"writekey": ["qk"]}, {}) == "qk"


class TestProcessHeaders:
    def test_new_anonymous_id_plants_cookie(self):
        ev = {}
        sc = shapes.process_headers_data(
            ev, cookies={}, host="app.shop.co.uk", referer="", tp="p"
        )
        assert sc is not None
        assert sc["name"] == shapes.ANONYMOUS_ID_COOKIE
        assert sc["domain"] == "shop.co.uk"  # registrable domain
        assert ev["anonymousId"] == sc["value"]

    def test_existing_cookie_reused_no_set(self):
        ev = {}
        sc = shapes.process_headers_data(
            ev,
            cookies={shapes.ANONYMOUS_ID_COOKIE: "anon-1"},
            host="x.com",
        )
        assert sc is None
        assert ev["anonymousId"] == "anon-1"

    def test_identity_and_traits_merge(self):
        ev = {"context": {"traits": {"plan": "pro"}}}
        shapes.process_headers_data(
            ev,
            cookies={
                shapes.USER_ID_COOKIE: "u1",
                shapes.GROUP_ID_COOKIE: "g1",
                shapes.GROUP_TRAITS_COOKIE: '{"org": "acme"}',
                shapes.USER_TRAITS_COOKIE: '{"plan": "free", "vip": true}',
            },
            host="x.com",
        )
        assert ev["userId"] == "u1"
        assert ev["context"]["groupId"] == "g1"
        # explicit event traits win over cookie traits
        assert ev["context"]["traits"] == {
            "org": "acme",
            "plan": "pro",
            "vip": True,
        }

    def test_referer_page_and_properties_for_page_type(self):
        ev = {}
        shapes.process_headers_data(
            ev,
            cookies={shapes.ANONYMOUS_ID_COOKIE: "a"},
            host="x.com",
            referer="https://site.com/path?q=1",
            tp="p",
        )
        page = ev["context"]["page"]
        assert page["url"] == "https://site.com/path?q=1"
        assert page["path"] == "/path"
        assert page["search"] == "q=1"
        assert page["host"] == "site.com"
        assert ev["properties"]["url"] == "https://site.com/path?q=1"


def test_extract_top_level_and_domain():
    assert shapes.extract_top_level_and_domain("abc.efg.com") == (
        "efg.com",
        "abc",
    )
    assert shapes.extract_top_level_and_domain("a.b.shop.co.uk") == (
        "shop.co.uk",
        "b",
    )
    assert shapes.extract_top_level_and_domain("example.com") == (
        "example.com",
        "",
    )


def test_sanitize_message_id():
    assert shapes.sanitize_message_id("a b/c") == "a_b_c"
    assert len(shapes.sanitize_message_id("x" * 100)) == 64
    assert len(shapes.sanitize_message_id("")) == 32  # fresh uuid hex


# ==========================================================================
# HTTP surface
# ==========================================================================

@pytest.fixture()
def ingest_server(spark):
    wh = tempfile.mkdtemp(prefix="ingest_wh_")
    topics = tempfile.mkdtemp(prefix="ingest_topics_")
    app = BulkerApp(
        spark,
        topics,
        [Destination("d1", wh)],
        streams=[
            {"write_key": "wk-browser", "destination": "d1", "table": "events"},
            {
                "write_key": "wk-server",
                "destination": "d1",
                "table": "events",
                "s2s": True,
            },
            {
                "write_key": "",
                "destination": "d1",
                "table": "events",
                "domains": ["tracked.example.com"],
            },
        ],
    )
    server = serve(app)
    host, port = server.server_address
    yield app, f"http://{host}:{port}"
    server.shutdown()
    shutil.rmtree(wh, ignore_errors=True)
    shutil.rmtree(topics, ignore_errors=True)


def _raw(url, method="GET", body=None, headers=None):
    req = urllib.request.Request(
        url, data=body, method=method, headers=headers or {}
    )
    return urllib.request.urlopen(req)


def test_pixel_returns_gif_and_produces(ingest_server, spark):
    app, base = ingest_server
    data = base64.b64encode(
        json.dumps({"properties": {"x": 1}}).encode()
    ).decode()
    with _raw(f"{base}/api/px/p?writekey=wk-browser&data={data}") as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"] == "image/gif"
        assert "no-cache" in resp.headers["Cache-Control"]
        body = resp.read()
    assert body == shapes.EMPTY_GIF
    assert app.metrics["events_produced"] == 1
    # the produced event went through patch_event: type + stamps present
    cycle = app.run_batch_cycle("d1")
    assert cycle["topics"] == ["in.id.d1.m.batch.t.events"]
    df = app.engine_for("d1").warehouse.read("events")
    row = df.collect()[0].asDict()
    assert row["type"] == "page"
    assert row["properties_x"] == 1
    assert row["receivedAt"] is not None


def test_pixel_error_is_pixel_safe_and_dead_lettered(ingest_server):
    app, base = ingest_server
    # no write key, unknown host → stream not found; still a 200 GIF
    with _raw(f"{base}/api/px/p") as resp:
        assert resp.status == 200
        assert resp.read() == shapes.EMPTY_GIF
    assert app.metrics["ingest_errors"] == 1


def test_pixel_redirect(ingest_server):
    app, base = ingest_server
    import urllib.parse

    dest = urllib.parse.quote("https://landing.example.org/x", safe="")

    class NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, *a, **k):
            return None

    opener = urllib.request.build_opener(NoRedirect)
    try:
        opener.open(
            f"{base}/api/px/p?writekey=wk-browser&destination_url={dest}"
        )
        raise AssertionError("expected 302")
    except HTTPError as ex:
        assert ex.code == 302
        assert ex.headers["Location"] == "https://landing.example.org/x"


def test_pixel_process_headers_sets_cookie(ingest_server):
    app, base = ingest_server
    with _raw(
        f"{base}/api/px/p?writekey=wk-browser&process_headers=true",
        headers={"Host": "app.customer.com"},
    ) as resp:
        cookie = resp.headers["Set-Cookie"]
    assert cookie.startswith(shapes.ANONYMOUS_ID_COOKIE + "=")
    assert "Domain=customer.com" in cookie


def test_pixel_domain_routing(ingest_server):
    app, base = ingest_server
    with _raw(
        f"{base}/api/px/t?event=clicked",
        headers={"Host": "tracked.example.com"},
    ) as resp:
        assert resp.status == 200
    assert app.metrics["events_produced"] == 1


def test_classic_event_roundtrip(ingest_server, spark):
    app, base = ingest_server
    body = json.dumps({"event_type": "pageview", "v": 7}).encode()
    with _raw(
        f"{base}/api/v1/event?token=wk-browser",
        method="POST",
        body=body,
        headers={"Content-Type": "application/json"},
    ) as resp:
        assert json.loads(resp.read()) == {"ok": True}
    app.run_batch_cycle("d1")
    row = (
        app.engine_for("d1").warehouse.read("events").collect()[0].asDict()
    )
    assert row["v"] == 7
    assert row["api_key"] == "wk-browser"
    assert row["_timestamp"] is not None
    assert row["eventn_ctx_event_id"] is not None


def test_classic_array_body(ingest_server):
    app, base = ingest_server
    body = json.dumps([{"a": 1}, {"a": 2}, {"a": 3}]).encode()
    with _raw(
        f"{base}/api/v1/events?token=wk-browser",
        method="POST",
        body=body,
        headers={"Content-Type": "application/json"},
    ) as resp:
        assert json.loads(resp.read())["ok"] is True
    assert app.metrics["events_produced"] == 3


def test_classic_content_type_rejected(ingest_server):
    app, base = ingest_server
    try:
        _raw(
            f"{base}/api/v1/event?token=wk-browser",
            method="POST",
            body=b"a=1",
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        raise AssertionError("expected 400")
    except HTTPError as ex:
        assert ex.code == 400


def test_s2s_requires_server_key(ingest_server):
    app, base = ingest_server
    # browser key on the s2s endpoint → 401 (router_classic_handler:130-135)
    try:
        _raw(
            f"{base}/api/v1/s2s/event?token=wk-browser",
            method="POST",
            body=b"{}",
            headers={"Content-Type": "application/json"},
        )
        raise AssertionError("expected 401")
    except HTTPError as ex:
        assert ex.code == 401
    with _raw(
        f"{base}/api/v1/s2s/event?token=wk-server",
        method="POST",
        body=json.dumps({"x": 1}).encode(),
        headers={"Content-Type": "application/json"},
    ) as resp:
        assert json.loads(resp.read())["ok"] is True


def test_s2s_browser_error_statuses_differ(ingest_server):
    app, base = ingest_server
    # bad token on the BROWSER endpoint answers 200 (never break a page)
    with _raw(
        f"{base}/api/v1/event?token=nope",
        method="POST",
        body=b"{}",
        headers={"Content-Type": "application/json"},
    ) as resp:
        assert resp.status == 200
        assert json.loads(resp.read())["ok"] is False


def test_randomized_api_url(ingest_server):
    app, base = ingest_server
    with _raw(
        f"{base}/api.xyz42?p_ab=wk-browser",
        method="POST",
        body=json.dumps({"a": 1}).encode(),
        headers={"Content-Type": "application/json"},
    ) as resp:
        assert json.loads(resp.read())["ok"] is True
    assert app.metrics["events_produced"] == 1


def test_lib_js_etag_and_head(ingest_server):
    app, base = ingest_server
    with _raw(f"{base}/s/lib.js") as resp:
        assert resp.status == 200
        etag = resp.headers["ETag"]
        body = resp.read()
        assert b"bulker_spark classic loader" in body
    try:
        _raw(f"{base}/s/lib.js", headers={"If-None-Match": etag})
        raise AssertionError("expected 304")
    except HTTPError as ex:
        assert ex.code == 304
    with _raw(f"{base}/s/lib.js", method="HEAD") as resp:
        assert resp.status == 200
        assert resp.headers["ETag"] == etag
        assert resp.read() == b""


def test_pixel_bypasses_bearer_auth(spark):
    """Pixel/classic endpoints are write-key addressed and must work
    even when the admin API is token-gated (ingest/router.go registers
    them outside the Authorize middleware)."""
    wh = tempfile.mkdtemp(prefix="ingest_wh_")
    topics = tempfile.mkdtemp(prefix="ingest_topics_")
    app = BulkerApp(
        spark,
        topics,
        [Destination("d1", wh)],
        auth_tokens=["secret"],
        streams=[{"write_key": "wk", "destination": "d1"}],
    )
    server = serve(app)
    host, port = server.server_address
    base = f"http://{host}:{port}"
    try:
        with _raw(f"{base}/api/px/p?writekey=wk") as resp:
            assert resp.status == 200
        with _raw(
            f"{base}/api/v1/event?token=wk",
            method="POST",
            body=b"{}",
            headers={"Content-Type": "application/json"},
        ) as resp:
            assert json.loads(resp.read())["ok"] is True
        # but the admin API stays gated
        try:
            _raw(f"{base}/metrics")
            raise AssertionError("expected 401")
        except HTTPError as ex:
            assert ex.code == 401
    finally:
        server.shutdown()
        shutil.rmtree(wh, ignore_errors=True)
        shutil.rmtree(topics, ignore_errors=True)


def test_s2s_domain_fallback_refused(spark):
    """An unauthenticated /s2s request matching a browser stream's
    domain must NOT resolve — domain routing identifies browser
    traffic; trusting it as s2s would skip reserved-key filtering."""
    wh = tempfile.mkdtemp(prefix="ingest_wh_")
    topics = tempfile.mkdtemp(prefix="ingest_topics_")
    app = BulkerApp(
        spark, topics, [Destination("d1", wh)],
        streams=[{"write_key": "", "destination": "d1",
                  "domains": ["site.com"]}],
    )
    out = app.ingest_classic(
        b'{"JITSU_TABLE_NAME": "x"}', {}, {"Host": "site.com"}, s2s=True
    )
    assert out["ok"] is False and out["status"] == 401
    # browser endpoint on the same host still routes by domain
    out = app.ingest_classic(b'{"a": 1}', {}, {"Host": "site.com"})
    assert out["ok"] is True
    shutil.rmtree(wh, ignore_errors=True)
    shutil.rmtree(topics, ignore_errors=True)


def test_lowercase_headers_resolve(spark):
    """HTTP/2 proxies lowercase every header; identity, tokens and ips
    must still resolve (case-insensitive header reads)."""
    wh = tempfile.mkdtemp(prefix="ingest_wh_")
    topics = tempfile.mkdtemp(prefix="ingest_topics_")
    app = BulkerApp(
        spark, topics, [Destination("d1", wh)],
        streams=[{"write_key": "wk", "destination": "d1"}],
    )
    out = app.ingest_classic(
        b'{"a": 1}', {},
        {"x-auth-token": "wk", "x-real-ip": "9.8.7.6",
         "user-agent": "UA/2", "host": "h.com"},
    )
    assert out["ok"] is True
    app.producer.flush_all()
    app.run_batch_cycle("d1")
    row = app.engine_for("d1").warehouse.read("events").collect()[0].asDict()
    assert row["source_ip"] == "9.8.7.6"
    assert row["user_agent"] == "UA/2"
    shutil.rmtree(wh, ignore_errors=True)
    shutil.rmtree(topics, ignore_errors=True)


def test_pixel_table_name_is_control_param(ingest_server, spark):
    app, base = ingest_server
    with _raw(f"{base}/api/px/p?writekey=wk-browser&tableName=pix_t") as r:
        assert r.status == 200
    app.run_batch_cycle("d1")
    df = app.engine_for("d1").warehouse.read("pix_t")
    assert df.count() == 1
    assert "tableName" not in df.columns  # routing param, not payload


def test_pixel_safe_on_store_failure_without_failover(ingest_server):
    """The pixel contract holds even when the topic store is down and
    no failover log exists: the handler records the error and the HTTP
    layer still serves the GIF (no exception escapes)."""
    app, base = ingest_server
    real = app.producer.produce
    app.producer.produce = lambda t, l: (_ for _ in ()).throw(OSError("dn"))
    try:
        out = app.ingest_pixel("p", {"writekey": ["wk-browser"]}, {})
        assert out["ok"] is False
        assert "dn" in out["error"]
        assert out["gif"] == shapes.EMPTY_GIF
    finally:
        app.producer.produce = real


# ==========================================================================
# segment-protocol routes: /api/s/:tp, /v1/batch, settings
# ==========================================================================

class TestDeduplicateBatch:
    def _ev(self, ts, anon="a", name="click", props=None):
        e = {"anonymousId": anon, "type": "track", "event": name,
             "timestamp": ts}
        if props is not None:
            e["properties"] = props
        return e

    def test_duplicates_inside_gap_collapse(self):
        batch = [
            self._ev("2026-01-01T00:00:00Z"),
            self._ev("2026-01-01T00:00:00.500Z"),  # 500ms later, dup
            self._ev("2026-01-01T00:00:02Z"),      # outside 1s gap
        ]
        out = shapes.deduplicate_batch(batch, 1000)
        assert len(out) == 2

    def test_different_properties_never_collapse(self):
        batch = [
            self._ev("2026-01-01T00:00:00Z", props={"x": 1}),
            self._ev("2026-01-01T00:00:00Z", props={"x": 2}),
        ]
        assert len(shapes.deduplicate_batch(batch, 1000)) == 2

    def test_unparseable_timestamp_skips_dedup(self):
        batch = [self._ev("not-a-time"), self._ev("not-a-time")]
        assert len(shapes.deduplicate_batch(batch, 1000)) == 2

    def test_outside_gap_resets_reference(self):
        # 0s, 2s, 2.5s with 1s gap: third is within gap of SECOND
        batch = [
            self._ev("2026-01-01T00:00:00Z"),
            self._ev("2026-01-01T00:00:02Z"),
            self._ev("2026-01-01T00:00:02.500Z"),
        ]
        assert len(shapes.deduplicate_batch(batch, 1000)) == 2


def test_segment_event_roundtrip(ingest_server):
    app, base = ingest_server
    body = json.dumps({"properties": {"path": "/x"}}).encode()
    with _raw(
        f"{base}/api/s/p?writekey=wk-browser",
        method="POST",
        body=body,
        headers={"Content-Type": "application/json"},
    ) as resp:
        out = json.loads(resp.read())
    assert out["ok"] is True
    app.run_batch_cycle("d1")
    row = app.engine_for("d1").warehouse.read("events").collect()[0].asDict()
    assert row["type"] == "page"  # tp alias normalized by patch_event
    assert row["properties_path"] == "/x"


def test_segment_s2s_event_statuses(ingest_server):
    app, base = ingest_server
    try:
        _raw(f"{base}/api/s/s2s/t", method="POST", body=b"{}",
             headers={"Content-Type": "application/json"})
        raise AssertionError("expected 401")
    except HTTPError as ex:
        assert ex.code == 401
    # s2s parse error is a 400, not a silent 200
    try:
        _raw(f"{base}/api/s/s2s/t?writekey=wk-server", method="POST",
             body=b"{oops", headers={"Content-Type": "application/json"})
        raise AssertionError("expected 400")
    except HTTPError as ex:
        assert ex.code == 400


def test_segment_batch_roundtrip_and_dedup(spark):
    import gzip as _gzip

    wh = tempfile.mkdtemp(prefix="ingest_wh_")
    topics = tempfile.mkdtemp(prefix="ingest_topics_")
    app = BulkerApp(
        spark, topics, [Destination("d1", wh)],
        streams=[{"write_key": "wk", "destination": "d1",
                  "deduplicate_window_ms": 1000}],
    )
    server = serve(app)
    host, port = server.server_address
    base = f"http://{host}:{port}"
    try:
        payload = {
            "writeKey": "wk",
            "eventsName": "imported",
            "context": {"app": "loader"},
            "batch": [
                {"anonymousId": "a", "type": "track", "event": "e1",
                 "timestamp": "2026-01-01T00:00:00Z",
                 "properties": {"n": 1}},
                # exact dup 200ms later -> deduplicated
                {"anonymousId": "a", "type": "track", "event": "e1",
                 "timestamp": "2026-01-01T00:00:00.200Z",
                 "properties": {"n": 1}},
                {"anonymousId": "b", "type": "identify"},
            ],
        }
        # gzip body + Content-Encoding (router_batch_handler.go:124-126)
        body = _gzip.compress(json.dumps(payload).encode())
        with _raw(
            f"{base}/v1/batch",
            method="POST",
            body=body,
            headers={"Content-Type": "application/json",
                     "Content-Encoding": "gzip"},
        ) as resp:
            out = json.loads(resp.read())
        assert out["receivedEvents"] == 3
        assert out["deduplicatedEvents"] == 1
        assert out["processedEvents"] == 2
        assert out["okEvents"] == 2
        assert out["ok"] is True
        app.run_batch_cycle("d1")
        df = app.engine_for("d1").warehouse.read("events")
        rows = {r["event"]: r.asDict() for r in df.collect()}
        # with eventsName set, EVERY batch event is forced to type
        # 'track' and the name defaults in (router.go:292-296,318-320)
        assert set(rows) == {"e1", "imported"}
        assert all(r["type"] == "track" for r in rows.values())
        # shared payload context merged UNDER the event's own context
        assert rows["e1"]["context_app"] == "loader"
    finally:
        server.shutdown()
        shutil.rmtree(wh, ignore_errors=True)
        shutil.rmtree(topics, ignore_errors=True)


def test_segment_batch_per_event_error_isolation(ingest_server):
    app, base = ingest_server
    payload = {
        "writeKey": "wk-browser",
        "batch": [
            {"type": "track", "event": "ok-event"},
            {"type": "track"},          # missing event name -> error
            {"type": "bogus-type"},     # unknown type -> error
        ],
    }
    with _raw(
        f"{base}/v1/batch",
        method="POST",
        body=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    ) as resp:
        out = json.loads(resp.read())
    assert out["ok"] is False
    assert out["okEvents"] == 1
    assert len(out["errors"]) == 2
    assert app.metrics["ingest_errors"] >= 2  # dead-lettered


def test_settings_endpoint(ingest_server):
    app, base = ingest_server
    for path in ("/projects/wk-browser/settings",
                 "/v1/projects/wk-browser/settings"):
        with _raw(f"{base}{path}") as resp:
            assert resp.headers["Cache-Control"] == "public, max-age=86400"
            doc = json.loads(resp.read())
        assert doc["integrations"]["Segment.io"]["apiKey"] == "wk-browser"
        assert doc["analyticsNextEnabled"] is True


class TestSecondReviewRegressions:
    def test_truncated_gzip_is_400(self, ingest_server):
        import gzip as _gzip

        app, base = ingest_server
        good = _gzip.compress(b'{"batch": []}')
        for bad in (good[:-4], b"\x1f\x8b\x08\x00garbage"):
            try:
                _raw(f"{base}/v1/batch?writekey=wk-browser", method="POST",
                     body=bad,
                     headers={"Content-Type": "application/json",
                              "Content-Encoding": "gzip"})
                raise AssertionError("expected 400")
            except HTTPError as ex:
                assert ex.code == 400

    def test_non_list_batch_is_400(self, ingest_server):
        app, base = ingest_server
        try:
            _raw(f"{base}/v1/batch?writekey=wk-browser", method="POST",
                 body=b'{"batch": 5}',
                 headers={"Content-Type": "application/json"})
            raise AssertionError("expected 400")
        except HTTPError as ex:
            assert ex.code == 400

    def test_invalid_utf8_body_graceful(self, ingest_server):
        app, base = ingest_server
        # browser endpoint: 200 with ok=false, never a dropped connection
        with _raw(f"{base}/api/s/p?writekey=wk-browser", method="POST",
                  body=b"\xff\xfe\x00bad",
                  headers={"Content-Type": "application/json"}) as resp:
            assert resp.status == 200
            assert json.loads(resp.read())["ok"] is False

    def test_oversized_body_is_400(self, ingest_server):
        app, base = ingest_server
        req = urllib.request.Request(
            f"{base}/v1/batch", data=b"{}", method="POST",
            headers={"Content-Type": "application/json"},
        )
        req.add_unredirected_header("Content-Length", str(1 << 40))
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 400")
        except HTTPError as ex:
            assert ex.code == 400
        except Exception:
            # some urllib versions refuse to send the bogus length; the
            # app-level check is covered by the handler unit below
            pass

    def test_settings_key_is_json_escaped(self, ingest_server):
        app, base = ingest_server
        with _raw(f'{base}/projects/a%22b/settings') as resp:
            doc = json.loads(resp.read())  # must stay VALID json
        assert doc["integrations"]["Segment.io"]["apiKey"] == 'a"b'

    def test_settings_route_shape_is_exact(self, spark):
        """Only the reference's route shapes resolve pre-auth — a loose
        suffix match would leak future authorized GETs past the gate."""
        wh = tempfile.mkdtemp(prefix="ingest_wh_")
        topics = tempfile.mkdtemp(prefix="ingest_topics_")
        app = BulkerApp(spark, topics, [Destination("d1", wh)],
                        auth_tokens=["secret"])
        server = serve(app)
        host, port = server.server_address
        base = f"http://{host}:{port}"
        try:
            with _raw(f"{base}/projects/k1/settings") as resp:
                assert resp.status == 200
            for path in ("/v1/other/settings", "/projects/a/b/c/settings",
                         "/v1/settings"):
                try:
                    _raw(f"{base}{path}")
                    raise AssertionError(f"expected 401/404 for {path}")
                except HTTPError as ex:
                    assert ex.code in (401, 404), path
        finally:
            server.shutdown()
            shutil.rmtree(wh, ignore_errors=True)
            shutil.rmtree(topics, ignore_errors=True)

    def test_reordered_properties_deduplicate(self):
        a = {"anonymousId": "u", "type": "track", "event": "e",
             "timestamp": "2026-01-01T00:00:00Z",
             "properties": {"a": 1, "b": 2}}
        b = {"anonymousId": "u", "type": "track", "event": "e",
             "timestamp": "2026-01-01T00:00:00.100Z",
             "properties": {"b": 2, "a": 1}}  # reordered keys, same event
        assert len(shapes.deduplicate_batch([a, b], 1000)) == 1


# ==========================================================================
# Hashed write-key bindings (keyId:secret)
# ==========================================================================

class TestHashedWriteKeys:
    def test_hash_roundtrip_and_rotation(self):
        from bulker_spark.app.router import check_hash, hash_api_key

        stored = "salt1." + hash_api_key("sec", "salt1", "g-old")
        assert check_hash(stored, "sec", ["g-old"])
        # rotation: hash minted under the OLD secret stays valid while
        # both secrets are configured
        assert check_hash(stored, "sec", ["g-new", "g-old"])
        assert not check_hash(stored, "sec", ["g-new"])
        assert not check_hash(stored, "wrong", ["g-old"])
        assert not check_hash("missing-salt-sep", "sec", ["g-old"])

    @pytest.fixture()
    def hashed_server(self, spark):
        from bulker_spark.app.router import hash_api_key

        wh = tempfile.mkdtemp(prefix="hk_wh_")
        topics = tempfile.mkdtemp(prefix="hk_topics_")
        app = BulkerApp(
            spark,
            topics,
            [Destination("d1", wh)],
            streams=[
                {
                    "write_key": "",
                    "destination": "d1",
                    "table": "events",
                    "s2s": True,
                    "key_bindings": [
                        {
                            "id": "k1",
                            "hash": "na."
                            + hash_api_key("topsecret", "na", "gsec"),
                            "key_type": "s2s",
                        },
                        {
                            "id": "kb",
                            "hash": "nb."
                            + hash_api_key("browsersec", "nb", "gsec"),
                            "key_type": "browser",
                        },
                    ],
                },
            ],
            global_hash_secrets=["gsec"],
        )
        server = serve(app)
        host, port = server.server_address
        yield app, f"http://{host}:{port}"
        server.shutdown()
        shutil.rmtree(wh, ignore_errors=True)
        shutil.rmtree(topics, ignore_errors=True)

    def test_s2s_key_accepted_and_wrong_secret_rejected(
        self, hashed_server
    ):
        app, base = hashed_server
        body = json.dumps({"type": "track", "event": "e1"}).encode()
        with _raw(
            f"{base}/api/v1/s2s/event?token=k1:topsecret",
            method="POST",
            body=body,
            headers={"Content-Type": "application/json"},
        ) as resp:
            assert resp.status == 200
        assert app.metrics["events_produced"] == 1
        with pytest.raises(HTTPError):
            _raw(
                f"{base}/api/v1/s2s/event?token=k1:WRONG",
                method="POST",
                body=body,
                headers={"Content-Type": "application/json"},
            )
        assert app.metrics["events_produced"] == 1

    def test_browser_binding_rejected_on_s2s(self, hashed_server):
        app, base = hashed_server
        body = json.dumps({"type": "track", "event": "e2"}).encode()
        # kb authenticates fine as a credential, but its key TYPE is
        # browser — the s2s endpoint must refuse it
        with pytest.raises(HTTPError):
            _raw(
                f"{base}/api/v1/s2s/event?token=kb:browsersec",
                method="POST",
                body=body,
                headers={"Content-Type": "application/json"},
            )
        assert app.metrics["events_produced"] == 0

    def test_browser_binding_on_pixel(self, hashed_server):
        app, base = hashed_server
        data = base64.b64encode(
            json.dumps({"properties": {"y": 2}}).encode()
        ).decode()
        with _raw(
            f"{base}/api/px/p?writekey=kb:browsersec&data={data}"
        ) as resp:
            assert resp.status == 200
        assert app.metrics["events_produced"] == 1


class TestHashedKeyTrust:
    def test_split_on_first_dot_matches_reference_splitn(self):
        """The stored-hash format splits on the FIRST dot, matching the
        reference's strings.SplitN(hash, ".", 2) (ingest/router.go:
        548-560) so hashes are interoperable between implementations. A
        dotted salt therefore does NOT round-trip — its tail lands in
        the hash part, in both implementations identically."""
        from bulker_spark.app.router import check_hash, hash_api_key

        assert check_hash("v1." + hash_api_key("sec", "v1", "g"), "sec", ["g"])
        assert not check_hash(
            "v1.2." + hash_api_key("sec", "v1.2", "g"), "sec", ["g"]
        )

    def test_config_rejects_colon_plaintext_and_dup_binding_ids(
        self, spark, tmp_path
    ):
        with pytest.raises(ValueError, match="must not contain"):
            BulkerApp(
                spark,
                str(tmp_path / "t1"),
                [Destination("d1", str(tmp_path / "w1"))],
                streams=[{"write_key": "team:alpha", "destination": "d1"}],
            )
        with pytest.raises(ValueError, match="duplicate write_key"):
            BulkerApp(
                spark,
                str(tmp_path / "t3"),
                [Destination("d1", str(tmp_path / "w3"))],
                streams=[
                    {"write_key": "wk", "destination": "d1"},
                    {"write_key": "wk", "destination": "d1"},
                ],
            )
        bind = {"id": "k1", "hash": "s.x", "key_type": "browser"}
        with pytest.raises(ValueError, match="duplicate key-binding"):
            BulkerApp(
                spark,
                str(tmp_path / "t2"),
                [Destination("d1", str(tmp_path / "w2"))],
                streams=[
                    {"write_key": "", "destination": "d1",
                     "key_bindings": [bind]},
                    {"write_key": "", "destination": "d1",
                     "key_bindings": [dict(bind)]},
                ],
            )

    def test_browser_binding_on_s2s_stream_gets_untrusted_treatment(
        self, spark, tmp_path
    ):
        """A browser credential on a mixed-binding stream must NOT
        inherit the stream's s2s trust: the server-observed IP wins
        over a client-supplied context.ip (patch_event's browser
        branch), exactly as if the stream were browser-only."""
        from bulker_spark.app.router import hash_api_key

        app = BulkerApp(
            spark,
            str(tmp_path / "topics"),
            [Destination("d1", str(tmp_path / "wh"))],
            streams=[
                {
                    "write_key": "",
                    "destination": "d1",
                    "table": "events",
                    "s2s": True,
                    "key_bindings": [
                        {
                            "id": "kb",
                            "hash": "n." + hash_api_key("bsec", "n", "g"),
                            "key_type": "browser",
                        },
                        {
                            "id": "ks",
                            "hash": "m." + hash_api_key("ssec", "m", "g"),
                            "key_type": "s2s",
                        },
                    ],
                },
            ],
            global_hash_secrets=["g"],
        )
        spoof = json.dumps(
            {"type": "track", "event": "e", "context": {"ip": "6.6.6.6"}}
        )
        out = app.ingest_event(
            "track",
            spoof,
            {"writekey": ["kb:bsec"]},
            headers={},
            client_ip="9.9.9.9",
            s2s=False,
        )
        assert out["ok"] is True
        # same spoof through the s2s credential keeps its context.ip
        out2 = app.ingest_event(
            "track",
            spoof,
            {"writekey": ["ks:ssec"]},
            headers={},
            client_ip="9.9.9.9",
            s2s=True,
        )
        assert out2["ok"] is True
        app.run_batch_cycle("d1")
        rows = {
            r["context_ip"]
            for r in app.engine_for("d1")
            .warehouse.read("events")
            .select("context_ip")
            .collect()
        }
        # browser credential: server-observed IP replaced the spoof;
        # s2s credential: client-supplied context kept
        assert rows == {"9.9.9.9", "6.6.6.6"}


class TestLegacyHashSplitWarning:
    def test_legacy_last_dot_binding_warns_not_verifies(self, caplog):
        """A binding minted under the old LAST-dot split with a dotted
        salt no longer authenticates (format break, round 6); the
        failure must name itself in a warning so operators re-mint
        instead of chasing a silent 401 (ADVICE r6)."""
        import logging

        from bulker_spark.app.router import check_hash, hash_api_key

        legacy = "v1.2." + hash_api_key("sec", "v1.2", "g")
        with caplog.at_level(logging.WARNING, "bulker_spark.app.router"):
            assert not check_hash(legacy, "sec", ["g"])
        assert any("legacy last-dot" in r.message for r in caplog.records)

    def test_wrong_secret_does_not_warn(self, caplog):
        import logging

        from bulker_spark.app.router import check_hash, hash_api_key

        stored = "v1." + hash_api_key("sec", "v1", "g")
        with caplog.at_level(logging.WARNING, "bulker_spark.app.router"):
            assert not check_hash(stored, "nope", ["g"])
        assert not [r for r in caplog.records if "legacy" in r.message]
