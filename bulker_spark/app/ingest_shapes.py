"""Ingest-service event shaping: the pixel and classic (legacy) HTTP
event shapes.

Reference, behavior only (re-expressed, not translated):

- ``ingest/router_pixel_handler.go:165-197`` — tracking-pixel events are
  parsed from the query string: ``data`` carries a base64(JSON) event,
  every other parameter is merged in as a dotted path.
- ``ingest/router_pixel_handler.go:199-304`` — ``process_headers`` pulls
  anonymous/user/group identity out of cookies and synthesizes
  ``context.page`` from the Referer.
- ``ingest/router_pixel_handler.go:133-162`` — redirect-URL validation
  (https only, default port, never an IP, never the serving host).
- ``ingest/router.go:291-367`` — ``patchEvent``: event-type
  normalization, IP policy, browser-context enrichment, received-at
  stamping.
- ``ingest/router_classic_handler.go:207-236`` — ``patchClassicEvent``:
  the legacy flat event shape (``_timestamp``/``api_key``/``utc_time``/
  ``eventn_ctx_event_id``).
- ``jitsubase/types/json.go:57-92`` — ``FilterEvent``: strips reserved
  properties that may only be set server-side.

These are PURE functions over plain dicts — no HTTP, no Spark — so the
full shaping matrix is unit-testable; ``app/router.py`` wires them to
routes and the topic producer. Events produced here enter the same
topic → batch-cycle → warehouse pipeline as ``POST /post/:dst``; at
scale the shaping cost is O(request) on the ingest front, never on the
Spark load path.
"""

from __future__ import annotations

import base64
import hashlib
import ipaddress
import json
import re
import uuid as _uuid
import datetime as _dt
from typing import Any
from urllib.parse import urlparse

# ingest/router.go:33-42 — short aliases accepted in the pixel path, and
# the closed set of canonical event types
EVENT_TYPES_DICT = {
    "p": "page",
    "i": "identify",
    "t": "track",
    "g": "group",
    "a": "alias",
    "s": "screen",
    "e": "event",
}
EVENT_TYPES_SET = frozenset(
    {"page", "identify", "track", "group", "alias", "screen"}
)

# ingest/router.go:45
_MESSAGE_ID_UNSUPPORTED = re.compile(r"[^a-zA-Z0-9._-]")

# router_classic_handler.go:23-34
IP_POLICY_PARAMETER = "ip_policy"
COOKIE_POLICY_PARAMETER = "cookie_policy"

# router_pixel_handler.go:24-34
DATA_FIELD = "data"
COOKIE_DOMAIN_FIELD = "cookie_domain"
REDIRECT_URL_FIELD = "destination_url"
PROCESS_HEADERS_FIELD = "process_headers"
ANONYMOUS_ID_COOKIE = "__eventn_id"
USER_ID_COOKIE = "__eventn_uid"
USER_TRAITS_COOKIE = "__eventn_id_usr"
GROUP_ID_COOKIE = "__group_id"
GROUP_TRAITS_COOKIE = "__group_traits"

# a 1x1 transparent GIF (the standard minimal pixel;
# jitsubase/appbase/router_base.go:25 serves the same shape)
EMPTY_GIF = (
    b"GIF89a\x01\x00\x01\x00\x80\x00\x00\x00\x00\x00\x00\x00\x00!\xf9\x04"
    b"\x01\x00\x00\x00\x00,\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02D"
    b"\x01\x00;"
)

# our own minimal loader script (the reference embeds the full Jitsu
# browser SDK at router_classic_handler.go:55; the HTTP semantics —
# ETag, 304, HEAD — are the ported behavior, the script body is not)
LIB_JS = (
    b"(function(){\n"
    b"  // bulker_spark classic loader stub: posts events to\n"
    b"  // /api/v1/event?token=<key> on window.bsTrack(type, props)\n"
    b"  var s=document.currentScript;var host=s&&s.src?s.src.replace("
    b"/\\/s\\/lib\\.js.*$/,''):'';\n"
    b"  var key=s?s.getAttribute('data-jitsu-api-key'):null;\n"
    b"  window.bsTrack=function(t,p){var e=p||{};e.event_type=t;\n"
    b"    var x=new XMLHttpRequest();x.open('POST',host+"
    b"'/api/v1/event?token='+key);\n"
    b"    x.setRequestHeader('Content-Type','application/json');"
    b"x.send(JSON.stringify(e));};\n"
    b"})();\n"
)
LIB_JS_ETAG = '"%s"' % hashlib.sha1(LIB_JS).hexdigest()

_TRUISH = {"1", "true", "yes", "on"}

# a compact common-suffix table standing in for the full public-suffix
# list (router_pixel_handler.go:306-334 links golang.org/x/net/
# publicsuffix; the full ICANN list is out of scope — cookie scoping
# here only needs the frequent two-label registries)
_TWO_LABEL_SUFFIXES = frozenset(
    {
        "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
        "com.au", "net.au", "org.au", "edu.au", "gov.au",
        "co.nz", "net.nz", "org.nz",
        "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
        "com.br", "net.br", "org.br",
        "co.in", "net.in", "org.in", "firm.in", "gen.in",
        "com.cn", "net.cn", "org.cn", "gov.cn",
        "com.mx", "com.ar", "com.tr", "com.sg", "com.hk",
        "co.za", "co.kr", "co.il", "com.tw",
    }
)


def is_truish(value: Any) -> bool:
    return str(value).strip().lower() in _TRUISH


def header_get(headers: dict[str, str], name: str, default: str = "") -> str:
    """Case-insensitive header lookup over a plain dict. HTTP headers
    are case-insensitive on the wire (HTTP/2 proxies lowercase them,
    nginx title-cases differently than Python), but the app layer
    receives plain dicts — every read must go through this."""
    value = headers.get(name)
    if value is not None:
        return value
    lname = name.lower()
    for key, value in headers.items():
        if key.lower() == lname:
            return value
    return default


def sanitize_message_id(message_id: str | None) -> str:
    """router_pixel_handler.go:85-90 / router_classic_handler.go:165-170:
    unsupported chars → ``_``, capped at 64; empty → fresh uuid."""
    if not message_id:
        return _uuid.uuid4().hex
    return _MESSAGE_ID_UNSUPPORTED.sub("_", str(message_id))[:64]


def set_path(obj: dict, path: str, value: Any) -> None:
    """Dotted-path set creating intermediate objects — the jsonorder
    ``SetPath`` the pixel parser merges query params with
    (router_pixel_handler.go:187-189)."""
    parts = path.split(".")
    cur = obj
    for p in parts[:-1]:
        nxt = cur.get(p)
        if not isinstance(nxt, dict):
            nxt = {}
            cur[p] = nxt
        cur = nxt
    cur[parts[-1]] = value


def parse_pixel_event(query: dict[str, list[str]]) -> dict:
    """router_pixel_handler.go:165-197 — event = base64(JSON) from the
    ``data`` param, then every other query param merged in as a dotted
    path (single value → scalar, repeated → list). Control params
    (``data``/``cookie_domain``/``process_headers``/``destination_url``)
    are never copied into the event."""
    event: dict = {}
    data = (query.get(DATA_FIELD) or [""])[0]
    if data:
        try:
            raw = base64.b64decode(data, validate=True)
        except Exception as ex:
            raise ValueError(
                f"error decoding event from {DATA_FIELD!r} field "
                f"in tracking pixel: {ex}"
            ) from ex
        try:
            decoded = json.loads(raw)
        except Exception as ex:
            raise ValueError(
                f"error unmarshalling event from {DATA_FIELD!r}: {ex}"
            ) from ex
        if not isinstance(decoded, dict):
            raise ValueError(
                f"event from {DATA_FIELD!r} must be a JSON object"
            )
        event = decoded
    for key, values in query.items():
        if key in (
            DATA_FIELD,
            COOKIE_DOMAIN_FIELD,
            PROCESS_HEADERS_FIELD,
            REDIRECT_URL_FIELD,
            # our routing extension (not in the reference's param set):
            # consumed by ingest_pixel for table addressing, so it is a
            # control param too — never event payload
            "tableName",
        ):
            continue
        set_path(event, key, values[0] if len(values) == 1 else list(values))
    return event


def extract_redirect_url(
    requested: str | None, message: dict, request_host: str
) -> str:
    """router_pixel_handler.go:133-162 — a pixel may 302 to
    ``destination_url`` only when it is https, on the default port, not
    an IP literal, and not the serving host. Anything else falls back to
    serving the GIF (return '')."""
    redirect = requested or str(message.get(REDIRECT_URL_FIELD) or "")
    if not redirect:
        return ""
    try:
        parsed = urlparse(redirect)
    except ValueError:
        return ""
    if parsed.port is not None:
        return ""
    if parsed.scheme != "https":
        return ""
    if parsed.netloc == request_host:
        return ""
    try:
        ipaddress.ip_address(parsed.hostname or "")
        return ""  # IP literals are never a redirect target
    except ValueError:
        pass
    return redirect


def extract_top_level_and_domain(host: str) -> tuple[str, str]:
    """router_pixel_handler.go:306-334 — ``abc.efg.com`` →
    ``('efg.com', 'abc')``: the registrable domain (for cookie scoping)
    and the label in front of it."""
    host = host.split(":")[0].strip(".")
    labels = host.split(".")
    if len(labels) <= 1:
        return host, ""
    suffix_len = 1
    if len(labels) >= 3 and ".".join(labels[-2:]) in _TWO_LABEL_SUFFIXES:
        suffix_len = 2
    tld_plus_one = ".".join(labels[-(suffix_len + 1):])
    rest = labels[: -(suffix_len + 1)]
    return tld_plus_one, rest[-1] if rest else ""


def process_headers_data(
    event: dict,
    *,
    cookies: dict[str, str],
    host: str,
    referer: str = "",
    tp: str = "",
    cookie_domain: str = "",
) -> dict | None:
    """router_pixel_handler.go:199-304 — enrich a pixel event from
    cookies + Referer. Mutates ``event``; returns a set-cookie spec
    ``{name, value, domain}`` when a fresh anonymousId must be planted
    (the caller renders the actual Set-Cookie header), else None."""
    set_cookie: dict | None = None
    if not event.get("anonymousId"):
        anonymous_id = cookies.get(ANONYMOUS_ID_COOKIE)
        if not anonymous_id:
            anonymous_id = _uuid.uuid4().hex
            domain = cookie_domain or extract_top_level_and_domain(host)[0]
            set_cookie = {
                "name": ANONYMOUS_ID_COOKIE,
                "value": anonymous_id,
                "domain": domain,
            }
        event["anonymousId"] = anonymous_id
    if not event.get("userId"):
        user_id = cookies.get(USER_ID_COOKIE)
        if user_id:
            event["userId"] = user_id

    ctx = event.get("context")
    if not isinstance(ctx, dict):
        ctx = {}
    if not ctx.get("groupId"):
        group_id = cookies.get(GROUP_ID_COOKIE)
        if group_id:
            ctx["groupId"] = group_id

    traits = ctx.get("traits")
    if not isinstance(traits, dict):
        traits = {}
    merged_traits: dict = {}
    for cookie_name in (GROUP_TRAITS_COOKIE, USER_TRAITS_COOKIE):
        raw = cookies.get(cookie_name)
        if raw:
            try:
                parsed = json.loads(raw)
                if isinstance(parsed, dict):
                    merged_traits.update(parsed)
            except ValueError:
                pass  # reference ignores unparseable traits cookies
    merged_traits.update(traits)  # explicit event traits win
    if merged_traits:
        ctx["traits"] = merged_traits

    if referer:
        try:
            r = urlparse(referer)
        except ValueError:
            r = None
        if r is not None:
            page = ctx.get("page")
            if not isinstance(page, dict):
                page = {}
            page.setdefault("url", referer)
            page.setdefault("path", r.path)
            page.setdefault("search", r.query)
            page.setdefault("host", r.netloc)
            if page:
                ctx["page"] = page
            # page events also surface the referer under top-level
            # properties — sourced from CONTEXT's properties exactly
            # like the reference (router_pixel_handler.go:287-299 reads
            # ctx.Get("properties") and overwrites event["properties"]);
            # an event-level properties object is intentionally replaced
            if tp in ("page", "p"):
                properties = ctx.get("properties")
                if not isinstance(properties, dict):
                    properties = {}
                properties.setdefault("url", referer)
                properties.setdefault("path", r.path)
                properties.setdefault("search", r.query)
                event["properties"] = properties
    event["context"] = ctx
    return set_cookie


# -- reserved-property filtering --------------------------------------------

_FILTERED_TOP_LEVEL = (
    "JITSU_TABLE_NAME",
    "JITSU_PROFILE_ID",
    "SALESFORCE_OPERATION",
    "SALESFORCE_SOBJECT",
    "SALESFORCE_MATCHERS_OPERATOR",
    "SALESFORCE_MATCHERS",
    "SALESFORCE_PAYLOAD",
)
_SQL_TYPE_PREFIX = "__sql_type"


def filter_event(event: dict) -> None:
    """jitsubase/types/json.go:57-92 — remove server-reserved properties
    from a browser-supplied event: the JITSU_*/SALESFORCE_* routing keys
    at top level, and every ``__sql_type*`` hint at ANY depth (those may
    only be set by server-side functions)."""
    for key in _FILTERED_TOP_LEVEL:
        event.pop(key, None)
    _filter_nested(event)


def _filter_nested(node: Any) -> None:
    if isinstance(node, dict):
        for key in [k for k in node if k.startswith(_SQL_TYPE_PREFIX)]:
            del node[key]
        for value in node.values():
            _filter_nested(value)
    elif isinstance(node, list):
        for value in node:
            _filter_nested(value)


def ip_strip_last_octet(ip: str) -> str:
    """ingest/router.go:404-410."""
    parts = ip.split(".")
    if len(parts) == 4:
        return ".".join(parts[:3]) + ".0"
    return ip


def client_ip_from(headers: dict[str, str], fallback: str = "") -> str:
    """ingest/router.go:322 — X-Real-Ip, else X-Forwarded-For, else the
    socket peer; first hop only, trimmed."""
    raw = (
        header_get(headers, "X-Real-Ip")
        or header_get(headers, "X-Forwarded-For")
        or fallback
        or ""
    )
    return raw.split(",")[0].strip()


def _now_iso(now: _dt.datetime | None) -> str:
    ts = now or _dt.datetime.now(_dt.timezone.utc)
    return ts.strftime("%Y-%m-%dT%H:%M:%S.") + f"{ts.microsecond // 1000:03d}Z"


def patch_event(
    event: dict,
    *,
    tp: str,
    message_id: str,
    ingest_type: str = "browser",
    headers: dict[str, str] | None = None,
    client_ip: str = "",
    ip_policy: str = "",
    analytic_context: dict | None = None,
    default_event_name: str = "",
    now: _dt.datetime | None = None,
) -> dict:
    """ingest/router.go:291-367 — normalize + enrich one ingest event in
    place (returns it for chaining). Raises ValueError exactly where the
    reference rejects the event."""
    headers = headers or {}
    type_fixed = EVENT_TYPES_DICT.get(tp, tp)
    if type_fixed == "event":
        if default_event_name:
            type_fixed = "track"
        else:
            type_fixed = str(event.get("type") or "")
            if not type_fixed:
                raise ValueError("type property of event is required")
    if type_fixed not in EVENT_TYPES_SET:
        raise ValueError(f"Unknown event type: {type_fixed}")
    if type_fixed == "track":
        event_name = str(event.get("event") or "") or default_event_name
        if not event_name:
            raise ValueError("'event' property is required for 'track' event")
        if len(event_name) > 128:
            raise ValueError(
                f"Invalid track event name '{event_name}'. "
                "Max length is 128 characters."
            )
        if default_event_name:
            event.setdefault("event", event_name)

    ip = client_ip_from(headers, client_ip)
    policy = ip_policy or header_get(headers, "X-IP-Policy")
    if policy == "stripLastOctet":
        ip = ip_strip_last_octet(ip)
    elif policy == "remove":
        ip = ""
    if ip:
        event["requestIp"] = ip

    ctx = event.get("context")
    if not isinstance(ctx, dict):
        ctx = {}
        event["context"] = ctx
    if analytic_context:
        merged = dict(analytic_context)
        merged.update(ctx)
        ctx = merged
        event["context"] = ctx
    if ingest_type == "browser":
        # browser-supplied context is untrusted: the server-observed ip
        # and headers win, and reserved properties are stripped
        if ip:
            ctx["ip"] = ip
        ctx.setdefault("userAgent", header_get(headers, "User-Agent") or None)
        ctx.setdefault(
            "locale",
            header_get(headers, "Accept-Language").split(",")[0].strip(),
        )
        filter_event(event)
    now_iso = _now_iso(now)
    event["receivedAt"] = now_iso
    event["type"] = type_fixed
    event.setdefault("timestamp", now_iso)
    event.setdefault("messageId", message_id)
    return event


def patch_classic_event(
    event: dict,
    *,
    message_id: str,
    api_key: str,
    ingest_type: str = "browser",
    headers: dict[str, str] | None = None,
    client_ip: str = "",
    ip_policy: str = "",
    now: _dt.datetime | None = None,
) -> dict:
    """router_classic_handler.go:207-236 — the legacy flat event shape:
    ``source_ip``/``user_agent``/``user_language`` at top level,
    ``_timestamp``/``api_key``/``utc_time``/``eventn_ctx_event_id``
    stamped server-side."""
    headers = headers or {}
    ip = client_ip_from(headers, client_ip)
    # the classic handler treats strict and comply IDENTICALLY — both
    # strip the last octet (router_classic_handler.go:209-213; only the
    # COOKIE policy distinguishes strict)
    if ip_policy in ("strict", "comply"):
        ip = ip_strip_last_octet(ip)
    if ingest_type == "browser":
        if ip:
            event["source_ip"] = ip
        event.setdefault("user_agent", header_get(headers, "User-Agent") or None)
        event.setdefault(
            "user_language",
            header_get(headers, "Accept-Language").split(",")[0].strip(),
        )
        filter_event(event)
    now_iso = _now_iso(now)
    event["_timestamp"] = now_iso
    event["api_key"] = api_key
    event.setdefault("utc_time", now_iso)
    event.setdefault("eventn_ctx_event_id", message_id)
    return event


def deduplicate_batch(batch: list, gap_ms: int) -> list:
    """router_batch_handler.go:34-108 — in-batch time-gap dedup for the
    segment /batch endpoint: two events with identical (anonymousId,
    userId, type, event, properties, traits) within ``gap_ms`` of each
    other collapse to the first. Events without a parseable RFC3339
    timestamp are never deduplicated; a repeat OUTSIDE the gap resets
    the reference timestamp."""
    if len(batch) <= 1 or gap_ms <= 0:
        return list(batch)
    seen: dict[tuple, _dt.datetime] = {}
    result = []
    for event in batch:
        if not isinstance(event, dict):
            result.append(event)
            continue
        ts_str = str(event.get("timestamp") or "")
        ts = None
        if ts_str:
            try:
                ts = _dt.datetime.fromisoformat(
                    ts_str.replace("Z", "+00:00")
                )
            except ValueError:
                ts = None
        if ts is None:
            result.append(event)
            continue
        key = (
            str(event.get("anonymousId") or ""),
            str(event.get("userId") or ""),
            str(event.get("type") or ""),
            str(event.get("event") or ""),
            # sort_keys canonicalizes producer key order — a retried
            # event re-serialized with reordered keys is the same event
            json.dumps(event.get("properties"), default=str, sort_keys=True)
            if "properties" in event
            else "",
            json.dumps(event.get("traits"), default=str, sort_keys=True)
            if "traits" in event
            else "",
        )
        existing = seen.get(key)
        if existing is not None:
            # naive vs aware timestamps in one batch: treat as distinct
            # epochs rather than crash the whole request
            try:
                diff_ms = abs((ts - existing).total_seconds()) * 1000.0
            except TypeError:
                diff_ms = float("inf")
            if diff_ms <= gap_ms:
                continue  # duplicate inside the gap
        seen[key] = ts
        result.append(event)
    return result


# router_segment_settings_handler.go:8-9 — the static analytics.js
# settings document, write key spliced in
SETTINGS_HEADER = '{"integrations":{"Segment.io":{"apiKey":"'
SETTINGS_FOOTER = (
    '","versionSettings":{"version":"4.4.7","componentTypes":'
    '["browser"]}}},"plan":{"track":{"__default":{"enabled":true}},'
    '"identify":{"__default":{"enabled":true}},"group":{"__default":'
    '{"enabled":true}}},"analyticsNextEnabled":true}'
)


def settings_document(write_key: str) -> str:
    # JSON-escape the key: it arrives from the URL path, and splicing it
    # raw would let a crafted key break out of the string and inject
    # structure into a publicly-cacheable application/json document
    escaped = json.dumps(str(write_key))[1:-1]
    return SETTINGS_HEADER + escaped + SETTINGS_FOOTER


def classic_token_from(
    query: dict[str, list[str]], headers: dict[str, str]
) -> str:
    """router_classic_handler.go:109-120 — ``?token=``, then the
    ``x-auth-token``/``api_key`` headers, then any ``p_*`` query param
    (the randomized-URL scheme)."""
    token = (
        (query.get("token") or [""])[0]
        or header_get(headers, "X-Auth-Token")
        or header_get(headers, "Api_key")
    )
    if token:
        return token
    for key, values in query.items():
        if key.startswith("p_") and values:
            return values[0]
    return ""


def write_key_from(
    query: dict[str, list[str]], headers: dict[str, str]
) -> str:
    """ingest/router.go:369-388 (getDataLocator) — Authorization Basic
    base64 (trailing ``:`` trimmed), then X-Write-Key, then
    ``?writekey=``."""
    auth = header_get(headers, "Authorization")
    if auth:
        wk = auth.removeprefix("Basic ").strip()
        try:
            decoded = base64.b64decode(wk).rstrip(b":")
            return decoded.decode("utf-8")
        except Exception:
            return ""
    return header_get(headers, "X-Write-Key") or (
        (query.get("writekey") or [""])[0]
    )
