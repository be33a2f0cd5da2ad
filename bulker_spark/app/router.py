"""HTTP router — the reference's public API surface in Python stdlib form.

Reference: ``bulkerapp/app/router.go``:
- ``POST /post/:destinationId?tableName=`` (:122-191) — one JSON event,
  produced asynchronously to the destination's topic; the warehouse load
  happens later when a batch cycle drains the topic.
- ``POST /bulk/:destinationId?tableName=&mode=&pk=`` (:220-321) — NDJSON
  body streamed synchronously through a BulkerStream; the HTTP handler is
  the driver; response carries the load counters.
- ``GET /failed/:destinationId?tableName=`` (:370-432) — dead-letter peek.
- ``GET /ready`` (health) and ``GET /metrics`` (counter snapshot).

Spark mapping: topics are ``bulker_topic`` segment directories (the
repo's Spark 4 Python Data Source, ``sources/topic_source.py``); the
batch-consumer cron (``bulkerapp/app/cron.go:25-56``) becomes
``run_batch_cycle`` — an ``availableNow`` checkpointed drain through
``IngestStream`` — exposed as ``POST /cycle/:destinationId`` so tests and
operators can trigger it like the reference's on-demand runs. The HTTP
layer itself is driver-side control plane only: event bytes go straight
to topic segments, and every data-plane transformation stays in Spark.
"""

from __future__ import annotations

import hmac
import json
import os
import re
import threading
import time
import uuid
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any
from urllib.parse import parse_qs, quote, unquote, urlparse

from ..api import Engine, StreamOptions, StreamResult
from ..streaming.ingest_stream import IngestStream
from ..streaming.topics import make_topic_id, parse_topic_id

MAX_BODY_BYTES = 20 * 1024 * 1024  # reference caps request bodies (gin default)


def hash_api_key(token: str, salt: str, secret: str) -> str:
    """``sha512(token + salt + secret)`` hex — the reference's
    ``hashApiKey`` (ingest/router.go:541-546) / ``HashTokenHex``
    (appbase/router_base.go:217-222). Used to mint and verify hashed
    write-key bindings; the plaintext secret never has to be stored."""
    import hashlib

    return hashlib.sha512((token + salt + secret).encode()).hexdigest()


def check_hash(stored: str, secret: str, global_secrets: list[str]) -> bool:
    """Verify a ``salt.sha512hex`` stored hash against a presented
    secret under ANY configured global secret (rotation list,
    ingest/router.go:548-560). Constant-time comparison — an
    improvement over the reference's ``==``. Split on the FIRST dot,
    matching the reference's ``strings.SplitN(hash, ".", 2)``, so
    hashes minted by either implementation verify identically (a
    dotted salt puts its tail inside the hash part in both).

    FORMAT BREAK NOTE (pre-round-6 bindings): this port originally
    split on the LAST dot, so a binding minted under the old scheme
    with a dotted salt parses differently now and will fail to verify.
    When that exact situation is detected — first-dot verification
    fails but the legacy last-dot parse would have passed — a WARNING
    names the binding's salt prefix so operators can re-mint it instead
    of chasing a silent auth failure."""
    salt, sep, hash_part = stored.partition(".")
    if not sep:
        return False
    if any(
        hmac.compare_digest(hash_part, hash_api_key(secret, salt, g))
        for g in global_secrets
    ):
        return True
    l_salt, l_sep, l_hash = stored.rpartition(".")
    if l_sep and l_salt != salt and any(
        hmac.compare_digest(l_hash, hash_api_key(secret, l_salt, g))
        for g in global_secrets
    ):
        import logging

        logging.getLogger(__name__).warning(
            "check_hash: stored hash (salt prefix %r) only verifies"
            " under the legacy last-dot split — re-mint this binding"
            " with the current salt.sha512 format",
            salt[:8],
        )
    return False


def _utc_or_none(value, spark):
    """Aware-UTC datetime from a query-string timestamp, or ``None``.

    Mirrors what ``F.lit(value).cast("timestamp")`` resolves the string
    to: an explicit offset is honored, a naive spelling is localized in
    the SESSION timezone (``spark.sql.session.timeZone``) — so the prune
    bound and the real filter agree on the instant. ``None`` on any
    parse/zone failure tells the caller to skip pruning (advisory only).
    """
    import datetime as _dt

    if isinstance(value, _dt.datetime):
        d = value
    else:
        s = str(value).strip()
        if " " in s:
            s = s.replace(" ", "T", 1)
        if s.endswith("Z"):
            s = s[:-1] + "+00:00"
        try:
            d = _dt.datetime.fromisoformat(s)
        except ValueError:
            return None
    if d.tzinfo is None:
        try:
            from zoneinfo import ZoneInfo

            tz = spark.conf.get("spark.sql.session.timeZone", "UTC")
            d = d.replace(tzinfo=ZoneInfo(tz))
        except Exception:
            return None
    return d.astimezone(_dt.timezone.utc)


class ForbiddenPathError(PermissionError):
    """A runtime-supplied warehouse path violated allowed_warehouse_roots.
    Distinct from a filesystem PermissionError (EACCES on a read-only
    mount), which must keep mapping to 422 'destination unwritable' —
    only the policy violation maps to 403."""


@dataclass
class Destination:
    """One configured destination (the repository entry the router looks
    up per request, ``router.go:145``)."""

    destination_id: str
    warehouse_path: str
    namespace: str = "default"
    # default StreamOptions fields applied to every load for this
    # destination (mode may be overridden per-request like the reference's
    # query params)
    options: dict[str, Any] = field(default_factory=dict)
    # ingest enrichment filters (``ingest/filters.go:9-67``): an
    # ``{"events": ..., "hosts": ...}`` allowlist applied JVM-side during
    # the batch cycle — non-matching events are dropped before the load,
    # exactly the reference's pre-produce filtering (applied pre-load here
    # so the predicate rides the topic scan as one codegen'd Column)
    filters: dict[str, Any] | None = None
    # materialized rollups auto-refreshed after each cycle: list of
    # RollupSpec-shaped dicts ({source, target, group_by, counts, sums})
    # — each refresh aggregates ONLY the files appended since its last
    # refreshed commit (operators/incremental.py)
    rollups: list[dict[str, Any]] | None = None
    # committed versions retained per table: >1 enables time travel and
    # the GET /changes/:dst change feed (its horizon is exactly this
    # retention window); 1 = storage-minimal, feed unavailable past the
    # newest commit
    retain_versions: int = 1
    # cross-destination table replication drained after each cycle: list
    # of {source, to, target?} dicts — ``source`` table here follows into
    # destination ``to`` (as ``target``, default same name) via the
    # streaming change feed (streaming/replicate.py: snapshot bootstrap +
    # exactly-once merge/delete apply). Requires retain_versions > 1 so
    # the feed horizon covers the inter-cycle gap.
    replicas: list[dict[str, Any]] | None = None


class TopicProducer:
    """Driver-side single-event producer: each flush publishes ONE new
    immutable segment (tmp-write + rename, invisible until renamed) —
    the file-form of the reference's async Kafka produce
    (``router.go:185``, ``producer.go``). Buffering (``batch_size``)
    amortizes segment count for hot topics; ``flush_all`` is called by
    every batch cycle so buffered events are never stranded."""

    def __init__(self, topics_root: str, batch_size: int = 1):
        self.topics_root = topics_root
        self.batch_size = max(1, int(batch_size))
        self._buffers: dict[str, list[str]] = {}
        self._lock = threading.Lock()
        self.produced = 0

    def produce(self, topic: str, line: str) -> None:
        with self._lock:
            buf = self._buffers.setdefault(topic, [])
            buf.append(line)
            self.produced += 1
            if len(buf) >= self.batch_size:
                try:
                    self._flush_locked(topic)
                except Exception:
                    # the failed flush left EVERY buffered line in place;
                    # withdraw only this call's line so the caller's
                    # failure handling (failover log) owns exactly one
                    # copy — older buffered lines stay for the next
                    # flush attempt, never double-delivered
                    buf.pop()
                    self.produced -= 1
                    raise

    def flush_all(self) -> None:
        with self._lock:
            for topic in list(self._buffers):
                self._flush_locked(topic)

    def _flush_locked(self, topic: str) -> None:
        buf = self._buffers.get(topic)
        if not buf:
            return
        tdir = os.path.join(self.topics_root, topic)
        os.makedirs(tdir, exist_ok=True)
        # name-sorted == publish order (the reader's log order contract);
        # time_ns + uuid keeps names unique across producers
        final = f"seg-{time.time_ns():020d}-{uuid.uuid4().hex[:8]}.ndjson"
        tmp = os.path.join(tdir, f".{final}.tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write("\n".join(buf) + "\n")
        os.rename(tmp, os.path.join(tdir, final))
        self._buffers[topic] = []


def _validate_destination(dest: Destination) -> None:
    """Reject configs that can only fail at runtime. A replica follows
    the source's change feed between cycles; with the default
    retain_versions=1 every commit GCs the feed's horizon, so every
    drain after the first would raise — fail at registration instead."""
    if dest.replicas and dest.retain_versions <= 1:
        raise ValueError(
            f"destination {dest.destination_id} declares replicas but "
            f"retain_versions={dest.retain_versions}; the change feed "
            "needs retain_versions > 1 to cover the inter-cycle gap"
        )


class BulkerApp:
    """The application object behind the HTTP handlers (and usable
    directly as a library, mirroring the reference's app/router split)."""

    def __init__(
        self,
        spark,
        topics_root: str,
        destinations: dict[str, Destination] | list[Destination],
        producer_batch_size: int = 1,
        auth_tokens: list[str] | None = None,
        allowed_warehouse_roots: list[str] | None = None,
        streams: list[dict[str, Any]] | None = None,
        failover: dict[str, Any] | None = None,
        global_hash_secrets: list[str] | None = None,
    ):
        from ..sources.topic_source import register_topic_source

        register_topic_source(spark)
        self.spark = spark
        self.topics_root = topics_root
        os.makedirs(topics_root, exist_ok=True)
        if isinstance(destinations, list):
            destinations = {d.destination_id: d for d in destinations}
        for d in destinations.values():
            _validate_destination(d)
        self.destinations = destinations
        self.producer = TopicProducer(topics_root, producer_batch_size)
        # HTTP bearer-token auth, the reference's AUTH_TOKENS middleware
        # (appbase/router_base.go:Authorize); empty list = open (dev mode,
        # matching the reference when no tokens are configured)
        self.auth_tokens = list(auth_tokens or [])
        # roots that runtime-supplied warehouse paths (/test probes,
        # /config registration) must live under; empty = unrestricted
        self.allowed_warehouse_roots = [
            os.path.realpath(r) for r in (allowed_warehouse_roots or [])
        ]
        self._engines: dict[str, Engine] = {}
        self.metrics: dict[str, int] = {
            "events_produced": 0,
            "bulk_requests": 0,
            "bulk_rows": 0,
            "cycles": 0,
            "cycle_topics_drained": 0,
            # accumulated per-micro-batch StreamResult counters
            # (bulker.go:152-265's running state, fed by IngestStream's
            # on_result callback)
            "loaded_batches": 0,
            "loaded_rows": 0,
            "malformed_rows": 0,
            # ingest-front counters (IngestedMessagesReceived,
            # router_pixel_handler.go:50-55)
            "ingest_received": 0,
            "ingest_errors": 0,
        }
        # ingest-front streams (ingest/router.go getStream): pixel and
        # classic endpoints route by write key or Host domain, not by the
        # /post/:dst path. Each entry: {"write_key": str, "destination":
        # str, "table": "events", "domains": [...], "s2s": bool,
        # "key_bindings": [{"id", "hash": "salt.sha512hex",
        # "key_type": "browser"|"s2s"}]} — bindings let a stream accept
        # "keyId:secret" credentials whose secret is stored only as a
        # salted hash (ingest/router.go:541-560 hashApiKey/checkHash,
        # fast_store.go ApiKeyBinding)
        self.streams: list[dict[str, Any]] = list(streams or [])
        # secrets mixed into every key hash (GLOBAL_HASH_SECRET,
        # ingest/config.go:31-33 — a comma-list so secrets can rotate:
        # a hash matching ANY configured secret is valid)
        self.global_hash_secrets = list(global_hash_secrets or [])
        # fail-fast config validation: ':' is the keyId/secret separator
        # (a plaintext write key containing one would silently route to
        # binding resolution and never match — same grammar as the
        # reference, ingest/router.go:630), and binding ids are a
        # global namespace (fast_store keys by id alone) so duplicates
        # would make resolution order-dependent
        seen_binding_ids: set[str] = set()
        for stream in self.streams:
            wk = stream.get("write_key") or ""
            if ":" in wk:
                raise ValueError(
                    f"plaintext write_key {wk!r} must not contain ':' — "
                    "use a key binding (keyId:secret) instead"
                )
            for b in stream.get("key_bindings") or []:
                bid = b.get("id")
                if not bid:
                    raise ValueError("key binding requires an 'id'")
                if bid in seen_binding_ids:
                    raise ValueError(
                        f"duplicate key-binding id {bid!r}: binding ids "
                        "are global across streams"
                    )
                seen_binding_ids.add(bid)
        # same single-namespace rule for plaintext keys: two streams
        # sharing a write_key would route by config-list order
        seen_keys: set[str] = set()
        for stream in self.streams:
            wk = stream.get("write_key") or ""
            if wk and wk in seen_keys:
                raise ValueError(
                    f"duplicate write_key {wk!r} across streams"
                )
            if wk:
                seen_keys.add(wk)
        self._lock = threading.Lock()
        self._cycle_locks: dict[str, threading.Lock] = {}
        # failover-reprocessing jobs (admin/router_reprocessing_handler.go)
        self._reproc_jobs: dict[str, dict[str, Any]] = {}
        self._reproc_cancel: set[str] = set()
        self._reproc_seq = 0
        # durable job store (the reference keeps these in a
        # reprocessing_jobs table, admin/reprocessing_db_schema.go:14-25;
        # here a tmp+rename JSON snapshot under the topics root) — loaded
        # at startup so job history survives restarts
        self._reproc_store = os.path.join(
            topics_root, ".reprocessing_jobs.json"
        )
        self._load_reproc_jobs()
        # failover: produce failures land in a rotating local log instead
        # of being dropped (kafkabase/failover_logger.go), and the batch
        # cycle replays that backlog automatically once the topic store is
        # healthy again (admin/failover_reprocessor.go's recovery replay,
        # in-process). Health transitions per destination are tracked for
        # the /health/destinations surface. ``failover`` keys: ``path``,
        # ``threshold``, ``max_size``, ``rotation_period``, ``compress``.
        from .failover import DestinationHealth, FailoverLogger

        failover = failover or {}
        self.health = DestinationHealth(failover.get("threshold", 3))
        self.failover_logger: FailoverLogger | None = None
        if failover.get("enabled", failover.get("path") is not None):
            self.failover_logger = FailoverLogger(
                failover.get(
                    "path", os.path.join(topics_root, "_failover")
                ),
                max_size=failover.get("max_size", 64 * 1024 * 1024),
                rotation_period=failover.get("rotation_period"),
                compress=failover.get("compress", True),
            )
        self.metrics["failover_logged"] = 0
        self.metrics["failover_replayed"] = 0
        # serializes replay_failover: concurrent cycles of DIFFERENT
        # destinations share one failover log — without this two threads
        # would replay the same files twice and race on the archive move
        self._failover_lock = threading.Lock()

    def _record_load(self, table: str, res) -> None:
        with self._lock:
            self.metrics["loaded_batches"] += 1
            self.metrics["loaded_rows"] += res.successful_rows
            self.metrics["malformed_rows"] += res.malformed_rows

    # -- plumbing -----------------------------------------------------------
    def engine_for(self, destination_id: str) -> Engine:
        dest = self.destinations.get(destination_id)
        if dest is None:
            raise KeyError(f"destination not found: {destination_id}")
        with self._lock:
            eng = self._engines.get(destination_id)
            if eng is None:
                eng = Engine(
                    self.spark,
                    dest.warehouse_path,
                    namespace=dest.namespace,
                    retain_versions=dest.retain_versions,
                )
                self._engines[destination_id] = eng
        return eng

    def _options_for(
        self, destination_id: str, overrides: dict[str, Any]
    ) -> dict[str, Any]:
        base = dict(self.destinations[destination_id].options)
        base.update({k: v for k, v in overrides.items() if v is not None})
        return base

    # -- the three verbs ----------------------------------------------------
    def post_event(
        self,
        destination_id: str,
        table: str,
        body: bytes | str,
        mode: str | None = None,
    ) -> str:
        """Async single-event ingest (``router.go:122-191``): validate the
        JSON, produce to the (destination, mode, table) topic, return the
        topic id. The load happens at the next batch cycle."""
        if destination_id not in self.destinations:
            raise KeyError(f"destination not found: {destination_id}")
        text = body.decode("utf-8") if isinstance(body, bytes) else body
        json.loads(text)  # reject malformed before produce (fast 400)
        mode = mode or self.destinations[destination_id].options.get(
            "mode", "batch"
        )
        topic = make_topic_id(destination_id, mode, table)
        self._produce_safe(topic, text.strip().replace("\n", " "))
        self.metrics["events_produced"] += 1
        return topic

    def _produce_safe(self, topic: str, line: str) -> None:
        """Produce with failover: when the topic store write fails AND a
        failover logger is configured, the payload is preserved in the
        rotating local log (kafkabase/failover_logger.go:276-303) and
        the ingest request still succeeds — accepted-means-durable. With
        no logger the error propagates (fail fast, nothing silently
        dropped)."""
        try:
            self.producer.produce(topic, line)
        except Exception as ex:
            if self.failover_logger is None or not self.failover_logger.should_log(ex):
                raise
            self.failover_logger.log_payload(
                json.dumps({"topic": topic, "line": line})
            )
            with self._lock:
                self.metrics["failover_logged"] += 1

    def replay_failover(self) -> int:
        """Replay the failover backlog into the topic store — the
        recovery half of the failover loop (admin/failover_reprocessor.go
        replays rotated failover files through the normal pipeline).
        Rotates the live file first so everything logged so far is
        eligible; each replayed file is archived under ``replayed/``.
        Stops at the first re-failure (the store is still down) leaving
        the remaining backlog intact. Returns lines re-produced."""
        if self.failover_logger is None:
            return 0
        import gzip as _gzip

        with self._failover_lock:
            self.failover_logger.rotate()
            replayed = 0
            for path in self.failover_logger.pending_files():
                opener = _gzip.open if path.endswith(".gz") else open
                try:
                    with opener(path, "rt", encoding="utf-8") as fh:
                        lines = [ln for ln in fh if ln.strip()]
                except OSError:
                    continue
                try:
                    for ln in lines:
                        env = json.loads(ln)
                        self.producer.produce(env["topic"], env["line"])
                        replayed += 1
                except Exception:
                    # still down: keep this file (partially re-produced
                    # lines will dedup by pk on merge like any other
                    # replay)
                    break
                archive = os.path.join(
                    self.failover_logger.base_path, "replayed"
                )
                os.makedirs(archive, exist_ok=True)
                os.replace(
                    path, os.path.join(archive, os.path.basename(path))
                )
        if replayed:
            self.producer.flush_all()  # buffered producers: publish now
            with self._lock:
                self.metrics["failover_replayed"] += replayed
                # visible in the jobs list like any managed replay
                self._reproc_seq += 1
                job_id = f"reproc-{self._reproc_seq}"
                now = _iso_now()
                self._reproc_jobs[job_id] = {
                    "id": job_id,
                    "status": "COMPLETED",
                    "config": {"trigger": "auto-failover"},
                    "created_at": now,
                    "started_at": now,
                    "completed_at": now,
                    "total_files": 0,
                    "processed_files": 0,
                    "success_count": replayed,
                    "error_count": 0,
                    "last_error": None,
                    "topics": {},
                    "drained": None,
                }
            self._persist_reproc_jobs()
        return replayed

    # -- ingest front: pixel + classic shells -------------------------------
    # (ingest/router_pixel_handler.go, ingest/router_classic_handler.go —
    # the web-facing event shapes in front of the same topic pipeline)

    INGEST_DEAD_LETTER_TOPIC = "ingest.dead-letter"

    def _resolve_stream(
        self, write_key: str, host: str = "", *, s2s: bool = False
    ) -> dict[str, Any] | None:
        """ingest/router.go getStream + WriteKeyStreamLocator: a
        single-part write key matches plaintext; a two-part
        ``keyId:secret`` key resolves through the stream's hashed
        key bindings (salted sha512, never the stored secret); then
        Host-domain match. ``s2s`` endpoints only accept streams/keys
        marked server-to-server (a browser key on /s2s is rejected,
        router_classic_handler.go:130-135)."""
        host = (host or "").split(":")[0].lower()
        if write_key and ":" in write_key:
            return self._resolve_hashed_key(write_key, s2s=s2s)
        for stream in self.streams:
            if write_key and stream.get("write_key") == write_key:
                if s2s and not stream.get("s2s", False):
                    continue
                return stream
        if write_key or s2s:
            # domain resolution identifies BROWSER traffic by its Host
            # header — an s2s endpoint must present a server write key;
            # matching an unauthenticated /s2s request to a domain
            # stream would mark untrusted input as trusted (skipping
            # filter_event)
            return None
        for stream in self.streams:
            domains = [d.lower() for d in (stream.get("domains") or [])]
            if host and host in domains:
                return stream
        return None

    def _resolve_hashed_key(
        self, write_key: str, *, s2s: bool
    ) -> dict[str, Any] | None:
        """``keyId:secret`` resolution (ingest/router.go:628-655): find
        the binding by key id, require its key TYPE to match the
        endpoint (a browser binding cannot authenticate /s2s and vice
        versa), then verify the secret against the stored salted hash —
        ``sha512(secret + salt + globalSecret)`` for any configured
        global secret (checkHash, router.go:548-560). The plaintext
        secret is never stored in stream config.

        Binding ids are validated GLOBALLY UNIQUE at construction, so
        the first id match is the only possible one and the hard stop
        on a failed credential can never shadow a same-id binding
        elsewhere. On success the returned stream dict is a copy whose
        ``s2s`` flag reflects the BINDING's key type — the credential
        class, not a stream-level flag, decides downstream trust
        (a browser credential on a mixed-binding stream must still get
        the untrusted-input treatment in patch_event)."""
        key_id, secret = write_key.split(":", 1)
        want_type = "s2s" if s2s else "browser"
        for stream in self.streams:
            for binding in stream.get("key_bindings") or []:
                if binding.get("id") != key_id:
                    continue
                if binding.get("key_type", "browser") != want_type:
                    return None  # right key, wrong endpoint class
                stored = binding.get("hash") or ""
                if check_hash(stored, secret, self.global_hash_secrets):
                    return {**stream, "s2s": want_type == "s2s"}
                return None  # id matched, secret didn't — never fall
                # through to a weaker locator with a bad credential
        return None

    def _produce_ingest(
        self, stream: dict[str, Any], event: dict, table: str | None = None
    ) -> str:
        dst_id = stream["destination"]
        if dst_id not in self.destinations:
            raise KeyError(f"destination not found: {dst_id}")
        table = table or stream.get("table", "events")
        mode = self.destinations[dst_id].options.get("mode", "batch")
        topic = make_topic_id(dst_id, mode, table)
        self._produce_safe(topic, json.dumps(event, default=str))
        self.metrics["events_produced"] += 1
        return topic

    def _ingest_dead_letter(self, body: str, error: str) -> None:
        """Failed ingest events land in a global dead-letter topic with
        the error attached (router_pixel_handler.go:56,
        router_classic_handler.go:190), never silently dropped. The
        produce itself is best-effort through the failover path — a
        dead-letter write must never take down the response."""
        try:
            self._produce_safe(
                self.INGEST_DEAD_LETTER_TOPIC,
                json.dumps({"body": body, "error": error}, default=str),
            )
        except Exception:
            pass  # store down, no failover log: counted below, not raised
        self.metrics["ingest_errors"] += 1

    def ingest_pixel(
        self,
        tp: str,
        query: dict[str, list[str]],
        headers: dict[str, str] | None = None,
        client_ip: str = "",
        host: str = "",
    ) -> dict[str, Any]:
        """GET /api/px/:tp (router_pixel_handler.go:36-131). Always
        pixel-safe: errors — ANY error, the reference recovers even
        panics here (router_pixel_handler.go:69-73) — are recorded (dead
        letter + counter) and the caller still serves the GIF; a
        tracking pixel must never break the page embedding it."""
        from . import ingest_shapes as shapes

        headers = headers or {}
        self.metrics["ingest_received"] += 1
        result: dict[str, Any] = {
            "ok": False,
            "gif": shapes.EMPTY_GIF,
            "redirect": "",
            "set_cookie": None,
        }
        try:
            self._ingest_pixel(
                tp, query, headers, client_ip, host, result
            )
        except Exception as ex:  # noqa: BLE001 — pixel-safe by contract
            self._ingest_dead_letter(json.dumps(query), str(ex))
            result["error"] = str(ex)
        return result

    def _ingest_pixel(
        self,
        tp: str,
        query: dict[str, list[str]],
        headers: dict[str, str],
        client_ip: str,
        host: str,
        result: dict[str, Any],
    ) -> None:
        from . import ingest_shapes as shapes

        try:
            message = shapes.parse_pixel_event(query)
        except ValueError as ex:
            self._ingest_dead_letter(json.dumps(query), str(ex))
            result["error"] = str(ex)
            return
        message_id = shapes.sanitize_message_id(
            str(message.get("messageId") or "")
        )
        result["message_id"] = message_id
        if shapes.is_truish((query.get(shapes.PROCESS_HEADERS_FIELD) or [""])[0]):
            cookies = _parse_cookies(shapes.header_get(headers, "Cookie"))
            result["set_cookie"] = shapes.process_headers_data(
                message,
                cookies=cookies,
                host=host or shapes.header_get(headers, "Host"),
                referer=shapes.header_get(headers, "Referer"),
                tp=tp,
                cookie_domain=(
                    query.get(shapes.COOKIE_DOMAIN_FIELD) or [""]
                )[0],
            )
        write_key = shapes.write_key_from(query, headers)
        stream = self._resolve_stream(
            write_key, host or shapes.header_get(headers, "Host")
        )
        if stream is None:
            self._ingest_dead_letter(
                json.dumps(message, default=str), "stream not found"
            )
            result["error"] = "stream not found"
            return
        try:
            shapes.patch_event(
                message,
                tp=tp,
                message_id=message_id,
                ingest_type="browser",
                headers=headers,
                client_ip=client_ip,
            )
            topic = self._produce_ingest(
                stream, message, (query.get("tableName") or [None])[0]
            )
        except Exception as ex:  # produce/validation: still a 200 GIF
            self._ingest_dead_letter(json.dumps(message, default=str), str(ex))
            result["error"] = str(ex)
            return
        result.update(ok=True, topic=topic, destination=stream["destination"])
        # the 302 branch: validated destination_url wins over the GIF
        result["redirect"] = shapes.extract_redirect_url(
            (query.get(shapes.REDIRECT_URL_FIELD) or [""])[0],
            message,
            host or shapes.header_get(headers, "Host"),
        )

    def ingest_event(
        self,
        tp: str,
        body: bytes | str,
        query: dict[str, list[str]],
        headers: dict[str, str] | None = None,
        client_ip: str = "",
        s2s: bool = False,
    ) -> dict[str, Any]:
        """POST /api/s/:tp and /api/s/s2s/:tp — the segment-protocol
        single-event route (ingest/router_ingest_handler.go:21-148):
        one JSON object, patched through the modern event shape
        (patch_event) and produced to the stream's topic. Browser
        endpoints answer 200 on errors; s2s surfaces 400/401."""
        from . import ingest_shapes as shapes

        headers = headers or {}
        self.metrics["ingest_received"] += 1
        try:
            # decode INSIDE the guard: UnicodeDecodeError is a
            # ValueError, so invalid UTF-8 gets the graceful status too
            text = body.decode("utf-8") if isinstance(body, bytes) else body
            message = json.loads(text)
            if not isinstance(message, dict):
                raise ValueError("event must be a JSON object")
        except ValueError as ex:
            self.metrics["ingest_errors"] += 1
            return {
                "ok": False,
                "status": 400 if s2s else 200,
                "error": f"error parsing message: {ex}",
            }
        message_id = shapes.sanitize_message_id(
            str(message.get("messageId") or "")
        )
        write_key = shapes.write_key_from(query, headers)
        stream = self._resolve_stream(
            write_key, shapes.header_get(headers, "Host"), s2s=s2s
        )
        if stream is None:
            self.metrics["ingest_errors"] += 1
            return {
                "ok": False,
                "status": 401 if s2s else 200,
                "error": "stream not found",
            }
        try:
            shapes.patch_event(
                message,
                tp=tp,
                message_id=message_id,
                ingest_type="s2s" if (s2s or stream.get("s2s")) else "browser",
                headers=headers,
                client_ip=client_ip,
            )
            topic = self._produce_ingest(stream, message)
        except Exception as ex:
            self._ingest_dead_letter(json.dumps(message, default=str), str(ex))
            return {
                "ok": False,
                "status": 400 if s2s else 200,
                "error": str(ex),
            }
        return {
            "ok": True,
            "status": 200,
            "message_id": message_id,
            "topic": topic,
        }

    def ingest_batch(
        self,
        body: bytes | str,
        query: dict[str, list[str]],
        headers: dict[str, str] | None = None,
        client_ip: str = "",
        s2s: bool = False,
    ) -> dict[str, Any]:
        """POST /v1/batch (+aliases, /api/s/s2s/batch) — the segment
        batch payload {batch, eventsName, context, writeKey}
        (ingest/router_batch_handler.go:109-247): optional gzip body,
        optional in-batch time-gap dedup (stream's
        ``deduplicate_window_ms``), shared analytic context merged UNDER
        each event's own context, per-event produce with per-event error
        isolation."""
        import gzip as _gzip

        from . import ingest_shapes as shapes

        headers = headers or {}
        raw = body if isinstance(body, bytes) else body.encode("utf-8")
        if "gzip" in shapes.header_get(headers, "Content-Encoding"):
            import zlib as _zlib

            try:
                raw = _gzip.decompress(raw)
            # gzip raises THREE classes: BadGzipFile(OSError) for a bad
            # magic, EOFError for truncation, zlib.error for corrupt
            # deflate data after a valid header
            except (OSError, EOFError, _zlib.error) as ex:
                self.metrics["ingest_errors"] += 1
                return {
                    "ok": False,
                    "status": 400,
                    "error": f"error parsing message: bad gzip body: {ex}",
                }
        try:
            payload = json.loads(raw)
            if not isinstance(payload, dict):
                raise ValueError("payload must be a JSON object")
        except ValueError as ex:
            self.metrics["ingest_errors"] += 1
            return {
                "ok": False,
                "status": 400,
                "error": f"error parsing message: {ex}",
            }
        batch = payload.get("batch") or []
        if not isinstance(batch, list):
            self.metrics["ingest_errors"] += 1
            return {
                "ok": False,
                "status": 400,
                "error": "error parsing message: 'batch' must be an array",
            }
        received = len(batch)
        self.metrics["ingest_received"] += max(received, 1)
        write_key = shapes.write_key_from(query, headers) or str(
            payload.get("writeKey") or ""
        )
        stream = self._resolve_stream(
            write_key, shapes.header_get(headers, "Host"), s2s=s2s
        )
        if stream is None:
            self.metrics["ingest_errors"] += 1
            return {"ok": False, "status": 401, "error": "stream not found"}

        gap_ms = int(stream.get("deduplicate_window_ms") or 0)
        deduplicated = 0
        if gap_ms > 0:
            before = len(batch)
            batch = shapes.deduplicate_batch(batch, gap_ms)
            deduplicated = before - len(batch)

        analytic_context = payload.get("context")
        events_name = str(payload.get("eventsName") or "")
        ingest_type = "s2s" if (s2s or stream.get("s2s")) else "browser"
        ok_events = 0
        errors: list[str] = []
        for event in batch:
            if not isinstance(event, dict):
                self._ingest_dead_letter(
                    json.dumps(event, default=str),
                    "event must be a JSON object",
                )
                errors.append("event must be a JSON object")
                continue
            message_id = shapes.sanitize_message_id(
                str(event.get("messageId") or "")
            )
            try:
                shapes.patch_event(
                    event,
                    tp="event",
                    message_id=message_id,
                    ingest_type=ingest_type,
                    headers=headers,
                    client_ip=client_ip,
                    analytic_context=analytic_context
                    if isinstance(analytic_context, dict)
                    else None,
                    default_event_name=events_name,
                )
                self._produce_ingest(stream, event)
                ok_events += 1
            except Exception as ex:  # per-event isolation
                self._ingest_dead_letter(
                    json.dumps(event, default=str), str(ex)
                )
                errors.append(f"Message ID: {message_id}: {ex}")
        response: dict[str, Any] = {
            "ok": len(batch) == ok_events,
            "status": 200,
            "receivedEvents": received,
            "okEvents": ok_events,
        }
        if deduplicated > 0:
            response["deduplicatedEvents"] = deduplicated
            response["processedEvents"] = len(batch)
        if errors:
            response["ok"] = False
            response["errors"] = errors
        return response

    def ingest_classic(
        self,
        body: bytes | str,
        query: dict[str, list[str]],
        headers: dict[str, str] | None = None,
        client_ip: str = "",
        s2s: bool = False,
    ) -> dict[str, Any]:
        """POST /api/v1/event[s] and /api/v1/s2s/event[s]
        (router_classic_handler.go:79-205): legacy flat events, single
        object or array, token-addressed. Browser endpoints stay 200 on
        most errors (don't break pages); s2s surfaces real statuses."""
        from . import ingest_shapes as shapes

        headers = headers or {}
        self.metrics["ingest_received"] += 1
        try:
            text = body.decode("utf-8") if isinstance(body, bytes) else body
        except UnicodeDecodeError as ex:
            self.metrics["ingest_errors"] += 1
            return {
                "ok": False,
                "status": 400 if s2s else 200,
                "error": f"error parsing message: {ex}",
            }
        token = shapes.classic_token_from(query, headers)
        stream = self._resolve_stream(
            token, shapes.header_get(headers, "Host"), s2s=s2s
        )
        if stream is None:
            self.metrics["ingest_errors"] += 1
            return {
                "ok": False,
                "status": 401 if s2s else 200,
                "error": "stream not found",
            }
        try:
            parsed = json.loads(text)
        except ValueError as ex:
            self.metrics["ingest_errors"] += 1
            return {
                "ok": False,
                "status": 400 if s2s else 200,
                "error": f"error parsing message: {ex}",
            }
        messages = parsed if isinstance(parsed, list) else [parsed]
        ip_policy = (query.get(shapes.IP_POLICY_PARAMETER) or [""])[0]
        ingest_type = "s2s" if (s2s or stream.get("s2s")) else "browser"
        results = []
        for message in messages:
            if not isinstance(message, dict):
                self._ingest_dead_letter(
                    json.dumps(message, default=str),
                    "event must be a JSON object",
                )
                continue
            message_id = shapes.sanitize_message_id(
                str(message.get("eventn_ctx_event_id") or "")
            )
            shapes.patch_classic_event(
                message,
                message_id=message_id,
                api_key=token,
                ingest_type=ingest_type,
                headers=headers,
                client_ip=client_ip,
                ip_policy=ip_policy,
            )
            try:
                topic = self._produce_ingest(stream, message)
                results.append({"message_id": message_id, "topic": topic})
            except KeyError as ex:
                self._ingest_dead_letter(
                    json.dumps(message, default=str), str(ex)
                )
        return {"ok": True, "status": 200, "events": results}

    def bulk(
        self,
        destination_id: str,
        table: str,
        body: bytes | str,
        mode: str | None = None,
        primary_key: list[str] | None = None,
        **overrides: Any,
    ) -> StreamResult:
        """Synchronous NDJSON load (``router.go:220-321``): the request
        body goes through the full flatten/infer/dedup/merge pipeline
        in-request; default mode replace_table like the reference."""
        eng = self.engine_for(destination_id)
        text = body.decode("utf-8") if isinstance(body, bytes) else body
        opts = self._options_for(
            destination_id,
            {"mode": mode, "primary_key": primary_key, **overrides},
        )
        opts.setdefault("mode", "replace_table")
        if opts.get("primary_key") and "deduplicate" not in opts:
            opts["deduplicate"] = True  # pk via ?pk= implies dedup (router.go:251)
        stream = eng.create_stream(table, **opts)
        lines = [ln for ln in text.splitlines() if ln.strip()]
        json_df = self.spark.createDataFrame(
            [(ln,) for ln in lines], "value string"
        )
        stream.consume_dataframe_json(json_df)
        res = stream.complete()
        self.metrics["bulk_requests"] += 1
        self.metrics["bulk_rows"] += res.successful_rows
        return res

    def failed(
        self, destination_id: str, table: str, limit: int = 100
    ) -> list[dict[str, Any]]:
        """Dead-letter peek (``router.go:370-432``), newest first."""
        eng = self.engine_for(destination_id)
        opts = self._options_for(destination_id, {})
        opts.pop("mode", None)
        stream = IngestStream(eng, table, StreamOptions(**opts))
        rows = stream.failed_events(limit).collect()
        return [
            {
                "value": r["value"],
                "error": r["error"],
                "failed_at": r["failed_at"].isoformat()
                if r["failed_at"]
                else None,
            }
            for r in rows
        ]

    @staticmethod
    def _apply_ingest_filters(source, filters: dict[str, Any]):
        """Compile the events/hosts allowlists onto raw JSON lines: the
        subject columns are extracted JVM-side (``get_json_object``) and
        the whole predicate is one codegen'd Column — no Python in the
        event path (``ingest/filters.go:39-50``)."""
        from pyspark.sql import functions as F

        from ..ingest_filters import apply_filters

        parsed = (
            source.withColumn(
                "type", F.get_json_object("value", "$.type")
            )
            .withColumn("event", F.get_json_object("value", "$.event"))
            .withColumn(
                "context_page_host",
                F.get_json_object("value", "$.context.page.host"),
            )
        )
        return apply_filters(parsed, filters).select("value")

    def log_range(
        self,
        destination_id: str,
        table: str,
        *,
        ts_col: str | None = None,
        id_col: str | None = None,
        start: str | None = None,
        end: str | None = None,
        before_id: Any = None,
        limit: int = 100,
    ) -> list[dict[str, Any]]:
        """Events-log range read (``router.go:484-571``): newest-first
        rows of a warehouse table bounded by a timestamp range, a
        ``beforeId`` cursor, and a limit — all filters ride the parquet
        scan (footer min/max pruning at scale), and the ts/beforeId
        bounds additionally prune the file MANIFEST from committed
        footer stats, so out-of-range files are never even listed."""
        from pyspark.sql import functions as F

        eng = self.engine_for(destination_id)
        prune: dict[str, tuple] = {}
        if ts_col and (start is not None or end is not None):
            # normalize the raw query-string bounds to aware-UTC before
            # they reach the manifest prune: the committed stats are
            # aware-UTC ISO strings, and a raw '2024-01-02 23:59:59'
            # (space separator, no offset) would compare lexicographically
            # wrong against them ('T' > ' '), silently pruning in-range
            # files. Naive inputs resolve in the SESSION timezone — the
            # same instant the real filter's cast uses below. If either
            # bound fails to normalize, skip the ts prune entirely (the
            # filter still applies; pruning is advisory).
            lo = _utc_or_none(start, eng.spark) if start is not None else None
            hi = _utc_or_none(end, eng.spark) if end is not None else None
            if (start is None or lo is not None) and (
                end is None or hi is not None
            ):
                prune[ts_col] = (lo, hi)
        if id_col and before_id is not None:
            prune[id_col] = (None, before_id)
        meta = eng.warehouse.get_meta(table)
        if not prune or meta is None or meta.write_mode == "mor":
            prune = None
        df = eng.warehouse.read(table, prune=prune)
        order = []
        if ts_col:
            if start is not None:
                df = df.filter(F.col(ts_col) >= F.lit(start).cast("timestamp"))
            if end is not None:
                df = df.filter(F.col(ts_col) <= F.lit(end).cast("timestamp"))
            order.append(F.col(ts_col).desc())
        if id_col:
            if before_id is not None:
                df = df.filter(F.col(id_col) < F.lit(before_id))
            order.append(F.col(id_col).desc())
        if order:
            df = df.orderBy(*order)
        rows = df.limit(max(1, min(int(limit), 10000))).collect()
        return [r.asDict(recursive=True) for r in rows]

    def changes(
        self,
        destination_id: str,
        table: str,
        since_commit: int,
        to_commit: int | None = None,
        limit: int = 1000,
    ) -> dict[str, Any]:
        """Change-data-feed read over a destination's warehouse table
        (``Warehouse.read_changes``): the CDC egress endpoint — a consumer
        checkpoints ``head`` and polls with ``since=<checkpoint>``. Rows
        carry ``__change_type``/``__change_commit``; ``limit`` bounds the
        HTTP response (it does NOT page — a consumer needing more should
        narrow with ``to`` or consume via Spark directly)."""
        eng = self.engine_for(destination_id)
        head = eng.warehouse.history(table)[0]["commit"]
        # pin the read to the head we RETURN: a commit landing between
        # the history() read and the changes read would otherwise ship
        # rows beyond the returned checkpoint, and a consumer polling
        # since=head would re-receive them (duplicate delivery on an
        # endpoint documented as checkpointable)
        df = eng.read_changes(
            table, since_commit, to_commit=to_commit if to_commit is not None else head
        )
        rows = df.limit(max(1, min(int(limit), 10000))).collect()
        return {
            "changes": [r.asDict(recursive=True) for r in rows],
            "head": head,
        }

    def _assert_read_only(self, sql_text: str) -> None:
        """Reject anything but a pure query. A keyword regex is not
        enough: Spark's grammar admits CTE-prefixed DML (``WITH x AS
        (...) INSERT OVERWRITE DIRECTORY ...`` parses with root
        UnresolvedWith), and ``spark.sql`` executes commands EAGERLY — so
        the gate walks the PARSED tree and denies any command/DML node
        anywhere in it. Executed before the query ever reaches
        ``spark.sql``."""
        import re as _re

        if not _re.match(
            r"\s*(select|with|values|table)\b", sql_text, _re.I
        ) or ";" in sql_text:
            raise ValueError(
                "only single query statements (SELECT/WITH/VALUES/TABLE) "
                "are accepted here"
            )
        plan = (
            self.spark._jsparkSession.sessionState()
            .sqlParser()
            .parsePlan(sql_text)
        )
        deny_exact = {
            "CreateTable", "ReplaceTable", "DropTable", "DropView",
            "UpdateTable", "DeleteFromTable", "MergeIntoTable",
            "InsertIntoDir", "RefreshTable", "SetCatalogAndNamespace",
        }
        stack = [plan]
        while stack:
            node = stack.pop()
            name = node.getClass().getSimpleName()
            if (
                name.endswith("Command")
                or name.endswith("Statement")
                or name in deny_exact
            ):
                raise ValueError(
                    f"statement node {name} is not allowed on the "
                    "read-only query endpoint"
                )
            kids = node.children()
            for i in range(kids.size()):
                stack.append(kids.apply(i))

    def query(
        self, destination_id: str, sql_text: str, limit: int = 1000
    ) -> dict[str, Any]:
        """Read-only Spark SQL over a destination's warehouse tables
        (``Engine.sql`` — auto-pruned manifests, every table a temp view).
        Only query statements are accepted (``_assert_read_only``):
        Spark SQL's DDL/DML surface (``CREATE TABLE ... LOCATION``,
        ``INSERT OVERWRITE DIRECTORY``) would otherwise be an
        arbitrary-filesystem-write primitive on an HTTP endpoint, the
        same class of hole the ``/test`` probe closed with
        allowed-roots."""
        self._assert_read_only(sql_text)
        eng = self.engine_for(destination_id)
        df = eng.sql(sql_text)
        rows = df.limit(max(1, min(int(limit), 10000))).collect()
        return {
            "columns": df.columns,
            "rows": [r.asDict(recursive=True) for r in rows],
        }

    # -- the batch-consumer cron (cron.go:25-56) ----------------------------
    def topics_for(self, destination_id: str) -> list[str]:
        out = []
        for name in sorted(os.listdir(self.topics_root)):
            if not os.path.isdir(os.path.join(self.topics_root, name)):
                continue
            try:
                dest, _mode, _table = parse_topic_id(name)
            except ValueError:
                continue
            if dest == destination_id:
                out.append(name)
        return out

    def run_batch_cycle(self, destination_id: str) -> dict[str, Any]:
        """Drain every topic of one destination into its warehouse:
        checkpointed ``availableNow`` micro-batch per topic — offsets
        advance only after the warehouse commit, the reference's
        offset-after-commit discipline (``batch_consumer.go:200-262``)."""
        if destination_id not in self.destinations:
            raise KeyError(f"destination not found: {destination_id}")
        # serialize cycles per destination: two drains of one topic would
        # race on its checkpoint (Spark rejects concurrent queries on one
        # checkpoint; the reference serializes via the consumer group)
        with self._lock:
            gate = self._cycle_locks.setdefault(
                destination_id, threading.Lock()
            )
        with gate:
            try:
                out = self._run_batch_cycle_locked(destination_id)
            except Exception as ex:
                # consecutive-failure tracking: enough of these in a row
                # flips the destination DOWN (failover.DestinationHealth —
                # the in-process stand-in for the reference's k8s-level
                # failover detection)
                self.health.record_failure(
                    destination_id, f"{type(ex).__name__}: {ex}"
                )
                raise
            if self.health.record_success(destination_id):
                out["recovered"] = True
            return out

    def _run_batch_cycle_locked(self, destination_id: str) -> dict[str, Any]:
        self.producer.flush_all()
        # the failover backlog re-enters FIRST: reaching this point means
        # the topic store accepted the flush, so anything preserved during
        # an outage replays ahead of this drain and lands this cycle
        failover_replayed = self.replay_failover()
        eng = self.engine_for(destination_id)
        dest = self.destinations[destination_id]
        drained: dict[str, int] = {}
        retried_batches = 0
        retry_tables: dict[str, int] = {}
        for topic in self.topics_for(destination_id):
            _dest, mode, table = parse_topic_id(topic)
            opts = self._options_for(destination_id, {"mode": mode})
            so = StreamOptions(**opts)
            stream = IngestStream(
                eng, table, so, on_result=self._record_load
            )
            q = stream.start(
                self._topic_source(topic, dest, so),
                os.path.join(self.topics_root, "_checkpoints", topic),
                available_now=True,
            )
            q.awaitTermination()
            drained[topic] = 1
            self.metrics["cycle_topics_drained"] += 1
            # a failed load never fails the drain — the batch moved to
            # the table's retry queue with backoff metadata (the
            # reference's retry-topic path, retry_consumer.go:86-233);
            # surface that here so callers (reprocessing job detail,
            # /cycle responses) see it instead of a silent success
            if stream.totals["retried_batches"]:
                retried_batches += stream.totals["retried_batches"]
                retry_tables[table] = (
                    retry_tables.get(table, 0)
                    + stream.totals["retried_batches"]
                )
        self.metrics["cycles"] += 1
        refreshed = self._refresh_rollups(eng, dest)
        replicated = self._drain_replicas(eng, dest)
        out: dict[str, Any] = {
            "destination": destination_id,
            "topics": list(drained),
        }
        if failover_replayed:
            out["failover_replayed"] = failover_replayed
        if retried_batches:
            out["retried_batches"] = retried_batches
            out["retry_tables"] = retry_tables
        if refreshed:
            out["rollups"] = refreshed
        if replicated:
            out["replicas"] = replicated
        return out

    def _drain_replicas(self, eng: Engine, dest: Destination) -> list[dict]:
        """Post-cycle cross-destination sync: each configured replica
        drains the source table's change-feed backlog into its target
        destination (streaming/replicate.py — snapshot bootstrap on first
        drain, exactly-once via the app-owned checkpoint thereafter)."""
        if not dest.replicas:
            return []
        from ..streaming.replicate import TableReplica

        out = []
        for spec in dest.replicas:
            try:
                source = spec["source"]
                to = spec["to"]
                target = spec.get("target", source)
                ckpt = os.path.join(
                    self.topics_root,
                    "_replica_ckpt",
                    f"{dest.destination_id}.{source}.{to}.{target}",
                )
                q = TableReplica(
                    eng, source, self.engine_for(to), dst_table=target
                ).start(ckpt, available_now=True)
                q.awaitTermination()
                out.append({"source": source, "to": to, "target": target})
            except Exception as ex:  # a broken replica must not fail the cycle
                out.append(
                    {
                        "source": spec.get("source"),
                        "to": spec.get("to"),
                        "error": f"{type(ex).__name__}: {ex}",
                    }
                )
        return out

    def _refresh_rollups(self, eng: Engine, dest: Destination) -> list[dict]:
        """Post-cycle materialized-view maintenance: each configured
        rollup folds ONLY the commits this cycle appended (delta
        aggregation via the commit log; full rebuild if a rewrite is
        detected — see operators/incremental.py)."""
        if not dest.rollups:
            return []
        from ..operators.incremental import IncrementalRollup, RollupSpec

        out = []
        for spec in dest.rollups:
            try:
                r = IncrementalRollup(
                    eng.warehouse,
                    RollupSpec(
                        source=spec["source"],
                        target=spec["target"],
                        group_by=list(spec.get("group_by", [])),
                        counts=list(spec.get("counts", [])),
                        sums=dict(spec.get("sums", {})),
                    ),
                )
                out.append({"target": spec["target"], **r.refresh()})
            except Exception as ex:  # a broken rollup must not fail the cycle
                out.append(
                    {
                        "target": spec.get("target"),
                        "error": f"{type(ex).__name__}: {ex}",
                    }
                )
        return out

    def _topic_source(self, topic: str, dest: Destination, so: StreamOptions):
        """bulker_topic readStream for one topic: batchSize becomes the
        trigger rate limit (the reference's ≤10000-msg batches,
        ``app_config.go:57``), and ingest filters ride the scan.

        Replace modes are NEVER rate-limited: splitting a replace_table
        drain into N micro-batches would run N replacements and keep
        only the last chunk (the reference's batch consumer likewise
        feeds the whole run to one stream before Complete,
        ``batch_consumer.go:56-199``)."""
        reader = self.spark.readStream.format("bulker_topic")
        if so.batch_size and so.mode not in (
            "replace_table",
            "replace_partition",
        ):
            reader = reader.option("maxLinesPerTrigger", int(so.batch_size))
        source = reader.load(
            os.path.join(self.topics_root, topic)
        ).select("value")
        if dest.filters:
            source = self._apply_ingest_filters(source, dest.filters)
        return source

    def start_streaming(
        self, destination_id: str, processing_time: str | None = None
    ) -> dict[str, Any]:
        """Continuous consumers (``stream_consumer.go:190-315``): one
        long-running micro-batch query per existing topic, triggered
        every ``frequency`` seconds (or ``processing_time``). Returns
        {topic: StreamingQuery}; call ``.stop()`` on each (or use
        ``stop_streaming``). Shares checkpoints with ``run_batch_cycle``
        so the two modes can be mixed without re-delivery."""
        if destination_id not in self.destinations:
            raise KeyError(f"destination not found: {destination_id}")
        self.producer.flush_all()
        eng = self.engine_for(destination_id)
        dest = self.destinations[destination_id]
        queries: dict[str, Any] = {}
        for topic in self.topics_for(destination_id):
            _dest, mode, table = parse_topic_id(topic)
            opts = self._options_for(destination_id, {"mode": mode})
            so = StreamOptions(**opts)
            stream = IngestStream(
                eng, table, so, on_result=self._record_load
            )
            queries[topic] = stream.start(
                self._topic_source(topic, dest, so),
                os.path.join(self.topics_root, "_checkpoints", topic),
                available_now=False,
                processing_time=processing_time,
            )
        self._streams = getattr(self, "_streams", {})
        self._streams.update(queries)
        return queries

    def stop_streaming(self) -> None:
        for q in getattr(self, "_streams", {}).values():
            try:
                q.stop()
            except Exception:
                pass
        self._streams = {}

    def check_warehouse_path(self, path: str) -> None:
        """Reject runtime-supplied warehouse paths outside the configured
        allowed roots — without this, unauthenticated ``/test`` and
        ``/config`` bodies are an arbitrary-directory-creation primitive
        on the host. No roots configured = unrestricted (dev mode)."""
        if not self.allowed_warehouse_roots:
            return
        rp = os.path.realpath(path)
        for root in self.allowed_warehouse_roots:
            if rp == root or rp.startswith(root + os.sep):
                return
        raise ForbiddenPathError(
            f"warehouse_path {path!r} is outside the allowed roots"
        )

    # -- config hot-reload (topic_manager.go:424-490) -----------------------
    def put_destination(self, spec: dict[str, Any]) -> Destination:
        """Add or replace a destination at runtime (the config-watcher
        path). A changed config drops the cached Engine so the next
        request rebuilds against the new warehouse/namespace; topics and
        checkpoints are keyed by destination id and survive the swap."""
        self.check_warehouse_path(spec["warehouse_path"])
        dest = Destination(
            destination_id=spec["destination_id"],
            warehouse_path=spec["warehouse_path"],
            namespace=spec.get("namespace", "default"),
            options=spec.get("options", {}) or {},
            filters=spec.get("filters"),
            rollups=spec.get("rollups"),
            replicas=spec.get("replicas"),
            retain_versions=int(spec.get("retain_versions", 1)),
        )
        _validate_destination(dest)
        with self._lock:
            self.destinations[dest.destination_id] = dest
            self._engines.pop(dest.destination_id, None)
        return dest

    def delete_destination(self, destination_id: str) -> bool:
        with self._lock:
            existed = self.destinations.pop(destination_id, None) is not None
            self._engines.pop(destination_id, None)
        return existed

    def test_connection(self, spec: dict[str, Any]) -> dict[str, Any]:
        """Validate a destination spec WITHOUT registering it — the
        reference's ``POST /test`` (``router.go:159-191``,
        ``TestConnectionHandler``): parse the config, construct the
        bulker, fail with 422-style errors on bad configs. Here:
        options must construct a valid ``StreamOptions`` and the
        warehouse path must be creatable and writable (the Spark
        analogue of "can I open a connection")."""
        if not spec.get("warehouse_path"):
            raise ValueError("warehouse_path is required")
        StreamOptions(
            **{
                k: v
                for k, v in (spec.get("options") or {}).items()
            }
        )  # unknown option names / bad values raise here
        path = spec["warehouse_path"]
        self.check_warehouse_path(path)
        os.makedirs(path, exist_ok=True)
        probe = os.path.join(path, f".bulker_test.{uuid.uuid4().hex}")
        with open(probe, "w") as fh:
            fh.write("ok")
        os.unlink(probe)
        return {
            "id": spec.get("destination_id", spec.get("id", "")),
            "warehouse_path": path,
        }

    def post_profile(
        self, profile_builder_id: str, priority: str, profile_id: str
    ) -> str:
        """Profile-recompute trigger (``router.go:193-218``,
        ``ProfilesHandler``): enqueue the profile id to the
        per-(builder, priority) topic; a downstream consumer recomputes
        that profile. The message is the keyed id, no payload."""
        if not profile_id:
            raise ValueError("profileId is required")
        topic = make_topic_id(profile_builder_id, "profiles", priority)
        self.producer.produce(topic, json.dumps({"profileId": profile_id}))
        self.metrics["events_produced"] += 1
        return topic

    def connections_metrics(
        self, workspace_id: str
    ) -> dict[str, dict[str, Any]]:
        """Per-workspace queue/lag rollup (``router.go:344-369``,
        ``ConnectionsMetricsHandler``). The reference proxies a
        Prometheus query for ``destinationId=~"<ws>-.*"``; here the same
        shape is computed locally: every destination whose id is
        ``<workspaceId>-*`` reports its per-topic produced/committed/lag
        gauges (the ``bulkerapp_consumer_queue_size`` analogue)."""
        out: dict[str, dict[str, Any]] = {}
        for dst in list(self.destinations):
            if dst == workspace_id or dst.startswith(f"{workspace_id}-"):
                out[dst] = {"queues": self.topic_lag(dst)}
        return out

    def topic_lag(self, destination_id: str) -> dict[str, dict[str, int]]:
        """Consumer-lag metric: per-topic produced vs committed line
        counts — the reference's queue-size gauge (high-watermark minus
        consumed offset, ``abstract_batch_consumer.go:286-307,329-342``).

        Produced = line counts of visible segments; committed = the
        newest offsets entry in the cycle checkpoint (written only AFTER
        the warehouse commit, so lag never under-reports)."""
        from ..sources.topic_source import _count_lines, _segments

        if destination_id not in self.destinations:
            raise KeyError(f"destination not found: {destination_id}")
        self.producer.flush_all()
        out: dict[str, dict[str, int]] = {}
        for topic in self.topics_for(destination_id):
            tdir = os.path.join(self.topics_root, topic)
            produced = sum(
                _count_lines(os.path.join(tdir, s)) for s in _segments(tdir)
            )
            committed = 0
            odir = os.path.join(
                self.topics_root, "_checkpoints", topic, "offsets"
            )
            if os.path.isdir(odir):
                batches = [
                    f
                    for f in os.listdir(odir)
                    if f.isdigit() and os.path.isfile(os.path.join(odir, f))
                ]
                if batches:
                    latest = max(batches, key=int)
                    with open(os.path.join(odir, latest)) as fh:
                        last = fh.read().strip().splitlines()[-1]
                    committed = sum(json.loads(last).values())
            out[topic] = {
                "produced": produced,
                "committed": committed,
                "lag": produced - committed,
            }
        return out

    # -- failover reprocessing jobs -----------------------------------------
    # The reference runs backup replay as managed jobs behind
    # /api/admin/reprocessing/jobs (admin/router_reprocessing_handler.go:
    # 139-179, admin/router.go:36-43); the k8s worker-pod orchestration is
    # out of scope (SURVEY §0) — here a job is a thread driving the
    # distributed replay (sources/reprocess.py:replay_backups_to_topics)
    # and then the normal batch cycle, so replayed events flow through the
    # full ingest path: topics → dedup/merge → warehouse, retries and
    # dead-letter included.
    def start_reprocessing(
        self, spec: dict[str, Any], wait: bool = False
    ) -> dict[str, Any]:
        """Start a reprocessing job. ``spec``: ``destination_id`` +
        ``path`` (backup glob) required; optional ``date_from``/
        ``date_to`` (ISO dates, prune whole files by their path date
        before any read), ``mode``, ``dry_run`` (list files and count
        lines, produce nothing — ReprocessingStartRequest.DryRun), and
        ``drain: false`` to stop after producing to topics."""
        import datetime as _dt

        from ..sources.reprocess import (
            date_from_path,
            read_backup_lines,
            table_from_path,
        )

        dst = spec.get("destination_id") or spec.get("destinationId")
        path = spec.get("path") or spec.get("local_path")
        if not dst or not path:
            raise ValueError("destination_id and path are required")
        if dst not in self.destinations:
            raise KeyError(f"destination not found: {dst}")
        # same arbitrary-path gate as /test: a reprocess path is a read
        # primitive over the host filesystem
        self.check_warehouse_path(path)

        def parse_date(key: str) -> _dt.date | None:
            v = spec.get(key)
            return _dt.date.fromisoformat(v) if v else None

        date_from, date_to = parse_date("date_from"), parse_date("date_to")
        mode = spec.get("mode", "batch")
        with self._lock:
            self._reproc_seq += 1
            job_id = f"reproc-{self._reproc_seq}"
            job: dict[str, Any] = {
                "id": job_id,
                "status": "PENDING",
                "config": {
                    "destination_id": dst,
                    "path": path,
                    "date_from": spec.get("date_from"),
                    "date_to": spec.get("date_to"),
                    "mode": mode,
                    "dry_run": bool(spec.get("dry_run")),
                },
                "created_at": _dt.datetime.now(_dt.timezone.utc).isoformat(),
                "started_at": None,
                "completed_at": None,
                "total_files": 0,
                "processed_files": 0,
                "success_count": 0,
                "error_count": 0,
                "last_error": None,
                "topics": {},
                "drained": None,
            }
            self._reproc_jobs[job_id] = job
        self._persist_reproc_jobs()

        def jset(**kv) -> None:
            # every mutation goes through the app lock: HTTP handlers
            # snapshot the same dict under this lock, so they never see
            # torn state or a dict resized mid-serialization
            with self._lock:
                job.update(kv)

        def run() -> None:
            from pyspark.sql import functions as F

            from ..sources.reprocess import replay_backups_to_topics

            jset(
                status="RUNNING",
                started_at=_dt.datetime.now(_dt.timezone.utc).isoformat(),
            )
            try:
                if job["config"]["dry_run"]:
                    # metadata-only listing → date prune → distributed
                    # count over ONLY the kept files; excluded files are
                    # never opened
                    from ..sources.reprocess import list_backup_files

                    kept_files = [
                        f for f in list_backup_files(self.spark, path)
                        if _date_in_range(
                            date_from_path(f), date_from, date_to
                        )
                    ]
                    kept = {}
                    if kept_files:
                        kept = {
                            r["_file"]: r["n"]
                            for r in read_backup_lines(
                                self.spark, kept_files
                            )
                            .groupBy("_file")
                            .agg(F.count("*").alias("n"))
                            .collect()
                        }
                    tables: dict[str, int] = {}
                    for f, n in kept.items():
                        t = table_from_path(f)
                        tables[t] = tables.get(t, 0) + n
                    jset(
                        total_files=len(kept),
                        processed_files=len(kept),
                        success_count=sum(kept.values()),
                        topics={t: None for t in tables},
                        dry_run_lines=tables,
                    )
                else:
                    replayed: list[str] = []

                    def on_table(table, files, topic):
                        replayed.extend(files)
                        with self._lock:
                            job["processed_files"] += len(files)
                            job["topics"][table] = topic

                    topics = replay_backups_to_topics(
                        self.spark,
                        path,
                        self.topics_root,
                        dst,
                        mode=mode,
                        date_from=date_from,
                        date_to=date_to,
                        on_table=on_table,
                        should_continue=lambda: job_id
                        not in self._reproc_cancel,
                    )
                    # success_count = lines THIS job replayed (the
                    # reference's SuccessCount = processed-line counter);
                    # a global loaded-rows metric delta would attribute
                    # unrelated concurrent loads and pre-pending topics
                    # of the same destination to this job. Counted over
                    # the REPLAYED FILE LIST — never a rescan of the
                    # whole glob (date-excluded files stay unopened).
                    n_lines = 0
                    if replayed:
                        n_lines = read_backup_lines(
                            self.spark, replayed
                        ).count()
                    if spec.get("drain", True) and job_id not in self._reproc_cancel:
                        cycle = self.run_batch_cycle(dst)
                        kv: dict[str, Any] = {"drained": cycle}
                        if cycle.get("retried_batches"):
                            # a failing destination does NOT fail the
                            # job opaquely: the replayed events sit in
                            # the retry queues with backoff metadata
                            # (the reference's reprocessing worker
                            # inherits the Kafka retry machinery the
                            # same way, reprocessing-worker/main.go:
                            # 336-430) — the job detail says so
                            kv["retried_batches"] = cycle["retried_batches"]
                            kv["retry_tables"] = cycle["retry_tables"]
                        jset(**kv)
                    jset(
                        topics=topics,
                        success_count=n_lines,
                        total_files=job["processed_files"],
                    )
                jset(
                    status=(
                        "CANCELLED"
                        if job_id in self._reproc_cancel
                        else "COMPLETED"
                    )
                )
            except Exception as ex:  # job errors land in the record
                jset(
                    status="FAILED",
                    error_count=job["error_count"] + 1,
                    last_error=f"{type(ex).__name__}: {ex}",
                )
            finally:
                with self._lock:
                    # terminal status is already set above, so a cancel
                    # holding the lock after this point sees it and
                    # declines to re-add — discard under the same lock
                    # closes the window entirely
                    job["completed_at"] = _dt.datetime.now(
                        _dt.timezone.utc
                    ).isoformat()
                    self._reproc_cancel.discard(job_id)
                self._persist_reproc_jobs()

        if wait:
            run()
        else:
            threading.Thread(
                target=run, name=job_id, daemon=True
            ).start()
        return self._job_snapshot(job)

    def _job_snapshot(self, job: dict[str, Any]) -> dict[str, Any]:
        """Deep copy under the same lock the worker mutates with — the
        caller (JSON serialization, tests) never holds a live reference
        to a dict another thread is resizing."""
        import copy

        with self._lock:
            return copy.deepcopy(job)

    def _load_reproc_jobs(self) -> None:
        """Reload persisted jobs at startup. A job that was PENDING or
        RUNNING when the previous process died cannot resume (its worker
        thread is gone) — it is surfaced as FAILED with an explicit
        interruption error, the same visibility a k8s-status enrichment
        gives the reference (failover_reprocessor.go:291-371: a vanished
        job pod reads as failed, never as silently still-running)."""
        import datetime as _dt

        if not os.path.exists(self._reproc_store):
            return
        try:
            with open(self._reproc_store, encoding="utf-8") as fh:
                jobs = json.load(fh)
        except (ValueError, OSError):
            return  # corrupt store: start fresh, never crash startup
        for job in jobs:
            if job.get("status") in ("PENDING", "RUNNING"):
                job["status"] = "FAILED"
                job["last_error"] = "interrupted by restart"
                job["completed_at"] = _dt.datetime.now(
                    _dt.timezone.utc
                ).isoformat()
            self._reproc_jobs[job["id"]] = job
            # seq continues past restored ids so new ids never collide
            try:
                self._reproc_seq = max(
                    self._reproc_seq, int(job["id"].rsplit("-", 1)[1])
                )
            except (IndexError, ValueError):
                pass

    def _persist_reproc_jobs(self) -> None:
        """Atomic snapshot of every job record (tmp + rename): called on
        create and on every terminal transition, so a restart sees each
        job either not-yet-started or with its final counters."""
        import copy

        with self._lock:
            jobs = copy.deepcopy(list(self._reproc_jobs.values()))
        # per-writer tmp name: a worker's terminal persist can race a
        # cycle thread's failover-job persist — a SHARED tmp path would
        # let the second open truncate the first mid-write and publish
        # torn bytes; unique tmps make each os.replace atomic and whole
        tmp = f"{self._reproc_store}.{uuid.uuid4().hex}.tmp"
        try:
            with open(tmp, "w", encoding="utf-8") as fh:
                json.dump(jobs, fh, default=str)
            os.replace(tmp, self._reproc_store)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)

    def list_reprocessing(self) -> list[dict[str, Any]]:
        jobs = [
            self._job_snapshot(j) for j in list(self._reproc_jobs.values())
        ]
        return sorted(jobs, key=lambda j: j["created_at"], reverse=True)

    def get_reprocessing(self, job_id: str) -> dict[str, Any] | None:
        job = self._reproc_jobs.get(job_id)
        return None if job is None else self._job_snapshot(job)

    def cancel_reprocessing(self, job_id: str) -> dict[str, Any]:
        job = self._reproc_jobs.get(job_id)
        if job is None:
            raise KeyError(f"no reprocessing job {job_id}")
        # status check + cancel-flag add under the SAME lock the worker
        # mutates with: an unlocked check racing job completion could
        # re-add the id after the worker's finally-discard and leak a
        # _reproc_cancel entry for the process lifetime
        with self._lock:
            if job["status"] in ("PENDING", "RUNNING"):
                self._reproc_cancel.add(job_id)
        return self._job_snapshot(job)


def _iso_now() -> str:
    import datetime as _dt

    return _dt.datetime.now(_dt.timezone.utc).isoformat()


def _parse_cookies(header: str) -> dict[str, str]:
    """Cookie header → dict (the pixel identity cookies,
    router_pixel_handler.go:199-261)."""
    from http.cookies import SimpleCookie
    from urllib.parse import unquote

    jar = SimpleCookie()
    try:
        jar.load(header)
    except Exception:
        return {}
    return {k: unquote(m.value) for k, m in jar.items()}


def _date_in_range(d, date_from, date_to) -> bool:
    if d is None:
        return True
    if date_from and d < date_from:
        return False
    return not (date_to and d > date_to)


# -- stdlib HTTP front ------------------------------------------------------


def _make_handler(app: BulkerApp):
    class Handler(BaseHTTPRequestHandler):
        # quiet request logging (tests); override for deployments
        def log_message(self, *args):  # noqa: D102
            pass

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> bytes:
            n = int(self.headers.get("Content-Length", 0))
            if n > MAX_BODY_BYTES:
                raise ValueError(f"body too large: {n} bytes")
            return self.rfile.read(n)

        def _authorized(self) -> bool:
            """Bearer-token gate on every route except the health probes
            (the reference's Authorize middleware; health endpoints are
            exempt there too). No tokens configured = open."""
            if not app.auth_tokens:
                return True
            header = self.headers.get("Authorization", "")
            token = header.removeprefix("Bearer ").strip()
            # compare as bytes: compare_digest raises TypeError on
            # non-ASCII str inputs, and this runs OUTSIDE the route try
            # blocks — an exotic header must 401, not kill the request
            ok = any(
                hmac.compare_digest(token.encode(), t.encode())
                for t in app.auth_tokens
            )
            if not ok:
                self._json(401, {"error": "unauthorized"})
            return ok

        def _no_cache(self) -> None:
            # router_pixel_handler.go:74-77 — a pixel response must never
            # be cached or the event fires once per browser, not per view
            self.send_header(
                "Cache-Control", "no-cache, no-store, must-revalidate"
            )
            self.send_header("Pragma", "no-cache")
            self.send_header("Expires", "0")

        def _pixel(self, tp: str, url) -> None:
            query = parse_qs(url.query, keep_blank_values=True)
            headers = dict(self.headers.items())
            res = app.ingest_pixel(
                tp,
                query,
                headers,
                client_ip=self.client_address[0],
                host=self.headers.get("Host", ""),
            )
            if res.get("redirect"):
                self.send_response(302)
                self.send_header("Location", res["redirect"])
                self._no_cache()
                self.end_headers()
                return
            body = res["gif"]
            self.send_response(200)
            self.send_header("Content-Type", "image/gif")
            self.send_header("Content-Length", str(len(body)))
            self._no_cache()
            sc = res.get("set_cookie")
            if sc:
                # router_pixel_handler.go:210-219 — plant the anonymousId
                # cookie on the registrable domain, effectively-forever
                self.send_header(
                    "Set-Cookie",
                    f"{sc['name']}={quote(sc['value'])}; Path=/; "
                    f"Domain={sc['domain']}; Max-Age=946080000; "
                    "SameSite=None; Secure",
                )
            self.end_headers()
            self.wfile.write(body)

        def _lib_js(self, head: bool) -> None:
            from . import ingest_shapes as shapes

            # router_classic_handler.go:57-77 — ETag/304/HEAD semantics
            if self.headers.get("If-None-Match") == shapes.LIB_JS_ETAG:
                self.send_response(304)
                self.send_header("ETag", shapes.LIB_JS_ETAG)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("ETag", shapes.LIB_JS_ETAG)
            self.send_header("Content-Type", "application/javascript")
            self.send_header("Content-Length", str(len(shapes.LIB_JS)))
            self.end_headers()
            if not head:
                self.wfile.write(shapes.LIB_JS)

        def _require_json_ct(self) -> bool:
            """Content-type gate shared by the classic and segment event
            routes (router_classic_handler.go:99-102): json or
            text/plain suffixes only; answers the 400 itself."""
            ct = self.headers.get("Content-Type", "")
            base_ct = ct.split(";")[0].strip()
            if base_ct.endswith("application/json") or base_ct.endswith(
                "text/plain"
            ):
                return True
            self._json(
                400,
                {
                    "error": f"invalid content type: {ct}. "
                    "Expected: application/json"
                },
            )
            return False

        def _guarded_body(self) -> bytes | None:
            """_body() with the oversize/malformed Content-Length error
            surfaced as a 400 instead of a dropped connection."""
            try:
                return self._body()
            except ValueError as ex:
                self._json(400, {"error": str(ex)})
                return None

        def _segment(
            self, url, tp: str = "", batch: bool = False, s2s: bool = False
        ) -> None:
            if not self._require_json_ct():
                return
            body = self._guarded_body()
            if body is None:
                return
            query = parse_qs(url.query, keep_blank_values=True)
            headers = dict(self.headers.items())
            if batch:
                res = app.ingest_batch(
                    body,
                    query,
                    headers,
                    client_ip=self.client_address[0],
                    s2s=s2s,
                )
            else:
                res = app.ingest_event(
                    tp,
                    body,
                    query,
                    headers,
                    client_ip=self.client_address[0],
                    s2s=s2s,
                )
            status = res.pop("status", 200)
            self._json(status, res)

        def _settings(self, write_key: str) -> None:
            from . import ingest_shapes as shapes

            # router_segment_settings_handler.go:11-32 — static
            # analytics.js settings doc, day-cacheable
            body = shapes.settings_document(write_key).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Cache-Control", "public, max-age=86400")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _classic(self, url, s2s: bool) -> None:
            if not self._require_json_ct():
                return
            body = self._guarded_body()
            if body is None:
                return
            query = parse_qs(url.query, keep_blank_values=True)
            headers = dict(self.headers.items())
            res = app.ingest_classic(
                body,
                query,
                headers,
                client_ip=self.client_address[0],
                s2s=s2s,
            )
            status = res.pop("status", 200)
            if res.get("ok"):
                self._json(200, {"ok": True})
            else:
                self._json(status, {"ok": False, "error": res.get("error")})

        def do_HEAD(self) -> None:  # noqa: N802
            url = urlparse(self.path)
            parts = [p for p in url.path.split("/") if p]
            if parts == ["s", "lib.js"]:
                self._lib_js(head=True)
            else:
                self.send_response(404)
                self.end_headers()

        def do_GET(self) -> None:  # noqa: N802
            url = urlparse(self.path)
            parts = [p for p in url.path.split("/") if p]
            q = {k: v[0] for k, v in parse_qs(url.query).items()}
            # public web endpoints: write-key/domain addressed, never
            # bearer-gated (the reference's ingest service registers
            # these outside the Authorize middleware, ingest/router.go:
            # 175,179)
            if len(parts) == 3 and parts[:2] == ["api", "px"]:
                self._pixel(parts[2], url)
                return
            if parts == ["s", "lib.js"]:
                self._lib_js(head=False)
                return
            # analytics.js settings probe — the EXACT reference route
            # shapes only (ingest/router.go:160-165, incl. the
            # /projects/projects double alias); a loose suffix match
            # would let future authorized GETs slip past the bearer gate
            settings_shapes = {
                ("projects",): "",
                ("v1", "projects"): "",
            }
            key_shapes = (
                ["projects"], ["projects", "projects"],
                ["v1", "projects"], ["v1", "projects", "projects"],
            )
            if parts and parts[-1] == "settings":
                for prefix in key_shapes:
                    if (
                        len(parts) == len(prefix) + 2
                        and parts[: len(prefix)] == prefix
                    ):
                        # gin URL-decodes path params; the JSON
                        # escaping in settings_document keeps a crafted
                        # decoded key from breaking out of the string
                        self._settings(unquote(parts[-2]))
                        return
            if tuple(parts) in settings_shapes:
                self._settings("")
                return
            if parts not in (["ready"], ["health"]) and not self._authorized():
                return
            try:
                if parts == ["ready"] or parts == ["health"]:
                    self._json(200, {"status": "ready"})
                elif parts == ["config"]:
                    self._json(
                        200,
                        {
                            d.destination_id: {
                                "warehouse_path": d.warehouse_path,
                                "namespace": d.namespace,
                                "options": d.options,
                                "filters": d.filters,
                            }
                            for d in app.destinations.values()
                        },
                    )
                elif parts == ["metrics"]:
                    # the reference exposes Prometheus text on its
                    # metrics server (bulkerapp/app/metrics_server.go:
                    # 20-35, promhttp); here the same counters render
                    # in exposition format on ?format=prometheus
                    if q.get("format") == "prometheus":
                        # plain dict copy: counter bumps are unlocked
                        # GIL-atomic int adds (same discipline as the
                        # JSON branch) — a lock here would synchronize
                        # with almost no writers and imply a consistency
                        # it cannot provide
                        snap = dict(app.metrics)
                        lines = []
                        seen: set[str] = set()
                        for name in sorted(snap):
                            # exposition-safe name: anything outside
                            # [a-zA-Z0-9_:] would make the whole page
                            # unscrapable; counters carry the
                            # conventional _total suffix
                            safe = re.sub(r"[^a-zA-Z0-9_:]", "_", name)
                            metric = f"bulker_{safe}"
                            if not metric.endswith("_total"):
                                metric += "_total"
                            # two keys differing only in sanitized chars
                            # must not emit one series twice — a dup
                            # series fails the WHOLE scrape
                            n, base_metric = 2, metric
                            while metric in seen:
                                metric = f"{base_metric[:-6]}_{n}_total"
                                n += 1
                            seen.add(metric)
                            lines.append(
                                f"# HELP {metric} bulker counter {name}"
                            )
                            lines.append(f"# TYPE {metric} counter")
                            lines.append(f"{metric} {snap[name]}")
                        body = ("\n".join(lines) + "\n").encode()
                        self.send_response(200)
                        self.send_header(
                            "Content-Type",
                            "text/plain; version=0.0.4; charset=utf-8",
                        )
                        self.send_header("Content-Length", str(len(body)))
                        self.end_headers()
                        self.wfile.write(body)
                    else:
                        self._json(200, dict(app.metrics))
                elif parts[:2] == ["debug", "pprof"] and len(parts) <= 3:
                    # pprof-style profiling surface (the reference mounts
                    # net/http/pprof here, bulkerapp/app/router.go:76-85);
                    # Python analogues, see app/debug_profiler.py. Behind
                    # the same bearer gate as every non-health route.
                    from . import debug_profiler

                    suffix = parts[2] if len(parts) == 3 else ""
                    fn = debug_profiler.ROUTES.get(suffix)
                    if fn is None:
                        self._json(404, {"error": f"unknown profile {suffix}"})
                        return
                    body = fn(q).encode()
                    self.send_response(200)
                    self.send_header(
                        "Content-Type", "text/plain; charset=utf-8"
                    )
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif len(parts) == 2 and parts[0] == "failed":
                    table = q.get("tableName")
                    if not table:
                        self._json(400, {"error": "tableName is required"})
                        return
                    rows = app.failed(
                        parts[1], table, int(q.get("limit", "100"))
                    )
                    self._json(200, {"events": rows})
                elif len(parts) == 2 and parts[0] == "lag":
                    self._json(200, app.topic_lag(parts[1]))
                elif parts == ["health", "destinations"]:
                    self._json(
                        200,
                        {
                            d: app.health.status(d)
                            for d in app.destinations
                        },
                    )
                elif parts == ["reprocessing", "jobs"]:
                    self._json(200, {"jobs": app.list_reprocessing()})
                elif len(parts) == 3 and parts[:2] == ["reprocessing", "jobs"]:
                    job = app.get_reprocessing(parts[2])
                    if job is None:
                        self._json(404, {"error": f"no job {parts[2]}"})
                    else:
                        self._json(200, job)
                elif len(parts) == 2 and parts[0] == "connections-metrics":
                    self._json(200, app.connections_metrics(parts[1]))
                elif len(parts) == 2 and parts[0] == "schema":
                    table = q.get("tableName")
                    eng = app.engine_for(parts[1])
                    if not table:  # list tables of the namespace
                        self._json(
                            200,
                            {"tables": eng.warehouse.list_tables()},
                        )
                        return
                    meta = eng.warehouse.get_meta(table)
                    if meta is None:
                        self._json(404, {"error": f"no table {table}"})
                        return
                    self._json(
                        200,
                        {
                            "namespace": meta.namespace,
                            "table": meta.name,
                            "columns": {
                                c: getattr(t, "name", str(t))
                                for c, t in meta.columns.items()
                            },
                            "primaryKey": meta.pk,
                            "timestampColumn": meta.timestamp_column,
                            "partitionBy": meta.partition_by,
                        },
                    )
                elif len(parts) == 2 and parts[0] == "log":
                    table = q.get("tableName")
                    if not table:
                        self._json(400, {"error": "tableName is required"})
                        return
                    rows = app.log_range(
                        parts[1],
                        table,
                        ts_col=q.get("tsColumn"),
                        id_col=q.get("idColumn"),
                        start=q.get("start"),
                        end=q.get("end"),
                        before_id=q.get("beforeId"),
                        limit=int(q.get("limit", "100")),
                    )
                    self._json(200, {"events": rows})
                elif len(parts) == 2 and parts[0] == "changes":
                    table = q.get("tableName")
                    since = q.get("since")
                    if not table or since is None:
                        self._json(
                            400, {"error": "tableName and since are required"}
                        )
                        return
                    try:
                        since_i = int(since)
                        to_i = int(q["to"]) if "to" in q else None
                        limit_i = int(q.get("limit", "1000"))
                    except ValueError:
                        self._json(400, {"error": "non-integer cursor"})
                        return
                    try:
                        self._json(
                            200,
                            app.changes(
                                parts[1],
                                table,
                                since_i,
                                to_commit=to_i,
                                limit=limit_i,
                            ),
                        )
                    except ValueError as ex:  # feed reset (replace/restore)
                        self._json(409, {"error": str(ex)})
                    except FileNotFoundError as ex:
                        self._json(404, {"error": str(ex)})
                else:
                    self._json(404, {"error": f"no route {url.path}"})
            except KeyError as ex:
                self._json(404, {"error": str(ex)})
            except Exception as ex:  # surface as 500, never crash the server
                self._json(500, {"error": f"{type(ex).__name__}: {ex}"})

        def do_POST(self) -> None:  # noqa: N802
            url = urlparse(self.path)
            parts = [p for p in url.path.split("/") if p]
            q = {k: v[0] for k, v in parse_qs(url.query).items()}
            # classic event endpoints: token-addressed, outside the
            # bearer gate (ingest/router.go:180-185)
            if parts in (
                ["api", "v1", "event"],
                ["api", "v1", "events"],
                ["api", "v1", "s2s", "event"],
                ["api", "v1", "s2s", "events"],
            ) or (len(parts) == 1 and parts[0].startswith("api.")):
                self._classic(url, s2s=len(parts) == 4)
                return
            # segment-protocol routes (ingest/router.go:166-176):
            # /v1/batch aliases + /api/s/s2s/batch, and /api/s/[s2s/]:tp
            if parts in (
                ["v1", "batch", "b"], ["v1", "batch"], ["v1", "b"],
                ["batch", "b"], ["batch"], ["b"],
                ["api", "s", "s2s", "batch"],
            ):
                self._segment(url, batch=True, s2s=parts[-2:] == ["s2s", "batch"])
                return
            if (
                len(parts) == 3
                and parts[:2] == ["api", "s"]
                and parts[2] != "s2s"
            ):
                self._segment(url, tp=parts[2])
                return
            if len(parts) == 4 and parts[:3] == ["api", "s", "s2s"]:
                self._segment(url, tp=parts[3], s2s=True)
                return
            if not self._authorized():
                return
            try:
                if len(parts) == 2 and parts[0] == "post":
                    table = q.get("tableName")
                    if not table:
                        self._json(400, {"error": "tableName is required"})
                        return
                    topic = app.post_event(
                        parts[1], table, self._body(), q.get("mode")
                    )
                    self._json(200, {"success": True, "topic": topic})
                elif len(parts) == 2 and parts[0] == "bulk":
                    table = q.get("tableName")
                    if not table:
                        self._json(400, {"error": "tableName is required"})
                        return
                    pk = [
                        c for c in q.get("pk", "").split(",") if c.strip()
                    ] or None
                    # X-Jitsu-Schema pins column types for the load
                    # (router.go:228,261-265: {"fields":[{name,type}]})
                    extra: dict[str, Any] = {}
                    schema_hdr = self.headers.get("X-Jitsu-Schema")
                    if schema_hdr:
                        parsed = json.loads(schema_hdr)
                        extra["schema"] = {
                            f["name"]: str(f["type"])
                            for f in parsed.get("fields", [])
                        }
                    res = app.bulk(
                        parts[1],
                        table,
                        self._body(),
                        mode=q.get("mode"),
                        primary_key=pk,
                        **extra,
                    )
                    self._json(
                        200 if res.error is None else 500,
                        {
                            "success": res.error is None,
                            "processedRows": res.processed_rows,
                            "successfulRows": res.successful_rows,
                            "malformedRows": res.malformed_rows,
                            "rejectedRows": res.rejected_rows,
                            "error": res.error,
                        },
                    )
                elif len(parts) == 2 and parts[0] == "cycle":
                    self._json(200, app.run_batch_cycle(parts[1]))
                elif parts == ["failover", "replay"]:
                    self._json(200, {"replayed": app.replay_failover()})
                elif parts == ["reprocessing", "jobs"]:
                    spec = json.loads(self._body() or b"{}")
                    job = app.start_reprocessing(
                        spec, wait=bool(spec.get("wait"))
                    )
                    self._json(200, job)
                elif (
                    len(parts) == 4
                    and parts[:2] == ["reprocessing", "jobs"]
                    and parts[3] == "cancel"
                ):
                    self._json(200, app.cancel_reprocessing(parts[2]))
                elif parts == ["test"]:
                    spec = json.loads(self._body() or b"{}")
                    try:
                        info = app.test_connection(spec)
                        self._json(200, {"success": True, **info})
                    except ForbiddenPathError as ex:
                        self._json(403, {"success": False, "error": str(ex)})
                    except (TypeError, ValueError, OSError) as ex:
                        self._json(
                            422, {"success": False, "error": str(ex)}
                        )
                elif len(parts) == 2 and parts[0] == "query":
                    spec = json.loads(self._body() or b"{}")
                    sql_text = spec.get("query")
                    if not sql_text:
                        self._json(400, {"error": "query is required"})
                        return
                    self._json(
                        200,
                        app.query(
                            parts[1],
                            sql_text,
                            limit=int(spec.get("limit", 1000)),
                        ),
                    )
                elif len(parts) == 3 and parts[0] == "profiles":
                    topic = app.post_profile(
                        parts[1], parts[2], q.get("profileId", "")
                    )
                    self._json(200, {"message": "ok", "topic": topic})
                elif len(parts) == 2 and parts[0] == "config":
                    spec = json.loads(self._body() or b"{}")
                    spec["destination_id"] = parts[1]
                    dest = app.put_destination(spec)
                    self._json(
                        200,
                        {
                            "success": True,
                            "destination": dest.destination_id,
                        },
                    )
                else:
                    self._json(404, {"error": f"no route {url.path}"})
            except KeyError as ex:
                self._json(404, {"error": str(ex)})
            except ForbiddenPathError as ex:
                self._json(403, {"error": str(ex)})
            except (json.JSONDecodeError, ValueError) as ex:
                self._json(400, {"error": str(ex)})
            except Exception as ex:
                self._json(500, {"error": f"{type(ex).__name__}: {ex}"})

        def do_DELETE(self) -> None:  # noqa: N802
            url = urlparse(self.path)
            parts = [p for p in url.path.split("/") if p]
            if not self._authorized():
                return
            try:
                if len(parts) == 2 and parts[0] == "config":
                    if app.delete_destination(parts[1]):
                        self._json(200, {"success": True})
                    else:
                        self._json(
                            404, {"error": f"destination not found: {parts[1]}"}
                        )
                else:
                    self._json(404, {"error": f"no route {url.path}"})
            except Exception as ex:
                self._json(500, {"error": f"{type(ex).__name__}: {ex}"})

    return Handler


class _BulkerHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer with a deep accept backlog.

    The stdlib default ``request_queue_size`` is 5: under a burst of
    concurrent posts (or a saturated host running the full test suite)
    the kernel sheds connections past that listen backlog and clients
    see ECONNRESET. The reference sizes its async producer queue for
    exactly this load profile (``bulkerapp/app/router.go:106-118``);
    the analogous knob on an accept-then-thread server is the listen
    backlog."""

    request_queue_size = 128


def serve(app: BulkerApp, host: str = "127.0.0.1", port: int = 0):
    """Start the HTTP server (returns it; ``.server_address`` carries the
    bound port; call ``.shutdown()`` to stop). Threaded like the
    reference's gin server — handler threads share the driver's
    SparkSession, whose scheduler is thread-safe."""
    server = _BulkerHTTPServer((host, port), _make_handler(app))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server
